#!/usr/bin/env python3
"""Fourth-decade scaling leg: synthetic sf10 for the steepest movers.

r12 verdict task 1: the sf1 census proved its worth by catching the
part-matching quadratics; the steepest surviving slopes (and the r13
name-level SN rework of the fuzzy family) have exactly one decade of
post-fix evidence. tools/SynthSf1 with SPARK_GRAFT_SF_REPS=100 scales
the driver's sf0.1 tables 100x (same deterministic construction), and
the subset is re-benched at BOTH sf1 and sf10 in the same session so
the fourth-decade slope is computed between two same-machine-state
legs.

Usage:
  python3 tools/scaling_sf10.py <bench_sf1.json> <bench_sf10.json>

Reads/writes SCALING.json in place: for each subset query adds
  sec_sf1_fresh : the same-session sf1 reading (best-of-2)
  sec_sf10      : the synthetic-sf10 reading (best-of-2)
  slope_sf10    : log10(sec_sf10 / sec_sf1_fresh) — the fourth-decade
                  slope (1.0 = linear, <1 sublinear, >1 super-linear)
and records run metadata under "sf10_leg".
"""
import json
import sys
from math import log10


def main() -> int:
    b1 = json.loads(open(sys.argv[1]).read().splitlines()[0])
    b10 = json.loads(open(sys.argv[2]).read().splitlines()[0])
    scaling = json.load(open("SCALING.json"))
    qs = scaling["queries"]
    ext = {}
    for name, t10 in b10["queries"].items():
        t1 = b1["queries"].get(name)
        if t1 is None or t1 <= 0 or t10 <= 0:
            continue
        slope = round(log10(t10 / t1), 3)
        row = qs.setdefault(name, {"class": None, "sec": None, "slope": None})
        row["sec_sf1_fresh"] = round(t1, 3)
        row["sec_sf10"] = round(t10, 3)
        row["slope_sf10"] = slope
        ext[name] = slope
    legged = {n: q for n, q in qs.items() if "slope_sf10" in q}
    scaling["sf10_leg"] = {
        "n_queries": len(legged),
        "generator": "tools/SynthSf1.scala, SPARK_GRAFT_SF_REPS=100 "
                     "(deterministic 100x of sf0.1)",
        "data_dir": b10.get("sf"),
        "total_sec_sf1_fresh": round(sum(
            q["sec_sf1_fresh"] for q in legged.values()), 1),
        "total_sec_sf10": round(sum(
            q["sec_sf10"] for q in legged.values()), 1),
        "superlinear": sorted(
            n for n, q in legged.items() if q["slope_sf10"] > 1.0),
        "max_slope_sf10": max(q["slope_sf10"] for q in legged.values())
            if legged else None,
        "env_sf1": b1.get("env", {}).get("load_avg_start"),
        "env_sf10": b10.get("env", {}).get("load_avg_start"),
    }
    with open("SCALING.json", "w") as fh:
        json.dump(scaling, fh, indent=1, sort_keys=True)
        fh.write("\n")
    for n in sorted(ext, key=lambda k: -ext[k]):
        print(f"{n:42s} sf1={b1['queries'][n]:8.2f}s "
              f"sf10={b10['queries'][n]:8.2f}s slope={ext[n]}")
    sup = sorted(n for n, s in ext.items() if s > 1.0)
    print(f"\n{len(ext)} queries; superlinear (slope>1): {sup}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
