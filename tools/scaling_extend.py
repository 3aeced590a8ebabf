#!/usr/bin/env python3
"""Extend SCALING.json with a synthetic-sf1 leg for the top movers.

r11 verdict task 6: 231/360 queries sit at the scheduler floor at sf0.1,
so the two-decade census says little about the genuinely data-coupled
tail. Driver testdata stops at sf0.1; tools/SynthSf1.scala scales it 10×
deterministically (see its scaladoc for the construction), and the ~20
most data-coupled queries (slope >= 0.3, or slope >= 0.2 at >= 2 s) are
re-benched at BOTH sf0.1 and synthetic sf1 in the same session so the
third-decade slope is computed between two same-machine-state legs.

Usage:
  python3 tools/scaling_extend.py <bench_sf01.json> <bench_sf1.json>

Reads/writes SCALING.json in place: for each subset query adds
  sec_sf01_fresh : the same-session sf0.1 reading (best-of-2)
  sec_sf1        : the synthetic-sf1 reading (best-of-2)
  slope_sf1      : log10(sec_sf1 / sec_sf01_fresh) — the third-decade
                   slope (1.0 = linear, <1 sublinear, >1 super-linear)
and records run metadata under "sf1_leg".
"""
import json
import sys
from math import log10


def main() -> int:
    b01 = json.loads(open(sys.argv[1]).read().splitlines()[0])
    b1 = json.loads(open(sys.argv[2]).read().splitlines()[0])
    scaling = json.load(open("SCALING.json"))
    qs = scaling["queries"]
    ext = {}
    sup = []
    for name, t1 in b1["queries"].items():
        t01 = b01["queries"].get(name)
        if t01 is None or t01 <= 0 or t1 <= 0:
            continue
        slope = round(log10(t1 / t01), 3)
        # setdefault: a query newer than the last census regeneration has
        # no SCALING row yet — merge instead of KeyError-aborting the run
        row = qs.setdefault(name, {"class": None, "sec": None, "slope": None})
        row["sec_sf01_fresh"] = round(t01, 3)
        row["sec_sf1"] = round(t1, 3)
        row["slope_sf1"] = slope
        ext[name] = slope
        if slope > 1.0:
            sup.append(name)
    # summary accumulates over every query carrying an sf1 leg, so a
    # second subset run (e.g. the streaming+ML families after the
    # data-coupled tail) merges instead of clobbering
    legged = {n: q for n, q in qs.items() if "slope_sf1" in q}
    scaling["sf1_leg"] = {
        "n_queries": len(legged),
        "generator": "tools/SynthSf1.scala (deterministic 10x of sf0.1; "
                     "driver testdata stops at sf0.1)",
        "data_dir": b1.get("sf"),
        "total_sec_sf01_fresh": round(sum(
            q["sec_sf01_fresh"] for q in legged.values()), 1),
        "total_sec_sf1": round(sum(
            q["sec_sf1"] for q in legged.values()), 1),
        "superlinear": sorted(
            n for n, q in legged.items() if q["slope_sf1"] > 1.0),
        "max_slope_sf1": max(q["slope_sf1"] for q in legged.values())
            if legged else None,
        "env_sf01": b01.get("env", {}).get("load_avg_start"),
        "env_sf1": b1.get("env", {}).get("load_avg_start"),
    }
    with open("SCALING.json", "w") as fh:
        json.dump(scaling, fh, indent=1, sort_keys=True)
        fh.write("\n")
    for n in sorted(ext, key=lambda k: -ext[k]):
        print(f"{n:42s} sf0.1={b01['queries'][n]:7.2f}s "
              f"sf1={b1['queries'][n]:7.2f}s slope={ext[n]}")
    print(f"\n{len(ext)} queries; superlinear (slope>1): {sorted(sup)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
