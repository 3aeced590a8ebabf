#!/usr/bin/env python3
"""Whole-board three-SF scaling census (r10 verdict item 3).

Combines three Bench runs (sf0.001 / sf0.01 / sf0.1 — 100x data across two
decades) into SCALING.json: per-query wall seconds at each SF, the fitted
log-log slope, and a classification. This converts the per-round "would it
survive 100x?" judgement from argument into artifact.

Slope = log10(t_hi / t_lo) / log10(sf_hi / sf_lo) over the widest measured
pair; slope 0 = flat (fixed grid / per-batch floors dominate), 1 = linear in
data, >1 = super-linear (flagged — either fix or document the floor).

Noise guard: sub-second queries are scheduler-floor bound, so a slope
computed on them is meaningless; queries with t_hi below NOISE_SEC are
classified "floor" regardless of slope.

Usage: python3 tools/scaling_census.py BENCH_sf0.001.out BENCH_sf0.01.out BENCH_sf0.1.out
(each file = BENCH.out as written by graft.Bench at that SF)
"""
import json
import math
import sys

NOISE_SEC = 1.0  # below this at the largest SF, timing is scheduler floor
SUPERLINEAR = 1.15  # slope above this (with signal) is flagged


def load(path):
    with open(path) as f:
        line = f.readline()
    d = json.loads(line)
    return d["sf"], d["queries"]


def main():
    runs = [load(p) for p in sys.argv[1:4]]
    runs.sort(key=lambda r: float(r[0].rstrip("/").split("sf")[-1]))
    sfs = [float(r[0].rstrip("/").split("sf")[-1]) for r in runs]
    names = sorted(set().union(*[set(q) for _, q in runs]))
    out, flagged = {}, []
    for n in names:
        ts = [q.get(n) for _, q in runs]
        if any(t is None or t < 0 for t in ts):
            out[n] = {"sec": ts, "slope": None, "class": "incomplete"}
            continue
        # classify the noise floor BEFORE computing a slope: a 0.0 s
        # timing at the top SF is floor-class by definition and would
        # otherwise crash log10
        if ts[-1] < NOISE_SEC:
            out[n] = {"sec": [round(t, 3) for t in ts], "slope": None,
                      "class": "floor"}
            continue
        slope = (math.log10(ts[-1] / ts[0])
                 / math.log10(sfs[-1] / sfs[0])) if ts[0] > 0 else None
        if slope is None:
            cls = "incomplete"
        elif slope <= 0.1:
            cls = "flat"
        elif slope <= SUPERLINEAR:
            cls = "sublinear-to-linear"
        else:
            cls = "SUPER-LINEAR"
            flagged.append(n)
        out[n] = {"sec": [round(t, 3) for t in ts],
                  "slope": None if slope is None else round(slope, 3),
                  "class": cls}
    census = {
        "sfs": sfs,
        "n_queries": len(names),
        "classes": {c: sum(1 for v in out.values() if v["class"] == c)
                    for c in sorted({v["class"] for v in out.values()})},
        "super_linear": flagged,
        "noise_floor_sec": NOISE_SEC,
        "queries": out,
    }
    with open("SCALING.json", "w") as f:
        json.dump(census, f, indent=1, sort_keys=True)
    print(json.dumps({k: census[k] for k in
                      ("sfs", "n_queries", "classes", "super_linear")}))


if __name__ == "__main__":
    main()
