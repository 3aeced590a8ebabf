#!/usr/bin/env python3
"""Fold scalatest's JUnit-XML output into the committed TEST_REPORT.json.

r12 (VERDICT r11 task 4): one of two full r11 suite runs showed 2
RelationalSpec failures that vanished on rerun, with the per-test names
lost to log truncation. build.sbt now writes per-suite JUnit XML to
target/test-reports on every `sbt test`; after a full run this script
folds them into one machine-readable artifact so any one-off flake
carries a test NAME and stack the next session can investigate.

Usage: python3 tools/test_report.py [target/test-reports] [TEST_REPORT.json]
"""
import glob
import json
import os
import sys
import xml.etree.ElementTree as ET


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "target/test-reports"
    out = sys.argv[2] if len(sys.argv) > 2 else "TEST_REPORT.json"
    files = sorted(glob.glob(os.path.join(src, "TEST-*.xml")))
    if not files:
        print(f"no TEST-*.xml under {src} — run `sbt test` first",
              file=sys.stderr)
        return 1
    suites, failures = [], []
    tot = {"tests": 0, "failed": 0, "errors": 0, "skipped": 0, "time_sec": 0.0}
    for f in files:
        # scalatest's -u writer does not truncate an existing (longer)
        # file, so a rewrite can leave stale tail bytes after the new
        # document — parse only up to the first closing testsuite tag
        raw = open(f, errors="replace").read()
        end = raw.find("</testsuite>")
        if end >= 0:
            raw = raw[: end + len("</testsuite>")]
        try:
            s = ET.fromstring(raw)
        except ET.ParseError as e:
            # an aborted suite (killed JVM) leaves an unterminated XML —
            # the exact flaky-run scenario this tool diagnoses: report it
            # as a failure instead of losing every other suite's names
            failures.append({"suite": f, "test": "<suite aborted>",
                             "kind": "error", "message": str(e), "stack": ""})
            tot["errors"] += 1
            continue
        n = int(s.get("tests", 0))
        nf = int(s.get("failures", 0))
        ne = int(s.get("errors", 0))
        ns = int(s.get("skipped", 0))
        t = float(s.get("time", 0.0))
        suites.append({
            "suite": s.get("name"), "tests": n, "failed": nf,
            "errors": ne, "skipped": ns, "time_sec": round(t, 1),
        })
        tot["tests"] += n
        tot["failed"] += nf
        tot["errors"] += ne
        tot["skipped"] += ns
        tot["time_sec"] = round(tot["time_sec"] + t, 1)
        for case in s.iter("testcase"):
            for kind in ("failure", "error"):
                for fail in case.iter(kind):
                    failures.append({
                        "suite": s.get("name"),
                        "test": case.get("name"),
                        "kind": kind,
                        "message": (fail.get("message") or "")[:500],
                        "stack": (fail.text or "").strip()[:2000],
                    })
    report = {**tot, "n_suites": len(suites), "suites": suites,
              "failures": failures}
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")
    print(f"{out}: {tot['tests']} tests / {tot['failed']} failed / "
          f"{tot['errors']} errors across {len(suites)} suites "
          f"({tot['time_sec']} s)")
    return 2 if (tot["failed"] or tot["errors"]) else 0


if __name__ == "__main__":
    sys.exit(main())
