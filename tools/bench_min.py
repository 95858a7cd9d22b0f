#!/usr/bin/env python3
"""Fold N bench capture JSONs into the per-query min-across-captures
composite — the adjudicable regression-scan artifact.

The round's regression scan compares each query's best quiet-capture
time against the prior round's committed evidence; this script makes
that scan reproducible from committed files alone (VERDICT r16 "Next
round" #2): commit each quiet capture under bench/ and the folded
minimum beside them, and the notes' claims become checkable without
trusting prose.

Usage: python3 tools/bench_min.py OUT.json CAPTURE1.json [CAPTURE2.json ...]

Each capture is the one-line JSON graft.Bench prints (or its
SPARK_GRAFT_BENCH_OUT file). Output fields:
  metric   "total_min_composite"
  value    sum over queries of the minimum median across captures
  n        number of queries contributing (failures, -1, excluded)
  queries  per-query min-across-captures medians
  argmin   per-query index (into sources) of the capture that holds it
  sources  capture file basenames, in argument order
  captures per-source health summary (total/calib/load/stalls) so a
           contaminated capture is identifiable inside this artifact
"""
import json
import os
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    out_path, cap_paths = sys.argv[1], sys.argv[2:]
    caps = []
    for p in cap_paths:
        with open(p) as f:
            caps.append(json.load(f))
    mins, argmin = {}, {}
    for i, cap in enumerate(caps):
        for q, t in cap.get("queries", {}).items():
            if t is None or t < 0:
                continue
            if q not in mins or t < mins[q]:
                mins[q] = t
                argmin[q] = i
    health = {}
    for p, cap in zip(cap_paths, caps):
        health[os.path.basename(p)] = {
            k: cap[k]
            for k in ("value", "n", "sf", "calib_sec_before", "calib_sec_after",
                      "calib_io_sec_before", "calib_io_sec_after",
                      "loadavg_before", "loadavg_after", "stall_retrials",
                      "stall_retrials_by_query", "normalized_suppressed")
            if k in cap
        }
    out = {
        "metric": "total_min_composite",
        "value": round(sum(mins.values()), 3),
        "unit": "sec",
        "n": len(mins),
        "queries": {q: mins[q] for q in sorted(mins)},
        "argmin": {q: argmin[q] for q in sorted(argmin)},
        "sources": [os.path.basename(p) for p in cap_paths],
        "captures": health,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"{out['value']} s over {out['n']} queries "
          f"from {len(caps)} captures -> {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
