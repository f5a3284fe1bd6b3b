#!/usr/bin/env python
"""Summarize the scaling-hunt log: E vs in-run host ceiling, per pair.

Reads the JSON result lines appended to /tmp/scaling_hunt.log (or a
path argument) and prints, per leg pair, the attempt count and the
median/max raw E within min-ceiling bins.  Used for BASELINE.md's
scaling-evidence section: if E were host-limited, it would rise with
the ceiling; a flat E across bins indicates a structural limit (the
round-4 session-12 diagnosis was fixed per-pipeline dispatch latency,
see bench.py GRAFT_GEN_BUFFER).
"""
import collections
import json
import statistics
import sys


def main(path="/tmp/scaling_hunt.log"):
    by = collections.defaultdict(list)
    for ln in open(path):
        if not ln.startswith("{"):
            continue
        try:
            r = json.loads(ln)
        except ValueError:
            continue
        if "scaling_efficiency" not in r:
            continue
        by[(r["cpus_lo"], r["cpus_hi"])].append(
            (r["host_parallel_ceiling"], r["scaling_efficiency"],
             r.get("points")))
    for pair, xs in sorted(by.items()):
        print("pair %d->%d: %d attempts" % (pair[0], pair[1], len(xs)))
        for lo_b in (0.0, 0.3, 0.5, 0.7, 0.85):
            sel = [e for c, e, _ in xs if c >= lo_b]
            if sel:
                print("  min-ceiling >= %.2f  n=%3d  medianE=%.3f  maxE=%.3f"
                      % (lo_b, len(sel), statistics.median(sel), max(sel)))
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
