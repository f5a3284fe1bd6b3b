#!/usr/bin/env python
"""Estimators over tools/interleaved_scaling.py's sample log.

Reads /tmp/interleaved_scaling.log and reports, per leg:
- accepted samples (both bracketing ceilings >= 0.85) and their median
  -> the collector's primary E;
- the PRE-QUIET MINIMUM: min time over runs whose BEFORE-probe read
  quiet (>= gate) regardless of the after-probe — the timeit
  convention ("the lowest value gives a lower bound; higher values are
  typically not caused by variability in the code's speed, but by
  other processes"): contention only ever ADDS time, so the fastest
  pre-quiet run is the best estimate of the true quiet time on BOTH
  legs symmetrically -> min-based E.

Both estimators ship; disagreement between them measures how much
hidden mid-run noise the acceptance gate lets through.
"""
import re
import statistics
import sys

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/interleaved_scaling.log"
PAT = re.compile(r"leg (\d+)(?: mult(\d+))?: (ACCEPTED|rejected) ([\d.]+)s "
                 r"\(ceil ([\d.]+)/([\d.]+)\)")
MULT = sys.argv[2] if len(sys.argv) > 2 else None

acc = {}
prequiet = {}
for ln in open(LOG):
    m = PAT.search(ln)
    if not m:
        continue
    n, mult, verdict, sec, c0, c1 = (int(m.group(1)), m.group(2),
                                     m.group(3), float(m.group(4)),
                                     float(m.group(5)), float(m.group(6)))
    if MULT is not None and mult != MULT:
        continue
    if verdict == "ACCEPTED":
        acc.setdefault(n, []).append(sec)
    if c0 >= 0.90:
        prequiet.setdefault(n, []).append(sec)

legs = sorted(set(acc) | set(prequiet))
for n in legs:
    a = acc.get(n, [])
    q = prequiet.get(n, [])
    print(f"leg {n}: accepted n={len(a)} median={statistics.median(a) if a else None}"
          f"  pre-quiet n={len(q)} min={min(q) if q else None}")
if len(legs) == 2:
    lo, hi = legs
    ratio = hi // lo
    if acc.get(lo) and acc.get(hi):
        e = (statistics.median(acc[lo]) / statistics.median(acc[hi])) / ratio
        print(f"E (median of accepted) = {e:.3f}")
    if prequiet.get(lo) and prequiet.get(hi):
        e = (min(prequiet[lo]) / min(prequiet[hi])) / ratio
        print(f"E (pre-quiet minimum, timeit convention) = {e:.3f}")
