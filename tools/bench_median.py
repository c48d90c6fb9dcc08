#!/usr/bin/env python
"""Serving-headline variance protocol (VERDICT r4 item 7).

Round 4 proved XLA compile outcomes near a memory cliff are a
DISTRIBUTION (docs/PERF.md rule 7), so a single-compile bench number is a
sample, not a measurement.  This runs ``bench.py`` N times in fresh
processes with the persistent compilation cache DISABLED
(``VMG_NO_COMPILE_CACHE=1`` -- each run pays a fresh XLA compile, so the
spread includes the compile lottery) and reports median + min/max.

Usage: python tools/bench_median.py [--runs 3]
Prints each run's JSON line, then one summary JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    here = os.path.dirname(os.path.abspath(__file__))
    bench = os.path.join(here, os.pardir, "bench.py")
    env = dict(os.environ, VMG_NO_COMPILE_CACHE="1")
    vals, recs = [], []
    for i in range(args.runs):
        out = subprocess.run(
            [sys.executable, bench], env=env, capture_output=True,
            text=True, timeout=args.timeout)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")][-1]
        rec = json.loads(line)
        print(line, flush=True)
        vals.append(float(rec["value"]))
        recs.append(rec)
    med = statistics.median(vals)
    print(json.dumps({
        "metric": recs[0]["metric"] + " [median of fresh-compile runs]",
        "value": round(med, 4),
        "unit": recs[0]["unit"],
        "runs": [round(v, 4) for v in vals],
        "min": round(min(vals), 4),
        "max": round(max(vals), 4),
        "vs_baseline": round(
            med * float(recs[0]["vs_baseline"]) / float(recs[0]["value"]),
            3),
    }))


if __name__ == "__main__":
    main()
