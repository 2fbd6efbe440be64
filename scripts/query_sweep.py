#!/usr/bin/env python
"""Probe-gated PER-QUERY sweep: time a named subset of driver-contract
queries at $SPARK_GRAFT_SF_DIR in a quiet host window (same memcpy
gating as quiet_bench.py, which runs the whole bench). Used to bisect
or re-certify individual bench lines without the full ~10-min sweep.

Usage: python scripts/query_sweep.py [--min-gbps G] [--reps R] q1 q2 …
Prints one JSON line {"probe_before": .., "probe_after": .., "queries":
{name: best_sec}} and appends it to BENCH/quiet_runs.jsonl tagged
kind=query_sweep.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quiet_bench import probe_gbps  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-gbps", type=float, default=7.0)
    ap.add_argument("--max-wait-min", type=float, default=30.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    deadline = time.time() + args.max_wait_min * 60
    while True:
        g = probe_gbps()
        print(f"probe: {g:.1f} GB/s (need {args.min_gbps})", flush=True)
        if g >= args.min_gbps:
            break
        if time.time() > deadline:
            print("no quiet window within the wait budget", flush=True)
            return 3
        time.sleep(60)
    before = g

    import __spark_entry__ as entrymod
    from tstoolbox_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("query_sweep", parallelism=cpus)
    qs = entrymod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in args.queries:
        df = qs[name](spark, sf_dir)
        df.count()  # warm plan + scan caches
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", flush=True)

    after = probe_gbps()
    rec = {
        "kind": "query_sweep",
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sf_dir": sf_dir,
        "cpus": cpus,
        "probe_before_gbps": round(before, 2),
        "probe_after_gbps": round(after, 2),
        "queries": timings,
    }
    line = json.dumps(rec)
    print(line)
    with open(os.path.join(REPO, "BENCH", "quiet_runs.jsonl"), "a") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
