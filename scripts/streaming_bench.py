#!/usr/bin/env python
"""Probe-gated bench for the streaming twin (§2.9 analog): drain N
generated sequences through ``continuous_rollup`` (availableNow
micro-batches), measure drain throughput, verify exact parity with
the batch rollup on the same input, then time an incremental drain of
one appended file (the steady-state cost a long-running stream pays
per micro-batch).

Usage: python scripts/streaming_bench.py [--rows 1000000]
       [--min-gbps G] [--batch-files 8]
Appends one JSON line to BENCH/quiet_runs.jsonl tagged
kind=streaming_bench.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quiet_bench import probe_gbps  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--append-rows", type=int, default=50_000)
    ap.add_argument("--min-gbps", type=float, default=7.0)
    ap.add_argument("--max-wait-min", type=float, default=30.0)
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

    from pyspark.sql import functions as F

    from tstoolbox_spark.datagen import generate_sequences
    from tstoolbox_spark.session import get_spark
    from tstoolbox_spark.streaming.continuous import continuous_rollup
    from tstoolbox_spark.timeaxis import with_time_axis

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("streaming_bench", parallelism=cpus)
    work = tempfile.mkdtemp(prefix="streaming_bench_")
    rec: dict = {"kind": "streaming_bench",
                 "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                 "rows": args.rows, "cpus": cpus,
                 "probe_before_gbps": round(before, 2)}
    try:
        inp = os.path.join(work, "input")
        generate_sequences(spark, args.rows).write.parquet(inp)

        tier = os.path.join(work, "tier_1m")
        ckpt = os.path.join(work, "ckpt")
        t0 = time.time()
        q = continuous_rollup(spark, inp, tier, ckpt, tier="1m")
        q.awaitTermination()
        drain_s = round(time.time() - t0, 2)
        rec["drain_s"] = drain_s
        rec["drain_rows_per_s"] = round(args.rows / drain_s, 1)

        # exact parity vs the batch rollup on the same input
        got = spark.read.parquet(tier)
        batch = (
            with_time_axis(spark.read.parquet(inp))
            .groupBy(F.window("ts", "1 minute").alias("w"), "source")
            .agg(
                F.sum("n_tok").alias("n_tok_sum"),
                F.count("n_tok").alias("n_tok_count"),
                F.min("n_tok").alias("n_tok_min"),
                F.max("n_tok").alias("n_tok_max"),
            )
            .select(F.col("w.start").alias("ts"), "source",
                    "n_tok_sum", "n_tok_count", "n_tok_min", "n_tok_max")
        )
        # parity on every EMITTED minute (windows above the final
        # watermark legitimately stay in state — same contract as
        # tests/test_sources_streaming.py::test_streaming_rollup_…)
        n_tier = got.count()
        joined = got.alias("s").join(
            batch.alias("b"), ["ts", "source"], "inner")
        n_joined = joined.count()
        mismatches = joined.filter(
            (F.col("s.n_tok_sum") != F.col("b.n_tok_sum"))
            | (F.col("s.n_tok_count") != F.col("b.n_tok_count"))
            | (F.col("s.n_tok_min") != F.col("b.n_tok_min"))
            | (F.col("s.n_tok_max") != F.col("b.n_tok_max"))
        ).count() + (n_tier - n_joined)
        rec["tier_rows"] = n_tier
        rec["parity_mismatches"] = mismatches

        # steady-state: append one file, resume the stream, drain it
        generate_sequences(spark, args.append_rows, seed=99).write.mode(
            "append").parquet(inp)
        t0 = time.time()
        q2 = continuous_rollup(spark, inp, tier, ckpt, tier="1m")
        q2.awaitTermination()
        rec["append_drain_s"] = round(time.time() - t0, 2)
        rec["append_rows"] = args.append_rows
    finally:
        shutil.rmtree(work, ignore_errors=True)

    rec["probe_after_gbps"] = round(probe_gbps(), 2)
    with open(os.path.join(REPO, "BENCH", "quiet_runs.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
