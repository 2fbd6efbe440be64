#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.md protocol).

No real cluster exists in this sandbox, so the north rule's N→4N
executor criterion is evidenced by running the IDENTICAL pipeline job
at two local parallelism levels on the SAME pre-materialized input:

    run A: local[8]   (N)
    run B: local[32]  (4N)
    efficiency = (throughput_B / throughput_A) / 4      target ≥ 0.8

Each run is a fresh JVM (subprocess) so no cache/JIT leaks between
levels. Results go to BENCH/BASELINE.md.

Usage: python scripts/scaling_evidence.py [rows]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(parallelism: int, inp: str, rows: int) -> dict:
    work = tempfile.mkdtemp(prefix=f"scale_{parallelism}_")
    try:
        cmd = [
            sys.executable,
            os.path.join(REPO, "scripts", "submit_job.py"),
            "--input", inp,
            "--work-dir", os.path.join(work, "tables"),
            "--parallelism", str(parallelism),
        ]
        t0 = time.time()
        out = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, check=True
        )
        wall = time.time() - t0
        metrics = json.loads(out.stdout.strip().splitlines()[-1])
        metrics["wall_with_startup"] = wall
        metrics["parallelism"] = parallelism
        return metrics
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    staging = tempfile.mkdtemp(prefix="scale_input_")
    inp = os.path.join(staging, "sequences")
    try:
        gen = subprocess.run(
            [
                sys.executable, "-c",
                "import sys; sys.path.insert(0, '.');"
                "from tstoolbox_spark.session import get_spark;"
                "from tstoolbox_spark.datagen import write_sequences;"
                f"write_sequences(get_spark(parallelism=32), '{inp}', {rows}, partitions=64)",
            ],
            cwd=REPO, capture_output=True, text=True, check=True,
        )
        a = run_level(8, inp, rows)
        b = run_level(32, inp, rows)
    finally:
        shutil.rmtree(staging, ignore_errors=True)

    thr_a = a["sequences_per_second"]
    thr_b = b["sequences_per_second"]
    eff = (thr_b / thr_a) / 4.0
    result = {
        "rows": rows,
        "local8_seconds": a["total_seconds"],
        "local8_seq_per_s": thr_a,
        "local32_seconds": b["total_seconds"],
        "local32_seq_per_s": thr_b,
        "scaling_efficiency": eff,
        "phases_local8": a.get("phases"),
        "phases_local32": b.get("phases"),
        "compression_ratio": b.get("compression_ratio"),
        "roundtrip": b.get("roundtrip"),
    }
    print(json.dumps(result, indent=2, default=str))

    md = f"""# BENCH/BASELINE.md — scaling + throughput evidence

## Two-cluster-size criterion (N vs 4N), sandbox protocol

Identical job (`scripts/submit_job.py`: read parquet sequences →
salted bucket → Gorilla-compress cells → hash round-trip verify →
1m/1h/1d tier snapshots + lineage), same {rows:,}-row input, fresh
JVM per level.

| level | config | wall (s) | throughput (seq/s) |
|---|---|---|---|
| N | local[8] | {a['total_seconds']:.1f} | {thr_a:,.0f} |
| 4N | local[32] | {b['total_seconds']:.1f} | {thr_b:,.0f} |

**Scaling efficiency = (thr_4N / thr_N) / 4 = {eff:.3f}** (target ≥ 0.8)

Phase seconds (local[8] → local[32]):

| phase | local[8] | local[32] |
|---|---|---|
"""
    for k in a.get("phases", {}):
        md += f"| {k} | {a['phases'].get(k, '-')} | {b['phases'].get(k, '-')} |\n"
    md += f"""
Compression ratio {b.get('compression_ratio'):.3f}; round-trip
mismatches {b.get('roundtrip', {}).get('mismatched')} of {rows:,}.

Command: `python scripts/scaling_evidence.py {rows}`
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
