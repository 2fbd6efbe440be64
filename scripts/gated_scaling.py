#!/usr/bin/env python
"""Probe-gated wrapper for scaling_evidence.py.

The scaling protocol's worst failure mode is firing into a degraded
host window (the 2026-08-19 attempt measured local[32] SLOWER than
local[8] — a physical impossibility for the engine). This wrapper
reuses quiet_bench's controls and only launches the A/B pairs when
BOTH gates pass:

  - steady-state memcpy >= --min-gbps (low-occupancy sanity), and
  - the no-Spark codec pool's 8->32-proc scaling efficiency >=
    --wide-gate (the dimension the 4N level actually needs: days
    when the host punishes wide occupancy read ~0.1-0.2 here while
    memcpy still reads at baseline).

Results land wherever scaling_evidence writes them; gate readings are
printed for the record. Exit 3 = no clean window inside the budget.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from codec_scaling import measure  # noqa: E402
from quiet_bench import probe_gbps  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-gbps", type=float, default=8.0)
    ap.add_argument("--wide-gate", type=float, default=0.3)
    ap.add_argument("--max-wait-min", type=float, default=60.0)
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    deadline = time.time() + args.max_wait_min * 60
    while True:
        g = probe_gbps()
        print(f"probe: {g:.1f} GB/s (need {args.min_gbps})", flush=True)
        if g >= args.min_gbps:
            thr8 = measure(8, 64, 8000)
            thr32 = measure(32, 64, 8000)
            eff = (thr32 / thr8) / 4.0
            print(
                f"wide gate: codec 8p {thr8:.0f} -> 32p {thr32:.0f}, "
                f"eff {eff:.2f} (need {args.wide_gate})",
                flush=True,
            )
            if eff >= args.wide_gate:
                break
        if time.time() > deadline:
            print("no clean window", flush=True)
            return 3
        time.sleep(60)

    rc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "scaling_evidence.py"),
            str(args.rows), str(args.n), str(args.repeats),
        ],
        cwd=REPO,
    ).returncode
    g_after = probe_gbps()
    print(f"probe after: {g_after:.1f} GB/s", flush=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
