#!/usr/bin/env python
"""Opportunistic quiet-window benchmark runner.

The sandbox VM's effective memory bandwidth swings ~5x within minutes
(noisy physical-host neighbors; see BENCH/BASELINE.md "Hardware
controls"). A bench number is only meaningful next to a control
reading, so this wrapper:

  1. probes steady-state memcpy bandwidth (np.copyto, warm buffers —
     the same control the 9.2 GB/s baseline was measured with;
     a cold .copy() probe reads ~3x low from allocation faults),
  2. runs `python bench.py` only while the probe clears
     ``--min-gbps`` (default 7.0),
  3. re-probes afterwards and appends probe-before/after + the bench
     JSON line to ``BENCH/quiet_runs.jsonl``.

Usage: python scripts/quiet_bench.py [--min-gbps G] [--max-wait-min M]
Polls every 60 s until the window opens or the wait budget is spent
(exit 3 = no window).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe_gbps() -> float:
    import numpy as np

    src = np.random.rand(64 * 1024 * 1024 // 8)
    dst = np.empty_like(src)
    np.copyto(dst, src)
    best = 9e9
    for _ in range(6):
        t = time.perf_counter()
        np.copyto(dst, src)
        best = min(best, time.perf_counter() - t)
    return 64 / best / 1024


def probe_aggregate_gbps(procs: int = 8) -> float:
    """Aggregate bandwidth under parallel load — the dimension a Spark
    stage actually binds on. A single-proc probe can read ~9 GB/s
    while neighbors have the node's aggregate saturated; this catches
    that case (the 57 GB/s saturation figure in BENCH/BASELINE.md)."""
    import multiprocessing as mp

    def worker(q):
        import numpy as np

        src = np.random.rand(32 * 1024 * 1024 // 8)
        dst = np.empty_like(src)
        np.copyto(dst, src)
        best = 9e9
        for _ in range(4):
            t = time.perf_counter()
            np.copyto(dst, src)
            best = min(best, time.perf_counter() - t)
        q.put(32 / best / 1024)

    q: "mp.Queue" = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(procs)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-gbps", type=float, default=7.0)
    ap.add_argument("--max-wait-min", type=float, default=60.0)
    ap.add_argument("--pipeline-only", action="store_true",
                    help="skip the query sweep (~1/3 wall time; fits "
                         "short host windows)")
    ap.add_argument("--wide-gate", type=float, default=0.0,
                    help="also require the no-Spark codec pool to hit "
                         "this 8->32-proc scaling efficiency before "
                         "firing (catches days when the host punishes "
                         "wide occupancy while low-occupancy probes "
                         "read at baseline)")
    args = ap.parse_args()

    deadline = time.time() + args.max_wait_min * 60
    wide_eff = None
    while True:
        g = probe_gbps()
        print(f"probe: {g:.1f} GB/s (need {args.min_gbps})", flush=True)
        if g >= args.min_gbps:
            if not args.wide_gate:
                break
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from codec_scaling import measure  # noqa: E402

            thr8 = measure(8, 64, 8000)
            thr32 = measure(32, 64, 8000)
            wide_eff = (thr32 / thr8) / 4.0
            print(f"wide gate: codec 8p {thr8:.0f} -> 32p {thr32:.0f} "
                  f"cells/s, eff {wide_eff:.2f} "
                  f"(need {args.wide_gate})", flush=True)
            if wide_eff >= args.wide_gate:
                break
        if time.time() > deadline:
            print("no quiet window within the wait budget", flush=True)
            return 3
        time.sleep(60)

    before = g
    agg_before = probe_aggregate_gbps()
    print(f"aggregate probe: {agg_before:.1f} GB/s over 8 procs", flush=True)
    t0 = time.time()
    env = dict(os.environ)
    if args.pipeline_only:
        env["SPARK_GRAFT_BENCH_SKIP_QUERIES"] = "1"

    # MID-RUN probe sampler: end probes alone once certified a run
    # whose middle third was throttled 3-6x (2026-08-21 roll — a
    # contiguous stretch of the query list slowed while both end
    # probes read >10 GB/s). One 64 MB memcpy every 45 s costs ~10 ms
    # of bandwidth and records the floor the run actually saw.
    import threading

    mid_samples: list[float] = []
    stop = threading.Event()

    def _sampler():
        while not stop.wait(45.0):
            try:
                mid_samples.append(round(probe_gbps(), 2))
            except Exception:  # noqa: BLE001 - sampling must not kill the run
                pass

    th = threading.Thread(target=_sampler, daemon=True)
    th.start()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    stop.set()
    th.join(timeout=5)
    wall = time.time() - t0
    after = probe_gbps()
    m = re.findall(r'\{"metric".*\}', proc.stdout)
    rec = {
        "ts": time.time(),
        "probe_gbps_before": round(before, 2),
        "wide_eff_before": round(wide_eff, 3) if wide_eff else None,
        "probe_agg_gbps_before": round(agg_before, 2),
        "probe_agg_gbps_after": round(probe_aggregate_gbps(), 2),
        "probe_gbps_after": round(after, 2),
        "probe_gbps_mid": mid_samples,
        "probe_gbps_mid_min": min(mid_samples) if mid_samples else None,
        "wall_s": round(wall, 1),
        "rc": proc.returncode,
        "bench": json.loads(m[-1]) if m else None,
    }
    out = os.path.join(REPO, "BENCH", "quiet_runs.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({k: rec[k] for k in
                      ("probe_gbps_before", "probe_gbps_mid_min",
                       "probe_gbps_after", "wall_s")}))
    if rec["bench"]:
        print("headline:", rec["bench"]["value"], rec["bench"]["unit"])
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
