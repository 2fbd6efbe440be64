#!/usr/bin/env python
"""Print which queries sit inside vs outside the round driver's
50-entry verification window (ADVICE r2: make window placement
explicit). The window is coverage ROUTING only — the correctness gate
is scripts/check_correctness.py, which value-checks every query.

Usage: python scripts/window_report.py [window_size]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    ks = list(entrymod.queries())
    inside, outside = ks[:n], ks[n:]
    print(f"total queries: {len(ks)}; driver window: first {n}\n")
    print(f"INSIDE ({len(inside)}):")
    for k in inside:
        print(f"  {k}")
    print(f"\nOUTSIDE ({len(outside)}) — value-checked locally every "
          "commit (check_correctness.py), driver-green in a prior round:")
    for k in outside:
        print(f"  {k}")


if __name__ == "__main__":
    main()
