"""Streaming keep-last determinism lint (round-11 VERDICT #6).

SURVEY.md §2.5 D3 flags ``monotonically_increasing_id`` ordering as
unsafe across partitions: under task retries the physical arrival
order can differ, so a keep-last election built on it has an
ARBITRARY winner.  The streaming fallbacks accept that trade
deliberately (a stream has no global "last row" without a sequence
column) — but only as a DOCUMENTED delta, never silently.

This lint walks every ``tmdb_index_spark/streaming/*.py`` source file
and fails if ``monotonically_increasing_id`` appears without a
``DELTAS.md #6`` marker comment within the preceding few lines — the
marker proves the use-site is covered by the published determinism
contract (delta #6 names each covered site).  New streaming code that
wants arrival-order election must either take a ``seq_col`` or extend
the delta and add the marker.

Exit 0 + "STREAMING ORDER LINT OK" = every use-site is documented.
"""

from __future__ import annotations

import glob
import os
import sys

MARKER = "DELTAS.md #6"
#: only CALL sites count — docstrings may discuss the function freely
NEEDLE = "monotonically_increasing_id()"
WINDOW = 6  # lines of lookback for the marker comment


def lint(streaming_dir: str) -> list[str]:
    problems: list[str] = []
    for path in sorted(glob.glob(os.path.join(streaming_dir, "*.py"))):
        lines = open(path, encoding="utf-8").read().splitlines()
        for i, line in enumerate(lines):
            if NEEDLE not in line:
                continue
            lookback = "\n".join(lines[max(0, i - WINDOW): i + 1])
            if MARKER not in lookback:
                problems.append(
                    f"{path}:{i + 1}: {NEEDLE} without a '{MARKER}' "
                    "marker comment — document the arbitrary-winner "
                    "contract or require seq_col"
                )
    return problems


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    problems = lint(os.path.join(root, "tmdb_index_spark", "streaming"))
    for p in problems:
        print(p)
    if problems:
        return 1
    print("STREAMING ORDER LINT OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
