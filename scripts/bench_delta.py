"""Per-query bench delta table: current bench run vs the recorded
BENCH_r{N}.json rounds.

Usage:
    python scripts/bench_delta.py                 # compare committed rounds
    python scripts/bench_delta.py new.json        # also diff a fresh run

Flags queries whose latest time exceeds the best prior round by more
than ``THRESH`` (default 1.3x) so a regression is visible at commit
time instead of at the next judge round.
"""

from __future__ import annotations

import glob
import json
import os
import sys

THRESH = float(os.environ.get("BENCH_DELTA_THRESH", "1.3"))


def load_rounds(repo_root: str):
    rounds = []
    for p in sorted(glob.glob(os.path.join(repo_root, "BENCH_r*.json"))):
        try:
            with open(p) as fd:
                d = json.load(fd)
        except (OSError, json.JSONDecodeError):
            continue
        # driver-recorded rounds wrap the bench line under "parsed"
        rounds.append((os.path.basename(p), d.get("parsed", d)))
    return rounds


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = load_rounds(root)
    for extra in sys.argv[1:]:
        with open(extra) as fd:
            rounds.append((os.path.basename(extra), json.load(fd)))
    if not rounds:
        print("no BENCH_r*.json found")
        return 1
    names: list = []
    for _, d in rounds:
        for q in d.get("queries", {}):
            if q not in names:
                names.append(q)
    header = ["query"] + [r[0].replace("BENCH_", "").replace(".json", "") for r in rounds] + ["flag"]
    widths = [max(24, len(header[0]))] + [9] * (len(rounds)) + [6]
    print("  ".join(h.ljust(w) for h, w in zip(header, widths)))
    flagged = 0
    for q in names:
        vals = [d.get("queries", {}).get(q) for _, d in rounds]
        cells = [f"{v:.2f}" if isinstance(v, (int, float)) else "-" for v in vals]
        prior = [v for v in vals[:-1] if isinstance(v, (int, float))]
        last = vals[-1]
        flag = ""
        if prior and isinstance(last, (int, float)) and last > THRESH * min(prior):
            flag = f">{THRESH}x"
            flagged += 1
        print("  ".join(c.ljust(w) for c, w in zip([q] + cells + [flag], widths)))
    hl = [d.get("value") for _, d in rounds]
    print("\nheadline:", "  ".join(f"{r[0]}={v}" for r, v in zip(rounds, hl)))
    if flagged:
        print(f"\n{flagged} queries regressed beyond {THRESH}x of their best prior round")
    return 0


if __name__ == "__main__":
    sys.exit(main())
