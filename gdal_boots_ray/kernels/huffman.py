"""Shared length-limited Huffman construction (package-merge).

Optimal code lengths under a maximum-length constraint with Kraft
EQUALITY by construction (sum 2^-len == 1), which is exactly what
both consumers need: zstd Huffman weights require the slot total to
be a power of two (kernels/zstd.py), and VP8L canonical prefix codes
require a fully-subscribed table (kernels/webp.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def package_merge_lengths(counts: np.ndarray, limit: int) -> Optional[Dict[int, int]]:
    """Histogram -> {symbol: code length} for the present symbols, or
    None when fewer than 2 symbols are present (degenerate: caller
    uses an RLE/raw/single-symbol representation) or the alphabet
    cannot fit the length limit."""
    present = np.flatnonzero(counts)
    n = len(present)
    if n < 2 or n > (1 << limit):
        return None
    leaf_items: List[Tuple[int, tuple]] = sorted(
        (int(counts[s]), (int(s),)) for s in present
    )
    prev: List[Tuple[int, tuple]] = []
    for _ in range(limit):
        packs = [
            (prev[i][0] + prev[i + 1][0], prev[i][1] + prev[i + 1][1])
            for i in range(0, len(prev) - 1, 2)
        ]
        prev = sorted(leaf_items + packs)
    length: Dict[int, int] = {}
    for _, syms in prev[: 2 * n - 2]:
        for s in syms:
            length[s] = length.get(s, 0) + 1
    return length
