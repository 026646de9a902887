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


def _huffman_depths(ws: List[int]) -> List[int]:
    """Two-queue Huffman over weights sorted ascending -> leaf depths
    (O(n), deterministic: ties pop the leaf queue first).  A full
    binary tree, so Kraft EQUALITY holds by construction."""
    from collections import deque

    n = len(ws)
    weight = list(ws) + [0] * (n - 1)
    parent = [0] * (2 * n - 1)
    leaf = deque(range(n))
    node: deque = deque()
    nxt = n

    def pop_min() -> int:
        if leaf and (not node or weight[leaf[0]] <= weight[node[0]]):
            return leaf.popleft()
        return node.popleft()

    for _ in range(n - 1):
        a = pop_min()
        b = pop_min()
        weight[nxt] = weight[a] + weight[b]
        parent[a] = parent[b] = nxt
        node.append(nxt)
        nxt += 1
    root = 2 * n - 2
    depth = [0] * (2 * n - 1)
    for i in range(root - 1, -1, -1):  # parents are created after children
        depth[i] = depth[parent[i]] + 1
    return depth[:n]


def package_merge_lengths(counts: np.ndarray, limit: int) -> Optional[Dict[int, int]]:
    """Histogram -> {symbol: code length} for the present symbols, or
    None when fewer than 2 symbols are present (degenerate: caller
    uses an RLE/raw/single-symbol representation) or the alphabet
    cannot fit the length limit.

    Fast path: plain two-queue Huffman (optimal, Kraft equality); the
    O(n * limit) package-merge below only runs when the unconstrained
    tree exceeds ``limit`` (needs a fibonacci-skewed histogram —
    rare), where it recovers the optimal LENGTH-LIMITED code."""
    present = np.flatnonzero(counts)
    n = len(present)
    if n < 2 or n > (1 << limit):
        return None
    order = np.lexsort((present, counts[present]))  # (weight, symbol)
    syms = present[order]
    depths = _huffman_depths([int(c) for c in counts[syms]])
    if max(depths) <= limit:
        return {int(s): d for s, d in zip(syms, depths)}
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
