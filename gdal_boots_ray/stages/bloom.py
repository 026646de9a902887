"""Bloom-filter semi-join pushdown (sideways information passing).

In a key-shuffle join where one side carries heavy payloads (decoded
tiles) and the other side touches only a subset of keys, shipping a
compact superset of the light side's key set lets the heavy side drop
non-matching rows BEFORE the expensive work (decode) and before the
exchange.  The filter is a classic Bloom bitmap: m bits, k probes via
double hashing — false positives only (a pure superset filter, so
join results are bit-identical), no false negatives.

Scale shape: the bitmap build is a per-batch partial (one m/8-byte
row per batch) OR-merged through a bounded bucket tree — the same
exchange pattern as the HLL sketch, no key shuffle.  The finished
bitmap (128 KB at m=2^20) broadcasts via ``ray.put`` and each filter
task tests membership vectorized.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa

from gdal_boots_ray.kernels.sketch import _splitmix64

M_BITS_DEFAULT = 1 << 20  # 128 KB bitmap, <1% FP up to ~10^5 keys at k=4
K_PROBES = 4


def _probe_positions(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, K_PROBES) bit positions by double hashing."""
    h1 = _splitmix64(np.asarray(keys, dtype=np.uint64))
    h2 = _splitmix64(h1 ^ np.uint64(0xA5A5A5A5DEADBEEF)) | np.uint64(1)
    i = np.arange(K_PROBES, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)
    return pos


def bloom_partial(keys: np.ndarray, m_bits: int = M_BITS_DEFAULT) -> np.ndarray:
    """Bitmap words (uint64[m_bits/64]) for one batch of int keys."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    pos = _probe_positions(keys, m_bits).ravel()
    np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64), np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_test(words: np.ndarray, keys: np.ndarray, m_bits: int = M_BITS_DEFAULT) -> np.ndarray:
    """Vectorized membership mask (true = possibly present)."""
    pos = _probe_positions(keys, m_bits)
    bits = (words[(pos >> np.uint64(6)).astype(np.int64)] >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


def build_bloom(
    ds,
    key_fn: Callable[[pa.Table], np.ndarray],
    m_bits: int = M_BITS_DEFAULT,
    fanin: int = 64,
    levels: int = 2,
) -> np.ndarray:
    """Distributed bitmap build: per-batch partials -> map-side OR
    tree -> driver OR.  ``key_fn`` maps an Arrow batch to an int key
    array — the full data stream never converts to pandas; only the
    m/8-byte word rows are exchanged, as Arrow binary cells.

    The OR merge needs no key co-location, so the tree is plain
    ``map_batches(combine, batch_size=fanin)`` stages — each level
    shrinks the partial count by ``fanin`` with ZERO shuffle (the
    earlier bucketed-groupby merge paid a full Sort exchange, seconds
    of fixed cost, to move a few hundred KB).  Two levels cover 10^5+
    partials; the driver then ORs at most ~fanin rows."""

    def partial(batch: pa.Table) -> pa.Table:
        words = bloom_partial(key_fn(batch), m_bits)
        return pa.table({"words": pa.array([words.tobytes()], pa.binary())})

    def combine(g: pa.Table) -> pa.Table:
        acc = np.zeros(m_bits // 64, dtype=np.uint64)
        for w in g.column("words").to_pylist():
            acc |= np.frombuffer(w, dtype=np.uint64)
        return pa.table({"words": pa.array([acc.tobytes()], pa.binary())})

    out = ds.map_batches(partial, batch_format="pyarrow")
    for _ in range(levels):
        out = out.map_batches(combine, batch_format="pyarrow", batch_size=fanin)
    acc = np.zeros(m_bits // 64, dtype=np.uint64)
    for row in out.take_all():
        acc |= np.frombuffer(row["words"], dtype=np.uint64)
    return acc
