"""Mergeable cardinality sketch: HyperLogLog (Flajolet et al. 2007).

The count-distinct a 100 TB pipeline actually runs: an exact
``count(DISTINCT url)`` is a full shuffle of every key; the HLL
answer is a 4 KB register array that merges by elementwise max, so
per-batch partials reduce through any tree with no key exchange at
all.  Register math is fully vectorized (binary-search bit-length,
no per-value Python).

Precision p=12 -> m=4096 registers, standard error 1.04/sqrt(m) ~
1.6%; the stage asserts the estimate against an exact distributed
count in the oracle gate (|est/exact - 1| < 5% ~ 3 sigma).
"""

from __future__ import annotations

import numpy as np

P = 12
M = 1 << P  # 4096 registers
_ALPHA = 0.7213 / (1.0 + 1.079 / M)  # alpha_m for m >= 128


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (Steele et al.) of int-like input."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z = (z + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(1)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def hash64(values) -> np.ndarray:
    """64-bit hashes for an int array or a sequence of strings."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return _splitmix64(arr)
    import pandas as pd

    return pd.util.hash_array(arr.astype(str)).astype(np.uint64)


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 (0 for x == 0)."""
    x = x.copy()
    bl = np.zeros(x.shape, dtype=np.int64)
    nz = x > 0
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        x[m] >>= np.uint64(s)
    bl[nz] += 1
    return bl


def hll_partial(hashes: np.ndarray) -> np.ndarray:
    """Registers (uint8[M]) for one batch of 64-bit hashes."""
    idx = (hashes >> np.uint64(64 - P)).astype(np.int64)
    w = (hashes << np.uint64(P)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    # after the left shift the 52-bit suffix occupies the top of w,
    # so its leading-zero count is 64 - bit_length(w)
    rho = (64 - _bit_length(w)) + 1
    rho = np.clip(rho, 1, 64 - P + 1).astype(np.uint8)
    reg = np.zeros(M, dtype=np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def hll_merge(regs: np.ndarray) -> np.ndarray:
    """Merge a stack of register arrays (k, M) -> (M,) by max."""
    return regs.max(axis=0).astype(np.uint8)


def hll_estimate(reg: np.ndarray) -> float:
    """Cardinality estimate with the standard small-range (linear
    counting) correction."""
    reg = reg.astype(np.float64)
    est = _ALPHA * M * M / np.sum(np.exp2(-reg))
    zeros = int(np.sum(reg == 0))
    if est <= 2.5 * M and zeros > 0:
        est = M * np.log(M / zeros)
    return float(est)
