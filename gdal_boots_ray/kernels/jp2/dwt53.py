"""Reversible 5/3 discrete wavelet transform (T.800 Annex F), the
lossless filter bank of JPEG 2000, as vectorized NumPy lifting.

Whole-sample symmetric extension at both ends; integer lifting with
arithmetic-shift floors, so fwd/inv are exact inverses on any int
input (perfect reconstruction property-tested for every length
parity).  Subband origin parity is even everywhere (single tile at
(0,0)).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _fwd1d(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split last axis into (low s, high d).  len >= 1."""
    n = x.shape[-1]
    if n == 1:
        return x.copy(), x[..., :0]
    even = x[..., ::2]
    odd = x[..., 1::2]
    ne, no = even.shape[-1], odd.shape[-1]
    if ne == no:  # even length: virtual x[N] = x[N-2]
        even_next = np.concatenate([even[..., 1:], even[..., -1:]], axis=-1)
    else:
        even_next = even[..., 1:]
    d = odd - ((even[..., :no] + even_next) >> 1)
    d_nm1 = np.concatenate([d[..., :1], d[..., : ne - 1]], axis=-1)
    if ne > no:  # odd length: virtual d[no] = d[no-1]
        d_n = np.concatenate([d, d[..., -1:]], axis=-1)
    else:
        d_n = d
    s = even + ((d_nm1 + d_n + 2) >> 2)
    return s, d


def _inv1d(s: np.ndarray, d: np.ndarray) -> np.ndarray:
    ne, no = s.shape[-1], d.shape[-1]
    n = ne + no
    if no == 0:
        return s.copy()
    d_nm1 = np.concatenate([d[..., :1], d[..., : ne - 1]], axis=-1)
    if ne > no:
        d_n = np.concatenate([d, d[..., -1:]], axis=-1)
    else:
        d_n = d
    even = s - ((d_nm1 + d_n + 2) >> 2)
    if ne == no:
        even_next = np.concatenate([even[..., 1:], even[..., -1:]], axis=-1)
    else:
        even_next = even[..., 1:]
    odd = d + ((even[..., :no] + even_next) >> 1)
    out = np.empty(s.shape[:-1] + (n,), dtype=s.dtype)
    out[..., ::2] = even
    out[..., 1::2] = odd
    return out


def fwd2d(a: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One DWT level: (LL, HL, LH, HH).  HL = horizontally high."""
    sc, dc = _fwd1d(a)  # along columns' axis (last = x)
    ll_t, lh_t = _fwd1d(np.swapaxes(sc, -1, -2))
    hl_t, hh_t = _fwd1d(np.swapaxes(dc, -1, -2))
    return (
        np.swapaxes(ll_t, -1, -2),
        np.swapaxes(hl_t, -1, -2),
        np.swapaxes(lh_t, -1, -2),
        np.swapaxes(hh_t, -1, -2),
    )


def inv2d(ll: np.ndarray, hl: np.ndarray, lh: np.ndarray, hh: np.ndarray) -> np.ndarray:
    sc = np.swapaxes(_inv1d(np.swapaxes(ll, -1, -2), np.swapaxes(lh, -1, -2)), -1, -2)
    dc = np.swapaxes(_inv1d(np.swapaxes(hl, -1, -2), np.swapaxes(hh, -1, -2)), -1, -2)
    return _inv1d(sc, dc)


def forward(a: np.ndarray, levels: int) -> Tuple[np.ndarray, List[Tuple[np.ndarray, np.ndarray, np.ndarray]]]:
    """Multi-level Mallat decomposition.  Returns (LL_n, bands) with
    bands[i] = (HL, LH, HH) of level i+1 (finest first)."""
    a = a.astype(np.int32)
    bands = []
    ll = a
    for _ in range(levels):
        ll, hl, lh, hh = fwd2d(ll)
        bands.append((hl, lh, hh))
    return ll, bands


def inverse(ll: np.ndarray, bands: List[Tuple[np.ndarray, np.ndarray, np.ndarray]]) -> np.ndarray:
    for hl, lh, hh in reversed(bands):
        ll = inv2d(ll, hl, lh, hh)
    return ll
