"""EBCOT Tier-1 code-block coder (T.800 Annex D).

Bit-plane coding of one code-block of wavelet coefficients through
the three-pass schedule (significance propagation, magnitude
refinement, cleanup with run-length mode), 19 MQ contexts, stripe
scan order.  Encoder and decoder are exact mirrors; round-trip over
random blocks of every band orientation is property-tested.

Defaults only: no bypass, no reset/termination-per-pass, no
stripe-causal option, one codeword segment — matching the COD flags
written by codestream.py.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from gdal_boots_ray.kernels.jp2.mq import CTX_RUN, CTX_UNI, MQDecoder, MQEncoder

# --- context formation tables (T.800 D.3.1) -------------------------------

# ZC context from (H, V, D) significant-neighbor counts.
def _zc_lut_ll() -> dict:
    lut = {}
    for h in range(3):
        for v in range(3):
            for d in range(5):
                if h == 2:
                    c = 8
                elif h == 1:
                    c = 7 if v >= 1 else (6 if d >= 1 else 5)
                elif v == 2:
                    c = 4
                elif v == 1:
                    c = 3
                elif d >= 2:
                    c = 2
                elif d == 1:
                    c = 1
                else:
                    c = 0
                lut[(h, v, d)] = c
    return lut


def _zc_lut_hh() -> dict:
    lut = {}
    for h in range(3):
        for v in range(3):
            for d in range(5):
                hv = h + v
                if d >= 3:
                    c = 8
                elif d == 2:
                    c = 7 if hv >= 1 else 6
                elif d == 1:
                    c = 5 if hv >= 2 else (4 if hv == 1 else 3)
                else:
                    c = 2 if hv >= 2 else (1 if hv == 1 else 0)
                lut[(h, v, d)] = c
    return lut


_ZC_LL = _zc_lut_ll()
_ZC_HH = _zc_lut_hh()

# SC context + XOR bit from clamped (chi_h, chi_v) — T.800 Table D.3
_SC = {
    (1, 1): (13, 0),
    (1, 0): (12, 0),
    (1, -1): (11, 0),
    (0, 1): (10, 0),
    (0, 0): (9, 0),
    (0, -1): (10, 1),
    (-1, 1): (11, 1),
    (-1, 0): (12, 1),
    (-1, -1): (13, 1),
}


class _BlockState:
    """Shared encoder/decoder state + context formation over padded
    significance/sign grids."""

    def __init__(self, h: int, w: int, band: str):
        self.h, self.w = h, w
        self.band = band
        # padded by 1 so neighbor reads never branch
        self.sig = np.zeros((h + 2, w + 2), dtype=np.uint8)
        self.sgn = np.zeros((h + 2, w + 2), dtype=np.int8)  # +1 / -1 when significant
        self.visited = np.zeros((h + 2, w + 2), dtype=np.uint8)
        self.refined = np.zeros((h + 2, w + 2), dtype=np.uint8)

    def zc_ctx(self, y: int, x: int) -> int:
        s = self.sig
        i, j = y + 1, x + 1
        hcnt = int(s[i, j - 1]) + int(s[i, j + 1])
        vcnt = int(s[i - 1, j]) + int(s[i + 1, j])
        dcnt = int(s[i - 1, j - 1]) + int(s[i - 1, j + 1]) + int(s[i + 1, j - 1]) + int(s[i + 1, j + 1])
        if self.band == "HL":  # transposed roles of H and V
            hcnt, vcnt = vcnt, hcnt
            return _ZC_LL[(hcnt, vcnt, dcnt)]
        if self.band == "HH":
            return _ZC_HH[(hcnt, vcnt, dcnt)]
        return _ZC_LL[(hcnt, vcnt, dcnt)]

    def sc_ctx(self, y: int, x: int) -> Tuple[int, int]:
        s, g = self.sig, self.sgn
        i, j = y + 1, x + 1
        ch = int(g[i, j - 1]) * int(s[i, j - 1]) + int(g[i, j + 1]) * int(s[i, j + 1])
        cv = int(g[i - 1, j]) * int(s[i - 1, j]) + int(g[i + 1, j]) * int(s[i + 1, j])
        ch = max(-1, min(1, ch))
        cv = max(-1, min(1, cv))
        return _SC[(ch, cv)]

    def mr_ctx(self, y: int, x: int) -> int:
        if self.refined[y + 1, x + 1]:
            return 16
        s = self.sig
        i, j = y + 1, x + 1
        any_nb = (
            s[i, j - 1] or s[i, j + 1] or s[i - 1, j] or s[i + 1, j]
            or s[i - 1, j - 1] or s[i - 1, j + 1] or s[i + 1, j - 1] or s[i + 1, j + 1]
        )
        return 15 if any_nb else 14

    def any_sig_neighbor(self, y: int, x: int) -> bool:
        s = self.sig
        i, j = y + 1, x + 1
        return bool(
            s[i, j - 1] or s[i, j + 1] or s[i - 1, j] or s[i + 1, j]
            or s[i - 1, j - 1] or s[i - 1, j + 1] or s[i + 1, j - 1] or s[i + 1, j + 1]
        )


def _stripes(h: int):
    for y0 in range(0, h, 4):
        yield y0, min(4, h - y0)


_SCAN_CACHE: dict = {}


def _scan_order(h: int, w: int):
    """(ys, xs) index arrays in stripe-column scan order, cached."""
    key = (h, w)
    got = _SCAN_CACHE.get(key)
    if got is None:
        ys_l, xs_l = [], []
        for y0, sh in _stripes(h):
            xs_l.append(np.repeat(np.arange(w), sh))
            ys_l.append(y0 + np.tile(np.arange(sh), w))
        got = _SCAN_CACHE[key] = (np.concatenate(ys_l), np.concatenate(xs_l))
    return got


def encode_block(coefs: np.ndarray, band: str) -> Tuple[bytes, int]:
    """Encode one code-block.  Returns (codeword, n_bitplanes)."""
    coefs = np.asarray(coefs, dtype=np.int64)
    h, w = coefs.shape
    mags = np.abs(coefs)
    maxmag = int(mags.max()) if mags.size else 0
    nplanes = int(maxmag).bit_length()
    if nplanes == 0:
        return b"", 0
    st = _BlockState(h, w, band)
    neg = coefs < 0
    mq = MQEncoder()

    for p in range(nplanes - 1, -1, -1):
        bits = ((mags >> p) & 1).astype(np.uint8)
        if p != nplanes - 1:
            _spp(mq, st, bits, neg, encode=True)
            _mrp(mq, st, bits, encode=True)
        _cup(mq, st, bits, neg, encode=True)
        st.visited[:] = 0
    return mq.flush(), nplanes


def decode_block(data: bytes, nplanes: int, h: int, w: int, band: str) -> np.ndarray:
    """Decode one code-block back to int32 coefficients."""
    out_mag = np.zeros((h, w), dtype=np.int64)
    if nplanes == 0:
        return out_mag.astype(np.int32)
    st = _BlockState(h, w, band)
    neg = np.zeros((h, w), dtype=bool)
    mq = MQDecoder(data)
    for p in range(nplanes - 1, -1, -1):
        bits = np.zeros((h, w), dtype=np.uint8)
        if p != nplanes - 1:
            _spp(mq, st, bits, neg, encode=False)
            _mrp(mq, st, bits, encode=False)
        _cup(mq, st, bits, neg, encode=False)
        out_mag |= bits.astype(np.int64) << p
        st.visited[:] = 0
    vals = out_mag.astype(np.int32)
    vals[neg] *= -1
    return vals


# --- the three passes (shared encoder/decoder walk) -----------------------


def _code_sign(mq, st: _BlockState, y: int, x: int, neg, encode: bool) -> None:
    ctx, xor = st.sc_ctx(y, x)
    if encode:
        sbit = 1 if neg[y, x] else 0
        mq.encode(sbit ^ xor, ctx)
    else:
        sbit = mq.decode(ctx) ^ xor
        neg[y, x] = bool(sbit)
    st.sgn[y + 1, x + 1] = -1 if neg[y, x] else 1


def _make_significant(st: _BlockState, y: int, x: int) -> None:
    st.sig[y + 1, x + 1] = 1


def _spp(mq, st: _BlockState, bits, neg, encode: bool) -> None:
    h, w = st.h, st.w
    for y0, sh in _stripes(h):
        for x in range(w):
            for dy in range(sh):
                y = y0 + dy
                if st.sig[y + 1, x + 1] or not st.any_sig_neighbor(y, x):
                    continue
                ctx = st.zc_ctx(y, x)
                if encode:
                    b = int(bits[y, x])
                    mq.encode(b, ctx)
                else:
                    b = mq.decode(ctx)
                    bits[y, x] = b
                st.visited[y + 1, x + 1] = 1
                if b:
                    _make_significant(st, y, x)
                    _code_sign(mq, st, y, x, neg, encode)


def _mrp(mq, st: _BlockState, bits, encode: bool) -> None:
    """Magnitude refinement, vectorized context formation: the
    candidate set (significant, not SPP-visited this plane) and every
    MR context are FIXED for the whole pass — significance never
    changes in MRP and `refined` only affects the sample itself — so
    only the sequential MQ symbol loop remains per-sample."""
    h, w = st.h, st.w
    ys, xs = _scan_order(h, w)
    s = st.sig
    cand = (s[ys + 1, xs + 1] == 1) & (st.visited[ys + 1, xs + 1] == 0)
    if not cand.any():
        return
    cy, cx = ys[cand], xs[cand]
    i, j = cy + 1, cx + 1
    nb = (
        s[i, j - 1] + s[i, j + 1] + s[i - 1, j] + s[i + 1, j]
        + s[i - 1, j - 1] + s[i - 1, j + 1] + s[i + 1, j - 1] + s[i + 1, j + 1]
    )
    ctxs = np.where(st.refined[i, j] == 1, 16, np.where(nb > 0, 15, 14))
    if encode:
        enc = mq.encode
        bvals = bits[cy, cx]
        for b, c in zip(bvals.tolist(), ctxs.tolist()):
            enc(b, c)
    else:
        dec = mq.decode
        out = np.fromiter((dec(c) for c in ctxs.tolist()), dtype=np.uint8, count=len(ctxs))
        bits[cy, cx] = out
    st.refined[i, j] = 1


def _cup(mq, st: _BlockState, bits, neg, encode: bool) -> None:
    h, w = st.h, st.w
    for y0, sh in _stripes(h):
        for x in range(w):
            dy = 0
            # run-length mode: full stripe, all four insignificant,
            # no significant neighborhoods, none visited
            if sh == 4 and all(
                not st.sig[y0 + k + 1, x + 1]
                and not st.visited[y0 + k + 1, x + 1]
                and not st.any_sig_neighbor(y0 + k, x)
                for k in range(4)
            ):
                if encode:
                    col = [int(bits[y0 + k, x]) for k in range(4)]
                    if not any(col):
                        mq.encode(0, CTX_RUN)
                        continue
                    mq.encode(1, CTX_RUN)
                    r = col.index(1)
                    mq.encode((r >> 1) & 1, CTX_UNI)
                    mq.encode(r & 1, CTX_UNI)
                else:
                    if mq.decode(CTX_RUN) == 0:
                        continue
                    r = (mq.decode(CTX_UNI) << 1) | mq.decode(CTX_UNI)
                    bits[y0 + r, x] = 1
                y = y0 + r
                _make_significant(st, y, x)
                _code_sign(mq, st, y, x, neg, encode)
                dy = r + 1
            for k in range(dy, sh):
                y = y0 + k
                if st.sig[y + 1, x + 1] or st.visited[y + 1, x + 1]:
                    continue
                ctx = st.zc_ctx(y, x)
                if encode:
                    b = int(bits[y, x])
                    mq.encode(b, ctx)
                else:
                    b = mq.decode(ctx)
                    bits[y, x] = b
                if b:
                    _make_significant(st, y, x)
                    _code_sign(mq, st, y, x, neg, encode)
