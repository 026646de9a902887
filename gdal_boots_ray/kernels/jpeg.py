"""Baseline sequential JPEG (ITU-T T.81 / ISO 10918-1), from scratch.

Closes the reference's ``GTiff.Compress.jpeg`` enum value
(reference options.py:66-80) and gives the engine a second lossy
codec family beside JPEG 2000 (kernels/jp2) for the input_hint's
PSNR >= 40 dB fidelity gate.  Pure numpy + stdlib:

- 8x8 forward/inverse DCT as orthonormal matrix products over ALL
  blocks at once (einsum) — exact to the T.81 reference FDCT/IDCT
  up to float rounding;
- Annex K quantization tables scaled by the public IJG quality
  formula (scale = 5000/Q below 50, 200-2Q above);
- Annex K "typical" Huffman tables (DC/AC, luma/chroma), canonical
  code construction straight from the BITS/HUFFVAL lists;
- JFIF container: SOI APP0 DQT SOF0 DHT SOS ... EOI, 0xFF byte
  stuffing in the entropy stream;
- colour images are encoded 4:4:4 (no chroma subsampling) through
  the full-range BT.601 YCbCr transform, mono images as a single
  component — both exactly one 8x8 block per MCU component, so the
  MCU walk is a plain block grid.

Entropy coding is inherently sequential per block (DC prediction +
run-length state), so encode/decode loop over blocks in Python
while everything O(pixels) is vectorized — the same trade the JP2
EBCOT kernel documents.  At the engine's tile sizes (<= 80x64) a
round trip is ~1 ms.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

# --- constants (ITU-T T.81 Annex K) ------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

QTBL_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QTBL_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# BITS (codes per length 1..16) and HUFFVAL lists, Annex K.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix
_D = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_D *= 0.5
_D[0, :] *= 1.0 / np.sqrt(2.0)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg formula)."""
    q = int(np.clip(quality, 1, 100))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int64)


def _build_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length), canonical per T.81 C.2."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decoder(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) -> symbol."""
    enc = _build_codes(bits, vals)
    return {(ln, code): sym for sym, (code, ln) in enc.items()}


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.nbits = 0


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                # marker: per T.81 the entropy stream pads with 1-bits; feed
                # 0xFF without consuming the marker (pos stays on it)
                self.pos -= 1
                b = 0xFF
                self.acc = (self.acc << 8) | b
                self.nbits += 8
                return
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_value(v: int) -> Tuple[int, int]:
    """(size category, magnitude bits) per T.81 F.1.2.1 / F.1.2.2."""
    s = _csize(v)
    if v < 0:
        v = v + (1 << s) - 1
    return s, v


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    if v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


def _to_blocks(comp: np.ndarray) -> Tuple[np.ndarray, int, int]:
    """Pad (h,w) float component to 8x8 blocks (edge replicate); return
    (nby*nbx, 8, 8) blocks in raster block order."""
    h, w = comp.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        comp = np.pad(comp, ((0, ph), (0, pw)), mode="edge")
    hh, ww = comp.shape
    nby, nbx = hh // 8, ww // 8
    blocks = comp.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, nby, nbx


def _from_blocks(blocks: np.ndarray, nby: int, nbx: int, h: int, w: int) -> np.ndarray:
    full = blocks.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return full[:h, :w]


def _fdct_quant(comp: np.ndarray, qtbl: np.ndarray) -> Tuple[np.ndarray, int, int]:
    blocks, nby, nbx = _to_blocks(comp.astype(np.float64) - 128.0)
    coefs = np.einsum("ij,njk,lk->nil", _D, blocks, _D, optimize=True)
    quant = np.round(coefs / qtbl[None]).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, ZIGZAG]
    return zz, nby, nbx


def _dequant_idct(zz: np.ndarray, qtbl: np.ndarray, nby: int, nbx: int, h: int, w: int) -> np.ndarray:
    coefs = (zz[:, UNZIGZAG].reshape(-1, 8, 8) * qtbl[None]).astype(np.float64)
    blocks = np.einsum("ji,njk,kl->nil", _D, coefs, _D, optimize=True)
    return _from_blocks(blocks, nby, nbx, h, w) + 128.0


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[0].astype(np.float64), img[1].astype(np.float64), img[2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr])


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[0], ycc[1] - 128.0, ycc[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b])


def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(payload) + 2).to_bytes(2, "big") + payload


def jpeg_encode(img: np.ndarray, quality: int = 92) -> bytes:
    """Encode (h,w) or (bands,h,w) uint8 (bands in {1,3}) as baseline JFIF."""
    if img.ndim == 2:
        img = img[None]
    if img.dtype != np.uint8:
        raise ValueError("baseline JPEG is 8-bit only")
    bands, h, w = img.shape
    if bands not in (1, 3):
        raise ValueError("JPEG supports 1 or 3 bands")
    if h > 65535 or w > 65535:
        raise ValueError("image too large for JPEG")

    ql = _quality_scale(QTBL_LUMA, quality)
    qc = _quality_scale(QTBL_CHROMA, quality)
    comps = img.astype(np.float64) if bands == 1 else _rgb_to_ycbcr(img)

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    planes = []
    for ci in range(bands):
        qtbl = ql if ci == 0 else qc
        zz, nby, nbx = _fdct_quant(comps[ci], qtbl)
        planes.append(zz)
    n_blocks = planes[0].shape[0]

    wtr = _BitWriter()
    pred = [0] * bands
    for bi in range(n_blocks):
        for ci in range(bands):
            dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            blk = planes[ci][bi]
            diff = int(blk[0]) - pred[ci]
            pred[ci] = int(blk[0])
            s, mag = _encode_value(diff)
            code, ln = dct[s]
            wtr.put(code, ln)
            if s:
                wtr.put(mag, s)
            nz = np.nonzero(blk[1:])[0]
            prev = 0
            for idx in nz:
                run = int(idx) - prev
                while run >= 16:
                    code, ln = act[0xF0]
                    wtr.put(code, ln)
                    run -= 16
                s, mag = _encode_value(int(blk[1 + idx]))
                code, ln = act[(run << 4) | s]
                wtr.put(code, ln)
                wtr.put(mag, s)
                prev = int(idx) + 1
            if prev != 63:
                code, ln = act[0x00]  # EOB
                wtr.put(code, ln)
    wtr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += _marker(0xDB, bytes([0x00]) + bytes(ql.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if bands == 3:
        out += _marker(0xDB, bytes([0x01]) + bytes(qc.reshape(-1)[ZIGZAG].astype(np.uint8)))
    # SOF0: precision 8, h, w, components (id, sampling 0x11, qtbl)
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([bands])
    for ci in range(bands):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _marker(0xC0, bytes(sof))

    def _dht(cls: int, tid: int, bits: List[int], vals: List[int]) -> bytes:
        return _marker(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out += _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if bands == 3:
        out += _dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytearray([bands])
    for ci in range(bands):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, bytes(sos))
    out += wtr.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode baseline JFIF produced by :func:`jpeg_encode` (single
    scan, 4:4:4, one Huffman/quant table pair).  Returns (bands,h,w)
    uint8."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtbls: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, Dict[Tuple[int, int], int]] = {}
    huff_ac: Dict[int, Dict[Tuple[int, int], int]] = {}
    h = w = 0
    comps: List[Tuple[int, int, int]] = []  # (id, qtbl, sampling)
    scan_comps: List[Tuple[int, int, int]] = []  # (id, dc_tbl, ac_tbl)
    scan_start = -1

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker sync at {pos}")
        tag = data[pos + 1]
        if tag == 0xD9:
            break
        seglen = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + seglen]
        if tag == 0xDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(body[off + 1 : off + 65], np.uint8).astype(np.int64)
                qtbls[tq] = tbl[UNZIGZAG].reshape(8, 8)
                off += 65
        elif tag == 0xC0:
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            for ci in range(nc):
                cid, samp, tq = body[6 + ci * 3 : 9 + ci * 3]
                if samp != 0x11:
                    raise ValueError("subsampled JPEG unsupported (engine emits 4:4:4)")
                comps.append((cid, tq, samp))
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif tag == 0xC4:
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(body[off + 17 : off + 17 + nv])
                (huff_ac if cls else huff_dc)[tid] = _build_decoder(bits, vals)
                off += 17 + nv
        elif tag == 0xDA:
            ns = body[0]
            for si in range(ns):
                cid = body[1 + si * 2]
                tt = body[2 + si * 2]
                scan_comps.append((cid, tt >> 4, tt & 0xF))
            scan_start = pos + 2 + seglen
            break
        elif tag == 0xDD:
            raise ValueError("restart intervals unsupported")
        pos += 2 + seglen
    if scan_start < 0 or not comps:
        raise ValueError("truncated JPEG (no scan)")

    bands = len(comps)
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    n_blocks = nby * nbx
    planes = [np.zeros((n_blocks, 64), dtype=np.int64) for _ in range(bands)]
    rdr = _BitReader(data, scan_start)
    pred = [0] * bands

    def _decode_sym(table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | rdr.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    for bi in range(n_blocks):
        for ci in range(bands):
            _, dct_id, act_id = scan_comps[ci]
            dct, act = huff_dc[dct_id], huff_ac[act_id]
            blk = planes[ci][bi]
            s = _decode_sym(dct)
            diff = _extend(rdr.bits(s), s) if s else 0
            pred[ci] += diff
            blk[0] = pred[ci]
            k = 1
            while k < 64:
                rs = _decode_sym(act)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break  # EOB
                k += r
                blk[k] = _extend(rdr.bits(s), s)
                k += 1

    out = np.empty((bands, h, w), dtype=np.float64)
    for ci in range(bands):
        qtbl = qtbls[comps[ci][1]]
        out[ci] = _dequant_idct(planes[ci], qtbl, nby, nbx, h, w)
    if bands == 3:
        out = _ycbcr_to_rgb(out)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
