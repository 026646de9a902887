"""JPEG 2000 codestream Tier-2 (T.800 Annex B) + JP2 container.

Writes/reads a lossless single-tile codestream: SOC/SIZ/COD/QCD
headers, one LRCP packet per (layer=1, resolution, component),
tag-tree coded packet headers (inclusion + zero-bitplanes), Lblock
length signaling, 0xFF-stuffed header bits, EOC — and the minimal
JP2 box wrapper (signature/ftyp/jp2h/jp2c).

Profile: single tile at (0,0), 5/3 reversible, 64x64 code-blocks,
one quality layer, no precinct partition (PPx=PPy=15), optional RCT
for 3-component images, all coding passes in layer 0.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from gdal_boots_ray.kernels.jp2 import dwt53, t1

CB = 64  # code-block side
GUARD = 2


# --- packet-header bit I/O with 0xFF stuffing -----------------------------


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0  # bits currently in acc
        self.limit = 8

    def put(self, bit: int) -> None:
        self.acc = (self.acc << 1) | (bit & 1)
        self.nbits += 1
        if self.nbits == self.limit:
            self.bytes.append(self.acc)
            self.limit = 7 if self.acc == 0xFF else 8
            self.acc = 0
            self.nbits = 0

    def put_bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1)

    def flush(self) -> bytes:
        if self.nbits:
            self.acc <<= self.limit - self.nbits
            self.bytes.append(self.acc)
            if self.acc == 0xFF:
                self.bytes.append(0)
        elif self.bytes and self.bytes[-1] == 0xFF:
            self.bytes.append(0)
        return bytes(self.bytes)


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.last = 0

    def get(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            self.nbits = 7 if self.last == 0xFF else 8
            self.acc = b
            self.last = b
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get()
        return v

    def bytes_consumed(self) -> int:
        n = self.pos
        if self.last == 0xFF and self.pos < len(self.data):
            n += 1  # stuffing byte after a trailing 0xFF
        return n


# --- tag tree (B.10.2) ----------------------------------------------------


class TagTree:
    def __init__(self, w: int, h: int):
        self.dims: List[Tuple[int, int]] = []
        while True:
            self.dims.append((w, h))
            if w == 1 and h == 1:
                break
            w, h = (w + 1) // 2, (h + 1) // 2
        self.value = [np.full((hh, ww), 1 << 30, dtype=np.int64) for ww, hh in self.dims]
        self.low = [np.zeros((hh, ww), dtype=np.int64) for ww, hh in self.dims]
        self.known = [np.zeros((hh, ww), dtype=bool) for ww, hh in self.dims]

    def set_values(self, leaf: np.ndarray) -> None:
        self.value[0][:, :] = leaf
        for lvl in range(1, len(self.dims)):
            below = self.value[lvl - 1]
            ww, hh = self.dims[lvl]
            for y in range(hh):
                for x in range(ww):
                    self.value[lvl][y, x] = below[2 * y : 2 * y + 2, 2 * x : 2 * x + 2].min()

    def _path(self, x: int, y: int):
        out = []
        for lvl in range(len(self.dims)):
            out.append((lvl, x >> lvl, y >> lvl))
        return reversed(out)

    def encode(self, bw: BitWriter, x: int, y: int, threshold: int) -> None:
        low = 0
        for lvl, xx, yy in self._path(x, y):
            if low > self.low[lvl][yy, xx]:
                self.low[lvl][yy, xx] = low
            else:
                low = int(self.low[lvl][yy, xx])
            v = int(self.value[lvl][yy, xx])
            while low < threshold:
                if low >= v:
                    if not self.known[lvl][yy, xx]:
                        bw.put(1)
                        self.known[lvl][yy, xx] = True
                    break
                bw.put(0)
                low += 1
                self.low[lvl][yy, xx] = low

    def decode(self, br: BitReader, x: int, y: int, threshold: int) -> int:
        """Returns current lower bound; value known iff known flag."""
        low = 0
        for lvl, xx, yy in self._path(x, y):
            if low > self.low[lvl][yy, xx]:
                self.low[lvl][yy, xx] = low
            else:
                low = int(self.low[lvl][yy, xx])
            while low < threshold and not self.known[lvl][yy, xx]:
                if br.get():
                    self.value[lvl][yy, xx] = low
                    self.known[lvl][yy, xx] = True
                else:
                    low += 1
                    self.low[lvl][yy, xx] = low
        return int(self.value[0][y, x]) if self.known[0][y, x] else low

    def leaf_known(self, x: int, y: int) -> bool:
        return bool(self.known[0][y, x])

    def decode_until_known(self, br: BitReader, x: int, y: int) -> int:
        t = 1
        while not self.leaf_known(x, y):
            self.decode(br, x, y, t)
            t += 1
        return int(self.value[0][y, x])

    def encode_until_known(self, bw: BitWriter, x: int, y: int) -> None:
        v = int(self.value[0][y, x])
        self.encode(bw, x, y, v + 1)


# --- pass-count codeword (Table B.4) --------------------------------------


def _put_npasses(bw: BitWriter, n: int) -> None:
    if n == 1:
        bw.put(0)
    elif n == 2:
        bw.put_bits(0b10, 2)
    elif n <= 5:
        bw.put_bits(0b11, 2)
        bw.put_bits(n - 3, 2)
    elif n <= 36:
        bw.put_bits(0b1111, 4)
        bw.put_bits(n - 6, 5)
    else:
        bw.put_bits(0b111111111, 9)
        bw.put_bits(n - 37, 7)


def _get_npasses(br: BitReader) -> int:
    if br.get() == 0:
        return 1
    if br.get() == 0:
        return 2
    v = br.get_bits(2)
    if v != 3:
        return 3 + v
    v = br.get_bits(5)
    if v != 31:
        return 6 + v
    return 37 + br.get_bits(7)


# --- band/grid geometry ---------------------------------------------------


def _band_shapes(h: int, w: int, levels: int):
    """Per-resolution band shapes, finest-level-first list like
    dwt53.forward: bands[i] = level i+1 (HL, LH, HH) shapes."""
    shapes = []
    hh, ww = h, w
    for _ in range(levels):
        sh, sw = (hh + 1) // 2, (ww + 1) // 2  # low sizes
        dh, dw = hh - sh, ww - sw
        shapes.append({"HL": (sh, dw), "LH": (dh, sw), "HH": (dh, dw)})
        hh, ww = sh, sw
    return (hh, ww), shapes  # LL shape, per-level dict


def _blocks_grid(bh: int, bw_: int) -> Tuple[int, int]:
    return max(1, -(-bh // CB)), max(1, -(-bw_ // CB))


def _iter_blocks(bh: int, bw_: int):
    for by in range(0, max(bh, 1), CB):
        for bx in range(0, max(bw_, 1), CB):
            yield by, bx, min(CB, bh - by), min(CB, bw_ - bx)


# --- per-band encode: code-blocks + packet --------------------------------


def _encode_band_blocks(band_arr: np.ndarray, band_name: str):
    """Phase 1: T1-encode every code-block of a band.  Returns
    (results, max_planes) with results in raster block order."""
    bh, bw_ = band_arr.shape
    if bh == 0 or bw_ == 0:
        return [], 0
    results = []
    maxp = 0
    for by, bx, ch, cw in _iter_blocks(bh, bw_):
        data, npl = t1.encode_block(band_arr[by : by + ch, bx : bx + cw], band_name)
        results.append((data, npl))
        maxp = max(maxp, npl)
    return results, maxp


def _encode_band_packet_part(
    bw: BitWriter, shape: Tuple[int, int], results: list, mb: int, body: bytearray
):
    """Phase 2: tag-tree headers + bodies for one band inside a
    packet.  ``mb`` is the QCD-shared (cross-component max) bit-plane
    count so the imsb tree matches what the decoder derives."""
    bh, bw_ = shape
    if bh == 0 or bw_ == 0:
        return
    gy, gx = _blocks_grid(bh, bw_)
    incl = TagTree(gx, gy)
    imsb = TagTree(gx, gy)
    leaf_incl = np.zeros((gy, gx), dtype=np.int64)
    leaf_imsb = np.zeros((gy, gx), dtype=np.int64)
    for i, (data, npl) in enumerate(results):
        y, x = divmod(i, gx)
        leaf_incl[y, x] = 0 if npl > 0 else 1  # include only non-empty blocks
        leaf_imsb[y, x] = mb - npl if npl > 0 else 0
    incl.set_values(leaf_incl)
    imsb.set_values(leaf_imsb)
    for i, (data, npl) in enumerate(results):
        y, x = divmod(i, gx)
        incl.encode(bw, x, y, 1)
        if npl == 0:
            continue
        imsb.encode_until_known(bw, x, y)
        npasses = 3 * npl - 2
        _put_npasses(bw, npasses)
        lblock = 3
        nbits = lblock + (npasses.bit_length() - 1)
        while len(data) >= (1 << nbits):
            bw.put(1)
            lblock += 1
            nbits += 1
        bw.put(0)
        bw.put_bits(len(data), nbits)
        body.extend(data)


def _decode_band_packet_part(br: BitReader, bh: int, bw_: int, band_name: str, mb: int, segs: list):
    """Parse one band's header entries; append (slice_info) to segs
    for body extraction."""
    if bh == 0 or bw_ == 0:
        return
    gy, gx = _blocks_grid(bh, bw_)
    incl = TagTree(gx, gy)
    imsb = TagTree(gx, gy)
    for i, (by, bx, ch, cw) in enumerate(_iter_blocks(bh, bw_)):
        y, x = divmod(i, gx)
        incl.decode(br, x, y, 1)
        included = incl.leaf_known(x, y) and incl.value[0][y, x] == 0
        if not included:
            segs.append((band_name, by, bx, ch, cw, 0, 0))
            continue
        missing = imsb.decode_until_known(br, x, y)
        npl = mb - missing
        npasses = _get_npasses(br)
        lblock = 3
        while br.get():
            lblock += 1
        nbits = lblock + (npasses.bit_length() - 1)
        ln = br.get_bits(nbits)
        segs.append((band_name, by, bx, ch, cw, npl, ln))


# --- markers --------------------------------------------------------------


def _marker(code: int, payload: bytes) -> bytes:
    return struct.pack(">HH", code, len(payload) + 2) + payload


def _quality_shifts(quality: float, levels: int) -> dict:
    """quality (0..100] -> per-(res, band) quantization SHIFTS for the
    lossy mode: the finest resolution's HH band drops the most bits,
    coarser resolutions progressively fewer, LL none.  The mapping is
    calibrated so quality=50 keeps PSNR comfortably above the 40 dB
    input_hint gate on 8-bit imagery (HH synthesis gain of the 5/3 is
    < 1, so s bits in HH cost well under s bits of output error)."""
    shifts = {}
    if quality >= 100:
        return shifts
    base = int(min(7, max(1, round((100.0 - float(quality)) / 15.0))))
    for res in range(1, levels + 1):
        s = max(0, base - (levels - res))  # res == levels is finest
        shifts[(res, "HH")] = s
        shifts[(res, "HL")] = max(0, s - 1)
        shifts[(res, "LH")] = max(0, s - 1)
    return shifts


def _quantize_band(arr: np.ndarray, s: int) -> np.ndarray:
    if s <= 0:
        return arr
    return np.sign(arr) * (np.abs(arr) >> s)


def _dequantize_band(arr: np.ndarray, s: int) -> np.ndarray:
    if s <= 0:
        return arr
    mag = np.abs(arr)
    rec = (mag << s) + np.where(mag > 0, 1 << (s - 1), 0)  # midpoint
    return np.sign(arr) * rec


def encode_j2k(
    img: np.ndarray, levels: int = 5, mct: Optional[bool] = None, quality: float = 100
) -> bytes:
    """J2K codestream for (h, w) or (bands, h, w) uint8/16.

    quality=100 (default) is the lossless 5/3 reversible path;
    quality<100 scalar-quantizes detail subbands by power-of-two steps
    (shift recorded in the low 3 bits of each QCD eps byte — the
    reversible path writes 0 there, so lossless streams are
    unchanged).  The reference's JP2OpenJPEG(quality=50) maps here."""
    if img.ndim == 2:
        img = img[None]
    ncomp, h, w = img.shape
    depth = 8 if img.dtype == np.uint8 else 16
    levels = max(0, min(levels, max((min(h, w) - 1).bit_length() - 2, 0)))
    if mct is None:
        mct = ncomp == 3
    planes = img.astype(np.int32) - (1 << (depth - 1))  # DC level shift
    if mct and ncomp == 3:
        r, g, b = planes[0], planes[1], planes[2]
        yy = (r + 2 * g + b) >> 2
        u = b - g
        v = r - g
        planes = np.stack([yy, u, v])

    # wavelet per component (+ optional lossy subband quantization)
    shifts = _quality_shifts(quality, levels)
    comps = []
    for c in range(ncomp):
        ll, bands = dwt53.forward(planes[c], levels)
        if shifts:
            bands = [
                tuple(
                    _quantize_band(b_, shifts.get((levels - i, nm), 0))
                    for nm, b_ in zip(("HL", "LH", "HH"), lvl)
                )
                for i, lvl in enumerate(bands)
            ]
        comps.append((ll, bands))

    (llh, llw), band_shapes = _band_shapes(h, w, levels)

    # phase 1: T1-encode every block; per-(res, band) mb = max planes
    # across components (QCD is shared, so the imsb tag trees must be
    # built against the shared value)
    blocks = [dict() for _ in range(ncomp)]  # (res, band) -> (results, shape)
    band_mbs: dict = {}
    for c in range(ncomp):
        ll, bands = comps[c]
        res_bands = [(0, "LL", ll)]
        for res in range(1, levels + 1):
            hl, lh, hh2 = bands[levels - res]
            res_bands += [(res, "HL", hl), (res, "LH", lh), (res, "HH", hh2)]
        for res, name, arr in res_bands:
            results, maxp = _encode_band_blocks(arr, name)
            blocks[c][(res, name)] = (results, arr.shape)
            band_mbs[(res, name)] = max(band_mbs.get((res, name), 0), maxp)

    # phase 2: packets (LRCP, 1 layer): for each resolution, each comp
    packets: List[bytes] = []
    for res in range(levels + 1):
        names = ("LL",) if res == 0 else ("HL", "LH", "HH")
        for c in range(ncomp):
            bw = BitWriter()
            body = bytearray()
            bw.put(1)  # packet non-empty
            for name in names:
                results, shape = blocks[c][(res, name)]
                _encode_band_packet_part(bw, shape, results, band_mbs[(res, name)], body)
            packets.append(bw.flush() + bytes(body))

    # QCD eps per band: LL then per-res HL, LH, HH; the low 3 bits of
    # each eps byte carry the lossy quantization shift (0 = lossless)
    eps_list = [(max(band_mbs[(0, "LL")] + 1 - GUARD, 0), 0)]
    for res in range(1, levels + 1):
        for name in ("HL", "LH", "HH"):
            eps_list.append(
                (max(band_mbs[(res, name)] + 1 - GUARD, 0), shifts.get((res, name), 0))
            )

    # markers
    siz = struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, w, h, 0, 0, ncomp
    ) + b"".join(struct.pack(">BBB", depth - 1, 1, 1) for _ in range(ncomp))
    cod = struct.pack(
        ">BBHBBBBBBB",
        0,  # Scod: no precincts, no SOP/EPH
        0,  # progression LRCP
        1,  # layers
        1 if (mct and ncomp == 3) else 0,
        levels,
        CB.bit_length() - 3,  # xcb-2 (64 -> 4)
        CB.bit_length() - 3,
        0,  # code-block style: all defaults
        1,  # transformation: 5/3 reversible
        0,  # (pad? no) -- see note below
    )[:-1]
    # struct above packs one extra byte; slice keeps the 9 real bytes
    qcd = bytes([(GUARD << 5) | 0]) + bytes(((e << 3) & 0xFF) | (s & 0x7) for e, s in eps_list)

    tile_body = b"".join(packets)
    sot = struct.pack(">HIBB", 0, 12 + len(tile_body) + 2, 0, 1)
    out = b"".join(
        [
            b"\xff\x4f",  # SOC
            _marker(0xFF51, siz),
            _marker(0xFF52, cod),
            _marker(0xFF5C, qcd),
            _marker(0xFF90, sot),
            b"\xff\x93",  # SOD
            tile_body,
            b"\xff\xd9",  # EOC
        ]
    )
    return out


def decode_j2k(data: bytes) -> np.ndarray:
    if data[0:2] != b"\xff\x4f":
        raise ValueError("not a J2K codestream (missing SOC marker)")
    try:
        return _decode_j2k_inner(data)
    except (ValueError, ImportError):
        raise
    except Exception as exc:  # truncated/corrupt stream
        raise ValueError(f"corrupt or truncated J2K codestream: {exc}") from exc


def _decode_j2k_inner(data: bytes) -> np.ndarray:
    pos = 2
    w = h = ncomp = depth = levels = 0
    mct = 0
    eps_list: List[int] = []
    shift_list: List[int] = []
    tile_body = b""
    while pos < len(data):
        code = struct.unpack(">H", data[pos : pos + 2])[0]
        if code == 0xFFD9:
            break
        if code == 0xFF93:  # SOD: rest of tile-part is body
            pos += 2
            end = data.rfind(b"\xff\xd9")
            tile_body = data[pos:end]
            break
        ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        payload = data[pos + 4 : pos + 2 + ln]
        if code == 0xFF51:  # SIZ
            _, w, h, _, _, _, _, _, _, ncomp = struct.unpack(">HIIIIIIIIH", payload[:36])
            depth = (payload[36] & 0x7F) + 1  # first Ssiz byte after Csiz
        elif code == 0xFF52:  # COD
            mct = payload[4]
            levels = payload[5]
        elif code == 0xFF5C:  # QCD
            eps_list = [b >> 3 for b in payload[1:]]
            shift_list = [b & 0x7 for b in payload[1:]]  # lossy shifts (0 = lossless)
        pos += 2 + ln
    dtype = np.uint8 if depth <= 8 else np.uint16

    (llh, llw), band_shapes = _band_shapes(h, w, levels)
    mbs = [max(e + GUARD - 1, 0) for e in eps_list]

    # parse packets in write order
    comps_bands = []
    for c in range(ncomp):
        ll = np.zeros((llh, llw), dtype=np.int32)
        bands = [
            tuple(np.zeros(band_shapes[i][nm], dtype=np.int32) for nm in ("HL", "LH", "HH"))
            for i in range(levels)
        ]
        comps_bands.append((ll, bands))

    bpos = 0
    bi = 0  # band index into eps/mb order
    for res in range(levels + 1):
        res_mb_base = bi
        for c in range(ncomp):
            br = BitReader(tile_body[bpos:])
            nonempty = br.get()
            segs: list = []
            if res == 0:
                _decode_band_packet_part(br, llh, llw, "LL", mbs[res_mb_base], segs)
            else:
                lvl_idx = levels - res
                shapes = band_shapes[lvl_idx]
                for k, name in enumerate(("HL", "LH", "HH")):
                    sh = shapes[name]
                    _decode_band_packet_part(br, sh[0], sh[1], name, mbs[res_mb_base + k], segs)
            hdr_len = br.bytes_consumed()
            bpos += hdr_len
            for name, by, bx, ch, cw, npl, ln in segs:
                blk = t1.decode_block(tile_body[bpos : bpos + ln], npl, ch, cw, name)
                ll, bands = comps_bands[c]
                if res == 0:
                    ll[by : by + ch, bx : bx + cw] = blk
                else:
                    lvl_idx = levels - res
                    tgt = bands[lvl_idx][("HL", "LH", "HH").index(name)]
                    tgt[by : by + ch, bx : bx + cw] = blk
                bpos += ln
        bi += 1 if res == 0 else 3

    if any(shift_list):
        # dequantize lossy subbands (QCD order: LL, then per-res HL/LH/HH;
        # bands[lvl_idx] holds res = levels - lvl_idx)
        for ll, bands in comps_bands:
            si = 1
            for res in range(1, levels + 1):
                lvl_idx = levels - res
                bands[lvl_idx] = tuple(
                    _dequantize_band(b_, shift_list[si + k] if si + k < len(shift_list) else 0)
                    for k, b_ in enumerate(bands[lvl_idx])
                )
                si += 3
    planes = np.stack(
        [dwt53.inverse(ll, [tuple(b) for b in bands]) for ll, bands in comps_bands]
    )
    if mct and ncomp == 3:
        yy, u, v = planes[0], planes[1], planes[2]
        g = yy - ((u + v) >> 2)
        r = v + g
        b = u + g
        planes = np.stack([r, g, b])
    planes = planes + (1 << (depth - 1))
    return np.clip(planes, 0, (1 << depth) - 1).astype(dtype)


# --- JP2 container --------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def encode_jp2(img: np.ndarray, levels: int = 5, quality: float = 100) -> bytes:
    """Full JP2 file: signature + ftyp + jp2h(ihdr, colr) + jp2c.
    quality < 100 selects the lossy quantized-subband path (reference
    JP2OpenJPEG(quality=...), options.py:124-130, readme.md:46)."""
    if img.ndim == 2:
        img = img[None]
    ncomp, h, w = img.shape
    depth = 8 if img.dtype == np.uint8 else 16
    codestream = encode_j2k(img, levels=levels, quality=quality)
    sig = _box(b"jP  ", b"\x0d\x0a\x87\x0a")
    ftyp = _box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    ihdr = _box(b"ihdr", struct.pack(">IIHBBBB", h, w, ncomp, depth - 1, 7, 0, 0))
    colr = _box(b"colr", struct.pack(">BBBI", 1, 0, 0, 16 if ncomp == 3 else 17))
    jp2h = _box(b"jp2h", ihdr + colr)
    jp2c = _box(b"jp2c", codestream)
    return sig + ftyp + jp2h + jp2c


def decode_jp2(data: bytes) -> np.ndarray:
    """Decode a JP2 file (or bare J2K codestream)."""
    if data[:2] == b"\xff\x4f":
        return decode_j2k(data)
    pos = 0
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        if ln == 1:
            # XLBox: 64-bit extended length follows the box type
            # (ISO/IEC 15444-1 I.4); payload starts at pos+16
            (xl,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            payload_off, box_len = 16, xl
        else:
            payload_off, box_len = 8, ln
        if btype == b"jp2c":
            return decode_j2k(data[pos + payload_off : pos + box_len if box_len else len(data)])
        pos += box_len if box_len else len(data)
    raise ValueError("no jp2c codestream box found")
