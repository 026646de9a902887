"""Minimal (Geo)TIFF codec, pure stdlib+NumPy.

Gives the engine a real second raster format (reference driver-option
parity: ``GTiff(compress=deflate, zlevel=...)``, options.py:58-92)
without libtiff/GDAL:

- encode: baseline TIFF 6.0, single strip, chunky (PIXEL) interleave,
  uint8/uint16/int16/int32/uint32/float32/float64, optional DEFLATE
  (zlib), LZW or PACKBITS compression, optional horizontal-differencing
  predictor (tag 317 = 2, integer dtypes), GeoTIFF georeferencing via
  ModelPixelScaleTag + ModelTiepointTag + GeoKeyDirectory (EPSG code).
- decode: the subset the encoder produces plus multi-strip
  uncompressed/deflate/LZW/PackBits files; little-endian only.

TIFF structure from the public TIFF 6.0 / GeoTIFF specs.  The LZW
here is TIFF's MSB-first variable-width variant (ClearCode 256, EOI
257, "early change" width bump at 2^n - 1, table reset at 4094 —
libtiff-compatible); PackBits packs each row independently per the
spec and decodes streamwise.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

import numpy as np

_DTYPES = {
    np.dtype("uint8"): (8, 1),
    np.dtype("uint16"): (16, 1),
    np.dtype("uint32"): (32, 1),
    np.dtype("int16"): (16, 2),
    np.dtype("int32"): (32, 2),
    np.dtype("float32"): (32, 3),
    np.dtype("float64"): (64, 3),
}
_SAMPLE_TO_DTYPE = {(8, 1): "u1", (16, 1): "u2", (32, 1): "u4", (16, 2): "i2", (32, 2): "i4", (32, 3): "f4", (64, 3): "f8"}

# tag ids
T_WIDTH, T_HEIGHT, T_BITS, T_COMPRESSION, T_PHOTO = 256, 257, 258, 259, 262
T_STRIP_OFFSETS, T_SPP, T_ROWS_PER_STRIP, T_STRIP_COUNTS = 273, 277, 278, 279
T_PLANAR, T_SAMPLE_FORMAT = 284, 339
T_MODEL_PIXEL_SCALE, T_MODEL_TIEPOINT, T_GEO_KEYS = 33550, 33922, 34735
T_TILE_WIDTH, T_TILE_LENGTH, T_TILE_OFFSETS, T_TILE_COUNTS = 322, 323, 324, 325

_TYPE_SHORT, _TYPE_LONG, _TYPE_DOUBLE = 3, 4, 12
_TYPE_SIZES = {3: 2, 4: 4, 12: 8}

T_PREDICTOR = 317
T_LERC_PARAMS = 50674  # LercParameters: [version, additional compression]

_CLEAR, _EOI = 256, 257


def lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 LZW: MSB-first bit packing, 9->12 bit variable-width
    codes with the spec's early change (width bumps when the next
    free code reaches 2^width - 1), ClearCode emitted first and again
    when the table reaches 4094 entries (libtiff behavior)."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
        bitbuf &= (1 << nbits) - 1

    table: dict = {}
    next_code = 258
    emit(_CLEAR)
    prev = -1
    for byte in data:
        if prev < 0:
            prev = byte
            continue
        key = (prev << 8) | byte
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        emit(prev)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        prev = byte
        if next_code == 4094:
            emit(_CLEAR)
            table.clear()
            next_code = 258
            width = 9
    if prev >= 0:
        emit(prev)
        # phantom table add for the final code: the decoder appends an
        # entry for every code after the first, so its width can bump
        # between the last data code and EOI — mirror that here or EOI
        # is written narrower than the decoder reads it (libtiff does
        # the same free_ent++ in LZWPostEncode before writing EOI)
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(_EOI)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes) -> bytes:
    """Inverse of :func:`lzw_encode`; also reads libtiff streams."""
    out = bytearray()
    table: list = [bytes([i]) for i in range(256)] + [b"", b""]
    next_code = 258
    width = 9
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev_entry = None
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated stream: EOI implied
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _EOI:
            return bytes(out)
        if code == _CLEAR:
            del table[258:]
            next_code = 258
            width = 9
            prev_entry = None
            continue
        if code < len(table) and (code < 258 or table[code]):
            entry = table[code]
        elif code == next_code and prev_entry is not None:
            entry = prev_entry + prev_entry[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} at bit position")
        out += entry
        if prev_entry is not None:
            table.append(prev_entry + entry[:1])
            next_code += 1
        # the decoder's table lags the encoder's by one entry, so it
        # widens one code earlier: at 510/1022/2046 (encoder 511/1023/2047)
        if next_code == (1 << width) - 2 and width < 12:
            width += 1
        prev_entry = entry


def packbits_encode_row(row: bytes) -> bytes:
    """Apple PackBits, one TIFF row (rows are packed independently)."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append(257 - run)
            out.append(row[i])
            i = j
        else:
            j = i + 1
            while j < n and j - i < 128:
                if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out += row[i:j]
            i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while len(out) < expected and i < n:
        h = data[i]
        i += 1
        if h == 128:  # no-op
            continue
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        else:
            out += data[i : i + 1] * (257 - h)
            i += 1
    if len(out) < expected:
        raise ValueError("truncated PackBits stream")
    return bytes(out[:expected])


def _predict2(payload: bytes, w: int, h: int, spp: int, dt: np.dtype) -> bytes:
    """Horizontal differencing (Predictor=2) on sample values."""
    if dt.kind not in "ui":
        raise ValueError("Predictor=2 requires an integer dtype")
    arr = np.frombuffer(payload, dtype=dt).reshape(h, w * spp).copy()
    view = arr.view(np.dtype(f"<u{dt.itemsize}"))  # defined wraparound
    view[:, spp:] -= view[:, :-spp].copy()
    return arr.tobytes()


def _unpredict2(payload: bytes, w: int, h: int, spp: int, dt: np.dtype) -> bytes:
    arr = np.frombuffer(payload, dtype=dt).reshape(h, w * spp).copy()
    ud = np.dtype(f"<u{dt.itemsize}")
    view = arr.view(ud)
    for o in range(spp):
        np.cumsum(view[:, o::spp], axis=1, dtype=ud, out=view[:, o::spp])
    return arr.tobytes()


def overview_average(img: np.ndarray, lv: int) -> np.ndarray:
    """(bands,h,w) -> (bands, ceil(h/lv), ceil(w/lv)) AVERAGE-resampled
    overview: integer dtypes use FLOOR division of the block sum by the
    count of CONTRIBUTING pixels (partial edge blocks average over what
    exists), floats use the true mean.  This is the engine's
    ``tile_overviews`` oracle convention; note GDAL's own integer
    AVERAGE rounds to nearest, so outputs can differ from gdaladdo by
    1 LSB on .5 boundaries."""
    bands, h, w = img.shape
    ri = np.arange(0, h, lv)
    ci = np.arange(0, w, lv)
    integer = img.dtype.kind in "ui"
    acc = img.astype(np.int64 if integer else np.float64, copy=False)
    sums = np.add.reduceat(np.add.reduceat(acc, ri, axis=1), ci, axis=2)
    rcnt = np.minimum(ri + lv, h) - ri
    ccnt = np.minimum(ci + lv, w) - ci
    counts = rcnt[:, None] * ccnt[None, :]
    out = sums // counts if integer else sums / counts
    return out.astype(img.dtype)


T_NEW_SUBFILE_TYPE = 254


def _build_page(
    img: np.ndarray,
    gt,
    epsg: Optional[int],
    comp_id: int,
    zlevel: int,
    predictor: int,
    jpeg_quality: int,
    tiled: bool,
    blockxsize: int,
    blockysize: int,
    base_offset: int,
    reduced: bool,
    rows_per_strip: Optional[int] = None,
    lerc_add: int = 0,
    max_z_error: float = 0.0,
) -> Tuple[bytes, int]:
    """One TIFF page (IFD + out-of-line values + pixel chunks) laid
    out at absolute ``base_offset``.  Returns (page bytes, position of
    the 4-byte next-IFD pointer relative to the page start); the
    pointer is written as 0 and patched by the caller when pages are
    chained (overview pyramid)."""
    bands, h, w = img.shape
    dt = np.dtype(img.dtype)
    bits, fmt = _DTYPES[dt]
    dtle = np.dtype("<" + dt.str[1:])

    def encode_chunk(chunk: np.ndarray) -> bytes:
        """(bands, ch, cw) -> compressed bytes for one strip/tile."""
        _, ch, cw = chunk.shape
        if comp_id == 7:
            from gdal_boots_ray.kernels.jpeg import jpeg_encode

            return jpeg_encode(np.ascontiguousarray(chunk), quality=jpeg_quality)
        if comp_id == 50001:
            from gdal_boots_ray.kernels.webp import webp_encode

            return webp_encode(np.ascontiguousarray(chunk))
        if comp_id == 34887:
            from gdal_boots_ray.kernels.lerc import lerc_encode

            payload = lerc_encode(chunk, max_z_error=max_z_error)
            if lerc_add == 1:
                return zlib.compress(payload, zlevel)
            if lerc_add == 2:
                from gdal_boots_ray.kernels.zstd import zstd_compress

                return zstd_compress(payload, checksum=False)
            return payload
        inter = np.ascontiguousarray(np.transpose(chunk, (1, 2, 0)))
        payload = inter.astype(dtle, copy=False).tobytes()
        if predictor == 2:
            payload = _predict2(payload, cw, ch, bands, dtle)
        if comp_id == 8:
            return zlib.compress(payload, zlevel)
        if comp_id == 50000:
            from gdal_boots_ray.kernels.zstd import zstd_compress

            return zstd_compress(payload, checksum=False)
        if comp_id == 5:
            return lzw_encode(payload)
        if comp_id == 32773:
            row_bytes = cw * bands * dt.itemsize
            return b"".join(
                packbits_encode_row(payload[r * row_bytes : (r + 1) * row_bytes])
                for r in range(ch)
            )
        return payload

    if tiled:
        ntx = (w + blockxsize - 1) // blockxsize
        nty = (h + blockysize - 1) // blockysize
        pad_x, pad_y = ntx * blockxsize - w, nty * blockysize - h
        padded = np.pad(img, ((0, 0), (0, pad_y), (0, pad_x)), mode="edge")
        chunks = [
            encode_chunk(padded[:, ty * blockysize : (ty + 1) * blockysize,
                                tx * blockxsize : (tx + 1) * blockxsize])
            for ty in range(nty)
            for tx in range(ntx)
        ]
    else:
        rps = h if not rows_per_strip else min(int(rows_per_strip), h)
        chunks = [
            encode_chunk(img[:, r : r + rps]) for r in range(0, h, rps)
        ]

    entries = []  # (tag, type, values)

    def entry(tag, typ, values):
        if not isinstance(values, (list, tuple)):
            values = [values]
        entries.append((tag, typ, values))

    if reduced:
        entry(T_NEW_SUBFILE_TYPE, _TYPE_LONG, 1)  # reduced-resolution page
    entry(T_WIDTH, _TYPE_LONG, w)
    entry(T_HEIGHT, _TYPE_LONG, h)
    entry(T_BITS, _TYPE_SHORT, [bits] * bands)
    entry(T_COMPRESSION, _TYPE_SHORT, comp_id)
    # JPEG pages (comp 7) embed a YCbCr JFIF stream for 3+ bands, so the
    # TIFF photometric must say 6 (YCbCr), not 2 (RGB) — standard readers
    # misrender otherwise; mono JPEG and all other codecs keep RGB/gray.
    entry(T_PHOTO, _TYPE_SHORT, (6 if comp_id == 7 else 2) if bands >= 3 else 1)
    entry(T_SPP, _TYPE_SHORT, bands)
    entry(T_PLANAR, _TYPE_SHORT, 1)
    if tiled:
        entry(T_TILE_WIDTH, _TYPE_LONG, blockxsize)
        entry(T_TILE_LENGTH, _TYPE_LONG, blockysize)
        entry(T_TILE_OFFSETS, _TYPE_LONG, [0] * len(chunks))  # patched below
        entry(T_TILE_COUNTS, _TYPE_LONG, [len(c) for c in chunks])
    else:
        entry(T_STRIP_OFFSETS, _TYPE_LONG, [0] * len(chunks))  # patched below
        entry(T_ROWS_PER_STRIP, _TYPE_LONG, rps)
        entry(T_STRIP_COUNTS, _TYPE_LONG, [len(c) for c in chunks])
    if predictor == 2:
        entry(T_PREDICTOR, _TYPE_SHORT, 2)
    entry(T_SAMPLE_FORMAT, _TYPE_SHORT, [fmt] * bands)
    if comp_id == 34887:
        entry(T_LERC_PARAMS, _TYPE_LONG, [4, lerc_add])
    if gt is not None:
        a, _b, c, _d, e, f = [float(v) for v in gt]
        entry(T_MODEL_PIXEL_SCALE, _TYPE_DOUBLE, [a, -e, 0.0])
        entry(T_MODEL_TIEPOINT, _TYPE_DOUBLE, [0.0, 0.0, 0.0, c, f, 0.0])
    if epsg:
        # GeoKeyDirectory: version, rev, minor, nkeys; GTModelTypeGeoKey=1
        # (projected) or 2 (geographic); ProjectedCSTypeGeoKey /
        # GeographicTypeGeoKey = epsg
        geographic = epsg == 4326
        keys = [1, 1, 0, 2, 1024, 0, 1, 2 if geographic else 1]
        keys += [2048 if geographic else 3072, 0, 1, int(epsg)]
        entry(T_GEO_KEYS, _TYPE_SHORT, keys)

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    data_offset = base_offset + 2 + n * 12 + 4  # after IFD
    # lay out out-of-line values
    packed = []
    for tag, typ, values in entries:
        size = _TYPE_SIZES[typ] * len(values)
        fmt_ch = {3: "H", 4: "I", 12: "d"}[typ]
        raw = struct.pack(f"<{len(values)}{fmt_ch}", *values)
        if size <= 4:
            packed.append((tag, typ, len(values), raw.ljust(4, b"\x00"), None))
        else:
            packed.append((tag, typ, len(values), None, raw))
    # compute offsets
    blob_positions = []
    pos = data_offset
    for tag, typ, cnt, inline, raw in packed:
        if raw is not None:
            blob_positions.append(pos)
            pos += len(raw) + (len(raw) % 2)
        else:
            blob_positions.append(None)
    # chunk data positions (2-byte aligned, starting after the blobs)
    chunk_positions = []
    cpos = pos
    for c in chunks:
        chunk_positions.append(cpos)
        cpos += len(c) + (len(c) % 2)
    # patch StripOffsets / TileOffsets values now that positions exist
    final_entries = []
    for i, ((tag, typ, cnt, inline, raw), bpos) in enumerate(zip(packed, blob_positions)):
        if tag in (T_STRIP_OFFSETS, T_TILE_OFFSETS):
            patched = struct.pack(f"<{len(chunk_positions)}I", *chunk_positions)
            if raw is not None:
                packed[i] = (tag, typ, cnt, inline, patched)
                raw = patched
            else:
                inline = patched.ljust(4, b"\x00")
        if inline is not None:
            final_entries.append(struct.pack("<HHI", tag, typ, cnt) + inline)
        else:
            final_entries.append(struct.pack("<HHII", tag, typ, cnt, bpos))
    out = bytearray()
    out += struct.pack("<H", n)
    for e in final_entries:
        out += e
    next_ptr_pos = len(out)
    out += struct.pack("<I", 0)  # next IFD (patched by the caller)
    for (tag, typ, cnt, inline, raw), bpos in zip(packed, blob_positions):
        if raw is not None:
            out += raw
            if len(raw) % 2:
                out += b"\x00"
    for c in chunks:
        out += c
        if len(c) % 2:
            out += b"\x00"
    return bytes(out), next_ptr_pos


def gtiff_encode(
    img: np.ndarray,
    gt=None,
    epsg: Optional[int] = None,
    compress: Optional[str] = None,
    zlevel: int = 6,
    predictor: int = 1,
    jpeg_quality: int = 95,
    tiled: bool = False,
    blockxsize: int = 256,
    blockysize: int = 256,
    overviews=(),
    rows_per_strip: Optional[int] = None,
    max_z_error: float = 0.0,
) -> bytes:
    """(bands,h,w)/(h,w) array -> GeoTIFF bytes (chunky interleave).

    ``compress="jpeg"`` embeds baseline JFIF chunks (kernels/jpeg.py)
    with Compression=7 ("new-style" JPEG-in-TIFF) — lossy, uint8 only.

    ``tiled=True`` writes the TIFF 6.0 tiled layout (TileWidth/
    TileLength/TileOffsets/TileByteCounts, each tile compressed
    independently, edge tiles padded by edge replication) — the
    cloud-optimized-GeoTIFF chunking that lets
    :func:`gtiff_decode_window` decode O(window) tiles instead of the
    whole strip.  Block sizes must be multiples of 16 (TIFF spec).

    ``rows_per_strip`` chunks the strip layout every N rows (the
    libtiff-style strip chunking real GeoTIFFs use; enables
    strip-range windowed reads), default one strip.

    ``overviews=(2, 4, ...)`` appends one reduced-resolution page per
    integer factor (IFD chain, NewSubfileType=1, AVERAGE resampling
    via :func:`overview_average`, geotransform scaled per level) — the
    in-file pyramid gdaladdo / BuildOverviews produce, so a zoomed-out
    read touches the small page instead of the full raster."""
    if img.ndim == 2:
        img = img[None]
    dt = np.dtype(img.dtype)
    if dt not in _DTYPES:
        raise ValueError(f"GTiff codec does not support dtype {dt}")
    if predictor == 2:
        if compress in (None, "", "none"):
            raise ValueError("Predictor=2 without compression is pointless")
    elif predictor != 1:
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    lerc_add = 0
    if compress == "deflate":
        comp_id = 8
    elif compress == "lzw":
        comp_id = 5
    elif compress == "packbits":
        comp_id = 32773
    elif compress == "zstd":
        comp_id = 50000  # GDAL-registered ZSTD compression tag
    elif compress in ("lerc", "lerc_deflate", "lerc_zstd"):
        if predictor != 1:
            raise ValueError("predictor does not apply to LERC compression")
        comp_id = 34887  # registered LERC compression tag
        lerc_add = ("lerc", "lerc_deflate", "lerc_zstd").index(compress)
    elif compress == "webp":
        if dt != np.dtype(np.uint8) or img.shape[0] not in (3, 4):
            raise ValueError("WEBP-in-TIFF needs 3- or 4-band uint8")
        if predictor != 1:
            raise ValueError("predictor does not apply to WEBP compression")
        comp_id = 50001  # registered WEBP compression tag (lossless VP8L)
    elif compress == "jpeg":
        if dt != np.dtype(np.uint8):
            raise ValueError("JPEG-in-TIFF is 8-bit only")
        if predictor != 1:
            raise ValueError("predictor does not apply to JPEG compression")
        comp_id = 7
    elif compress in (None, "", "none"):
        comp_id = 1
    else:
        raise ValueError(f"unsupported GTiff compression {compress!r}")
    if tiled and (blockxsize % 16 or blockysize % 16 or blockxsize <= 0 or blockysize <= 0):
        raise ValueError("TIFF tile sizes must be positive multiples of 16")

    def scaled_gt(lv: int):
        if gt is None:
            return None
        a, b, c, d, e, f = [float(v) for v in gt]
        return [a * lv, b * lv, c, d * lv, e * lv, f]

    pages = [(img, gt, False)]
    for lv in overviews:
        lv = int(lv)
        if lv < 2:
            raise ValueError(f"overview factor must be >= 2, got {lv}")
        pages.append((overview_average(img, lv), scaled_gt(lv), True))

    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    next_ptr_abs = None
    for pimg, pgt, reduced in pages:
        base = len(out)
        if next_ptr_abs is not None:  # chain the previous page to this one
            out[next_ptr_abs : next_ptr_abs + 4] = struct.pack("<I", base)
        page, rel = _build_page(
            pimg, pgt, epsg, comp_id, zlevel, predictor, jpeg_quality,
            tiled, blockxsize, blockysize, base, reduced,
            rows_per_strip=rows_per_strip,
            lerc_add=lerc_add, max_z_error=max_z_error,
        )
        next_ptr_abs = base + rel
        out += page
        if len(out) % 2:
            out += b"\x00"
    return bytes(out)


def _parse_ifd(data: bytes, ifd_off: Optional[int] = None) -> Tuple[dict, int]:
    """One IFD of a little-endian TIFF (default: the first) ->
    ({tag: values}, next-IFD offset; 0 = end of chain)."""
    if data[:4] not in (b"II*\x00",):
        raise ValueError("not a little-endian TIFF stream")
    if ifd_off is None:
        (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from("<HHI", data, ifd_off + 2 + i * 12)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        voff = ifd_off + 2 + i * 12 + 8
        if size > 4:
            (voff,) = struct.unpack_from("<I", data, voff)
        fmt_ch = {3: "H", 4: "I", 12: "d", 1: "B", 2: "s"}.get(typ)
        if fmt_ch is None:
            continue
        if typ == 2:
            tags[tag] = data[voff : voff + cnt]
        else:
            tags[tag] = list(struct.unpack_from(f"<{cnt}{fmt_ch}", data, voff))
    (nxt,) = struct.unpack_from("<I", data, ifd_off + 2 + n * 12)
    return tags, nxt


def _ifd_chain(data: bytes, max_pages: int = 64) -> list:
    """All IFD tag dicts in chain order (page 0 = full resolution)."""
    pages = []
    off = None
    while len(pages) < max_pages:
        tags, nxt = _parse_ifd(data, off)
        pages.append(tags)
        if not nxt:
            break
        off = nxt
    return pages


def _decode_chunk(raw: bytes, comp: int, rows: int, cols: int, bands: int,
                  dt: np.dtype, predictor: int, lerc_add: int = 0) -> np.ndarray:
    """One strip/tile -> (rows, cols, bands) array."""
    if comp == 7:
        from gdal_boots_ray.kernels.jpeg import jpeg_decode

        return np.transpose(jpeg_decode(raw), (1, 2, 0))
    if comp == 50001:
        from gdal_boots_ray.kernels.webp import webp_decode

        return np.transpose(webp_decode(raw)[:bands].astype(dt, copy=False), (1, 2, 0))
    if comp == 34887:
        from gdal_boots_ray.kernels.lerc import lerc_decode

        if lerc_add == 1:
            raw = zlib.decompress(raw)
        elif lerc_add == 2:
            from gdal_boots_ray.kernels.zstd import zstd_decompress

            raw = zstd_decompress(raw)
        return np.transpose(lerc_decode(raw).astype(dt, copy=False), (1, 2, 0))
    row_bytes = cols * bands * dt.itemsize
    if comp == 8 or comp == 32946:
        raw = zlib.decompress(raw)
    elif comp == 50000:
        from gdal_boots_ray.kernels.zstd import zstd_decompress

        raw = zstd_decompress(raw)
    elif comp == 5:
        raw = lzw_decode(raw)
    elif comp == 32773:
        raw = packbits_decode(raw, rows * row_bytes)
    elif comp != 1:
        raise ValueError(f"unsupported TIFF compression {comp}")
    if predictor == 2:
        raw = _unpredict2(raw, cols, rows, bands, dt)
    flat = np.frombuffer(raw, dtype=dt, count=rows * cols * bands)
    return flat.reshape(rows, cols, bands)


def _geo_from_tags(tags: dict) -> Tuple[Optional[np.ndarray], Optional[int]]:
    gt = None
    if T_MODEL_PIXEL_SCALE in tags and T_MODEL_TIEPOINT in tags:
        sx, sy = tags[T_MODEL_PIXEL_SCALE][0], tags[T_MODEL_PIXEL_SCALE][1]
        tp = tags[T_MODEL_TIEPOINT]
        gt = np.array([sx, 0.0, tp[3], 0.0, -sy, tp[4]])
    epsg = None
    if T_GEO_KEYS in tags:
        keys = tags[T_GEO_KEYS]
        for i in range(4, len(keys), 4):
            if keys[i] in (3072, 2048):
                epsg = keys[i + 3]
    return gt, epsg


def _decode_tiled(data: bytes, tags: dict, dt: np.dtype, bands: int, comp: int,
                  predictor: int, win: Optional[Tuple[int, int, int, int]]) -> np.ndarray:
    """Tiled layout: decode only the tiles intersecting ``win``
    (x0, y0, w, h; None = full image) into an (h, w, bands) canvas."""
    w, h = tags[T_WIDTH][0], tags[T_HEIGHT][0]
    bx, by = tags[T_TILE_WIDTH][0], tags[T_TILE_LENGTH][0]
    offs, counts = tags[T_TILE_OFFSETS], tags[T_TILE_COUNTS]
    ntx = (w + bx - 1) // bx
    x0, y0, ww, wh = win if win is not None else (0, 0, w, h)
    if not (0 <= x0 and 0 <= y0 and x0 + ww <= w and y0 + wh <= h and ww > 0 and wh > 0):
        raise ValueError(f"window ({x0},{y0},{ww},{wh}) outside image {w}x{h}")
    out = np.empty((wh, ww, bands), dtype=dt.newbyteorder("="))
    for ty in range(y0 // by, (y0 + wh - 1) // by + 1):
        for tx in range(x0 // bx, (x0 + ww - 1) // bx + 1):
            ti = ty * ntx + tx
            tile = _decode_chunk(
                data[offs[ti] : offs[ti] + counts[ti]], comp, by, bx, bands, dt,
                predictor, lerc_add=tags.get(T_LERC_PARAMS, [4, 0])[1],
            )
            # intersection of this tile with the window, both coordinate frames
            ix0, iy0 = max(x0, tx * bx), max(y0, ty * by)
            ix1, iy1 = min(x0 + ww, (tx + 1) * bx), min(y0 + wh, (ty + 1) * by)
            out[iy0 - y0 : iy1 - y0, ix0 - x0 : ix1 - x0] = tile[
                iy0 - ty * by : iy1 - ty * by, ix0 - tx * bx : ix1 - tx * bx
            ]
    return out


def _decode_common(data: bytes, win: Optional[Tuple[int, int, int, int]], page: int = 0):
    if page == 0:
        tags, _ = _parse_ifd(data)
    else:
        chain = _ifd_chain(data)
        if page >= len(chain):
            raise ValueError(f"TIFF has {len(chain)} page(s), no page {page}")
        tags = chain[page]
    w, h = tags[T_WIDTH][0], tags[T_HEIGHT][0]
    bands = tags.get(T_SPP, [1])[0]
    bits = tags.get(T_BITS, [8])[0]
    sfmt = tags.get(T_SAMPLE_FORMAT, [1])[0]
    comp = tags.get(T_COMPRESSION, [1])[0]
    planar = tags.get(T_PLANAR, [1])[0]
    predictor = tags.get(T_PREDICTOR, [1])[0]
    if planar != 1:
        raise ValueError("planar (band-interleaved) TIFF not supported")
    dt = np.dtype("<" + _SAMPLE_TO_DTYPE[(bits, sfmt)])
    if T_TILE_OFFSETS in tags:
        img = _decode_tiled(data, tags, dt, bands, comp, predictor, win)
    else:
        offs, counts = tags[T_STRIP_OFFSETS], tags[T_STRIP_COUNTS]
        rows_per_strip = tags.get(T_ROWS_PER_STRIP, [h])[0]
        s0, s1 = 0, len(offs)  # strip range to decode
        if win is not None:
            x0, y0, ww, wh = win
            if not (0 <= x0 and 0 <= y0 and x0 + ww <= w and y0 + wh <= h and ww > 0 and wh > 0):
                raise ValueError(f"window ({x0},{y0},{ww},{wh}) outside image {w}x{h}")
            # decode only the strips intersecting the window's rows —
            # the strip-file counterpart of the tiled O(window) path
            s0 = y0 // rows_per_strip
            s1 = (y0 + wh - 1) // rows_per_strip + 1
        parts = [
            _decode_chunk(
                data[offs[si] : offs[si] + counts[si]], comp,
                min(rows_per_strip, h - si * rows_per_strip),
                w, bands, dt, predictor,
                lerc_add=tags.get(T_LERC_PARAMS, [4, 0])[1],
            )
            for si in range(s0, s1)
        ]
        img = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)
        if win is not None:
            img = img[y0 - s0 * rows_per_strip : y0 - s0 * rows_per_strip + wh, x0 : x0 + ww]
    img = np.transpose(img.astype(dt.newbyteorder("="), copy=False), (2, 0, 1))
    gt, epsg = _geo_from_tags(tags)
    out = img if bands > 1 else img[0]
    return np.ascontiguousarray(out), gt, epsg


def gtiff_decode(data: bytes) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[int]]:
    """TIFF bytes -> (img (bands,h,w) or (h,w), gt or None, epsg or None).
    Handles the strip layout and the tiled layout (TileOffsets);
    decodes the full-resolution page (page 0 of the IFD chain)."""
    return _decode_common(data, None)


def _overview_pages(data: bytes) -> list:
    """Chain indices of the reduced-resolution pages (NewSubfileType
    bit 0), skipping any full-resolution extra pages a multi-image
    TIFF may interleave."""
    return [
        pi
        for pi, t in enumerate(_ifd_chain(data))
        if pi > 0 and t.get(T_NEW_SUBFILE_TYPE, [0])[0] & 1
    ]


def gtiff_overviews(data: bytes) -> list:
    """(w, h) of every reduced-resolution page in the IFD chain, in
    order — the pyramid written by ``gtiff_encode(overviews=...)``."""
    chain = _ifd_chain(data)
    return [(chain[pi][T_WIDTH][0], chain[pi][T_HEIGHT][0]) for pi in _overview_pages(data)]


def gtiff_decode_overview(
    data: bytes, index: int
) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[int]]:
    """Decode reduced-resolution page ``index`` (0 = first overview,
    same ordering/filter as :func:`gtiff_overviews` — non-reduced
    extra pages in a multi-image TIFF are skipped, not miscounted).

    A zoomed-out render reads the overview page's few KB instead of
    the full-resolution raster — with ``tiled=True`` pages the
    overview bytes sit in their own chunk range, so the read is
    O(overview), not O(file).  The page carries its own level-scaled
    geotransform."""
    pages = _overview_pages(data)
    if index >= len(pages):
        raise ValueError(f"TIFF has {len(pages)} overview page(s), no page {index}")
    return _decode_common(data, None, page=pages[index])


def translate_gt(gt, x0: int, y0: int) -> np.ndarray:
    """Geotransform translated to a (x0, y0) pixel-window origin —
    the single definition shared by every windowed-read path."""
    g = np.asarray(gt, dtype=np.float64).copy()
    g[2] += g[0] * x0 + g[1] * y0
    g[5] += g[3] * x0 + g[4] * y0
    return g


def gtiff_decode_window(
    data: bytes, x0: int, y0: int, w: int, h: int
) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[int]]:
    """Decode only the (x0, y0, w, h) pixel window.

    On a tiled file this touches O(intersecting tiles) — the
    cloud-optimized-GeoTIFF access pattern a 100 TB scan wants
    (crop_by_geometry / fast_warp read a sub-window, not the whole
    raster); on a strip file it decodes only the strips intersecting
    the window's rows, then crops.  The returned ``gt`` is translated
    to the window origin so the crop stays georeferenced."""
    img, gt, epsg = _decode_common(data, (int(x0), int(y0), int(w), int(h)))
    if gt is not None:
        gt = translate_gt(gt, x0, y0)
    return img, gt, epsg
