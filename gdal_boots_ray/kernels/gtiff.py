"""Minimal (Geo)TIFF codec, pure stdlib+NumPy.

Gives the engine a real second raster format (reference driver-option
parity: ``GTiff(compress=deflate, zlevel=...)``, options.py:58-92)
without libtiff/GDAL:

- encode: baseline TIFF 6.0, single strip, chunky (PIXEL) interleave,
  uint8/uint16/int16/int32/uint32/float32/float64, optional DEFLATE
  (zlib) compression, GeoTIFF georeferencing via ModelPixelScaleTag +
  ModelTiepointTag + GeoKeyDirectory (EPSG code).
- decode: the subset the encoder produces plus multi-strip
  uncompressed/deflate files; little-endian only.

TIFF structure from the public TIFF 6.0 / GeoTIFF specs.
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

_TYPE_SHORT, _TYPE_LONG, _TYPE_DOUBLE = 3, 4, 12
_TYPE_SIZES = {3: 2, 4: 4, 12: 8}


def gtiff_encode(
    img: np.ndarray,
    gt=None,
    epsg: Optional[int] = None,
    compress: Optional[str] = None,
    zlevel: int = 6,
) -> bytes:
    """(bands,h,w)/(h,w) array -> GeoTIFF bytes (chunky interleave)."""
    if img.ndim == 2:
        img = img[None]
    bands, h, w = img.shape
    dt = np.dtype(img.dtype)
    if dt not in _DTYPES:
        raise ValueError(f"GTiff codec does not support dtype {dt}")
    bits, fmt = _DTYPES[dt]
    inter = np.ascontiguousarray(np.transpose(img, (1, 2, 0)))  # h,w,bands
    payload = inter.astype(dt.newbyteorder("<"), copy=False).tobytes()
    if compress == "deflate":
        comp_id = 8
        payload = zlib.compress(payload, zlevel)
    elif compress in (None, "", "none"):
        comp_id = 1
    else:
        raise ValueError(f"unsupported GTiff compression {compress!r}")

    entries = []  # (tag, type, count, value_or_bytes)

    def entry(tag, typ, values):
        if not isinstance(values, (list, tuple)):
            values = [values]
        entries.append((tag, typ, values))

    entry(T_WIDTH, _TYPE_LONG, w)
    entry(T_HEIGHT, _TYPE_LONG, h)
    entry(T_BITS, _TYPE_SHORT, [bits] * bands)
    entry(T_COMPRESSION, _TYPE_SHORT, comp_id)
    entry(T_PHOTO, _TYPE_SHORT, 2 if bands >= 3 else 1)
    entry(T_STRIP_OFFSETS, _TYPE_LONG, 0)  # patched below
    entry(T_SPP, _TYPE_SHORT, bands)
    entry(T_ROWS_PER_STRIP, _TYPE_LONG, h)
    entry(T_STRIP_COUNTS, _TYPE_LONG, len(payload))
    entry(T_PLANAR, _TYPE_SHORT, 1)
    entry(T_SAMPLE_FORMAT, _TYPE_SHORT, [fmt] * bands)
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
    ifd_offset = 8
    data_offset = ifd_offset + 2 + n * 12 + 4  # after IFD
    # lay out out-of-line values
    out_of_line = b""
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
    strip_offset = pos
    # patch StripOffsets value
    final_entries = []
    for (tag, typ, cnt, inline, raw), bpos in zip(packed, blob_positions):
        if tag == T_STRIP_OFFSETS:
            inline = struct.pack("<I", strip_offset)
        if inline is not None:
            final_entries.append(struct.pack("<HHI", tag, typ, cnt) + inline)
        else:
            final_entries.append(struct.pack("<HHII", tag, typ, cnt, bpos))
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_offset)
    out += struct.pack("<H", n)
    for e in final_entries:
        out += e
    out += struct.pack("<I", 0)  # next IFD
    for (tag, typ, cnt, inline, raw), bpos in zip(packed, blob_positions):
        if raw is not None:
            out += raw
            if len(raw) % 2:
                out += b"\x00"
    out += payload
    return bytes(out)


def gtiff_decode(data: bytes) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[int]]:
    """TIFF bytes -> (img (bands,h,w) or (h,w), gt or None, epsg or None)."""
    if data[:4] not in (b"II*\x00",):
        raise ValueError("not a little-endian TIFF stream")
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
    w = tags[T_WIDTH][0]
    h = tags[T_HEIGHT][0]
    bands = tags.get(T_SPP, [1])[0]
    bits = tags.get(T_BITS, [8])[0]
    sfmt = tags.get(T_SAMPLE_FORMAT, [1])[0]
    comp = tags.get(T_COMPRESSION, [1])[0]
    planar = tags.get(T_PLANAR, [1])[0]
    if planar != 1:
        raise ValueError("planar (band-interleaved) TIFF not supported")
    dt = np.dtype("<" + _SAMPLE_TO_DTYPE[(bits, sfmt)])
    offs = tags[T_STRIP_OFFSETS]
    counts = tags[T_STRIP_COUNTS]
    chunks = []
    for o, cc in zip(offs, counts):
        raw = data[o : o + cc]
        if comp == 8 or comp == 32946:
            raw = zlib.decompress(raw)
        elif comp != 1:
            raise ValueError(f"unsupported TIFF compression {comp}")
        chunks.append(raw)
    flat = np.frombuffer(b"".join(chunks), dtype=dt, count=h * w * bands)
    img = flat.reshape(h, w, bands).astype(dt.newbyteorder("="), copy=False)
    img = np.transpose(img, (2, 0, 1))
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
    out = img if bands > 1 else img[0]
    return np.ascontiguousarray(out), gt, epsg
