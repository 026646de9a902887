"""From-scratch LERC (Limited Error Raster Compression) codec — makes
the reference's ``GTiff.Compress.lerc / lerc_deflate / lerc_zstd``
enum members (reference options.py:66-80) working codecs instead of
external-codec seams.

LERC is Esri's open raster format (the spec and reference
implementation are public at github.com/Esri/lerc): the raster is cut
into 8x8 microblocks and each block stores quantized offsets
bit-stuffed at the block's own bit width, giving a guaranteed
per-pixel error bound ``max_z_error`` (0 = lossless for integer
data).  This module implements that algorithm with the published
Lerc2 header field order (identifier, version, dims, numValidPixel,
microBlockSize, blobSize, dataType enum, maxZError, zMin, zMax);
byte-level interop cannot be verified in this sandbox (no liblerc),
so — like the in-repo JPEG 2000 codec — the wire format is pinned by
round-trip tests and the error-bound contract, and the container
carries the real TIFF plumbing (Compression=34887, the registered
LERC tag, plus the LercParameters tag selecting the additional
deflate/zstd pass which reuses zlib / kernels/zstd.py).

Encoding rules per microblock:

- all values equal                      -> CONST record (native-width value)
- quantized offsets fit <= 31 bits      -> STUFFED record
  (native-width offset + bit width + little-endian bit-packed offsets)
- otherwise                             -> RAW record (native values)

Integer data is always lossless (offsets are exact differences);
float data honors ``max_z_error``: reconstruction error is at most
``max_z_error`` per pixel (0 stores raw/const blocks only).
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

_MAGIC = b"Lerc2 "
_VERSION = 4
_MICRO = 8

_DT_ENUM = {
    np.dtype(np.int8): 0, np.dtype(np.uint8): 1,
    np.dtype(np.int16): 2, np.dtype(np.uint16): 3,
    np.dtype(np.int32): 4, np.dtype(np.uint32): 5,
    np.dtype(np.float32): 6, np.dtype(np.float64): 7,
}
_DT_FROM_ENUM = {v: k for k, v in _DT_ENUM.items()}

_RAW, _CONST, _STUFFED = 0, 1, 2


def _pack_bits(q: np.ndarray, nbits: int) -> bytes:
    bits = ((q[:, None] >> np.arange(nbits, dtype=np.uint64)) & 1).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def _unpack_bits(data: bytes, n: int, nbits: int) -> np.ndarray:
    bits = np.unpackbits(
        np.frombuffer(data, np.uint8), count=n * nbits, bitorder="little"
    )
    w = np.arange(nbits, dtype=np.uint64)
    return (bits.reshape(n, nbits).astype(np.uint64) << w).sum(axis=1)


def lerc_encode_band(band: np.ndarray, max_z_error: float = 0.0) -> bytes:
    """2-D array -> one Lerc2 blob."""
    if band.ndim != 2:
        raise ValueError("lerc_encode_band takes a 2-D array")
    dt = np.dtype(band.dtype)
    if dt not in _DT_ENUM:
        raise ValueError(f"LERC does not support dtype {dt}")
    if max_z_error < 0:
        raise ValueError("max_z_error must be >= 0")
    h, w = band.shape
    is_float = dt.kind == "f"
    lossless_int = not is_float  # integer data is always exact
    zmin = float(band.min()) if band.size else 0.0
    zmax = float(band.max()) if band.size else 0.0
    body = bytearray()
    le = dt.newbyteorder("<")
    for by in range(0, h, _MICRO):
        for bx in range(0, w, _MICRO):
            blk = band[by:by + _MICRO, bx:bx + _MICRO]
            flat = blk.ravel()
            if is_float and not np.isfinite(flat).all():
                # NaN/inf (nodata encodings) poison the quantizer AND
                # its own error-bound check (NaN > err is False), so
                # such blocks must store raw — bit-exact, bound moot
                body.append(_RAW)
                body += flat.astype(le, copy=False).tobytes()
                continue
            vmin = flat.min()
            vmax = flat.max()
            if vmin == vmax:
                body.append(_CONST)
                body += vmin.astype(le).tobytes()  # native-width value
                continue
            if lossless_int:
                q = (flat.astype(np.int64) - int(vmin)).astype(np.uint64)
                step = 0.0
            elif max_z_error > 0:
                step = 2.0 * max_z_error
                q = np.floor((flat.astype(np.float64) - float(vmin)) / step + 0.5
                             ).astype(np.int64)
                q = np.maximum(q, 0).astype(np.uint64)
                # HARD error guarantee: the decoder reconstructs in
                # float64 then casts to the storage dtype; the cast
                # rounding can push the worst-case half-step error a
                # few ulp past max_z_error.  Verify the exact decoded
                # values here and fall back to RAW if the bound would
                # be exceeded — the bound is a contract, not a hope.
                recon = (float(vmin) + q.astype(np.float64) * step).astype(dt)
                if np.abs(recon.astype(np.float64)
                          - flat.astype(np.float64)).max() > max_z_error:
                    body.append(_RAW)
                    body += flat.astype(le, copy=False).tobytes()
                    continue
            else:  # float lossless: raw block
                body.append(_RAW)
                body += flat.astype(le, copy=False).tobytes()
                continue
            nbits = int(q.max()).bit_length()
            if nbits == 0 or nbits > 31:
                body.append(_RAW)
                body += flat.astype(le, copy=False).tobytes()
                continue
            body.append(_STUFFED)
            body += vmin.astype(le).tobytes()  # native-width offset
            body.append(nbits)
            body += _pack_bits(q, nbits)
    header = bytearray(_MAGIC)
    header += struct.pack(
        "<iiiiii", _VERSION, h, w, h * w, _MICRO, 0  # blobSize patched below
    )
    header += struct.pack("<iddd", _DT_ENUM[dt], max_z_error, zmin, zmax)
    blob = bytearray(header) + body
    # blobSize sits after magic (6) + 5 int32 fields
    struct.pack_into("<i", blob, 26, len(blob))
    return bytes(blob)


def lerc_decode_band(data: bytes, pos: int = 0) -> Tuple[np.ndarray, int]:
    """-> (2-D array, new position)."""
    if data[pos:pos + 6] != _MAGIC:
        raise ValueError("not a Lerc2 blob")
    version, h, w, nvalid, micro, blob_size = struct.unpack_from("<iiiiii", data, pos + 6)
    dt_enum, max_z_error, zmin, zmax = struct.unpack_from("<iddd", data, pos + 30)
    if version != _VERSION or micro != _MICRO:
        raise ValueError(f"unsupported Lerc2 version/blocksize {version}/{micro}")
    dt = _DT_FROM_ENUM.get(dt_enum)
    if dt is None:
        raise ValueError(f"unknown LERC data type {dt_enum}")
    end = pos + blob_size
    p = pos + 58  # 6-byte magic + 6 int32 + int32 + 3 float64
    le = dt.newbyteorder("<")
    out = np.empty((h, w), dt)
    is_float = dt.kind == "f"
    step = 2.0 * max_z_error
    for by in range(0, h, _MICRO):
        for bx in range(0, w, _MICRO):
            bh = min(_MICRO, h - by)
            bw = min(_MICRO, w - bx)
            n = bh * bw
            method = data[p]
            p += 1
            if method == _CONST:
                v = np.frombuffer(data, le, count=1, offset=p)[0]
                p += dt.itemsize
                out[by:by + bh, bx:bx + bw] = v
            elif method == _RAW:
                nb = n * dt.itemsize
                blk = np.frombuffer(data, le, count=n, offset=p)
                p += nb
                out[by:by + bh, bx:bx + bw] = blk.reshape(bh, bw)
            elif method == _STUFFED:
                vmin = np.frombuffer(data, le, count=1, offset=p)[0]
                p += dt.itemsize
                nbits = data[p]
                p += 1
                nb = (n * nbits + 7) // 8
                q = _unpack_bits(data[p:p + nb], n, nbits)
                p += nb
                if is_float and step > 0:
                    vals = float(vmin) + q.astype(np.float64) * step
                else:
                    vals = q.astype(np.int64) + int(vmin)
                out[by:by + bh, bx:bx + bw] = vals.astype(dt).reshape(bh, bw)
            else:
                raise ValueError(f"corrupt LERC block method {method}")
    if p != end:
        raise ValueError("LERC blob size mismatch")
    return out, end


def lerc_encode(img: np.ndarray, max_z_error: float = 0.0) -> bytes:
    """(bands, h, w) or (h, w) -> concatenated per-band Lerc2 blobs
    (each self-delimiting via its blobSize header field)."""
    if img.ndim == 2:
        img = img[None]
    return b"".join(lerc_encode_band(img[b], max_z_error) for b in range(img.shape[0]))


def lerc_decode(data: bytes) -> np.ndarray:
    """-> (bands, h, w); bands inferred from concatenated blobs."""
    bands: List[np.ndarray] = []
    pos = 0
    while pos < len(data):
        band, pos = lerc_decode_band(data, pos)
        bands.append(band)
    if not bands:
        raise ValueError("empty LERC payload")
    return np.stack(bands)
