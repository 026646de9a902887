"""Decode / encode actor-pool stages.

The engine's equivalent of the reference bytes<->raster paths
(``RasterDataset.from_bytes`` / ``to_bytes``, gdal.py:546-607):
an image row's ``bytes`` column decodes into a ``pixels`` column
(raw C-order buffer) + ``bands`` so every downstream kernel can take a
zero-copy ``np.frombuffer`` view straight off the Arrow buffer.

Stateful pieces (codec dispatch, scratch) live in ``__init__`` — these
classes are passed to ``map_batches(Cls, concurrency=N)`` so setup
runs once per actor, per the actor-pool pattern.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from gdal_boots_ray.kernels.png import decode_image, encode_image


def pixels_view(buf, bands: int, h: int, w: int, dtype=np.uint8) -> np.ndarray:
    """Zero-copy view of a pixels buffer as (h, w) / (bands, h, w)."""
    arr = np.frombuffer(buf, dtype=dtype, count=bands * h * w)
    if bands == 1:
        return arr.reshape(h, w)
    return arr.reshape(bands, h, w)


class DecodeImages:
    """bytes+fmt -> pixels(+bands) columns.  Use with
    ``ds.map_batches(DecodeImages, batch_format="pyarrow",
    concurrency=N, batch_size=B)``.

    drop_bytes=True (default) sheds the encoded payload as soon as the
    pixels exist so blocks stay within target_max_block_size.
    keep_bytes is for fidelity checks (re-encode comparisons).
    """

    def __init__(self, drop_bytes: bool = True, validate: bool = False):
        self.drop_bytes = drop_bytes
        self.validate = validate

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch.column("fmt").to_pylist()
        blobs = batch.column("bytes")
        pixels = []
        bands = np.empty(len(fmts), dtype=np.int32)
        ok = np.ones(len(fmts), dtype=bool)
        for i, fmt in enumerate(fmts):
            data = blobs[i].as_py()
            try:
                img = decode_image(data, fmt)
            except Exception:
                if self.validate:
                    ok[i] = False
                    pixels.append(b"")
                    bands[i] = 0
                    continue
                raise
            bands[i] = 1 if img.ndim == 2 else img.shape[0]
            pixels.append(np.ascontiguousarray(img).tobytes())
        out = batch
        if self.drop_bytes:
            out = out.drop_columns(["bytes"])
        for col in ("pixels", "bands", "is_valid"):
            if col in out.column_names:
                out = out.drop_columns([col])
        out = out.append_column("pixels", pa.array(pixels, pa.large_binary()))
        out = out.append_column("bands", pa.array(bands, pa.int32()))
        if self.validate:
            out = out.append_column("is_valid", pa.array(ok, pa.bool_()))
        return out


class EncodeImages:
    """pixels -> bytes column (png or raw), the encode/sink stage
    (reference ``to_bytes`` + driver options, options.py:43-56)."""

    def __init__(self, fmt: str = "png", zlevel: int = 6, drop_pixels: bool = True):
        self.fmt = fmt
        self.zlevel = zlevel
        self.drop_pixels = drop_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        bands = batch.column("bands").to_numpy()
        pix = batch.column("pixels")
        blobs = []
        for i in range(len(ws)):
            img = pixels_view(pix[i].as_py(), int(bands[i]), int(hs[i]), int(ws[i]))
            kw = {"zlevel": self.zlevel} if self.fmt == "png" else {}
            blobs.append(encode_image(img, self.fmt, **kw))
        out = batch
        if self.drop_pixels:
            out = out.drop_columns(["pixels"])
        if "bytes" in out.column_names:
            out = out.drop_columns(["bytes"])
        out = out.append_column("bytes", pa.array(blobs, pa.binary()))
        fmt_col = pa.array([self.fmt] * len(ws), pa.string())
        if "fmt" in out.column_names:
            out = out.set_column(out.column_names.index("fmt"), "fmt", fmt_col)
        else:
            out = out.append_column("fmt", fmt_col)
        return out
