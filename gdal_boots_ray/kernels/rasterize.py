"""Scanline polygon rasterization, pure NumPy.

Replaces ``gdal.RasterizeLayer`` (reference Layer.rasterize /
VectorDataset.rasterize, gdal.py:1092-1107, 1285-1288) with the
standard GDAL burn convention: a pixel is burned when its *center*
lies inside the polygon (even-odd rule, holes included);
``all_touched=True`` additionally burns every pixel whose cell
rectangle is touched by a ring edge.

Goldens reproduced: tests/test_vector.py:83-98 (100x100 mask with
rect x in [0, 0.6], y in [0.75, 1.0] at 0.01 deg -> mask[:25,:60] == 1)
and mask min/max of tests/test_raster.py:499-500.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from gdal_boots_ray.kernels.affine import invert_gt
from gdal_boots_ray.kernels.geometry import RawGeometry, points_in_rings, polygon_rings


def rasterize(
    geometry: RawGeometry,
    shape,
    gt,
    burn_value: float = 1,
    all_touched: bool = False,
    out: Optional[np.ndarray] = None,
    dtype=np.uint8,
) -> np.ndarray:
    """Burn a Polygon/MultiPolygon into a (h, w) array.

    gt: 6-float affine (a,b,c,d,e,f) pixel->world. Rotation-free
    transforms only (b == d == 0), like every reference fixture.
    """
    h, w = shape[-2:]
    if out is None:
        out = np.zeros((h, w), dtype=dtype)
    rings = polygon_rings(geometry)
    if not rings:
        return out
    inv = invert_gt(np.asarray(gt, dtype=np.float64))[0]

    # transform rings to pixel space once
    pix_rings = []
    for ring in rings:
        px = inv[0] * ring[:, 0] + inv[1] * ring[:, 1] + inv[2]
        py = inv[3] * ring[:, 0] + inv[4] * ring[:, 1] + inv[5]
        pix_rings.append(np.stack([px, py], axis=1))

    allr = np.vstack(pix_rings)
    col_lo = max(0, int(np.floor(allr[:, 0].min())))
    col_hi = min(w, int(np.ceil(allr[:, 0].max())) + 1)
    row_lo = max(0, int(np.floor(allr[:, 1].min())))
    row_hi = min(h, int(np.ceil(allr[:, 1].max())) + 1)
    if col_lo >= col_hi or row_lo >= row_hi:
        return out

    cols = np.arange(col_lo, col_hi, dtype=np.float64) + 0.5
    rows = np.arange(row_lo, row_hi, dtype=np.float64) + 0.5
    cgrid, rgrid = np.meshgrid(cols, rows)
    inside = points_in_rings(cgrid.ravel(), rgrid.ravel(), pix_rings).reshape(rgrid.shape)
    sub = out[row_lo:row_hi, col_lo:col_hi]
    sub[inside] = burn_value

    if all_touched:
        # conservative: mark every cell a ring edge passes through (DDA walk)
        for ring in pix_rings:
            for k in range(len(ring) - 1):
                x0, y0 = ring[k]
                x1, y1 = ring[k + 1]
                n = int(max(abs(x1 - x0), abs(y1 - y0)) * 2) + 1
                t = np.linspace(0.0, 1.0, n)
                xs = np.clip((x0 + (x1 - x0) * t).astype(np.int64), 0, w - 1)
                ys = np.clip((y0 + (y1 - y0) * t).astype(np.int64), 0, h - 1)
                out[ys, xs] = burn_value
    return out
