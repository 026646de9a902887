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


def fill_mask_pixelspace(pix_rings, h: int, w: int) -> np.ndarray:
    """Even-odd scanline fill of rings given in PIXEL coordinates.

    Identical convention to ray-casting against pixel centers
    (center (c+0.5, r+0.5), edge counted when center_x < x_intersect),
    but O(edges*h + h*w): per edge, scatter parity toggles at the
    first covered column of each crossed scanline, then a row-wise
    cumulative parity — no (edges x pixels) broadcast.
    """
    total = np.zeros(h, dtype=np.int64)
    delta = np.zeros((h, w + 1), dtype=np.int64)
    for ring in pix_rings:
        if len(ring) < 4:
            continue
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        for j in range(len(x0)):
            ylo, yhi = (y0[j], y1[j]) if y0[j] <= y1[j] else (y1[j], y0[j])
            r_lo = max(0, int(np.ceil(ylo - 0.5)))
            r_hi = min(h - 1, int(np.ceil(yhi - 0.5)) - 1)
            if r_hi < r_lo or y0[j] == y1[j]:
                continue
            rows = np.arange(r_lo, r_hi + 1)
            yc = rows + 0.5
            xint = x0[j] + (yc - y0[j]) * (x1[j] - x0[j]) / (y1[j] - y0[j])
            total[rows] += 1
            t = np.ceil(xint - 0.5).astype(np.int64)
            keep = t < w  # t >= w: edge right of every center -> counts in total only
            np.add.at(delta, (rows[keep], np.maximum(t[keep], 0)), 1)
    cum = np.cumsum(delta[:, :w], axis=1)
    return ((total[:, None] + cum) % 2).astype(bool)


def supercover_burn(pix_rings, out: np.ndarray, burn_value) -> None:
    """Burn every cell each ring edge passes through (exact grid-
    crossing walk, not sampled DDA) — GDAL's outline/ALL_TOUCHED line
    semantics."""
    h, w = out.shape
    for ring in pix_rings:
        for k in range(len(ring) - 1):
            x0, y0 = ring[k]
            x1, y1 = ring[k + 1]
            dx, dy = x1 - x0, y1 - y0
            ts = [0.0, 1.0]
            if dx != 0:
                lo, hi = sorted((x0, x1))
                for gx in range(int(np.floor(lo)) + 1, int(np.ceil(hi))):
                    ts.append((gx - x0) / dx)
            if dy != 0:
                lo, hi = sorted((y0, y1))
                for gy in range(int(np.floor(lo)) + 1, int(np.ceil(hi))):
                    ts.append((gy - y0) / dy)
            ts = sorted(t for t in ts if 0.0 <= t <= 1.0)
            for a, b in zip(ts[:-1], ts[1:]):
                tm = (a + b) / 2.0
                cx, cy = int(x0 + dx * tm), int(y0 + dy * tm)
                if 0 <= cx < w and 0 <= cy < h:
                    out[cy, cx] = burn_value


def rasterize(
    geometry: RawGeometry,
    shape,
    gt,
    burn_value: float = 1,
    all_touched: bool = False,
    out: Optional[np.ndarray] = None,
    dtype=np.uint8,
    outline: bool = False,
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

    shifted = [r - np.array([col_lo, row_lo], dtype=np.float64) for r in pix_rings]
    inside = fill_mask_pixelspace(shifted, row_hi - row_lo, col_hi - col_lo)
    sub = out[row_lo:row_hi, col_lo:col_hi]
    sub[inside] = burn_value

    if all_touched or outline:
        # GDAL burns the exact supercover of ring edges: with
        # all_touched this is the documented behavior; WITHOUT it GDAL
        # RasterizeLayer still draws polygon outlines — reproducing the
        # reference's exact 628591-pixel histogram
        # (tests/test_vector.py:67-78) requires fill + outline.
        supercover_burn(pix_rings, out, burn_value)
    return out
