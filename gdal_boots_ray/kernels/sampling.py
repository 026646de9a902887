"""Point sampling — reference ``values_by_points`` (gdal.py:897-931).

Inverse geotransform, ``floor`` to pixel indices, half-open bounds
check (``0 <= p < size`` — right/bottom edges exclusive, asserted by
the parametrized goldens tests/test_raster.py:648-677).  Vectorized
over point arrays; multiband rasters return per-band vectors.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from gdal_boots_ray.kernels.affine import invert_gt


def sample_points(img: np.ndarray, gt, xs, ys):
    """Sample (…, h, w) raster at world coords.

    Returns (values, valid): for 2D input ``values`` is (n,) with
    undefined entries where ``valid`` is False; for 3D input ``values``
    is (n, bands).
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    inv = invert_gt(np.asarray(gt, dtype=np.float64))[0]
    px = np.floor(inv[0] * xs + inv[1] * ys + inv[2]).astype(np.int64)
    py = np.floor(inv[3] * xs + inv[4] * ys + inv[5]).astype(np.int64)
    h, w = img.shape[-2:]
    valid = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    pxc = np.clip(px, 0, w - 1)
    pyc = np.clip(py, 0, h - 1)
    if img.ndim == 2:
        values = img[pyc, pxc]
    else:
        values = img[:, pyc, pxc].T  # (n, bands)
    return values, valid


def values_by_points(img: np.ndarray, gt, points: List[dict]) -> list:
    """Reference-shaped API: list of GeoJSON Points -> list of values
    (scalar / per-band vector), None outside bounds."""
    if not points:
        return []
    coords = np.asarray([p["coordinates"][:2] for p in points], dtype=np.float64)
    values, valid = sample_points(img, gt, coords[:, 0], coords[:, 1])
    out: list = []
    for i, ok in enumerate(valid):
        if not ok:
            out.append(None)
        elif img.ndim == 2:
            out.append(values[i])
        else:
            out.append(np.asarray(values[i]))
    return out
