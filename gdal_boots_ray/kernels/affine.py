"""Affine geotransform + GeoInfo math.

Semantics match the reference ``gdal_boots.gdal.GeoInfo`` /
``RasterDataset.bounds`` / ``set_bounds`` / ``resolution``
(reference gdal.py:120-176, 301-377) — a 6-parameter affine map from
pixel (col, row) to world (x, y):

    x = a * col + b * row + c
    y = d * col + e * row + f

i.e. the ``affine.Affine`` parameter order the reference uses
(a, b, c, d, e, f), *not* the raw GDAL geotransform order.

All functions are vectorized: ``gt`` may be one tuple of 6 floats or an
``(n, 6)`` ndarray; coordinate inputs may be scalars or arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


class Affine(tuple):
    """Minimal immutable affine transform, parameter-compatible with the
    public ``affine.Affine`` (a, b, c, d, e, f)."""

    __slots__ = ()

    def __new__(cls, a, b, c, d, e, f):
        return super().__new__(cls, (float(a), float(b), float(c), float(d), float(e), float(f)))

    @property
    def a(self):
        return self[0]

    @property
    def b(self):
        return self[1]

    @property
    def c(self):
        return self[2]

    @property
    def d(self):
        return self[3]

    @property
    def e(self):
        return self[4]

    @property
    def f(self):
        return self[5]

    @classmethod
    def identity(cls) -> "Affine":
        return cls(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)

    @classmethod
    def from_gdal(cls, c, a, b, f, d, e) -> "Affine":
        """From GDAL geotransform order (x0, dx, rx, y0, ry, dy)."""
        return cls(a, b, c, d, e, f)

    def to_gdal(self) -> Tuple[float, float, float, float, float, float]:
        a, b, c, d, e, f = self
        return (c, a, b, f, d, e)

    @classmethod
    def scale(cls, sx, sy=None) -> "Affine":
        if sy is None:
            sy = sx
        return cls(sx, 0.0, 0.0, 0.0, sy, 0.0)

    def __mul__(self, other: "Affine") -> "Affine":
        """Matrix composition self @ other (apply ``other`` first)."""
        sa, sb, sc, sd, se, sf = self
        oa, ob, oc, od, oe, of_ = other
        return Affine(
            sa * oa + sb * od,
            sa * ob + sb * oe,
            sa * oc + sb * of_ + sc,
            sd * oa + se * od,
            sd * ob + se * oe,
            sd * oc + se * of_ + sf,
        )

    def apply(self, col, row):
        """Pixel -> world. Accepts scalars or ndarrays."""
        a, b, c, d, e, f = self
        return a * np.asarray(col) + b * np.asarray(row) + c, d * np.asarray(col) + e * np.asarray(row) + f

    def invert(self) -> "Affine":
        a, b, c, d, e, f = self
        det = a * e - b * d
        if det == 0:
            raise ValueError("non-invertible affine transform")
        ia, ib = e / det, -b / det
        id_, ie = -d / det, a / det
        return Affine(ia, ib, -(ia * c + ib * f), id_, ie, -(id_ * c + ie * f))


@dataclass
class GeoInfo:
    """Georeferencing metadata: EPSG code + affine transform, optional
    proj4 fallback (reference gdal.py:120-176)."""

    epsg: Optional[int]
    transform: Affine
    proj4: Optional[str] = None

    def scale(self, sx, sy=None) -> "GeoInfo":
        return GeoInfo(self.epsg, self.transform * Affine.scale(sx, sy), self.proj4)

    @property
    def projection_str(self) -> str:
        if self.epsg:
            return f"epsg:{self.epsg}"
        if self.proj4:
            return f"proj4:{self.proj4}"
        return ""

    def to_cols(self):
        """Columnar representation: (epsg:int32, gt: 6 float64)."""
        return int(self.epsg or 0), tuple(self.transform)

    @classmethod
    def from_cols(cls, epsg: int, gt, proj4: Optional[str] = None) -> "GeoInfo":
        return cls(int(epsg) or None, Affine(*gt), proj4)


# ---------------------------------------------------------------------------
# Vectorized columnar kernels over (n, 6) geotransform arrays
# ---------------------------------------------------------------------------


def _gt_cols(gt: np.ndarray):
    gt = np.atleast_2d(np.asarray(gt, dtype=np.float64))
    return gt[:, 0], gt[:, 1], gt[:, 2], gt[:, 3], gt[:, 4], gt[:, 5]


def bounds(gt: np.ndarray, w: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Corner math of reference ``RasterDataset.bounds`` (gdal.py:301-342).

    Returns ``(n, 4)`` array of (min_x, min_y, max_x, max_y) for n rasters
    with geotransforms ``gt`` (n, 6) and pixel sizes w, h.  Rotation terms
    b, d are ignored exactly as the reference ignores them.
    """
    a, _b, c, _d, e, f = _gt_cols(gt)
    w = np.asarray(w, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)
    xb1, yb1 = c, f
    xb2 = c + a * w
    yb2 = f + e * h
    return np.stack(
        [np.minimum(xb1, xb2), np.minimum(yb1, yb2), np.maximum(xb1, xb2), np.maximum(yb1, yb2)],
        axis=1,
    )


def bounds_polygon_coords(b: np.ndarray) -> np.ndarray:
    """5-point closed rings of the bounds boxes (gdal.py:344-362).

    b: (n, 4) minx,miny,maxx,maxy -> (n, 5, 2) rings, reference vertex
    order (min,min) (max,min) (max,max) (min,max) (min,min).
    """
    b = np.atleast_2d(np.asarray(b, dtype=np.float64))
    minx, miny, maxx, maxy = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    ring = np.empty((b.shape[0], 5, 2), dtype=np.float64)
    ring[:, 0, 0], ring[:, 0, 1] = minx, miny
    ring[:, 1, 0], ring[:, 1, 1] = maxx, miny
    ring[:, 2, 0], ring[:, 2, 1] = maxx, maxy
    ring[:, 3, 0], ring[:, 3, 1] = minx, maxy
    ring[:, 4, 0], ring[:, 4, 1] = minx, miny
    return ring


def gt_from_bounds(b: np.ndarray, w, h, resolution=None) -> np.ndarray:
    """Reference ``set_bounds`` formula (gdal.py:364-377):
    ``Affine(res_x, 0, xmin, 0, -res_y, ymax)`` with
    ``res = extent / size`` when resolution not given.

    b: (n, 4) minx,miny,maxx,maxy; returns (n, 6) geotransforms.
    """
    b = np.atleast_2d(np.asarray(b, dtype=np.float64))
    w = np.broadcast_to(np.asarray(w, dtype=np.float64), b.shape[0])
    h = np.broadcast_to(np.asarray(h, dtype=np.float64), b.shape[0])
    if resolution is not None:
        res_x = np.broadcast_to(np.asarray(resolution[0], dtype=np.float64), b.shape[0])
        res_y = np.broadcast_to(np.asarray(resolution[1], dtype=np.float64), b.shape[0])
    else:
        res_x = (b[:, 2] - b[:, 0]) / w
        res_y = (b[:, 3] - b[:, 1]) / h
    out = np.zeros((b.shape[0], 6), dtype=np.float64)
    out[:, 0] = res_x
    out[:, 2] = b[:, 0]
    out[:, 4] = -res_y
    out[:, 5] = b[:, 3]
    return out


def resolution(gt: np.ndarray) -> np.ndarray:
    """(a, -e) per raster (gdal.py:261-263). Returns (n, 2)."""
    a, _b, _c, _d, e, _f = _gt_cols(gt)
    return np.stack([a, -e], axis=1)


def invert_gt(gt) -> np.ndarray:
    """Vectorized inverse of (n, 6) geotransforms."""
    a, b, c, d, e, f = _gt_cols(gt)
    det = a * e - b * d
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    out = np.stack([ia, ib, -(ia * c + ib * f), id_, ie, -(id_ * c + ie * f)], axis=1)
    return out


def apply_gt(gt, col, row):
    """Apply (possibly broadcast) geotransform rows to pixel coords."""
    a, b, c, d, e, f = _gt_cols(gt)
    col = np.asarray(col, dtype=np.float64)
    row = np.asarray(row, dtype=np.float64)
    return a * col + b * row + c, d * col + e * row + f
