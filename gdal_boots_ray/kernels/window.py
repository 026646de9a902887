"""fast_warp window crop with the reference's exact snap semantics.

Reimplements ``RasterDataset.fast_warp_as_array`` (reference
gdal.py:739-806) as a pure function: validate the bbox strictly inside
the raster bounds, snap it to the pixel grid (floor of the lower
corner / ceil of the upper corner in *pixel-resolution units*), flip y
(row 0 is the top), slice, and derive the new GeoInfo
``Affine(res_x, 0, xmin, 0, -res_y, ymax)``.

Goldens: tests/test_raster.py:309-365 — 10 m band -> shape (8, 9) and
bounds [[509040, 5946040], [509130, 5946120]]; 60 m -> (2, 2) etc.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from gdal_boots_ray.kernels.affine import Affine, GeoInfo, bounds as bounds_fn, resolution as resolution_fn


def fast_warp_window(gt, w: int, h: int, bbox) -> Tuple[Tuple[int, int, int, int], np.ndarray]:
    """Compute the snapped pixel window for a bbox.

    Returns ((row_lo, row_hi, col_lo, col_hi), snapped_bbox(4,)).
    Raises ValueError when the bbox is malformed or not strictly inside
    the raster bounds (reference gdal.py:749-757).
    """
    bbox = np.asarray(bbox, dtype=np.float64).reshape(-1)
    if not (len(bbox) == 4 and bbox[0] < bbox[2] and bbox[1] < bbox[3]):
        raise ValueError("input bbox should be in format: [x_min, y_min, x_max, y_max]")
    b = bounds_fn(np.asarray(gt, dtype=np.float64), w, h)[0]
    bb = bbox.reshape(2, 2)
    if not (np.all(bb[0] > b[:2]) and np.all(bb[1] < b[2:])):
        raise ValueError(f"input bbox {bbox} should be in bounds of raster {b}")

    res = resolution_fn(np.asarray(gt, dtype=np.float64))[0]  # (res_x, res_y)
    # snap to corners: floor lower / ceil upper in pixel units (gdal.py:770-772)
    sb = bb / res
    sb = np.array([np.floor(sb[0]), np.ceil(sb[1])])
    sb = sb * res

    warp_xy = ((sb - b[:2]) / res).astype(np.int64)  # (2, 2) cols in [:,0], rows-from-bottom in [:,1]
    # y starts at the top-left corner (gdal.py:776-777)
    row_lo = int(h - warp_xy[1, 1])
    row_hi = int(h - warp_xy[0, 1])
    col_lo = int(warp_xy[0, 0])
    col_hi = int(warp_xy[1, 0])
    return (row_lo, row_hi, col_lo, col_hi), sb.reshape(-1)


def fast_warp_as_array(img: np.ndarray, gt, epsg, bbox) -> Tuple[np.ndarray, GeoInfo]:
    """Crop (…, h, w) array to bbox with reference snap semantics."""
    h, w = img.shape[-2:]
    (row_lo, row_hi, col_lo, col_hi), sb = fast_warp_window(gt, w, h, bbox)
    out = img[..., row_lo:row_hi, col_lo:col_hi]
    res = resolution_fn(np.asarray(gt, dtype=np.float64))[0]
    geoinfo = GeoInfo(
        epsg=int(epsg) if epsg else None,
        transform=Affine(res[0], 0.0, float(min(sb[0], sb[2])), 0.0, -res[1], float(max(sb[1], sb[3]))),
    )
    return out, geoinfo
