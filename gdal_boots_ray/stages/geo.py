"""Stateless geo column stages: bounds, centers, CRS, cell assignment.

All are vectorized pyarrow/numpy batch functions for
``map_batches(fn, batch_format="pyarrow")`` — the columnar versions of
reference ``bounds`` / ``bounds_polygon`` / cell indexing
(gdal.py:301-362 + north-star H3/S2 requirement).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from gdal_boots_ray.kernels.affine import bounds as bounds_kernel
from gdal_boots_ray.kernels.cells import (
    grid_cell_id,
    grid_cells_covering_bounds,
    h3x_cell,
    s2_cell_id,
)
from gdal_boots_ray.kernels.crs import transform_points


def _gt_matrix(batch: pa.Table) -> np.ndarray:
    col = batch.column("gt")
    flat = col.combine_chunks().flatten() if isinstance(col, pa.ChunkedArray) else col.flatten()
    return flat.to_numpy(zero_copy_only=False).reshape(-1, 6)


def add_bounds(batch: pa.Table) -> pa.Table:
    """Append minx/miny/maxx/maxy + center cx/cy columns from gt+w+h."""
    gt = _gt_matrix(batch)
    w = batch.column("w").to_numpy()
    h = batch.column("h").to_numpy()
    b = bounds_kernel(gt, w, h)
    for i, name in enumerate(("minx", "miny", "maxx", "maxy")):
        batch = batch.append_column(name, pa.array(b[:, i], pa.float64()))
    batch = batch.append_column("cx", pa.array((b[:, 0] + b[:, 2]) / 2, pa.float64()))
    batch = batch.append_column("cy", pa.array((b[:, 1] + b[:, 3]) / 2, pa.float64()))
    return batch


def make_add_grid_cell(res: float, x_col: str = "cx", y_col: str = "cy", out: str = "cell"):
    """Grid cell id of a point column (SQL-mirrored formula)."""

    def fn(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy()
        y = batch.column(y_col).to_numpy()
        return batch.append_column(out, pa.array(grid_cell_id(x, y, res), pa.int64()))

    return fn


def make_add_s2_cell(level: int, lon_col: str = "lon", lat_col: str = "lat", out: str = "s2_cell"):
    def fn(batch: pa.Table) -> pa.Table:
        lon = batch.column(lon_col).to_numpy()
        lat = batch.column(lat_col).to_numpy()
        return batch.append_column(out, pa.array(s2_cell_id(lon, lat, level), pa.int64()))

    return fn


def make_add_h3_cell(res: int, lon_col: str = "lon", lat_col: str = "lat", out: str = "h3_cell"):
    """Icosahedral aperture-7 hex cell of a lon/lat column (the
    north-star H3-style index, kernels.cells.h3x_cell)."""

    def fn(batch: pa.Table) -> pa.Table:
        lon = batch.column(lon_col).to_numpy()
        lat = batch.column(lat_col).to_numpy()
        return batch.append_column(out, pa.array(h3x_cell(lon, lat, res), pa.int64()))

    return fn


def make_add_lonlat(crs_col: str = "epsg", x_col: str = "cx", y_col: str = "cy"):
    """Reproject point columns to lon/lat (grouped by the epsg value so
    the CRS kernel runs vectorized per distinct code)."""

    def fn(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy()
        y = batch.column(y_col).to_numpy()
        epsg = batch.column(crs_col).to_numpy()
        lon = np.empty_like(x)
        lat = np.empty_like(y)
        for code in np.unique(epsg):
            m = epsg == code
            lon[m], lat[m] = transform_points(int(code), 4326, x[m], y[m])
        batch = batch.append_column("lon", pa.array(lon, pa.float64()))
        batch = batch.append_column("lat", pa.array(lat, pa.float64()))
        return batch

    return fn


def make_explode_covering_cells(res: float, out: str = "cell"):
    """1 row per (row, covering grid cell) — footprint-to-cells
    assignment feeding the shuffle PIP join (polygons/tiles duplicated
    to every covered cell, deduped after the join; SURVEY §2.6)."""

    def fn(batch: pa.Table) -> pa.Table:
        minx = batch.column("minx").to_numpy()
        miny = batch.column("miny").to_numpy()
        maxx = batch.column("maxx").to_numpy()
        maxy = batch.column("maxy").to_numpy()
        idx: list = []
        cells: list = []
        for i in range(len(minx)):
            cc = grid_cells_covering_bounds((minx[i], miny[i], maxx[i], maxy[i]), res)
            idx.extend([i] * len(cc))
            cells.extend(cc.tolist())
        taken = batch.take(pa.array(idx, pa.int64()))
        return taken.append_column(out, pa.array(cells, pa.int64()))

    return fn


def reproject_bounds_columns(batch: pa.Table, to_crs, crs_col: str = "epsg") -> pa.Table:
    """minx..maxy reprojected (2-corner, reference semantics) into
    minx_t/miny_t/maxx_t/maxy_t."""
    epsg = batch.column(crs_col).to_numpy()
    cols = {n: batch.column(n).to_numpy() for n in ("minx", "miny", "maxx", "maxy")}
    out = {n: np.empty(len(epsg)) for n in cols}
    for code in np.unique(epsg):
        m = epsg == code
        x1, y1 = transform_points(int(code), to_crs, cols["minx"][m], cols["miny"][m])
        x2, y2 = transform_points(int(code), to_crs, cols["maxx"][m], cols["maxy"][m])
        out["minx"][m], out["miny"][m] = np.minimum(x1, x2), np.minimum(y1, y2)
        out["maxx"][m], out["maxy"][m] = np.maximum(x1, x2), np.maximum(y1, y2)
    for n in ("minx", "miny", "maxx", "maxy"):
        batch = batch.append_column(f"{n}_t", pa.array(out[n], pa.float64()))
    return batch
