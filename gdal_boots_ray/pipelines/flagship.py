"""The flagship spatial-join + tiling pipeline.

North-star shape (BASELINE.json): read the Lance-shaped images table →
actor-pool decode to pixel buffers → vectorized bounds + cell ids
(grid + S2) → broadcast PIP join against the polygon side → per-(poly,
tile) zonal partials → groupby(poly_id) final aggregate.  Pixels never
cross a shuffle; the only exchange is the tiny stats groupby.

Streaming end-to-end: no take_all/materialize on the big side; the
result is a small per-polygon aggregate table.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import ray
import ray.data as rd

from gdal_boots_ray.sources.fixtures import nation_polygons
from gdal_boots_ray.stages.decode import DecodeImages
from gdal_boots_ray.stages.geo import add_bounds, make_add_grid_cell, make_add_lonlat, make_add_s2_cell
from gdal_boots_ray.stages.joins import BroadcastPIPJoin, put_polygons
from gdal_boots_ray.stages.zonal import ZonalStats


def run_flagship(
    images_path: str,
    polygons: Optional[Sequence[dict]] = None,
    cell_res: float = 5000.0,
    s2_level: int = 9,
    decode_concurrency=(2, 8),
    batch_size: int = 64,
    with_s2: bool = True,
):
    """Returns the per-polygon zonal aggregate Dataset.

    decode_concurrency/batch_size are the knobs to keep the decode
    actor pool from starving the read/join stages.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    if polygons is None:
        polygons = nation_polygons(np.arange(25))
    poly_ref = put_polygons(polygons)

    ds = rd.read_parquet(images_path)
    ds = ds.map_batches(
        DecodeImages,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=decode_concurrency,
        num_cpus=1,
    )
    # vectorized column stages amortize over bigger batches than decode
    vec_batch = max(batch_size * 8, 512)
    ds = ds.map_batches(add_bounds, batch_format="pyarrow", batch_size=vec_batch)
    ds = ds.map_batches(make_add_grid_cell(cell_res), batch_format="pyarrow", batch_size=vec_batch)
    if with_s2:
        ds = ds.map_batches(make_add_lonlat(), batch_format="pyarrow", batch_size=vec_batch)
        ds = ds.map_batches(make_add_s2_cell(s2_level), batch_format="pyarrow", batch_size=vec_batch)
    joined = ds.map_batches(
        BroadcastPIPJoin,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "polygons_ref": poly_ref,
            # shed caption/phash/cell columns before rows fan out per
            # polygon — only what ZonalStats needs crosses this edge
            "keep_cols": ["image_id", "pixels", "bands", "w", "h", "gt", "cx", "cy"],
        },
        concurrency=(1, 4),
        num_cpus=1,
    )
    stats = joined.map_batches(
        ZonalStats,
        batch_format="pyarrow",
        fn_constructor_kwargs={"polygons_ref": poly_ref},
        concurrency=(1, 4),
        num_cpus=1,
    )
    agg = stats.groupby("poly_id").aggregate(
        Count(alias_name="n_tiles"),
        Sum("n_px", alias_name="n_px"),
        Sum("sum_v", alias_name="sum_v"),
        Min("min_v", alias_name="min_v"),
        Max("max_v", alias_name="max_v"),
    )
    return agg
