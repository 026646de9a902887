"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial-join + tiling pipeline on
sf0.001; ``queries()`` exposes one callable per implemented operator
(SURVEY.md §2 + the training-data operators); ``oracle_sql()`` gives
the DuckDB twin for every SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` here or in the library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: synthesize the input_hint images
    table from `part`, decode (actor pool), bounds + grid/S2 cells,
    broadcast PIP join vs the nation polygons, zonal partials,
    per-polygon aggregate."""
    import numpy as np
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Max, Min, Sum

    from gdal_boots_ray.pipelines.queries import _tiles_dataset, _with_bounds
    from gdal_boots_ray.sources.fixtures import nation_polygons
    from gdal_boots_ray.stages.geo import make_add_grid_cell, make_add_lonlat, make_add_s2_cell
    from gdal_boots_ray.stages.joins import BroadcastPIPJoin, put_polygons
    from gdal_boots_ray.stages.zonal import ZonalStats

    nk = pq.read_table(f"{_SF0001}/nation.parquet", columns=["n_nationkey"]).column(0).to_numpy()
    poly_ref = put_polygons(nation_polygons(nk))

    ds = _with_bounds(_tiles_dataset(_SF0001, decode=True))
    ds = ds.map_batches(make_add_grid_cell(1000.0), batch_format="pyarrow")
    ds = ds.map_batches(make_add_lonlat(), batch_format="pyarrow")
    ds = ds.map_batches(make_add_s2_cell(9), batch_format="pyarrow")
    joined = ds.map_batches(
        BroadcastPIPJoin,
        batch_format="pyarrow",
        fn_constructor_kwargs={"polygons_ref": poly_ref},
        concurrency=(1, 2),
        num_cpus=1,
    )
    stats = joined.map_batches(
        ZonalStats,
        batch_format="pyarrow",
        fn_constructor_kwargs={"polygons_ref": poly_ref},
        concurrency=(1, 2),
        num_cpus=1,
    )
    return stats.groupby("poly_id").aggregate(
        Count(alias_name="n_tiles"),
        Sum("n_px", alias_name="n_px"),
        Sum("sum_v", alias_name="sum_v"),
        Min("min_v", alias_name="min_v"),
        Max("max_v", alias_name="max_v"),
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from gdal_boots_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gdal_boots_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
