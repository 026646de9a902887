"""Spatial joins: point-in-polygon, point sampling, kNN.

Join strategies (SURVEY §2.6):

- **Broadcast PIP** (`BroadcastPIPJoin`): the polygon side is small
  (country/AOI sets) — ``ray.put`` the parsed rings once; each actor
  ``ray.get``s them in ``__init__`` and tests every batch of points /
  tile centers vectorized (ray-casting, even-odd).  No shuffle.
- **Shuffle PIP** (`cell_pip_join`): both sides large — explode each
  side to covering grid cells, groupby(cell), per-group PIP, dedup on
  (poly_id, row key).  The cell id is the single partitioning key
  reused across stages; hot cells can be salted upstream.
- **Point sampling join** (`SampleTilesAtPoints`): the distributed
  ``values_by_points`` (reference gdal.py:897-931) — points carry the
  target tile key; the stage decodes/views tile pixels and gathers
  values with the inverse-affine kernel.
- **kNN** (`knn_brute_force` + per-cell variant in similarity.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import ray

from gdal_boots_ray.kernels.geometry import points_in_rings, polygon_rings
from gdal_boots_ray.stages.decode import pixels_view


def _concat_ranges(counts: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(c)`` for every c in counts, vectorized:
    [2,0,3] -> [0,1, 0,1,2]."""
    counts = np.asarray(counts, np.int64)
    total = int(counts.sum())
    if not total:
        return np.empty(0, np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)


def put_polygons(polygons: Sequence[dict]):
    """Parse + pack polygon rings once on the driver; broadcast via
    ray.put (read by every actor, shipped once per node — not per
    batch)."""
    packed = [(int(p["poly_id"]), polygon_rings(p["geometry"])) for p in polygons]
    return ray.put(packed)


class BroadcastPIPJoin:
    """map_batches actor: emits one output row per (input row, matching
    polygon).  STRtree over polygon envelopes (built ONCE per actor in
    ``__init__`` — the stateful-setup contract) prunes candidates;
    vectorized ray-casting decides the survivors.  Inputs need x/y
    columns (tile centers or point coords)."""

    def __init__(self, polygons_ref, x_col: str = "cx", y_col: str = "cy", keep_cols: Optional[List[str]] = None):
        from gdal_boots_ray.kernels.strtree import STRtree, rings_bbox

        self.polygons = ray.get(polygons_ref) if isinstance(polygons_ref, ray.ObjectRef) else polygons_ref
        self.x_col = x_col
        self.y_col = y_col
        self.keep_cols = keep_cols
        self.tree = STRtree(
            np.array([rings_bbox(rings) for _, rings in self.polygons]).reshape(-1, 4)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column(self.x_col).to_numpy()
        y = batch.column(self.y_col).to_numpy()
        cand_pt, cand_poly = self.tree.query_points(x, y)
        take_idx: List[int] = []
        poly_ids: List[int] = []
        # iterate polygons in list order (stable output order) but
        # ray-cast only each polygon's bbox candidates
        order = np.argsort(cand_poly, kind="stable")
        cand_pt, cand_poly = cand_pt[order], cand_poly[order]
        bounds = np.searchsorted(cand_poly, np.arange(len(self.polygons) + 1))
        for j, (pid, rings) in enumerate(self.polygons):
            pts = cand_pt[bounds[j] : bounds[j + 1]]
            if not len(pts):
                continue
            inside = points_in_rings(x[pts], y[pts], rings)
            hits = pts[inside]
            take_idx.extend(hits.tolist())
            poly_ids.extend([pid] * len(hits))
        if self.keep_cols:
            batch = batch.select(self.keep_cols)
        if not take_idx:
            empty = batch.schema.empty_table()
            return empty.append_column("poly_id", pa.array([], pa.int64()))
        order = np.argsort(np.asarray(take_idx), kind="stable")
        taken = batch.take(pa.array(np.asarray(take_idx)[order], pa.int64()))
        return taken.append_column("poly_id", pa.array(np.asarray(poly_ids)[order], pa.int64()))


class SampleTilesAtPoints:
    """Distributed values_by_points: batches are (point ⨝ tile) rows
    with point coords + tile pixels; gathers the pixel value under each
    point with the inverse-affine kernel (half-open edges)."""

    def __init__(self, x_col: str = "px", y_col: str = "py"):
        self.x_col = x_col
        self.y_col = y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from gdal_boots_ray.kernels.affine import invert_gt
        from gdal_boots_ray.stages.decode import batch_pixel_views

        n = batch.num_rows
        xs = batch.column(self.x_col).to_numpy().astype(np.float64)
        ys = batch.column(self.y_col).to_numpy().astype(np.float64)
        gts = batch.column("gt").combine_chunks().flatten().to_numpy(zero_copy_only=False).reshape(-1, 6)
        views = batch_pixel_views(batch)  # zero-copy, dtype-aware
        # row-wise inverse affine, fully vectorized (one (n,6) invert,
        # no per-row 1-element sample_points calls)
        inv = invert_gt(gts)
        px = np.floor(inv[:, 0] * xs + inv[:, 1] * ys + inv[:, 2]).astype(np.int64)
        py = np.floor(inv[:, 3] * xs + inv[:, 4] * ys + inv[:, 5]).astype(np.int64)
        ws = batch.column("w").to_numpy().astype(np.int64)
        hs = batch.column("h").to_numpy().astype(np.int64)
        valid = (px >= 0) & (px < ws) & (py >= 0) & (py < hs)
        values = np.full(n, np.nan, dtype=np.float64)
        for i in np.nonzero(valid)[0]:  # thin gather: one indexed load per hit
            img = views[i]
            band0 = img if img.ndim == 2 else img[0]
            values[i] = float(band0[py[i], px[i]])
        batch = batch.append_column("value", pa.array(values, pa.float64()))
        batch = batch.append_column("in_bounds", pa.array(valid, pa.bool_()))
        return batch


def cell_pip_join(
    points_ds,
    polygons,
    cell_res: float,
    x_col: str = "x",
    y_col: str = "y",
    key_col: str = "pid",
):
    """Shuffle PIP join where BOTH sides stream as Datasets — the
    cluster-scale form of the reference's crop/contains joins
    (gdal.py:819-888) with no driver-side materialization of either
    side.

    ``polygons`` is a Dataset with columns (poly_id, geom[GeoJSON
    string]) — a driver-side list of GeoJSON feature dicts is also
    accepted and converted for the small/legacy callers.

    Physical plan: each polygon row explodes to its envelope's
    covering grid cells (a Dataset map, so the polygon side scales out
    too); each point carries its single home cell; both co-shuffle
    once on ``cell`` (groupby) and every cell group parses its local
    polygons once and runs vectorized ray-casting over the group's
    points.  A matching (point, polygon) pair meets in EXACTLY the
    point's home cell — the polygon's covering cells include every
    cell it touches — so matches are globally unique and no dedup
    shuffle is needed.

    Partitioning assumption: a polygon spans few grid cells at the
    chosen ``cell_res`` (envelope explosion is exact; res only
    affects fan-out).  Hot cells can be salted upstream (stages.skew).
    """
    import json

    import ray.data as rd

    from gdal_boots_ray.kernels.cells import grid_cell_id, grid_cells_covering_bounds

    if not hasattr(polygons, "map_batches"):  # legacy list-of-dicts callers
        polygons = rd.from_arrow(
            pa.table(
                {
                    "poly_id": pa.array([int(p["poly_id"]) for p in polygons], pa.int64()),
                    "geom": pa.array([json.dumps(p["geometry"]) for p in polygons], pa.string()),
                }
            )
        )

    def explode_polys(batch: pa.Table) -> pa.Table:
        pids = batch.column("poly_id").to_numpy()
        geoms = batch.column("geom").to_pylist()
        out_cell: List[int] = []
        out_idx: List[int] = []
        for i, gj in enumerate(geoms):
            rings = polygon_rings(json.loads(gj))
            ext = rings[0]
            env = (ext[:, 0].min(), ext[:, 1].min(), ext[:, 0].max(), ext[:, 1].max())
            cc = grid_cells_covering_bounds(env, cell_res)
            out_cell.extend(cc.tolist())
            out_idx.extend([i] * len(cc))
        n = len(out_cell)
        return pa.table(
            {
                "cell": pa.array(out_cell, pa.int64()),
                "kind": pa.array(np.ones(n, np.int8)),
                "id": pa.array(pids[out_idx] if n else [], pa.int64()),
                "x": pa.array(np.full(n, np.nan), pa.float64()),
                "y": pa.array(np.full(n, np.nan), pa.float64()),
                "geom": pa.array([geoms[i] for i in out_idx], pa.string()),
            }
        )

    def tag_points(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy()
        y = batch.column(y_col).to_numpy()
        n = len(x)
        return pa.table(
            {
                "cell": pa.array(grid_cell_id(x, y, cell_res), pa.int64()),
                "kind": pa.array(np.zeros(n, np.int8)),
                "id": batch.column(key_col).cast(pa.int64()),
                "x": pa.array(x, pa.float64()),
                "y": pa.array(y, pa.float64()),
                "geom": pa.array([None] * n, pa.string()),
            }
        )

    both = points_ds.map_batches(tag_points, batch_format="pyarrow").union(
        polygons.map_batches(explode_polys, batch_format="pyarrow")
    )

    def group_pip(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {key_col: pa.array([], pa.int64()), "poly_id": pa.array([], pa.int64())}
        )
        pm = g.column("kind").to_numpy() == 1
        if not pm.any() or pm.all():
            return empty
        ids = g.column("id").to_numpy()
        px = g.column("x").to_numpy()[~pm]
        py = g.column("y").to_numpy()[~pm]
        pids = ids[~pm]
        geoms = g.column("geom").to_numpy(zero_copy_only=False)
        poly_rows = list(zip(ids[pm], geoms[pm]))
        all_rings = [polygon_rings(json.loads(gj)) for _, gj in poly_rows]
        out_keys: List[np.ndarray] = []
        out_polys: List[np.ndarray] = []
        if len(poly_rows) >= 16:
            # many polygons share this cell: STRtree over their
            # envelopes prunes to bbox candidates before ray-casting
            from gdal_boots_ray.kernels.strtree import STRtree, rings_bbox

            tree = STRtree(np.array([rings_bbox(r) for r in all_rings]).reshape(-1, 4))
            cand_pt, cand_poly = tree.query_points(px, py)
            order = np.argsort(cand_poly, kind="stable")
            cand_pt, cand_poly = cand_pt[order], cand_poly[order]
            bounds = np.searchsorted(cand_poly, np.arange(len(poly_rows) + 1))
            for j, (poly_id, _) in enumerate(poly_rows):
                pts = cand_pt[bounds[j] : bounds[j + 1]]
                if not len(pts):
                    continue
                inside = points_in_rings(px[pts], py[pts], all_rings[j])
                hits = pids[pts[inside]]
                out_keys.append(hits)
                out_polys.append(np.full(len(hits), poly_id, np.int64))
        else:
            for (poly_id, _), rings in zip(poly_rows, all_rings):
                inside = points_in_rings(px, py, rings)
                hits = pids[inside]
                out_keys.append(hits)
                out_polys.append(np.full(len(hits), poly_id, np.int64))
        if not out_keys:
            return empty
        return pa.table(
            {
                key_col: pa.array(np.concatenate(out_keys).astype(np.int64), pa.int64()),
                "poly_id": pa.array(np.concatenate(out_polys), pa.int64()),
            }
        )

    return both.groupby("cell").map_groups(group_pip, batch_format="pyarrow")


def asof_join(
    left_ds,
    right_ds,
    by_col: str,
    ts_col: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
):
    """Distributed AS-OF join: for every left row, the right row with
    the greatest ``ts_col`` <= the left row's, within the same
    ``by_col`` group (the temporal join Ray Data lacks natively;
    composition: tag -> union -> groupby(by) -> sorted searchsorted
    merge per group).  Left rows with no prior right row are dropped
    (inner as-of).

    ``left_cols`` / ``right_cols`` name the carried payload columns
    (disjoint).  Output schema: by_col, *left_cols, *right_cols.

    Partitioning assumption: one ``by_col`` group fits a worker (same
    contract as any sessionization); salt hot keys upstream if not.
    """

    def _types(ds, cols):
        try:
            sch = ds.schema().base_schema
            return {c: sch.field(c).type for c in cols}
        except Exception:
            return {}

    lt = _types(left_ds, [ts_col, *left_cols])
    rt = _types(right_ds, [ts_col, *right_cols])

    def tag(batch: pa.Table, kind: int) -> pa.Table:
        n = batch.num_rows
        out = {
            "k": batch.column(by_col).cast(pa.int64()),
            "kind": pa.array(np.full(n, kind, np.int8)),
            "ts": batch.column(ts_col),
        }
        for c in left_cols:
            out[f"l_{c}"] = batch.column(c) if kind == 0 else pa.nulls(n, lt.get(c))
        for c in right_cols:
            out[f"r_{c}"] = batch.column(c) if kind == 1 else pa.nulls(n, rt.get(c))
        return pa.table(out)

    both = left_ds.map_batches(lambda b: tag(b, 0), batch_format="pyarrow").union(
        right_ds.map_batches(lambda b: tag(b, 1), batch_format="pyarrow")
    )

    def merge(g: pa.Table) -> pa.Table:
        kind = g.column("kind").to_numpy()
        lidx = np.flatnonzero(kind == 0)
        ridx = np.flatnonzero(kind == 1)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        lo = lidx[np.argsort(ts[lidx], kind="mergesort")]
        ro = ridx[np.argsort(ts[ridx], kind="mergesort")]
        if not len(lo) or not len(ro):
            cols = {by_col: g.column("k").take(pa.array([], pa.int64()))}
            for c in left_cols:
                cols[c] = g.column(f"l_{c}").take(pa.array([], pa.int64()))
            for c in right_cols:
                cols[c] = g.column(f"r_{c}").take(pa.array([], pa.int64()))
            return pa.table(cols)
        idx = np.searchsorted(ts[ro], ts[lo], side="right") - 1
        keep = idx >= 0
        lrows = lo[keep]
        rrows = ro[idx[keep]]
        lt_tbl = g.take(pa.array(lrows, pa.int64()))
        rt_tbl = g.take(pa.array(rrows, pa.int64()))
        cols = {by_col: lt_tbl.column("k")}
        for c in left_cols:
            cols[c] = lt_tbl.column(f"l_{c}")
        for c in right_cols:
            cols[c] = rt_tbl.column(f"r_{c}")
        return pa.table(cols)

    return both.groupby("k").map_groups(merge, batch_format="pyarrow")


def interval_join(
    points_ds,
    intervals_ds,
    val_col: str,
    point_key_col: str,
    iv_key_col: str,
    lo_col: str,
    hi_col: str,
    cell_width: float,
):
    """Distributed RANGE join: each point row joins every interval row
    with ``lo <= val < hi`` — the 1-D analog of the cell PIP join.
    Both sides stream: intervals explode to covering value-grid cells
    inside map_batches, points carry their single home cell, one
    co-shuffle on the cell, exact filter per group.  A match meets
    exactly in the point's home cell, so no dedup pass.

    ``cell_width`` trades interval fan-out (hi-lo)/width against group
    sizes — same contract as cell_res in cell_pip_join."""

    def tag_points(batch: pa.Table) -> pa.Table:
        v = batch.column(val_col).to_numpy().astype(np.float64)
        n = len(v)
        return pa.table(
            {
                "cell": pa.array(np.floor(v / cell_width).astype(np.int64), pa.int64()),
                "kind": pa.array(np.zeros(n, np.int8)),
                "id": batch.column(point_key_col).cast(pa.int64()),
                "v": pa.array(v, pa.float64()),
                "lo": pa.array(np.full(n, np.nan), pa.float64()),
                "hi": pa.array(np.full(n, np.nan), pa.float64()),
            }
        )

    def explode_intervals(batch: pa.Table) -> pa.Table:
        lo = batch.column(lo_col).to_numpy().astype(np.float64)
        hi = batch.column(hi_col).to_numpy().astype(np.float64)
        ids = batch.column(iv_key_col).to_numpy().astype(np.int64)
        # vectorized cell fan-out: concatenated aranges via the
        # repeat-offset trick (no Python loop over intervals)
        c0 = np.floor(lo / cell_width).astype(np.int64)
        c1 = np.floor(np.nextafter(hi, -np.inf) / cell_width).astype(np.int64)
        cnt = np.maximum(c1, c0) - c0 + 1
        cells = np.repeat(c0, cnt) + _concat_ranges(cnt)
        idx = np.repeat(np.arange(len(lo), dtype=np.int64), cnt)
        n = len(cells)
        return pa.table(
            {
                "cell": pa.array(cells, pa.int64()),
                "kind": pa.array(np.ones(n, np.int8)),
                "id": pa.array(ids[idx] if n else [], pa.int64()),
                "v": pa.array(np.full(n, np.nan), pa.float64()),
                "lo": pa.array(lo[idx] if n else [], pa.float64()),
                "hi": pa.array(hi[idx] if n else [], pa.float64()),
            }
        )

    both = points_ds.map_batches(tag_points, batch_format="pyarrow").union(
        intervals_ds.map_batches(explode_intervals, batch_format="pyarrow")
    )

    def group_join(g: pa.Table) -> pa.Table:
        im = g.column("kind").to_numpy() == 1
        pm = np.flatnonzero(~im)
        iv = np.flatnonzero(im)
        if not len(pm) or not len(iv):
            return pa.table(
                {point_key_col: pa.array([], pa.int64()), iv_key_col: pa.array([], pa.int64())}
            )
        # sort points once, then each interval [lo, hi) is a
        # searchsorted slice — O((n+m) log n), no loop over intervals
        ids = g.column("id").to_numpy()
        v = g.column("v").to_numpy()[pm]
        order = np.argsort(v, kind="mergesort")
        vs = v[order]
        pids = ids[pm][order]
        start = np.searchsorted(vs, g.column("lo").to_numpy()[iv], side="left")
        end = np.searchsorted(vs, g.column("hi").to_numpy()[iv], side="left")
        cnt = np.maximum(end - start, 0)
        idx = np.repeat(start, cnt) + _concat_ranges(cnt)
        return pa.table(
            {
                point_key_col: pa.array(pids[idx].astype(np.int64), pa.int64()),
                iv_key_col: pa.array(np.repeat(ids[iv], cnt).astype(np.int64), pa.int64()),
            }
        )

    return both.groupby("cell").map_groups(group_join, batch_format="pyarrow")


def hash_join(
    left_ds,
    right_ds,
    on: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    n_buckets: Optional[int] = None,
    how: str = "inner",
):
    """Generic two-large-sides equi-join: bucketed shuffle hash join.

    ``how``: 'inner' (default), 'semi' (left rows with a match, left
    columns only), 'anti' (left rows with NO match) — the EXISTS /
    NOT EXISTS shapes — or 'left' (every left row, right columns
    null-padded on no match); all run the same single co-shuffle.

    Neither side is broadcast or driver-materialized: both stream
    through a key-hash bucketing stage (fan-out scales with the
    cluster via ``_default_n_buckets``), co-shuffle ONCE on the
    bucket, and each bucket merges vectorized (Arrow take + numpy
    searchsorted, no pandas frame in the exchange).  This is
    the partitioned hash join a SQL engine plans for orders ⋈
    customer — the exchange moves each row exactly once.

    Inner join on ``on`` (present in both sides, integer or string).
    Output schema: on, *left_cols, *right_cols (disjoint names).
    Skew: one hot key still lands in one bucket; salt upstream with
    ``stages.skew`` if a single key's rows exceed a worker.
    """
    from gdal_boots_ray.stages.agg import _default_n_buckets, _key_buckets_arrow

    if n_buckets is None:
        n_buckets = _default_n_buckets()

    def _types(ds, cols):
        try:
            sch = ds.schema().base_schema
            return {c: sch.field(c).type for c in cols}
        except Exception:
            return {}

    lt = _types(left_ds, left_cols)
    rt = _types(right_ds, right_cols)

    def tag(batch: pa.Table, kind: int) -> pa.Table:
        n = batch.num_rows
        k = batch.column(on)
        # normalize numeric keys: empty upstream blocks can promote
        # int64 to float64 (pandas empty-frame artifacts) and the
        # groupby sort refuses to concat mismatched key types
        if pa.types.is_floating(k.type) or pa.types.is_integer(k.type):
            k = k.cast(pa.int64())
        out = {"k": k, "kind": pa.array(np.full(n, kind, np.int8))}
        for c in left_cols:
            out[f"l_{c}"] = batch.column(c) if kind == 0 else pa.nulls(n, lt.get(c))
        for c in right_cols:
            out[f"r_{c}"] = batch.column(c) if kind == 1 else pa.nulls(n, rt.get(c))
        t = pa.table(out)
        bucket = _key_buckets_arrow(t, ["k"], n_buckets)
        return t.append_column("_bucket", pa.array(bucket, pa.int64()))

    both = left_ds.map_batches(lambda b: tag(b, 0), batch_format="pyarrow").union(
        right_ds.map_batches(lambda b: tag(b, 1), batch_format="pyarrow")
    )

    def _keys_np(tbl: pa.Table) -> np.ndarray:
        k = tbl.column("k")
        if pa.types.is_string(k.type) or pa.types.is_large_string(k.type):
            return k.to_numpy(zero_copy_only=False)
        return k.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)

    def merge(g: pa.Table) -> pa.Table:
        # pure-Arrow bucket merge: keys match via one sort +
        # searchsorted (numpy), payload moves via Table.take — column
        # types survive untouched (list/string/int), no pandas frame
        # and no per-value type fix-up anywhere in the exchange
        kind = g.column("kind").to_numpy()
        lidx = np.flatnonzero(kind == 0)
        ridx = np.flatnonzero(kind == 1)
        keys = _keys_np(g)
        lk = keys[lidx]
        rk = keys[ridx]
        rorder = np.argsort(rk, kind="mergesort")
        rks = rk[rorder]
        start = np.searchsorted(rks, lk, side="left")
        end = np.searchsorted(rks, lk, side="right")
        cnt = end - start

        def emit(tbl: pa.Table, rows: np.ndarray, with_right: bool = False,
                 right_rows: Optional[np.ndarray] = None) -> pa.Table:
            t = tbl.take(pa.array(rows, pa.int64()))
            cols = {on: t.column("k")}
            for c in left_cols:
                cols[c] = t.column(f"l_{c}")
            if with_right:
                if right_rows is None:
                    for c in right_cols:
                        cols[c] = t.column(f"r_{c}")
                else:
                    rt_tbl = tbl.take(pa.array(right_rows, pa.int64()))
                    for c in right_cols:
                        cols[c] = rt_tbl.column(f"r_{c}")
            return pa.table(cols)

        if how == "semi":
            return emit(g, lidx[cnt > 0])
        if how == "anti":
            return emit(g, lidx[cnt == 0])
        # matched (left row i repeated cnt[i] times) x (right rows)
        l_rows = np.repeat(lidx, cnt)
        r_rows = ridx[rorder[np.repeat(start, cnt) + _concat_ranges(cnt)]]
        inner = emit(g, l_rows, with_right=True, right_rows=r_rows)
        if how == "inner":
            return inner
        if how == "left":
            miss = lidx[cnt == 0]
            if not len(miss):
                return inner
            lt_tbl = g.take(pa.array(miss, pa.int64()))
            cols = {on: lt_tbl.column("k")}
            for c in left_cols:
                cols[c] = lt_tbl.column(f"l_{c}")
            for c in right_cols:
                cols[c] = pa.nulls(len(miss), inner.schema.field(c).type)
            # promote: unmatched-side nulls may carry the null type
            # when upstream schema introspection had no field type
            return pa.concat_tables([inner, pa.table(cols)], promote_options="default")
        raise ValueError(f"unknown join how={how!r}")

    return both.groupby("_bucket").map_groups(merge, batch_format="pyarrow")


def knn_brute_force(embeddings_ds, queries: np.ndarray, k: int, query_ids: Optional[np.ndarray] = None):
    """Brute-force cosine top-k: the query matrix is broadcast once
    (``ray.put``); each batch computes a (batch x queries) matmul and
    emits its local top-k candidates; a final small groupby reduces to
    the global top-k.  Returns Dataset (q_id, vec_id, sim) with
    ``sim`` rounded to 6 decimals, ordered by (q_id, -sim, vec_id).
    """
    import pandas as pd

    q = np.asarray(queries, dtype=np.float64)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    qids = np.arange(q.shape[0], dtype=np.int64) if query_ids is None else np.asarray(query_ids, np.int64)
    q_ref = ray.put((qn, qids))

    class BatchTopK:
        def __init__(self):
            self.qn, self.qids = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = batch.column("embedding").combine_chunks()
            mat = vecs.flatten().to_numpy(zero_copy_only=False).reshape(len(batch), -1).astype(np.float64)
            ids = batch.column("vec_id").to_numpy()
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ self.qn.T  # (rows, n_q)
            kk = min(k, sims.shape[0])
            out_q, out_v, out_s = [], [], []
            for j in range(sims.shape[1]):
                col = sims[:, j]
                top = np.argpartition(-col, kk - 1)[:kk]
                out_q.append(np.full(kk, self.qids[j], np.int64))
                out_v.append(ids[top].astype(np.int64))
                out_s.append(col[top])
            return pa.table(
                {
                    "q_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                    "sim": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    cand = embeddings_ds.map_batches(BatchTopK, batch_format="pyarrow", concurrency=(1, 8))
    # candidates are tiny by construction (k per query per block): the
    # global top-k reduces on the driver, like ds.sum() would — a
    # Dataset groupby here costs seconds of fixed sort overhead
    allc = cand.to_pandas()
    out = (
        allc.sort_values(["q_id", "sim", "vec_id"], ascending=[True, False, True])
        .groupby("q_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["sim"] = out["sim"].round(6)
    return out
