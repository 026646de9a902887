"""Aggregation combinators that avoid per-group Python overhead.

Ray's ``groupby(keys).aggregate`` sort-reduces per group — fine for
dozens of groups, pathological for millions of tiny groups (30s for a
126k-group count in local testing).  The scale-correct shape is:

1. **partial**: aggregate inside each batch (vectorized pandas/numpy),
   emitting one row per (key, batch);
2. **bucketed final**: hash keys into a bounded number of buckets,
   shuffle once on the small partials, combine each bucket vectorized.

This is the combiner/pre-aggregation pattern the Ray guide recommends
before any wide groupby; exposed here as a reusable helper.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def _default_n_buckets() -> int:
    """Scale the final-combine fan-out with the cluster (2x CPUs,
    floor 32) so the reducer count grows with the cluster instead of
    silently capping parallelism at a constant."""
    try:
        import ray

        return max(32, 2 * int(ray.cluster_resources().get("CPU", 16)))
    except Exception:
        return 32


def _key_buckets(batch: pd.DataFrame, keys: Sequence[str], n_buckets: int) -> np.ndarray:
    """Deterministic hash of the key columns into ``n_buckets``."""
    h = np.zeros(len(batch), dtype=np.uint64)
    for k in keys:
        col = batch[k]
        if col.dtype == object:
            vals = pd.util.hash_array(col.to_numpy().astype(str)).astype(np.uint64)
        else:
            vals = col.to_numpy().astype(np.uint64, copy=False)
        h = h * np.uint64(1000003) + vals
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _key_buckets_arrow(batch: pa.Table, keys: Sequence[str], n_buckets: int) -> np.ndarray:
    """Arrow-native twin of :func:`_key_buckets` — same hash, same
    bucket assignment, but reads the key columns straight off the
    Arrow table (no DataFrame wrapper in the exchange hot path)."""
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        col = batch.column(k)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            arr = col.to_numpy(zero_copy_only=False).astype(str)
            vals = pd.util.hash_array(arr).astype(np.uint64)
        else:
            vals = col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        h = h * np.uint64(1000003) + vals
    return (h % np.uint64(n_buckets)).astype(np.int64)


def bucketed_aggregate(
    ds,
    keys: Sequence[str],
    agg: Dict[str, str],
    n_buckets: Optional[int] = None,
):
    """Partial-per-batch then bucketed-final aggregation.

    agg: {column: 'sum'|'count'|'min'|'max'} — 'count' counts rows and
    needs no source column (use any name).  Returns Dataset with key
    columns + aggregated columns (named as the dict keys).

    ``n_buckets`` bounds the final-combine shuffle fan-out; the
    default scales with the cluster (2x CPU count, floor 32) so the
    reducer count grows with the cluster instead of silently capping
    parallelism at a constant.
    """
    keys = list(keys)
    if n_buckets is None:
        n_buckets = _default_n_buckets()

    spec_items = list(agg.items())

    def _arrow_agg(batch: pa.Table, items) -> pa.Table:
        """One pyarrow hash-aggregate pass; output columns are the key
        columns followed by the agg dict's names.  Zero-copy in/out —
        the exchange never sees a pandas frame."""
        plan = []
        for name, how in items:
            plan.append((keys[0] if how == "count" else name, how))
        res = batch.group_by(keys, use_threads=False).aggregate(plan)
        # pyarrow names results "<col>_<func>" and puts keys last
        cols = {k: res.column(k) for k in keys}
        for (name, _), (src, how) in zip(items, plan):
            cols[name] = res.column(f"{src}_{how}")
        return pa.table(cols)

    def partial(batch: pa.Table) -> pa.Table:
        out = _arrow_agg(batch, spec_items)
        return out.append_column(
            "_bucket", pa.array(_key_buckets_arrow(out, keys, n_buckets), pa.int64())
        )

    second = {"count": "sum"}  # counts combine by summing

    final_items = [(name, second.get(how, how)) for name, how in spec_items]

    def final(g: pa.Table) -> pa.Table:
        return _arrow_agg(g.drop_columns(["_bucket"]), final_items)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("_bucket").map_groups(final, batch_format="pyarrow")


def grouped_top_k(
    ds,
    keys: Sequence[str],
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols: Sequence[str] = (),
    n_buckets: Optional[int] = None,
):
    """Per-group top-k without a global sort.

    Two-phase plan (the windowed ``ROW_NUMBER() <= k`` a SQL engine
    would sort-shuffle for): each batch keeps at most ``k`` rows per
    group it sees (vectorized stable sort + ``groupby.head``), so the
    only exchange moves <= k x (groups present in that batch) rows —
    never raw data — into a bucketed final that re-applies the same
    top-k per group.  ``tie_cols`` (ascending) make the result
    deterministic under ties; the shuffle fan-out scales with the
    cluster via ``_default_n_buckets``.  Semantics follow the
    reference's ordered-read idiom (gdal.py feature iteration is
    deterministic) lifted to a distributed setting.
    """
    keys = list(keys)
    if n_buckets is None:
        n_buckets = _default_n_buckets()
    by = [order_col] + list(tie_cols)
    ascending = [not descending] + [True] * len(tie_cols)

    def _codes(arr: np.ndarray) -> np.ndarray:
        # rank codes for string/object columns keep lexsort numeric;
        # order-preserving, so descending works by negation too
        if arr.dtype == object or arr.dtype.kind in "US":
            _, inv = np.unique(arr, return_inverse=True)
            return inv
        return arr

    def _topk(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if not n:
            return t
        key_arrs = [_codes(t.column(c).to_numpy(zero_copy_only=False)) for c in keys]
        order_arrs = []
        for c, asc in zip(by, ascending):
            v = _codes(t.column(c).to_numpy(zero_copy_only=False))
            if not asc:
                # descending via order reversal: unsigned dtypes must
                # not be negated (wraparound makes 0 sort largest) —
                # max-v reverses order overflow-free; NaN (float) stays
                # NaN under negation, so NaN rows sort LAST in either
                # direction (lexsort's NaN-last convention).
                v = (v.max() - v) if v.dtype.kind == "u" else -v
            order_arrs.append(v)
        # lexsort: LAST key is primary -> keys outermost, then by[]
        order = np.lexsort(list(reversed(order_arrs)) + list(reversed(key_arrs)))
        change = np.zeros(n, bool)
        change[0] = True
        for a in key_arrs:
            s = a[order]
            change[1:] |= s[1:] != s[:-1]
        starts = np.flatnonzero(change)
        runlen = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, runlen)
        return t.take(pa.array(order[pos < k], pa.int64()))

    def partial_topk(batch: pa.Table) -> pa.Table:
        out = _topk(batch)
        return out.append_column(
            "_bucket", pa.array(_key_buckets_arrow(out, keys, n_buckets), pa.int64())
        )

    def final_topk(g: pa.Table) -> pa.Table:
        return _topk(g.drop_columns(["_bucket"]))

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def approx_count_distinct(ds, col: str, n_buckets: int = 64) -> float:
    """Distributed HyperLogLog count-distinct: per-batch 4 KB register
    partials (vectorized, kernels/sketch.py) -> bucketed elementwise-
    max merge -> driver final estimate.  NO key shuffle at any scale:
    the exchange moves one 4 KB row per batch, the driver sees
    ``n_buckets`` rows.  ~1.6% standard error at p=12."""
    from gdal_boots_ray.kernels import sketch

    def partial(batch: pa.Table) -> pa.Table:
        reg = sketch.hll_partial(
            sketch.hash64(batch.column(col).to_numpy(zero_copy_only=False))
        )
        # deterministic bucket from the register content spreads the
        # merge tree without needing a batch index
        b = int(reg.view(np.uint32).sum()) % n_buckets
        return pa.table(
            {"bucket": pa.array([b], pa.int64()), "reg": pa.array([reg.tobytes()], pa.binary())}
        )

    def merge(g: pa.Table) -> pa.Table:
        stack = np.stack([np.frombuffer(r, dtype=np.uint8) for r in g.column("reg").to_pylist()])
        return pa.table(
            {
                "bucket": g.column("bucket").slice(0, 1),
                "reg": pa.array([sketch.hll_merge(stack).tobytes()], pa.binary()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
        .to_pandas()
    )
    final = sketch.hll_merge(np.stack([np.frombuffer(r, dtype=np.uint8) for r in rows["reg"]]))
    return sketch.hll_estimate(final)


def continuous_quantiles(ds, col: str, qs: Sequence[float], n_hist: int = 8192):
    """EXACT interpolated quantiles (SQL ``percentile_cont``) for an
    unbounded float column — three cheap passes, no global sort:

    1. min / max / count (per-batch partials, driver combine of one
       row per batch);
    2. fixed-range histogram (``n_hist`` buckets) — locates the
       bucket holding each needed order statistic;
    3. one filtered pass collecting ONLY the values inside the needed
       buckets (~n/n_hist rows per bucket) — the exact order stats
       resolve locally, then lower + (upper-lower)*frac interpolation.

    Every pass streams the single column; the driver never holds more
    than the histogram + candidate buckets.
    """
    qs = list(qs)

    def mmc(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        if not len(v):
            return pa.table(
                {
                    "lo": pa.array([], pa.float64()),
                    "hi": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "lo": pa.array([float(v.min())], pa.float64()),
                "hi": pa.array([float(v.max())], pa.float64()),
                "n": pa.array([len(v)], pa.int64()),
            }
        )

    stats = ds.map_batches(mmc, batch_format="pyarrow").to_pandas()
    lo, hi, n = float(stats["lo"].min()), float(stats["hi"].max()), int(stats["n"].sum())
    if n == 0:
        return pd.DataFrame({"q": [], col: []})
    if hi == lo:
        return pd.DataFrame({"q": [float(q) for q in qs], col: [lo] * len(qs)})
    width = (hi - lo) / n_hist

    def hist(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, n_hist - 1)
        cnt = np.bincount(idx, minlength=n_hist)
        return pa.table({"reg": pa.array([cnt.astype(np.int64).tobytes()], pa.binary())})

    rows = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    counts = np.zeros(n_hist, dtype=np.int64)
    for r in rows["reg"]:
        counts += np.frombuffer(r, dtype=np.int64)
    cum = np.cumsum(counts)

    # ranks needed (0-indexed order statistics)
    ranks = sorted({int(np.floor(q * (n - 1))) for q in qs} | {int(np.ceil(q * (n - 1))) for q in qs})
    need_buckets = sorted({int(np.searchsorted(cum, r + 1, side="left")) for r in ranks})

    lows = np.array([lo + b * width for b in need_buckets])
    highs = np.array([hi if b == n_hist - 1 else lo + (b + 1) * width for b in need_buckets])

    def collect(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        m = np.zeros(len(v), dtype=bool)
        for blo, bhi, b in zip(lows, highs, need_buckets):
            if b == n_hist - 1:
                m |= (v >= blo) & (v <= bhi)
            else:
                m |= (v >= blo) & (v < bhi)
        return pa.table({col: pa.array(v[m])})

    cand = np.sort(ds.map_batches(collect, batch_format="pyarrow").to_pandas()[col].to_numpy())
    base = int(cum[need_buckets[0] - 1]) if need_buckets[0] > 0 else 0

    def order_stat(r: int) -> float:
        b = int(np.searchsorted(cum, r + 1, side="left"))
        before = int(cum[b - 1]) if b > 0 else 0
        # candidates are the union of needed buckets, globally sorted;
        # offset of this bucket inside cand:
        off = 0
        for bb in need_buckets:
            if bb == b:
                break
            off += int(counts[bb])
        return float(cand[off + (r - before)])

    out_q, out_v = [], []
    for q in qs:
        pos = q * (n - 1)
        lo_r, hi_r = int(np.floor(pos)), int(np.ceil(pos))
        a = order_stat(lo_r)
        b = order_stat(hi_r)
        out_q.append(float(q))
        out_v.append(a + (b - a) * (pos - lo_r))
    return pd.DataFrame({"q": out_q, col: out_v})


def grouped_quantiles(
    ds, group_col: str, col: str, qs: Sequence[float], n_buckets: Optional[int] = None
):
    """Per-group exact quantiles, same histogram plan as
    ``exact_quantiles``: (group, value, count) partials -> bucketed
    merge keyed on (group, value) -> per-group cumulative walk.  The
    final walk runs distributed (groupby(group) over count rows), so
    the driver never sees more than the result."""
    qs = list(qs)

    def partial(batch: pa.Table) -> pa.Table:
        # drop_null keeps SQL aggregate semantics (NULL rows ignored);
        # Arrow group_by would otherwise emit a null-key group the old
        # pandas groupby silently dropped
        res = (
            batch.select([group_col, col])
            .drop_null()
            .group_by([group_col, col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                group_col: res.column(group_col),
                col: res.column(col),
                "cnt": res.column("count_all").cast(pa.int64()),
            }
        )

    counts = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), [group_col, col], {"cnt": "sum"}, n_buckets
    )

    def walk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(col)
        cum = g["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = g[col].to_numpy()
        out_q, out_v = [], []
        for q in qs:
            idx = int(np.searchsorted(cum, q * n, side="left"))
            out_q.append(float(q))
            out_v.append(vals[min(idx, len(vals) - 1)])
        return pd.DataFrame({group_col: g[group_col].iloc[0], "q": out_q, col: out_v})

    return counts.groupby(group_col).map_groups(walk, batch_format="pandas")


def exact_quantiles(ds, col: str, qs: Sequence[float], n_buckets: Optional[int] = None):
    """EXACT distributed quantiles for a bounded-domain column
    (integer measures: token counts, lengths, pixel values).

    Histogram plan — never a global sort: each batch emits
    (value, count) partials (``np.unique``), a bucketed merge sums
    counts per distinct value, and the driver walks the cumulative
    distribution (rows = distinct VALUES, bounded by the domain — a
    token-count column has ~10^4 distinct values at any row scale, so
    the driver combine is O(domain), not O(rows)).

    Returns a pandas DataFrame (q, value) using SQL
    ``percentile_disc`` semantics: the smallest value whose cumulative
    count fraction is >= q.
    """
    qs = list(qs)

    def partial(batch: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            batch.column(col).to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({col: pa.array(vals), "cnt": pa.array(cnts.astype(np.int64))})

    counts = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), [col], {"cnt": "sum"}, n_buckets
    ).to_pandas()
    counts = counts.sort_values(col).reset_index(drop=True)
    cum = counts["cnt"].cumsum().to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        # percentile_disc: first value with cum >= q*n (same IEEE
        # double product DuckDB computes, so ties agree bit-for-bit)
        idx = int(np.searchsorted(cum, q * n, side="left"))
        out_q.append(float(q))
        out_v.append(counts[col].iloc[min(idx, len(counts) - 1)])
    return pd.DataFrame({"q": out_q, col: out_v})
