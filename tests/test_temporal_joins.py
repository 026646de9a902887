"""asof_join / interval_join stage semantics on tiny synthetic data."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_asof_join_basic(ray_session):
    import ray.data as rd

    from gdal_boots_ray.stages.joins import asof_join

    left = rd.from_arrow(
        pa.table(
            {
                "uid": pa.array([1, 1, 2, 3], pa.int64()),
                "t": pa.array([10, 25, 7, 5], pa.int64()),
                "eid": pa.array([100, 101, 102, 103], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "uid": pa.array([1, 1, 2], pa.int64()),
                "t": pa.array([8, 20, 9], pa.int64()),
                "val": pa.array([0.5, 0.7, 0.9], pa.float64()),
            }
        )
    )
    out = (
        asof_join(left, right, by_col="uid", ts_col="t", left_cols=["eid"], right_cols=["val"])
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    # eid 100 (t=10) -> t=8 val .5; eid 101 (t=25) -> t=20 val .7;
    # eid 102 (t=7) -> no prior for uid 2 (t=9 later)? 9 > 7 -> dropped;
    # eid 103: uid 3 has no right rows -> dropped
    assert out["eid"].tolist() == [100, 101]
    assert out["val"].tolist() == [0.5, 0.7]


def test_asof_join_equal_ts_matches(ray_session):
    import ray.data as rd

    from gdal_boots_ray.stages.joins import asof_join

    left = rd.from_arrow(pa.table({"uid": pa.array([1], pa.int64()), "t": pa.array([10], pa.int64()), "eid": pa.array([1], pa.int64())}))
    right = rd.from_arrow(pa.table({"uid": pa.array([1], pa.int64()), "t": pa.array([10], pa.int64()), "val": pa.array([2.0], pa.float64())}))
    out = asof_join(left, right, by_col="uid", ts_col="t", left_cols=["eid"], right_cols=["val"]).to_pandas()
    assert len(out) == 1 and out["val"].iloc[0] == 2.0  # ts >= semantics


def test_interval_join_matches_quadratic(ray_session):
    import ray.data as rd

    from gdal_boots_ray.stages.joins import interval_join

    rng = np.random.default_rng(5)
    vals = rng.uniform(0, 1000, 300)
    pids = np.arange(300, dtype=np.int64)
    lo = rng.uniform(0, 900, 20)
    hi = lo + rng.uniform(10, 300, 20)
    ivid = np.arange(20, dtype=np.int64)

    pts = rd.from_arrow(pa.table({"pid": pa.array(pids), "v": pa.array(vals)}))
    ivs = rd.from_arrow(pa.table({"iv": pa.array(ivid), "lo": pa.array(lo), "hi": pa.array(hi)}))
    out = interval_join(pts, ivs, "v", "pid", "iv", "lo", "hi", cell_width=50.0).to_pandas()
    got = set(zip(out["pid"], out["iv"]))
    expect = {
        (int(p), int(i))
        for p in pids
        for i in ivid
        if lo[i] <= vals[p] < hi[i]
    }
    assert got == expect
