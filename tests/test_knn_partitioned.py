"""Partitioned spatial kNN: the shuffle path must equal brute force,
including when the data side exceeds the broadcast budget and when
sparse-region queries force ring-doubling retries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_knn(q_ids, q_xy, d_ids, d_xy, k):
    rows = []
    for qi, (qx, qy) in zip(q_ids, q_xy):
        d2 = (d_xy[:, 0] - qx) ** 2 + (d_xy[:, 1] - qy) ** 2
        order = np.lexsort((d_ids, d2))[:k]
        for rank, j in enumerate(order, 1):
            rows.append((int(qi), rank, int(d_ids[j]), round(float(np.sqrt(d2[j])), 6)))
    return pd.DataFrame(rows, columns=["qid", "rank", "nid", "dist"])


@pytest.fixture(scope="module")
def point_cloud():
    rng = np.random.default_rng(20260817)
    n = 5000
    d_xy = rng.uniform(0, 100_000, size=(n, 2))
    d_ids = np.arange(1000, 1000 + n, dtype=np.int64)
    # queries: 16 from dense space + 2 far outside (force ring retries)
    q_xy = np.vstack([rng.uniform(0, 100_000, size=(16, 2)), [[450_000.0, 450_000.0], [-300_000.0, 50_000.0]]])
    q_ids = np.arange(len(q_xy), dtype=np.int64)
    return q_ids, q_xy, d_ids, d_xy


def _run(ray_session, q_ids, q_xy, d_ids, d_xy, k, **kwargs):
    import ray.data as rd

    from gdal_boots_ray.stages.knn import spatial_knn_dataset

    queries_ds = rd.from_arrow(
        pa.table({"qid": pa.array(q_ids), "x": pa.array(q_xy[:, 0]), "y": pa.array(q_xy[:, 1])})
    )
    data_ds = rd.from_arrow(
        pa.table({"nid": pa.array(d_ids), "x": pa.array(d_xy[:, 0]), "y": pa.array(d_xy[:, 1])})
    ).repartition(8)
    out = spatial_knn_dataset(queries_ds, data_ds, k=k, cell_res=2000.0, **kwargs).to_pandas()
    return (
        out[["qid", "rank", "nid", "dist"]]
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
        .astype({"qid": "int64", "rank": "int64", "nid": "int64"})
    )


def test_shuffle_path_equals_brute_force(ray_session, point_cloud):
    q_ids, q_xy, d_ids, d_xy = point_cloud
    k = 7
    expect = _brute_knn(q_ids, q_xy, d_ids, d_xy, k)
    # broadcast_threshold=0: data side "exceeds one actor's index
    # budget" -> cell-partitioned shuffle plan; init_ring=1 makes the
    # two far-away queries unresolved in pass 1 (retry machinery).
    # max_ring=4: the far queries exhaust the ring cap and exercise the
    # full-scan fallback for the unresolved tail
    got = _run(None, q_ids, q_xy, d_ids, d_xy, k, broadcast_threshold=0, init_ring=1, max_ring=4)
    pd.testing.assert_frame_equal(got, expect.sort_values(["qid", "rank"]).reset_index(drop=True))


def test_broadcast_and_shuffle_paths_agree(ray_session, point_cloud):
    q_ids, q_xy, d_ids, d_xy = point_cloud
    k = 4
    small = _run(None, q_ids, q_xy, d_ids, d_xy, k, broadcast_threshold=10**9)
    large = _run(None, q_ids, q_xy, d_ids, d_xy, k, broadcast_threshold=0)
    pd.testing.assert_frame_equal(small, large)
