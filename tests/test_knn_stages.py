"""Spatial kNN (ring expansion) + IVF embedding search."""

import numpy as np
import pyarrow as pa
import pytest


def test_cell_index_ring_expansion():
    from gdal_boots_ray.stages.knn import _CellIndex

    rng = np.random.default_rng(11)
    xy = rng.uniform(0, 1000, size=(500, 2))
    ids = np.arange(500, dtype=np.int64)
    idx = _CellIndex(ids, xy, res=50.0)
    # brute force oracle
    for qi in (0, 17, 300):
        qx, qy = xy[qi]
        nid, dist = idx.query(qx, qy, k=6)
        d2 = ((xy - [qx, qy]) ** 2).sum(axis=1)
        order = np.lexsort((ids, d2))[:6]
        assert nid.tolist() == ids[order].tolist()
        assert np.allclose(dist, np.sqrt(d2[order]), atol=1e-9)


def test_cell_index_sparse_far_points():
    from gdal_boots_ray.stages.knn import _CellIndex

    xy = np.array([[0.0, 0.0], [1000.0, 0.0], [0.0, 2000.0]])
    idx = _CellIndex(np.array([1, 2, 3]), xy, res=10.0)
    nid, dist = idx.query(500.0, 0.0, k=2, max_ring=300)
    assert set(nid.tolist()) == {1, 2}


def test_spatial_knn_stage(ray_session):
    import ray.data as rd

    from gdal_boots_ray.stages.knn import spatial_knn

    rng = np.random.default_rng(4)
    xy = rng.uniform(0, 500, size=(200, 2))
    ids = np.arange(200, dtype=np.int64)
    q = pa.table(
        {
            "qid": pa.array([0, 1, 2], pa.int64()),
            "x": pa.array(xy[:3, 0]),
            "y": pa.array(xy[:3, 1]),
        }
    )
    out = spatial_knn(rd.from_arrow(q), ids, xy, k=3, cell_res=50.0).to_pandas()
    assert len(out) == 9
    top = out[out["rank"] == 1]
    assert top.sort_values("qid")["nid"].tolist() == [0, 1, 2]  # self at dist 0


def test_knn_ivf_recall(ray_session):
    import ray.data as rd

    from gdal_boots_ray.stages.knn import knn_ivf

    rng = np.random.default_rng(9)
    # clustered embeddings -> IVF probes recover exact neighbors
    centers = rng.normal(size=(4, 16)) * 5
    mat = np.vstack([c + rng.normal(size=(50, 16)) * 0.2 for c in centers])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(200), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    out = knn_ivf(ds, mat[:2], k=5, n_centroids=4, nprobe=2, query_ids=np.arange(2))
    # self is the top hit for each query
    top = out.sort_values(["q_id", "sim"], ascending=[True, False]).groupby("q_id").head(1)
    assert top["vec_id"].tolist() == [0, 1]
    assert (out.groupby("q_id").size() == 5).all()

    # the distributed-kmeans training path (forced via threshold=0)
    # must uphold the same invariants on the same clustered corpus
    out2 = knn_ivf(
        ds, mat[:2], k=5, n_centroids=4, nprobe=2, query_ids=np.arange(2),
        distributed_train_threshold=0,
    )
    top2 = out2.sort_values(["q_id", "sim"], ascending=[True, False]).groupby("q_id").head(1)
    assert top2["vec_id"].tolist() == [0, 1]
    assert (out2.groupby("q_id").size() == 5).all()


def test_knn_lsh_recall(ray_session):
    import ray.data as rd

    from gdal_boots_ray.stages.joins import knn_brute_force
    from gdal_boots_ray.stages.knn import knn_lsh

    rng = np.random.default_rng(9)
    centers = rng.normal(size=(4, 16)) * 5
    mat = np.vstack([c + rng.normal(size=(50, 16)) * 0.2 for c in centers])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(200), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    out = knn_lsh(ds, mat[:2], k=5, n_tables=4, n_bits=6, query_ids=np.arange(2))
    # self is the top hit for each query (a vector always collides
    # with its own signature in every table)
    top = out.sort_values(["q_id", "sim"], ascending=[True, False]).groupby("q_id").head(1)
    assert top["vec_id"].tolist() == [0, 1]
    # recall vs exact on the clustered corpus
    exact = knn_brute_force(ds, mat[:2], k=5, query_ids=np.arange(2))
    for q in (0, 1):
        a = set(out[out["q_id"] == q]["vec_id"])
        e = set(exact[exact["q_id"] == q]["vec_id"])
        assert len(a & e) / len(e) >= 0.4
    # multiprobe off still returns the self-bucket
    out2 = knn_lsh(ds, mat[:2], k=5, n_tables=4, n_bits=6, query_ids=np.arange(2), multiprobe=False)
    top2 = out2.sort_values(["q_id", "sim"], ascending=[True, False]).groupby("q_id").head(1)
    assert top2["vec_id"].tolist() == [0, 1]


def test_knn_pq_recall(ray_session):
    import ray.data as rd

    from gdal_boots_ray.stages.joins import knn_brute_force
    from gdal_boots_ray.stages.knn import knn_pq

    rng = np.random.default_rng(9)
    centers = rng.normal(size=(4, 16)) * 5
    mat = np.vstack([c + rng.normal(size=(50, 16)) * 0.2 for c in centers])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(200), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    # refine deep enough to cover the whole quantization-tied cluster
    # (50 members share codes at K=8), so the exact re-rank decides
    out = knn_pq(ds, mat[:2], k=5, m_subspaces=4, n_codes=8, refine=12, query_ids=np.arange(2))
    # exact re-rank puts self on top
    top = out.sort_values(["q_id", "sim"], ascending=[True, False]).groupby("q_id").head(1)
    assert top["vec_id"].tolist() == [0, 1]
    exact = knn_brute_force(ds, mat[:2], k=5, query_ids=np.arange(2))
    for q in (0, 1):
        a = set(out[out["q_id"] == q]["vec_id"])
        e = set(exact[exact["q_id"] == q]["vec_id"])
        assert len(a & e) / len(e) >= 0.4


def test_kmeans_distributed(ray_session):
    """Distributed Lloyd == single-node Lloyd from the same seeds
    (same assignments path), inertia monotone, deterministic across
    partitionings."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from gdal_boots_ray.stages.kmeans import assign_clusters, init_centroids, kmeans

    rng = np.random.default_rng(4)
    centers = rng.normal(0, 5, (4, 8))
    vecs = np.concatenate([c + rng.normal(0, 0.4, (50, 8)) for c in centers])
    ids = np.arange(len(vecs), dtype=np.int64)
    tbl = pa.table({"vec_id": ids, "embedding": [list(map(float, v)) for v in vecs]})

    ds_a = rd.from_arrow(tbl).repartition(7)
    ds_b = rd.from_arrow(tbl).repartition(2)
    cents_a, in_a = kmeans(ds_a, "vec_id", "embedding", k=4, iters=8)
    cents_b, in_b = kmeans(ds_b, "vec_id", "embedding", k=4, iters=8)
    assert np.allclose(cents_a, cents_b)  # partitioning-independent
    assert all(b <= a * (1 + 1e-9) for a, b in zip(in_a, in_a[1:]))

    # single-node Lloyd from the same deterministic seeds
    c = init_centroids(rd.from_arrow(tbl), "vec_id", "embedding", 4)
    v = vecs.astype(np.float64)
    for _ in range(8):
        d2 = ((v[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        newc = np.stack([v[a == i].mean(0) if (a == i).any() else c[i] for i in range(4)])
        if np.allclose(newc, c):
            c = newc
            break
        c = newc
    assert np.allclose(cents_a, c)

    out = assign_clusters(rd.from_arrow(tbl), "embedding", cents_a).to_pandas()
    assert out["cluster"].nunique() == 4 and len(out) == len(vecs)
