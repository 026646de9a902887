"""kNN operators.

- ``spatial_knn``: k nearest data points for each query point via the
  grid-cell index with neighbor-ring expansion (north_rule: "kNN
  (per-cell local index with neighbor-ring expansion)").  The data
  side is hash-partitioned by cell; each query probes ring 0, then
  widens until k hits are guaranteed correct (ring r complete when the
  k-th best distance <= r * cell_res, since any point outside the
  probed rings is farther than that).
- ``knn_ivf``: IVF-style approximate embedding search — coarse
  centroids from a deterministic k-means on a sample, inverted lists
  per centroid, queries probe the ``nprobe`` nearest lists.  The
  scale path next to joins.knn_brute_force (the exact baseline).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa
import ray

from gdal_boots_ray.kernels.cells import grid_cell_id, grid_cell_neighbors


class _CellIndex:
    """Per-worker spatial hash: cell -> (ids, xy) arrays."""

    def __init__(self, ids: np.ndarray, xy: np.ndarray, res: float):
        self.res = res
        cells = grid_cell_id(xy[:, 0], xy[:, 1], res)
        order = np.argsort(cells, kind="stable")
        self.cells_sorted = cells[order]
        self.ids = ids[order]
        self.xy = xy[order]
        self.uniq, self.starts = np.unique(self.cells_sorted, return_index=True)
        self.ends = np.append(self.starts[1:], len(cells))

    def cell_slice(self, cell: int):
        i = np.searchsorted(self.uniq, cell)
        if i < len(self.uniq) and self.uniq[i] == cell:
            return self.ids[self.starts[i] : self.ends[i]], self.xy[self.starts[i] : self.ends[i]]
        return None

    def query(self, qx: float, qy: float, k: int, max_ring: int = 64):
        qcell = int(grid_cell_id(np.array([qx]), np.array([qy]), self.res)[0])
        cand_ids = []
        cand_d2 = []
        seen_rings = 0
        for ring in range(max_ring + 1):
            cells = grid_cell_neighbors(qcell, ring)
            if ring > 0:  # only the new outer shell
                inner = set(grid_cell_neighbors(qcell, ring - 1).tolist())
                cells = np.array([c for c in cells if c not in inner], dtype=np.int64)
            for c in cells:
                hit = self.cell_slice(int(c))
                if hit is None:
                    continue
                ids, xy = hit
                d2 = (xy[:, 0] - qx) ** 2 + (xy[:, 1] - qy) ** 2
                cand_ids.append(ids)
                cand_d2.append(d2)
            seen_rings = ring
            if cand_ids:
                all_d2 = np.concatenate(cand_d2)
                if len(all_d2) >= k:
                    kth = np.partition(all_d2, k - 1)[k - 1]
                    # ring r guarantees every unseen point is at least
                    # r*res away from the query
                    if np.sqrt(kth) <= ring * self.res:
                        break
        all_ids = np.concatenate(cand_ids) if cand_ids else np.empty(0, np.int64)
        all_d2 = np.concatenate(cand_d2) if cand_d2 else np.empty(0)
        if len(all_ids) == 0:
            return all_ids, all_d2
        order = np.lexsort((all_ids, all_d2))[:k]
        return all_ids[order], np.sqrt(all_d2[order])


def spatial_knn(queries_ds, data_ids: np.ndarray, data_xy: np.ndarray, k: int, cell_res: float):
    """For each query row (qid, x, y): the k nearest data points.

    The data side is broadcast once (``ray.put``) and indexed per actor
    in ``__init__`` — the per-cell STRtree-equivalent of SURVEY §2.6.
    Returns Dataset (qid, rank, nid, dist) with dist rounded to 6.
    """
    data_ref = ray.put((np.asarray(data_ids, np.int64), np.asarray(data_xy, np.float64)))

    class KnnActor:
        def __init__(self):
            ids, xy = ray.get(data_ref)
            self.index = _CellIndex(ids, xy, cell_res)

        def __call__(self, batch: pa.Table) -> pa.Table:
            qids = batch.column("qid").to_numpy()
            xs = batch.column("x").to_numpy()
            ys = batch.column("y").to_numpy()
            out = {"qid": [], "rank": [], "nid": [], "dist": []}
            for i in range(len(qids)):
                nid, dist = self.index.query(float(xs[i]), float(ys[i]), k)
                out["qid"].extend([int(qids[i])] * len(nid))
                out["rank"].extend(range(1, len(nid) + 1))
                out["nid"].extend(nid.tolist())
                out["dist"].extend(np.round(dist, 6).tolist())
            return pa.table(
                {
                    "qid": pa.array(out["qid"], pa.int64()),
                    "rank": pa.array(out["rank"], pa.int64()),
                    "nid": pa.array(out["nid"], pa.int64()),
                    "dist": pa.array(out["dist"], pa.float64()),
                }
            )

    return queries_ds.map_batches(KnnActor, batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)


# ---------------------------------------------------------------------------
# IVF embedding search
# ---------------------------------------------------------------------------


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 31415926) -> np.ndarray:
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def knn_ivf(embeddings_ds, queries: np.ndarray, k: int, n_centroids: int = 16, nprobe: int = 4,
            query_ids: Optional[np.ndarray] = None, sample_size: int = 2048):
    """Approximate cosine top-k: train coarse centroids on a driver-side
    sample (small, deterministic), build per-batch inverted lists, and
    search only the ``nprobe`` nearest lists per query.

    Partitioning assumption: centroid assignment is sharded per batch
    (no global shuffle); the final merge reduces per-batch candidates,
    so recall depends on nprobe/n_centroids, not on partitioning.
    """
    import pandas as pd

    sample = embeddings_ds.limit(sample_size).to_pandas()
    smat = np.asarray(sample["embedding"].tolist(), dtype=np.float64)
    smat /= np.maximum(np.linalg.norm(smat, axis=1, keepdims=True), 1e-12)
    centroids = _kmeans(smat, n_centroids)
    centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    q = np.asarray(queries, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    qids = np.arange(q.shape[0], dtype=np.int64) if query_ids is None else np.asarray(query_ids, np.int64)
    # lists each query probes
    probe = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    ref = ray.put((centroids, qn, qids, probe))

    class IvfSearch:
        def __init__(self):
            self.centroids, self.qn, self.qids, self.probe = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mat = (
                batch.column("embedding").combine_chunks().flatten().to_numpy(zero_copy_only=False)
                .reshape(len(batch), -1).astype(np.float64)
            )
            ids = batch.column("vec_id").to_numpy()
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            matn = mat / norms
            assign = (matn @ self.centroids.T).argmax(axis=1)
            out_q, out_v, out_s = [], [], []
            for j in range(len(self.qids)):
                m = np.isin(assign, self.probe[j])
                if not m.any():
                    continue
                sims = matn[m] @ self.qn[j]
                kk = min(k, len(sims))
                top = np.argpartition(-sims, kk - 1)[:kk]
                out_q.extend([self.qids[j]] * kk)
                out_v.extend(ids[m][top].tolist())
                out_s.extend(sims[top].tolist())
            return pa.table(
                {
                    "q_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

    cand = embeddings_ds.map_batches(IvfSearch, batch_format="pyarrow", concurrency=(1, 8), num_cpus=1)
    allc = cand.to_pandas()  # tiny by construction: k per query per block
    out = (
        allc.sort_values(["q_id", "sim", "vec_id"], ascending=[True, False, True])
        .groupby("q_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["sim"] = out["sim"].round(6)
    return out
