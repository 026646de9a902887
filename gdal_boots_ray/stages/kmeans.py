"""Distributed Lloyd k-means over an embedding column.

The iterative pattern Ray Data does not ship: each iteration
broadcasts the (k x dim) centroid matrix via ``ray.put`` (KBs), a
single ``map_batches`` pass assigns every vector to its nearest
centroid and emits PARTIAL per-cluster sums (k rows per batch, never
vectors), and the driver reduces k x dim floats into new centroids.
The exchange per iteration is k x batches tiny rows — the vector
table itself is read once per iteration and never shuffled.

Deterministic: init centroids are the vectors whose md5-ranked ids
come first (stages/sample.py hashing), so reruns and resumes converge
identically.  Used to build the IVF coarse quantizer
(stages/knn.py ivf path) with a real distributed M-step instead of a
driver-side sample fit.
"""

from __future__ import annotations

import hashlib
from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _vectors(batch: pa.Table, vec_col: str) -> np.ndarray:
    emb = batch.column(vec_col).combine_chunks()
    dim = len(emb[0])
    return emb.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)


def init_centroids(ds, id_col: str, vec_col: str, k: int) -> np.ndarray:
    """Deterministic seeding: the k vectors with the smallest
    md5(id) rank — a streaming top-k, no full materialization."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ranks = [int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) for i in ids]
        order = np.argsort(np.array(ranks))[:k]
        vecs = _vectors(batch, vec_col)[order].astype(np.float64)
        return pa.table(
            {
                "rank": pa.array(np.array(ranks)[order], pa.int64()),
                "vec": pa.array([v.tobytes() for v in vecs], pa.binary()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = rows.sort_values("rank").head(k)
    return np.stack([np.frombuffer(b, dtype=np.float64) for b in rows["vec"]])


def kmeans(
    ds, id_col: str, vec_col: str, k: int, iters: int = 10
) -> Tuple[np.ndarray, list]:
    """Returns (centroids (k, dim), per-iteration inertia list)."""
    cents = init_centroids(ds, id_col, vec_col, k)
    inertias = []
    for _ in range(iters):
        cref = ray.put(cents)

        def partial(batch: pa.Table, _c={}) -> pd.DataFrame:
            c = _c.get("c")
            if c is None:
                c = _c["c"] = ray.get(cref)
            v = _vectors(batch, vec_col).astype(np.float64)
            # (n, k) squared distances via the expansion trick
            d2 = (
                (v * v).sum(axis=1)[:, None]
                - 2.0 * v @ c.T
                + (c * c).sum(axis=1)[None, :]
            )
            assign = d2.argmin(axis=1)
            inert = d2[np.arange(len(v)), assign].sum()
            rows = {"cluster": [], "s": [], "n": [], "inertia": []}
            for ci in np.unique(assign):
                m = assign == ci
                rows["cluster"].append(int(ci))
                rows["s"].append(v[m].sum(axis=0).tobytes())
                rows["n"].append(int(m.sum()))
                rows["inertia"].append(float(d2[m, ci].sum()))
            return pd.DataFrame(rows)

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        dim = cents.shape[1]
        new = cents.copy()
        total_inertia = float(parts["inertia"].sum())
        for ci, grp in parts.groupby("cluster"):
            s = np.zeros(dim)
            for b in grp["s"]:
                s += np.frombuffer(b, dtype=np.float64)
            n = int(grp["n"].sum())
            if n:
                new[ci] = s / n
        inertias.append(total_inertia)
        if np.allclose(new, cents):
            cents = new
            break
        cents = new
    return cents, inertias


def assign_clusters(ds, vec_col: str, centroids: np.ndarray):
    """Final E-step as a streaming column append."""
    cref = ray.put(centroids)

    def assign(batch: pa.Table, _c={}) -> pa.Table:
        c = _c.get("c")
        if c is None:
            c = _c["c"] = ray.get(cref)
        v = _vectors(batch, vec_col).astype(np.float64)
        d2 = (v * v).sum(axis=1)[:, None] - 2.0 * v @ c.T + (c * c).sum(axis=1)[None, :]
        return batch.append_column("cluster", pa.array(d2.argmin(axis=1), pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")
