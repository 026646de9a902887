"""Raster -> vector polygonize (reference ``to_vector`` /
``gdal.Polygonize``, gdal.py:609-623).

Connected-component labeling (4-connectivity, same pixel value) via a
two-pass union-find, then per-component boundary extraction as cell-
edge rings (grid-aligned polygons, exactly the shape GDAL's
Polygonize emits for blocky rasters).  Output: one feature per
component with its pixel value and exterior ring (holes emitted as
additional interior rings).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def label_components(band: np.ndarray) -> Tuple[np.ndarray, int]:
    """4-connected same-value labeling; returns (labels (h,w) int32
    starting at 0, n_labels)."""
    h, w = band.shape
    labels = -np.ones((h, w), dtype=np.int64)
    parent: List[int] = []

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    # row-run based pass: runs of equal value per row
    prev_runs: List[Tuple[int, int, int, int]] = []  # (x0, x1, value_key, label)
    for y in range(h):
        row = band[y]
        # run boundaries
        change = np.nonzero(row[1:] != row[:-1])[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [w]])
        runs = []
        pi = 0
        for x0, x1 in zip(starts, ends):
            v = row[x0]
            lbl = len(parent)
            parent.append(lbl)
            # union with overlapping prev-row runs of same value
            for px0, px1, pv, plbl in prev_runs:
                if px0 < x1 and x0 < px1 and pv == v:
                    union(lbl, plbl)
            labels[y, x0:x1] = lbl
            runs.append((int(x0), int(x1), v, lbl))
        prev_runs = runs
    # flatten labels
    remap: Dict[int, int] = {}
    flat = labels.reshape(-1)
    roots = np.empty(len(parent), dtype=np.int64)
    for i in range(len(parent)):
        roots[i] = find(i)
    uniq = {}
    for r in roots:
        if r not in uniq:
            uniq[r] = len(uniq)
    compact = np.array([uniq[r] for r in roots], dtype=np.int64)
    labels = compact[labels]
    return labels, len(uniq)


def _trace_rings(mask: np.ndarray) -> List[np.ndarray]:
    """All boundary rings (exterior + holes) of a pixel mask as
    cell-edge polygons in pixel coordinates."""
    h, w = mask.shape
    # boundary edges: between a mask cell and a non-mask cell (or edge)
    # horizontal edges at (y, x)-(y, x+1); vertical at (x, y)-(x, y+1)
    edges: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}

    def add_edge(a, b):
        edges.setdefault(a, []).append(b)

    padded = np.zeros((h + 2, w + 2), dtype=bool)
    padded[1:-1, 1:-1] = mask
    # top edges: cell (y,x) masked, (y-1,x) not -> edge from (x,y) to (x+1,y), oriented
    top = padded[1:-1, 1:-1] & ~padded[:-2, 1:-1]
    bot = padded[1:-1, 1:-1] & ~padded[2:, 1:-1]
    left = padded[1:-1, 1:-1] & ~padded[1:-1, :-2]
    right = padded[1:-1, 1:-1] & ~padded[1:-1, 2:]
    ys, xs = np.nonzero(top)
    for y, x in zip(ys, xs):
        add_edge((x, y), (x + 1, y))
    ys, xs = np.nonzero(bot)
    for y, x in zip(ys, xs):
        add_edge((x + 1, y + 1), (x, y + 1))
    ys, xs = np.nonzero(right)
    for y, x in zip(ys, xs):
        add_edge((x + 1, y), (x + 1, y + 1))
    ys, xs = np.nonzero(left)
    for y, x in zip(ys, xs):
        add_edge((x, y + 1), (x, y))

    rings = []
    while edges:
        start = next(iter(edges))
        ring = [start]
        cur = start
        prev_dir = None
        while True:
            nxts = edges.get(cur)
            if not nxts:
                break
            nxt = nxts.pop()
            if not nxts:
                del edges[cur]
            ring.append(nxt)
            cur = nxt
            if cur == start:
                break
        # collapse collinear points
        arr = np.array(ring, dtype=np.float64)
        if len(arr) > 2:
            keep = [0]
            for i in range(1, len(arr) - 1):
                d1 = arr[i] - arr[keep[-1]]
                d2 = arr[i + 1] - arr[i]
                if d1[0] * d2[1] - d1[1] * d2[0] != 0:
                    keep.append(i)
            keep.append(len(arr) - 1)
            arr = arr[keep]
        rings.append(arr)
    return rings


def polygonize(band: np.ndarray, gt=None, mask: np.ndarray = None) -> List[dict]:
    """Vectorize connected same-value regions.

    Returns [{value, geometry(GeoJSON Polygon)}] per component; pixels
    where ``mask`` is falsy are skipped (the reference passes the band
    itself as mask -> zero pixels skipped, gdal.py:621)."""
    band = np.asarray(band)
    labels, n = label_components(band)
    if mask is not None:
        skip_labels = set(np.unique(labels[~np.asarray(mask, dtype=bool)]).tolist())
    else:
        skip_labels = set()
    out = []
    for lbl in range(n):
        if lbl in skip_labels:
            continue
        comp = labels == lbl
        ys, xs = np.nonzero(comp)
        value = band[ys[0], xs[0]]
        rings = _trace_rings(comp)
        coords = []
        for ring in rings:
            if gt is not None:
                a, b, c, d, e, f = [float(v) for v in gt]
                world = np.stack([a * ring[:, 0] + b * ring[:, 1] + c, d * ring[:, 0] + e * ring[:, 1] + f], axis=1)
            else:
                world = ring
            coords.append([[float(p[0]), float(p[1])] for p in world])
        out.append({"value": value.item(), "geometry": {"type": "Polygon", "coordinates": coords}})
    return out
