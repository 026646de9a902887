"""Distributed mosaic (reference ``union`` / warp extra_ds mosaics,
gdal.py:890-895, 713-714).

Ray blocks arrive unordered, but mosaic overlap resolution is
order-dependent (later-listed dataset wins).  Every mosaic group
therefore carries an explicit ``seq`` column and the per-group merge
sorts by it before painting — never relying on block arrival order
(SURVEY §2.8)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from gdal_boots_ray.kernels.warp import WarpSource, union_mosaic
from gdal_boots_ray.stages.decode import pixels_view


def mosaic_group(g: pd.DataFrame) -> pd.DataFrame:
    """map_groups fn: one mosaic per ``mosaic_key`` group; rows need
    pixels/w/h/bands/gt/epsg/seq.  Output row = the merged raster."""
    g = g.sort_values("seq")  # deterministic: higher seq painted later -> wins
    sources = []
    for _, row in g.iterrows():
        img = pixels_view(row["pixels"], int(row["bands"]), int(row["h"]), int(row["w"]))
        sources.append(WarpSource(img if img.ndim == 3 else img[None], np.asarray(row["gt"]), int(row["epsg"])))
    img, gi = union_mosaic(sources)
    return pd.DataFrame(
        {
            "mosaic_key": [g["mosaic_key"].iloc[0]],
            "pixels": [np.ascontiguousarray(img).tobytes()],
            "bands": [img.shape[0]],
            "h": [img.shape[1]],
            "w": [img.shape[2]],
            "gt": [list(gi.transform)],
            "epsg": [int(g["epsg"].iloc[0])],
            "n_inputs": [len(g)],
        }
    )


def mosaic_dataset(ds, concurrency=(1, 8)):
    """groupby(mosaic_key).map_groups(mosaic_group) — the groupby is
    the only shuffle; pixels move once."""
    return ds.groupby("mosaic_key").map_groups(mosaic_group, batch_format="pandas")
