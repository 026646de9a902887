"""gdal_boots_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the *semantics* of
``habibutsu/gdal-boots`` (reference at /root/reference, v0.6.0) as
streaming ``ray.data.Dataset`` pipelines over Arrow batches:

- raster data model: rows of (image_id, bytes, w, h, fmt, caption, phash)
  plus georeferencing columns (epsg, gt affine 6-tuple) — the Lance-shaped
  table from BASELINE.json ``input_hint``;
- pure-NumPy kernels for everything the reference delegates to GDAL/OGR:
  affine/bounds math, CRS transforms, PNG codec, rasterize, warp/resample,
  mosaic, point sampling, point-in-polygon;
- Ray Data stages: actor-pool decode/encode, cell indexing (S2 + grid),
  PIP joins, kNN, zonal extraction, dedup and text-analysis operators.

No GDAL, shapely, pyproj, PIL or h3 bindings are used or required.
"""

from gdal_boots_ray.kernels.affine import Affine, GeoInfo  # noqa: F401

__version__ = "0.1.0"
