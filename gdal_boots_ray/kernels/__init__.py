"""Pure-NumPy geo kernels (no Ray imports here).

Each module reimplements, from public formulas, the semantics the
reference library delegates to GDAL/OGR/OSR/GEOS.
"""
