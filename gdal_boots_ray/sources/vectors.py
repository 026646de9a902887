"""Vector sources/sinks: GeoJSON FeatureCollections <-> feature tables.

Reference ``VectorDataset.open`` / ``to_file`` / layer model
(gdal.py:1174-1341): a vector dataset is a table of features
(fid, layer, geom GeoJSON string, geom_type, epsg, props).  Reading
fans features into a ``ray.data.Dataset``; writing serializes back to
a FeatureCollection.  ``to_epsg`` reprojects every feature's geometry
with the vectorized CRS kernel (replacing the reference's per-feature
OGR loop, gdal.py:1298-1326).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Union

import pyarrow as pa

from gdal_boots_ray.kernels.crs import transform_points
from gdal_boots_ray.kernels.geometry import map_coords, parse_geometry

FEATURE_SCHEMA = pa.schema(
    [
        ("fid", pa.int64()),
        ("layer", pa.string()),
        ("geom", pa.string()),
        ("geom_type", pa.string()),
        ("epsg", pa.int32()),
        ("props", pa.string()),  # JSON dict (typed access via json)
    ]
)


def features_table(collection: Union[str, dict], layer: str = "layer0", epsg: int = 4326) -> pa.Table:
    """GeoJSON FeatureCollection (str/dict/plain geometry) -> Arrow
    feature table."""
    if isinstance(collection, str):
        collection = json.loads(collection)
    if collection.get("type") != "FeatureCollection":
        collection = {"type": "FeatureCollection", "features": [{"type": "Feature", "geometry": parse_geometry(collection), "properties": {}}]}
    crs_name = ((collection.get("crs") or {}).get("properties") or {}).get("name", "")
    if "EPSG::" in crs_name:
        epsg = int(crs_name.rsplit(":", 1)[-1])
    rows = {k: [] for k in ("fid", "layer", "geom", "geom_type", "epsg", "props")}
    for i, feat in enumerate(collection.get("features", [])):
        geom = feat.get("geometry") or {}
        rows["fid"].append(feat.get("id", i) if isinstance(feat.get("id", i), int) else i)
        rows["layer"].append(layer)
        rows["geom"].append(json.dumps(geom))
        rows["geom_type"].append(geom.get("type", ""))
        rows["epsg"].append(epsg)
        rows["props"].append(json.dumps(feat.get("properties") or {}))
    return pa.table(rows, schema=FEATURE_SCHEMA)


def read_geojson(path_or_obj, layer: str = "layer0", epsg: int = 4326):
    """GeoJSON file/str/dict -> ray Dataset of features."""
    import ray.data as rd

    obj = path_or_obj
    if isinstance(obj, str) and obj.lstrip()[:1] not in "{[":
        with open(obj) as fd:
            obj = fd.read()
    return rd.from_arrow(features_table(obj, layer=layer, epsg=epsg))


def to_feature_collection(table: pa.Table, precision: Optional[int] = None) -> dict:
    """Feature table -> GeoJSON FeatureCollection dict (sink side,
    reference VectorDataset.to_file via GeoJSON driver)."""
    from gdal_boots_ray.kernels.geometry import to_geojson

    feats = []
    for i in range(table.num_rows):
        geom = json.loads(table.column("geom")[i].as_py())
        if precision is not None:
            geom = to_geojson(geom, precision=precision)
        feats.append(
            {
                "type": "Feature",
                "id": table.column("fid")[i].as_py(),
                "geometry": geom,
                "properties": json.loads(table.column("props")[i].as_py()),
            }
        )
    return {"type": "FeatureCollection", "features": feats}


def reproject_features(batch: pa.Table, to_epsg: int) -> pa.Table:
    """Vectorized to_epsg over a feature batch (schema preserved,
    geometry coords transformed; reference gdal.py:1298-1326)."""
    import numpy as np

    geoms = batch.column("geom").to_pylist()
    epsgs = batch.column("epsg").to_numpy()
    out = []
    for g, src in zip(geoms, epsgs):
        if int(src) == int(to_epsg):
            out.append(g)
            continue
        new = map_coords(json.loads(g), lambda x, y, s=int(src): transform_points(s, to_epsg, x, y))
        out.append(json.dumps(new))
    batch = batch.set_column(batch.column_names.index("geom"), "geom", pa.array(out, pa.string()))
    batch = batch.set_column(
        batch.column_names.index("epsg"),
        "epsg",
        pa.array(np.full(len(out), to_epsg, dtype=np.int32), pa.int32()),
    )
    return batch


def make_to_epsg(to_epsg: int):
    def fn(batch: pa.Table) -> pa.Table:
        return reproject_features(batch, to_epsg)

    return fn


def write_geojson(ds, path: str, precision: Optional[int] = None) -> int:
    """Feature Dataset -> one GeoJSON FeatureCollection file (reference
    VectorDataset.to_file via the GeoJSON driver, gdal.py:1225-1263).
    Streams batches; suitable for per-layer outputs (large multi-shard
    outputs should use write_partitioned parquet instead)."""
    import pyarrow as _pa

    feats: List[dict] = []
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        coll = to_feature_collection(batch if isinstance(batch, pa.Table) else _pa.Table.from_batches([batch]), precision)
        feats.extend(coll["features"])
    with open(path, "w") as fd:
        json.dump({"type": "FeatureCollection", "features": feats}, fd)
    return len(feats)


def add_field(table: pa.Table, name: str, py_type, default=None) -> pa.Table:
    """Typed field addition on a feature table (reference
    Layer.add_field, gdal.py:1081-1090: bool/int/float/str/dict, dict
    stored as JSON) — fields live inside the props JSON column."""
    import json as _json

    if py_type not in (bool, int, float, str, dict):
        raise ValueError(f"unsupported field type {py_type}")
    props = []
    for p in table.column("props").to_pylist():
        d = _json.loads(p)
        d[name] = default if py_type is not dict else (default or {})
        props.append(_json.dumps(d))
    return table.set_column(table.column_names.index("props"), "props", pa.array(props, pa.string()))


def field_names(table: pa.Table) -> List[str]:
    """Schema introspection (reference Layer.field_names,
    gdal.py:1061-1070) from the first feature's props."""
    import json as _json

    if table.num_rows == 0:
        return []
    return list(_json.loads(table.column("props")[0].as_py()).keys())


def field_types(table: pa.Table) -> List[type]:
    """reference Layer.field_types (gdal.py:1072-1079)."""
    import json as _json

    if table.num_rows == 0:
        return []
    out = []
    for v in _json.loads(table.column("props")[0].as_py()).values():
        out.append(dict if isinstance(v, dict) else type(v) if v is not None else str)
    return out
