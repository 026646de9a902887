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


# ---------------------------------------------------------------------------
# Multi-layer vector dataset (reference VectorDataset -> Layers -> Layer,
# gdal.py:1145-1171, 1174-1341)
# ---------------------------------------------------------------------------


class Layer:
    """One named feature layer: an appendable feature list over the
    engine feature schema (reference Layer, gdal.py:1019-1142)."""

    def __init__(self, name: str, geometry_type: str = "Polygon", epsg: int = 4326,
                 fields: Optional[Dict[str, type]] = None, table: Optional[pa.Table] = None):
        self.name = name
        self.geometry_type = geometry_type
        self.epsg = epsg
        self.fields = dict(fields or {})
        self._rows: List[dict] = []
        self._base = table

    def add_feature(self, geometry: dict, properties: Optional[dict] = None, fid: Optional[int] = None):
        props = dict(properties or {})
        for fname, ftype in self.fields.items():
            props.setdefault(fname, None)
        self._rows.append(
            {
                "fid": fid if fid is not None else len(self._rows),
                "geometry": geometry,
                "properties": props,
            }
        )

    def __len__(self) -> int:
        return (self._base.num_rows if self._base is not None else 0) + len(self._rows)

    @property
    def table(self) -> pa.Table:
        coll = {
            "type": "FeatureCollection",
            "features": [
                {"type": "Feature", "id": r["fid"], "geometry": r["geometry"], "properties": r["properties"]}
                for r in self._rows
            ],
        }
        t = features_table(coll, layer=self.name, epsg=self.epsg)
        if self._base is not None:
            t = pa.concat_tables([self._base, t]) if t.num_rows else self._base
        return t

    def field_names(self) -> List[str]:
        return field_names(self.table) if len(self) else list(self.fields)


class VectorDataset:
    """Multi-layer container with format-dispatched open/to_file —
    the engine twin of the reference VectorDataset (gdal.py:1174-1341;
    layer access by name or index like Layers, gdal.py:1145-1171)."""

    def __init__(self):
        self._layers: List[Layer] = []

    @classmethod
    def create(cls) -> "VectorDataset":
        return cls()

    def add_layer(self, name: str, geometry_type: str = "Polygon", epsg: int = 4326,
                  fields: Optional[Dict[str, type]] = None) -> Layer:
        if py_invalid := [t for t in (fields or {}).values() if t not in (bool, int, float, str, dict)]:
            raise ValueError(f"unsupported field types {py_invalid}")
        layer = Layer(name, geometry_type, epsg, fields)
        self._layers.append(layer)
        return layer

    @property
    def layers(self) -> List[Layer]:
        return list(self._layers)

    def layer_names(self) -> List[str]:
        return [l.name for l in self._layers]

    def __getitem__(self, key) -> Layer:
        if isinstance(key, int):
            return self._layers[key]
        for l in self._layers:
            if l.name == key:
                return l
        raise KeyError(key)

    def __len__(self) -> int:
        return len(self._layers)

    @classmethod
    def open(cls, path: str) -> "VectorDataset":
        ext = path.rsplit(".", 1)[-1].lower()
        ds = cls()
        if ext == "gpkg":
            from gdal_boots_ray.sources.gpkg import gpkg_layers, read_gpkg_table

            for name in gpkg_layers(path):
                t = read_gpkg_table(path, name)
                epsg = t.column("epsg")[0].as_py() if t.num_rows else 4326
                ds._layers.append(Layer(name, epsg=epsg, table=t))
        elif ext == "shp":
            from gdal_boots_ray.sources.shapefile import read_shapefile_table

            t = read_shapefile_table(path)
            name = t.column("layer")[0].as_py() if t.num_rows else "layer0"
            epsg = t.column("epsg")[0].as_py() if t.num_rows else 4326
            ds._layers.append(Layer(name, epsg=epsg, table=t))
        elif ext in ("geojson", "json"):
            t = features_table(open(path).read())
            ds._layers.append(Layer("layer0", table=t))
        else:
            raise ValueError(f"unsupported vector format {ext!r}")
        return ds

    def to_file(self, path: str) -> str:
        ext = path.rsplit(".", 1)[-1].lower()
        if ext == "gpkg":
            from gdal_boots_ray.sources.gpkg import write_gpkg

            import os as _os

            if _os.path.exists(path):
                _os.unlink(path)
            for layer in self._layers:
                write_gpkg(path, layer.table, layer=layer.name)
            return path
        if ext == "shp":
            from gdal_boots_ray.sources.shapefile import write_shapefile

            if len(self._layers) != 1:
                raise ValueError("shapefiles hold exactly one layer")
            return write_shapefile(path, self._layers[0].table)
        if ext in ("geojson", "json"):
            if len(self._layers) != 1:
                raise ValueError("GeoJSON files hold one layer; use gpkg for multi-layer")
            with open(path, "w") as fd:
                json.dump(to_feature_collection(self._layers[0].table), fd)
            return path
        raise ValueError(f"unsupported vector format {ext!r}")

    def to_bytes(self, fmt: str = "gpkg") -> bytes:
        if fmt == "gpkg":
            import os as _os
            import tempfile as _tempfile

            fd, tmp = _tempfile.mkstemp(suffix=".gpkg")
            _os.close(fd)
            _os.unlink(tmp)
            try:
                self.to_file(tmp)
                with open(tmp, "rb") as f:
                    return f.read()
            finally:
                if _os.path.exists(tmp):
                    _os.unlink(tmp)
        if fmt == "geojson":
            return json.dumps(to_feature_collection(self._layers[0].table)).encode()
        raise ValueError(f"unsupported to_bytes format {fmt!r}")
