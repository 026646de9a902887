"""GeoPackage (vector) reader — stdlib sqlite3 + a WKB parser.

Reference parity for ``VectorDataset.open``/``from_bytes`` on .gpkg
(gdal.py:1197-1205, 1265-1274; exercised by tests/test_vector.py:35-60:
5 layers, 7 point features, exact field-name list).

GPKG spec (OGC 12-128r*): feature tables listed in ``gpkg_contents``,
geometry column in ``gpkg_geometry_columns``, each geometry a GP blob:
magic 'GP', version, flags (envelope size, endianness), srs_id, then
standard ISO WKB.  The WKB parser covers Point/LineString/Polygon/
Multi*/GeometryCollection with Z/M flags dropped (2D flatten — the
reference forces 2D throughout).
"""

from __future__ import annotations

import json
import os
import sqlite3
import struct
import tempfile
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

_WKB_TYPES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}


def parse_wkb(buf: bytes, offset: int = 0):
    """ISO WKB -> (GeoJSON geometry dict, bytes consumed)."""

    def rd(fmt, off, little):
        size = struct.calcsize(fmt)
        return struct.unpack_from(("<" if little else ">") + fmt, buf, off), off + size

    start = offset
    (byte_order,), offset = rd("B", offset, True)
    little = byte_order == 1
    (type_code,), offset = rd("I", offset, little)
    has_z = bool(type_code & 0x80000000) or (1000 <= type_code % 10000 and type_code // 1000 % 10 in (1, 3))
    base = type_code & 0xFF
    if base > 7:  # ISO codes 1001..3007
        base = type_code % 1000
    ndim = 2
    if type_code & 0x80000000 or (type_code // 1000) % 10 in (1, 3):
        ndim += 1
    if type_code & 0x40000000 or (type_code // 1000) % 10 in (2, 3):
        ndim += 1
    gtype = _WKB_TYPES.get(base)
    if gtype is None:
        raise ValueError(f"unsupported WKB type {type_code}")

    def read_point(off):
        vals, off = rd(f"{ndim}d", off, little)
        return [vals[0], vals[1]], off

    def read_ring(off):
        (n,), off = rd("I", off, little)
        pts = []
        for _ in range(n):
            p, off = read_point(off)
            pts.append(p)
        return pts, off

    if gtype == "Point":
        coords, offset = read_point(offset)
        return {"type": "Point", "coordinates": coords}, offset - start
    if gtype == "LineString":
        coords, offset = read_ring(offset)
        return {"type": "LineString", "coordinates": coords}, offset - start
    if gtype == "Polygon":
        (nrings,), offset = rd("I", offset, little)
        rings = []
        for _ in range(nrings):
            ring, offset = read_ring(offset)
            rings.append(ring)
        return {"type": "Polygon", "coordinates": rings}, offset - start
    # multi / collection: n sub-WKB geometries
    (n,), offset = rd("I", offset, little)
    subs = []
    for _ in range(n):
        sub, used = parse_wkb(buf, offset)
        offset += used
        subs.append(sub)
    if gtype == "GeometryCollection":
        return {"type": gtype, "geometries": subs}, offset - start
    key = {"MultiPoint": "Point", "MultiLineString": "LineString", "MultiPolygon": "Polygon"}[gtype]
    return {"type": gtype, "coordinates": [s["coordinates"] for s in subs]}, offset - start


def parse_gpkg_blob(blob: bytes) -> Optional[dict]:
    """GPKG geometry blob -> GeoJSON dict (None for empty)."""
    if blob is None or len(blob) < 8 or blob[:2] != b"GP":
        return None
    flags = blob[3]
    envelope_code = (flags >> 1) & 0x7
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(envelope_code, 0)
    header = 8 + env_len
    if flags & 0x10:  # empty geometry flag (OGC 12-128 bit 4)
        return None
    if flags & 0x20:  # extended (non-standard) geometry type — unsupported
        raise ValueError("GPKG extended-type geometry blobs are not supported")
    geom, _ = parse_wkb(blob, header)
    return geom


def gpkg_layers(path: str) -> List[str]:
    con = sqlite3.connect(path)
    try:
        rows = con.execute("SELECT table_name FROM gpkg_contents WHERE data_type='features'").fetchall()
        return [r[0] for r in rows]
    finally:
        con.close()


def read_gpkg_table(path: str, layer: str) -> pa.Table:
    """One GPKG feature table -> the engine feature schema
    (fid, layer, geom GeoJSON, geom_type, epsg, props JSON)."""
    con = sqlite3.connect(path)
    try:
        gc = con.execute(
            "SELECT column_name, srs_id FROM gpkg_geometry_columns WHERE table_name=?", (layer,)
        ).fetchone()
        geom_col, srs = (gc if gc else ("geom", 4326))
        cur = con.execute(f'SELECT * FROM "{layer}"')
        names = [d[0] for d in cur.description]
        gi = names.index(geom_col)
        rows = {k: [] for k in ("fid", "layer", "geom", "geom_type", "epsg", "props")}
        for i, rec in enumerate(cur):
            geom = parse_gpkg_blob(rec[gi])
            props = {
                names[j]: rec[j]
                for j in range(len(names))
                if j != gi and names[j] != "fid"
            }
            rows["fid"].append(rec[names.index("fid")] if "fid" in names else i)
            rows["layer"].append(layer)
            rows["geom"].append(json.dumps(geom) if geom else "")
            rows["geom_type"].append(geom["type"] if geom else "")
            rows["epsg"].append(int(srs))
            rows["props"].append(json.dumps(props))
        from gdal_boots_ray.sources.vectors import FEATURE_SCHEMA

        return pa.table(rows, schema=FEATURE_SCHEMA)
    finally:
        con.close()


def read_gpkg(path_or_bytes, layer: Optional[str] = None):
    """GPKG file path or bytes -> ray Dataset of features (all layers
    or one).  Bytes go through a temp file (sqlite needs a file),
    mirroring the reference's /vsimem from_bytes path."""
    import ray.data as rd

    tmp = None
    path = path_or_bytes
    if isinstance(path_or_bytes, (bytes, bytearray)):
        fd, tmp = tempfile.mkstemp(suffix=".gpkg")
        with os.fdopen(fd, "wb") as f:
            f.write(path_or_bytes)
        path = tmp
    try:
        layers = [layer] if layer else gpkg_layers(path)
        tables = [read_gpkg_table(path, lyr) for lyr in layers]
        return rd.from_arrow(pa.concat_tables(tables))
    finally:
        if tmp:
            os.unlink(tmp)
