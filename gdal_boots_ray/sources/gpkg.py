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


# ---------------------------------------------------------------------------
# GPKG writer (reference VectorDataset.to_file on .gpkg, gdal.py:1225-1263)
# ---------------------------------------------------------------------------

_WKB_CODES = {v: k for k, v in _WKB_TYPES.items()}


def encode_wkb(geom: dict) -> bytes:
    """GeoJSON geometry -> little-endian ISO WKB (2D)."""
    t = geom["type"]
    code = _WKB_CODES.get(t)
    if code is None:
        raise ValueError(f"unsupported geometry type {t!r}")
    out = bytearray(struct.pack("<BI", 1, code))

    def pts(seq):
        out.extend(struct.pack("<I", len(seq)))
        for p in seq:
            out.extend(struct.pack("<dd", float(p[0]), float(p[1])))

    if t == "Point":
        x, y = geom["coordinates"][:2]
        out.extend(struct.pack("<dd", float(x), float(y)))
    elif t == "LineString":
        pts(geom["coordinates"])
    elif t == "Polygon":
        out.extend(struct.pack("<I", len(geom["coordinates"])))
        for ring in geom["coordinates"]:
            pts(ring)
    elif t in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        sub_type = {"MultiPoint": "Point", "MultiLineString": "LineString", "MultiPolygon": "Polygon"}[t]
        out.extend(struct.pack("<I", len(geom["coordinates"])))
        for part in geom["coordinates"]:
            out.extend(encode_wkb({"type": sub_type, "coordinates": part}))
    else:  # GeometryCollection
        subs = geom.get("geometries", [])
        out.extend(struct.pack("<I", len(subs)))
        for sub in subs:
            out.extend(encode_wkb(sub))
    return bytes(out)


def make_gpkg_blob(geom: Optional[dict], srs_id: int) -> Optional[bytes]:
    """GeoJSON geometry -> GPKG 'GP' blob (version 0, little-endian
    header, no envelope; empty flag 0x10 for None)."""
    if geom is None:
        return b"GP" + bytes([0, 0x11]) + struct.pack("<i", srs_id)
    return b"GP" + bytes([0, 0x01]) + struct.pack("<i", srs_id) + encode_wkb(geom)


def _sqlite_type(v) -> str:
    if isinstance(v, bool):
        return "INTEGER"
    if isinstance(v, int):
        return "INTEGER"
    if isinstance(v, float):
        return "REAL"
    return "TEXT"


def write_gpkg(path: str, table: pa.Table, layer: str = "layer", geom_col: str = "geom") -> str:
    """Engine feature table (fid, geom GeoJSON, geom_type, epsg, props
    JSON) -> a GeoPackage file with the required metadata tables
    (gpkg_spatial_ref_sys / gpkg_contents / gpkg_geometry_columns) and
    one feature table — the writer twin of read_gpkg_table."""
    fids = table.column("fid").to_pylist()
    geoms = [json.loads(g) if g else None for g in table.column(geom_col).to_pylist()]
    props = [json.loads(p) if p else {} for p in table.column("props").to_pylist()]
    epsg = int(table.column("epsg")[0].as_py()) if table.num_rows else 4326
    gtypes = {g["type"] for g in geoms if g}
    gname = gtypes.pop().upper() if len(gtypes) == 1 else "GEOMETRY"

    field_names: List[str] = []
    field_types: Dict[str, str] = {}
    for pr in props:
        for k, v in pr.items():
            if k not in field_types and v is not None:
                field_names.append(k)
                field_types[k] = _sqlite_type(v)

    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
        con.execute("PRAGMA user_version = 10300")
        con.execute(
            """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
                srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
                organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
                definition TEXT NOT NULL, description TEXT)"""
        )
        for srs_id, name, org, cid, definition in (
            (-1, "Undefined cartesian SRS", "NONE", -1, "undefined"),
            (0, "Undefined geographic SRS", "NONE", 0, "undefined"),
            (epsg, f"EPSG:{epsg}", "EPSG", epsg, f"EPSG:{epsg}"),
        ):
            con.execute(
                "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
                (name, srs_id, org, cid, definition),
            )
        con.execute(
            """CREATE TABLE IF NOT EXISTS gpkg_contents (
                table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
                identifier TEXT UNIQUE, description TEXT DEFAULT '',
                last_change TEXT, min_x DOUBLE, min_y DOUBLE,
                max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"""
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents (table_name, data_type, identifier, srs_id) VALUES (?,?,?,?)",
            (layer, "features", layer, epsg),
        )
        con.execute(
            """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
                table_name TEXT NOT NULL, column_name TEXT NOT NULL,
                geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
                z TINYINT NOT NULL, m TINYINT NOT NULL,
                CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
            (layer, geom_col, gname, epsg),
        )
        cols = ", ".join(f'"{k}" {field_types[k]}' for k in field_names)
        con.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY, "{geom_col}" BLOB{", " + cols if cols else ""})'
        )
        placeholders = ",".join("?" * (2 + len(field_names)))
        for fid, geom, pr in zip(fids, geoms, props):
            vals = [fid, make_gpkg_blob(geom, epsg)]
            for k in field_names:
                v = pr.get(k)
                if isinstance(v, (dict, list)):
                    v = json.dumps(v)
                vals.append(v)
            con.execute(f'INSERT INTO "{layer}" VALUES ({placeholders})', vals)
        con.commit()
    finally:
        con.close()
    return path


def gpkg_to_bytes(table: pa.Table, layer: str = "layer") -> bytes:
    """Feature table -> GPKG file bytes (reference to_bytes path)."""
    fd, tmp = tempfile.mkstemp(suffix=".gpkg")
    os.close(fd)
    try:
        os.unlink(tmp)  # sqlite wants to create the file
        write_gpkg(tmp, table, layer=layer)
        with open(tmp, "rb") as f:
            return f.read()
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
