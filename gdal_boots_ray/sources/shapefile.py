"""ESRI Shapefile source/sink — pure stdlib struct parsing.

Reference parity for ``VectorDataset.open`` on .shp and the
``ESRIShape`` driver option (reference gdal.py:1197-1205,
options.py:125-130): reads/writes the .shp geometry file, the .shx
index, the .dbf attribute table (dBase III) and an optional .prj
(EPSG sniffing), producing/consuming the engine feature schema
(fid, layer, geom GeoJSON, geom_type, epsg, props JSON).

Shape types covered: Point(1), PolyLine(3), Polygon(5), MultiPoint(8)
(+ their Z/M variants read as 2D, like the reference's 2D flatten).
Polygon ring semantics follow the spec: outer rings clockwise, holes
counter-clockwise; holes attach to the first enclosing outer ring.
"""

from __future__ import annotations

import json
import os
import re
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

_SHP_MAGIC = 9994
_SHP_VERSION = 1000

_SHAPE_POINT = 1
_SHAPE_POLYLINE = 3
_SHAPE_POLYGON = 5
_SHAPE_MULTIPOINT = 8


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    j = np.arange(len(ring) - 1)
    xi, yi, xj, yj = x[j], y[j], x[j + 1], y[j + 1]
    cross = ((yi > py) != (yj > py)) & (px < (xj - xi) * (py - yi) / np.where(yj != yi, yj - yi, 1e-300) + xi)
    return bool(np.sum(cross) % 2)


def _rings_to_geojson(rings: List[np.ndarray]) -> dict:
    """Shapefile ring soup -> Polygon / MultiPolygon (outer = CW in
    shapefile convention = negative mathematical signed area)."""
    outers: List[List[List[float]]] = []
    holes: List[np.ndarray] = []
    for ring in rings:
        if _ring_signed_area(ring) <= 0:  # clockwise -> outer
            outers.append([ring])
        else:
            holes.append(ring)
    if not outers:  # degenerate: treat all as outers
        outers = [[r] for r in holes]
        holes = []
    for hole in holes:
        px, py = float(hole[0, 0]), float(hole[0, 1])
        target = next((o for o in outers if _point_in_ring(px, py, o[0])), outers[0])
        target.append(hole)
    polys = [[r.tolist() for r in poly] for poly in outers]
    if len(polys) == 1:
        return {"type": "Polygon", "coordinates": polys[0]}
    return {"type": "MultiPolygon", "coordinates": polys}


def _parse_shp_record(buf: bytes) -> Optional[dict]:
    (stype,) = struct.unpack_from("<i", buf, 0)
    base = stype % 10 if stype > 10 else stype  # Z (11..18) / M (21..28) -> 2D base
    if stype == 0:
        return None
    if base == _SHAPE_POINT:
        x, y = struct.unpack_from("<dd", buf, 4)
        return {"type": "Point", "coordinates": [x, y]}
    if base == _SHAPE_MULTIPOINT:
        (n,) = struct.unpack_from("<i", buf, 36)
        pts = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=40).reshape(n, 2)
        return {"type": "MultiPoint", "coordinates": pts.tolist()}
    if base in (_SHAPE_POLYLINE, _SHAPE_POLYGON):
        nparts, npoints = struct.unpack_from("<ii", buf, 36)
        parts = np.frombuffer(buf, dtype="<i4", count=nparts, offset=44)
        pts = np.frombuffer(buf, dtype="<f8", count=2 * npoints, offset=44 + 4 * nparts).reshape(
            npoints, 2
        )
        bounds = np.append(parts, npoints)
        seqs = [np.array(pts[bounds[i] : bounds[i + 1]]) for i in range(nparts)]
        if base == _SHAPE_POLYLINE:
            if len(seqs) == 1:
                return {"type": "LineString", "coordinates": seqs[0].tolist()}
            return {"type": "MultiLineString", "coordinates": [s.tolist() for s in seqs]}
        return _rings_to_geojson(seqs)
    raise ValueError(f"unsupported shapefile shape type {stype}")


def _read_dbf(path: str) -> Tuple[List[str], List[dict]]:
    """dBase III attribute table -> (field names, row dicts)."""
    if not os.path.exists(path):
        return [], []
    with open(path, "rb") as fd:
        data = fd.read()
    n_records, header_size, record_size = struct.unpack_from("<IHH", data, 4)
    fields = []
    off = 32
    while off < header_size - 1 and data[off] != 0x0D:
        name = data[off : off + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(data[off + 11])
        length = data[off + 16]
        decimals = data[off + 17]
        fields.append((name, ftype, length, decimals))
        off += 32
    rows = []
    for i in range(n_records):
        roff = header_size + i * record_size
        if roff + record_size > len(data) or data[roff : roff + 1] == b"*":
            continue
        pos = roff + 1
        row = {}
        for name, ftype, length, decimals in fields:
            rawv = data[pos : pos + length].decode("ascii", "replace").strip()
            pos += length
            if ftype in ("N", "F"):
                if rawv == "":
                    row[name] = None
                elif decimals or "." in rawv:
                    row[name] = float(rawv)
                else:
                    row[name] = int(rawv)
            elif ftype == "L":
                row[name] = rawv.upper() in ("T", "Y")
            else:
                row[name] = rawv
        rows.append(row)
    return [f[0] for f in fields], rows


_EPSG_RE = re.compile(r'AUTHORITY\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', re.IGNORECASE)


def _read_prj_epsg(path: str) -> int:
    if not os.path.exists(path):
        return 4326
    with open(path) as fd:
        wkt = fd.read()
    codes = _EPSG_RE.findall(wkt)
    if codes:
        return int(codes[-1])  # last AUTHORITY is the outermost CRS
    if "WGS_1984" in wkt or "WGS 84" in wkt:
        return 4326
    return 4326


def read_shapefile_table(path: str, layer: Optional[str] = None) -> pa.Table:
    """.shp (+ .dbf/.prj siblings) -> engine feature table."""
    from gdal_boots_ray.sources.vectors import FEATURE_SCHEMA

    stem = os.path.splitext(path)[0]
    layer = layer or os.path.basename(stem)
    epsg = _read_prj_epsg(stem + ".prj")
    _, attr_rows = _read_dbf(stem + ".dbf")

    with open(path, "rb") as fd:
        data = fd.read()
    (magic,) = struct.unpack_from(">i", data, 0)
    if magic != _SHP_MAGIC:
        raise ValueError(f"{path}: not a shapefile (magic {magic})")
    rows: Dict[str, list] = {k: [] for k in ("fid", "layer", "geom", "geom_type", "epsg", "props")}
    off = 100
    i = 0
    while off + 8 <= len(data):
        recno, length_words = struct.unpack_from(">ii", data, off)
        content = data[off + 8 : off + 8 + 2 * length_words]
        off += 8 + 2 * length_words
        geom = _parse_shp_record(content)
        props = attr_rows[i] if i < len(attr_rows) else {}
        rows["fid"].append(recno)
        rows["layer"].append(layer)
        rows["geom"].append(json.dumps(geom) if geom else "")
        rows["geom_type"].append(geom["type"] if geom else "")
        rows["epsg"].append(epsg)
        rows["props"].append(json.dumps(props))
        i += 1
    return pa.table(rows, schema=FEATURE_SCHEMA)


def read_shapefile(path: str, layer: Optional[str] = None):
    """.shp -> ray Dataset of features."""
    import ray.data as rd

    return rd.from_arrow(read_shapefile_table(path, layer))


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _close_ring(ring: List[Sequence[float]]) -> List[Sequence[float]]:
    if ring and (ring[0][0] != ring[-1][0] or ring[0][1] != ring[-1][1]):
        return list(ring) + [ring[0]]
    return list(ring)


def _orient(ring: List[Sequence[float]], clockwise: bool) -> List[Sequence[float]]:
    arr = np.asarray(ring, dtype=np.float64)
    area = _ring_signed_area(arr)
    if (area > 0) == clockwise:  # positive signed area = CCW
        return ring[::-1]
    return ring


def _geom_to_shp(geom: dict) -> Tuple[int, bytes]:
    """GeoJSON geometry -> (shape type, record content bytes)."""
    t = geom["type"]
    if t == "Point":
        x, y = geom["coordinates"][:2]
        return _SHAPE_POINT, struct.pack("<idd", _SHAPE_POINT, float(x), float(y))
    if t == "MultiPoint":
        pts = np.asarray(geom["coordinates"], dtype=np.float64)[:, :2]
        bbox = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
        return _SHAPE_MULTIPOINT, (
            struct.pack("<i4di", _SHAPE_MULTIPOINT, *bbox, len(pts)) + pts.astype("<f8").tobytes()
        )
    if t in ("LineString", "MultiLineString"):
        seqs = [geom["coordinates"]] if t == "LineString" else geom["coordinates"]
        return _SHAPE_POLYLINE, _parts_record(_SHAPE_POLYLINE, [list(s) for s in seqs])
    if t in ("Polygon", "MultiPolygon"):
        polys = [geom["coordinates"]] if t == "Polygon" else geom["coordinates"]
        rings = []
        for poly in polys:
            for k, ring in enumerate(poly):
                rings.append(_orient(_close_ring(list(ring)), clockwise=(k == 0)))
        return _SHAPE_POLYGON, _parts_record(_SHAPE_POLYGON, rings)
    raise ValueError(f"unsupported geometry type for shapefile: {t!r}")


def _parts_record(stype: int, seqs: List[List[Sequence[float]]]) -> bytes:
    all_pts = np.asarray([p[:2] for s in seqs for p in s], dtype=np.float64)
    bbox = (all_pts[:, 0].min(), all_pts[:, 1].min(), all_pts[:, 0].max(), all_pts[:, 1].max())
    parts = np.cumsum([0] + [len(s) for s in seqs[:-1]]).astype("<i4")
    return (
        struct.pack("<i4dii", stype, *bbox, len(seqs), len(all_pts))
        + parts.tobytes()
        + all_pts.astype("<f8").tobytes()
    )


def _dbf_field_spec(props_list: List[dict]) -> List[Tuple[str, str, int, int]]:
    spec: Dict[str, Tuple[str, int, int]] = {}
    order: List[str] = []
    for pr in props_list:
        for k, v in pr.items():
            if v is None:
                continue
            name = k[:10]
            if isinstance(v, bool):
                cand = ("L", 1, 0)
            elif isinstance(v, int):
                cand = ("N", 18, 0)
            elif isinstance(v, float):
                cand = ("N", 18, 6)
            else:
                s = json.dumps(v) if isinstance(v, (dict, list)) else str(v)
                cand = ("C", min(max(len(s), 1), 254), 0)
            if name not in spec:
                spec[name] = cand
                order.append(name)
            else:
                old = spec[name]
                if old[0] == "C" or cand[0] == "C":
                    spec[name] = ("C", max(old[1] if old[0] == "C" else 18, cand[1] if cand[0] == "C" else 18), 0)
                elif old[2] or cand[2]:
                    spec[name] = ("N", 18, 6)
    return [(n, *spec[n]) for n in order]


def _write_dbf(path: str, props_list: List[dict]) -> None:
    fields = _dbf_field_spec(props_list)
    record_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    hdr = struct.pack(
        "<BBBBIHH20x", 0x03, 95, 1, 1, len(props_list), header_size, record_size
    )
    out = bytearray(hdr)
    for name, ftype, length, dec in fields:
        out += struct.pack("<11sc4xBB14x", name.encode("ascii")[:11], ftype.encode(), length, dec)
    out += b"\x0d"
    for pr in props_list:
        out += b" "
        for name, ftype, length, dec in fields:
            v = pr.get(name)
            if ftype == "L":
                out += b"T" if v else (b"F" if v is not None else b"?")
            elif ftype == "N":
                if v is None:
                    out += b" " * length
                elif dec:
                    out += f"{float(v):>{length}.{dec}f}".encode()[:length]
                else:
                    out += f"{int(v):>{length}d}".encode()[:length]
            else:
                s = json.dumps(v) if isinstance(v, (dict, list)) else ("" if v is None else str(v))
                out += s.encode("ascii", "replace")[:length].ljust(length)
    out += b"\x1a"
    with open(path, "wb") as fd:
        fd.write(bytes(out))


_PRJ_WKT = {
    4326: 'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]]',
    3857: 'PROJCS["WGS 84 / Pseudo-Mercator",GEOGCS["WGS 84",DATUM["WGS_1984",'
    'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433]],PROJECTION["Mercator_1SP"],'
    'UNIT["metre",1],AUTHORITY["EPSG","3857"]]',
}


def write_shapefile(path: str, table: pa.Table) -> str:
    """Engine feature table -> .shp + .shx + .dbf (+ .prj) files."""
    stem = os.path.splitext(path)[0]
    geoms = [json.loads(g) if g else None for g in table.column("geom").to_pylist()]
    props = [json.loads(p) if p else {} for p in table.column("props").to_pylist()]
    epsg = int(table.column("epsg")[0].as_py()) if table.num_rows else 4326

    records: List[bytes] = []
    stype_out = 0
    for geom in geoms:
        if geom is None:
            records.append(struct.pack("<i", 0))
            continue
        st, content = _geom_to_shp(geom)
        stype_out = stype_out or st
        records.append(content)

    offsets = []
    body = bytearray()
    pos = 100
    for i, content in enumerate(records):
        words = len(content) // 2
        offsets.append((pos // 2, words))
        body += struct.pack(">ii", i + 1, words) + content
        pos += 8 + len(content)

    all_xy = [
        p[:2]
        for g in geoms
        if g
        for p in _geom_points(g)
    ]
    if all_xy:
        arr = np.asarray(all_xy, dtype=np.float64)
        bbox = (arr[:, 0].min(), arr[:, 1].min(), arr[:, 0].max(), arr[:, 1].max())
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)

    def header(total_bytes: int) -> bytes:
        return (
            struct.pack(">i5i", _SHP_MAGIC, 0, 0, 0, 0, 0)
            + struct.pack(">i", total_bytes // 2)
            + struct.pack("<ii", _SHP_VERSION, stype_out)
            + struct.pack("<4d", *bbox)
            + struct.pack("<4d", 0, 0, 0, 0)
        )

    with open(stem + ".shp", "wb") as fd:
        fd.write(header(100 + len(body)) + bytes(body))
    with open(stem + ".shx", "wb") as fd:
        shx = bytearray(header(100 + 8 * len(offsets)))
        for off_words, words in offsets:
            shx += struct.pack(">ii", off_words, words)
        fd.write(bytes(shx))
    _write_dbf(stem + ".dbf", props)
    if epsg in _PRJ_WKT:
        with open(stem + ".prj", "w") as fd:
            fd.write(_PRJ_WKT[epsg])
    return stem + ".shp"


def _geom_points(geom: dict):
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        yield c
    elif t in ("MultiPoint", "LineString"):
        yield from c
    elif t in ("MultiLineString", "Polygon"):
        for s in c:
            yield from s
    elif t == "MultiPolygon":
        for poly in c:
            for ring in poly:
                yield from ring
    elif t == "GeometryCollection":
        for sub in geom.get("geometries", []):
            yield from _geom_points(sub)
