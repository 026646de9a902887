"""OSM XML reader (stdlib ElementTree) — reference ``VectorDataset.open``
on .osm files (gdal.py:1197-1205; fixture minsk-boundary.osm).

Produces the engine feature schema with OGR-OSM-like layering:
tagged nodes -> ``points``; open ways -> ``lines``; closed ways ->
``multipolygons`` (as Polygon geometry); relations are counted into
``other_relations`` without geometry assembly (documented subset).
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET
from typing import Dict, List

import pyarrow as pa

from gdal_boots_ray.sources.vectors import FEATURE_SCHEMA


def read_osm_table(path_or_bytes) -> pa.Table:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        root = ET.fromstring(path_or_bytes)
    else:
        root = ET.parse(path_or_bytes).getroot()

    nodes: Dict[str, tuple] = {}
    rows = {k: [] for k in ("fid", "layer", "geom", "geom_type", "epsg", "props")}
    fid = 0

    def tags_of(el) -> Dict[str, str]:
        return {t.get("k"): t.get("v") for t in el.findall("tag")}

    for nd in root.findall("node"):
        nodes[nd.get("id")] = (float(nd.get("lon")), float(nd.get("lat")))
    for nd in root.findall("node"):
        tags = tags_of(nd)
        if not tags:
            continue
        lon, lat = nodes[nd.get("id")]
        rows["fid"].append(fid)
        rows["layer"].append("points")
        rows["geom"].append(json.dumps({"type": "Point", "coordinates": [lon, lat]}))
        rows["geom_type"].append("Point")
        rows["epsg"].append(4326)
        rows["props"].append(json.dumps({"osm_id": nd.get("id"), **tags}))
        fid += 1
    for way in root.findall("way"):
        refs = [nd.get("ref") for nd in way.findall("nd")]
        coords = [list(nodes[r]) for r in refs if r in nodes]
        if len(coords) < 2:
            continue
        tags = tags_of(way)
        closed = len(coords) >= 4 and coords[0] == coords[-1]
        if closed:
            geom = {"type": "Polygon", "coordinates": [coords]}
            layer = "multipolygons"
        else:
            geom = {"type": "LineString", "coordinates": coords}
            layer = "lines"
        rows["fid"].append(fid)
        rows["layer"].append(layer)
        rows["geom"].append(json.dumps(geom))
        rows["geom_type"].append(geom["type"])
        rows["epsg"].append(4326)
        rows["props"].append(json.dumps({"osm_id": way.get("id"), **tags}))
        fid += 1
    for rel in root.findall("relation"):
        rows["fid"].append(fid)
        rows["layer"].append("other_relations")
        rows["geom"].append("")
        rows["geom_type"].append("")
        rows["epsg"].append(4326)
        rows["props"].append(json.dumps({"osm_id": rel.get("id"), **tags_of(rel)}))
        fid += 1
    return pa.table(rows, schema=FEATURE_SCHEMA)


def read_osm(path_or_bytes):
    import ray.data as rd

    return rd.from_arrow(read_osm_table(path_or_bytes))
