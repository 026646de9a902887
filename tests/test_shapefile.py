"""Shapefile source/sink: write -> read round-trips across shape
types, dBase attribute typing, ring orientation, and .prj EPSG."""

import json

import numpy as np
import pyarrow as pa
import pytest


def _table(feats, epsg=4326):
    from gdal_boots_ray.sources.vectors import FEATURE_SCHEMA

    return pa.table(
        {
            "fid": pa.array([f[0] for f in feats], pa.int64()),
            "layer": pa.array(["lyr"] * len(feats), pa.string()),
            "geom": pa.array([json.dumps(f[1]) for f in feats], pa.string()),
            "geom_type": pa.array([f[1]["type"] for f in feats], pa.string()),
            "epsg": pa.array([epsg] * len(feats), pa.int32()),
            "props": pa.array([json.dumps(f[2]) for f in feats], pa.string()),
        },
        schema=FEATURE_SCHEMA,
    )


class TestRoundTrip:
    def test_points_with_attrs(self, tmp_path):
        from gdal_boots_ray.sources.shapefile import read_shapefile_table, write_shapefile

        feats = [
            (1, {"type": "Point", "coordinates": [27.5, 53.9]}, {"name": "minsk", "pop": 2000000, "area": 348.8}),
            (2, {"type": "Point", "coordinates": [30.5, 50.4]}, {"name": "kyiv", "pop": 2950000, "area": 839.0}),
        ]
        p = str(tmp_path / "pts.shp")
        write_shapefile(p, _table(feats))
        back = read_shapefile_table(p)
        assert back.num_rows == 2
        for i, f in enumerate(feats):
            g = json.loads(back.column("geom")[i].as_py())
            assert g == f[1]
            pr = json.loads(back.column("props")[i].as_py())
            assert pr["name"] == f[2]["name"]
            assert pr["pop"] == f[2]["pop"]
            assert abs(pr["area"] - f[2]["area"]) < 1e-6
        assert back.column("epsg")[0].as_py() == 4326

    def test_polygon_with_hole_orientation(self, tmp_path):
        from gdal_boots_ray.sources.shapefile import read_shapefile_table, write_shapefile

        poly = {
            "type": "Polygon",
            "coordinates": [
                [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]],
                [[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0], [2.0, 2.0]],
            ],
        }
        p = str(tmp_path / "poly.shp")
        write_shapefile(p, _table([(1, poly, {})]))
        back = read_shapefile_table(p)
        g = json.loads(back.column("geom")[0].as_py())
        assert g["type"] == "Polygon"
        assert len(g["coordinates"]) == 2
        # same point sets per ring (orientation may be normalized)
        for want, got in zip(poly["coordinates"], g["coordinates"]):
            assert {tuple(p) for p in want} == {tuple(p) for p in got}

    def test_multipolygon_and_lines(self, tmp_path):
        from gdal_boots_ray.sources.shapefile import read_shapefile_table, write_shapefile

        feats = [
            (1, {"type": "MultiPolygon", "coordinates": [
                [[[0.0, 0.0], [2.0, 0.0], [1.0, 2.0], [0.0, 0.0]]],
                [[[5.0, 5.0], [7.0, 5.0], [6.0, 7.0], [5.0, 5.0]]],
            ]}, {"k": 1}),
            (2, {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0], [2.0, 0.5]]}, {"k": 2}),
            (3, {"type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]}, {"k": 3}),
        ]
        for fid, geom, pr in feats:
            p = str(tmp_path / f"g{fid}.shp")
            write_shapefile(p, _table([(fid, geom, pr)]))
            back = read_shapefile_table(p)
            g = json.loads(back.column("geom")[0].as_py())
            assert g["type"] == geom["type"]
            if geom["type"] == "MultiPolygon":
                assert len(g["coordinates"]) == 2
            else:
                assert g == geom

    def test_prj_epsg_roundtrip(self, tmp_path):
        from gdal_boots_ray.sources.shapefile import read_shapefile_table, write_shapefile

        pt = {"type": "Point", "coordinates": [600000.0, 5700000.0]}
        p = str(tmp_path / "merc.shp")
        write_shapefile(p, _table([(1, pt, {})], epsg=3857))
        back = read_shapefile_table(p)
        assert back.column("epsg")[0].as_py() == 3857

    def test_ray_dataset_reader(self, ray_session, tmp_path):
        from gdal_boots_ray.sources.shapefile import read_shapefile, write_shapefile

        feats = [(i, {"type": "Point", "coordinates": [float(i), float(i)]}, {"n": i}) for i in range(1, 9)]
        p = str(tmp_path / "many.shp")
        write_shapefile(p, _table(feats))
        ds = read_shapefile(p)
        assert ds.count() == 8
        rows = ds.take(2)
        assert rows[0]["geom_type"] == "Point"
