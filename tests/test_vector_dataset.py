"""Multi-layer VectorDataset container (S8) + per-band nodata stage
(M11) parity tests."""

import json

import numpy as np
import pyarrow as pa
import pytest


class TestVectorDataset:
    def test_create_add_layer_features(self):
        from gdal_boots_ray.sources.vectors import VectorDataset

        ds = VectorDataset.create()
        roads = ds.add_layer("roads", geometry_type="LineString", epsg=4326,
                             fields={"name": str, "lanes": int})
        cities = ds.add_layer("cities", geometry_type="Point", epsg=4326)
        roads.add_feature({"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
                          {"name": "m1", "lanes": 4})
        cities.add_feature({"type": "Point", "coordinates": [27.5, 53.9]}, {"name": "minsk"})
        cities.add_feature({"type": "Point", "coordinates": [30.5, 50.4]}, {"name": "kyiv"})
        assert ds.layer_names() == ["roads", "cities"]
        assert len(ds["cities"]) == 2
        assert ds[0].name == "roads"
        assert ds["roads"].field_names() == ["name", "lanes"]
        with pytest.raises(ValueError):
            ds.add_layer("bad", fields={"x": bytes})

    def test_multilayer_gpkg_roundtrip(self, tmp_path):
        from gdal_boots_ray.sources.vectors import VectorDataset

        ds = VectorDataset.create()
        a = ds.add_layer("a", geometry_type="Point")
        b = ds.add_layer("b", geometry_type="Polygon")
        a.add_feature({"type": "Point", "coordinates": [1.0, 2.0]}, {"v": 1})
        b.add_feature({"type": "Polygon",
                       "coordinates": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]]}, {"v": 2})
        p = str(tmp_path / "ml.gpkg")
        ds.to_file(p)
        back = VectorDataset.open(p)
        assert sorted(back.layer_names()) == ["a", "b"]
        t = back["a"].table
        assert json.loads(t.column("geom")[0].as_py())["type"] == "Point"

    def test_to_bytes_gpkg(self):
        from gdal_boots_ray.sources.vectors import VectorDataset

        ds = VectorDataset.create()
        ds.add_layer("a").add_feature({"type": "Point", "coordinates": [1.0, 2.0]}, {})
        blob = ds.to_bytes("gpkg")
        assert blob.startswith(b"SQLite format 3")

    def test_shapefile_dispatch(self, tmp_path):
        from gdal_boots_ray.sources.vectors import VectorDataset

        ds = VectorDataset.create()
        ds.add_layer("pts").add_feature({"type": "Point", "coordinates": [5.0, 6.0]}, {"n": 1})
        p = str(tmp_path / "pts.shp")
        ds.to_file(p)
        back = VectorDataset.open(p)
        t = back[0].table
        assert json.loads(t.column("geom")[0].as_py()) == {"type": "Point", "coordinates": [5.0, 6.0]}


class TestNodataStage:
    def test_set_and_get(self, ray_session):
        import ray.data as rd

        from gdal_boots_ray.sources.fixtures import synth_images_batch
        from gdal_boots_ray.stages.decode import DecodeImages, batch_nodata, make_set_nodata

        batch = synth_images_batch(np.arange(4), bands=1)
        ds = rd.from_arrow(batch).map_batches(DecodeImages, batch_format="pyarrow", concurrency=1)
        ds = ds.map_batches(make_set_nodata(0.0), batch_format="pyarrow")
        rows = ds.take(2)
        assert rows[0]["nodata"] == [0.0]

    def test_length_validation(self):
        import pyarrow as pa

        from gdal_boots_ray.stages.decode import make_set_nodata

        batch = pa.table({"bands": pa.array([3], pa.int32())})
        with pytest.raises(ValueError):
            make_set_nodata([1.0, 2.0])(batch)
        out = make_set_nodata([1.0, None, 3.0])(batch)
        assert out.column("nodata")[0].as_py() == [1.0, None, 3.0]
