"""GPKG reader against the reference's OWN fixture
(tests/fixtures/minsk-boundary.gpkg — read-only; reference
tests/test_vector.py:35-60 asserts 5 layers, 7 point features, exact
field names) and the GeoJSON fixture (38 features, name:en Minsk,
tests/test_vector.py:13-18)."""

import json
import os

import pytest

GPKG = "/root/reference/tests/fixtures/minsk-boundary.gpkg"
GEOJSON = "/root/reference/tests/fixtures/minsk-boundary.geojson"

pytestmark = pytest.mark.skipif(not os.path.exists(GPKG), reason="reference fixtures not present")


def test_gpkg_layers():
    from gdal_boots_ray.sources.gpkg import gpkg_layers

    assert len(gpkg_layers(GPKG)) == 5  # reference tests/test_vector.py:40


def test_gpkg_first_layer_features():
    from gdal_boots_ray.sources.gpkg import read_gpkg_table

    t = read_gpkg_table(GPKG, "points")
    assert t.num_rows == 7  # reference tests/test_vector.py:60
    props = json.loads(t.column("props")[0].as_py())
    assert list(props.keys()) == [
        "osm_id",
        "name",
        "barrier",
        "highway",
        "ref",
        "address",
        "is_in",
        "place",
        "man_made",
        "other_tags",
    ]  # reference tests/test_vector.py:46-57
    g = json.loads(t.column("geom")[0].as_py())
    assert g["type"] == "Point" and len(g["coordinates"]) == 2
    assert 27 < g["coordinates"][0] < 28  # Minsk longitude


def test_gpkg_from_bytes(ray_session):
    from gdal_boots_ray.sources.gpkg import read_gpkg

    with open(GPKG, "rb") as fd:
        data = fd.read()
    ds = read_gpkg(data)
    df = ds.to_pandas()
    # layers with features: points 7, lines 25, multipolygons 5 (the
    # other two layers in the fixture are empty)
    assert df.groupby("layer").size().to_dict() == {"points": 7, "lines": 25, "multipolygons": 5}
    # multipolygons layer parses MULTIPOLYGON WKB
    mp = df[df["layer"] == "multipolygons"]
    assert (mp["geom_type"] == "MultiPolygon").all()


def test_geojson_fixture_minsk(ray_session):
    from gdal_boots_ray.sources.vectors import read_geojson

    ds = read_geojson(GEOJSON)
    df = ds.to_pandas()
    assert len(df) == 38  # reference tests/test_vector.py:17
    props0 = json.loads(df.iloc[0]["props"])
    assert props0.get("name:en") == "Minsk"  # reference tests/test_vector.py:18


def test_rasterize_minsk_histogram_golden():
    """The reference's exact rasterize histogram
    (tests/test_vector.py:67-78: values [0,1], counts
    [29511509, 628591] on the 5490x5490 Sentinel-2 B05 20 m grid) —
    reproduced end-to-end through OUR CRS transform (4326->32635
    Krueger series) + scanline fill + supercover outline.  A
    cross-validation of two kernels against GDAL+PROJ at once."""
    import numpy as np

    from gdal_boots_ray.kernels.crs import transform_points
    from gdal_boots_ray.kernels.geometry import map_coords
    from gdal_boots_ray.kernels.rasterize import rasterize

    p = json.load(open("/root/reference/tests/fixtures/minsk-polygon.geojson"))
    g = map_coords(p["geometry"], lambda x, y: transform_points(4326, 32635, x, y))
    gt = [20.0, 0, 499980.0, 0, -20.0, 6000000.0]
    mask = rasterize(g, (5490, 5490), gt, outline=True)
    values, counts = np.unique(mask, return_counts=True)
    assert values.tolist() == [0, 1]
    assert counts.tolist() == [29511509, 628591]


def test_osm_reader():
    """OSM XML reader on the reference's minsk-boundary.osm fixture:
    the 7 tagged nodes match the OGR-converted GPKG points layer; the
    type=boundary relation is assembled into the multipolygons layer
    (OGR osm-driver layering)."""
    import collections

    from gdal_boots_ray.sources.osm import read_osm_table

    t = read_osm_table("/root/reference/tests/fixtures/minsk-boundary.osm")
    layers = collections.Counter(t.column("layer").to_pylist())
    assert layers["points"] == 7  # == the GPKG points layer
    assert layers["multipolygons"] >= 1
    names = [json.loads(p).get("name:en") for p in t.column("props").to_pylist()]
    assert "Minsk" in names


def _norm_ring(r):
    pts = [tuple(p) for p in r[:-1]]
    i = pts.index(min(pts))
    fwd = tuple(pts[i:] + pts[:i])
    rev_pts = pts[::-1]
    j = rev_pts.index(min(rev_pts))
    rev = tuple(rev_pts[j:] + rev_pts[:j])
    return min(fwd, rev)


def test_osm_relation_assembly_geometry_parity():
    """The minsk boundary relation (type=boundary, 61 outer + 13
    inner way members in arbitrary order) assembles into EXACTLY the
    MultiPolygon of the fixture's GeoJSON twin (OGR-converted):
    same 3 polygons, same ring-per-polygon grouping, same coordinates
    up to ring rotation/orientation."""
    from gdal_boots_ray.sources.osm import read_osm_table

    t = read_osm_table("/root/reference/tests/fixtures/minsk-boundary.osm")
    rel = [
        r
        for r in t.to_pylist()
        if r["layer"] == "multipolygons" and json.loads(r["props"]).get("osm_id") == "59195"
    ]
    assert len(rel) == 1
    g = json.loads(rel[0]["geom"])
    assert g["type"] == "MultiPolygon"
    ref = json.load(open("/root/reference/tests/fixtures/minsk-boundary.geojson"))
    rg = ref["features"][0]["geometry"]
    assert rg["type"] == "MultiPolygon"

    def norm_poly(p):
        return (_norm_ring(p[0]), frozenset(_norm_ring(r) for r in p[1:]))

    mine = sorted(map(str, (norm_poly(p) for p in g["coordinates"])))
    theirs = sorted(map(str, (norm_poly(p) for p in rg["coordinates"])))
    assert mine == theirs
