"""Affine/bounds/CRS kernel goldens ported from the reference suite
(tests/test_raster.py:372-423, tests/test_geometry.py:80-112)."""

import numpy as np
import pytest

from gdal_boots_ray.kernels.affine import (
    Affine,
    GeoInfo,
    apply_gt,
    bounds,
    bounds_polygon_coords,
    gt_from_bounds,
    invert_gt,
    resolution,
)
from gdal_boots_ray.kernels.crs import resolve_crs, transform_bounds, transform_points
from gdal_boots_ray.kernels.geometry import to_geojson, transform_geojson


def test_affine_roundtrip():
    gt = Affine(10.0, 0.0, 600000.0, 0.0, -10.0, 5700000.0)
    x, y = gt.apply(3, 7)
    assert (x, y) == (600030.0, 5699930.0)
    inv = gt.invert()
    c, r = inv.apply(x, y)
    assert (round(c), round(r)) == (3, 7)
    assert Affine.from_gdal(*gt.to_gdal()) == gt


def test_affine_scale_compose():
    gt = Affine(10.0, 0.0, 600000.0, 0.0, -10.0, 5700000.0)
    gi = GeoInfo(32631, gt).scale(2, 2)
    assert gi.transform.a == 20.0 and gi.transform.e == -20.0
    assert gi.transform.c == 600000.0


def test_bounds_golden():
    # reference tests/test_raster.py:372-380: B04.tif 10980x10980 @10m
    gt = np.array([[10.0, 0, 499980.0, 0, -10.0, 6000000.0]])
    b = bounds(gt, [10980], [10980])[0]
    assert np.all(b == [499980.0, 5890200.0, 609780.0, 6000000.0])


def test_bounds_reproject_golden():
    # reference tests/test_raster.py:381-383: 32635 -> 4326 exact floats
    b = np.array([[499980.0, 5890200.0, 609780.0, 6000000.0]])
    t = transform_bounds(32635, 4326, b)[0]
    exp = [26.999700868340735, 53.16117354432605, 28.68033586831364, 54.136377428252246]
    assert np.allclose(t, exp, atol=1e-9)


def test_set_bounds_roundtrip_golden():
    # reference tests/test_raster.py:385-410
    b = np.array([[499980.0, 5890200.0, 609780.0, 6000000.0]])
    gt = gt_from_bounds(b, 100, 100)
    out = bounds(gt, [100], [100])[0]
    assert np.all(out == b[0])
    # 4326 round trip back to 32635 rounds to the utm corners
    b4326 = transform_bounds(32635, 4326, b)
    gt2 = gt_from_bounds(b4326, 100, 100)
    out2 = bounds(gt2, [100], [100])[0]
    back = transform_bounds(4326, 32635, out2[None])[0]
    assert np.all(np.round(back) == b[0])


def test_bounds_polygon_geojson_golden():
    # reference tests/test_raster.py:411-423 at precision 9
    b = [26.999700868340735, 53.16117354432605, 28.68033586831364, 54.136377428252246]
    ring = bounds_polygon_coords(np.array([b]))[0]
    geo = to_geojson({"type": "Polygon", "coordinates": [ring.tolist()]}, precision=9)
    assert geo == {
        "type": "Polygon",
        "coordinates": [
            [
                [26.999700868, 53.161173544],
                [28.680335868, 53.161173544],
                [28.680335868, 54.136377428],
                [26.999700868, 54.136377428],
                [26.999700868, 53.161173544],
            ]
        ],
    }


def test_transform_paris_golden():
    # reference tests/test_geometry.py:80-112 (4326 -> 3857)
    geom = {
        "type": "Polygon",
        "coordinates": [
            [
                [2.295279, 48.860081],
                [2.291867, 48.857713],
                [2.293404, 48.856723],
                [2.296872, 48.859022],
                [2.295279, 48.860081],
            ]
        ],
    }
    out = transform_geojson(geom, 4326, 3857, precision=6)
    exp = [
        [255509.289508, 6251153.329039],
        [255129.467406, 6250752.662865],
        [255300.565463, 6250585.160244],
        [255686.621457, 6250974.143639],
        [255509.289508, 6251153.329039],
    ]
    got = np.array(out["coordinates"][0])
    assert np.allclose(got, exp, atol=2e-6)


def test_transform_roundtrips():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-80, 80, 100)
    # web mercator: global
    lon = rng.uniform(-179, 179, 100)
    x, y = transform_points(4326, 3857, lon, lat)
    lon2, lat2 = transform_points(3857, 4326, x, y)
    assert np.allclose(lon, lon2, atol=1e-7) and np.allclose(lat, lat2, atol=1e-7)
    # UTM: valid near the zone's central meridian (Krueger series domain)
    for crs, cm in ((32635, 27.0), (32720, -63.0)):
        lon = rng.uniform(cm - 25, cm + 25, 100)
        x, y = transform_points(4326, crs, lon, lat)
        lon2, lat2 = transform_points(crs, 4326, x, y)
        assert np.allclose(lon, lon2, atol=1e-7) and np.allclose(lat, lat2, atol=1e-7)


def test_proj4_aea_roundtrip():
    p4 = "+proj=aea +lat_0=-32 +lon_0=-60 +lat_1=-5 +lat_2=-42 +x_0=0 +y_0=0 +ellps=aust_SA +units=m +no_defs"
    lon = np.array([-62.4, -60.0, -58.5])
    lat = np.array([-34.0, -32.0, -30.1])
    x, y = transform_points(4326, p4, lon, lat)
    lon2, lat2 = transform_points(p4, 4326, x, y)
    assert np.allclose(lon, lon2, atol=1e-8) and np.allclose(lat, lat2, atol=1e-8)
    assert resolve_crs(p4).kind == "projected"


def test_unsupported_epsg():
    # 27700 (OSGB) needs a datum shift the WGS84-pivot engine refuses
    with pytest.raises(ValueError):
        resolve_crs(27700)


class TestLccLaea:
    """Structural goldens for the LCC/LAEA registry entries: exact
    center mapping, conformal unit scale on the standard parallels
    (LCC), unit-area Jacobian everywhere (LAEA), tight roundtrips."""

    def test_lcc_center_exact(self):
        # projection center maps to the false origin by construction
        x, y = transform_points(4326, 2154, np.array([3.0]), np.array([46.5]))
        assert abs(x[0] - 700000.0) < 1e-6 and abs(y[0] - 6600000.0) < 1e-6
        x, y = transform_points(4326, 3034, np.array([10.0]), np.array([52.0]))
        assert abs(x[0] - 4000000.0) < 1e-6 and abs(y[0] - 2800000.0) < 1e-6

    def test_lcc_unit_scale_on_standard_parallels(self):
        # conformal 2SP: point scale is exactly 1 on lat_1 and lat_2
        from gdal_boots_ray.kernels.crs import resolve_crs

        crs = resolve_crs(2154)
        for lat in (49.0, 44.0):
            lon = np.array([1.0, 3.0, 6.2])
            la = np.full_like(lon, lat)
            d = 1e-6  # degrees along the parallel
            x0, y0 = crs.from_lonlat(lon, la)
            x1, y1 = crs.from_lonlat(lon + d, la)
            ground = np.radians(d) * np.cos(np.radians(lat)) * 6378137.0 / np.sqrt(
                1 - 0.0066943800229 * np.sin(np.radians(lat)) ** 2
            )
            k = np.hypot(x1 - x0, y1 - y0) / ground
            assert np.allclose(k, 1.0, atol=5e-7), (lat, k)

    def test_lcc_roundtrip(self):
        rng = np.random.default_rng(3)
        lon = rng.uniform(-4.5, 9.5, 200)
        lat = rng.uniform(41.0, 51.0, 200)
        x, y = transform_points(4326, 2154, lon, lat)
        lon2, lat2 = transform_points(2154, 4326, x, y)
        assert np.abs(lon - lon2).max() < 1e-9 and np.abs(lat - lat2).max() < 1e-9

    def test_laea_center_exact_and_roundtrip(self):
        x, y = transform_points(4326, 3035, np.array([10.0]), np.array([52.0]))
        assert abs(x[0] - 4321000.0) < 1e-6 and abs(y[0] - 3210000.0) < 1e-6
        rng = np.random.default_rng(4)
        lon = rng.uniform(-10.0, 30.0, 200)
        lat = rng.uniform(35.0, 70.0, 200)
        x, y = transform_points(4326, 3035, lon, lat)
        lon2, lat2 = transform_points(3035, 4326, x, y)
        assert np.abs(lon - lon2).max() < 1e-9 and np.abs(lat - lat2).max() < 1e-9

    def test_laea_equal_area_jacobian(self):
        # the defining property: the forward Jacobian determinant equals
        # the ellipsoidal area element everywhere (distortion == 1)
        from gdal_boots_ray.kernels.crs import WGS84_A, WGS84_F, resolve_crs

        crs = resolve_crs(3035)
        e2 = WGS84_F * (2 - WGS84_F)  # GRS80 f differs in the 12th digit; fine at 1e-6
        rng = np.random.default_rng(5)
        lon = rng.uniform(-8.0, 28.0, 64)
        lat = rng.uniform(38.0, 68.0, 64)
        d = 1e-6
        x0, y0 = crs.from_lonlat(lon, lat)
        xl, yl = crs.from_lonlat(lon + d, lat)
        xp, yp = crs.from_lonlat(lon, lat + d)
        det = np.abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0))
        s2 = np.sin(np.radians(lat)) ** 2
        # ellipsoidal area of the d x d patch (Snyder 3-? area element)
        m = WGS84_A * (1 - e2) / (1 - e2 * s2) ** 1.5  # meridional radius
        n = WGS84_A / np.sqrt(1 - e2 * s2)  # prime vertical radius
        truth = np.radians(d) ** 2 * m * n * np.cos(np.radians(lat))
        assert np.allclose(det / truth, 1.0, atol=1e-4)

    def test_polar_stereo_pole_exact_and_roundtrip(self):
        # the pole maps to the false origin exactly, both hemispheres
        x, y = transform_points(4326, 3413, np.array([12.3]), np.array([90.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        x, y = transform_points(4326, 3031, np.array([45.0]), np.array([-90.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        rng = np.random.default_rng(7)
        lon = rng.uniform(-180, 180, 200)
        lat = rng.uniform(60.0, 89.5, 200)
        x, y = transform_points(4326, 3413, lon, lat)
        lon2, lat2 = transform_points(3413, 4326, x, y)
        dl = (lon - lon2 + 180) % 360 - 180
        assert np.abs(dl).max() < 1e-9 and np.abs(lat - lat2).max() < 1e-9
        lat_s = rng.uniform(-89.5, -60.0, 200)
        x, y = transform_points(4326, 3031, lon, lat_s)
        lon2, lat2 = transform_points(3031, 4326, x, y)
        dl = (lon - lon2 + 180) % 360 - 180
        assert np.abs(dl).max() < 1e-9 and np.abs(lat_s - lat2).max() < 1e-9

    def test_polar_stereo_unit_scale_on_lat_ts(self):
        # variant B: point scale is exactly 1 on the latitude of true
        # scale (70N for 3413, 71S for 3031)
        from gdal_boots_ray.kernels.crs import WGS84_A, WGS84_F, resolve_crs

        e2 = WGS84_F * (2 - WGS84_F)
        for epsg, lat in ((3413, 70.0), (3031, -71.0), (3976, -70.0)):
            crs = resolve_crs(epsg)
            lon = np.array([-120.0, -45.0, 0.0, 60.0])
            la = np.full_like(lon, lat)
            d = 1e-6
            x0, y0 = crs.from_lonlat(lon, la)
            x1, y1 = crs.from_lonlat(lon + d, la)
            ground = (
                np.radians(d)
                * np.cos(np.radians(lat))
                * WGS84_A
                / np.sqrt(1 - e2 * np.sin(np.radians(lat)) ** 2)
            )
            k = np.hypot(x1 - x0, y1 - y0) / ground
            assert np.allclose(k, 1.0, atol=5e-7), (epsg, k)

    def test_proj4_lcc_laea_roundtrip(self):
        for p4 in (
            "+proj=lcc +lat_0=40 +lon_0=-96 +lat_1=33 +lat_2=45 +x_0=0 +y_0=0 +ellps=WGS84",
            "+proj=laea +lat_0=45 +lon_0=-100 +x_0=0 +y_0=0 +ellps=sphere",
        ):
            lon = np.array([-104.0, -96.0, -89.5])
            lat = np.array([35.0, 40.0, 44.2])
            x, y = transform_points(4326, p4, lon, lat)
            lon2, lat2 = transform_points(p4, 4326, x, y)
            assert np.allclose(lon, lon2, atol=1e-8) and np.allclose(lat, lat2, atol=1e-8)


def test_gt_vector_ops():
    gts = np.array(
        [
            [10.0, 0, 0, 0, -10.0, 0],
            [0.01, 0, 0, 0, -0.01, 1.0],
        ]
    )
    res = resolution(gts)
    assert np.allclose(res, [[10, 10], [0.01, 0.01]])
    inv = invert_gt(gts)
    x, y = apply_gt(gts[0:1], 5, 3)
    c, r = apply_gt(inv[0:1], x, y)
    assert np.allclose(c, 5) and np.allclose(r, 3)


class TestCylindricals:
    """Structural goldens for the Mercator / equidistant-cylindrical /
    sinusoidal registry entries: exact equator scale, conformality
    (Mercator), meridian-arc y (EQC/sinusoidal vs numerically
    integrated meridional radius), equal-area Jacobian (sinusoidal),
    spherical-limit agreement with Web Mercator, tight roundtrips."""

    def test_merc_3395_equator_exact(self):
        lon = np.array([-180.0, -37.5, 0.0, 12.0, 179.0])
        x, y = transform_points(4326, 3395, lon, np.zeros(5))
        assert np.allclose(x, 6378137.0 * np.radians(lon), atol=1e-6)
        assert np.abs(y).max() < 1e-6

    def test_merc_3395_conformal(self):
        # defining property: parallel scale == meridian scale everywhere
        from gdal_boots_ray.kernels.crs import WGS84_A, WGS84_F, resolve_crs

        crs = resolve_crs(3395)
        e2 = WGS84_F * (2 - WGS84_F)
        rng = np.random.default_rng(11)
        lon = rng.uniform(-170, 170, 64)
        lat = rng.uniform(-80, 80, 64)
        d = 1e-6
        x0, y0 = crs.from_lonlat(lon, lat)
        xl, _ = crs.from_lonlat(lon + d, lat)
        _, yp = crs.from_lonlat(lon, lat + d)
        s2 = np.sin(np.radians(lat)) ** 2
        nu = WGS84_A / np.sqrt(1 - e2 * s2)
        rho = WGS84_A * (1 - e2) / (1 - e2 * s2) ** 1.5
        k_par = (xl - x0) / (np.radians(d) * nu * np.cos(np.radians(lat)))
        k_mer = (yp - y0) / (np.radians(d) * rho)
        assert np.allclose(k_par, k_mer, rtol=1e-6)

    def test_merc_spherical_limit_is_webmercator(self):
        from gdal_boots_ray.kernels.crs import resolve_crs, webmercator_forward

        crs = resolve_crs("+proj=merc +R=6378137")
        lon = np.array([-120.0, -1.0, 30.0, 151.2])
        lat = np.array([-45.0, 60.0, 0.0, -33.9])
        x, y = crs.from_lonlat(lon, lat)
        xw, yw = webmercator_forward(lon, lat)
        assert np.allclose(x, xw, atol=1e-6) and np.allclose(y, yw, atol=1e-6)

    def test_merc_roundtrip(self):
        rng = np.random.default_rng(12)
        lon = rng.uniform(-179.9, 179.9, 200)
        lat = rng.uniform(-85.0, 85.0, 200)
        x, y = transform_points(4326, 3395, lon, lat)
        lon2, lat2 = transform_points(3395, 4326, x, y)
        assert np.abs(lon - lon2).max() < 1e-9 and np.abs(lat - lat2).max() < 1e-9

    def test_eqc_4087_meridian_arc(self):
        # y(phi) must equal the integrated meridional radius of curvature
        from gdal_boots_ray.kernels.crs import WGS84_A, WGS84_F, resolve_crs

        crs = resolve_crs(4087)
        e2 = WGS84_F * (2 - WGS84_F)
        phi = np.linspace(0, np.radians(84.0), 200001)
        rho = WGS84_A * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
        arc = np.trapz(rho, phi)
        _, y = crs.from_lonlat(np.array([0.0]), np.array([84.0]))
        assert abs(y[0] - arc) < 1e-3  # mm agreement with numeric integral

    def test_eqc_4087_equator_and_roundtrip(self):
        lon = np.array([-150.0, 10.0, 91.5])
        x, y = transform_points(4326, 4087, lon, np.zeros(3))
        assert np.allclose(x, 6378137.0 * np.radians(lon), atol=1e-6)
        rng = np.random.default_rng(13)
        lon = rng.uniform(-179.9, 179.9, 200)
        lat = rng.uniform(-89.0, 89.0, 200)
        x, y = transform_points(4326, 4087, lon, lat)
        lon2, lat2 = transform_points(4087, 4326, x, y)
        assert np.abs(lon - lon2).max() < 1e-9 and np.abs(lat - lat2).max() < 1e-9

    def test_plate_carree_32662_spherical_exact(self):
        # deprecated EPSG 32662 uses the SPHERICAL method: x=a*lam, y=a*phi
        lon = np.array([-120.0, 45.0])
        lat = np.array([30.0, -60.0])
        x, y = transform_points(4326, 32662, lon, lat)
        assert np.allclose(x, 6378137.0 * np.radians(lon), atol=1e-6)
        assert np.allclose(y, 6378137.0 * np.radians(lat), atol=1e-6)

    def test_sinu_equal_area_jacobian(self):
        from gdal_boots_ray.kernels.crs import WGS84_A, WGS84_F, resolve_crs

        crs = resolve_crs("+proj=sinu +lon_0=0")
        e2 = WGS84_F * (2 - WGS84_F)
        rng = np.random.default_rng(14)
        lon = rng.uniform(-170, 170, 64)
        lat = rng.uniform(-80, 80, 64)
        d = 1e-6
        x0, y0 = crs.from_lonlat(lon, lat)
        xl, yl = crs.from_lonlat(lon + d, lat)
        xp, yp = crs.from_lonlat(lon, lat + d)
        det = np.abs((xl - x0) * (yp - y0) - (xp - x0) * (yl - y0))
        s2 = np.sin(np.radians(lat)) ** 2
        m = WGS84_A * (1 - e2) / (1 - e2 * s2) ** 1.5
        n = WGS84_A / np.sqrt(1 - e2 * s2)
        truth = np.radians(d) ** 2 * m * n * np.cos(np.radians(lat))
        assert np.allclose(det / truth, 1.0, atol=1e-4)

    def test_sinu_modis_sphere(self):
        # MODIS authalic sphere: y = R*phi, x = R*lam*cos(phi), and the
        # antimeridian at the equator lands at pi*R (tile-grid width/2)
        R = 6371007.181
        crs = resolve_crs(f"+proj=sinu +R={R}")
        lon = np.array([180.0, -105.0])
        lat = np.array([0.0, 40.0])
        x, y = crs.from_lonlat(lon, lat)
        assert abs(x[0] - np.pi * R) < 1e-6 and abs(y[0]) < 1e-6
        assert abs(x[1] - R * np.radians(-105.0) * np.cos(np.radians(40.0))) < 1e-6
        assert abs(y[1] - R * np.radians(40.0)) < 1e-6

    def test_sinu_roundtrip(self):
        rng = np.random.default_rng(15)
        lon = rng.uniform(-179.0, 179.0, 200)
        lat = rng.uniform(-89.0, 89.0, 200)
        p4 = "+proj=sinu +lon_0=0"
        x, y = transform_points(4326, p4, lon, lat)
        lon2, lat2 = transform_points(p4, 4326, x, y)
        assert np.abs(lon - lon2).max() < 1e-8 and np.abs(lat - lat2).max() < 1e-9


class TestTransverseMercatorGeneral:
    """General +proj=tmerc (national grids) and EPSG:27700."""

    OSGB = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
            "+x_0=400000 +y_0=-100000 +ellps=airy")

    def test_osgb_published_worked_example(self):
        # "A guide to coordinate systems in Great Britain" (Ordnance
        # Survey) worked example: OSGB36 lat 52d39'27.2531"N,
        # lon 1d43'4.5177"E -> E 651409.903, N 313177.270 (Airy 1830,
        # pure projection - no datum shift involved; EPSG:27700 itself
        # stays rejected because the OSGB36<->WGS84 Helmert shift is
        # out of scope for the WGS84-pivot engine).
        from gdal_boots_ray.kernels.crs import crs_from_proj4

        crs = crs_from_proj4(self.OSGB)
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        x, y = crs.from_lonlat(np.array([lon]), np.array([lat]))
        assert abs(x[0] - 651409.903) < 1e-3
        assert abs(y[0] - 313177.270) < 1e-3
        lo, la = crs.to_lonlat(x, y)
        assert abs(lo[0] - lon) < 1e-12 and abs(la[0] - lat) < 1e-12

    def test_tmerc_false_origin_exact(self):
        from gdal_boots_ray.kernels.crs import crs_from_proj4

        crs = crs_from_proj4(self.OSGB)
        x, y = crs.from_lonlat(np.array([-2.0]), np.array([49.0]))
        assert x[0] == 400000.0 and y[0] == -100000.0

    def test_tmerc_utm_params_match_utm_path(self):
        from gdal_boots_ray.kernels.crs import crs_from_epsg, crs_from_proj4

        t = crs_from_proj4("+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 +x_0=500000 +y_0=0 +ellps=WGS84")
        u = crs_from_epsg(32633)
        lons = np.array([12.5, 14.0, 17.9])
        lats = np.array([41.9, 55.0, 59.3])
        tx, ty = t.from_lonlat(lons, lats)
        ux, uy = u.from_lonlat(lons, lats)
        assert np.array_equal(tx, ux) and np.array_equal(ty, uy)

    def test_gauss_krueger_zone(self):
        # DHDN-style Gauss-Krüger zone 4 parameters (k=1, lon_0=12,
        # x_0=4500000) on WGS84: central meridian maps to x_0 and the
        # northing equals the meridian arc (checked via roundtrip +
        # monotonicity), scale 1 on the central meridian.
        from gdal_boots_ray.kernels.crs import crs_from_proj4

        gk = crs_from_proj4("+proj=tmerc +lat_0=0 +lon_0=12 +k=1 +x_0=4500000 +y_0=0 +ellps=GRS80")
        lats = np.array([47.0, 50.5, 54.9])
        x, y = gk.from_lonlat(np.full(3, 12.0), lats)
        assert np.allclose(x, 4500000.0, atol=1e-9)
        assert np.all(np.diff(y) > 0)
        lo, la = gk.to_lonlat(x, y)
        assert np.allclose(lo, 12.0, atol=1e-12) and np.allclose(la, lats, atol=1e-12)


class TestOmerc:
    """Hotine Oblique Mercator (EPSG 9812/9815; +proj=omerc alpha case).

    The reference reaches this family through OSR (reference
    geometry.py:122-126); the engine implements Snyder eqs 9-11..9-39
    directly.  Anchored on the published EPSG Guidance Note 7-2
    worked example (Timbalai 1948 / RSO Borneo)."""

    def _dms(self, d, m, s):
        return d + m / 60 + s / 3600

    def test_epsg_gn7_2_worked_example(self):
        # EPSG GN 7-2, method 9815 example: Timbalai 1948 / RSO Borneo (m)
        # (EPSG:29873, Everest 1830 1967-definition ellipsoid).
        # lat 5d23'14.1129"N lon 115d48'19.8196"E
        #   -> E 679245.73, N 596562.78 (and B/A intermediates).
        from gdal_boots_ray.kernels.crs import _OmercConsts, crs_from_epsg

        crs = crs_from_epsg(29873)
        lat = self._dms(5, 23, 14.1129)
        lon = self._dms(115, 48, 19.8196)
        x, y = crs.from_lonlat(np.array([lon]), np.array([lat]))
        assert abs(x[0] - 679245.73) < 0.015
        assert abs(y[0] - 596562.78) < 0.015
        lo, la = crs.to_lonlat(x, y)
        assert abs(lo[0] - lon) < 1e-12 and abs(la[0] - lat) < 1e-12
        c = _OmercConsts(6377298.556, 1 / 300.8017, 4.0, 115.0,
                         self._dms(53, 18, 56.9537), self._dms(53, 7, 48.3685),
                         0.99984, 590476.87, 442857.65)
        assert abs(c.B - 1.003303209) < 1e-9
        assert abs(c.A - 6376278.686) < 1e-3

    def test_registry_roundtrips(self):
        from gdal_boots_ray.kernels.crs import crs_from_epsg

        grids = {
            3375: (101.0, 104.5, 1.5, 6.5),   # Peninsular Malaysia
            3376: (110.0, 119.0, 0.5, 7.5),   # East Malaysia (Borneo)
            29873: (109.5, 119.0, 0.8, 7.2),  # RSO Borneo
        }
        for epsg, (lo0, lo1, la0, la1) in grids.items():
            crs = crs_from_epsg(epsg)
            lons, lats = np.meshgrid(np.linspace(lo0, lo1, 7), np.linspace(la0, la1, 7))
            x, y = crs.from_lonlat(lons.ravel(), lats.ravel())
            assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
            lo, la = crs.to_lonlat(x, y)
            assert np.allclose(lo, lons.ravel(), atol=1e-11)
            assert np.allclose(la, lats.ravel(), atol=1e-11)

    def test_proj4_matches_registry_and_no_uoff(self):
        from gdal_boots_ray.kernels.crs import crs_from_epsg, crs_from_proj4

        p4 = ("+proj=omerc +lat_0=4 +lonc=115 +alpha=53.315820472222224 "
              "+gamma=53.13010236111111 +k=0.99984 +x_0=0 +y_0=0 +ellps=GRS80")
        a = crs_from_proj4(p4)
        b = crs_from_epsg(3376)
        lons = np.array([113.0, 115.0, 117.5])
        lats = np.array([1.0, 4.0, 6.5])
        ax, ay = a.from_lonlat(lons, lats)
        bx, by = b.from_lonlat(lons, lats)
        assert np.allclose(ax, bx, atol=1e-6) and np.allclose(ay, by, atol=1e-6)
        # variant A (+no_uoff): same grid rotated u by the centre offset
        na = crs_from_proj4(p4 + " +no_uoff")
        nx, ny = na.from_lonlat(lons, lats)
        du = np.hypot(nx - ax, ny - ay)
        assert np.allclose(du, du[0], atol=1e-6) and du[0] > 1e5
        lo, la = na.to_lonlat(nx, ny)
        assert np.allclose(lo, lons, atol=1e-11) and np.allclose(la, lats, atol=1e-11)

    def test_gamma_defaults_to_alpha_and_transform_points(self):
        from gdal_boots_ray.kernels.crs import crs_from_proj4

        g = crs_from_proj4("+proj=omerc +lat_0=45 +lonc=10 +alpha=30 +k=1 +ellps=WGS84")
        lons = np.linspace(5.0, 15.0, 5)
        lats = np.linspace(42.0, 48.0, 5)
        x, y = g.from_lonlat(lons, lats)
        lo, la = g.to_lonlat(x, y)
        assert np.allclose(lo, lons, atol=1e-11) and np.allclose(la, lats, atol=1e-11)
        # full transform_points path (engine API surface)
        x2, y2 = transform_points(4326, 29873, np.array([115.8]), np.array([5.4]))
        lo2, la2 = transform_points(29873, 4326, x2, y2)
        assert abs(lo2[0] - 115.8) < 1e-11 and abs(la2[0] - 5.4) < 1e-11


class TestCeaGeos:
    """Cylindrical equal-area (EASE-Grid 2.0) and the geostationary
    satellite projection."""

    def test_cea_ease2_published_extent(self):
        # NSIDC EASE-Grid 2.0 Global (EPSG 6933) publishes the map
        # extent: x = +/-17,367,530.45 m at lon +/-180 (NSIDC grid
        # documentation) — an external golden for k0 = cos(30)/W(30)
        crs = resolve_crs(6933)
        x, y = crs.from_lonlat(np.array([180.0, -180.0]), np.array([0.0, 0.0]))
        assert abs(x[0] - 17367530.45) < 0.01 and abs(x[1] + 17367530.45) < 0.01
        assert abs(y[0]) < 1e-9

    def test_cea_equal_area_jacobian(self):
        # the defining property: the numeric Jacobian determinant of
        # the forward map equals the ellipsoidal area element exactly
        from gdal_boots_ray.kernels.crs import WGS84_A, WGS84_F

        crs = resolve_crs(6933)
        e2 = WGS84_F * (2 - WGS84_F)
        rng = np.random.default_rng(33)
        lon = rng.uniform(-170, 170, 64)
        lat = rng.uniform(-84, 84, 64)
        d = 1e-6
        x0, y0 = crs.from_lonlat(lon, lat)
        xl, _ = crs.from_lonlat(lon + d, lat)
        _, yp = crs.from_lonlat(lon, lat + d)
        det = np.abs((xl - x0) * (yp - y0))  # off-diagonal terms are 0
        s2 = np.sin(np.radians(lat)) ** 2
        m = WGS84_A * (1 - e2) / (1 - e2 * s2) ** 1.5
        n = WGS84_A / np.sqrt(1 - e2 * s2)
        truth = np.radians(d) ** 2 * m * n * np.cos(np.radians(lat))
        assert np.allclose(det / truth, 1.0, atol=1e-4)

    def test_cea_roundtrip_and_proj4(self):
        rng = np.random.default_rng(34)
        lon = rng.uniform(-179.0, 179.0, 200)
        lat = rng.uniform(-85.0, 85.0, 200)
        x, y = transform_points(4326, 6933, lon, lat)
        lon2, lat2 = transform_points(6933, 4326, x, y)
        assert np.abs(lon - lon2).max() < 1e-9 and np.abs(lat - lat2).max() < 1e-9
        # proj4 spelling resolves to the same map
        x2, y2 = transform_points(4326, "+proj=cea +lat_ts=30 +lon_0=0", lon, lat)
        assert np.allclose(x, x2, atol=1e-9) and np.allclose(y, y2, atol=1e-9)

    def test_geos_ecef_ray_trace_parity(self):
        # independent derivation: satellite at (a+h, 0, 0) in ECEF,
        # scan angles from the satellite->surface view vector computed
        # with the standard geodetic->ECEF formulas (N(phi) prime
        # vertical radius).  Both sweep conventions must match the
        # projection to sub-millimeter.
        from gdal_boots_ray.kernels.crs import WGS84_A, WGS84_F

        a = WGS84_A
        e2 = WGS84_F * (2 - WGS84_F)
        h = 35786023.0  # GOES-R perspective point height
        rng = np.random.default_rng(35)
        lon = rng.uniform(-140, -10, 100)
        lat = rng.uniform(-60, 60, 100)
        phi = np.radians(lat)
        lam = np.radians(lon + 75.0)  # satellite at lon_0 = -75
        N = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
        PX = N * np.cos(phi) * np.cos(lam)
        PY = N * np.cos(phi) * np.sin(lam)
        PZ = N * (1 - e2) * np.sin(phi)
        dx = (a + h) - PX
        for sweep in ("x", "y"):
            crs = resolve_crs(f"+proj=geos +h=35786023 +lon_0=-75 +sweep={sweep}")
            x, y = crs.from_lonlat(lon, lat)
            if sweep == "x":
                xs = h * np.arctan(PY / np.hypot(PZ, dx))
                ys = h * np.arctan(PZ / dx)
            else:
                xs = h * np.arctan(PY / dx)
                ys = h * np.arctan(PZ / np.hypot(PY, dx))
            assert np.abs(x - xs).max() < 1e-3 and np.abs(y - ys).max() < 1e-3
            lo, la = crs.to_lonlat(x, y)
            assert np.abs(lo - lon).max() < 1e-9 and np.abs(la - lat).max() < 1e-8

    def test_geos_disk_properties(self):
        # sub-satellite point maps to the origin; the far side of the
        # Earth is not visible (NaN); Meteosat default sweep is y
        crs = resolve_crs("+proj=geos +h=35785831 +lon_0=0")
        x, y = crs.from_lonlat(np.array([0.0, 180.0]), np.array([0.0, 0.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        assert np.isnan(x[1]) and np.isnan(y[1])
        # limb visibility: ~81 deg away is over the horizon, ~60 is not
        x, y = crs.from_lonlat(np.array([60.0, 85.0]), np.array([0.0, 0.0]))
        assert np.isfinite(x[0]) and np.isnan(x[1])
        import pytest

        with pytest.raises(ValueError, match="sweep"):
            resolve_crs("+proj=geos +h=35785831 +sweep=z")
        with pytest.raises(ValueError, match="height"):
            resolve_crs("+proj=geos +lon_0=0")

    def test_cea_polar_edge_inverse(self):
        # regression: the authalic inverse iteration stalls at the
        # pole (cos(phi) denominator); the map-edge y must come back
        # as exactly +/-90, not ~89.985 (a ~1.7 km error)
        crs = resolve_crs(6933)
        x, y = crs.from_lonlat(np.array([10.0, -20.0]), np.array([90.0, -90.0]))
        lon2, lat2 = crs.to_lonlat(x, y)
        assert lat2[0] == 90.0 and lat2[1] == -90.0
        # near-pole (not at the edge) converges to cm-level: the
        # Snyder fixed-point iteration is linear near the pole, ~3e-7
        # deg (~3 cm) at 89.9 — fine for rasters, documented here
        x, y = crs.from_lonlat(np.array([10.0]), np.array([89.9]))
        _, la = crs.to_lonlat(x, y)
        assert abs(la[0] - 89.9) < 1e-6
        # LAEA shares the helper: polar round-trip through EPSG 3035
        crs2 = resolve_crs(3035)
        x, y = crs2.from_lonlat(np.array([10.0]), np.array([90.0]))
        _, la2 = crs2.to_lonlat(x, y)
        assert abs(la2[0] - 90.0) < 1e-7


class TestEpsgProj4Dispatch:
    """Out-of-registry EPSG codes route through their published proj4
    definitions into the family kernels (the reference accepts
    arbitrary SRS via OSR, geometry.py:122-126); datum-shifted codes
    stay rejected with a message pointing at the proj4 escape hatch."""

    CODES = {
        2193: (174.8, -41.3),   # NZTM2000 (tmerc)
        5070: (-100.0, 40.0),   # Conus Albers (aea)
        3577: (134.0, -24.0),   # Australian Albers (aea)
        3338: (-150.0, 62.0),   # Alaska Albers (aea)
        3083: (-100.0, 31.0),   # Texas Centric Albers (aea)
        3112: (134.0, -24.0),   # GA Lambert (lcc)
        5243: (10.5, 51.0),     # LCC Germany
        3994: (100.0, -41.0),   # Mercator 41
        25832: (9.0, 52.0),     # ETRS89 / UTM 32N
    }

    def test_out_of_registry_roundtrips(self):
        for code, (lon, lat) in self.CODES.items():
            crs = resolve_crs(code)
            assert crs.kind == "projected", code
            x, y = crs.from_lonlat(np.array([lon]), np.array([lat]))
            lon2, lat2 = crs.to_lonlat(x, y)
            assert abs(lon2[0] - lon) < 1e-8 and abs(lat2[0] - lat) < 1e-8, code

    def test_epsg_key_preserved(self):
        # .key must stay the int EPSG (GeoInfo / gtiff geokeys branch
        # on isinstance(key, int)), not the routed proj4 string
        assert resolve_crs(5070).key == 5070
        assert resolve_crs(2193).key == 2193

    def test_geographic_aliases(self):
        # NAD83 / ETRS89 geographic resolve as identity lon/lat
        for code in (4269, 4258):
            crs = resolve_crs(code)
            assert crs.kind == "geographic"

    def test_projection_origin_goldens(self):
        # published natural-origin -> false-origin identities
        x, y = transform_points(4326, 2193, np.array([173.0]), np.array([0.0]))
        assert abs(x[0] - 1600000.0) < 1e-6 and abs(y[0] - 10000000.0) < 1e-6
        x, y = transform_points(4326, 5070, np.array([-96.0]), np.array([23.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6

    def test_utm_ellipsoid_param(self):
        # 25832 (GRS80) vs 32632 (WGS84): same projection, flattening
        # differs in the 10th decimal -> sub-mm coordinate difference
        x1, y1 = transform_points(4326, 25832, np.array([9.5]), np.array([52.0]))
        x2, y2 = transform_points(4326, 32632, np.array([9.5]), np.array([52.0]))
        assert abs(x1[0] - x2[0]) < 1e-3 and abs(y1[0] - y2[0]) < 1e-3

    def test_osgb_worked_example_via_proj4(self):
        # Ordnance Survey "A guide to coordinate systems in Great
        # Britain" worked example (projection math only, coordinates
        # given in OSGB36 lat/lon): lat 52d39'27.2531"N lon
        # 1d43'4.5177"E -> E 651409.903 N 313177.270 (Airy 1830).
        # Reached via explicit proj4 (datum-shifted EPSG 27700 itself
        # stays rejected; native-datum input is the proj4 contract).
        p4 = (
            "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
            "+x_0=400000 +y_0=-100000 +ellps=airy"
        )
        lat = 52 + 39 / 60 + 27.2531 / 3600
        lon = 1 + 43 / 60 + 4.5177 / 3600
        crs = resolve_crs(p4)
        x, y = crs.from_lonlat(np.array([lon]), np.array([lat]))
        assert abs(x[0] - 651409.903) < 2e-3
        assert abs(y[0] - 313177.270) < 2e-3

    def test_laea_polar_aspect_goldens(self):
        # EASE-Grid 2.0 North/South (EPSG 6931/6932): the polar aspect
        # uses Snyder 24-3/24-4 (rho = a*sqrt(qp -+ q)) — the oblique D
        # constant degenerates at the pole.  Golden values computed from
        # an independent implementation of the same published formulas.
        n = resolve_crs(6931)
        x, y = n.from_lonlat(np.array([10.0]), np.array([75.0]))
        assert abs(x[0] - 290035.87111707137) < 1e-6
        assert abs(y[0] + 1644875.162903232) < 1e-6
        lon2, lat2 = n.to_lonlat(x, y)
        assert abs(lon2[0] - 10.0) < 1e-9 and abs(lat2[0] - 75.0) < 1e-9
        s = resolve_crs(6932)
        x, y = s.from_lonlat(np.array([10.0]), np.array([-75.0]))
        assert abs(x[0] - 290035.87111707043) < 1e-6
        assert abs(y[0] - 1644875.1629032267) < 1e-6
        # pole maps to the origin; equator ring radius = a*sqrt(qp)
        x, y = n.from_lonlat(np.array([123.0]), np.array([90.0]))
        assert x[0] == 0.0 and y[0] == 0.0
        # equal-area sanity: published EASE-Grid 2.0 equator radius
        x, y = n.from_lonlat(np.array([0.0]), np.array([0.0]))
        assert abs(abs(y[0]) - 9009964.76) < 1.0

    def test_ups_variant_a_epsg_worked_example(self):
        # EPSG Guidance Note 7-2, Polar Stereographic variant A (UPS
        # North, EPSG 5041): phi 73N lam 44E -> E 3320416.75 N
        # 632668.43 (published to cm; we match to mm)
        crs = resolve_crs(5041)
        x, y = crs.from_lonlat(np.array([44.0]), np.array([73.0]))
        assert abs(x[0] - 3320416.75) < 5e-3
        assert abs(y[0] - 632668.43) < 5e-3
        lon2, lat2 = crs.to_lonlat(x, y)
        assert abs(lon2[0] - 44.0) < 1e-9 and abs(lat2[0] - 73.0) < 1e-9
        # pole -> false origin; south twin mirrors
        x, y = crs.from_lonlat(np.array([17.0]), np.array([90.0]))
        assert x[0] == 2000000.0 and y[0] == 2000000.0
        s = resolve_crs(5042)
        x, y = s.from_lonlat(np.array([44.0]), np.array([-73.0]))
        lon2, lat2 = s.to_lonlat(x, y)
        assert abs(lon2[0] - 44.0) < 1e-9 and abs(lat2[0] + 73.0) < 1e-9

    def test_oblique_stereographic(self):
        # non-polar +proj=stere (Snyder 21-27..21-40 conformal-latitude
        # form): center->origin, tight roundtrip, conformality (equal
        # orthogonal scales) off-center, spherical closed-form limit
        import math

        crs = resolve_crs("+proj=stere +lat_0=52 +lon_0=5 +k=0.9999 +x_0=0 +y_0=0 +ellps=WGS84")
        x, y = crs.from_lonlat(np.array([5.0]), np.array([52.0]))
        assert x[0] == 0.0 and y[0] == 0.0
        lons = np.array([3.0, 5.0, 7.5, 10.0])
        lats = np.array([50.0, 55.0, 52.5, 45.0])
        x, y = crs.from_lonlat(lons, lats)
        lon2, lat2 = crs.to_lonlat(x, y)
        assert np.abs(lon2 - lons).max() < 1e-10 and np.abs(lat2 - lats).max() < 1e-10
        # conformality at (10E, 45N): meridian/parallel scales equal
        a, f = 6378137.0, 1 / 298.257223563
        e2 = f * (2 - f)
        d = 1e-7
        phi = math.radians(45.0)
        M = a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
        N = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
        x0, y0 = crs.from_lonlat(np.array([10.0]), np.array([45.0]))
        x1, y1 = crs.from_lonlat(np.array([10.0]), np.array([45.0 + d]))
        x2, y2 = crs.from_lonlat(np.array([10.0 + d]), np.array([45.0]))
        k_m = math.hypot(x1[0] - x0[0], y1[0] - y0[0]) / (M * math.radians(d))
        k_p = math.hypot(x2[0] - x0[0], y2[0] - y0[0]) / (N * math.cos(phi) * math.radians(d))
        assert abs(k_m / k_p - 1) < 1e-6
        # spherical limit == the textbook closed form
        sph = resolve_crs("+proj=stere +lat_0=40 +lon_0=0 +k=1 +R=6370997")
        R, p1 = 6370997.0, math.radians(40.0)
        lam, p = math.radians(10.0), math.radians(45.0)
        kk = 2 * R / (1 + math.sin(p1) * math.sin(p) + math.cos(p1) * math.cos(p) * math.cos(lam))
        xs = kk * math.cos(p) * math.sin(lam)
        ys = kk * (math.cos(p1) * math.sin(p) - math.sin(p1) * math.cos(p) * math.cos(lam))
        x, y = sph.from_lonlat(np.array([10.0]), np.array([45.0]))
        assert abs(x[0] - xs) < 1e-6 and abs(y[0] - ys) < 1e-6

    def test_sterea_rd_new_worked_example(self):
        # EPSG Guidance Note 7-2 "Oblique Stereographic" (method 9809)
        # worked example — Amersfoort / RD New parameters, input in
        # Amersfoort geographic coordinates (projection math only; the
        # datum-shifted EPSG 28992 code itself stays rejected):
        # phi 53N lam 6E -> E 196105.283 N 557057.739 (published to mm)
        rd = resolve_crs(
            "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 "
            "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel"
        )
        x, y = rd.from_lonlat(np.array([6.0]), np.array([53.0]))
        assert abs(x[0] - 196105.283) < 1e-3
        assert abs(y[0] - 557057.739) < 1e-3
        lon2, lat2 = rd.to_lonlat(x, y)
        assert abs(lon2[0] - 6.0) < 1e-10 and abs(lat2[0] - 53.0) < 1e-10
        x, y = rd.from_lonlat(np.array([5.38763888888889]), np.array([52.15616055555555]))
        assert abs(x[0] - 155000.0) < 1e-6 and abs(y[0] - 463000.0) < 1e-6

    def test_polyconic_brazil(self):
        # SIRGAS 2000 / Brazil Polyconic (EPSG 5880, method 9818):
        # structural invariants pin the Snyder closed form — the
        # central meridian is arc-length-true (y = y_0 + M(phi)), the
        # equator is x = x_0 + a*dlam, parallels are circular arcs of
        # radius N*cot(phi), and the Newton inverse round-trips to
        # machine precision across the Brazilian domain.
        import math

        from gdal_boots_ray.kernels.crs import _MeridArc

        crs = resolve_crs(5880)
        arc = _MeridArc(6378137.0, 1 / 298.257222101)
        for lat in (-30.0, 0.0, 15.0):
            x, y = crs.from_lonlat(np.array([-54.0]), np.array([lat]))
            M = float(arc.m(np.array([math.radians(lat)]))[0])
            assert abs(x[0] - 5000000.0) < 1e-6
            assert abs(y[0] - (10000000.0 + M)) < 1e-6
        x, y = crs.from_lonlat(np.array([-50.0]), np.array([0.0]))
        assert abs((x[0] - 5000000.0) - 6378137.0 * math.radians(4.0)) < 1e-6
        lons = np.array([-74.0, -54.0, -35.0, -40.0])
        lats = np.array([-33.0, -5.0, -8.0, 4.0])
        x, y = crs.from_lonlat(lons, lats)
        lon2, lat2 = crs.to_lonlat(x, y)
        assert np.abs(lon2 - lons).max() < 1e-10
        assert np.abs(lat2 - lats).max() < 1e-10

    def test_krovak(self):
        # Krovak (EPSG method 9819, S-JTSK — proj4 only, shifted
        # datum).  EPSG Guidance 7-2 example point pinned to 1 m
        # (published southing matches to <2 cm); conformality and the
        # design scale k=0.9999 hold over the Czech/Slovak domain;
        # roundtrips machine-exact.
        import math

        crs = resolve_crs("+proj=krovak +ellps=bessel")
        lat = 50 + 12 / 60 + 32.4416 / 3600
        lon = 16 + 50 / 60 + 59.1790 / 3600
        x, y = crs.from_lonlat(np.array([lon]), np.array([lat]))
        assert abs(-y[0] - 1050538.63) < 0.05   # southing
        assert abs(-x[0] - 568991.0) < 1.0      # westing
        lon2, lat2 = crs.to_lonlat(x, y)
        assert abs(lon2[0] - lon) < 1e-12 and abs(lat2[0] - lat) < 1e-12
        # conformal with scale ~0.9999 across the domain
        a, f = 6377397.155, 1 / 299.1528128
        e2 = f * (2 - f)
        d = 1e-7
        for lo, la in [(14.42, 50.088), (18.5, 48.7)]:
            phi = math.radians(la)
            M = a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
            N = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
            x0, y0 = crs.from_lonlat(np.array([lo]), np.array([la]))
            x1, y1 = crs.from_lonlat(np.array([lo]), np.array([la + d]))
            x2, y2 = crs.from_lonlat(np.array([lo + d]), np.array([la]))
            km = math.hypot(x1[0] - x0[0], y1[0] - y0[0]) / (M * math.radians(d))
            kp = math.hypot(x2[0] - x0[0], y2[0] - y0[0]) / (N * math.cos(phi) * math.radians(d))
            assert abs(km / kp - 1) < 1e-6
            assert abs(km - 0.9999) < 2e-4
        # Prague landmark (known S-JTSK coordinates, PROJ axis signs)
        x, y = crs.from_lonlat(np.array([14.42076]), np.array([50.08804]))
        assert abs(x[0] + 742925.3) < 5.0 and abs(y[0] + 1043020.3) < 5.0

    def test_cassini_soldner_trinidad(self):
        # Cassini-Soldner (EPSG method 9806): the IOGP Guidance Note
        # 7-2 worked example — Trinidad 1903, Clarke 1858 in Clarke's
        # links (1 link = 0.66 ft), origin 10d26'30"N 61d20'W,
        # FE/FN 430000/325000 links; test point 10dN 62dW ->
        # E 66644.94, N 82536.22 links.  Reproduced to <0.001 link
        # (~0.2 mm); plus the two structural equidistance properties
        # that DEFINE Cassini and machine-exact roundtrips.
        import math

        from gdal_boots_ray.kernels.crs import _MeridArc

        a_links = 20926348.0 / 0.66  # Clarke 1858 a (ft) -> links
        b_links = 20855233.0 / 0.66
        lat0 = 10 + 26 / 60 + 30 / 3600
        lon0 = -(61 + 20 / 60)
        crs = resolve_crs(
            f"+proj=cass +lat_0={lat0} +lon_0={lon0} "
            f"+x_0=430000 +y_0=325000 +a={a_links} +b={b_links}"
        )
        x, y = crs.from_lonlat(np.array([-62.0]), np.array([10.0]))
        assert abs(x[0] - 66644.94) < 1e-3
        assert abs(y[0] - 82536.22) < 1e-2
        lon2, lat2 = crs.to_lonlat(x, y)
        assert abs(lon2[0] + 62.0) < 1e-10 and abs(lat2[0] - 10.0) < 1e-9
        # equidistance along the central meridian: dN == meridian arc
        arc = _MeridArc(a_links, 1 - b_links / a_links)
        _, y1 = crs.from_lonlat(np.array([lon0]), np.array([12.0]))
        _, y2 = crs.from_lonlat(np.array([lon0]), np.array([10.0]))
        dM = float(
            arc.m(np.array([math.radians(12.0)]))[0]
            - arc.m(np.array([math.radians(10.0)]))[0]
        )
        assert abs((y1[0] - y2[0]) - dM) < 1e-6 * abs(dM)
        # roundtrip grid over the island domain
        lons = np.array([-62.0, -61.5, -61.0, -60.5])
        lats = np.array([10.0, 10.3, 10.7, 11.0])
        x, y = crs.from_lonlat(lons, lats)
        lon3, lat3 = crs.to_lonlat(x, y)
        assert np.abs(lon3 - lons).max() < 1e-9
        assert np.abs(lat3 - lats).max() < 1e-9

    def test_cassini_metric_roundtrip_random_params(self):
        # WGS84-based cass with random origins: forward/inverse must
        # round-trip tightly across a +/-3 degree window (Cassini is
        # a cadastral projection; the series is exact near the
        # central meridian)
        rng = np.random.default_rng(7)
        for _ in range(5):
            lat0 = float(rng.uniform(-60, 60))
            lon0 = float(rng.uniform(-180, 180))
            crs = resolve_crs(
                f"+proj=cass +lat_0={lat0} +lon_0={lon0} "
                f"+x_0=40000 +y_0=30000 +ellps=WGS84"
            )
            lons = lon0 + rng.uniform(-2, 2, 20)
            lats = np.clip(lat0 + rng.uniform(-3, 3, 20), -80, 80)
            x, y = crs.from_lonlat(lons, lats)
            lon2, lat2 = crs.to_lonlat(x, y)
            assert np.abs(lon2 - lons).max() < 1e-7
            assert np.abs(lat2 - lats).max() < 1e-7

    def test_equidistant_conic_invariants(self):
        # eqdc (Snyder 16-4..16-6): the two invariants that uniquely
        # pin the simple conic — scale EXACTLY 1 along both standard
        # parallels, and every meridian mapped at true arc length
        # (rho = a*G - M).  Plus machine-exact roundtrips and the
        # single-parallel (lat_1 == lat_2) limit n = sin(lat_1).
        import math

        from gdal_boots_ray.kernels.crs import _MeridArc

        crs = resolve_crs(
            "+proj=eqdc +lat_0=0 +lon_0=105 +lat_1=15 +lat_2=65 +ellps=WGS84"
        )
        a, f = 6378137.0, 1 / 298.257223563
        e2 = f * (2 - f)
        d = 1e-7
        for lat in (15.0, 65.0):
            phi = math.radians(lat)
            N = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
            x0, y0 = crs.from_lonlat(np.array([100.0]), np.array([lat]))
            x1, y1 = crs.from_lonlat(np.array([100.0 + d]), np.array([lat]))
            kp = math.hypot(x1[0] - x0[0], y1[0] - y0[0]) / (
                N * math.cos(phi) * math.radians(d)
            )
            assert abs(kp - 1.0) < 1e-6
        # meridians are true-length: straight-line distance along the
        # central meridian equals the meridian arc exactly
        arc = _MeridArc(a, f)
        _, ya = crs.from_lonlat(np.array([105.0]), np.array([10.0]))
        _, yb = crs.from_lonlat(np.array([105.0]), np.array([60.0]))
        dM = float(
            arc.m(np.array([math.radians(60.0)]))[0]
            - arc.m(np.array([math.radians(10.0)]))[0]
        )
        assert abs((yb[0] - ya[0]) - dM) < 1e-6
        lons = np.array([80.0, 105.0, 130.0, 95.0])
        lats = np.array([20.0, 35.0, 50.0, -5.0])
        x, y = crs.from_lonlat(lons, lats)
        lon2, lat2 = crs.to_lonlat(x, y)
        assert np.abs(lon2 - lons).max() < 1e-10
        assert np.abs(lat2 - lats).max() < 1e-10
        # single-parallel limit
        one = resolve_crs("+proj=eqdc +lat_1=40 +lat_2=40 +lon_0=0 +ellps=WGS84")
        x, y = one.from_lonlat(np.array([3.0]), np.array([42.0]))
        lon2, lat2 = one.to_lonlat(x, y)
        assert abs(lon2[0] - 3.0) < 1e-10 and abs(lat2[0] - 42.0) < 1e-10

    def test_bonne_invariants(self):
        # Bonne (EPSG method 9827): the equal-area pseudoconic of the
        # legacy French/Portuguese grids.  Pinned by its definition:
        # numeric areal scale == 1 everywhere, true scale along the
        # standard parallel, arc-true central meridian; roundtrips
        # machine-exact in both hemispheres.
        import math

        from gdal_boots_ray.kernels.crs import _MeridArc

        crs = resolve_crs("+proj=bonne +lat_1=45 +lon_0=3 +ellps=WGS84")
        a, f = 6378137.0, 1 / 298.257223563
        e2 = f * (2 - f)
        d = 1e-6
        for lo, la in [(3.0, 45.0), (-1.0, 48.0), (7.5, 42.0)]:
            phi = math.radians(la)
            Mr = a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
            Nr = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
            x0, y0 = crs.from_lonlat(np.array([lo]), np.array([la]))
            x1, y1 = crs.from_lonlat(np.array([lo + d]), np.array([la]))
            x2, y2 = crs.from_lonlat(np.array([lo]), np.array([la + d]))
            J = (x1[0] - x0[0]) * (y2[0] - y0[0]) - (x2[0] - x0[0]) * (y1[0] - y0[0])
            true_area = (Nr * math.cos(phi) * math.radians(d)) * (Mr * math.radians(d))
            assert abs(abs(J) / true_area - 1.0) < 1e-6
        arc = _MeridArc(a, f)
        _, ya = crs.from_lonlat(np.array([3.0]), np.array([42.0]))
        _, yb = crs.from_lonlat(np.array([3.0]), np.array([50.0]))
        dM = float(
            arc.m(np.array([math.radians(50.0)]))[0]
            - arc.m(np.array([math.radians(42.0)]))[0]
        )
        assert abs((yb[0] - ya[0]) - dM) < 1e-6
        lons = np.array([-5.0, 3.0, 9.0])
        lats = np.array([41.0, 46.0, 51.0])
        x, y = crs.from_lonlat(lons, lats)
        lon2, lat2 = crs.to_lonlat(x, y)
        assert np.abs(lon2 - lons).max() < 1e-10
        assert np.abs(lat2 - lats).max() < 1e-10
        south = resolve_crs("+proj=bonne +lat_1=-30 +lon_0=135 +ellps=WGS84")
        x, y = south.from_lonlat(np.array([140.0]), np.array([-25.0]))
        lon2, lat2 = south.to_lonlat(x, y)
        assert abs(lon2[0] - 140.0) < 1e-10 and abs(lat2[0] + 25.0) < 1e-10
        with pytest.raises(ValueError, match="bonne"):
            resolve_crs("+proj=bonne +lat_1=0 +ellps=WGS84")

    def test_epsg_from_crs_reverse_lookup(self):
        # reference epsg_from_srs analog (gdal.py:112-117)
        from gdal_boots_ray.kernels.crs import epsg_from_crs

        assert epsg_from_crs(4326) == 4326
        assert epsg_from_crs("epsg:3857") == 3857
        assert epsg_from_crs("+proj=longlat +ellps=WGS84 +no_defs") == 4326
        assert epsg_from_crs("+proj=utm +zone=31 +ellps=WGS84 +units=m +no_defs") == 32631
        assert epsg_from_crs("+proj=utm +zone=20 +south +ellps=WGS84") == 32720
        assert (
            epsg_from_crs(
                "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 "
                "+x_0=0 +y_0=0 +ellps=GRS80 +units=m +no_defs"
            )
            == 5070
        )
        with pytest.raises(ValueError, match="Could not get epsg code"):
            epsg_from_crs("+proj=aea +lat_0=-32 +lon_0=-60 +lat_1=-5 +lat_2=-42 +ellps=aust_SA")

    def test_datum_shifted_epsg_rejected_with_hint(self):
        for code in (27700, 23030, 31370):
            with pytest.raises(ValueError, match="proj4"):
                resolve_crs(code)


class TestWorldAndAzimuthal:
    """Mollweide / Robinson / Miller world projections and the
    spherical azimuthal family (ortho / gnom / aeqd), each pinned by
    its DEFINING invariant rather than self-derived constants."""

    def test_mollweide_invariants(self):
        import math

        a = 6378137.0
        crs = resolve_crs("+proj=moll +lon_0=0 +a=6378137")
        # outline anchors: pole at sqrt(2)*a, equatorial edge at
        # 2*sqrt(2)*a — the 2:1 ellipse that DEFINES Mollweide
        _, yp = crs.from_lonlat(np.array([0.0]), np.array([90.0]))
        assert abs(yp[0] - math.sqrt(2) * a) < 1e-6
        xe, _ = crs.from_lonlat(np.array([180.0]), np.array([0.0]))
        assert abs(xe[0] - 2 * math.sqrt(2) * a) < 1e-6
        # equal-area: numeric Jacobian == a^2 cos(phi) everywhere
        d = 1e-6
        for lo, la in [(0.0, 0.0), (40.0, 35.0), (-120.0, -60.0), (10.0, 80.0)]:
            x0, y0 = crs.from_lonlat(np.array([lo]), np.array([la]))
            x1, y1 = crs.from_lonlat(np.array([lo + d]), np.array([la]))
            x2, y2 = crs.from_lonlat(np.array([lo]), np.array([la + d]))
            J = (x1[0] - x0[0]) * (y2[0] - y0[0]) - (x2[0] - x0[0]) * (y1[0] - y0[0])
            true_area = a * a * math.cos(math.radians(la)) * math.radians(d) ** 2
            assert abs(abs(J) / true_area - 1.0) < 1e-5
        lons = np.array([-170.0, -45.0, 0.0, 60.0, 179.0])
        lats = np.array([-85.0, -30.0, 0.0, 45.0, 85.0])
        x, y = crs.from_lonlat(lons, lats)
        lon2, lat2 = crs.to_lonlat(x, y)
        assert np.abs(lon2 - lons).max() < 1e-9
        assert np.abs(lat2 - lats).max() < 1e-9
        # ESRI WKID routes through the same kernel, key preserved
        esri = resolve_crs(54009)
        assert esri.key == 54009
        xw, yw = esri.from_lonlat(np.array([10.0]), np.array([50.0]))
        xp, yp2 = crs.from_lonlat(np.array([10.0]), np.array([50.0]))
        assert abs(xw[0] - xp[0]) < 1e-6 and abs(yw[0] - yp2[0]) < 1e-6

    def test_robinson_published_table_nodes(self):
        import math

        from gdal_boots_ray.kernels.crs import _ROBIN_X, _ROBIN_Y

        a = 6378137.0
        crs = resolve_crs(54030)  # World Robinson
        # at every 5-degree node the published 1974 table IS the map
        for i, lat in enumerate(range(0, 95, 5)):
            x, y = crs.from_lonlat(np.array([30.0]), np.array([float(lat)]))
            assert abs(y[0] - 1.3523 * a * _ROBIN_Y[i]) < 1e-6
            assert abs(x[0] - 0.8487 * a * _ROBIN_X[i] * math.radians(30.0)) < 1e-6
        # southern hemisphere: odd symmetry in y, even in x
        xn, yn = crs.from_lonlat(np.array([25.0]), np.array([37.3]))
        xs, ys = crs.from_lonlat(np.array([25.0]), np.array([-37.3]))
        assert abs(xn[0] - xs[0]) < 1e-9 and abs(yn[0] + ys[0]) < 1e-9
        # roundtrip incl. off-node latitudes (spline-inverse path)
        lons = np.array([-150.0, -60.0, 0.0, 33.0, 178.0])
        lats = np.array([-88.7, -42.2, 0.0, 12.34, 67.89])
        x, y = crs.from_lonlat(lons, lats)
        lon2, lat2 = crs.to_lonlat(x, y)
        assert np.abs(lon2 - lons).max() < 1e-8
        assert np.abs(lat2 - lats).max() < 1e-8

    def test_miller_snyder_example(self):
        # Snyder (PP 1395) Miller numerical example: R = 1, phi = 50N
        # -> y = 0.9536371
        crs = resolve_crs("+proj=mill +R=1")
        x, y = crs.from_lonlat(np.array([-75.0]), np.array([50.0]))
        assert abs(y[0] - 0.9536371) < 5e-7
        import math

        assert abs(x[0] - math.radians(-75.0)) < 1e-12  # x = R * lam
        crs54003 = resolve_crs(54003)
        lons = np.array([-179.0, -10.0, 0.0, 120.0])
        lats = np.array([-89.0, -45.0, 0.0, 72.0])
        xx, yy = crs54003.from_lonlat(lons, lats)
        lon2, lat2 = crs54003.to_lonlat(xx, yy)
        assert np.abs(lon2 - lons).max() < 1e-9
        assert np.abs(lat2 - lats).max() < 1e-9

    def test_orthographic_snyder_example(self):
        import math

        # Snyder (PP 1395, ch. 20) worked geometry: center 40N 100W,
        # point 30N 110W -> x = -0.1503837, y = -0.1651911 (R = 1)
        crs = resolve_crs("+proj=ortho +lat_0=40 +lon_0=-100 +R=1")
        x, y = crs.from_lonlat(np.array([-110.0]), np.array([30.0]))
        assert abs(x[0] + 0.1503837) < 5e-7
        assert abs(y[0] + 0.1651911) < 5e-7
        # defining invariant: rho = R sin(c), c = angular distance
        rng = np.random.default_rng(7)
        lons = -100.0 + rng.uniform(-80, 80, 32)
        lats = 40.0 + rng.uniform(-45, 45, 32)
        xx, yy = crs.from_lonlat(lons, lats)
        sp0, cp0 = math.sin(math.radians(40)), math.cos(math.radians(40))
        cosc = sp0 * np.sin(np.radians(lats)) + cp0 * np.cos(np.radians(lats)) * np.cos(
            np.radians(lons + 100.0)
        )
        vis = cosc >= 0
        assert vis.all()
        assert np.abs(np.hypot(xx, yy) - np.sqrt(1 - cosc**2)).max() < 1e-12
        lon2, lat2 = crs.to_lonlat(xx, yy)
        assert np.abs(lon2 - lons).max() < 1e-7
        assert np.abs(lat2 - lats).max() < 1e-7
        # far hemisphere is undefined -> NaN
        xf, yf = crs.from_lonlat(np.array([80.0]), np.array([-40.0]))
        assert np.isnan(xf[0]) and np.isnan(yf[0])

    def test_gnomonic_great_circles_are_straight(self):
        # THE gnomonic property: any great circle maps to a straight
        # line.  Take random great-circle arcs through the visible
        # hemisphere and check exact collinearity of 3 samples.
        crs = resolve_crs("+proj=gnom +lat_0=35 +lon_0=20 +R=1")
        rng = np.random.default_rng(11)

        def unit(v):
            return v / np.linalg.norm(v)

        center = unit(
            np.array(
                [
                    np.cos(np.radians(35)) * np.cos(np.radians(20)),
                    np.cos(np.radians(35)) * np.sin(np.radians(20)),
                    np.sin(np.radians(35)),
                ]
            )
        )
        for _ in range(16):
            a3 = unit(center + 0.35 * rng.standard_normal(3))
            b3 = unit(center + 0.35 * rng.standard_normal(3))
            pts = []
            for t in (0.0, 0.5, 1.0):  # slerp samples on the great circle
                w = unit((1 - t) * a3 + t * b3)
                lon = np.degrees(np.arctan2(w[1], w[0]))
                lat = np.degrees(np.arcsin(w[2]))
                x, y = crs.from_lonlat(np.array([lon]), np.array([lat]))
                pts.append((x[0], y[0]))
            (x1, y1), (x2, y2), (x3, y3) = pts
            cross = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
            span = max(abs(x3 - x1), abs(y3 - y1), 1e-9)
            assert abs(cross) / (span * span) < 1e-9
        # roundtrip + horizon NaN
        lons = np.array([10.0, 40.0, 22.0])
        lats = np.array([20.0, 55.0, 33.0])
        x, y = crs.from_lonlat(lons, lats)
        lon2, lat2 = crs.to_lonlat(x, y)
        assert np.abs(lon2 - lons).max() < 1e-8
        assert np.abs(lat2 - lats).max() < 1e-8
        xh, _ = crs.from_lonlat(np.array([-160.0]), np.array([-35.0]))
        assert np.isnan(xh[0])

    def test_aeqd_distance_invariant(self):
        import math

        # spherical: rho IS the great-circle distance from the center
        R = 6370997.0
        crs = resolve_crs(f"+proj=aeqd +lat_0=40 +lon_0=-100 +R={R}")
        rng = np.random.default_rng(3)
        lons = rng.uniform(-179, 179, 48)
        lats = rng.uniform(-89, 89, 48)
        xx, yy = crs.from_lonlat(lons, lats)
        sp0, cp0 = math.sin(math.radians(40)), math.cos(math.radians(40))
        cosc = np.clip(
            sp0 * np.sin(np.radians(lats))
            + cp0 * np.cos(np.radians(lats)) * np.cos(np.radians(lons + 100.0)),
            -1,
            1,
        )
        assert np.abs(np.hypot(xx, yy) - R * np.arccos(cosc)).max() < 1e-6
        lon2, lat2 = crs.to_lonlat(xx, yy)
        dlon = ((lon2 - lons + 180) % 360) - 180
        assert np.abs(dlon).max() < 1e-6
        assert np.abs(lat2 - lats).max() < 1e-7

    def test_aeqd_polar_ellipsoidal(self):
        import math

        from gdal_boots_ray.kernels.crs import _MeridArc

        # ellipsoidal NORTH polar aspect: rho = Mp - M(phi) exactly
        crs = resolve_crs("+proj=aeqd +lat_0=90 +lon_0=0 +ellps=WGS84")
        arc = _MeridArc(6378137.0, 1 / 298.257223563)
        Mp = float(arc.m(np.array([math.pi / 2]))[0])
        for lo, la in [(0.0, 70.0), (45.0, 80.0), (-130.0, 55.0)]:
            x, y = crs.from_lonlat(np.array([lo]), np.array([la]))
            M = float(arc.m(np.array([math.radians(la)]))[0])
            assert abs(math.hypot(x[0], y[0]) - (Mp - M)) < 1e-6
            lon2, lat2 = crs.to_lonlat(x, y)
            assert abs(lon2[0] - lo) < 1e-9 and abs(lat2[0] - la) < 1e-9
        # south polar aspect roundtrips too
        south = resolve_crs("+proj=aeqd +lat_0=-90 +lon_0=0 +ellps=WGS84")
        x, y = south.from_lonlat(np.array([100.0]), np.array([-75.0]))
        lon2, lat2 = south.to_lonlat(x, y)
        assert abs(lon2[0] - 100.0) < 1e-9 and abs(lat2[0] + 75.0) < 1e-9
        # oblique ellipsoidal: documented geodesic seam
        with pytest.raises(ValueError, match="aeqd"):
            resolve_crs("+proj=aeqd +lat_0=40 +lon_0=-100 +ellps=WGS84")

    def test_eckert4_invariants(self):
        import math

        a = 6378137.0
        crs = resolve_crs(54012)  # World Eckert IV
        # equal-area: numeric Jacobian == a^2 cos(phi)
        d = 1e-6
        for lo, la in [(0.0, 0.0), (60.0, 40.0), (-130.0, -70.0), (20.0, 85.0)]:
            x0, y0 = crs.from_lonlat(np.array([lo]), np.array([la]))
            x1, y1 = crs.from_lonlat(np.array([lo + d]), np.array([la]))
            x2, y2 = crs.from_lonlat(np.array([lo]), np.array([la + d]))
            J = (x1[0] - x0[0]) * (y2[0] - y0[0]) - (x2[0] - x0[0]) * (y1[0] - y0[0])
            true_area = a * a * math.cos(math.radians(la)) * math.radians(d) ** 2
            assert abs(abs(J) / true_area - 1.0) < 1e-5
        # published outline constants (Snyder ch. 32): pole at
        # 2 sqrt(pi/(4+pi)) a, equator edge at 4/sqrt(4 pi + pi^2) a pi
        _, yp = crs.from_lonlat(np.array([0.0]), np.array([90.0]))
        assert abs(yp[0] - 2 * math.sqrt(math.pi / (4 + math.pi)) * a) < 1e-6
        xe, _ = crs.from_lonlat(np.array([180.0]), np.array([0.0]))
        assert abs(xe[0] - (4 / math.sqrt(4 * math.pi + math.pi**2)) * a * math.pi) < 1e-6
        # pole line is HALF the equator line (the Eckert IV signature)
        xp, _ = crs.from_lonlat(np.array([180.0]), np.array([90.0]))
        assert abs(xp[0] - xe[0] / 2.0) < 1e-6
        lons = np.array([-170.0, -45.0, 0.0, 60.0, 179.0])
        lats = np.array([-85.0, -30.0, 0.0, 45.0, 85.0])
        x, y = crs.from_lonlat(lons, lats)
        lon2, lat2 = crs.to_lonlat(x, y)
        assert np.abs(lon2 - lons).max() < 1e-8
        assert np.abs(lat2 - lats).max() < 1e-8
