"""Raster kernel goldens ported from the reference suite: fast_warp
snapping (test_raster.py:309-365), union mosaic (:628-645), warp-extra
mosaics (:178-227), cutline histogram (:230-281), values_by_points
(:648-677), rasterize (test_vector.py:83-98)."""

import numpy as np
import pytest

from gdal_boots_ray.kernels.affine import Affine, bounds as bounds_fn
from gdal_boots_ray.kernels.png import png_decode, png_encode, psnr, raw_decode, raw_encode
from gdal_boots_ray.kernels.rasterize import rasterize
from gdal_boots_ray.kernels.sampling import values_by_points
from gdal_boots_ray.kernels.warp import WarpSource, crop_by_geometry, union_mosaic, warp
from gdal_boots_ray.kernels.window import fast_warp_as_array


def _gt(res, x0, y0):
    return np.array([res, 0.0, x0, 0.0, -res, y0])


class TestFastWarp:
    """tests/test_raster.py:309-365 snap semantics, synthetic rasters
    reproducing the Sentinel-2 B02/B09 grids."""

    # bbox of 35UNV_field_small in EPSG:32635-like coords (taken from the
    # asserted golden outputs, not the fixture file)
    BBOX = [509040.5, 5946041.0, 5_09129.1, 5946119.2]

    def test_10m(self):
        # 10m grid anchored like B02_10m: origin (499980, 6000000), 10980px
        img = np.arange(200 * 200, dtype=np.uint16).reshape(200, 200)
        gt = _gt(10.0, 508000.0, 5947000.0)
        bbox = [509042.0, 5946041.0, 509128.0, 5946118.0]
        out, gi = fast_warp_as_array(img, gt, 32635, bbox)
        assert out.shape == (8, 9)
        b = bounds_fn(np.asarray(tuple(gi.transform)), out.shape[1], out.shape[0])[0]
        assert np.all(b == [509040.0, 5946040.0, 509130.0, 5946120.0])
        assert out.dtype == img.dtype
        # the slice view must alias the source (zero copy)
        assert np.shares_memory(out, img)

    def test_60m(self):
        img = np.arange(100 * 100, dtype=np.uint16).reshape(100, 100)
        gt = _gt(60.0, 506400.0, 5948000.0)
        bbox = [509042.0, 5946041.0, 509128.0, 5946118.0]
        out, gi = fast_warp_as_array(img, gt, 32635, bbox)
        assert out.shape == (2, 2)
        b = bounds_fn(np.asarray(tuple(gi.transform)), 2, 2)[0]
        assert np.all(b == [509040.0, 5946000.0, 509160.0, 5946120.0])

    def test_bbox_validation(self):
        img = np.zeros((10, 10), dtype=np.uint8)
        gt = _gt(10.0, 0.0, 100.0)
        with pytest.raises(ValueError):
            fast_warp_as_array(img, gt, 4326, [50, 50, 40, 60])  # malformed
        with pytest.raises(ValueError):
            fast_warp_as_array(img, gt, 4326, [-5, 5, 50, 50])  # outside


class TestUnionMosaic:
    """tests/test_raster.py:628-645 pixel-exact union goldens."""

    def _src(self, gt, vals):
        return WarpSource(np.asarray(vals), np.asarray(gt), 32628)

    def test_two_way(self):
        ds1 = self._src(_gt(10, 0, 0), np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]]).T)
        ds2 = self._src(_gt(10, 10, 0), np.array([[4, 5, 6], [7, 8, 9], [1, 2, 3]]).T)
        img, gi = union_mosaic([ds2, ds1])  # others first, self last
        assert img.shape == (1, 3, 4)
        assert np.array_equal(img[0], np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9], [1, 2, 3]]).T)

    def test_three_way(self):
        ds1 = self._src(_gt(10, 0, 0), np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]]).T)
        ds2 = self._src(_gt(10, 10, 0), np.array([[4, 5, 6], [7, 8, 9], [1, 2, 3]]).T)
        ds3 = self._src(_gt(10, 0, 10), np.array([[3, 1, 2], [6, 4, 5], [9, 7, 8]]).T)
        img, gi = union_mosaic([ds2, ds3, ds1])
        assert img.shape == (1, 4, 4)
        assert np.array_equal(img[0], np.array([[3, 1, 2, 3], [6, 4, 5, 6], [9, 7, 8, 9], [0, 1, 2, 3]]).T)


class TestWarpExtra:
    """tests/test_raster.py:178-227."""

    def test_simple(self):
        ds1 = WarpSource(np.full((100, 100), 1, np.uint8), _gt(100, 0, 10000), 3857)
        ds2 = WarpSource(np.full((100, 100), 2, np.uint8), _gt(100, 10000, 10000), 3857)
        img, gi = warp([ds2, ds1])
        assert img.shape == (1, 100, 200)
        assert np.all(np.unique(img) == [1, 2])

    def test_multiband(self):
        a = np.empty((2, 100, 100), np.uint8)
        a[0], a[1] = 1, 2
        b = np.empty((2, 100, 100), np.uint8)
        b[0], b[1] = 3, 4
        ds1 = WarpSource(a, _gt(100, 0, 10000), 3857)
        ds2 = WarpSource(b, _gt(100, 10000, 10000), 3857)
        img, _ = warp([ds2, ds1])
        assert img.shape == (2, 100, 200)
        assert np.all(np.unique(img[0]) == [1, 3])
        assert np.all(np.unique(img[1]) == [2, 4])

    def test_multiband_offset_nodata(self):
        # tests/test_raster.py:209-227: diagonal offset, nodata 255 fill
        a = np.empty((2, 517, 516), np.uint8)
        a[0], a[1] = 1, 2
        b = np.empty((2, 517, 516), np.uint8)
        b[0], b[1] = 3, 4
        gt1 = np.array([61.8, 0, 2584541.63, 0, -61.8, 6413432.68])
        gt2 = np.array([61.8, 0, 2585456.81, 0, -61.8, 6444559.47])
        ds1 = WarpSource(a, gt1, 3857, nodata=255)
        ds2 = WarpSource(b, gt2, 3857, nodata=255)
        img, _ = warp([ds2, ds1], dst_nodata=255)
        assert np.all(np.unique(img[0]) == [1, 3, 255])
        assert np.all(np.unique(img[1]) == [2, 4, 255])


class TestCutline:
    """tests/test_raster.py:230-281 exact histogram golden."""

    CUTLINE = {
        "type": "Polygon",
        "coordinates": [
            [
                [2332115.0, 6854380.0],
                [2323410.0, 6838275.0],
                [2333276.0, 6826088.0],
                [2336178.0, 6842628.0],
                [2354748.0, 6831021.0],
                [2352572.0, 6850607.0],
                [2332115.0, 6854380.0],
            ]
        ],
    }

    def test_cutline_golden(self):
        img = np.array([[32, 64], [128, 255]], np.uint8).repeat(200, axis=0).repeat(200, axis=1)
        src = WarpSource(img, _gt(100, 2320000, 6860000), 3857, nodata=0)
        out, gi = warp([src], resampling="near", cutline=self.CUTLINE, dst_nodata=0)
        assert out.shape == (1, 282, 312)
        values, counts = np.unique(out, return_counts=True)
        assert np.all(values == [0, 32, 64, 128, 255])
        assert np.all(counts == [41494, 15742, 15412, 9333, 6003])


class TestRasterize:
    def test_basic_golden(self):
        # tests/test_vector.py:83-98
        geometry = {
            "type": "Polygon",
            "coordinates": [[[0.6, 1.0], [0.6, 0.75], [0.0, 0.75], [0.0, 1.0], [0.6, 1.0]]],
        }
        gt = np.array([0.01, 0, 0, 0, -0.01, 1.0])
        mask = rasterize(geometry, (100, 100), gt)
        assert mask[:25, :60].all()
        assert mask[26:, :].sum() == 0 and mask[:, 61:].sum() == 0
        mask_at = rasterize(geometry, (100, 100), gt, all_touched=True)
        assert mask_at[:25, :60].all()

    def test_hole(self):
        geometry = {
            "type": "Polygon",
            "coordinates": [
                [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
                [[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]],
            ],
        }
        gt = np.array([1.0, 0, 0, 0, -1.0, 10.0])
        mask = rasterize(geometry, (10, 10), gt)
        assert mask.sum() == 100 - 16
        assert mask[4, 4] == 0 and mask[0, 0] == 1


class TestValuesByPoints:
    """tests/test_raster.py:648-677 parametrized goldens."""

    def _ds(self):
        img = np.arange(1, 16, dtype=np.int64).reshape(3, 5)
        # set_bounds [(0,0),(5,3)] -> res 1, origin top-left (0, 3)
        gt = np.array([1.0, 0, 0, 0, -1.0, 3.0])
        return img, gt

    @pytest.mark.parametrize(
        "points,expected",
        [
            [[], []],
            [[{"type": "Point", "coordinates": [0, 0]}], [None]],
            [[{"type": "Point", "coordinates": [-1, -1]}], [None]],
            [[{"type": "Point", "coordinates": [0, 0.1]}], [11]],
            [[{"type": "Point", "coordinates": [0.2, 2.5]}], [1]],
            [[{"type": "Point", "coordinates": [2.9, 4.9]}], [None]],
            [[{"type": "Point", "coordinates": [3, 4.9]}], [None]],
            [[{"type": "Point", "coordinates": [2.9, 5]}], [None]],
            [[{"type": "Point", "coordinates": [3, 5]}], [None]],
            [
                [{"type": "Point", "coordinates": c} for c in [[0.2, 2.5], [0, 0.1], [10, 10]]],
                [1, 11, None],
            ],
        ],
    )
    def test_goldens(self, points, expected):
        img, gt = self._ds()
        assert values_by_points(img, gt, points) == expected

    def test_multiband(self):
        img = np.arange(1, 31, dtype=np.int64).reshape(2, 3, 5)
        gt = np.array([1.0, 0, 0, 0, -1.0, 3.0])
        (val,) = values_by_points(img, gt, [{"type": "Point", "coordinates": [0.2, 2.5]}])
        assert np.array_equal(val, np.array([1, 16]))


class TestCropByGeometry:
    GEOM = {
        "type": "Polygon",
        "coordinates": [
            [
                [-62.403073310852044, -34.02648590051866],
                [-62.40650653839111, -34.03818674708322],
                [-62.398738861083984, -34.03943142302355],
                [-62.395563125610344, -34.02780188173055],
                [-62.403073310852044, -34.02648590051866],
            ]
        ],
    }
    GT1 = np.array([10.000000005946216, 0.0, 554680.0000046358, 0.0, -10.000000003180787, 6234399.99998708])
    GT2 = np.array([10.000000005946317, 0.0, 554680.0000046354, 0.0, -10.00000000318243, 6245339.999990689])

    def _sources(self):
        rng = np.random.default_rng(31415926)
        ds1 = WarpSource(rng.integers(64, 128, (1134, 1134)).astype(np.uint8), self.GT1, 32720)
        ds2 = WarpSource(rng.integers(128, 192, (1134, 1134)).astype(np.uint8), self.GT2, 32720)
        return ds1, ds2

    def test_resolution_ratio(self):
        # tests/test_raster.py:464-469: res (100,100) is 10x smaller
        ds1, ds2 = self._sources()
        img, gi, mask = crop_by_geometry(ds1, self.GEOM, extra=[ds2])
        img100, _, _ = crop_by_geometry(ds1, self.GEOM, extra=[ds2], resolution=(100, 100))
        assert np.all(np.round(np.array(img.shape[1:]) / 10) == np.array(img100.shape[1:]))
        assert mask.min() == 0 and mask.max() == 1

    def test_out_crs(self):
        ds1, _ = self._sources()
        img, gi, mask = crop_by_geometry(ds1, self.GEOM, out_crs=3857)
        assert gi.epsg == 3857
        assert img.shape[1] > 0 and img.shape[2] > 0

    def test_crop_by_3857_geometry(self):
        from gdal_boots_ray.kernels.geometry import transform_geojson

        ds1, _ = self._sources()
        g3857 = transform_geojson(self.GEOM, 4326, 3857)
        img_a, _, _ = crop_by_geometry(ds1, self.GEOM)
        img_b, _, _ = crop_by_geometry(ds1, g3857, geometry_crs=3857)
        assert img_a.shape == img_b.shape

    def test_degenerate_raises(self):
        ds1, _ = self._sources()
        tiny = {
            "type": "Polygon",
            "coordinates": [
                [
                    [-62.4001, -34.0330],
                    [-62.40011, -34.0330],
                    [-62.40011, -34.03301],
                    [-62.4001, -34.0330],
                ]
            ],
        }
        with pytest.raises(RuntimeError):
            crop_by_geometry(ds1, tiny)

    def test_custom_proj4_no_mask(self):
        # tests/test_raster.py:489-500
        aea = "+proj=aea +lat_0=-32 +lon_0=-60 +lat_1=-5 +lat_2=-42 +x_0=0 +y_0=0 +ellps=aust_SA +units=m +no_defs"
        ds1, ds2 = self._sources()
        img, gi, mask = crop_by_geometry(ds1, self.GEOM, extra=[ds2], out_crs=aea, apply_mask=False)
        assert gi.proj4
        assert 64 <= img.min() and img.max() <= 191
        assert (mask.min(), mask.max()) == (0, 1)


class TestResamplers:
    def test_average_sum_downscale(self):
        img = np.arange(16, dtype=np.float64).reshape(4, 4)
        src = WarpSource(img, _gt(1, 0, 4), 3857)
        for alg, expect in [
            ("average", np.array([[2.5, 4.5], [10.5, 12.5]])),
            ("sum", np.array([[10, 18], [42, 50]])),
            ("min", np.array([[0, 2], [8, 10]])),
            ("max", np.array([[5, 7], [13, 15]])),
        ]:
            out, _ = warp([src], resolution=(2, 2), resampling=alg, dtype=np.float64)
            assert np.allclose(out[0], expect), alg

    def test_bilinear_identity(self):
        img = np.arange(16, dtype=np.float64).reshape(4, 4)
        src = WarpSource(img, _gt(1, 0, 4), 3857)
        out, _ = warp([src], resampling="bilinear", dtype=np.float64)
        assert np.allclose(out[0], img)


def test_png_roundtrip_and_psnr():
    rng = np.random.default_rng(31415926)
    img = rng.integers(0, 255, size=(3, 64, 64), dtype=np.uint8)
    data = png_encode(img, zlevel=9)
    out = png_decode(data)
    assert np.array_equal(out, img)
    assert psnr(out, img) == float("inf")
    raw = raw_encode(img)
    assert np.array_equal(raw_decode(raw), img)


class TestCubicResampling:
    def test_cubic_beats_bilinear_on_smooth_fields(self):
        h, w = 32, 32
        y, x = np.mgrid[0:h, 0:w]
        img = (0.05 * (x - 16.0) ** 2 + 0.08 * (y - 12.0) ** 2).astype(np.float64)
        src = WarpSource(img, np.array([4.0, 0, 0, 0, -4.0, h * 4.0]), 3857)

        def err(alg):
            out, _ = warp([src], resolution=(1.0, 1.0), resampling=alg, dtype=np.float64)
            fy, fx = np.mgrid[0 : h * 4, 0 : w * 4]
            tx = (fx + 0.5) / 4 - 0.5
            ty = (fy + 0.5) / 4 - 0.5
            truth = 0.05 * (tx - 16.0) ** 2 + 0.08 * (ty - 12.0) ** 2
            inner = (slice(8, -8), slice(8, -8))
            return np.abs(out[0][inner] - truth[inner]).mean()

        e_n, e_b, e_c = err("near"), err("bilinear"), err("cubic")
        assert e_c < e_b < e_n
        assert e_c < 1e-9  # cubic convolution is exact for quadratics

    def test_cubic_constant_exact_uint8(self):
        const = WarpSource(np.full((8, 8), 7, np.uint8), np.array([1.0, 0, 0, 0, -1.0, 8.0]), 3857)
        out, _ = warp([const], resolution=(0.5, 0.5), resampling="cubic")
        assert np.all(out == 7)


class TestWarpResolutionRatio:
    def test_resolution_and_width_height(self):
        # reference tests/test_raster.py:288-303: warp at (10,10) vs
        # (100,100) -> shapes differ by exactly 10x (rounded)
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (1098, 1098)).astype(np.uint8)
        src = WarpSource(img, np.array([10.0, 0, 600000.0, 0, -10.0, 5700000.0]), 32631)
        bbox = (601000.0, 5690000.0 + 1000.0, 606000.0, 5697000.0)
        w10, gi10 = warp([src], bbox=bbox, bbox_crs=32631, resolution=(10, 10))
        assert (gi10.transform.a, -gi10.transform.e) == (10, 10)
        w100, gi100 = warp([src], bbox=bbox, bbox_crs=32631, resolution=(100, 100))
        assert (gi100.transform.a, -gi100.transform.e) == (100, 100)
        assert all(np.round(np.array(w10.shape[1:]) / 10) == np.array(w100.shape[1:]))
        # explicit width/height derive the resolution
        wh, gih = warp([src], bbox=bbox, bbox_crs=32631, width=50, height=70)
        assert wh.shape[1:] == (70, 50)


class TestWindowedResamplers:
    """Lanczos (a=3) + cubic B-spline resampling kernels."""

    def test_partition_of_unity(self):
        import numpy as np

        from gdal_boots_ray.kernels.warp import bspline_weights, lanczos3_weights

        t = np.linspace(0, 1, 33)
        assert np.allclose(bspline_weights(t).sum(axis=0), 1.0, atol=1e-12)
        assert np.allclose(lanczos3_weights(t).sum(axis=0), 1.0, atol=1e-12)

    def test_constant_preserved(self):
        import numpy as np

        from gdal_boots_ray.kernels.warp import WarpSource, warp

        img = np.full((16, 16), 77, np.uint8)
        gt = np.array([10.0, 0, 0, 0, -10.0, 160.0])
        for rs in ("cubicspline", "lanczos"):
            out, _ = warp(
                [WarpSource(img[None], gt, 3857)], resolution=(20.0, 20.0), resampling=rs, dtype=np.float64
            )
            assert np.allclose(out, 77, atol=1e-9), rs

    def test_lanczos_reproduces_linear_ramp(self):
        import numpy as np

        from gdal_boots_ray.kernels.warp import WarpSource, warp

        ramp = np.tile(np.arange(32, dtype=np.float64), (32, 1))
        out, _ = warp(
            [WarpSource(ramp[None], np.array([10.0, 0, 0, 0, -10.0, 320.0]), 3857)],
            resolution=(20.0, 20.0),
            resampling="lanczos",
            dtype=np.float64,
        )
        expect = np.tile(np.arange(16) * 2 + 0.5, (16, 1))
        assert np.abs(out[0][4:-4, 4:-4] - expect[4:-4, 4:-4]).max() < 1e-9

    def test_windowed_resamplers_mask_nodata(self):
        # a nodata tap must neither blend into the output nor mark the
        # pixel painted (same contract as the bilinear 4-corner mask)
        import numpy as np

        from gdal_boots_ray.kernels.warp import WarpSource, warp

        img = np.full((16, 16), 80.0)
        img[:, 8:] = 255.0  # nodata half
        gt = np.array([10.0, 0, 0, 0, -10.0, 160.0])
        for rs in ("cubic", "cubicspline", "lanczos"):
            out, _ = warp(
                [WarpSource(img[None], gt, 3857, nodata=255.0)],
                resolution=(10.0, 10.0),
                resampling=rs,
                dtype=np.float64,
                dst_nodata=255.0,
            )
            vals = np.unique(out[0])
            # every pixel is either clean 80 or untouched fill 255 —
            # no blended values in between
            assert set(np.round(vals, 6)) <= {80.0, 255.0}, (rs, vals)
            assert (out[0] == 255.0).any(), rs
            assert np.isclose(out[0], 80.0).any(), rs

    def test_cubicspline_smooths_impulse(self):
        import numpy as np

        from gdal_boots_ray.kernels.warp import WarpSource, warp

        img = np.zeros((16, 16), np.float64)
        img[8, 8] = 100.0
        out, _ = warp(
            [WarpSource(img[None], np.array([10.0, 0, 0, 0, -10.0, 160.0]), 3857)],
            resolution=(10.0, 10.0),
            resampling="cubicspline",
            dtype=np.float64,
        )
        # B-spline smoothing spreads the impulse: peak strictly below input
        assert out[0].max() < 100.0
        assert np.isclose(out[0].sum(), 100.0, atol=1e-6)  # mass preserved
