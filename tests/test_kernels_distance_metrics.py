"""Kernels added for the gdaldem/gdal_proximity/OGR-accessor family:
exact squared EDT (kernels/distance.py) and ring metrics
(kernels/geometry.ring_metrics)."""

import numpy as np
import pytest

from gdal_boots_ray.kernels.cells import geohash_encode, hilbert_xy2d, morton_interleave2
from gdal_boots_ray.kernels.distance import edt_squared, nearest_feature
from gdal_boots_ray.kernels.geometry import ring_metrics


def _brute_edt2(target: np.ndarray) -> np.ndarray:
    h, w = target.shape
    ty, tx = np.nonzero(target)
    ys, xs = np.mgrid[0:h, 0:w]
    d2 = (
        (ys.reshape(-1, 1) - ty.reshape(1, -1)) ** 2
        + (xs.reshape(-1, 1) - tx.reshape(1, -1)) ** 2
    ).min(axis=1)
    return d2.reshape(h, w).astype(np.int64)


class TestEdtSquared:
    def test_matches_brute_force_random(self):
        rng = np.random.default_rng(7)
        for density in (0.02, 0.2, 0.7):
            for shape in ((1, 1), (1, 17), (13, 1), (9, 11), (32, 48)):
                t = rng.random(shape) < density
                if not t.any():
                    t.flat[int(rng.integers(t.size))] = True
                got = edt_squared(t)
                assert got.dtype == np.int64
                np.testing.assert_array_equal(got, _brute_edt2(t))

    def test_single_target_corner(self):
        t = np.zeros((5, 7), bool)
        t[0, 0] = True
        got = edt_squared(t)
        assert got[0, 0] == 0
        assert got[4, 6] == 16 + 36

    def test_all_targets_zero(self):
        assert edt_squared(np.ones((4, 4), bool)).max() == 0

    def test_no_target_is_minus_one(self):
        assert (edt_squared(np.zeros((3, 3), bool)) == -1).all()


def _brute_nearest(target: np.ndarray):
    """(d2, src) under the (d2, then linear index) total order."""
    h, w = target.shape
    ty, tx = np.nonzero(target)
    idx = ty * w + tx
    ys, xs = np.mgrid[0:h, 0:w]
    d2 = (ys.reshape(-1, 1) - ty.reshape(1, -1)) ** 2 + (
        xs.reshape(-1, 1) - tx.reshape(1, -1)
    ) ** 2
    key = d2.astype(np.int64) * (1 << 20) + idx.reshape(1, -1)
    best = key.min(axis=1)
    return (best >> 20).reshape(h, w), (best & ((1 << 20) - 1)).reshape(h, w)


class TestNearestFeature:
    def test_matches_brute_force_including_ties(self):
        rng = np.random.default_rng(11)
        for density in (0.05, 0.3):
            for shape in ((1, 9), (7, 1), (8, 8), (17, 23)):
                t = rng.random(shape) < density
                if not t.any():
                    t.flat[int(rng.integers(t.size))] = True
                d2, src = nearest_feature(t)
                bd2, bsrc = _brute_nearest(t)
                np.testing.assert_array_equal(d2, bd2)
                np.testing.assert_array_equal(src, bsrc)

    def test_symmetric_tie_prefers_smaller_index(self):
        # targets equidistant above and below: above (smaller row) wins
        t = np.zeros((5, 1), bool)
        t[0, 0] = t[4, 0] = True
        d2, src = nearest_feature(t)
        assert d2[2, 0] == 4 and src[2, 0] == 0
        # and left/right tie in a row: left (smaller index) wins
        t = np.zeros((1, 5), bool)
        t[0, 0] = t[0, 4] = True
        d2, src = nearest_feature(t)
        assert d2[0, 2] == 4 and src[0, 2] == 0

    def test_no_target(self):
        d2, src = nearest_feature(np.zeros((2, 2), bool))
        assert (d2 == -1).all() and (src == -1).all()

    def test_too_large_raises(self):
        with pytest.raises(ValueError):
            nearest_feature(np.ones((1 << 10, 1 << 10), bool))


class TestMorton:
    def test_known_values(self):
        np.testing.assert_array_equal(
            morton_interleave2([0, 1, 0, 1, 2, 3], [0, 0, 1, 1, 2, 3]),
            [0, 1, 2, 3, 12, 15],
        )

    def test_locality_block_structure(self):
        # a 2^b x 2^b aligned block maps to one contiguous key range
        cx, cy = np.meshgrid(np.arange(4, 8), np.arange(8, 12))
        keys = morton_interleave2(cx.ravel(), cy.ravel())
        keys.sort()
        assert keys[-1] - keys[0] == 15 and len(set(keys.tolist())) == 16

    def test_rejects_negative_and_overflow(self):
        with pytest.raises(ValueError):
            morton_interleave2([-1], [0])
        with pytest.raises(ValueError):
            morton_interleave2([1 << 16], [0])


class TestHilbert:
    def test_bijection_and_unit_step_adjacency(self):
        # the defining Hilbert property: the key order visits every
        # cell exactly once, each step moving to a grid neighbor
        bits = 4
        n = 1 << bits
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        d = hilbert_xy2d(xs.ravel(), ys.ravel(), bits)
        assert sorted(d.tolist()) == list(range(n * n))
        order = np.argsort(d)
        px, py = xs.ravel()[order], ys.ravel()[order]
        steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
        assert (steps == 1).all()

    def test_rejects_out_of_range(self):
        with pytest.raises(ValueError):
            hilbert_xy2d([-1], [0], 4)
        with pytest.raises(ValueError):
            hilbert_xy2d([16], [0], 4)


class TestGeohash:
    def test_canonical_vectors(self):
        # the two classic published examples
        s, _ = geohash_encode([10.40744], [57.64911], 11)
        assert s[0] == "u4pruydqqvj"
        s, _ = geohash_encode([-5.6], [42.6], 5)
        assert s[0] == "ezs42"

    def test_prefix_property(self):
        # shorter precision = prefix of longer (hierarchical index)
        s6, _ = geohash_encode([27.5613], [53.9023], 6)
        s9, _ = geohash_encode([27.5613], [53.9023], 9)
        assert s9[0].startswith(s6[0])

    def test_packed_value_matches_string(self):
        from gdal_boots_ray.kernels.cells import _GEOHASH32

        s, v = geohash_encode([100.0, -3.25], [-45.5, 7.75], 6)
        for text, val in zip(s, v):
            decoded = "".join(_GEOHASH32[(val >> (5 * (5 - j))) & 31] for j in range(6))
            assert decoded == text


class TestRingMetrics:
    def test_unit_square(self):
        ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)
        a, p, cx, cy = ring_metrics(ring)
        assert np.isclose(a, 1.0)
        assert np.isclose(p, 4.0)
        assert np.isclose(cx, 0.5) and np.isclose(cy, 0.5)

    def test_orientation_invariant_area(self):
        ring = np.array([[0, 0], [0, 2], [3, 2], [3, 0], [0, 0]], float)  # CW
        a, p, cx, cy = ring_metrics(ring)
        assert np.isclose(a, 6.0)
        assert np.isclose(p, 10.0)
        assert np.isclose(cx, 1.5) and np.isclose(cy, 1.0)

    def test_large_offset_no_cancellation(self):
        # projected-CRS-sized coordinates: translation keeps 6 decimals
        ox, oy = 600000.0, 5700000.0
        ring = np.array(
            [[ox - 2609, oy], [ox, oy + 3607], [ox + 2609, oy], [ox, oy - 3607], [ox - 2609, oy]]
        )
        a, p, cx, cy = ring_metrics(ring)
        assert abs(a - 2 * 2609 * 3607) < 1e-4
        assert abs(p - 4 * np.sqrt(2609.0**2 + 3607.0**2)) < 1e-6
        assert abs(cx - ox) < 1e-6 and abs(cy - oy) < 1e-6

    def test_asymmetric_l_shape_centroid(self):
        # L-shape: centroid must be area-weighted, not the vertex mean
        ring = np.array(
            [[0, 0], [4, 0], [4, 1], [1, 1], [1, 3], [0, 3], [0, 0]], float
        )
        a, p, cx, cy = ring_metrics(ring)
        assert np.isclose(a, 6.0)
        # decompose: 4x1 rect (c=(2,0.5),A=4) + 1x2 rect (c=(0.5,2),A=2)
        assert np.isclose(cx, (4 * 2 + 2 * 0.5) / 6)
        assert np.isclose(cy, (4 * 0.5 + 2 * 2) / 6)
