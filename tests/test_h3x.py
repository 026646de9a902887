"""Property tests for the icosahedral aperture-7 hex index (h3x) —
the north-star H3-style cell family (res 7-9): hierarchy containment,
neighbor counts, aperture-7 refinement, and size sanity."""

import numpy as np

from gdal_boots_ray.kernels.cells import (
    h3x_cell,
    h3x_cell_center,
    h3x_decode,
    h3x_neighbors,
    h3x_parent,
    h3x_res,
)


def _sample(n=4000, seed=99):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, n)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))  # uniform on sphere
    return lon, lat


class TestRoundTrip:
    def test_center_roundtrip(self):
        lon, lat = _sample()
        for res in (7, 8, 9):
            c = h3x_cell(lon, lat, res)
            clon, clat = h3x_cell_center(c)
            c2 = h3x_cell(clon, clat, res)
            # exact except the measure-zero face-boundary band where a
            # clipped cell's nominal center sits across the face edge
            assert (c == c2).mean() >= 0.999

    def test_decode_fields(self):
        lon, lat = _sample(1000)
        c = h3x_cell(lon, lat, 9)
        face, res, q, r = h3x_decode(c)
        assert (res == 9).all()
        assert ((face >= 0) & (face < 20)).all()
        assert (h3x_res(c) == 9).all()

    def test_every_point_exactly_one_cell(self):
        lon, lat = _sample(1000)
        a = h3x_cell(lon, lat, 8)
        b = h3x_cell(lon, lat, 8)
        assert (a == b).all()


class TestHierarchy:
    def test_parent_of_center_is_exact(self):
        lon, lat = _sample(2000)
        c8 = h3x_cell(lon, lat, 8)
        p = h3x_parent(c8)
        assert (h3x_res(p) == 7).all()
        # the parent of a cell is the res-7 cell containing its center
        clon, clat = h3x_cell_center(c8)
        assert (p == h3x_cell(clon, clat, 7)).all()

    def test_point_parent_containment_rate(self):
        # aperture-7 children overlap their parent's boundary, so a
        # point's res-8 cell's parent equals the point's own res-7
        # cell for most (not all) points — like canonical H3
        lon, lat = _sample(4000)
        p = h3x_parent(h3x_cell(lon, lat, 8))
        direct = h3x_cell(lon, lat, 7)
        assert (p == direct).mean() >= 0.90

    def test_aperture_seven_refinement(self):
        # ~7 res-9 cells per res-8 parent over a dense local sample
        rng = np.random.default_rng(3)
        lon = 27.5 + rng.uniform(-0.05, 0.05, 20000)
        lat = 53.9 + rng.uniform(-0.03, 0.03, 20000)
        n8 = len(np.unique(h3x_cell(lon, lat, 8)))
        n9 = len(np.unique(h3x_cell(lon, lat, 9)))
        assert 5.0 < n9 / n8 < 9.0


class TestNeighbors:
    def test_six_distinct_neighbors(self):
        c = int(h3x_cell(np.array([27.5]), np.array([53.9]), 7)[0])
        nb = h3x_neighbors(c)
        assert len(nb) == 6
        assert len(set(nb.tolist())) == 6
        assert c not in nb

    def test_neighbor_distances_near_h3_res7_scale(self):
        # H3 res-7 hexes have ~1.22 km mean edge -> neighbor centers
        # ~sqrt(3)*edge ~ 2.1 km apart; ours should be the same order
        c = h3x_cell(np.array([27.5]), np.array([53.9]), 7)
        nb = h3x_neighbors(int(c[0]))
        clon, clat = h3x_cell_center(c)
        nlon, nlat = h3x_cell_center(nb)
        R = 6371.0
        d = R * np.arccos(
            np.clip(
                np.sin(np.radians(clat)) * np.sin(np.radians(nlat))
                + np.cos(np.radians(clat)) * np.cos(np.radians(nlat)) * np.cos(np.radians(nlon - clon[0])),
                -1,
                1,
            )
        )
        assert (d > 1.2).all() and (d < 3.0).all()

    def test_neighbors_share_parent_locality(self):
        c = int(h3x_cell(np.array([27.5]), np.array([53.9]), 9)[0])
        nb = h3x_neighbors(c)
        parents = h3x_parent(np.append(nb, c))
        # a cell and its 6 neighbors span at most a few res-8 parents
        assert len(np.unique(parents)) <= 3


class TestPackingBounds:
    def test_high_res_overflow_raises_not_aliases(self):
        # at res >= ~13 axials near face edges exceed the 21-bit q/r
        # fields; packing must refuse instead of silently aliasing
        import pytest

        lon, lat = _sample(2000, seed=5)
        with pytest.raises(ValueError, match="overflow"):
            h3x_cell(lon, lat, 15)

    def test_res12_still_packs(self):
        lon, lat = _sample(2000, seed=6)
        c = h3x_cell(lon, lat, 12)
        assert (h3x_res(c) == 12).all()
        _, _, q, r = h3x_decode(c)
        assert (np.abs(q) < (1 << 20)).all() and (np.abs(r) < (1 << 20)).all()
