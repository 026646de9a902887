"""NTv2 datum-shift grid format (kernels/ntv2.py) — the +nadgrids=
seam the reference reaches through OSR/PROJ (reference
geometry.py:122-126).  No real grid data ships; goldens come from
synthetic fields where bilinear interpolation is arithmetic-exact:
a CONSTANT shift field must shift every point by the constant, and a
LINEAR ramp field is reproduced exactly by bilinear interpolation at
any interior point.
"""

import numpy as np
import pytest

from gdal_boots_ray.kernels.ntv2 import Ntv2Grid, ntv2_encode


def _ramp_grid(s_lat=180000.0, n_lat=216000.0, e_lon=-36000.0, w_lon=36000.0,
               inc=3600.0, a_lat=0.8, b_lat=0.002, c_lat=-0.001,
               a_lon=-1.4, b_lon=0.0015, c_lon=0.0025):
    """Linear shift field: shift = a + b*(lon_w - e_lon)/inc + c*(lat - s_lat)/inc."""
    nx = int((w_lon - e_lon) / inc) + 1
    ny = int((n_lat - s_lat) / inc) + 1
    jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    shifts = np.stack(
        [a_lat + b_lat * ii + c_lat * jj, a_lon + b_lon * ii + c_lon * jj], axis=2
    ).astype(np.float32)
    meta = dict(name="RAMP", s_lat=s_lat, n_lat=n_lat, e_lon=e_lon, w_lon=w_lon,
                lat_inc=inc, lon_inc=inc, shifts=shifts)
    return meta, (a_lat, b_lat, c_lat, a_lon, b_lon, c_lon)


class TestNtv2:
    def test_constant_field_roundtrip_both_endians(self):
        const = np.zeros((11, 21, 2), np.float32)
        const[:, :, 0] = 1.25   # lat shift arc-seconds
        const[:, :, 1] = -2.5   # lon shift (positive west)
        meta = dict(name="CONST", s_lat=180000.0, n_lat=216000.0,
                    e_lon=-36000.0, w_lon=36000.0, lat_inc=3600.0,
                    lon_inc=3600.0, shifts=const)
        for little in (True, False):
            blob = ntv2_encode([meta], little_endian=little)
            g = Ntv2Grid.from_bytes(blob)
            assert g.system_f == "NAD27" and g.system_t == "NAD83"
            assert len(g.subgrids) == 1 and g.subgrids[0].name == "CONST"
            lon = np.array([3.0, -5.5, 9.99])
            lat = np.array([51.0, 55.25, 58.0])
            lon2, lat2 = g.shift(lon, lat)
            # lon shift is positive WEST: -2.5" west == +2.5" east
            assert np.allclose(lon2, lon + 2.5 / 3600.0, atol=1e-12)
            assert np.allclose(lat2, lat + 1.25 / 3600.0, atol=1e-12)

    def test_linear_ramp_bilinear_exact(self):
        meta, (al, bl, cl, ao, bo, co) = _ramp_grid()
        g = Ntv2Grid.from_bytes(ntv2_encode([meta]))
        rng = np.random.default_rng(7)
        lat = rng.uniform(50.1, 59.9, 200)
        lon = rng.uniform(-9.9, 9.9, 200)
        lon2, lat2 = g.shift(lon, lat)
        # closed-form expected shift (float32 grid => 1e-6" tolerance)
        fx = (-lon * 3600.0 - meta["e_lon"]) / meta["lon_inc"]
        fy = (lat * 3600.0 - meta["s_lat"]) / meta["lat_inc"]
        exp_lat = al + bl * fx + cl * fy
        exp_lon = ao + bo * fx + co * fy
        assert np.abs((lat2 - lat) * 3600.0 - exp_lat).max() < 1e-4
        assert np.abs((lon - lon2) * 3600.0 - exp_lon).max() < 1e-4

    def test_inverse_converges(self):
        meta, _ = _ramp_grid()
        g = Ntv2Grid.from_bytes(ntv2_encode([meta]))
        lon = np.linspace(-9, 9, 50)
        lat = np.linspace(50.2, 59.8, 50)
        f_lon, f_lat = g.shift(lon, lat)
        i_lon, i_lat = g.shift_inverse(f_lon, f_lat)
        assert np.abs(i_lon - lon).max() < 1e-10
        assert np.abs(i_lat - lat).max() < 1e-10

    def test_multigrid_finest_wins(self):
        coarse = np.zeros((11, 21, 2), np.float32)
        coarse[:, :, 0] = 1.0
        fine = np.zeros((11, 11, 2), np.float32)
        fine[:, :, 0] = 3.0
        metas = [
            dict(name="COARSE", s_lat=180000.0, n_lat=216000.0, e_lon=-36000.0,
                 w_lon=36000.0, lat_inc=3600.0, lon_inc=3600.0, shifts=coarse),
            dict(name="FINE", parent="COARSE", s_lat=190800.0, n_lat=194400.0,
                 e_lon=-3600.0, w_lon=0.0, lat_inc=360.0, lon_inc=360.0,
                 shifts=fine),
        ]
        g = Ntv2Grid.from_bytes(ntv2_encode(metas))
        # point inside the fine subgrid gets the fine shift; outside
        # falls back to the coarse parent; far outside passes through
        lon = np.array([0.5, 5.0, 100.0])
        lat = np.array([53.25, 53.25, 10.0])
        _, lat2 = g.shift(lon, lat)
        d = (lat2 - lat) * 3600.0
        assert abs(d[0] - 3.0) < 1e-5
        assert abs(d[1] - 1.0) < 1e-5
        assert d[2] == 0.0

    def test_longitude_west_row_order(self):
        # a field varying only with the west-longitude index must move
        # EAST points by the e_lon-column value: verify the row order
        # convention (within a row nodes run east -> west)
        shifts = np.zeros((2, 3, 2), np.float32)
        shifts[:, :, 0] = [[10.0, 20.0, 30.0]] * 2  # columns: e_lon .. w_lon
        meta = dict(name="ORDER", s_lat=0.0, n_lat=3600.0, e_lon=0.0,
                    w_lon=7200.0, lat_inc=3600.0, lon_inc=3600.0, shifts=shifts)
        g = Ntv2Grid.from_bytes(ntv2_encode([meta]))
        # lon_w = 0 (lon 0) -> column 0 -> 10"; lon_w = 7200 (lon -2) -> 30"
        _, lat_a = g.shift(np.array([0.0]), np.array([0.5]))
        _, lat_b = g.shift(np.array([-2.0]), np.array([0.5]))
        assert abs((lat_a[0] - 0.5) * 3600.0 - 10.0) < 1e-5
        assert abs((lat_b[0] - 0.5) * 3600.0 - 30.0) < 1e-5

    def test_reject_garbage(self):
        with pytest.raises(ValueError, match="NTv2"):
            Ntv2Grid.from_bytes(b"not a grid at all" * 20)
        blob = ntv2_encode([dict(name="X", s_lat=0.0, n_lat=3600.0, e_lon=0.0,
                                 w_lon=3600.0, lat_inc=3600.0, lon_inc=3600.0,
                                 shifts=np.zeros((2, 2, 2), np.float32))])
        with pytest.raises(ValueError, match="NUM_OREC"):
            Ntv2Grid.from_bytes(b"XX" + blob[2:])
