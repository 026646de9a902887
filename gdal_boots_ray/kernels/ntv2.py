"""NTv2 datum-shift grids (.gsb) — pure stdlib+numpy.

The format the reference reaches through OSR/PROJ ``+nadgrids=``
(reference geometry.py:122-126 accepts arbitrary proj4, which PROJ
resolves to NTv2 grids for datum pairs like NAD27->NAD83 or
OSGB36->ETRS89).  This module implements the public Canadian NTv2
binary layout (also documented in the PROJ source and the GDAL NTv2
driver): an 11-record overview header, per-subgrid 11-record headers,
and row-major float32 (lat_shift, lon_shift, lat_acc, lon_acc) nodes
in arc-seconds with the NTv2 longitude-positive-WEST convention;
rows run south to north and, within a row, east to west.

Scope: single- and multi-subgrid files (finest containing subgrid
wins, like PROJ), bilinear interpolation, forward shift and the
iterative inverse.  The encoder exists so tests can synthesize grids
(constant and linear-ramp shift fields — bilinear reproduces linear
fields exactly, giving arithmetic-exact goldens without shipping any
real grid data).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

_OVERVIEW_NAMES = (
    b"NUM_OREC", b"NUM_SREC", b"NUM_FILE", b"GS_TYPE ", b"VERSION ",
    b"SYSTEM_F", b"SYSTEM_T", b"MAJOR_F ", b"MINOR_F ", b"MAJOR_T ", b"MINOR_T ",
)
_SUB_NAMES = (
    b"SUB_NAME", b"PARENT  ", b"CREATED ", b"UPDATED ", b"S_LAT   ",
    b"N_LAT   ", b"E_LONG  ", b"W_LONG  ", b"LAT_INC ", b"LONG_INC", b"GS_COUNT",
)


class Ntv2SubGrid:
    """One subgrid: bounds/increments in arc-seconds (lon positive
    west) + (ny, nx, 2) float32 shift field in arc-seconds."""

    __slots__ = ("name", "parent", "s_lat", "n_lat", "e_lon", "w_lon",
                 "lat_inc", "lon_inc", "shifts")

    def __init__(self, name, parent, s_lat, n_lat, e_lon, w_lon,
                 lat_inc, lon_inc, shifts):
        self.name = name
        self.parent = parent
        self.s_lat, self.n_lat = s_lat, n_lat
        self.e_lon, self.w_lon = e_lon, w_lon
        self.lat_inc, self.lon_inc = lat_inc, lon_inc
        self.shifts = shifts  # (ny, nx, 2): [...,0]=lat, [...,1]=lon(+W)

    @property
    def nx(self) -> int:
        return self.shifts.shape[1]

    @property
    def ny(self) -> int:
        return self.shifts.shape[0]

    def contains(self, lon_w_sec: np.ndarray, lat_sec: np.ndarray) -> np.ndarray:
        return (
            (lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
            & (lon_w_sec >= self.e_lon) & (lon_w_sec <= self.w_lon)
        )

    def area(self) -> float:
        return (self.n_lat - self.s_lat) * (self.w_lon - self.e_lon)

    def interpolate(self, lon_w_sec: np.ndarray, lat_sec: np.ndarray) -> np.ndarray:
        """Bilinear (n,2) [lat_shift, lon_shift_west] arc-seconds."""
        fx = (lon_w_sec - self.e_lon) / self.lon_inc
        fy = (lat_sec - self.s_lat) / self.lat_inc
        ix = np.clip(np.floor(fx).astype(np.int64), 0, self.nx - 2)
        iy = np.clip(np.floor(fy).astype(np.int64), 0, self.ny - 2)
        tx = (fx - ix)[:, None]
        ty = (fy - iy)[:, None]
        # gather the 4 corners first, THEN upcast: avoids copying the
        # whole (ny, nx, 2) field to float64 per call (a real national
        # grid is millions of nodes; the gather is O(points))
        g = self.shifts
        v00 = g[iy, ix].astype(np.float64)
        v01 = g[iy, ix + 1].astype(np.float64)
        v10 = g[iy + 1, ix].astype(np.float64)
        v11 = g[iy + 1, ix + 1].astype(np.float64)
        return (v00 * (1 - tx) * (1 - ty) + v01 * tx * (1 - ty)
                + v10 * (1 - tx) * ty + v11 * tx * ty)


class Ntv2Grid:
    """A parsed NTv2 file: subgrids + the datum pair names."""

    def __init__(self, subgrids: List[Ntv2SubGrid], system_f: str, system_t: str):
        self.subgrids = subgrids
        self.system_f = system_f
        self.system_t = system_t

    @classmethod
    def from_bytes(cls, data: bytes) -> "Ntv2Grid":
        if len(data) < 11 * 16:
            raise ValueError("not an NTv2 stream (truncated overview header)")
        # endianness: NUM_OREC's int32 value must be 11
        for end in ("<", ">"):
            if struct.unpack_from(f"{end}i", data, 8)[0] == 11:
                break
        else:
            raise ValueError("not an NTv2 stream (NUM_OREC != 11)")
        pos = 0
        over = {}
        for want in _OVERVIEW_NAMES:
            name = data[pos : pos + 8]
            if name != want:
                raise ValueError(f"NTv2 overview record {want!r} missing (got {name!r})")
            over[name.strip().decode()] = data[pos + 8 : pos + 16]
            pos += 16
        n_sub = struct.unpack(f"{end}i", over["NUM_FILE"][:4])[0]
        if over["GS_TYPE"].strip() != b"SECONDS":
            raise ValueError(f"unsupported NTv2 GS_TYPE {over['GS_TYPE']!r}")
        subs: List[Ntv2SubGrid] = []
        for _ in range(n_sub):
            hdr = {}
            for want in _SUB_NAMES:
                name = data[pos : pos + 8]
                if name != want:
                    raise ValueError(f"NTv2 subgrid record {want!r} missing (got {name!r})")
                hdr[name.strip().decode()] = data[pos + 8 : pos + 16]
                pos += 16
            s_lat, n_lat, e_lon, w_lon, lat_inc, lon_inc = (
                struct.unpack(f"{end}d", hdr[k])[0]
                for k in ("S_LAT", "N_LAT", "E_LONG", "W_LONG", "LAT_INC", "LONG_INC")
            )
            count = struct.unpack(f"{end}i", hdr["GS_COUNT"][:4])[0]
            nx = int(round((w_lon - e_lon) / lon_inc)) + 1
            ny = int(round((n_lat - s_lat) / lat_inc)) + 1
            if nx * ny != count:
                raise ValueError(f"NTv2 GS_COUNT {count} != grid {ny}x{nx}")
            nodes = np.frombuffer(data, dtype=f"{end}f4", count=count * 4, offset=pos)
            pos += count * 16
            # rows south->north; WITHIN a row east->west (increasing
            # positive-west longitude) — store as (ny, nx, 2) with x
            # increasing westward so interpolate() indexes directly
            shifts = nodes.reshape(ny, nx, 4)[:, :, :2].astype(np.float32)
            subs.append(
                Ntv2SubGrid(
                    hdr["SUB_NAME"].decode().strip(), hdr["PARENT"].decode().strip(),
                    s_lat, n_lat, e_lon, w_lon, lat_inc, lon_inc, shifts,
                )
            )
        return cls(subs, over["SYSTEM_F"].decode().strip(), over["SYSTEM_T"].decode().strip())

    def _pick(self, lon_w_sec: np.ndarray, lat_sec: np.ndarray) -> List[Tuple[Ntv2SubGrid, np.ndarray]]:
        """Finest (smallest-area) containing subgrid per point."""
        order = sorted(self.subgrids, key=lambda s: s.area())
        taken = np.zeros(len(lon_w_sec), bool)
        out = []
        for sub in order:
            m = sub.contains(lon_w_sec, lat_sec) & ~taken
            if m.any():
                out.append((sub, m))
                taken |= m
        return out

    def shift(self, lon_deg, lat_deg) -> Tuple[np.ndarray, np.ndarray]:
        """Forward datum shift (e.g. NAD27 -> NAD83).  Points outside
        every subgrid pass through unshifted (PROJ's lenient mode)."""
        lon = np.asarray(lon_deg, dtype=np.float64)
        lat = np.asarray(lat_deg, dtype=np.float64)
        lon_w = -lon * 3600.0  # NTv2 longitudes are positive WEST
        lat_s = lat * 3600.0
        dlat = np.zeros_like(lat_s)
        dlon_w = np.zeros_like(lon_w)
        for sub, m in self._pick(lon_w, lat_s):
            sh = sub.interpolate(lon_w[m], lat_s[m])
            dlat[m] = sh[:, 0]
            dlon_w[m] = sh[:, 1]
        return lon - dlon_w / 3600.0, lat + dlat / 3600.0

    def shift_inverse(self, lon_deg, lat_deg, iters: int = 4) -> Tuple[np.ndarray, np.ndarray]:
        """Inverse shift by fixed-point iteration (PROJ's approach:
        the shift field is smooth, so a few iterations converge to
        float64 precision on real grids)."""
        lon_t = np.asarray(lon_deg, dtype=np.float64)
        lat_t = np.asarray(lat_deg, dtype=np.float64)
        lon, lat = lon_t.copy(), lat_t.copy()
        for _ in range(iters):
            f_lon, f_lat = self.shift(lon, lat)
            lon += lon_t - f_lon
            lat += lat_t - f_lat
        return lon, lat


def ntv2_encode(
    subgrids: List[dict],
    system_f: str = "NAD27",
    system_t: str = "NAD83",
    little_endian: bool = True,
) -> bytes:
    """Synthesize an NTv2 .gsb byte stream (test/fixture writer).

    Each subgrid dict: name, parent ("NONE" for roots), s_lat, n_lat,
    e_lon, w_lon, lat_inc, lon_inc (arc-seconds, lon positive west)
    and shifts (ny, nx, 2) float32 arc-seconds."""
    end = "<" if little_endian else ">"

    def rec(name: bytes, payload: bytes) -> bytes:
        assert len(name) == 8
        return name + payload.ljust(8, b"\x00")[:8]

    def irec(name, v):
        return rec(name, struct.pack(f"{end}i", v))

    def drec(name, v):
        return rec(name, struct.pack(f"{end}d", v))

    def srec(name, s):
        return rec(name, s.encode().ljust(8)[:8])

    out = bytearray()
    out += irec(b"NUM_OREC", 11)
    out += irec(b"NUM_SREC", 11)
    out += irec(b"NUM_FILE", len(subgrids))
    out += srec(b"GS_TYPE ", "SECONDS")
    out += srec(b"VERSION ", "NTv2.0")
    out += srec(b"SYSTEM_F", system_f)
    out += srec(b"SYSTEM_T", system_t)
    for name in (b"MAJOR_F ", b"MINOR_F ", b"MAJOR_T ", b"MINOR_T "):
        out += drec(name, 6378137.0)
    for sg in subgrids:
        shifts = np.asarray(sg["shifts"], dtype=np.float32)
        ny, nx, _ = shifts.shape
        out += srec(b"SUB_NAME", sg["name"])
        out += srec(b"PARENT  ", sg.get("parent", "NONE"))
        out += srec(b"CREATED ", "2026")
        out += srec(b"UPDATED ", "2026")
        out += drec(b"S_LAT   ", sg["s_lat"])
        out += drec(b"N_LAT   ", sg["n_lat"])
        out += drec(b"E_LONG  ", sg["e_lon"])
        out += drec(b"W_LONG  ", sg["w_lon"])
        out += drec(b"LAT_INC ", sg["lat_inc"])
        out += drec(b"LONG_INC", sg["lon_inc"])
        out += irec(b"GS_COUNT", nx * ny)
        nodes = np.zeros((ny, nx, 4), dtype=f"{end}f4")
        nodes[:, :, :2] = shifts
        out += nodes.tobytes()
    return bytes(out)
