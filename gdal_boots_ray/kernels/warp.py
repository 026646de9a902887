"""Warp / resample / mosaic kernel, pure NumPy.

Reimplements the semantics of ``RasterDataset.warp`` (reference
gdal.py:653-737 — a thin wrapper over ``gdal.Warp``) as an explicit
inverse-mapping sampler:

1. Determine the output grid: explicit bbox (any CRS) or the union of
   the source bounds; explicit resolution / width / height or the last
   source's resolution; ``crop_to_cutline`` aligns the cutline envelope
   *inward* to the source pixel grid (this reproduces the reference's
   (282, 312) cutline golden, tests/test_raster.py:230-281).
2. For every output pixel center, inverse-map to each source's pixel
   space (CRS transform + inverse affine) and gather.
3. Paint sources **in order — later sources win** (gdal.py:713-714
   appends ``self`` last so self wins overlaps), skipping src-nodata
   pixels; cells no source covers keep dst nodata (or 0).
4. Optional cutline: scanline-rasterize the polygon on the output grid
   and blank everything outside.

Resampling algorithms (reference ``Resampling`` enum gdal.py:179-204):
``near`` and ``bilinear`` are point samplers; the area family
(``average sum min max med q1 q3 mode rms``) bins source pixels into
target cells (downscale); at upscale they degrade to ``near``
(matching GDAL's behaviour of sampling at least one source pixel).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from gdal_boots_ray.kernels.affine import Affine, GeoInfo, bounds as bounds_fn, invert_gt, resolution as resolution_fn
from gdal_boots_ray.kernels.crs import resolve_crs, transform_points
from gdal_boots_ray.kernels.geometry import RawGeometry, envelope as geom_envelope
from gdal_boots_ray.kernels.rasterize import rasterize

POINT_RESAMPLERS = {"near", "bilinear", "cubic", "cubicspline", "lanczos"}
AREA_RESAMPLERS = {"average", "sum", "min", "max", "med", "q1", "q3", "mode", "rms"}


class WarpSource:
    """One input raster for the warp kernel."""

    __slots__ = ("img", "gt", "crs", "nodata")

    def __init__(self, img: np.ndarray, gt, crs, nodata=None):
        self.img = img if img.ndim == 3 else img[None]
        self.gt = np.asarray(gt, dtype=np.float64)
        self.crs = crs
        self.nodata = nodata

    @property
    def bounds(self):
        return bounds_fn(self.gt, self.img.shape[2], self.img.shape[1])[0]

    @property
    def resolution(self):
        return resolution_fn(self.gt)[0]


def _same_crs(a, b) -> bool:
    try:
        return resolve_crs(a).key == resolve_crs(b).key
    except ValueError:
        return False


def warp(
    sources: Sequence[WarpSource],
    bbox=None,
    bbox_crs=4326,
    out_crs=None,
    resolution: Optional[Tuple[float, float]] = None,
    width: Optional[int] = None,
    height: Optional[int] = None,
    resampling: str = "near",
    dst_nodata=None,
    cutline: Optional[RawGeometry] = None,
    cutline_crs=None,
    crop_to_cutline: Optional[bool] = None,
    dtype=None,
) -> Tuple[np.ndarray, GeoInfo]:
    """Warp + mosaic ``sources`` (painted in order, later wins).

    Returns (img (bands,h,w), GeoInfo). Raises RuntimeError when the
    output grid degenerates (reference raises via gdal.Warp failure,
    asserted at tests/test_raster.py:486-487).
    """
    if not sources:
        raise ValueError("warp needs at least one source")
    primary = sources[-1]
    out_crs = out_crs if out_crs is not None else primary.crs
    src_aligned = _same_crs(primary.crs, out_crs)

    # --- output resolution -------------------------------------------------
    if resolution is not None:
        res_x, res_y = float(resolution[0]), float(resolution[1])
    else:
        pres = primary.resolution
        if src_aligned:
            res_x, res_y = float(pres[0]), float(pres[1])
        else:
            # preserve pixel count over the primary's extent in out CRS
            pb = primary.bounds
            tb = _bounds_to(out_crs, primary.crs, pb)
            res_x = (tb[2] - tb[0]) / primary.img.shape[2]
            res_y = (tb[3] - tb[1]) / primary.img.shape[1]
    if not (np.isfinite(res_x) and np.isfinite(res_y)) or res_x <= 0 or res_y <= 0:
        raise ValueError(
            f"degenerate output resolution ({res_x}, {res_y}); "
            "check the source geotransform is (a, b, c, d, e, f) affine order"
        )

    # --- output bounds -----------------------------------------------------
    if crop_to_cutline is None:
        crop_to_cutline = cutline is not None
    if cutline is not None and crop_to_cutline:
        env = geom_envelope(cutline)
        c_crs = cutline_crs if cutline_crs is not None else out_crs
        if not _same_crs(c_crs, out_crs):
            env = tuple(_bounds_to(out_crs, c_crs, np.asarray(env)))
        if src_aligned:
            # align the envelope inward to the primary source grid
            x0, y0 = primary.gt[2], primary.gt[5]
            minx = x0 + np.ceil((env[0] - x0) / res_x) * res_x
            maxx = x0 + np.floor((env[2] - x0) / res_x) * res_x
            maxy = y0 - np.ceil((y0 - env[3]) / res_y) * res_y
            miny = y0 - np.floor((y0 - env[1]) / res_y) * res_y
        else:
            minx, miny, maxx, maxy = env
    elif bbox is not None:
        b = np.asarray(bbox, dtype=np.float64).reshape(-1)
        if b.shape[0] != 4 or not np.isfinite(b).all() or b[0] >= b[2] or b[1] >= b[3]:
            raise ValueError(f"bbox must be finite (xmin, ymin, xmax, ymax) with min < max, got {bbox!r}")
        if not _same_crs(bbox_crs, out_crs):
            b = _bounds_to(out_crs, bbox_crs, b)
        minx, miny, maxx, maxy = b
    else:
        # union of source bounds in out CRS
        bs = []
        for s in sources:
            sb = s.bounds
            if not _same_crs(s.crs, out_crs):
                sb = _bounds_to(out_crs, s.crs, sb)
            bs.append(sb)
        bs = np.asarray(bs)
        minx, miny = bs[:, 0].min(), bs[:, 1].min()
        maxx, maxy = bs[:, 2].max(), bs[:, 3].max()

    # --- output size -------------------------------------------------------
    if (width is not None and width <= 0) or (height is not None and height <= 0):
        raise RuntimeError(f"could not warp: degenerate output grid {width}x{height}")
    if width and height:
        w_out, h_out = int(width), int(height)
        if resolution is None:
            res_x = (maxx - minx) / w_out
            res_y = (maxy - miny) / h_out
    else:
        w_out = int((maxx - minx) / res_x + 0.5)
        h_out = int((maxy - miny) / res_y + 0.5)
    if w_out <= 0 or h_out <= 0:
        raise RuntimeError(f"could not warp: degenerate output grid {w_out}x{h_out}")

    gt_out = np.array([res_x, 0.0, minx, 0.0, -res_y, maxy], dtype=np.float64)
    bands = max(s.img.shape[0] for s in sources)
    if dtype is None:
        dtype = primary.img.dtype

    if dst_nodata is None:
        fill = 0
    else:
        fill = dst_nodata
    out = np.full((bands, h_out, w_out), fill, dtype=dtype)
    painted = np.zeros((h_out, w_out), dtype=bool)

    # output pixel centers in out CRS
    cols = (np.arange(w_out, dtype=np.float64) + 0.5) * res_x + minx
    rows = maxy - (np.arange(h_out, dtype=np.float64) + 0.5) * res_y

    for s in sources:
        _paint(out, painted, s, cols, rows, out_crs, resampling, res_x, res_y)

    if cutline is not None:
        c_crs = cutline_crs if cutline_crs is not None else out_crs
        cl = cutline
        if not _same_crs(c_crs, out_crs):
            from gdal_boots_ray.kernels.geometry import map_coords

            cl = map_coords(cutline, lambda x, y: transform_points(c_crs, out_crs, x, y))
        mask = rasterize(cl, (h_out, w_out), gt_out)
        out[:, mask == 0] = fill

    epsg = None
    proj4 = None
    try:
        key = resolve_crs(out_crs).key
        if isinstance(key, int):
            epsg = key
        else:
            proj4 = key
    except ValueError:
        pass
    return out, GeoInfo(epsg=epsg, transform=Affine(*gt_out), proj4=proj4)


def _bounds_to(dst, src, b: np.ndarray) -> np.ndarray:
    """2-corner bounds transform (reference bounds() reprojection)."""
    b = np.asarray(b, dtype=np.float64).reshape(-1)
    x, y = transform_points(src, dst, np.array([b[0], b[2]]), np.array([b[1], b[3]]))
    return np.array([min(x), min(y), max(x), max(y)])


def bspline_weights(t: np.ndarray) -> np.ndarray:
    """Cubic B-spline tap weights for taps at offsets -1..2 of the
    continuous coordinate fraction ``t`` — partition of unity, no
    normalization needed (GDAL Resampling.cubicspline family)."""
    w = np.empty((4,) + t.shape)
    for idx, k in enumerate(range(-1, 3)):
        s_ = np.abs(t - k)
        w[idx] = np.where(
            s_ < 1,
            (3 * s_**3 - 6 * s_**2 + 4) / 6.0,
            np.where(s_ < 2, (2 - s_) ** 3 / 6.0, 0.0),
        )
    return w


def lanczos3_weights(t: np.ndarray) -> np.ndarray:
    """Lanczos a=3 windowed-sinc tap weights for taps at offsets
    -2..3, normalized to sum 1 (GDAL Resampling.lanczos family)."""
    w = np.empty((6,) + t.shape)
    a = 3.0
    for idx, k in enumerate(range(-2, 4)):
        s_ = t - k
        with np.errstate(invalid="ignore", divide="ignore"):
            val = a * np.sin(np.pi * s_) * np.sin(np.pi * s_ / a) / (np.pi**2 * s_**2)
        w[idx] = np.where(np.abs(s_) < 1e-12, 1.0, val)
    w /= w.sum(axis=0)
    return w


def _paint(out, painted, s: WarpSource, cols, rows, out_crs, resampling, res_x, res_y):
    h_out, w_out = out.shape[1:]
    sh, sw = s.img.shape[1:]
    inv = invert_gt(s.gt)[0]
    same = _same_crs(s.crs, out_crs)

    if resampling in AREA_RESAMPLERS:
        sres = s.resolution
        if same and (res_x >= sres[0] or res_y >= sres[1]):
            _paint_area(out, painted, s, cols, rows, resampling, res_x, res_y)
            return
        resampling = "near"  # upscale / reprojected degrade

    if same:
        px = inv[0] * cols + inv[2]
        py = inv[4] * rows + inv[5]
        PX = np.broadcast_to(px[None, :], (h_out, w_out))
        PY = np.broadcast_to(py[:, None], (h_out, w_out))
    else:
        CX, CY = np.meshgrid(cols, rows)
        sx, sy = transform_points(out_crs, s.crs, CX.ravel(), CY.ravel())
        PX = (inv[0] * sx + inv[1] * sy + inv[2]).reshape(h_out, w_out)
        PY = (inv[3] * sx + inv[4] * sy + inv[5]).reshape(h_out, w_out)

    if resampling == "cubic":
        # GDAL's cubic convolution (Keys kernel, a=-0.5): 4x4 weighted
        # gather around the continuous source coordinate
        fx = PX - 0.5
        fy = PY - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        tx = fx - x0
        ty = fy - y0
        valid = (PX >= 0) & (PX < sw) & (PY >= 0) & (PY < sh)

        def kweights(t):
            # Keys cubic, a = -0.5: weights for offsets -1, 0, 1, 2
            a = -0.5
            w = np.empty((4,) + t.shape)
            t1 = 1 + t
            w[0] = a * t1**3 - 5 * a * t1**2 + 8 * a * t1 - 4 * a
            w[1] = (a + 2) * t**3 - (a + 3) * t**2 + 1
            t2 = 1 - t
            w[2] = (a + 2) * t2**3 - (a + 3) * t2**2 + 1
            t3 = 2 - t
            w[3] = a * t3**3 - 5 * a * t3**2 + 8 * a * t3 - 4 * a
            return w

        wx = kweights(tx)
        wy = kweights(ty)
        any_valid = np.zeros_like(valid)
        for b in range(out.shape[0]):
            sb = s.img[min(b, s.img.shape[0] - 1)].astype(np.float64)
            acc = np.zeros(PX.shape)
            bad = np.zeros(PX.shape, dtype=bool)
            for j in range(4):
                yj = np.clip(y0 + j - 1, 0, sh - 1)
                rowacc = np.zeros(PX.shape)
                for i in range(4):
                    xi = np.clip(x0 + i - 1, 0, sw - 1)
                    tap = sb[yj, xi]
                    if s.nodata is not None:
                        bad |= tap == s.nodata
                    rowacc += wx[i] * tap
                acc += wy[j] * rowacc
            if np.issubdtype(out.dtype, np.integer):
                info = np.iinfo(out.dtype)
                acc = np.clip(np.rint(acc), info.min, info.max)
            # per-band validity over every gathered tap (mirrors the
            # bilinear 4-corner nodata mask): a nodata tap must not
            # blend into the blended value nor mark the pixel painted
            bvalid = valid & ~bad
            out[b][bvalid] = acc[bvalid].astype(out.dtype)
            any_valid |= bvalid
        painted |= any_valid
        return

    if resampling in ("cubicspline", "lanczos"):
        # separable windowed gathers matching GDAL's kernel families:
        # cubicspline = cubic B-spline (4 taps, partition of unity),
        # lanczos = sinc windowed sinc, a=3 (6 taps, normalized)
        fx = PX - 0.5
        fy = PY - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        tx = fx - x0
        ty = fy - y0
        valid = (PX >= 0) & (PX < sw) & (PY >= 0) & (PY < sh)

        if resampling == "cubicspline":
            taps, start = 4, -1
            kweights = bspline_weights
        else:
            taps, start = 6, -2
            kweights = lanczos3_weights

        wx = kweights(tx)
        wy = kweights(ty)
        any_valid = np.zeros_like(valid)
        for b in range(out.shape[0]):
            sb = s.img[min(b, s.img.shape[0] - 1)].astype(np.float64)
            acc = np.zeros(PX.shape)
            bad = np.zeros(PX.shape, dtype=bool)
            for j in range(taps):
                yj = np.clip(y0 + j + start, 0, sh - 1)
                rowacc = np.zeros(PX.shape)
                for i in range(taps):
                    xi = np.clip(x0 + i + start, 0, sw - 1)
                    tap = sb[yj, xi]
                    if s.nodata is not None:
                        bad |= tap == s.nodata
                    rowacc += wx[i] * tap
                acc += wy[j] * rowacc
            if np.issubdtype(out.dtype, np.integer):
                info = np.iinfo(out.dtype)
                acc = np.clip(np.rint(acc), info.min, info.max)
            # per-band validity over every gathered tap (mirrors the
            # bilinear 4-corner nodata mask): a nodata tap must not
            # blend into the blended value nor mark the pixel painted
            bvalid = valid & ~bad
            out[b][bvalid] = acc[bvalid].astype(out.dtype)
            any_valid |= bvalid
        painted |= any_valid
        return

    if resampling == "bilinear":
        fx = PX - 0.5
        fy = PY - 0.5
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        wx = fx - x0
        wy = fy - y0
        geo_valid = (PX >= 0) & (PX < sw) & (PY >= 0) & (PY < sh)
        x0c = np.clip(x0, 0, sw - 1)
        x1c = np.clip(x0 + 1, 0, sw - 1)
        y0c = np.clip(y0, 0, sh - 1)
        y1c = np.clip(y0 + 1, 0, sh - 1)
        any_valid = np.zeros_like(geo_valid)
        for b in range(out.shape[0]):
            sb = s.img[min(b, s.img.shape[0] - 1)].astype(np.float64)
            v = (
                sb[y0c, x0c] * (1 - wx) * (1 - wy)
                + sb[y0c, x1c] * wx * (1 - wy)
                + sb[y1c, x0c] * (1 - wx) * wy
                + sb[y1c, x1c] * wx * wy
            )
            # per-band nodata mask over all four gather corners; kept
            # separate from the geometric mask so bands don't leak
            # each other's nodata
            bvalid = geo_valid
            if s.nodata is not None:
                bvalid = geo_valid & (
                    (sb[y0c, x0c] != s.nodata)
                    & (sb[y0c, x1c] != s.nodata)
                    & (sb[y1c, x0c] != s.nodata)
                    & (sb[y1c, x1c] != s.nodata)
                )
            out[b][bvalid] = v[bvalid].astype(out.dtype)
            any_valid |= bvalid
        painted |= any_valid
        return

    # nearest
    ix = np.floor(PX).astype(np.int64)
    iy = np.floor(PY).astype(np.int64)
    valid = (ix >= 0) & (ix < sw) & (iy >= 0) & (iy < sh)
    ixc = np.clip(ix, 0, sw - 1)
    iyc = np.clip(iy, 0, sh - 1)
    if s.nodata is not None:
        ref = s.img[0][iyc, ixc]
        valid = valid & (ref != s.nodata)
    for b in range(out.shape[0]):
        sb = s.img[min(b, s.img.shape[0] - 1)]
        vals = sb[iyc, ixc]
        out[b][valid] = vals[valid]
    painted |= valid


def _paint_area(out, painted, s: WarpSource, cols, rows, resampling, res_x, res_y):
    """Bin every source pixel into its covering target cell and reduce."""
    h_out, w_out = out.shape[1:]
    sh, sw = s.img.shape[1:]
    # source pixel centers in world coords
    scx = s.gt[2] + (np.arange(sw) + 0.5) * s.gt[0]
    scy = s.gt[5] + (np.arange(sh) + 0.5) * s.gt[4]
    minx = cols[0] - 0.5 * res_x
    maxy = rows[0] + 0.5 * res_y
    tx = np.floor((scx - minx) / res_x).astype(np.int64)
    ty = np.floor((maxy - scy) / res_y).astype(np.int64)
    vx = (tx >= 0) & (tx < w_out)
    vy = (ty >= 0) & (ty < h_out)
    TX = np.broadcast_to(tx[None, :], (sh, sw))
    TY = np.broadcast_to(ty[:, None], (sh, sw))
    V = vy[:, None] & vx[None, :]
    for b in range(out.shape[0]):
        sb = s.img[min(b, s.img.shape[0] - 1)]
        vals = sb[V].astype(np.float64)
        vmask = np.ones(len(vals), dtype=bool)
        if s.nodata is not None:
            vmask = vals != s.nodata
        bin_idx = (TY[V] * w_out + TX[V])[vmask]
        vals = vals[vmask]
        if len(vals) == 0:
            continue
        order = np.argsort(bin_idx, kind="stable")
        bin_sorted = bin_idx[order]
        val_sorted = vals[order]
        uniq, starts = np.unique(bin_sorted, return_index=True)
        red = _segment_reduce(val_sorted, starts, resampling)
        flat = out[b].reshape(-1)
        flat[uniq] = red.astype(out.dtype)
        pf = painted.reshape(-1)
        pf[uniq] = True


def _segment_reduce(values: np.ndarray, starts: np.ndarray, resampling: str) -> np.ndarray:
    ends = np.append(starts[1:], len(values))
    if resampling == "sum":
        cs = np.concatenate([[0.0], np.cumsum(values)])
        return cs[ends] - cs[starts]
    if resampling == "average":
        cs = np.concatenate([[0.0], np.cumsum(values)])
        return (cs[ends] - cs[starts]) / (ends - starts)
    if resampling == "rms":
        cs = np.concatenate([[0.0], np.cumsum(values**2)])
        return np.sqrt((cs[ends] - cs[starts]) / (ends - starts))
    if resampling == "min":
        return np.minimum.reduceat(values, starts)
    if resampling == "max":
        return np.maximum.reduceat(values, starts)
    if resampling in ("med", "q1", "q3"):
        q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[resampling]
        out = np.empty(len(starts))
        for i, (a, b) in enumerate(zip(starts, ends)):
            out[i] = np.quantile(values[a:b], q)
        return out
    if resampling == "mode":
        out = np.empty(len(starts))
        for i, (a, b) in enumerate(zip(starts, ends)):
            vals, counts = np.unique(values[a:b], return_counts=True)
            out[i] = vals[np.argmax(counts)]
        return out
    raise ValueError(f"unsupported area resampler {resampling!r}")


# ---------------------------------------------------------------------------
# High-level compositions matching the reference API
# ---------------------------------------------------------------------------


def union_mosaic(sources: Sequence[WarpSource]) -> Tuple[np.ndarray, GeoInfo]:
    """Reference ``RasterDataset.union`` (gdal.py:890-895): union of
    bounds -> warp with self painted last (earlier sources = others).
    Callers pass sources ordered [other_n, ..., other_1, self]."""
    bs = np.asarray([s.bounds for s in sources])
    bbox = (bs[:, 0].min(), bs[:, 1].min(), bs[:, 2].max(), bs[:, 3].max())
    return warp(sources, bbox=bbox, bbox_crs=sources[-1].crs)


def crop_by_geometry(
    source: WarpSource,
    geometry: RawGeometry,
    geometry_crs=4326,
    extra: Sequence[WarpSource] = (),
    resolution=None,
    out_crs=None,
    resampling: str = "near",
    apply_mask: bool = True,
) -> Tuple[np.ndarray, GeoInfo, np.ndarray]:
    """Reference ``crop_by_geometry`` (gdal.py:819-888): reproject the
    geometry to the raster CRS (+ make_valid repair), envelope bbox ->
    warp (mosaic/out-CRS/resolution) -> rasterize mask -> apply mask.

    Returns (img, geoinfo, mask).
    """
    from gdal_boots_ray.kernels.geometry import is_valid, make_valid, map_coords

    geom = geometry
    if not _same_crs(geometry_crs, source.crs):
        geom = map_coords(geometry, lambda x, y: transform_points(geometry_crs, source.crs, x, y))
        if not is_valid(geom):
            geom = make_valid(geom)

    env = geom_envelope(geom)
    sources = list(extra) + [source]
    img, geoinfo, = warp(
        sources,
        bbox=env,
        bbox_crs=source.crs,
        out_crs=out_crs,
        resolution=resolution,
        resampling=resampling,
    )
    h, w = img.shape[1:]
    # mask rasterized on the warped grid, geometry in the *output* CRS
    mask_geom = geom
    ocrs = out_crs if out_crs is not None else source.crs
    if not _same_crs(source.crs, ocrs):
        mask_geom = map_coords(geom, lambda x, y: transform_points(source.crs, ocrs, x, y))
    mask = rasterize(mask_geom, (h, w), np.asarray(tuple(geoinfo.transform)))
    if apply_mask:
        img = img.copy()
        nod = source.nodata if source.nodata is not None else 0
        img[:, mask == 0] = nod
    return img, geoinfo, mask
