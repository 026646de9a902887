"""RGBA composition + crop flow (reference tests/test_utils.py:14-26,
gated upstream on an extra Sentinel-2 file; reproduced here with a
synthetic band): create 4-band raster, per-band slice writes, opaque
alpha, crop_by_geometry, encode PNG + GTiff."""

import numpy as np

from gdal_boots_ray.kernels.geometry import transform_geojson
from gdal_boots_ray.kernels.png import decode_image, encode_image
from gdal_boots_ray.kernels.raster_ops import write_window
from gdal_boots_ray.kernels.warp import WarpSource, crop_by_geometry


def test_rgba_composition_crop_encode(minsk_polygon):
    rng = np.random.default_rng(31415926)
    band = rng.integers(0, 255, (512, 512)).astype(np.uint8)
    # B04-like grid: 35UNV tile footprint at ~214m so the Minsk polygon
    # fits inside (reference uses the 10980px 10m B04.tif)
    gt = np.array([214.0, 0, 499980.0, 0, -214.0, 6000000.0])

    rgba = np.zeros((4, 512, 512), np.uint8)
    write_window(rgba, 0, band)
    write_window(rgba, 1, band)
    write_window(rgba, 2, band)
    write_window(rgba, 3, int(np.iinfo(np.uint8).max))  # no transparency
    assert (rgba[3] == 255).all() and np.array_equal(rgba[0], band)

    src = WarpSource(rgba, gt, 32635)
    cropped, gi, mask = crop_by_geometry(src, minsk_polygon, geometry_crs=4326)
    assert cropped.shape[0] == 4
    assert mask.max() == 1
    # alpha stays opaque inside the mask
    assert (cropped[3][mask == 1] == 255).all()
    assert (cropped[3][mask == 0] == 0).all()

    png = encode_image(cropped, "png")
    assert np.array_equal(decode_image(png, "png"), cropped)
    tif = encode_image(cropped, "tiff", gt=list(gi.transform), epsg=gi.epsg, compress="deflate")
    assert tif[:3] == b"II*"
    assert np.array_equal(decode_image(tif, "tiff"), cropped)
