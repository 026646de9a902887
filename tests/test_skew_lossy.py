"""Salted-cell skew handling + lossy PSNR fidelity gate."""

import numpy as np
import pyarrow as pa
import pytest


def test_plan_salts():
    from gdal_boots_ray.stages.skew import plan_salts

    hist = {1: 100, 2: 95_000, 3: 10_001}
    salts = plan_salts(hist, hot_threshold=10_000)
    assert 1 not in salts
    assert salts[2] == 10 and salts[3] == 2


def test_salted_cell_aggregate(ray_session):
    import ray.data as rd

    from gdal_boots_ray.stages.skew import cell_histogram, salted_cell_aggregate

    rng = np.random.default_rng(2)
    # one hot cell (90% of rows) + 10 cold cells
    n = 20_000
    hot = rng.random(n) < 0.9
    cells = np.where(hot, 7, rng.integers(100, 110, n)).astype(np.int64)
    t = pa.table(
        {
            "cell": pa.array(cells),
            "phash": pa.array(rng.integers(0, 1 << 30, n), pa.int64()),
            "v": pa.array(np.ones(n)),
        }
    )
    ds = rd.from_arrow(t)
    hist = cell_histogram(ds)
    assert hist[7] > 15_000
    out = salted_cell_aggregate(ds, {"n": "count", "v": "sum"}, hot_threshold=2_000).to_pandas()
    got = dict(zip(out["cell"], out["n"]))
    expect = dict(zip(*np.unique(cells, return_counts=True)))
    assert got == {int(k): int(v) for k, v in expect.items()}
    assert np.allclose(sorted(out["v"]), sorted(expect.values()))


def test_lossy_quantize_psnr():
    from gdal_boots_ray.kernels.png import psnr
    from gdal_boots_ray.stages.decode import lossy_quantize

    rng = np.random.default_rng(31415926)
    img = rng.integers(0, 255, (3, 128, 128)).astype(np.uint8)
    q5 = lossy_quantize(img, 5)
    assert psnr(img, q5) >= 40.0  # BASELINE.json lossy gate
    q4 = lossy_quantize(img, 4)
    assert psnr(img, q4) < 40.0 < psnr(img, q5)
    assert lossy_quantize(img, 8) is img


def test_lossy_encode_roundtrip(ray_session):
    import ray.data as rd

    from gdal_boots_ray.kernels.png import psnr
    from gdal_boots_ray.sources.fixtures import synth_images_batch, tile_pixels
    from gdal_boots_ray.stages.decode import DecodeImages, EncodeImages, batch_pixel_views

    batch = DecodeImages()(synth_images_batch(np.arange(8)))
    enc = EncodeImages(quantize_bits=5)(batch)
    dec = DecodeImages()(enc)
    views = batch_pixel_views(dec)
    for i, iid in enumerate(dec.column("image_id").to_pylist()):
        k = int(iid.split("-")[1])
        orig = tile_pixels(k, views[i].shape[-1], views[i].shape[-2])
        assert psnr(orig, views[i] if views[i].ndim == 2 else views[i][0]) >= 40.0
        # caption fidelity per row (input_hint)
        assert dec.column("caption")[i].as_py() == f"tile {iid}"
