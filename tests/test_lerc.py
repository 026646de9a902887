"""kernels/lerc.py — from-scratch LERC microblock codec, plus the
GTiff Compression=34887 + LercParameters container wiring (reference
``GTiff.Compress.lerc / lerc_deflate / lerc_zstd``)."""

import numpy as np
import pytest

from gdal_boots_ray.kernels.lerc import (
    lerc_decode,
    lerc_decode_band,
    lerc_encode,
    lerc_encode_band,
)


@pytest.mark.parametrize(
    "dt", [np.int8, np.uint8, np.int16, np.uint16, np.int32, np.uint32]
)
def test_integer_lossless(dt):
    rng = np.random.default_rng(hash(dt.__name__) % 2**32)
    info = np.iinfo(dt)
    x = rng.integers(max(info.min, -30000), min(info.max, 30000), (3, 70, 90)).astype(dt)
    back = lerc_decode(lerc_encode(x))
    assert back.dtype == x.dtype
    assert np.array_equal(back, x)


def test_smooth_data_compresses():
    rng = np.random.default_rng(1)
    sm = (np.cumsum(rng.integers(-2, 3, (1, 64, 64)), axis=2) + 100).astype(np.uint16)
    blob = lerc_encode(sm)
    assert np.array_equal(lerc_decode(blob), sm)
    assert len(blob) < 0.55 * sm.nbytes


@pytest.mark.parametrize("err", [0.5, 0.01])
def test_float_lossy_error_bound(err):
    rng = np.random.default_rng(2)
    f = rng.normal(0, 100, (2, 64, 64)).astype(np.float32)
    blob = lerc_encode(f, max_z_error=err)
    back = lerc_decode(blob)
    assert back.dtype == f.dtype
    assert np.abs(back.astype(np.float64) - f.astype(np.float64)).max() <= err + 1e-12
    assert len(blob) < f.nbytes  # quantization must actually save space


def test_float_lossless_and_const():
    rng = np.random.default_rng(3)
    f = rng.normal(0, 1, (1, 40, 56)).astype(np.float64)
    assert np.array_equal(lerc_decode(lerc_encode(f)), f)
    c = np.full((1, 40, 40), 7.5, np.float32)
    blob = lerc_encode(c)
    assert np.array_equal(lerc_decode(blob), c)
    assert len(blob) < 300  # all-CONST blocks


def test_edge_blocks_non_multiple_of_8():
    rng = np.random.default_rng(4)
    x = rng.integers(0, 255, (1, 37, 53)).astype(np.uint8)
    assert np.array_equal(lerc_decode(lerc_encode(x)), x)


def test_band_blob_self_delimiting():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 100, (30, 30)).astype(np.uint8)
    b = rng.normal(0, 1, (30, 30)).astype(np.float32)
    blob = lerc_encode_band(a) + lerc_encode_band(b)
    a2, pos = lerc_decode_band(blob, 0)
    b2, end = lerc_decode_band(blob, pos)
    assert end == len(blob)
    assert np.array_equal(a2, a) and np.array_equal(b2, b)


def test_nan_inf_blocks_stored_raw():
    """NaN/inf (float nodata encodings) poison the quantizer and its
    own error check (NaN > err is False), so such blocks must store
    raw: values round-trip bit-exactly, the bound still holds for
    finite pixels, and no numpy cast warnings are emitted."""
    import warnings

    rng = np.random.default_rng(7)
    f = rng.normal(0, 50, (1, 40, 40)).astype(np.float32)
    f[0, 3, 5] = np.nan
    f[0, 20, 20] = np.inf
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        blob = lerc_encode(f, max_z_error=0.1)
    back = lerc_decode(blob)
    assert np.isnan(back[0, 3, 5]) and np.isinf(back[0, 20, 20])
    finite = np.isfinite(f)
    assert (
        np.abs(back[finite].astype(np.float64) - f[finite].astype(np.float64)).max()
        <= 0.1
    )


def test_corrupt_rejected():
    with pytest.raises(ValueError, match="Lerc2"):
        lerc_decode(b"not a lerc blob at all")
    rng = np.random.default_rng(6)
    blob = bytearray(lerc_encode(rng.integers(0, 9, (1, 16, 16)).astype(np.uint8)))
    blob[58] = 99  # clobber the first block's method byte
    with pytest.raises(ValueError):
        lerc_decode(bytes(blob))


class TestGTiffLerc:
    def test_roundtrip_all_three_modes(self):
        from gdal_boots_ray.kernels.gtiff import gtiff_decode, gtiff_encode

        rng = np.random.default_rng(7)
        img = np.cumsum(rng.integers(-2, 3, (3, 80, 96)), axis=2).astype(np.uint8)
        sizes = {}
        for comp in ("lerc", "lerc_deflate", "lerc_zstd"):
            blob = gtiff_encode(img, compress=comp)
            back, _, _ = gtiff_decode(blob)
            assert np.array_equal(back, img), comp
            sizes[comp] = len(blob)
        # the additional deflate/zstd pass must actually shrink it
        assert sizes["lerc_deflate"] < sizes["lerc"]
        assert sizes["lerc_zstd"] < sizes["lerc"]

    def test_tiled_windowed_read(self):
        from gdal_boots_ray.kernels.gtiff import gtiff_decode_window, gtiff_encode

        rng = np.random.default_rng(8)
        img = np.cumsum(rng.integers(-2, 3, (3, 80, 96)), axis=2).astype(np.uint8)
        blob = gtiff_encode(
            img, compress="lerc_zstd", tiled=True, blockxsize=32, blockysize=32
        )
        win, _, _ = gtiff_decode_window(blob, 16, 16, 40, 40)
        assert np.array_equal(win, img[:, 16:56, 16:56])

    def test_float_dem_lossy_through_container(self):
        from gdal_boots_ray.kernels.gtiff import gtiff_decode, gtiff_encode

        rng = np.random.default_rng(9)
        dem = (
            1500.0
            + np.cumsum(rng.normal(0, 0.8, (1, 64, 64)), axis=2)
        ).astype(np.float32)
        blob = gtiff_encode(dem, compress="lerc", max_z_error=0.1)
        back, _, _ = gtiff_decode(blob)
        assert np.abs(back.astype(np.float64) - dem[0]).max() <= 0.1 + 1e-9
        assert len(blob) < 0.35 * dem.nbytes

    def test_predictor_rejected(self):
        from gdal_boots_ray.kernels.gtiff import gtiff_encode

        img = np.zeros((1, 16, 16), np.uint8)
        with pytest.raises(ValueError, match="predictor"):
            gtiff_encode(img, compress="lerc", predictor=2)

    def test_options_mapping(self):
        from gdal_boots_ray.options import GTiff, codec_args

        for comp in ("lerc", "lerc_deflate", "lerc_zstd"):
            kw = codec_args(GTiff(compress=getattr(GTiff.Compress, comp)))
            assert kw["compress"] == comp
        kw = codec_args(GTiff(compress=GTiff.Compress.lerc, max_z_error=0.5))
        assert kw["max_z_error"] == 0.5
        enc = GTiff(compress=GTiff.Compress.lerc_zstd, max_z_error=0.5).encode()
        assert "COMPRESS=LERC_ZSTD" in enc and "MAX_Z_ERROR=0.5" in enc
        assert not any(
            v.startswith("MAX_Z_ERROR")
            for v in GTiff(compress=GTiff.Compress.deflate).encode()
        )
