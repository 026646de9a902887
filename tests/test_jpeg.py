"""Baseline JPEG (kernels/jpeg.py): round-trip fidelity + container
integration tests.

The reference reaches JPEG through GDAL's GTiff driver
(``GTiff.Compress.jpeg``, reference options.py:66-80); this codec
replaces that external dependency.  Encoder and decoder share the
Annex K tables, so the testable correctness properties are (a) the
entropy layer is bit-exact invertible (quantized coefficients
survive), (b) end-to-end distortion stays inside the quantizer's
bound (PSNR monotone in quality, >= 40 dB at the engine's q=95
default on fixture tiles), (c) the TIFF container round-trips
Compression=7 with geo metadata intact."""

import numpy as np
import pytest

from gdal_boots_ray.kernels.jpeg import (
    _build_codes,
    _build_decoder,
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    jpeg_decode,
    jpeg_encode,
)
from gdal_boots_ray.kernels.png import psnr
from gdal_boots_ray.sources.fixtures import tile_pixels


def test_huffman_tables_are_prefix_free():
    for bits, vals in (
        (DC_LUMA_BITS, DC_LUMA_VALS),
        (DC_CHROMA_BITS, DC_CHROMA_VALS),
        (AC_LUMA_BITS, AC_LUMA_VALS),
        (AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        assert sum(bits) == len(vals)
        codes = _build_codes(bits, vals)
        assert len(codes) == len(vals)
        # canonical codes of each length must fit in that length and
        # no code may prefix another (strictly increasing left-padded)
        seen = set()
        for sym, (code, ln) in codes.items():
            assert code < (1 << ln)
            for prior_ln, prior_code in seen:
                if prior_ln < ln:
                    assert (code >> (ln - prior_ln)) != prior_code
            seen.add((ln, code))
        dec = _build_decoder(bits, vals)
        assert all(dec[(ln, code)] == sym for sym, (code, ln) in codes.items())


@pytest.mark.parametrize("key,w,h,bands", [(0, 32, 32, 1), (1, 48, 40, 1), (7, 80, 64, 1), (3, 64, 48, 3)])
def test_roundtrip_psnr_fixture_tiles(key, w, h, bands):
    img = tile_pixels(key, w, h, bands)
    q = 95 if bands == 1 else 98
    back = jpeg_decode(jpeg_encode(img, quality=q))
    ref = img if img.ndim == 3 else img[None]
    assert back.shape == ref.shape
    assert psnr(ref, back) >= 40.0


def test_psnr_monotone_in_quality_and_rate_engages():
    img = tile_pixels(11, 64, 56, 1)
    prev_db, prev_len = -1.0, 0
    for q in (50, 75, 90, 100):
        enc = jpeg_encode(img, quality=q)
        db = psnr(img[None], jpeg_decode(enc))
        assert db > prev_db
        assert len(enc) > prev_len
        prev_db, prev_len = db, len(enc)


def test_flat_and_extreme_blocks():
    # flat fields quantize to DC-only blocks and come back exactly
    for v in (0, 128, 255):
        img = np.full((24, 40), v, np.uint8)
        back = jpeg_decode(jpeg_encode(img, quality=90))
        assert np.array_equal(back[0], img)
    # hard step edge (max ringing) must still round-trip the codec
    img = np.zeros((16, 16), np.uint8)
    img[:, 8:] = 255
    back = jpeg_decode(jpeg_encode(img, quality=100))
    assert psnr(img[None], back) >= 30.0


def test_odd_sizes_pad_and_crop():
    # non-multiple-of-8 sizes exercise edge replication + crop
    for w, h in ((9, 7), (17, 33), (1, 1), (8, 9)):
        img = tile_pixels(5, w, h, 1)
        back = jpeg_decode(jpeg_encode(img, quality=95))
        assert back.shape == (1, h, w)


def test_byte_stuffing_survives():
    # high-entropy random content generates 0xFF bytes in the stream
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (48, 48), np.uint8)
    enc = jpeg_encode(img, quality=100)
    scan = enc[enc.find(b"\xff\xda") :]
    assert b"\xff\x00" in scan  # stuffing actually occurred
    back = jpeg_decode(enc)
    assert psnr(img[None], back) >= 30.0


def test_rejects_non_baseline_input():
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((2, 8, 8), np.uint8))  # 2 bands
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((8, 8), np.uint16))  # 16-bit
    with pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01not a jpeg")


def test_gtiff_jpeg_container_roundtrip():
    from gdal_boots_ray.kernels.gtiff import gtiff_decode, gtiff_encode

    img = tile_pixels(9, 64, 48, 3)
    gt = [10.0, 0.0, 600000.0, 0.0, -10.0, 5700000.0]
    blob = gtiff_encode(img, gt=gt, epsg=32635, compress="jpeg", jpeg_quality=98)
    back, gt2, epsg2 = gtiff_decode(blob)
    assert psnr(img, back) >= 40.0
    assert epsg2 == 32635 and np.allclose(gt2, gt)
    with pytest.raises(ValueError):
        gtiff_encode(img.astype(np.uint16), compress="jpeg")
    with pytest.raises(ValueError):
        gtiff_encode(img, compress="jpeg", predictor=2)


def test_options_jpeg_codec_args_and_encode():
    from gdal_boots_ray.options import GTiff, codec_args

    opts = GTiff(compress=GTiff.Compress.jpeg, jpeg_quality=90)
    assert "COMPRESS=JPEG" in opts.encode()
    assert "JPEG_QUALITY=90" in opts.encode()
    # quality key is hidden at other compressions (same rule as zlevel)
    assert all("JPEG_QUALITY" not in v for v in GTiff(compress=GTiff.Compress.lzw).encode())
    kw = codec_args(opts)
    assert kw == {"fmt": "tiff", "compress": "jpeg", "jpeg_quality": 90}
