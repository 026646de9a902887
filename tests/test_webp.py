"""kernels/webp.py — from-scratch WebP lossless (VP8L) codec, plus
the GTiff Compression=50001 container wiring (reference
``GTiff.Compress.webp``).  No libwebp exists in this sandbox, so the
wire format is pinned by byte round-trips (the LERC/JP2 precedent);
every decoder path the encoder emits is covered."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_boots_ray.kernels.webp import (
    _canonical_codes,
    _lengths_for,
    _prefix_decode,
    _prefix_encode,
    _Reader,
    webp_decode,
    webp_encode,
)


def _rt(img):
    blob = webp_encode(img)
    assert blob[:4] == b"RIFF" and blob[8:16] == b"WEBPVP8L"
    back = webp_decode(blob)
    ch = img.shape[0]
    assert np.array_equal(back[:ch], img)
    if ch == 3:
        assert np.all(back[3] == 255)
    return blob


def test_roundtrip_shapes_and_contents():
    rng = np.random.default_rng(0)
    smooth = np.cumsum(rng.integers(-2, 3, (3, 64, 64)), axis=2).astype(np.uint8)
    _rt(smooth)
    _rt(rng.integers(0, 256, (3, 64, 64), dtype=np.uint8))  # noise
    _rt(rng.integers(0, 4, (3, 5, 7)).astype(np.uint8))  # tiny odd dims
    _rt(np.array([[[5]], [[6]], [[7]]], np.uint8))  # 1x1
    rgba = np.concatenate([smooth, rng.integers(0, 256, (1, 64, 64), dtype=np.uint8)])
    _rt(rgba)


def test_compresses_for_real():
    rng = np.random.default_rng(1)
    flat = np.full((3, 64, 64), 77, np.uint8)
    assert len(_rt(flat)) < 64  # distance-1 runs collapse the plane
    pal = rng.choice([10, 50, 200], (3, 48, 48)).astype(np.uint8)
    assert len(_rt(pal)) < 0.3 * pal.nbytes  # entropy coding engages
    grad = (np.arange(64 * 96).reshape(64, 96) % 256).astype(np.uint8)
    rows = np.stack([grad] * 3)
    assert len(_rt(rows)) < 0.5 * rows.nbytes  # distance-width row runs


def test_color_cache_toggle():
    rng = np.random.default_rng(2)
    # few distinct WHOLE pixels, scattered so runs can't capture them:
    # the construction the color cache exists for
    palette = rng.integers(0, 256, (40, 3), dtype=np.uint8)
    img = np.transpose(palette[rng.integers(0, 40, (128, 128))], (2, 0, 1)).copy()
    with_cache = webp_encode(img, cache_bits=8)
    without = webp_encode(img, cache_bits=0)
    assert np.array_equal(webp_decode(with_cache)[:3], img)
    assert np.array_equal(webp_decode(without)[:3], img)
    assert len(with_cache) < 0.5 * len(without)


def test_prefix_coded_integers_roundtrip():
    from gdal_boots_ray.kernels.webp import _Writer

    for v in (1, 2, 3, 4, 5, 6, 7, 8, 100, 121, 4096, 16504):
        code, extra, nbits = _prefix_encode(v)
        w = _Writer()
        w.bits(extra, nbits)
        r = _Reader(w.finish())
        assert _prefix_decode(code, r) == v


def test_canonical_codes_are_prefix_free():
    rng = np.random.default_rng(3)
    counts = np.zeros(256, np.int64)
    syms = rng.choice(256, 50, replace=False)
    counts[syms] = rng.integers(1, 1000, 50)
    lengths = _lengths_for(counts)
    codes = _canonical_codes(lengths)
    as_bits = {f"{c:0{l}b}" for c, l in codes.values()}
    assert len(as_bits) == len(codes)
    for a in as_bits:
        for b in as_bits:
            if a != b:
                assert not b.startswith(a)


def test_input_validation():
    with pytest.raises(ValueError, match="3- or 4-channel"):
        webp_encode(np.zeros((2, 10, 10), np.uint8))
    with pytest.raises(ValueError, match="3- or 4-channel"):
        webp_encode(np.zeros((3, 10, 10), np.uint16))
    with pytest.raises(ValueError, match="RIFF"):
        webp_decode(b"not webp")
    with pytest.raises(ValueError, match="external codec"):
        webp_decode(b"RIFF\x10\x00\x00\x00WEBPVP8 \x00\x00\x00\x00")


class TestGTiffWebp:
    def test_roundtrip_strip_and_tiled(self):
        from gdal_boots_ray.kernels.gtiff import (
            gtiff_decode,
            gtiff_decode_window,
            gtiff_encode,
        )

        rng = np.random.default_rng(4)
        img = np.cumsum(rng.integers(-2, 3, (3, 80, 96)), axis=2).astype(np.uint8)
        blob = gtiff_encode(img, compress="webp")
        back, _, _ = gtiff_decode(blob)
        assert np.array_equal(back, img)
        assert len(blob) < img.size
        tiled = gtiff_encode(img, compress="webp", tiled=True, blockxsize=32, blockysize=32)
        win, _, _ = gtiff_decode_window(tiled, 16, 16, 40, 40)
        assert np.array_equal(win, img[:, 16:56, 16:56])

    def test_four_band_and_rejections(self):
        from gdal_boots_ray.kernels.gtiff import gtiff_decode, gtiff_encode

        rng = np.random.default_rng(5)
        rgba = rng.integers(0, 200, (4, 48, 48)).astype(np.uint8)
        back, _, _ = gtiff_decode(gtiff_encode(rgba, compress="webp"))
        assert np.array_equal(back, rgba)
        with pytest.raises(ValueError, match="3- or 4-band"):
            gtiff_encode(rgba[:1], compress="webp")
        with pytest.raises(ValueError, match="3- or 4-band"):
            gtiff_encode(rgba.astype(np.uint16), compress="webp")
        with pytest.raises(ValueError, match="predictor"):
            gtiff_encode(rgba, compress="webp", predictor=2)

    def test_options_mapping(self):
        from gdal_boots_ray.options import GTiff, codec_args

        assert codec_args(GTiff(compress=GTiff.Compress.webp))["compress"] == "webp"
        assert "COMPRESS=WEBP" in GTiff(compress=GTiff.Compress.webp).encode()


def test_webp_through_decode_images_stage():
    """fmt='webp' rows in the images table decode through the same
    actor-pool stage as png/tiff/jp2/jpeg."""
    from gdal_boots_ray.kernels.png import decode_image, encode_image
    from gdal_boots_ray.stages.decode import DecodeImages, batch_pixel_views

    rng = np.random.default_rng(10)
    img = np.cumsum(rng.integers(-2, 3, (3, 32, 32)), axis=2).astype(np.uint8)
    blob = encode_image(img, "webp")
    assert np.array_equal(decode_image(blob, "webp"), img)
    batch = pa.table(
        {
            "image_id": pa.array(["w-0"]),
            "bytes": pa.array([blob], pa.binary()),
            "w": pa.array([32], pa.int32()),
            "h": pa.array([32], pa.int32()),
            "fmt": pa.array(["webp"]),
        }
    )
    out = DecodeImages()(batch)
    v = batch_pixel_views(out)[0]
    assert np.array_equal(v if v.ndim == 3 else v[None], img)


def test_huffman_fast_path_and_length_limited_fallback():
    # two-queue fast path: optimal + Kraft equality on ordinary
    # histograms; fibonacci-skewed counts force depth > 15 so the
    # package-merge fallback must produce a limit-respecting code
    # (still Kraft-complete)
    import numpy as np

    from gdal_boots_ray.kernels.huffman import package_merge_lengths

    rng = np.random.default_rng(5)
    for _ in range(50):
        counts = np.zeros(128, np.int64)
        idx = rng.choice(128, int(rng.integers(2, 50)), replace=False)
        counts[idx] = rng.integers(1, 500, len(idx))
        lens = package_merge_lengths(counts, 15)
        assert lens is not None and max(lens.values()) <= 15
        assert abs(sum(2.0 ** -l for l in lens.values()) - 1.0) < 1e-12
    fib = [1, 1]
    for _ in range(26):
        fib.append(fib[-1] + fib[-2])
    counts = np.zeros(32, np.int64)
    counts[:28] = fib[:28]
    lens = package_merge_lengths(counts, 15)
    assert lens is not None and max(lens.values()) == 15
    assert abs(sum(2.0 ** -l for l in lens.values()) - 1.0) < 1e-12
