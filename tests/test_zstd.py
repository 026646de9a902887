"""kernels/zstd.py — from-scratch Zstandard (RFC 8878).

The strongest gate available in this sandbox: pyarrow bundles the
reference libzstd, so every test runs BIDIRECTIONAL interop — our
encoder's frames must decode with libzstd, and libzstd's output (all
levels, which exercises repeat offsets, FSE-compressed weights,
treeless literals, RLE/repeat table modes our encoder never emits)
must decode with our decoder.
"""

import numpy as np
import pyarrow as pa
import pytest

from gdal_boots_ray.kernels.zstd import (
    _fse_read_ncount,
    _fse_write_ncount,
    _huf_read_description,
    _huf_weights_for,
    _huf_write_description,
    xxh64,
    zstd_compress,
    zstd_decompress,
)

_REF = pa.Codec("zstd")


def _ref_decompress(blob: bytes, n: int) -> bytes:
    return bytes(_REF.decompress(blob, n))


def _payloads():
    rng = np.random.default_rng(42)
    return {
        "empty": b"",
        "one": b"x",
        "tiny": b"abc",
        "rle": b"A" * 5000,
        "text": b"the quick brown fox jumps over the lazy dog. " * 400,
        "tile": np.tile(np.arange(256, dtype=np.uint8), 256).tobytes(),
        "noise": rng.integers(0, 256, 50000, dtype=np.uint8).tobytes(),
        "walk": np.cumsum(rng.integers(-2, 3, 40000)).astype(np.uint8).tobytes(),
        "skew": bytes(rng.choice(8, 30000).astype(np.uint8) + 65),
        "multi_block": b"0123456789abcdef" * 20000,  # 320 KB -> 3 blocks
    }


def test_roundtrip_all_shapes():
    for name, data in _payloads().items():
        blob = zstd_compress(data)
        assert zstd_decompress(blob) == data, name


def test_compresses_for_real():
    p = _payloads()
    assert len(zstd_compress(p["text"])) < 0.02 * len(p["text"])
    assert len(zstd_compress(p["walk"])) < 0.75 * len(p["walk"])
    assert len(zstd_compress(p["skew"])) < 0.55 * len(p["skew"])
    # noise must fall back to raw blocks, not expand meaningfully
    assert len(zstd_compress(p["noise"])) < len(p["noise"]) + 64


def test_libzstd_decodes_our_frames():
    for name, data in _payloads().items():
        blob = zstd_compress(data)
        assert _ref_decompress(blob, len(data)) == data, name


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_we_decode_libzstd_frames(level):
    codec = pa.Codec("zstd", compression_level=level)
    for name, data in _payloads().items():
        blob = bytes(codec.compress(data))
        assert zstd_decompress(blob) == data, (name, level)


def test_we_decode_libzstd_fuzz():
    """Random sizes x content classes x levels: high levels emit
    repeat offsets, treeless literals, FSE table modes and partition
    orders our own encoder never produces."""
    rng = np.random.default_rng(7)
    for trial in range(24):
        n = int(rng.integers(0, 150000))
        mode = trial % 4
        if mode == 0:
            data = np.cumsum(rng.integers(-3, 4, max(n, 1))).astype(np.uint8).tobytes()[:n]
        elif mode == 1:
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif mode == 2:
            data = (b"pattern!" * (n // 8 + 1))[:n]
        else:
            data = bytes(rng.choice(5, n).astype(np.uint8) + 97)
        lvl = int(rng.integers(1, 20))
        blob = bytes(pa.Codec("zstd", compression_level=lvl).compress(data))
        assert zstd_decompress(blob) == data, (trial, n, lvl)
        ours = zstd_compress(data)
        assert _ref_decompress(ours, n) == data, (trial, n)


def test_multi_block_repeat_offset_state():
    """Repeat-offset state persists ACROSS 128 KiB blocks (RFC 8878).
    Regression: the encoder used to reset rep[0] per block, silently
    corrupting any multi-block payload whose next block led with an
    offset-1 run — libzstd and our decoder both carry the state."""
    rng = np.random.default_rng(99)
    for trial in range(8):
        n = int(rng.integers(131073, 400000))
        if trial % 2:
            data = bytes(rng.choice(5, n).astype(np.uint8) + 97)
        else:
            pat = bytes(rng.integers(0, 256, n % 23 + 1, dtype=np.uint8))
            data = (pat * (n // len(pat) + 1))[:n]
        for cs in (False, True):
            blob = zstd_compress(data, checksum=cs)
            assert zstd_decompress(blob) == data
            assert _ref_decompress(blob, n) == data


def test_checksum_verified():
    data = b"checksum me " * 100
    blob = bytearray(zstd_compress(data, checksum=True))
    assert zstd_decompress(bytes(blob)) == data
    blob[-1] ^= 0xFF  # flip a checksum byte
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(blob))


def test_bad_magic_and_truncation():
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"not zstd data")
    blob = zstd_compress(b"hello world " * 50)
    with pytest.raises(ValueError):
        zstd_decompress(blob[: len(blob) // 2])
    # truncation INSIDE the trailing checksum word is still ValueError
    with pytest.raises(ValueError, match="truncated"):
        zstd_decompress(blob[:-2])


def test_content_size_header_widths():
    # 1-byte (<256), 2-byte (256..65791), 4-byte forms
    for n in (0, 5, 255, 256, 70000):
        data = (np.arange(n) % 251).astype(np.uint8).tobytes() if n else b""
        blob = zstd_compress(data)
        assert zstd_decompress(blob) == data
        assert _ref_decompress(blob, n) == data


def test_xxh64_known_vectors():
    # published XXH64 seed-0 check values
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999


def test_fse_ncount_roundtrip():
    for norm, log in (
        ([4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
          2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1], 6),
        ([1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
          1, 1, -1, -1, -1, -1, -1], 5),
        ([16, 8, 0, 0, 0, 4, 4], 5),  # zero-run repeat flags
        ([30, 1, 1], 5),
    ):
        blob = _fse_write_ncount(norm, log)
        got, got_log, consumed = _fse_read_ncount(blob, 0, len(norm) - 1, 9)
        assert got_log == log
        assert got[: len(norm)] == norm
        assert consumed == len(blob)


def test_huffman_description_roundtrip_both_forms():
    rng = np.random.default_rng(1)
    # narrow alphabet -> direct 4-bit form is eligible
    counts = np.bincount(rng.choice(12, 2000).astype(np.int64), minlength=256)
    w = _huf_weights_for(counts)
    desc = _huf_write_description(w)
    table, consumed = _huf_read_description(bytes(desc), 0)
    assert table.weights == w
    assert consumed == len(desc)
    # wide alphabet (256 symbols) -> FSE-compressed weights mandatory
    counts = np.bincount(
        np.cumsum(rng.integers(-2, 3, 20000)).astype(np.uint8), minlength=256
    )
    w = _huf_weights_for(counts)
    desc = _huf_write_description(w)
    assert desc[0] < 128  # FSE form
    table, consumed = _huf_read_description(bytes(desc), 0)
    assert table.weights == w


def test_kraft_equality_from_package_merge():
    rng = np.random.default_rng(2)
    for _ in range(20):
        k = int(rng.integers(2, 200))
        counts = np.zeros(256, np.int64)
        syms = rng.choice(256, k, replace=False)
        counts[syms] = rng.integers(1, 10000, k)
        w = _huf_weights_for(counts)
        slots = sum(1 << (x - 1) for x in w if x)
        assert slots & (slots - 1) == 0  # power of two => decodable table


def test_gtiff_zstd_integration():
    from gdal_boots_ray.kernels.gtiff import gtiff_encode, gtiff_decode
    from gdal_boots_ray.options import GTiff, codec_args

    assert codec_args(GTiff(compress=GTiff.Compress.zstd))["compress"] == "zstd"
    rng = np.random.default_rng(3)
    img = np.cumsum(rng.integers(-2, 3, (3, 80, 96)), axis=2).astype(np.uint8)
    for kw in (
        {"compress": "zstd"},
        {"compress": "zstd", "predictor": 2},
        {"compress": "zstd", "tiled": True, "blockxsize": 32, "blockysize": 32},
    ):
        blob = gtiff_encode(img, **kw)
        back, _, _ = gtiff_decode(blob)
        assert np.array_equal(back, img), kw
    # horizontal differencing should beat plain zstd on smooth data
    plain = gtiff_encode(img, compress="zstd")
    pred = gtiff_encode(img, compress="zstd", predictor=2)
    assert len(pred) < len(plain)


def test_gtiff_zstd_windowed_read():
    from gdal_boots_ray.kernels.gtiff import gtiff_decode_window, gtiff_encode

    rng = np.random.default_rng(4)
    img = np.cumsum(rng.integers(-2, 3, (1, 96, 96)), axis=2).astype(np.uint8)
    blob = gtiff_encode(img, compress="zstd", tiled=True, blockxsize=32, blockysize=32)
    win, _, _ = gtiff_decode_window(blob, 24, 24, 48, 48)
    assert np.array_equal(win, img[0, 24:72, 24:72])
