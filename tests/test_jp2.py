"""From-scratch JPEG 2000 codec: layer-by-layer round-trip tests.

The reference encodes/decodes JP2 through GDAL's JP2OpenJPEG driver
(reference gdal.py:546-607, tests/test_raster.py:563-625); this
codec replaces that external dependency.  Encoder and decoder share
every table, so lossless round-trip identity over adversarial inputs
is the correctness property (no external JP2 reader exists in this
environment to cross-check conformance)."""

import numpy as np
import pytest

from gdal_boots_ray.kernels.jp2 import dwt53
from gdal_boots_ray.kernels.jp2.codestream import (
    BitReader,
    BitWriter,
    TagTree,
    decode_j2k,
    decode_jp2,
    encode_j2k,
    encode_jp2,
)
from gdal_boots_ray.kernels.jp2.mq import MQDecoder, MQEncoder
from gdal_boots_ray.kernels.jp2.t1 import decode_block, encode_block


def test_mq_roundtrip_random_streams():
    import random

    random.seed(42)
    for _ in range(10):
        n = random.randint(1, 3000)
        seq = [(random.randrange(19), random.getrandbits(1)) for _ in range(n)]
        enc = MQEncoder()
        for cx, d in seq:
            enc.encode(d, cx)
        dec = MQDecoder(enc.flush())
        assert all(dec.decode(cx) == d for cx, d in seq)


def test_mq_pathological_patterns():
    for pat in ([(0, 0)] * 5000, [(0, 1)] * 5000, [(5, i % 2) for i in range(5000)]):
        enc = MQEncoder()
        for cx, d in pat:
            enc.encode(d, cx)
        dec = MQDecoder(enc.flush())
        assert all(dec.decode(cx) == d for cx, d in pat)


def test_dwt53_perfect_reconstruction():
    rng = np.random.default_rng(1)
    for shape in [(1, 1), (2, 1), (3, 3), (5, 7), (17, 31), (64, 64), (65, 63)]:
        a = rng.integers(-300, 300, shape).astype(np.int32)
        for lv in range(0, 5):
            ll, bands = dwt53.forward(a, lv)
            assert (dwt53.inverse(ll, bands) == a).all(), (shape, lv)


def test_t1_block_roundtrip_all_bands():
    rng = np.random.default_rng(2)
    for band in ("LL", "HL", "LH", "HH"):
        for shape in [(4, 4), (7, 5), (64, 64), (13, 64), (1, 1)]:
            c = rng.integers(-900, 901, shape).astype(np.int32)
            data, npl = encode_block(c, band)
            assert (decode_block(data, npl, *shape, band) == c).all()
    # sparse laplacian stats (what wavelets actually produce)
    c = rng.laplace(0, 3, (64, 64)).astype(np.int32)
    data, npl = encode_block(c, "HH")
    assert (decode_block(data, npl, 64, 64, "HH") == c).all()


def test_tagtree_roundtrip():
    rng = np.random.default_rng(3)
    for gw, gh in [(1, 1), (3, 2), (5, 5), (8, 1)]:
        vals = rng.integers(0, 6, (gh, gw)).astype(np.int64)
        enc = TagTree(gw, gh)
        enc.set_values(vals)
        bw = BitWriter()
        for y in range(gh):
            for x in range(gw):
                enc.encode_until_known(bw, x, y)
        br = BitReader(bw.flush())
        dec = TagTree(gw, gh)
        for y in range(gh):
            for x in range(gw):
                assert dec.decode_until_known(br, x, y) == vals[y, x]


def test_bitio_stuffing():
    import random

    random.seed(9)
    bits = [1] * 40 + [random.getrandbits(1) for _ in range(200)]  # force 0xFF bytes
    bw = BitWriter()
    for b in bits:
        bw.put(b)
    br = BitReader(bw.flush())
    assert [br.get() for _ in bits] == bits


def test_jp2_lossless_roundtrip():
    rng = np.random.default_rng(7)
    for shape in [(8, 8), (33, 31), (64, 64), (65, 63)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        out = decode_j2k(encode_j2k(img))
        assert (out[0] == img).all(), shape
    rgb = rng.integers(0, 256, (3, 64, 64)).astype(np.uint8)
    assert (decode_jp2(encode_jp2(rgb)) == rgb).all()  # RCT path
    u16 = rng.integers(0, 65536, (1, 32, 48)).astype(np.uint16)
    out = decode_j2k(encode_j2k(u16))
    assert out.dtype == np.uint16 and (out == u16).all()


def test_jp2_xlbox_codestream():
    # spec-valid JP2 may carry the jp2c payload in an XLBox (length
    # field == 1, 64-bit XL length after the type; ISO 15444-1 I.4)
    import struct

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (1, 16, 16)).astype(np.uint8)
    data = encode_jp2(img)
    # locate the standard jp2c box and rewrap it as an XLBox
    pos = 0
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        if data[pos + 4 : pos + 8] == b"jp2c":
            payload = data[pos + 8 : pos + ln]
            xl = struct.pack(">I", 1) + b"jp2c" + struct.pack(">Q", 16 + len(payload)) + payload
            data = data[:pos] + xl + data[pos + ln :]
            break
        pos += ln
    assert (decode_jp2(data) == img).all()


def test_jp2_compresses_smooth_content():
    x, y = np.meshgrid(np.arange(128), np.arange(128))
    smooth = ((np.sin(x / 9) + np.cos(y / 13)) * 60 + 128).astype(np.uint8)[None]
    data = encode_jp2(smooth)
    assert (decode_jp2(data) == smooth).all()
    assert len(data) < smooth.size / 3  # lossless yet >3x smaller


def test_jp2_via_codec_registry_and_options():
    from gdal_boots_ray.kernels.png import decode_image, encode_image
    from gdal_boots_ray.options import JP2OpenJPEG, codec_args

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (3, 32, 32)).astype(np.uint8)
    # quality >= 100 = REVERSIBLE: bit-exact round trip
    kw = codec_args(JP2OpenJPEG(resolutions=4, quality=100))
    assert kw["fmt"] == "jp2" and kw["levels"] == 3 and "quality" not in kw
    data = encode_image(img, **kw)
    assert data[:4] == b"\x00\x00\x00\x0c"  # JP2 signature box length
    assert (decode_image(data, "jp2") == img).all()

    # the reference's default (quality=25) is LOSSY: rate control must
    # engage (smaller stream) and the reconstruction must stay close
    kw_lossy = codec_args(JP2OpenJPEG(resolutions=4))
    assert kw_lossy["quality"] == 25
    lossy = encode_image(img, **kw_lossy)
    assert len(lossy) < len(data)
    from gdal_boots_ray.kernels.png import psnr

    assert psnr(img, decode_image(lossy, "jp2")) > 30  # random noise, q=25

    # quality=50 (the readme example) clears the 40 dB input_hint gate
    # on representative (non-pure-noise) content
    x, y = np.meshgrid(np.arange(64), np.arange(64))
    smooth = ((np.sin(x / 9) + np.cos(y / 13)) * 60 + 128).astype(np.uint8)[None]
    q50 = encode_image(smooth, **codec_args(JP2OpenJPEG(quality=50)))
    assert psnr(smooth, decode_image(q50, "jp2")) >= 40.0
    assert len(q50) < len(encode_image(smooth, **codec_args(JP2OpenJPEG(quality=100))))


def test_decode_stage_mixed_formats_including_jp2(ray_session):
    """A batch mixing png/raw/jp2 rows decodes through the one
    DecodeImages stage to identical pixels (per-row fmt dispatch)."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_boots_ray.kernels.png import encode_image, raw_encode
    from gdal_boots_ray.stages.decode import DecodeImages, batch_pixel_views

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (3, 40, 40)).astype(np.uint8)
    rows = {
        "image_id": ["a", "b", "c"],
        "bytes": [encode_image(img, "png"), raw_encode(img), encode_image(img, "jp2")],
        "fmt": ["png", "raw", "jp2"],
        "w": [40, 40, 40],
        "h": [40, 40, 40],
    }
    ds = rd.from_arrow(pa.table(rows)).map_batches(DecodeImages, batch_format="pyarrow", concurrency=1)
    tbl = pa.Table.from_pandas(ds.to_pandas())
    views = batch_pixel_views(tbl)
    for v in views:
        assert (v.reshape(img.shape) == img).all()


def test_jp2_error_paths():
    with pytest.raises(ValueError, match="jp2c"):
        decode_jp2(b"garbage")
    with pytest.raises(ValueError, match="SOC"):
        decode_j2k(b"\x00\x01\x02")
    with pytest.raises(ValueError, match="corrupt|truncated"):
        decode_j2k(b"\xff\x4f\xff\x51\x00\x05abc")
    good = encode_j2k(np.zeros((16, 16), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_j2k(good[: len(good) // 3])
