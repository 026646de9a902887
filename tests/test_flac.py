"""kernels/flac.py — from-scratch FLAC codec (RFC 9639).

Round-trips are bit-exact by construction (FLAC is lossless); every
decoder path the encoder can reach is exercised with real bytes, and
the hand-built-bitstream tests cover decoder paths (rice2, high
partition orders) the encoder does not emit.
"""

import numpy as np
import pytest

from gdal_boots_ray.kernels.flac import (
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_decode_num,
    _utf8_encode_num,
    flac_decode,
    flac_encode,
    flac_info,
)


def _walk(n, seed=0, step=50, lim=32767):
    rng = np.random.default_rng(seed)
    return np.clip(np.cumsum(rng.integers(-step, step + 1, n)), -lim, lim)


def test_mono_fixed_roundtrip_compresses():
    x = _walk(10000)
    blob = flac_encode(x, 8000, bits=16)
    y, rate, bits = flac_decode(blob, verify_md5=True)
    assert np.array_equal(x, y)
    assert (rate, bits) == (8000, 16)
    assert y.dtype == np.int32
    # a random walk is highly predictable: real compression, not a
    # verbatim container
    assert len(blob) < 0.6 * (2 * len(x))


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_modes_roundtrip(mode):
    left = _walk(9000, seed=1)
    right = (left * 0.7).astype(np.int64) + _walk(9000, seed=2, step=5)
    st = np.stack([left, np.clip(right, -32768, 32767)])
    blob = flac_encode(st, 44100, bits=16, stereo_mode=mode)
    y, rate, _ = flac_decode(blob, verify_md5=True)
    assert y.shape == st.shape
    assert np.array_equal(st, y)
    assert rate == 44100


def test_joint_stereo_actually_decorrelates():
    left = _walk(16384, seed=3)
    st = np.stack([left, left + 1])  # side channel is constant 1
    ind = flac_encode(st, 48000, stereo_mode="independent")
    ls = flac_encode(st, 48000, stereo_mode="left_side")
    assert len(ls) < 0.7 * len(ind)
    assert np.array_equal(flac_decode(ls)[0], st)


def test_lpc_roundtrip_exact_on_sine():
    t = np.arange(12000)
    sine = np.round(20000 * np.sin(2 * np.pi * t / 100)).astype(np.int64)
    blob = flac_encode(sine, 8000, bits=16, lpc_order=8)
    y, _, _ = flac_decode(blob, verify_md5=True)
    assert np.array_equal(sine, y)
    assert b"fLaC" == blob[:4]


@pytest.mark.parametrize("bits", [8, 16, 24])
def test_bit_depths(bits):
    m = (1 << (bits - 1)) - 1
    rng = np.random.default_rng(bits)
    x = rng.integers(-m // 2, m // 2, 5000)
    y, rate, got_bits = flac_decode(flac_encode(x, 16000, bits=bits), verify_md5=True)
    assert got_bits == bits
    assert np.array_equal(x, y)


def test_constant_and_empty_blocks():
    c = np.full(3000, -1234)
    blob = flac_encode(c, 8000)
    assert len(blob) < 200  # CONSTANT subframes: a handful of bytes
    assert np.array_equal(c, flac_decode(blob, verify_md5=True)[0])
    silent = np.zeros(4096, np.int64)
    assert np.array_equal(silent, flac_decode(flac_encode(silent, 8000))[0])


def test_wasted_bits_detected_and_restored():
    x = _walk(4000, seed=5, step=100, lim=4000) * 8  # 3 shared low zero bits
    blob = flac_encode(x, 8000)
    ref = flac_encode(x, 8000, bits=24)  # same payload, wider bps
    assert np.array_equal(x, flac_decode(blob, verify_md5=True)[0])
    assert np.array_equal(x, flac_decode(ref, verify_md5=True)[0])


def test_partial_final_block_and_odd_blocksize():
    x = _walk(10001)  # 2 full 4096 frames + 1809 tail
    assert np.array_equal(x, flac_decode(flac_encode(x, 8000), verify_md5=True)[0])
    x2 = _walk(700)
    assert np.array_equal(
        x2, flac_decode(flac_encode(x2, 8000, block_size=192), verify_md5=True)[0]
    )


def test_nonstandard_sample_rate_header():
    x = _walk(2000)
    for rate in (8000, 11025, 22050, 12345):
        _, got, _ = flac_decode(flac_encode(x, rate))
        assert got == rate


def test_crc_catches_corruption():
    blob = bytearray(flac_encode(_walk(8000), 8000))
    blob[-10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        flac_decode(bytes(blob))
    hdr = bytearray(flac_encode(_walk(8000), 8000))
    frames_at = flac_info(bytes(hdr))["frames_at"]
    hdr[frames_at + 2] ^= 0x04  # flip a frame-header bit
    with pytest.raises(ValueError):
        flac_decode(bytes(hdr))


def test_flac_info_without_decode():
    st = np.stack([_walk(5000), _walk(5000, seed=9)])
    info = flac_info(flac_encode(st, 22050, bits=16))
    assert info["rate"] == 22050
    assert info["channels"] == 2
    assert info["bits"] == 16
    assert info["total_samples"] == 5000


def test_utf8_coded_numbers_roundtrip():
    for v in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, 1 << 25, 1 << 30, (1 << 36) - 1):
        enc = _utf8_encode_num(v)
        r = _BitReader(enc)
        assert _utf8_decode_num(r) == v


def test_crc_known_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 over "123456789" are the
    # published check values for these polynomials (init 0, no reflect)
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_decoder_rice2_and_partitioned_residual():
    """Hand-build a frame using rice2 (5-bit params) and partition
    order 2 — paths the encoder never emits."""
    n, bits, rate = 512, 16, 8000
    rng = np.random.default_rng(7)
    x = rng.integers(-3000, 3000, n)

    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(9, 4)       # blocksize 512
    w.write(4, 4)       # rate 8000
    w.write(0, 4)       # 1 channel
    w.write(4, 3)       # 16 bits
    w.write(0, 1)
    w.write(0, 8)       # frame number 0 (utf8)
    hdr = w.getvalue()
    w.write(_crc8(hdr), 8)
    # VERBATIM would be simplest but we want residual paths: FIXED order 0
    w.write(0, 1)
    w.write(8, 6)       # FIXED order 0
    w.write(0, 1)
    w.write(1, 2)       # rice2
    w.write(2, 4)       # partition order 2 -> 4 partitions of 128
    z = np.where(x >= 0, x << 1, ((-x) << 1) - 1)
    for part in range(4):
        seg = z[part * 128:(part + 1) * 128]
        p = 12
        w.write(p, 5)
        for u in seg:
            u = int(u)
            w.write_unary(u >> p)
            w.write(u & ((1 << p) - 1), p)
    w.align()
    body = w.getvalue()
    frame = body + _crc16(body).to_bytes(2, "big")

    si = _BitWriter()
    si.write(512, 16)
    si.write(512, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    stream = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si.getvalue() + b"\x00" * 16 + frame
    y, got_rate, got_bits = flac_decode(stream)
    assert np.array_equal(x, y)
    assert (got_rate, got_bits) == (rate, bits)


def test_encoder_raw_escape_on_white_noise():
    """Full-range white noise defeats rice coding; the encoder must
    fall back to the raw-bit escape and still round-trip."""
    rng = np.random.default_rng(11)
    x = rng.integers(-32768, 32768, 4096)
    blob = flac_encode(x, 8000)
    assert np.array_equal(x, flac_decode(blob, verify_md5=True)[0])
