"""Pure-Python media codecs for UNCOMPRESSED containers.

The sandbox ships no libav/soundfile, so compressed codecs stay
behind the documented seams in ``stages/multimodal.py`` — but the
uncompressed formats a data pipeline actually meets at ingest are
fully decodable with struct + numpy:

- **WAV** (RIFF/WAVE): PCM u8 / s16 / s24 / s32 and IEEE float32,
  any channel count.  Samples return normalized float32 in [-1, 1].
- **Y4M** (YUV4MPEG2): the standard uncompressed video interchange
  format (plain-text header + raw planar frames); C420*/C422/C444
  and Cmono subsampling, chroma upsampled by sample-and-hold.

Encoders exist so tests round-trip real bytes through the stages.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE)
# ---------------------------------------------------------------------------


def wav_decode(data: bytes) -> Tuple[np.ndarray, int]:
    """RIFF/WAVE -> (samples float32 (n,) mono or (channels, n), rate).

    Supports PCM (format 1: u8/s16/s24/s32) and IEEE float32
    (format 3).  Values are normalized to [-1, 1]."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_code = channels = rate = bits = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt_code, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt_code is None or payload is None:
        raise ValueError("WAVE missing fmt/data chunk")
    if fmt_code == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(payload, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(payload, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(payload, np.uint8)
            n = len(raw) // 3
            b = raw[: n * 3].reshape(n, 3).astype(np.uint32)
            v = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)).astype(np.int32)
            v = np.where(v & 0x800000, v - 0x1000000, v)
            x = v.astype(np.float32) / 8388608.0
        elif bits == 32:
            x = np.frombuffer(payload, "<i4").astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif fmt_code == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(payload, "<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAVE format code {fmt_code} ({bits}-bit) — "
                         "compressed audio needs an external codec (seam)")
    if channels > 1:
        n = len(x) // channels
        x = x[: n * channels].reshape(n, channels).T.copy()
    return x, int(rate)


def wav_encode(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """float samples in [-1, 1] ((n,) or (channels, n)) -> WAV bytes."""
    x = np.asarray(samples, np.float64)
    if x.ndim == 1:
        x = x[None]
    channels, n = x.shape
    inter = x.T.reshape(-1)
    if bits == 16:
        payload = np.clip(np.rint(inter * 32767.0), -32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        payload = np.clip(np.rint(inter * 127.0) + 128, 0, 255).astype(np.uint8).tobytes()
    elif bits == 32:
        payload = inter.astype("<f4").tobytes()
    else:
        raise ValueError("encode supports 8/16-bit PCM and 32-bit float")
    fmt_code = 3 if bits == 32 else 1
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_code, channels, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2)
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def _y4m_header(data: bytes):
    end = data.index(b"\x0a")
    parts = data[:end].split(b" ")
    if parts[0] != _Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = 25.0
    colorspace = "C420"
    for p in parts[1:]:
        if not p:
            continue
        tag, val = chr(p[0]), p[1:].decode()
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps = float(num) / float(den)
        elif tag == "C":
            colorspace = "C" + val
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    return w, h, fps, colorspace, end + 1


def _y4m_frame_size(w: int, h: int, colorspace: str) -> Tuple[int, int, int]:
    """(y_size, chroma_w, chroma_h) per frame for a colorspace tag."""
    if colorspace.startswith("C420"):
        return w * h, w // 2, h // 2
    if colorspace.startswith("C422"):
        return w * h, w // 2, h
    if colorspace.startswith("C444"):
        return w * h, w, h
    if colorspace.startswith("Cmono"):
        return w * h, 0, 0
    raise ValueError(f"unsupported Y4M colorspace {colorspace}")


def y4m_info(data: bytes) -> dict:
    """(w, h, fps, n_frames) of a Y4M stream without decoding pixels."""
    w, h, fps, cs, pos = _y4m_header(data)
    ys, cw, ch = _y4m_frame_size(w, h, cs)
    frame_bytes = ys + 2 * cw * ch
    n = 0
    while pos < len(data) and data[pos : pos + 5] == b"FRAME":
        pos = data.index(b"\x0a", pos) + 1 + frame_bytes
        n += 1
    return {"w": w, "h": h, "fps": fps, "colorspace": cs, "n_frames": n}


def y4m_decode_frames(data: bytes, indices) -> List[np.ndarray]:
    """Decode the requested frame indices to (3, h, w) uint8 YUV
    planes (chroma sample-and-hold upsampled) or (1, h, w) for mono.
    Out-of-range indices are clamped to the last frame."""
    w, h, fps, cs, pos = _y4m_header(data)
    ys, cw, ch = _y4m_frame_size(w, h, cs)
    frame_bytes = ys + 2 * cw * ch
    offsets = []
    while pos < len(data) and data[pos : pos + 5] == b"FRAME":
        body = data.index(b"\x0a", pos) + 1
        offsets.append(body)
        pos = body + frame_bytes
    if not offsets:
        raise ValueError("Y4M stream has no frames")
    out = []
    for idx in indices:
        i = min(int(idx), len(offsets) - 1)
        o = offsets[i]
        y = np.frombuffer(data, np.uint8, ys, o).reshape(h, w)
        if cw == 0:
            out.append(y[None].copy())
            continue
        u = np.frombuffer(data, np.uint8, cw * ch, o + ys).reshape(ch, cw)
        v = np.frombuffer(data, np.uint8, cw * ch, o + ys + cw * ch).reshape(ch, cw)
        ry = h // max(ch, 1)
        rx = w // max(cw, 1)
        u = np.repeat(np.repeat(u, ry, axis=0), rx, axis=1)[:h, :w]
        v = np.repeat(np.repeat(v, ry, axis=0), rx, axis=1)[:h, :w]
        out.append(np.stack([y, u, v]))
    return out


def y4m_encode(frames: List[np.ndarray], fps: float = 25.0) -> bytes:
    """(3, h, w) YUV444 or (1/2D h, w) mono uint8 frames -> Y4M bytes."""
    f0 = frames[0]
    mono = f0.ndim == 2 or f0.shape[0] == 1
    h, w = f0.shape[-2:]
    cs = b"Cmono" if mono else b"C444"
    num = int(round(fps * 1000))
    head = b"YUV4MPEG2 W%d H%d F%d:1000 Ip A1:1 %s\x0a" % (w, h, num, cs)
    body = bytearray(head)
    for f in frames:
        body += b"FRAME\x0a"
        if mono:
            body += (f if f.ndim == 2 else f[0]).astype(np.uint8).tobytes()
        else:
            body += f.astype(np.uint8).tobytes()
    return bytes(body)
