"""Writer/codec configuration dataclasses.

Mirrors the reference's GDAL driver-options system
(reference options.py:17-146): dataclasses named after the format,
``encode()`` rendering upper-cased ``KEY=VALUE`` pairs (Enum values
unwrapped, None skipped), plus the GTiff rule of dropping ``zlevel``
unless compression is deflate (options.py:88-92).  The engine consumes
them through ``codec_args()`` which maps a dataclass to our pure-NumPy
codec kwargs; new formats register by subclassing ``DriverOptions``
(same user-extension surface as the reference, SURVEY §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import List, Optional

__all__ = (
    "DriverOptions",
    "PNG",
    "GTiff",
    "RAW",
    "JP2OpenJPEG",
    "ECW",
    "GeoJSON",
    "Parquet",
    "codec_args",
)


def _encode(values) -> List[str]:
    return [
        ("=".join([name, str(value.value if isinstance(value, Enum) else value)])).upper()
        for name, value in values.items()
        if value is not None
    ]


class DriverOptions:
    def encode(self) -> List[str]:
        return _encode(vars(self))

    @property
    def driver_name(self) -> str:
        return type(self).__name__

    @property
    def fmt(self) -> str:
        return self.driver_name.lower()


@dataclass
class PNG(DriverOptions):
    """reference options.py:43-56."""

    zlevel: int = 6
    nbits: Optional[int] = None
    title: Optional[str] = None
    description: Optional[str] = None
    comment: Optional[str] = None
    write_metadata_as_text: Optional[str] = None


@dataclass
class GTiff(DriverOptions):
    """reference options.py:58-92.  The full reference ``Compress``
    enum is mirrored; our pure-NumPy codec honors DEFLATE (+zlevel),
    LZW and PACKBITS (kernels/gtiff.py), each optionally with the
    horizontal-differencing predictor; JPEG is the from-scratch
    baseline T.81 codec (kernels/jpeg.py, Compression=7 single-strip,
    ``jpeg_quality`` is an engine extension like ``predictor``);
    ZSTD is the from-scratch RFC 8878 codec in kernels/zstd.py
    (Compression=50000, the GDAL-registered tag; streams interop with
    libzstd both directions); LERC / LERC_DEFLATE / LERC_ZSTD are the
    from-scratch microblock codec in kernels/lerc.py (Compression=
    34887 + LercParameters tag, ``max_z_error`` engine extension for
    the lossy float path); WEBP is the from-scratch VP8L *lossless*
    codec in kernels/webp.py (Compression=50001, 3/4-band uint8).
    Every Compress enum member is now backed by a working in-repo
    codec; the only remaining external-codec seam is the proprietary
    ECW driver (its options still encode for parity).  ``tiled=True`` + ``blockxsize``/``blockysize`` produce the
    TIFF 6.0 tiled layout (kernels/gtiff.py) so windowed reads decode
    O(touched tiles) — the cloud-optimized-GeoTIFF access pattern."""

    class Compress(Enum):
        lzw = "LZW"
        jpeg = "JPEG"
        packbits = "PACKBITS"
        deflate = "DEFLATE"
        zstd = "ZSTD"
        webp = "WEBP"
        lerc = "LERC"
        lerc_deflate = "LERC_DEFLATE"
        lerc_zstd = "LERC_ZSTD"

    class Interleave(Enum):
        band = "BAND"
        pixel = "PIXEL"

    blockxsize: int = 256
    blockysize: int = 256
    tiled: bool = False
    interleave: "GTiff.Interleave" = Interleave.pixel
    compress: Optional["GTiff.Compress"] = None
    nbits: Optional[int] = None
    zlevel: int = 6
    predictor: int = 1
    jpeg_quality: int = 95
    max_z_error: float = 0.0  # LERC error bound (engine extension)

    def encode(self) -> List[str]:
        values = dict(vars(self))
        if self.compress != self.Compress.deflate:
            values.pop("zlevel", None)
        if self.predictor == 1:
            values.pop("predictor", None)
        if self.compress != self.Compress.jpeg:
            values.pop("jpeg_quality", None)
        if self.compress not in (
            self.Compress.lerc, self.Compress.lerc_deflate, self.Compress.lerc_zstd,
        ) or not self.max_z_error:
            values.pop("max_z_error", None)
        return _encode(values)


@dataclass
class RAW(DriverOptions):
    """engine-native C-order dump (kernels/png.py raw codec)."""


@dataclass
class JP2OpenJPEG(DriverOptions):
    """reference options.py:95-109 — backed by the from-scratch
    lossless JPEG 2000 codec in kernels/jp2 (5/3 reversible DWT +
    EBCOT Tier-1 + MQ coder + Tier-2 packets); ``resolutions`` maps
    to DWT levels.  Lossy rate control is out of scope."""

    quality: float = 25
    resolutions: Optional[int] = None
    blockxsize: int = 1024
    blockysize: int = 1024
    nbits: Optional[int] = None
    tileparts: str = "disabled"
    write_metadata: bool = True


@dataclass
class ECW(DriverOptions):
    """reference options.py:111-122 — option parity only (codec seam)."""

    target: Optional[int] = None
    ecw_format_version: Optional[int] = None


@dataclass
class GeoJSON(DriverOptions):
    """reference options.py:132-138."""

    write_bbox: str = "NO"


@dataclass
class Parquet(DriverOptions):
    """sink options for ``write_parquet`` outputs."""

    compression: str = "snappy"
    row_group_size: Optional[int] = None


def codec_args(options: DriverOptions) -> dict:
    """DriverOptions -> encode_image kwargs for our codecs."""
    if isinstance(options, PNG):
        return {"fmt": "png", "zlevel": options.zlevel}
    if isinstance(options, GTiff):
        kw = {"fmt": "tiff"}
        if options.compress == GTiff.Compress.deflate:
            kw.update(compress="deflate", zlevel=options.zlevel)
        elif options.compress == GTiff.Compress.lzw:
            kw.update(compress="lzw")
        elif options.compress == GTiff.Compress.packbits:
            kw.update(compress="packbits")
        elif options.compress == GTiff.Compress.zstd:
            # from-scratch RFC 8878 codec (kernels/zstd.py) — real
            # compressed frames, interop-tested against libzstd
            kw.update(compress="zstd")
        elif options.compress == GTiff.Compress.webp:
            # from-scratch VP8L lossless codec (kernels/webp.py);
            # lossy VP8 stays a seam — lossless is what a data
            # pipeline wants for raster fidelity anyway
            kw.update(compress="webp")
        elif options.compress in (
            GTiff.Compress.lerc,
            GTiff.Compress.lerc_deflate,
            GTiff.Compress.lerc_zstd,
        ):
            # from-scratch LERC microblock codec (kernels/lerc.py);
            # _deflate/_zstd wrap the payload in zlib / kernels/zstd.py
            kw.update(compress=options.compress.value.lower())
            if options.max_z_error:
                kw.update(max_z_error=options.max_z_error)
        elif options.compress == GTiff.Compress.jpeg:
            kw.update(compress="jpeg", jpeg_quality=options.jpeg_quality)
        elif options.compress is not None:
            raise NotImplementedError(
                f"GTiff compression {options.compress.value} needs an external "
                "codec (none in this environment); options encode for parity"
            )
        if options.interleave == GTiff.Interleave.band:
            raise NotImplementedError("BAND (planar) interleave not supported")
        if options.predictor != 1:
            kw.update(predictor=options.predictor)
        if options.tiled:
            kw.update(
                tiled=True,
                blockxsize=options.blockxsize,
                blockysize=options.blockysize,
            )
        return kw
    if isinstance(options, RAW):
        return {"fmt": "raw"}
    if isinstance(options, JP2OpenJPEG):
        # from-scratch JPEG 2000 (kernels/jp2): 5/3 DWT + EBCOT + MQ.
        # `resolutions` maps to DWT levels; quality < 100 selects the
        # lossy quantized-subband path (quality=50 keeps PSNR >= 40 dB,
        # the input_hint fidelity gate; reference readme.md:46 /
        # options.py:124-130), quality >= 100 is lossless/REVERSIBLE.
        kw = {"fmt": "jp2"}
        if options.resolutions is not None:
            kw["levels"] = max(int(options.resolutions) - 1, 0)
        if options.quality is not None and float(options.quality) < 100:
            kw["quality"] = float(options.quality)
        return kw
    if isinstance(options, ECW):
        raise NotImplementedError(
            f"{options.driver_name} needs an external wavelet codec (none in this "
            "environment); options encode for parity, the codec is a seam"
        )
    raise ValueError(f"no codec for driver {options.driver_name}")
