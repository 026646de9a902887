"""write_window selector matrix (reference tests/test_raster.py:503-520),
add_band/as_type, meta codec, GeoTIFF codec, polygonize, options."""

import json

import numpy as np
import pytest

from gdal_boots_ray.kernels.gtiff import gtiff_decode, gtiff_encode
from gdal_boots_ray.kernels.polygonize import label_components, polygonize
from gdal_boots_ray.kernels.raster_ops import add_band, as_type, imdict, meta_decode, meta_encode, write_window
from gdal_boots_ray.options import GTiff, PNG, RAW, codec_args


class TestWriteWindow:
    """reference test_write (tests/test_raster.py:503-520)."""

    def test_selector_matrix(self):
        img3 = np.ones((3, 5, 5))
        img3[0], img3[1], img3[2] = 1, 2, 3

        ds = np.zeros((3, 5, 5))
        write_window(ds, slice(None), 1)
        assert (ds == 1).all()
        write_window(ds, slice(None), img3)
        assert np.array_equal(ds, img3)
        write_window(ds, 0, img3[0])
        write_window(ds, (slice(None), 0), 1)
        assert (ds[:, 0] == 1).all()
        write_window(ds, (slice(1, 3), slice(1, 3), slice(None)), 1)
        assert (ds[1:3, 1:3, :] == 1).all()
        write_window(ds, ((0, 2), slice(2, 5), slice(2, 5)), img3[(0, 2), :3, :3])
        assert (ds[0, 2:5, 2:5] == 1).all() and (ds[2, 2:5, 2:5] == 3).all()

        ds2 = np.zeros((10, 10))
        write_window(ds2, (slice(2, 5), slice(2, 5)), 1)
        assert ds2[2:5, 2:5].all() and ds2.sum() == 9

    def test_broadcast_error(self):
        ds = np.zeros((3, 5, 5))
        with pytest.raises(ValueError, match="could not broadcast"):
            write_window(ds, (0, slice(None), slice(None)), np.ones((2, 5, 5)))

    def test_too_many_indices(self):
        ds = np.zeros((5, 5))
        with pytest.raises(IndexError):
            write_window(ds, (0, slice(None), slice(None)), 1)


def test_add_band_as_type():
    img = np.ones((2, 4, 4), np.uint8)
    out = add_band(img, np.full((4, 4), 7, np.uint8))
    assert out.shape == (3, 4, 4) and (out[2] == 7).all()
    f = as_type(out, np.float32)
    assert f.dtype == np.float32 and (f[2] == 7).all()


def test_meta_codec_roundtrip():
    # reference meta semantics (gdal.py:230-239, tests/test_raster.py:563-625)
    meta = {"one": 1, "test1": "string", "test2": 1.4, "nested": {"a": [1, 2]}}
    s = meta_encode(meta)
    assert all(json.loads(s)[k].startswith("json:") for k in meta)
    out = meta_decode(s)
    assert dict(out) == meta
    with pytest.raises(TypeError):
        out["nope"] = 1  # imdict immutability (gdal.py:91-109)
    assert meta_decode(None) == {}


class TestGTiff:
    def test_roundtrip_dtypes(self):
        rng = np.random.default_rng(31415926)
        for shape, dt in [((16, 12), np.uint8), ((3, 8, 9), np.uint8), ((2, 6, 5), np.uint16), ((4, 4), np.float32)]:
            img = (rng.random(shape) * 100).astype(dt)
            for compress in (None, "deflate"):
                data = gtiff_encode(img, compress=compress)
                out, gt, epsg = gtiff_decode(data)
                assert out.shape == img.shape and out.dtype == dt
                assert np.array_equal(out, img), (shape, dt, compress)

    def test_magic_and_geo(self):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        gt = [10.0, 0, 600000.0, 0, -10.0, 5700000.0]
        data = gtiff_encode(img, gt=gt, epsg=32631, compress="deflate", zlevel=9)
        assert data[:3] == b"II*"  # reference asserts the magic (test_raster.py:100)
        out, gt2, epsg = gtiff_decode(data)
        assert np.array_equal(out, img)
        assert np.allclose(gt2, gt) and epsg == 32631

    def test_geographic_key(self):
        img = np.zeros((2, 2), np.uint8)
        _, _, epsg = gtiff_decode(gtiff_encode(img, gt=[1, 0, 0, 0, -1, 1], epsg=4326))
        assert epsg == 4326

    def test_lzw_packbits_predictor_matrix(self):
        # reference GTiff.Compress parity (reference options.py:66-80):
        # LZW + PACKBITS through the pure-python codecs, with and
        # without the horizontal-differencing predictor
        rng = np.random.default_rng(777)
        for dt in (np.uint8, np.uint16, np.int32, np.float32):
            for compress in ("lzw", "packbits"):
                preds = (1, 2) if np.dtype(dt).kind in "ui" else (1,)
                for pred in preds:
                    for bands in (1, 3):
                        img = (rng.random((bands, 23, 31)) * 200).astype(dt)
                        blob = gtiff_encode(img, compress=compress, predictor=pred)
                        out, _, _ = gtiff_decode(blob)
                        out = out if out.ndim == 3 else out[None]
                        assert np.array_equal(out, img), (dt, compress, pred, bands)

    def test_lzw_stream_shape(self):
        from gdal_boots_ray.kernels.gtiff import lzw_decode, lzw_encode

        # first 9-bit code is ClearCode(256) => first byte 0b1000_0000
        assert lzw_encode(b"abc")[0] == 0x80
        rng = np.random.default_rng(5)
        for data in (b"", b"x", b"ab" * 5000, bytes(rng.integers(0, 256, 60000, dtype=np.uint8)),
                     b"\x00" * 100000, bytes(range(256)) * 300):
            assert lzw_decode(lzw_encode(data)) == data
        # compressible input actually shrinks (table resets included)
        assert len(lzw_encode(b"\x00" * 100000)) < 4000

    def test_lzw_width_bump_at_final_code(self):
        """Regression (hypothesis find): incompressible input whose
        FINAL code lands exactly on the 9->10-bit early-change boundary
        (decoder table add between last data code and EOI).  The encoder
        must emit EOI at the bumped width — libtiff's LZWPostEncode
        free_ent++ semantics — or the decoder reads a garbage code."""
        from gdal_boots_ray.kernels.gtiff import lzw_decode, lzw_encode

        rng = np.random.default_rng(266254574)
        # incompressible: every code is a fresh 1-byte phrase, so n
        # bytes => n codes; the decoder's table hits 510 after code 253
        for n in (252, 253, 254, 255, 509, 510, 511, 765, 766, 767):
            data = bytes(rng.permutation(np.arange(256, dtype=np.uint8)).tobytes() * 4)[:n]
            assert lzw_decode(lzw_encode(data)) == data, n

    def test_packbits_spec_vector(self):
        from gdal_boots_ray.kernels.gtiff import packbits_decode, packbits_encode_row

        # the worked example from the TIFF 6.0 spec PackBits section
        src = bytes([0xAA, 0xAA, 0xAA, 0x80, 0x00, 0x2A, 0xAA, 0xAA, 0xAA, 0xAA,
                     0x80, 0x00, 0x2A, 0x22, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA, 0xAA,
                     0xAA, 0xAA, 0xAA, 0xAA])
        expect = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
                        0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
        assert packbits_encode_row(src) == expect
        assert packbits_decode(expect, len(src)) == src

    def test_predictor_requires_compression_and_int(self):
        img = np.zeros((4, 4), np.uint8)
        with pytest.raises(ValueError):
            gtiff_encode(img, predictor=2)  # pointless without compression
        with pytest.raises(ValueError):
            gtiff_encode(np.zeros((4, 4), np.float32), compress="lzw", predictor=2)

    def test_tiled_layout_roundtrip(self):
        # TIFF 6.0 tiled layout (TileWidth/TileLength/TileOffsets/
        # TileByteCounts) — the reference's GTiff(tiled=True,
        # blockxsize, blockysize) options (reference options.py:80-82)
        rng = np.random.default_rng(271828)
        img = rng.integers(0, 256, size=(3, 100, 130), dtype=np.uint8)
        gt = np.array([0.5, 0.0, 100.0, 0.0, -0.5, 200.0])
        for compress in (None, "deflate", "lzw", "packbits"):
            for pred in (1, 2) if compress else (1,):
                blob = gtiff_encode(img, gt=gt, epsg=3857, compress=compress,
                                    predictor=pred, tiled=True,
                                    blockxsize=48, blockysize=32)
                out, gt2, epsg = gtiff_decode(blob)
                assert np.array_equal(out, img), (compress, pred)
                assert epsg == 3857 and np.allclose(gt2, gt)
        # non-uint8 dtypes through the tiled path
        for dt in (np.uint16, np.int32, np.float32):
            im = (rng.random((2, 64, 80)) * 1000).astype(dt)
            blob = gtiff_encode(im, compress="deflate", tiled=True,
                                blockxsize=32, blockysize=16)
            out, _, _ = gtiff_decode(blob)
            assert np.array_equal(out, im), dt
        with pytest.raises(ValueError, match="multiples of 16"):
            gtiff_encode(img, tiled=True, blockxsize=30)

    def test_decode_window(self):
        from gdal_boots_ray.kernels.gtiff import gtiff_decode_window

        rng = np.random.default_rng(161803)
        img = rng.integers(0, 256, size=(3, 100, 130), dtype=np.uint8)
        gt = np.array([0.5, 0.0, 100.0, 0.0, -0.5, 200.0])
        # tiled file: window spanning tile boundaries decodes only
        # intersecting tiles (the cloud-optimized-GeoTIFF access path)
        blob = gtiff_encode(img, gt=gt, epsg=3857, compress="lzw", tiled=True,
                            blockxsize=48, blockysize=32)
        win, wgt, epsg = gtiff_decode_window(blob, 30, 20, 70, 55)
        assert np.array_equal(win, img[:, 20:75, 30:100])
        # window gt is translated to the window origin
        assert np.isclose(wgt[2], gt[2] + gt[0] * 30)
        assert np.isclose(wgt[5], gt[5] + gt[4] * 20)
        assert epsg == 3857
        # strip file: same API, decode-then-crop
        strip = gtiff_encode(img, gt=gt, epsg=3857, compress="deflate")
        win2, wgt2, _ = gtiff_decode_window(strip, 30, 20, 70, 55)
        assert np.array_equal(win2, img[:, 20:75, 30:100])
        assert np.allclose(wgt, wgt2)
        # single-band 2-D stays 2-D
        blob1 = gtiff_encode(img[0], tiled=True, blockxsize=16, blockysize=16)
        w1, _, _ = gtiff_decode_window(blob1, 3, 4, 20, 21)
        assert w1.ndim == 2 and np.array_equal(w1, img[0, 4:25, 3:23])
        with pytest.raises(ValueError, match="outside image"):
            gtiff_decode_window(blob, 100, 90, 40, 20)

    def test_overview_pyramid(self):
        # in-file pyramid: IFD chain of reduced-resolution pages
        # (NewSubfileType=1), AVERAGE pooling, level-scaled gt — the
        # gdaladdo / BuildOverviews output structure
        from gdal_boots_ray.kernels.gtiff import (
            gtiff_decode_overview,
            gtiff_decode_window,
            gtiff_overviews,
            overview_average,
        )

        rng = np.random.default_rng(314159)
        img = rng.integers(0, 256, size=(3, 100, 130), dtype=np.uint8)
        gt = np.array([0.5, 0.0, 100.0, 0.0, -0.5, 200.0])
        for tiled in (False, True):
            blob = gtiff_encode(img, gt=gt, epsg=3857, compress="deflate",
                                predictor=2, tiled=tiled, blockxsize=48,
                                blockysize=32, overviews=(2, 4))
            # page 0 (full res) is what plain decode + window decode see
            out, gt0, epsg = gtiff_decode(blob)
            assert np.array_equal(out, img) and epsg == 3857 and np.allclose(gt0, gt)
            win, _, _ = gtiff_decode_window(blob, 30, 20, 70, 55)
            assert np.array_equal(win, img[:, 20:75, 30:100])
            # overview pages: ceil dims, AVERAGE pooling, scaled gt
            assert gtiff_overviews(blob) == [(65, 50), (33, 25)]
            for oi, lv in enumerate((2, 4)):
                ov, ogt, oepsg = gtiff_decode_overview(blob, oi)
                assert np.array_equal(ov, overview_average(img, lv)), (tiled, lv)
                assert oepsg == 3857
                assert np.allclose(ogt, [gt[0] * lv, 0, gt[2], 0, gt[4] * lv, gt[5]])
        # pooling: partial edge blocks average over contributing pixels
        m = np.arange(30, dtype=np.uint8).reshape(1, 5, 6)
        p = overview_average(m, 4)
        assert p.shape == (1, 2, 2)
        assert p[0, 0, 0] == m[0, :4, :4].sum() // 16
        assert p[0, 1, 1] == (28 + 29) // 2  # 1x2 corner block
        # floats use the true mean
        assert np.allclose(overview_average(np.full((1, 5, 6), 2.5, np.float32), 4), 2.5)
        # plain files have no overview pages
        assert gtiff_overviews(gtiff_encode(img)) == []
        with pytest.raises(ValueError, match="overview factor"):
            gtiff_encode(img, overviews=(1,))
        with pytest.raises(ValueError, match="no page"):
            gtiff_decode_overview(gtiff_encode(img), 0)


class TestPolygonize:
    def test_label_components(self):
        band = np.array([[1, 1, 2], [1, 2, 2], [3, 3, 2]])
        labels, n = label_components(band)
        assert n == 3
        assert labels[0, 0] == labels[1, 0] != labels[0, 2]
        assert labels[0, 2] == labels[1, 1] == labels[2, 2]

    def test_polygonize_patches(self):
        # the reference vectorize fixture shape (test_raster.py:116-134):
        # constant background + two square patches -> 3 components
        band = np.full((20, 20), 64, np.uint8)
        band[2:6, 2:6] = 192
        band[10:14, 10:14] = 250
        feats = polygonize(band, gt=[10.0, 0, 0.0, 0, -10.0, 200.0])
        assert len(feats) == 3
        by_val = {f["value"]: f for f in feats}
        assert set(by_val) == {64, 192, 250}
        # the 192 patch is a 4x4 pixel square -> 40x40 world units
        ring = np.array(by_val[192]["geometry"]["coordinates"][0])
        assert ring[:, 0].max() - ring[:, 0].min() == 40
        assert ring[:, 1].max() - ring[:, 1].min() == 40
        # background polygon has holes (2 interior rings)
        assert len(by_val[64]["geometry"]["coordinates"]) == 3

    def test_diagonal_not_connected(self):
        band = np.array([[1, 0], [0, 1]])
        _, n = label_components(band)
        assert n == 4  # 4-connectivity: diagonals are separate


class TestOptions:
    def test_encode_key_value(self):
        # reference options semantics (options.py:17-27)
        assert PNG(zlevel=9).encode() == ["ZLEVEL=9"]
        enc = GTiff(compress=GTiff.Compress.deflate, zlevel=9).encode()
        assert "COMPRESS=DEFLATE" in enc and "ZLEVEL=9" in enc
        # zlevel dropped unless deflate (options.py:88-92)
        assert not any(e.startswith("ZLEVEL") for e in GTiff().encode())

    def test_codec_args(self):
        assert codec_args(PNG(zlevel=3)) == {"fmt": "png", "zlevel": 3}
        assert codec_args(GTiff(compress=GTiff.Compress.deflate))["compress"] == "deflate"
        assert codec_args(RAW()) == {"fmt": "raw"}
        assert codec_args(GTiff(compress=GTiff.Compress.lzw))["compress"] == "lzw"
        kw = codec_args(GTiff(compress=GTiff.Compress.packbits, predictor=2))
        assert kw["compress"] == "packbits" and kw["predictor"] == 2
        # every Compress member is backed by an in-repo codec now
        assert codec_args(GTiff(compress=GTiff.Compress.zstd))["compress"] == "zstd"
        assert codec_args(GTiff(compress=GTiff.Compress.webp))["compress"] == "webp"
        assert codec_args(GTiff(compress=GTiff.Compress.lerc))["compress"] == "lerc"
        with pytest.raises(NotImplementedError):
            codec_args(GTiff(interleave=GTiff.Interleave.band))
        enc = GTiff(compress=GTiff.Compress.lzw, predictor=2).encode()
        assert "COMPRESS=LZW" in enc and "PREDICTOR=2" in enc
        # tiled options flow through to the codec
        kw = codec_args(GTiff(tiled=True, blockxsize=64, blockysize=48))
        assert kw["tiled"] is True and kw["blockxsize"] == 64 and kw["blockysize"] == 48
        assert "tiled" not in codec_args(GTiff())


class TestGTiffStripsAndPages:
    def test_multi_strip_roundtrip_and_window(self):
        # libtiff-style strip chunking: rows_per_strip slabs, window
        # decode touches only intersecting strips
        rng = np.random.default_rng(424242)
        img = rng.integers(0, 256, size=(3, 100, 64), dtype=np.uint8)
        for compress in (None, "deflate", "lzw", "packbits"):
            for rps in (8, 13, 100, 256):
                blob = gtiff_encode(img, compress=compress, rows_per_strip=rps,
                                    predictor=2 if compress else 1)
                out, _, _ = gtiff_decode(blob)
                assert np.array_equal(out, img), (compress, rps)
                from gdal_boots_ray.kernels.gtiff import gtiff_decode_window

                win, _, _ = gtiff_decode_window(blob, 10, 37, 30, 25)
                assert np.array_equal(win, img[:, 37:62, 10:40]), (compress, rps)

    def test_overview_page_selection_skips_full_pages(self):
        # a multi-image TIFF can interleave full-resolution pages in
        # the chain; gtiff_overviews / gtiff_decode_overview must agree
        # on the REDUCED pages only (NewSubfileType bit 0)
        import struct

        from gdal_boots_ray.kernels.gtiff import (
            T_NEW_SUBFILE_TYPE,
            gtiff_decode_overview,
            gtiff_overviews,
            overview_average,
        )

        img = (np.arange(48 * 64, dtype=np.int64).reshape(48, 64) % 251).astype(np.uint8)
        blob = bytearray(gtiff_encode(img, overviews=(2, 4)))
        # walk to page 1's IFD and clear its NewSubfileType value,
        # turning the first overview into a plain full-res page
        (off,) = struct.unpack_from("<I", blob, 4)
        (n,) = struct.unpack_from("<H", blob, off)
        (off,) = struct.unpack_from("<I", blob, off + 2 + n * 12)  # page 1
        (n,) = struct.unpack_from("<H", blob, off)
        for i in range(n):
            tag, typ, cnt = struct.unpack_from("<HHI", blob, off + 2 + i * 12)
            if tag == T_NEW_SUBFILE_TYPE:
                struct.pack_into("<I", blob, off + 2 + i * 12 + 8, 0)
                break
        else:
            raise AssertionError("NewSubfileType tag not found on page 1")
        blob = bytes(blob)
        # only the lv=4 page is an overview now, and index 0 must
        # decode THAT page, not the (full-res-flagged) lv=2 page
        assert gtiff_overviews(blob) == [(16, 12)]
        ov, _, _ = gtiff_decode_overview(blob, 0)
        assert np.array_equal(ov, overview_average(img[None], 4)[0])
        with pytest.raises(ValueError, match="no page"):
            gtiff_decode_overview(blob, 1)
