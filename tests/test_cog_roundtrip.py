"""COG ingest round trip: synth tiles -> tiled GeoTIFF with in-file
pyramids -> partitioned parquet (manifest digests) -> read back ->
windowed + overview reads through DecodeWindows / the codec.  The
integration seam the single-kernel tests don't cover: blobs must
survive the Arrow binary column + parquet cycle byte-exactly, and the
windowed decode must still be O(touched chunks) on the read side.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from gdal_boots_ray.kernels.gtiff import (
    gtiff_decode,
    gtiff_decode_overview,
    gtiff_decode_window,
    gtiff_encode,
    gtiff_overviews,
    overview_average,
)
from gdal_boots_ray.sources.fixtures import tile_params, tile_pixels


def test_cog_ingest_roundtrip(ray_session, tmp_path):
    import ray
    import ray.data as rd

    from gdal_boots_ray.stages.decode import DecodeWindows
    from gdal_boots_ray.state.manifest import completed_partitions, write_partitioned

    keys = np.arange(24)
    p = tile_params(keys)

    def encode_cog(batch: pa.Table) -> pa.Table:
        ks = batch.column("key").to_numpy()
        blobs, gts, ws, hs = [], [], [], []
        for k in ks:
            prm = tile_params(np.array([k]))
            w, h = int(prm["w"][0]), int(prm["h"][0])
            gt = [float(v) for v in prm["gt"][0]]
            img = tile_pixels(int(k), w, h)
            blobs.append(
                gtiff_encode(img, gt=gt, epsg=3857, compress="deflate",
                             tiled=True, blockxsize=16, blockysize=16,
                             overviews=(2,))
            )
            gts.append(gt)
            ws.append(w)
            hs.append(h)
        return pa.table(
            {
                "image_id": pa.array([f"img-{int(k):08d}" for k in ks], pa.string()),
                "part_key": pa.array(ks % 4, pa.int64()),
                "bytes": pa.array(blobs, pa.large_binary()),
                "fmt": pa.array(["tiff"] * len(ks), pa.string()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "gt": pa.array(gts, pa.list_(pa.float64(), 6)),
            }
        )

    src = rd.from_arrow(pa.table({"key": pa.array(keys, pa.int64())}))
    cog = src.map_batches(encode_cog, batch_format="pyarrow", batch_size=8)

    # partitioned, manifest-digested sink (the resumable-output shape)
    out_dir = str(tmp_path / "cog")
    write_partitioned(cog, out_dir, key_col="part_key").to_pandas()
    done = completed_partitions(out_dir)
    assert len(done) == 4 and sum(m["rows"] for m in done.values()) == 24

    # read back and decode windows through the pipeline stage
    back = rd.read_parquet([os.path.join(out_dir, f"part={k}", "data.parquet") for k in done])

    def add_window(batch: pa.Table) -> pa.Table:
        ws = batch.column("w").to_numpy()
        hs = batch.column("h").to_numpy()
        return (
            batch.append_column("wx", pa.array(ws // 4, pa.int32()))
            .append_column("wy", pa.array(hs // 4, pa.int32()))
            .append_column("ww", pa.array(ws // 2, pa.int32()))
            .append_column("wh", pa.array(hs // 2, pa.int32()))
        )

    win = back.map_batches(add_window, batch_format="pyarrow").map_batches(
        DecodeWindows, batch_format="pyarrow", concurrency=1
    )
    rows = win.take_all()
    assert len(rows) == 24
    for r in rows:
        k = int(r["image_id"].split("-")[1])
        prm = tile_params(np.array([k]))
        w, h = int(prm["w"][0]), int(prm["h"][0])
        x0, y0, cw, ch = w // 4, h // 4, w // 2, h // 2
        v = np.frombuffer(r["pixels"], np.uint8).reshape(ch, cw)
        assert np.array_equal(v, tile_pixels(k, w, h)[y0 : y0 + ch, x0 : x0 + cw])
        # gt translated to the window origin
        assert r["gt"][2] == prm["gt"][0][2] + prm["gt"][0][0] * x0

    # overview pages survive the parquet cycle byte-exactly
    t = pq.read_table(os.path.join(out_dir, "part=0", "data.parquet"))
    blob = t.column("bytes")[0].as_py()
    k = int(t.column("image_id")[0].as_py().split("-")[1])
    prm = tile_params(np.array([k]))
    w, h = int(prm["w"][0]), int(prm["h"][0])
    assert gtiff_overviews(blob) == [((w + 1) // 2, (h + 1) // 2)]
    ov, _, epsg = gtiff_decode_overview(blob, 0)
    assert epsg == 3857
    assert np.array_equal(ov, overview_average(tile_pixels(k, w, h)[None], 2)[0])
    full, _, _ = gtiff_decode(blob)
    assert np.array_equal(full, tile_pixels(k, w, h))
    wv, _, _ = gtiff_decode_window(blob, 1, 2, 5, 7)
    assert np.array_equal(wv, tile_pixels(k, w, h)[2:9, 1:6])
