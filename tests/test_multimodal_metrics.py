"""Multimodal stage plumbing (image features real; video/audio decode
seams stubbed with deterministic fakes) + metrics report parsing."""

import json

import numpy as np
import pyarrow as pa
import pytest

from gdal_boots_ray.sources.fixtures import synth_images_batch
from gdal_boots_ray.stages.decode import DecodeImages
from gdal_boots_ray.stages.multimodal import AudioFeatures, ImageFeatures, VideoFrameSampler, make_resize_images


def _decoded(n=8):
    return DecodeImages()(synth_images_batch(np.arange(n)))


def test_image_features():
    out = ImageFeatures()(_decoded())
    assert {"mean_v", "std_v", "dhash"} <= set(out.column_names)
    # deterministic
    out2 = ImageFeatures()(_decoded())
    assert out.column("dhash").to_pylist() == out2.column("dhash").to_pylist()
    assert all(isinstance(v, int) for v in out.column("dhash").to_pylist())


def test_resize_images():
    out = make_resize_images(16)(_decoded())
    assert set(out.column("w").to_pylist()) == {16}
    assert set(out.column("h").to_pylist()) == {16}
    from gdal_boots_ray.stages.decode import batch_pixel_views

    views = batch_pixel_views(out)
    assert views[0].shape[-2:] == (16, 16)


def _video_batch():
    return pa.table(
        {
            "media_id": pa.array(["vid-0", "vid-1"], pa.string()),
            "bytes": pa.array([b"xx", b"yy"], pa.binary()),
            "fmt": pa.array(["mp4", "mp4"], pa.string()),
            "duration_s": pa.array([3.0, 1.5], pa.float64()),
            "fps": pa.array([30.0, 30.0], pa.float64()),
        }
    )


def test_video_sampler_stub_raises():
    with pytest.raises(NotImplementedError, match="video decoding"):
        VideoFrameSampler()(_video_batch())


def test_video_sampler_fake_decoder_plumbing():
    out = VideoFrameSampler(every_s=1.0, fake_decoder=True)(_video_batch())
    assert out.num_rows == 3 + 2  # ceil(3/1) + ceil(1.5/1)
    assert out.column("media_id").to_pylist()[:3] == ["vid-0"] * 3
    assert set(out.column_names) >= {"pixels", "bands", "h", "w", "t_s", "frame_idx"}
    # frames are decodable buffers of the declared shape
    from gdal_boots_ray.stages.decode import batch_pixel_views

    views = batch_pixel_views(out)
    assert views[0].shape == (3, 32, 32)


def test_audio_features_stub_and_fake():
    batch = pa.table(
        {
            "media_id": pa.array(["aud-0"], pa.string()),
            "bytes": pa.array([b"zz"], pa.binary()),
            "fmt": pa.array(["wav"], pa.string()),
            "sample_rate": pa.array([8000], pa.int32()),
        }
    )
    with pytest.raises(NotImplementedError, match="audio decoding"):
        AudioFeatures()(batch)
    out = AudioFeatures(window_s=1.0, fake_decoder=True)(batch)
    assert out.num_rows == 3  # 3 seconds of fake samples
    assert (np.asarray(out.column("rms").to_pylist()) > 0).all()


def test_metrics_report(ray_session, tmp_path):
    import ray.data as rd

    from gdal_boots_ray.state.metrics import parse_stats, run_with_report

    ds = rd.range(1000).map_batches(lambda b: b, batch_format="pyarrow")
    path = str(tmp_path / "report.json")
    out = run_with_report(ds, path, extra={"job": "test"})
    assert len(out) == 1000
    report = json.load(open(path))
    assert report["extra"]["job"] == "test"
    assert report["wall_s"] > 0
    assert isinstance(report["stages"], list)
