"""End-to-end resumable tile extraction: killed-run simulation replays
only the incomplete partition (north_rule checkpoint criterion)."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def images_dir(tmp_path_factory):
    from gdal_boots_ray.sources.fixtures import generate_images_parquet

    d = str(tmp_path_factory.mktemp("imgs"))
    generate_images_parquet(d, n_images=96, tile_px=32, bands=1, skew_frac=0.0)
    return d


def _polys():
    from gdal_boots_ray.sources.fixtures import bench_polygons

    return bench_polygons(96, 32, n_polys=4)


def test_extract_and_resume(ray_session, images_dir, tmp_path):
    from gdal_boots_ray.pipelines.extract import extract_tiles
    from gdal_boots_ray.state.manifest import completed_partitions

    out_dir = str(tmp_path / "tiles")
    polys = _polys()
    summary = extract_tiles(images_dir, polys, out_dir)
    assert summary["partitions"] >= 3
    done = completed_partitions(out_dir)
    digests = {k: m["digest"] for k, m in done.items()}
    rows = {k: m["rows"] for k, m in done.items()}
    assert sum(rows.values()) > 0

    # output partitions are readable parquet with encoded tiles
    some = next(iter(done))
    t = pq.read_table(os.path.join(out_dir, f"part={some}", "data.parquet"))
    assert {"image_id", "poly_id", "bytes", "fmt"} <= set(t.column_names)
    from gdal_boots_ray.kernels.png import decode_image

    img = decode_image(t.column("bytes")[0].as_py(), t.column("fmt")[0].as_py())
    assert img.size > 0

    # simulate a killed job: one partition lost
    victim = sorted(done)[0]
    shutil.rmtree(os.path.join(out_dir, f"part={victim}"))
    before_mtimes = {
        k: os.path.getmtime(os.path.join(out_dir, f"part={k}", "data.parquet"))
        for k in done
        if k != victim
    }
    summary2 = extract_tiles(images_dir, polys, out_dir)
    done2 = completed_partitions(out_dir)
    assert set(done2) == set(done)
    # recomputed partition is byte-identical (deterministic lineage)
    assert done2[victim]["digest"] == digests[victim]
    assert done2[victim]["rows"] == rows[victim]
    # untouched partitions were not rewritten
    for k, mt in before_mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, f"part={k}", "data.parquet")) == mt

    # fully-complete rerun is a no-op
    summary3 = extract_tiles(images_dir, polys, out_dir)
    assert summary3["partitions"] == summary2["partitions"]
