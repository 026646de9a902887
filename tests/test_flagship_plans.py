"""The flagship's two physical plans — read-in-task stateless tasks
(default) and actor-pool over a Dataset read — must produce the same
per-polygon aggregate: the plan choice is a scheduling detail, never a
semantics change."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def small_images(tmp_path_factory):
    from gdal_boots_ray.sources.fixtures import generate_images_parquet

    path = str(tmp_path_factory.mktemp("imgs") / "tbl")
    generate_images_parquet(path, n_images=512, tile_px=48, bands=3)
    return path


def test_task_and_actor_plans_agree(ray_session, small_images):
    from gdal_boots_ray.pipelines.flagship import combine_zonal_partials, run_flagship
    from gdal_boots_ray.sources.fixtures import bench_polygons

    polys = bench_polygons(512, 48)

    def run(use_actors):
        ds = run_flagship(
            small_images,
            polygons=polys,
            cell_res=5000.0,
            batch_size=32,
            num_cpus_hint=4,
            use_actors=use_actors,
        )
        out = combine_zonal_partials(ds)
        return out.sort_values("poly_id").reset_index(drop=True)

    task_plan = run(False)
    actor_plan = run(True)
    assert len(task_plan) > 0
    pd.testing.assert_frame_equal(task_plan, actor_plan)
    # integer-valued partial sums: bit-identical across batch splits
    assert (task_plan["sum_v"] == np.floor(task_plan["sum_v"])).all()
