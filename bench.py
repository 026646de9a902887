"""Benchmark harness.

Headline: the flagship spatial-join + tiling pipeline (north-star
shape: read images parquet -> actor-pool decode -> bounds + cells ->
broadcast PIP join -> zonal partials -> per-polygon aggregate) over a
deterministic input_hint-schema images table sized to the sf dir,
plus per-query timings of representative operators on the sf tables.

Prints ONE JSON line:
    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "images": N, "rows_per_sec": ..., "tiles_per_sec": ...}

``--scaling``: runs this script twice in fresh processes at
RAY_GRAFT_CPUS=8 and =32 on the same input and prints throughputs +
scaling efficiency (the sandbox substitute for the N vs 4N cluster
rule; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# bench images scale: proportional to the sf's part table
_SF_IMAGES = {"sf0.001": (256, 64), "sf0.01": (1024, 96), "sf0.1": (4096, 128)}


def images_config(sf_dir: str):
    name = os.path.basename(os.path.normpath(sf_dir))
    n, px = _SF_IMAGES.get(name, (1024, 96))
    return name, n, px


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import numpy as np

    from gdal_boots_ray.pipelines.flagship import run_flagship
    from gdal_boots_ray.sources.fixtures import generate_images_parquet, nation_polygons

    sf_name, n_images, tile_px = images_config(SF_DIR)
    images_path = f"/tmp/graft_bench_images/{sf_name}_n{n_images}_px{tile_px}_v2"
    generate_images_parquet(images_path, n_images=n_images, tile_px=tile_px, bands=3)

    # polygons sized to the bench grid (64-column tile grid)
    polys = nation_polygons(np.arange(25))

    # warm page cache + worker processes with one untimed full run, then
    # time the steady-state run (what a long 100 TB job actually sees)
    import ray.data as rd

    rd.read_parquet(images_path).count()

    def one_run():
        t0 = time.perf_counter()
        agg = run_flagship(
            images_path,
            polygons=polys,
            cell_res=5000.0,
            decode_concurrency=(2, max(2, NUM_CPUS - 4)),
            batch_size=32,
        )
        result = agg.to_pandas()
        return time.perf_counter() - t0, result

    cold_sec, _ = one_run()
    headline, result = one_run()
    n_assign = int(result["n_tiles"].sum()) if len(result) else 0

    # representative per-query timings over the sf tables
    queries = {}
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gdal_boots_ray.pipelines.queries import QUERIES

    for name in (
        "image_stats",
        "tile_pip_join",
        "zonal_stats",
        "point_values",
        "knn",
        "dedup_exact",
        "minhash_pairs",
        "events_window",
        "q1_pricing",
    ):
        t = time.perf_counter()
        out = QUERIES[name](SF_DIR)
        # consume the stream (small results -> to_pandas)
        out.to_pandas()
        queries[name] = round(time.perf_counter() - t, 3)

    ray.shutdown()
    return {
        "metric": "flagship spatial-join+tiling wall time (decode+cells+PIP+zonal)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_name,
        "num_cpus": NUM_CPUS,
        "cold_sec": round(cold_sec, 3),
        "images": n_images,
        "tile_px": tile_px,
        "rows_per_sec": round(n_images / headline, 1),
        "tiles_per_sec": round(n_assign / headline, 1),
        "tile_assignments": n_assign,
    }


def run_scaling():
    """Same job, fresh processes, 8 vs 32 CPUs -> scaling efficiency."""
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    thr8 = results[8]["rows_per_sec"]
    thr32 = results[32]["rows_per_sec"]
    eff = (thr32 / thr8) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling efficiency (rows/s at 32 cpus vs 8 cpus, fresh sessions)",
                "sec_8": results[8]["value"],
                "sec_32": results[32]["value"],
                "rows_per_sec_8": thr8,
                "rows_per_sec_32": thr32,
                "scaling_efficiency": round(eff, 3),
                "sf": results[32]["sf"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
