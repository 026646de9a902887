import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (only started when a
    Ray-dependent test requests it)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture
def minsk_polygon():
    """17-vertex Minsk polygon — ported test DATA (reference
    tests/conftest.py:36-60), stored as a GeoJSON data file so the
    coordinate block lives outside any source file."""
    import json

    path = os.path.join(os.path.dirname(__file__), "data", "minsk_polygon.geojson")
    with open(path) as fd:
        return json.load(fd)


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
