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
    """17-vertex Minsk polygon (reference tests/conftest.py:36-60)."""
    return {
        "type": "Polygon",
        "coordinates": [
            [
                [27.585983276367188, 53.97284922869111],
                [27.472000122070312, 53.969012350740314],
                [27.458953857421875, 53.96517511951001],
                [27.41809844970703, 53.93284757750496],
                [27.401962280273438, 53.90211319839355],
                [27.423934936523438, 53.85657669031663],
                [27.43560791015625, 53.84746343692341],
                [27.450714111328125, 53.84239966092924],
                [27.5537109375, 53.83105458000117],
                [27.649154663085938, 53.83247288320114],
                [27.66254425048828, 53.83774044605313],
                [27.70030975341797, 53.87844040332883],
                [27.698593139648438, 53.88572576837868],
                [27.675247192382812, 53.94376092441113],
                [27.670097351074215, 53.947398072373566],
                [27.595252990722656, 53.97284922869111],
                [27.585983276367188, 53.97284922869111],
            ]
        ],
    }


SF_DIR = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
