import os

import pytest

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            # keep freed batch buffers in the worker heap (see bench.py):
            # first-touch page faults are ~14 MB/s on this host, so heap
            # reuse is the difference between ms and seconds per task
            runtime_env={
                "env_vars": {
                    "MALLOC_MMAP_MAX_": "0",
                    "MALLOC_TRIM_THRESHOLD_": "268435456",
                }
            },
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
