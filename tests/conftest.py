import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    try:
        from ray.data import DataContext
        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_images(tmp_path_factory):
    """F1 image table, sf-tiny (1000 rows), written once per session."""
    import pyarrow.parquet as pq

    from metric_search_ray import fixtures

    d = tmp_path_factory.mktemp("f1")
    path = str(d / "images.parquet")
    pq.write_table(fixtures.image_table(1000), path)
    return path
