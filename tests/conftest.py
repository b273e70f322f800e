"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest
session (build-brief requirement)."""

from __future__ import annotations

import logging
import warnings

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    warnings.filterwarnings("ignore")
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
