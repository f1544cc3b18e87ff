"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session")
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # polars would size its pool to all cores in every worker
        runtime_env={"env_vars": {"POLARS_MAX_THREADS": "1"}},
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf0001_corpus():
    from joint_entity_and_relation_extraction_ray.sources.synth import ensure_corpus

    return ensure_corpus("sf0.001")
