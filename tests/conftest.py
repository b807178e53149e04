"""Shared pytest fixtures. Ray is initialised ONCE per session."""

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_corpus(tmp_path_factory):
    """Small deterministic ER corpus (50 entities) written once per session."""
    from entity_resolution__ray.testgen import write_fixture

    out = tmp_path_factory.mktemp("er_fixture")
    paths = write_fixture(str(out), n_entities=50, seed=42)
    return paths


@pytest.fixture(scope="session")
def full_fixture_corpus(tmp_path_factory):
    """Reference-proportioned corpus (330 entities ≈ 2.4k docs) for e2e tests."""
    from entity_resolution__ray.testgen import write_fixture

    out = tmp_path_factory.mktemp("er_fixture_full")
    paths = write_fixture(str(out), n_entities=330, seed=42)
    return paths
