"""One Ray session per pytest run (driver contract: tests own their session)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    from graphene_loader_ray.context import configure

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    configure(quiet=True)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_fixture_dir():
    from graphene_loader_ray.sources.synth import synthesize

    return synthesize(n_pages=400, n_genes=64)
