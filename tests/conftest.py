"""Session-scoped Ray fixture (one init per pytest session) + shared corpus."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def smoke_corpus(tmp_path_factory):
    """FIXTURES.md §1 smoke corpus (H=5, P=40) written once per session."""
    from scrupyst_ray.sources.corpus import write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(out, H=5, P=40, show=3, xlink=1)
    return out
