"""Shared fixtures: one Ray session per pytest session + a synthetic corpus."""

from __future__ import annotations

import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Tiny deterministic pages corpus with planted violations + dims."""
    from biosample_enricher_ray.sources.synthetic import (
        CorpusSpec,
        write_corpus,
        write_dims,
    )

    d = tmp_path_factory.mktemp("pages_corpus")
    spec = CorpusSpec(n_rows=4000, n_files=4, giant_html_bytes=256 * 1024)
    write_corpus(str(d), spec)
    write_dims(str(d))
    return str(d)


@pytest.fixture(scope="session")
def sf001_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01_dir():
    return "/root/testdata/sf0.01"
