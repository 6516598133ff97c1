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
def blob_corpus(tmp_path_factory):
    """Two parquet fragments, ~410+ rows, fat texts, planted exact dups
    (cross-fragment) and near-dup pairs — shared by the dedup paths +
    connected-components tests."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    words = [f"w{i:04d}" for i in range(500)]

    def doc(seed: int, n: int = 1200) -> str:
        r = np.random.default_rng(seed)
        return " ".join(words[i] for i in r.integers(0, len(words), n))

    rows_a, rows_b = [], []
    for i in range(200):
        rows_a.append({"doc_id": i, "text": doc(1000 + i)})
    for i in range(200, 400):
        rows_b.append({"doc_id": i, "text": doc(1000 + i)})
    # exact dups: doc 0..4's text repeated in the OTHER fragment
    for j in range(5):
        rows_b.append({"doc_id": 400 + j, "text": rows_a[j]["text"]})
    # near dups: doc 10..14 with a few words appended
    for j in range(5):
        rows_b.append(
            {"doc_id": 500 + j, "text": rows_a[10 + j]["text"] + " tail tail"}
        )
    d = tmp_path_factory.mktemp("blobcorpus")
    p_a, p_b = str(d / "part-a.parquet"), str(d / "part-b.parquet")
    pq.write_table(pa.Table.from_pylist(rows_a), p_a)
    pq.write_table(pa.Table.from_pylist(rows_b), p_b)
    return [p_a, p_b]


@pytest.fixture(scope="session")
def sf001_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01_dir():
    return "/root/testdata/sf0.01"
