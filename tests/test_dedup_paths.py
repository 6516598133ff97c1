"""Fragment-paths input for the dedup family (round-3 VERDICT ask #2).

The scale contract: given parquet fragment paths, the dedup pipelines drive
every phase from pruned per-fragment reads inside raw tasks — the corpus is
NEVER turned into a materialized/pinned Dataset, and object-store usage stays
O(keys + candidates), not O(corpus). These tests assert (a) paths input and
Dataset input produce identical results, and (b) the paths runs structurally
cannot materialize the source (Dataset.to_arrow_refs / read_parquet are
poisoned on the driver for the duration).
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray
import ray.data

from biosample_enricher_ray.stages.dedup import (
    exact_dedup_groups,
    minhash_dedup_clusters,
    minhash_lsh_candidates,
    simhash_near_dups,
)


# (blob_corpus fixture lives in conftest.py — shared with the
# connected-components tests)


def _exact_df(out) -> pd.DataFrame:
    return (
        out.to_pandas()
        .sort_values(["keep_id"])
        .reset_index(drop=True)
        .astype({"keep_id": "int64", "n": "int64"})
    )


def _pairs_df(out) -> pd.DataFrame:
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def test_exact_dedup_paths_equals_dataset(blob_corpus):
    from_paths = _exact_df(exact_dedup_groups(blob_corpus))
    ds = ray.data.read_parquet(blob_corpus, columns=["doc_id", "text"])
    from_ds = _exact_df(exact_dedup_groups(ds))
    pd.testing.assert_frame_equal(from_paths, from_ds)
    # planted: 5 dup groups of size 2, everything else unique
    assert (from_paths["n"] == 2).sum() == 5
    assert from_paths["n"].sum() == 410


def test_minhash_paths_equals_dataset(blob_corpus):
    kw = dict(jaccard_threshold=0.7)
    from_paths = _pairs_df(minhash_lsh_candidates(blob_corpus, **kw))
    ds = ray.data.read_parquet(blob_corpus, columns=["doc_id", "text"])
    from_ds = _pairs_df(minhash_lsh_candidates(ds, **kw))
    pd.testing.assert_frame_equal(from_paths, from_ds)
    found = set(zip(from_paths["id_a"], from_paths["id_b"]))
    # exact dups are trivially near-dups; appended-tail docs stay similar
    assert {(j, 400 + j) for j in range(5)} <= found
    assert {(10 + j, 500 + j) for j in range(5)} <= found


def test_simhash_paths_equals_dataset(blob_corpus):
    from_paths = _pairs_df(simhash_near_dups(blob_corpus))
    ds = ray.data.read_parquet(blob_corpus, columns=["doc_id", "text"])
    from_ds = _pairs_df(simhash_near_dups(ds))
    pd.testing.assert_frame_equal(from_paths, from_ds)
    assert {(j, 400 + j) for j in range(5)} <= set(
        zip(from_paths["id_a"], from_paths["id_b"])
    )


def test_paths_input_never_materializes_source(blob_corpus, monkeypatch):
    """With paths input, no driver code path may execute/pin the corpus as a
    Dataset: Dataset.to_arrow_refs and ray.data.read_parquet are poisoned for
    the whole run. (Raw tasks read fragments with pyarrow.parquet directly;
    from_arrow_refs over key-sized results is allowed.)"""

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("corpus was materialized as a Dataset")

    orig_refs = ray.data.Dataset.to_arrow_refs

    def guarded_refs(self, *a, **k):
        # materializing a dataset that still carries the text column =
        # corpus pinning; key/pair-sized datasets are allowed
        if "text" in self.schema().names:
            boom()
        return orig_refs(self, *a, **k)

    monkeypatch.setattr(ray.data.Dataset, "to_arrow_refs", guarded_refs)
    monkeypatch.setattr(ray.data, "read_parquet", boom)

    exact = _exact_df(exact_dedup_groups(blob_corpus))
    assert exact["n"].sum() == 410
    pairs = _pairs_df(minhash_lsh_candidates(blob_corpus, jaccard_threshold=0.7))
    assert len(pairs) >= 10
    sim = _pairs_df(simhash_near_dups(blob_corpus))
    assert len(sim) >= 5
    clusters = minhash_dedup_clusters(blob_corpus, jaccard_threshold=0.7)
    assert len(clusters) >= 10


def test_paths_object_store_stays_small(blob_corpus):
    """Object-store footprint of a paths-input run is O(keys+candidates).
    The corpus here is ~9 MB of text; the pinned payloads (hash/band rows +
    candidate texts + result) are well under 1/4 of that. Measured WHILE
    holding the lazy result dataset — the round-2 design kept the whole
    corpus pinned through it. (ray.available_resources tracks plasma usage;
    delta-based to stay robust to other tests' leftovers.)"""
    import gc
    import time

    corpus_bytes = sum(os.path.getsize(p) for p in blob_corpus)

    def plasma_used() -> float:
        time.sleep(0.5)  # resource accounting is async
        total = ray.cluster_resources().get("object_store_memory", 0.0)
        avail = ray.available_resources().get("object_store_memory", total)
        return total - avail

    gc.collect()
    before = plasma_used()
    lazy = exact_dedup_groups(blob_corpus)  # phases 1-3 pinned while lazy
    during = plasma_used()
    grown = during - before
    assert grown < max(corpus_bytes // 4, 2 << 20), (
        f"plasma grew {grown:.0f} bytes on a {corpus_bytes}-byte corpus"
    )
    assert _exact_df(lazy)["n"].sum() == 410
