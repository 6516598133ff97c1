"""Distributed connected components (round-3 VERDICT ask #3).

The driver union-find is retained below an edge threshold;
``connected_components_min_label`` is the scale path: partitioned min-label
propagation + pointer jumping where no process ever holds the full edge
list (the driver orchestrates per-bucket ObjectRefs only; each bucket task
sees ~E/B adjacency rows).
"""

import numpy as np
import pytest

from biosample_enricher_ray.stages.dedup import (
    connected_components_min_label,
    minhash_dedup_clusters,
    union_find_labels,
)


def _assert_matches_union_find(edges: np.ndarray, nodes: np.ndarray,
                               labels: np.ndarray) -> None:
    expected = union_find_labels(edges)
    assert len(nodes) == len(expected)
    got = dict(zip(nodes.tolist(), labels.tolist()))
    assert got == expected


def test_cc_random_graph_matches_union_find():
    rng = np.random.default_rng(7)
    edges = rng.integers(0, 2000, size=(5000, 2), dtype=np.int64)
    edges = edges[edges[:, 0] != edges[:, 1]]
    parts = np.array_split(edges, 7)
    nodes, labels = connected_components_min_label(parts, num_buckets=8)
    _assert_matches_union_find(edges, nodes, labels)


def test_cc_empty_and_single_edge():
    nodes, labels = connected_components_min_label([])
    assert nodes.size == 0
    nodes, labels = connected_components_min_label(
        [np.array([[5, 9]], dtype=np.int64)], num_buckets=4
    )
    assert dict(zip(nodes.tolist(), labels.tolist())) == {5: 5, 9: 5}


def test_cc_giant_component_never_gathers_edges():
    """Planted >=100k-doc component (a 100k chain — the worst diameter for
    plain min propagation; pointer jumping must converge in O(log n)
    rounds) plus a 20k star and background clusters. Edges are fed as 16
    parts and only ever concatenated per hash bucket (~E/8 per task)."""
    rng = np.random.default_rng(11)
    chain_n = 100_000
    chain = np.column_stack([np.arange(chain_n - 1), np.arange(1, chain_n)])
    star = np.column_stack([
        np.full(20_000, 200_000), 200_001 + np.arange(20_000)
    ])
    # background: 1k triangles
    base = 400_000 + 3 * np.arange(1000)
    tris = np.concatenate([
        np.column_stack([base, base + 1]),
        np.column_stack([base + 1, base + 2]),
    ])
    edges = np.concatenate([chain, star, tris]).astype(np.int64)
    rng.shuffle(edges)
    parts = np.array_split(edges, 16)
    nodes, labels = connected_components_min_label(parts, num_buckets=8)
    # giant chain collapses to label 0
    chain_mask = nodes < chain_n
    assert chain_mask.sum() == chain_n
    assert (labels[chain_mask] == 0).all()
    star_mask = (nodes >= 200_000) & (nodes < 400_000)
    assert star_mask.sum() == 20_001
    assert (labels[star_mask] == 200_000).all()
    _assert_matches_union_find(edges, nodes, labels)


@pytest.mark.usefixtures("blob_corpus")
def test_clusters_distributed_path_equals_driver_path(blob_corpus):
    """minhash_dedup_clusters with the distributed CC forced on
    (driver_edge_threshold=0) is byte-identical to the driver union-find
    path on the same corpus."""
    driver = minhash_dedup_clusters(blob_corpus, jaccard_threshold=0.7)
    dist = minhash_dedup_clusters(
        blob_corpus, jaccard_threshold=0.7, driver_edge_threshold=0
    )
    import pandas as pd

    pd.testing.assert_frame_equal(driver, dist)
    assert len(driver) >= 10
