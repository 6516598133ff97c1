"""Unit tests for the mergeable sketches (no Ray needed)."""

import numpy as np
import pyarrow as pa

from biosample_enricher_ray.functions.hashing import (
    extract_domain,
    extract_tld,
    hash64,
    md5_column,
    sha256_column,
)
from biosample_enricher_ray.functions.sketches import (
    FixedHistogram,
    HyperLogLog,
    TDigest,
    ks_statistic,
    psi,
)


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 2**64, size=100_000, dtype=np.uint64)
    true = len(np.unique(vals))
    full = HyperLogLog()
    full.update(vals)
    assert abs(full.estimate() - true) / true < 0.03

    a, b = HyperLogLog(), HyperLogLog()
    a.update(vals[:50_000])
    b.update(vals[50_000:])
    a.merge(b)
    assert abs(a.estimate() - full.estimate()) < 1e-6  # merge == single pass

    rt = HyperLogLog.from_bytes(a.to_bytes())
    assert rt.estimate() == a.estimate()


def test_hll_small_cardinality_linear_counting():
    h = HyperLogLog()
    h.update(hash64(pa.array([f"v{i % 50}" for i in range(10_000)])))
    assert abs(h.estimate() - 50) < 2


def test_tdigest_quantiles_and_merge():
    rng = np.random.default_rng(2)
    x = rng.lognormal(5, 1, 50_000)
    td = TDigest()
    for chunk in np.array_split(x, 7):
        td.update(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(x, q)
        assert abs(td.quantile(q) - exact) / exact < 0.02, q

    a, b = TDigest(), TDigest()
    a.update(x[:25_000])
    b.update(x[25_000:])
    a.merge(b)
    assert abs(a.quantile(0.5) - np.quantile(x, 0.5)) / np.quantile(x, 0.5) < 0.02
    rt = TDigest.from_bytes(a.to_bytes())
    assert rt.quantile(0.5) == a.quantile(0.5)


def test_histogram_drift_metrics():
    edges = np.linspace(0, 100, 21)
    rng = np.random.default_rng(3)
    base = FixedHistogram(edges)
    base.update(rng.normal(50, 10, 50_000))
    same = FixedHistogram(edges)
    same.update(rng.normal(50, 10, 50_000))
    shifted = FixedHistogram(edges)
    shifted.update(rng.normal(70, 10, 50_000))

    assert ks_statistic(base, same) < 0.02
    assert psi(base, same) < 0.02
    assert ks_statistic(base, shifted) > 0.3
    assert psi(base, shifted) > 0.5

    m = FixedHistogram.from_bytes(base.to_bytes())
    m.merge(shifted)
    assert m.total == base.total + shifted.total


def test_hashing_kernels():
    arr = pa.array(["a", "b", "a", None])
    h = hash64(arr)
    assert h[0] == h[2] and h[0] != h[1] and h[3] == 0
    # stable across calls/processes (fixed key)
    assert list(hash64(arr)) == list(h)

    sha = sha256_column(pa.array(["abc"]))
    assert sha[0].as_py() == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    assert md5_column(pa.array(["abc"]))[0].as_py() == "900150983cd24fb0d6963f7d28e17f72"

    doms = extract_domain(
        pa.array(["https://Sub.Example.com:8080/x", "nonsense", "http://a.b/c"])
    )
    assert doms.to_pylist() == ["sub.example.com", None, "a.b"]
    assert extract_tld(pa.array(["sub.example.com"])).to_pylist() == ["com"]


def test_misra_gries_zipf_guarantees():
    """Truncation path: zipf stream, split + merged partials. Every key with
    true count > n/(k+1) must be tracked, and est <= true <= est + max_error
    for all tracked keys."""
    import numpy as np

    from biosample_enricher_ray.functions.sketches import MisraGries

    rng = np.random.default_rng(3)
    items = np.array([f"k{v}" for v in rng.zipf(1.4, size=60_000) % 4000],
                     dtype=object)
    true = {}
    for it in items:
        true[it] = true.get(it, 0) + 1

    k = 64
    parts = np.array_split(items, 7)
    sketches = []
    for p in parts:
        mg = MisraGries(k=k)
        mg.update(p)
        sketches.append(MisraGries.from_bytes(mg.to_bytes()))  # roundtrip
    merged = sketches[0]
    for s in sketches[1:]:
        merged.merge(s)

    assert merged.n == len(items)
    assert merged.keys.size <= k
    est = dict(zip(merged.keys, (int(c) for c in merged.counts)))
    thresh = len(items) / (k + 1)
    for key, n_true in true.items():
        if n_true > thresh:
            assert key in est, f"heavy hitter {key} ({n_true}) not tracked"
    for key, e in est.items():
        n_true = true.get(key, 0)
        assert e <= n_true <= e + merged.max_error

    # exactness when k >= distinct: no truncation, no error
    exact = MisraGries(k=len(true) + 1)
    exact.update(items)
    assert exact.max_error == 0
    assert {k_: int(c) for k_, c in zip(exact.keys, exact.counts)} == true


def test_bloom_filter_membership_and_merge():
    from biosample_enricher_ray.functions.sketches import BloomFilter

    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**63, size=20_000, dtype=np.int64).astype(np.uint64)
    others = rng.integers(0, 2**63, size=20_000, dtype=np.int64).astype(np.uint64)
    others = others[~np.isin(others, members)]

    bf = BloomFilter(n_expected=len(members), fp_rate=0.01)
    bf.update(members)
    # structural guarantee: zero false negatives
    assert bf.contains(members).all()
    # measured FPR within 3x the configured rate
    fpr = bf.contains(others).mean()
    assert fpr <= 0.03, fpr

    # merge = bitwise OR: split-update equals whole-update
    a = BloomFilter(n_expected=len(members), fp_rate=0.01)
    b = BloomFilter(n_expected=len(members), fp_rate=0.01)
    a.update(members[:10_000])
    b.update(members[10_000:])
    a.merge(b)
    assert np.array_equal(a.bits, bf.bits)

    # serialization round-trip
    c = BloomFilter.from_bytes(bf.to_bytes())
    assert np.array_equal(c.bits, bf.bits)
    assert (c.m, c.k) == (bf.m, bf.k)

    # ~1.2 bytes/element broadcast payload vs 8 B/element exact set
    assert bf.bits.nbytes <= 2.0 * len(members)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        a.merge(BloomFilter(n_expected=10, fp_rate=0.01))
