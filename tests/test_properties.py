"""Property-based tests (hypothesis) for pure kernels.

The reference suite leans on example corpora (docs/TESTING.md); these
property tests cover the same kernels across the whole input space —
no Ray session needed, every subject is a pure function.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from biosample_enricher_ray.functions.hashing import hash64
from biosample_enricher_ray.functions.sketches import HyperLogLog
from biosample_enricher_ray.stages.window import ntile_of


@given(total=st.integers(1, 5000), n_tiles=st.integers(1, 64))
@settings(max_examples=200, deadline=None)
def test_ntile_bucket_law(total, n_tiles):
    """NTILE invariants: tiles are 1..min(n,total), non-decreasing, sizes
    differ by at most 1, and the larger buckets come first."""
    tiles = ntile_of(np.arange(1, total + 1), total, n_tiles)
    assert tiles[0] == 1 and tiles[-1] == min(n_tiles, total)
    assert (np.diff(tiles) >= 0).all()
    sizes = np.bincount(tiles)[1:]
    assert sizes.sum() == total
    assert sizes.max() - sizes.min() <= 1
    assert (np.diff(sizes) <= 0).all()  # ceil-sized buckets first


@given(st.lists(st.text(max_size=30), min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_hash64_deterministic_and_order_free(values):
    """hash64 is a pure per-value function: stable across calls and
    independent of array order (same value -> same hash everywhere)."""
    import pyarrow as pa

    arr = pa.array(values, pa.string())
    h1 = hash64(arr)
    h2 = hash64(arr)
    assert (h1 == h2).all()
    perm = np.random.default_rng(0).permutation(len(values))
    hp = hash64(pa.array([values[i] for i in perm], pa.string()))
    assert (hp == h1[perm]).all()


@given(st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=2000),
       st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=2000))
@settings(max_examples=50, deadline=None)
def test_hll_merge_equals_union(a, b):
    """Merging two HLLs equals sketching the concatenation (register-max
    is exactly union), and estimates stay within the p=12 error bound."""
    import pyarrow as pa

    def hashed(vals):
        # HLL consumes PRE-HASHED uniform uint64s (every engine call site
        # hashes first) — raw small ints would all land in register 0
        if not vals:
            return np.empty(0, dtype=np.uint64)
        return hash64(pa.array(vals, pa.int64()))

    ha, hb, hu = HyperLogLog(12), HyperLogLog(12), HyperLogLog(12)
    ha.update(hashed(a))
    hb.update(hashed(b))
    hu.update(hashed(a + b))
    ha.merge(hb)
    assert (ha.registers == hu.registers).all()
    exact = len(set(a) | set(b))
    if exact:
        assert abs(ha.estimate() - exact) <= max(3.0, 0.1 * exact)
