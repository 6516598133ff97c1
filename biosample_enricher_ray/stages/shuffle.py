"""Skew-aware shuffle helpers: salted grouped counting, skew detection.

The north_rule requires explicit skew handling for hot keys (hot domains in a
web corpus follow a zipf law — the synthetic corpus plants them,
sources/synthetic.py). The pattern (FP-Hadoop-style skew splitting,
PAPERS.md): split each hot key's rows across S salt buckets, partially
aggregate per (key, salt), then merge the S partials per key in a second,
tiny exchange. The first shuffle's largest group shrinks by ~S×.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ..functions.hashing import hash64


def salted_group_count(
    ds: ray.data.Dataset, key_column: str, salt: int = 8
) -> ray.data.Dataset:
    """Grouped count with salted two-level aggregation → (key, n).

    Equivalent to ``ds.groupby(key).count()`` but the heavy exchange groups on
    ``(key, __salt)`` so a hot key's rows spread over ``salt`` reducers; the
    second groupby only merges ``salt`` partial rows per key.
    """

    def add_salt_and_precount(t: pa.Table) -> pa.Table:
        # null keys break sort-based groupby partitioning and carry no count
        # semantics — drop them here (nullability is a NotNullCheck concern)
        keys = t[key_column].combine_chunks().drop_null()
        salts = (hash64(keys) % np.uint64(salt)).astype(np.int32)
        pre = pa.table({key_column: keys, "__salt": pa.array(salts)})
        # combiner: collapse within the batch first
        g = pre.group_by([key_column, "__salt"]).aggregate([([], "count_all")])
        return g.rename_columns([key_column, "__salt", "n"])

    partial = (
        ds.select_columns([key_column])
        .map_batches(add_salt_and_precount, batch_format="pyarrow")
        .groupby([key_column, "__salt"])
        .aggregate(Sum("n", alias_name="n"))
    )
    merged = (
        partial.groupby(key_column)
        .aggregate(Sum("n", alias_name="n"))
    )
    return merged


def detect_skewed_keys(
    ds: ray.data.Dataset, key_column: str, *, top: int = 20, sample_frac: float = 0.05
) -> pd.DataFrame:
    """Estimate the hottest keys from a sample — the pre-shuffle skew probe
    (SURVEY.md §4.2 'detect skew from fragment row-counts before shuffle')."""
    sample = ds.select_columns([key_column]).random_sample(sample_frac, seed=17)

    def vc(t: pa.Table) -> pa.Table:
        c = t[key_column].combine_chunks().value_counts()
        return pa.table({key_column: c.field("values"), "n": c.field("counts")})

    counts = (
        sample.map_batches(vc, batch_format="pyarrow")
        .groupby(key_column)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts["est_total"] = (counts["n"] / max(sample_frac, 1e-9)).astype("int64")
    return (
        counts.sort_values("n", ascending=False)
        .head(top)
        .reset_index(drop=True)
    )
