"""Temporal operators: as-of join, range-count join, sliding window."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from biosample_enricher_ray.stages.temporal import (
    asof_join,
    sliding_daily_counts,
    window_count_join,
)

US = 1_000_000


def _ds(rows: dict) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table(rows))


def _ts(secs: list[int]) -> pa.Array:
    return pa.array(np.array(secs, dtype="datetime64[s]").astype("datetime64[us]"))


def test_asof_join_basic_and_unmatched():
    left = _ds({"user_id": [1, 1, 2, 3], "event_id": [10, 11, 20, 30],
                "ts": _ts([100, 50, 100, 100])})
    right = _ds({"user_id": [1, 1, 2], "view_id": [900, 901, 902],
                 "ts": _ts([60, 99, 200])})
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        left_cols=["event_id", "user_id"], right_payload=["view_id"],
    ).to_pandas().sort_values("event_id", ignore_index=True)
    got = dict(zip(out["event_id"].astype(int), out["asof_view_id"].tolist()))
    assert got[10] == 901          # latest of 60, 99
    assert got[11] is pd.NA or pd.isna(got[11])  # no view <= 50
    assert pd.isna(got[20])        # user 2's only view is later
    assert pd.isna(got[30])        # user 3 has no views at all
    t = out.loc[out["event_id"] == 10, "asof_t"].iloc[0]
    assert int(t) == 99 * US


def test_asof_join_inclusive_tie_and_payload_tiebreak():
    # view exactly AT the click timestamp is eligible (<= inclusive);
    # two views at the same ts -> max view_id wins (deterministic).
    left = _ds({"user_id": [1], "event_id": [10], "ts": _ts([100])})
    right = _ds({"user_id": [1, 1], "view_id": [7, 9], "ts": _ts([100, 100])})
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        left_cols=["event_id", "user_id"], right_payload=["view_id"],
    ).to_pandas()
    assert int(out["asof_view_id"].iloc[0]) == 9


def test_asof_join_tolerance():
    left = _ds({"user_id": [1, 1], "event_id": [10, 11], "ts": _ts([100, 500])})
    right = _ds({"user_id": [1], "view_id": [7], "ts": _ts([90])})
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        left_cols=["event_id", "user_id"], right_payload=["view_id"],
        tolerance_us=60 * US,
    ).to_pandas().sort_values("event_id", ignore_index=True)
    assert int(out["asof_view_id"].iloc[0]) == 7     # 10 s back: in tolerance
    assert pd.isna(out["asof_view_id"].iloc[1])      # 410 s back: out


def test_window_count_join_half_open_bounds():
    # window [ts-10s, ts): point at exactly ts-10s counts, at ts does not
    anchors = _ds({"user_id": [1, 2], "event_id": [10, 20],
                   "ts": _ts([100, 100])})
    points = _ds({"user_id": [1, 1, 1, 1], "ts": _ts([90, 95, 100, 89])})
    out = window_count_join(
        anchors, points, key="user_id", anchor_ts="ts", point_ts="ts",
        anchor_cols=["event_id", "user_id"],
        start_offset_us=-10 * US, end_offset_us=0,
    ).to_pandas().sort_values("event_id", ignore_index=True)
    assert out["n_in_window"].tolist() == [2, 0]     # {90, 95}; user 2 empty
    assert out["event_id"].tolist() == [10, 20]


def test_sliding_daily_counts_matches_pandas_rolling():
    rng = np.random.default_rng(7)
    days = np.repeat(np.arange(20), rng.integers(1, 9, size=20))
    ds = _ds({"ts": pa.array(
        (np.datetime64("2024-01-01", "s")
         + days.astype("timedelta64[D]")).astype("datetime64[us]"))})
    out = sliding_daily_counts(ds, "ts", window_days=7)
    ref = out["n"].rolling(7, min_periods=1)
    assert out["sum_7d"].tolist() == ref.sum().astype(int).tolist()
    assert np.allclose(out["avg_7d"], ref.mean())
    assert out["day"].is_monotonic_increasing
