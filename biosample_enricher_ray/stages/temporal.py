"""Temporal join / window operators Ray Data has no native verb for.

The task brief names as-of joins, range joins and windowed aggregates as the
custom-operator tier; the reference's closest analog is the observation
aligner (metrics/aligner.py:201-295: pick the temporally-closest provider
observation for a target timestamp, tolerance-gated). All three operators
here follow composition strategy (a) from the brief: ``map_batches``
projections + one ``groupby(key).map_groups`` — the groupby IS the
co-partitioning shuffle, per-group work is a vectorized ``searchsorted``.

Partitioning assumption (stated per the brief): rows for one key fit in one
group worker. Keys are users/entities, groups are event streams per entity —
bounded in any real corpus; a pathological hot key needs the salting path
documented in BASELINE.md (holistic per-group work is exactly the case where
salting pays).

Timestamps are normalized to epoch-microsecond int64 at the projection
(``__t``), so group merges and outputs are pure int64 — no pandas/Arrow
datetime-unit coupling anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count

_US = "int64 epoch microseconds"


def _epoch_us(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """timestamp[*] → epoch-us int64 (cast chain keeps null mask)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.timestamp("us")).cast(pa.int64())


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_payload: list[str],
    tolerance_us: int | None = None,
) -> ray.data.Dataset:
    """Backward as-of join: for each left row, the latest right row of the
    same ``key`` with ``right_ts <= left_ts`` (inclusive), optionally within
    ``tolerance_us``.

    Output: ``left_cols`` + ``asof_t`` (matched right timestamp, epoch us)
    + ``asof_<col>`` per right payload column — nullable (pd.NA / Int64)
    where no right row qualifies. Ties on right_ts are broken
    deterministically: the right rows are sorted by (ts, *payload) and the
    LAST qualifying row wins (max payload at the as-of timestamp).

    Shape: both sides project to a shared (key, __t, __side, payload)
    schema (~24 B + payload per row), union, ONE hash shuffle
    (``groupby(key)``), then an O(n log n) per-group merge. No side is
    materialized or broadcast — this is the co-partitioned path for two
    big sides; a dim-sized right side should use the broadcast-lookup
    pattern (stages/checks.py ReferentialCheck) instead.
    """
    all_payload = list(dict.fromkeys(left_cols + right_payload))

    def project(side_val: int, ts: str, keep: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {
                key: t[key],
                "__t": _epoch_us(t[ts]),
                "__side": pa.array(np.full(n, side_val, np.int8)),
            }
            for c in all_payload:
                if c == key:
                    continue
                cols[c] = t[c] if c in keep else pa.nulls(n, pa.int64())
            return pa.table(cols)

        return fn

    lp = [c for c in left_cols if c != key]
    rp = [c for c in right_payload if c != key]
    u = left.map_batches(project(0, left_ts, lp), batch_format="pyarrow").union(
        right.map_batches(project(1, right_ts, rp), batch_format="pyarrow")
    )

    out_cols = [c for c in left_cols] + ["asof_t"] + [f"asof_{c}" for c in rp]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["__side"] == 0]
        od = g[g["__side"] == 1].sort_values(["__t"] + rp, kind="stable")
        out = {}
        for c in left_cols:
            out[c] = ev[c if c != key else key].reset_index(drop=True)
        t_ev = ev["__t"].to_numpy()
        t_od = od["__t"].to_numpy()
        idx = np.searchsorted(t_od, t_ev, side="right") - 1
        matched = idx >= 0
        if tolerance_us is not None and len(t_od):
            gap = t_ev - t_od[np.clip(idx, 0, None)]
            matched &= gap <= tolerance_us
        for c in ["__t"] + rp:
            name = "asof_t" if c == "__t" else f"asof_{c}"
            if len(od):
                # pandas upcasts the unioned payload column to float64 (left
                # rows are null) — values taken from right rows are integral
                vals = od[c].to_numpy()[np.clip(idx, 0, None)]
                vals64 = np.where(matched, vals, 0).astype(np.int64)
                out[name] = pd.arrays.IntegerArray(vals64, mask=~matched)
            else:
                out[name] = pd.array([pd.NA] * len(ev), dtype="Int64")
        return pd.DataFrame(out, columns=out_cols)

    return u.groupby(key).map_groups(merge, batch_format="pandas")


def window_count_join(
    anchors: ray.data.Dataset,
    points: ray.data.Dataset,
    *,
    key: str,
    anchor_ts: str,
    point_ts: str,
    anchor_cols: list[str],
    start_offset_us: int,
    end_offset_us: int,
) -> ray.data.Dataset:
    """Range join, count form: per anchor row, the number of same-key point
    rows with ``point_ts`` in ``[anchor_ts + start, anchor_ts + end)``
    (half-open — an anchor drawn from the same stream never counts itself
    when ``end_offset_us <= 0``).

    Same co-partitioned shape as :func:`asof_join`; per group the point
    timestamps are sorted once and every anchor's count is two binary
    searches (``hi - lo``), so a group costs O((A+P) log P), never A×P.
    """

    def project(side_val: int, ts: str, keep: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {
                key: t[key],
                "__t": _epoch_us(t[ts]),
                "__side": pa.array(np.full(n, side_val, np.int8)),
            }
            for c in anchor_cols:
                if c == key:
                    continue
                cols[c] = t[c] if c in keep else pa.nulls(n, pa.int64())
            return pa.table(cols)

        return fn

    ap = [c for c in anchor_cols if c != key]
    u = anchors.map_batches(project(0, anchor_ts, ap), batch_format="pyarrow").union(
        points.map_batches(project(1, point_ts, []), batch_format="pyarrow")
    )
    out_cols = list(anchor_cols) + ["n_in_window"]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        an = g[g["__side"] == 0]
        t_pt = np.sort(g.loc[g["__side"] == 1, "__t"].to_numpy())
        t_an = an["__t"].to_numpy()
        lo = np.searchsorted(t_pt, t_an + start_offset_us, side="left")
        hi = np.searchsorted(t_pt, t_an + end_offset_us, side="left")
        # anchor payloads were upcast to float64 by the union's null rows
        out = {c: pd.Series(an[c].to_numpy().astype(np.int64))
               for c in anchor_cols}
        out["n_in_window"] = pd.Series((hi - lo).astype(np.int64))
        return pd.DataFrame(out, columns=out_cols)

    return u.groupby(key).map_groups(merge, batch_format="pandas")


def sliding_daily_counts(
    ds: ray.data.Dataset, ts_col: str, *, window_days: int = 7
) -> pd.DataFrame:
    """Tumbling daily count + sliding ``window_days``-row sum/avg.

    The distributed part is the tumbling pre-aggregate (map-side day
    projection + ``groupby(day).count()`` — the A5 rollup shape); the
    sliding frame then runs vectorized over the AGGREGATED series, which is
    #days rows no matter the corpus size — the scale-correct place for a
    sequential window. ``avg`` is a single int/int division (identical IEEE
    result to SQL's ``SUM(..)::DOUBLE / COUNT(..)`` over the same frame).
    """
    import pyarrow.compute as pc

    def day_proj(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.strftime(t[ts_col], format="%Y-%m-%d")})

    daily = (
        ds.map_batches(day_proj, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    n = daily["n"].to_numpy(dtype=np.int64)
    csum = np.concatenate([[0], np.cumsum(n)])
    w = window_days
    starts = np.maximum(np.arange(len(n)) + 1 - w, 0)
    sums = csum[1:] - csum[starts]
    counts = np.arange(1, len(n) + 1) - starts
    return pd.DataFrame(
        {
            "day": daily["day"],
            "n": pd.Series(n, dtype="int64"),
            f"sum_{w}d": pd.Series(sums, dtype="int64"),
            f"avg_{w}d": sums.astype(np.float64) / counts,
        }
    )
