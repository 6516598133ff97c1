"""The validator stage: compiled constraint suite as a ``map_batches`` actor.

Engine recast of the reference's ``CoverageEvaluator`` — one object holding
every compiled service/config, constructed once and reused per sample
(/root/reference/biosample_enricher/metrics/evaluator.py:24-32) — as a Ray
Data **actor-pool callable class**: checks compile and broadcast dimension
sets resolve in ``__init__`` (once per actor), ``__call__`` evaluates every
check on a zero-copy Arrow batch and emits a single unified record stream:

- ``violation`` rows    — one per (row, failed check); FIXTURES.md §4 shape
- ``batch_stats`` rows  — (partition_id, check_id, n_rows, n_violations)
  partials, later summed into the pass/fail matrix (partial aggregation
  before the tiny groupby — no all-to-all over raw rows)
- ``sketch`` rows       — serialized per-(batch, column) profile partials
  (null count, min/max, HLL, TDigest, histogram), merged downstream

One pass over the corpus produces checks + profile + drift inputs; nothing
row-oriented ever leaves the workers except actual violations.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64
from ..functions.sketches import FixedHistogram, HyperLogLog, TDigest
from .checks import RowCheck, SchemaCheck

RECORDS_SCHEMA = pa.schema(
    [
        pa.field("record_type", pa.string()),
        pa.field("url", pa.string()),
        pa.field("check_id", pa.string()),
        pa.field("column", pa.string()),
        pa.field("observed", pa.string()),
        pa.field("expected", pa.string()),
        pa.field("fragment_id", pa.string()),
        pa.field("partition_id", pa.string()),
        pa.field("n_rows", pa.int64()),
        pa.field("n_violations", pa.int64()),
        pa.field("kind", pa.string()),
        pa.field("payload", pa.binary()),
    ]
)

PATH_COLUMN = "path"


def partition_id_for_path(path: str) -> str:
    """Stable partition id from an input fragment path (file stem)."""
    base = os.path.basename(path)
    return base.rsplit(".", 1)[0] if "." in base else base


class ProfileSpec:
    """Which profile sketches to collect per column (SURVEY.md §2.6 A3).

    - every listed column: null count, n
    - numeric/timestamp columns: min/max + TDigest + histogram (if edges given)
    - ``distinct_columns``: HLL over hashed values
    - ``length_columns``: stats over utf8/binary length instead of the value
    """

    def __init__(
        self,
        columns: list[str],
        distinct_columns: list[str] | None = None,
        length_columns: list[str] | None = None,
        histogram_edges: dict[str, np.ndarray] | None = None,
        hll_p: int = 14,
        tdigest_delta: int = 200,
    ) -> None:
        self.columns = columns
        self.distinct_columns = distinct_columns or []
        self.length_columns = length_columns or []
        self.histogram_edges = histogram_edges or {}
        self.hll_p = hll_p
        self.tdigest_delta = tdigest_delta


def _numeric_view(col: pa.ChunkedArray | pa.Array, as_length: bool) -> np.ndarray | None:
    """Float view of a column (or of its element lengths) for sketch updates.

    Length/cast kernels run on the (possibly chunked) column FIRST so only the
    small numeric result is ever combined — combining a chunked binary column
    copies every payload byte (measured as a DRAM-contention hot spot)."""
    t = col.type
    if as_length:
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            col = pc.binary_length(col)
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            col = pc.utf8_length(col)
        else:
            return None
    elif pa.types.is_timestamp(t):
        col = pc.cast(col, pa.int64())
    elif not (pa.types.is_integer(t) or pa.types.is_floating(t)):
        return None
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return vals[np.isfinite(vals)]


class Validator:
    """Callable class for ``ds.map_batches(Validator, fn_constructor_kwargs=...,
    batch_format="pyarrow", concurrency=N)``.

    ``__init__`` compiles the suite (resolves ``ray.put`` broadcast dimension
    sets, builds regex programs) once per actor; ``__call__`` is pure
    vectorized Arrow per batch.
    """

    def __init__(
        self,
        checks: list[RowCheck],
        profile: ProfileSpec | None = None,
        path_column: str | None = PATH_COLUMN,
    ) -> None:
        # one Arrow compute thread per actor: the pool is already one actor
        # per CPU, and each worker process otherwise spawns an
        # os.cpu_count()-sized Arrow pool → N² threads of oversubscription
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        self.row_checks: list[RowCheck] = []
        self.schema_check: SchemaCheck | None = None
        for c in checks:
            if isinstance(c, SchemaCheck):
                self.schema_check = c
            else:
                self.row_checks.append(c)
        context: dict[str, Any] = {}
        for c in checks:
            c.compile(context)
        self.profile = profile
        self.path_column = path_column

    # ------------------------------------------------------------------ helpers

    def _partitions(self, batch: pa.Table) -> tuple[np.ndarray, list[str], list[str]]:
        """Per-row partition index + unique (fragment, partition) ids."""
        if self.path_column and self.path_column in batch.column_names:
            paths = batch[self.path_column].combine_chunks()
            enc = pc.dictionary_encode(paths)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            frags = [str(p) for p in enc.dictionary.to_pylist()]
            parts = [partition_id_for_path(p) for p in frags]
            return idx, frags, parts
        return np.zeros(len(batch), dtype=np.int64), [""], ["all"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        part_idx, frags, parts = self._partitions(batch)
        n = len(batch)
        urls = (
            batch["url"].combine_chunks()
            if "url" in batch.column_names
            else pa.nulls(n, pa.string())
        )

        out: dict[str, list] = {name: [] for name in RECORDS_SCHEMA.names}

        def emit(rows: dict[str, list | pa.Array | np.ndarray]) -> None:
            k = len(next(iter(rows.values())))
            for name in RECORDS_SCHEMA.names:
                v = rows.get(name)
                if v is None:
                    out[name].extend([None] * k)
                else:
                    out[name].extend(v if isinstance(v, list) else list(v))

        # --- schema check (batch-level)
        if self.schema_check is not None:
            data_schema = pa.schema(
                [f for f in batch.schema if f.name != self.path_column]
            )
            problems = self.schema_check.mismatches(data_schema)
            for p_i, (frag, part) in enumerate(zip(frags, parts)):
                n_in_part = int((part_idx == p_i).sum())
                if problems:
                    emit({
                        "record_type": ["violation"] * len(problems),
                        "check_id": [self.schema_check.check_id] * len(problems),
                        "column": ["*"] * len(problems),
                        "observed": problems,
                        "expected": [self.schema_check.expected] * len(problems),
                        "fragment_id": [frag] * len(problems),
                        "partition_id": [part] * len(problems),
                    })
                emit({
                    "record_type": ["batch_stats"],
                    "check_id": [self.schema_check.check_id],
                    "partition_id": [part],
                    "fragment_id": [frag],
                    "n_rows": [n_in_part],
                    "n_violations": [len(problems)],
                })

        # --- row checks
        for check in self.row_checks:
            try:
                mask = check.mask(batch)
            except Exception as exc:  # noqa: BLE001 — error-Observation contract
                # Per-check error capture (reference: a provider failure
                # becomes an error Observation, never a crashed batch —
                # /root/reference/biosample_enricher/elevation/service.py:
                # 246-279). ANY kernel exception from a (possibly custom)
                # check — missing column, bad cast, arithmetic error in user
                # code — materializes as ONE kind='error' violation row per
                # partition with the exception repr, counts every row of the
                # partition as violating, and leaves every other check
                # untouched; the task itself never fails.
                for p_i, (frag, part) in enumerate(zip(frags, parts)):
                    n_in_part = int((part_idx == p_i).sum())
                    emit({
                        "record_type": ["violation", "batch_stats"],
                        "check_id": [check.check_id] * 2,
                        "column": [check.column] * 2,
                        "observed": [f"<check error: {exc!r}>", None],
                        "expected": [check.expected, None],
                        "kind": ["error", None],
                        "fragment_id": [frag] * 2,
                        "partition_id": [part] * 2,
                        "n_rows": [None, n_in_part],
                        "n_violations": [None, n_in_part],
                    })
                continue
            mask_np = mask.to_numpy(zero_copy_only=False)
            mask_np = np.asarray(mask_np, dtype=bool)
            n_bad = int(mask_np.sum())
            if n_bad:
                bad_urls = urls.filter(mask)
                try:
                    observed = check.observed(batch, mask)
                except Exception as exc:  # noqa: BLE001 — same contract
                    observed = pa.array(
                        [f"<observed error: {exc!r}>"] * n_bad, pa.string())
                bad_parts = part_idx[mask_np]
                emit({
                    "record_type": ["violation"] * n_bad,
                    "url": bad_urls.to_pylist(),
                    "check_id": [check.check_id] * n_bad,
                    "column": [check.column] * n_bad,
                    "observed": observed.to_pylist(),
                    "expected": [check.expected] * n_bad,
                    "fragment_id": [frags[i] for i in bad_parts],
                    "partition_id": [parts[i] for i in bad_parts],
                })
            for p_i, (frag, part) in enumerate(zip(frags, parts)):
                sel = part_idx == p_i
                emit({
                    "record_type": ["batch_stats"],
                    "check_id": [check.check_id],
                    "column": [check.column],
                    "fragment_id": [frag],
                    "partition_id": [part],
                    "n_rows": [int(sel.sum())],
                    "n_violations": [int(mask_np[sel].sum())],
                })

        # --- profile sketch partials (one record per column per partition)
        if self.profile is not None:
            for p_i, (frag, part) in enumerate(zip(frags, parts)):
                if len(frags) == 1:
                    sub = batch
                else:
                    sub = batch.filter(pa.array(part_idx == p_i))
                for colname in self.profile.columns:
                    if colname not in sub.column_names:
                        continue
                    payload = self._profile_column(sub, colname)
                    emit({
                        "record_type": ["sketch"],
                        "column": [colname],
                        "kind": ["profile"],
                        "fragment_id": [frag],
                        "partition_id": [part],
                        "n_rows": [len(sub)],
                        "payload": [payload],
                    })

        return pa.table(
            {name: pa.array(out[name], RECORDS_SCHEMA.field(name).type)
             for name in RECORDS_SCHEMA.names},
            schema=RECORDS_SCHEMA,
        )

    def _profile_column(self, batch: pa.Table, colname: str) -> bytes:
        col = batch[colname]
        as_length = colname in self.profile.length_columns
        part: dict[str, Any] = {
            "n": len(col),
            "null_count": int(col.null_count),
        }
        vals = _numeric_view(col, as_length)
        if vals is not None and vals.size:
            part["min"] = float(vals.min())
            part["max"] = float(vals.max())
            td = TDigest(self.profile.tdigest_delta)
            td.update(vals)
            part["tdigest"] = td.to_bytes()
            edges = self.profile.histogram_edges.get(colname)
            if edges is not None:
                h = FixedHistogram(edges)
                h.update(vals)
                part["hist"] = h.to_bytes()
        if colname in self.profile.distinct_columns:
            hll = HyperLogLog(self.profile.hll_p)
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            valid = arr.drop_null()
            if len(valid):
                hll.update(hash64(valid))
            part["hll"] = hll.to_bytes()
        return pickle.dumps(part, protocol=pickle.HIGHEST_PROTOCOL)


# ------------------------------------------------------------------ merge side


def merge_partial_payloads(payloads: list[bytes]) -> bytes:
    """Merge serialized per-batch profile partials into ONE partial (same
    format) — the combiner for the in-plane tree merge: a map_batches stage
    collapses hundreds of per-batch sketch records per (partition, column)
    down to a handful before the driver's final merge."""
    merged = merge_profile_payloads(payloads)
    part: dict[str, Any] = {
        "n": merged["n"],
        "null_count": merged["null_count"],
    }
    if merged.get("min") is not None:
        part["min"] = merged["min"]
        part["max"] = merged["max"]
    if "_tdigest" in merged:
        part["tdigest"] = merged["_tdigest"].to_bytes()
    if "_hll" in merged:
        part["hll"] = merged["_hll"].to_bytes()
    if "_hist" in merged:
        part["hist"] = merged["_hist"].to_bytes()
    return pickle.dumps(part, protocol=pickle.HIGHEST_PROTOCOL)


def make_sketch_merger(collapse_partitions: bool = False):
    """Build a records-stream combiner (optionally ignoring partition ids —
    valid for one-shot runs where sketch state is never checkpointed
    per-partition; cuts the driver's final merge to ~one partial per column
    per combiner batch)."""

    def merge(t: pa.Table) -> pa.Table:
        return _merge_sketch_records(t, collapse_partitions)

    return merge


def merge_sketch_records_batch(t: pa.Table) -> pa.Table:
    """Records-stream combiner: pass violations/stats through, merge sketch
    rows by (partition_id, column) within the batch."""
    return _merge_sketch_records(t, False)


def _merge_sketch_records(t: pa.Table, collapse_partitions: bool) -> pa.Table:
    import pyarrow.compute as pc_

    kind = t["record_type"]
    sketch_mask = pc_.equal(kind, "sketch")
    n_sketch = int(pc_.sum(pc_.cast(sketch_mask, pa.int64())).as_py() or 0)
    if n_sketch <= 1:
        return t
    others = t.filter(pc_.invert(sketch_mask))
    sk = t.filter(sketch_mask)
    groups: dict[tuple[str, str], dict[str, Any]] = {}
    cols = sk["column"].to_pylist()
    parts = sk["partition_id"].to_pylist()
    if collapse_partitions:
        parts = ["__all__"] * len(parts)
    frags = sk["fragment_id"].to_pylist()
    payloads = sk["payload"].to_pylist()
    n_rows = sk["n_rows"].to_pylist()
    for c, p, f, pay, nr in zip(cols, parts, frags, payloads, n_rows):
        g = groups.setdefault((p, c), {"frag": f, "payloads": [], "n_rows": 0})
        g["payloads"].append(pay)
        g["n_rows"] += nr or 0
    rows: dict[str, list] = {name: [] for name in RECORDS_SCHEMA.names}
    for (p, c), g in groups.items():
        for name in RECORDS_SCHEMA.names:
            rows[name].append(None)
        rows["record_type"][-1] = "sketch"
        rows["column"][-1] = c
        rows["kind"][-1] = "profile"
        rows["partition_id"][-1] = p
        rows["fragment_id"][-1] = g["frag"]
        rows["n_rows"][-1] = g["n_rows"]
        rows["payload"][-1] = merge_partial_payloads(g["payloads"])
    merged_t = pa.table(
        {name: pa.array(rows[name], RECORDS_SCHEMA.field(name).type)
         for name in RECORDS_SCHEMA.names},
        schema=RECORDS_SCHEMA,
    )
    return pa.concat_tables([others, merged_t])


def merge_profile_payloads(payloads: list[bytes]) -> dict[str, Any]:
    """Merge per-batch profile partials into one column profile dict."""
    out: dict[str, Any] = {"n": 0, "null_count": 0, "min": None, "max": None}
    hll: HyperLogLog | None = None
    td: TDigest | None = None
    hist: FixedHistogram | None = None
    for blob in payloads:
        p = pickle.loads(blob)
        out["n"] += p["n"]
        out["null_count"] += p["null_count"]
        if "min" in p:
            out["min"] = p["min"] if out["min"] is None else min(out["min"], p["min"])
            out["max"] = p["max"] if out["max"] is None else max(out["max"], p["max"])
        if "tdigest" in p:
            t = TDigest.from_bytes(p["tdigest"])
            td = t if td is None else (td.merge(t) or td)
        if "hll" in p:
            h = HyperLogLog.from_bytes(p["hll"])
            hll = h if hll is None else (hll.merge(h) or hll)
        if "hist" in p:
            fh = FixedHistogram.from_bytes(p["hist"])
            hist = fh if hist is None else (hist.merge(fh) or hist)
    out["null_rate"] = out["null_count"] / out["n"] if out["n"] else float("nan")
    if hll is not None:
        out["distinct_hll"] = hll.estimate()
        out["_hll"] = hll
    if td is not None:
        out["quantiles"] = {q: td.quantile(q) for q in (0.01, 0.25, 0.5, 0.75, 0.99)}
        out["_tdigest"] = td
    if hist is not None:
        out["_hist"] = hist
    return out
