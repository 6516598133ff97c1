"""End-to-end constraint-suite validation over a pages Dataset.

Pipeline shape (engine recast of the reference's ``metrics evaluate`` flow,
/root/reference/biosample_enricher/cli_metrics.py:24-328 — fetch → normalize →
per-sample evaluate → report):

    read_parquet(include_paths) ──► map_batches(Validator actor pool)
        │ one streaming pass, zero-copy Arrow
        ├── violation rows        ──► violations table / parquet sink
        ├── batch_stats partials  ──► tiny groupby-sum → pass/fail matrix
        └── sketch partials       ──► tree-merge → column profiles
    + a key-only shuffle for the uniqueness check (url column alone)

The record stream is orders of magnitude smaller than the corpus (violations
≈ planted-rate %, stats/sketches ≈ O(batches)), so materializing *records* —
never the corpus — is safe at scale.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.sketches import FixedHistogram, HyperLogLog, TDigest
from ..schema import (
    COMPLETENESS_COLUMNS,
    CRAWL_WINDOW_END,
    CRAWL_WINDOW_START,
    LANG_REGEX,
    PAGES_SCHEMA,
    PASSFAIL_SCHEMA,
    URL_REGEX,
    VIOLATIONS_SCHEMA,
)
from ..stages.checks import (
    CompletenessCheck,
    CrossFieldCheck,
    LengthRangeCheck,
    NotEmptyCheck,
    NotNullCheck,
    RangeCheck,
    ReferentialCheck,
    RegexCheck,
    RowCheck,
    SchemaCheck,
)
from ..stages.validator import PATH_COLUMN, ProfileSpec, Validator, merge_profile_payloads

import datetime as _dt

_TS_LO = _dt.datetime.fromisoformat(CRAWL_WINDOW_START)
_TS_HI = _dt.datetime.fromisoformat(CRAWL_WINDOW_END)


def default_pages_checks(
    lang_dim_ref: Any = None,
    domain_dim_ref: Any = None,
    max_text_len: int = 50_000_000,
    max_html_len: int = 512 * 1024 * 1024,
) -> list[RowCheck]:
    """The standard constraint suite over pages (SURVEY.md §7.1 checks 1–4, 6–7)."""
    checks: list[RowCheck] = [
        SchemaCheck(declared=PAGES_SCHEMA),
        NotNullCheck(column="url"),
        NotNullCheck(column="warc_ts"),
        NotEmptyCheck(column="text"),
        RegexCheck(column="url", pattern=URL_REGEX, check_id="url_format"),
        RegexCheck(column="lang", pattern=LANG_REGEX, check_id="lang_format"),
        RangeCheck(column="warc_ts", lo=_TS_LO, hi=_TS_HI, check_id="ts_window"),
        LengthRangeCheck(column="text", lo=1, hi=max_text_len),
        LengthRangeCheck(column="html", lo=1, hi=max_html_len),
        CrossFieldCheck(if_column="text", then_column="html"),
        CompletenessCheck(columns=COMPLETENESS_COLUMNS, threshold=0.75),
    ]
    if lang_dim_ref is not None:
        checks.append(
            ReferentialCheck(column="lang", dim_ref=lang_dim_ref, check_id="lang_in_dim")
        )
    if domain_dim_ref is not None:
        checks.append(
            ReferentialCheck(
                column="url", dim_ref=domain_dim_ref, key_fn="domain",
                check_id="domain_in_dim",
            )
        )
    return checks


SHRUNK_PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html_len", pa.int64()),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
    ]
)


def shrink_html_batch(t: pa.Table) -> pa.Table:
    """Reduce ``html`` (≈80% of corpus bytes) to its length at the scan.

    Every downstream check needs only html *validity/length*, never the
    payload bytes — so this stateless map (which Ray fuses with ReadParquet)
    keeps the blobs out of the object store and the validator stage entirely:
    the "prune at the read" rule applied to a derived column. Null html →
    null html_len, preserving the cross-field semantics.
    """
    cols: dict[str, object] = {}
    for name in t.column_names:
        if name == "html":
            cols["html_len"] = pc.cast(pc.binary_length(t["html"]), pa.int64())
        else:
            cols[name] = t[name]
    return pa.table(cols)


def shrunk_pages_checks(
    lang_dim_ref: Any = None,
    domain_dim_ref: Any = None,
    max_text_len: int = 50_000_000,
    max_html_len: int = 512 * 1024 * 1024,
) -> list[RowCheck]:
    """The standard suite re-targeted at the shrunk batch (html → html_len)."""
    checks: list[RowCheck] = [
        SchemaCheck(declared=SHRUNK_PAGES_SCHEMA),
        NotNullCheck(column="url"),
        NotNullCheck(column="warc_ts"),
        NotEmptyCheck(column="text"),
        RegexCheck(column="url", pattern=URL_REGEX, check_id="url_format"),
        RegexCheck(column="lang", pattern=LANG_REGEX, check_id="lang_format"),
        RangeCheck(column="warc_ts", lo=_TS_LO, hi=_TS_HI, check_id="ts_window"),
        LengthRangeCheck(column="text", lo=1, hi=max_text_len),
        RangeCheck(column="html_len", lo=1, hi=max_html_len,
                   check_id="len_range:html", expected=f"length in [1, {max_html_len}]"),
        CrossFieldCheck(if_column="text", then_column="html_len",
                        check_id="cross:text->html"),
        CompletenessCheck(columns=COMPLETENESS_COLUMNS, threshold=0.75),
    ]
    if lang_dim_ref is not None:
        checks.append(
            ReferentialCheck(column="lang", dim_ref=lang_dim_ref, check_id="lang_in_dim")
        )
    if domain_dim_ref is not None:
        checks.append(
            ReferentialCheck(column="url", dim_ref=domain_dim_ref, key_fn="domain",
                             check_id="domain_in_dim")
        )
    return checks


def shrunk_pages_profile() -> ProfileSpec:
    """Profile spec over the shrunk batch (html_len already numeric)."""
    base = default_pages_profile()
    return ProfileSpec(
        columns=["url", "warc_ts", "html_len", "text", "lang"],
        distinct_columns=["url", "lang"],
        length_columns=["text"],
        histogram_edges=base.histogram_edges,
    )


def default_pages_profile() -> ProfileSpec:
    """Profile spec: null rates everywhere, HLL on url/lang, TDigest+histogram
    on len(text) and warc_ts (drift inputs; FIXTURES.md §3)."""
    text_edges = np.concatenate([[0.0], np.logspace(1, 7, 25)])  # chars, log buckets
    ts_edges = (
        np.arange(
            np.datetime64(CRAWL_WINDOW_START.replace("T", " ")),
            np.datetime64(CRAWL_WINDOW_END.replace("T", " ")) + np.timedelta64(1, "D"),
            np.timedelta64(7, "D"),
        )
        .astype("datetime64[us]")
        .astype(np.int64)
        .astype(np.float64)
    )
    return ProfileSpec(
        columns=["url", "warc_ts", "html", "text", "lang"],
        distinct_columns=["url", "lang"],
        length_columns=["text", "html"],
        histogram_edges={"text": text_edges, "warc_ts": ts_edges},
    )


@dataclass
class ValidationResult:
    """Driver-side summary of one validation run (small, materialized)."""

    violations: pa.Table
    matrix: pd.DataFrame  # columns: partition_id, check_id, passed, n_violations, n_rows
    profiles: dict[str, dict[str, Any]] = field(default_factory=dict)
    n_rows: int = 0

    def matrix_table(self) -> pa.Table:
        return pa.Table.from_pandas(self.matrix, schema=PASSFAIL_SCHEMA,
                                    preserve_index=False)

    def violations_sorted(self) -> pa.Table:
        """Canonical (check_id, url) sort for fixture comparison (SURVEY.md §7.4)."""
        return self.violations.sort_by([("check_id", "ascending"), ("url", "ascending")])

    @property
    def total_violations(self) -> int:
        return len(self.violations)

    def passed(self) -> bool:
        return bool(self.matrix["passed"].all()) if len(self.matrix) else True


def records_dataset(
    ds: ray.data.Dataset,
    checks: list[RowCheck],
    profile: ProfileSpec | None = None,
    *,
    batch_size: int = 2048,
    concurrency: int | tuple[int, int] | None = None,
    path_column: str | None = PATH_COLUMN,
    stage_mode: str = "actors",
) -> ray.data.Dataset:
    """Lazy record stream (violations + stats + sketches) for a pages Dataset.

    ``batch_size`` defaults low because ``html`` rows can be multi-MB (giant
    blob stress, FIXTURES.md §1) — a 2048-row batch of median-4KB html is
    ~8 MB; giants make single batches of up to a few hundred MB which Arrow
    handles without splitting rows.
    """
    if concurrency is None:
        # Actor pools must be bounded explicitly. Reserve 2 CPUs for the read /
        # shuffle stages — a pool that takes every CPU starves ReadParquet and
        # the pipeline stalls (observed: full-CPU pool hung on a 4-CPU session).
        # AUTOSCALING (min, max) rather than a fixed size: a fixed pool spins
        # max actors even for a one-block input (measured 9-16 s of pure
        # actor startup on a 500-row table at 8-32 CPUs); (1, cpus-2) starts
        # one actor and grows only while batches queue, reaching the same
        # ceiling on big inputs.
        import ray

        concurrency = (1, max(2, int(ray.cluster_resources().get("CPU", 4)) - 2))
    if stage_mode not in ("actors", "tasks"):
        # the A/B knob exists to compare the two arms — a typo silently
        # benchmarking actors-vs-actors would corrupt the measurement
        raise ValueError(f"stage_mode must be 'actors' or 'tasks', got {stage_mode!r}")
    if stage_mode == "tasks":
        # task-stage variant: Validator setup is a suite compile + zero-copy
        # ray.get of the broadcast dims (~ms), so taskify's per-worker memo
        # makes tasks start instantly on the session's long-lived workers —
        # skipping the ~2.5 s actor-pool spin-up that dominates small-corpus
        # invocations. Actor mode stays the default: pinned-actor block
        # prefetch wins on multi-GB inputs (measured round 4).
        from ..stages import taskify

        rec = ds.map_batches(
            taskify(Validator, checks=checks, profile=profile,
                    path_column=path_column),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    else:
        rec = ds.map_batches(
            Validator,
            fn_constructor_kwargs=dict(checks=checks, profile=profile,
                                       path_column=path_column),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    if profile is not None:
        # in-plane combiner: collapse per-batch sketch partials per
        # (partition, column) before they reach the driver's final merge —
        # the two-level tree merge (SURVEY.md §2.6 A3)
        from ..stages.validator import merge_sketch_records_batch

        rec = rec.map_batches(merge_sketch_records_batch, batch_format="pyarrow",
                              batch_size=8192)
    return rec


def summarize_records(
    records: ray.data.Dataset | pa.Table,
    *,
    max_violations_per_check: int | None = None,
    violations_path: str | None = None,
) -> ValidationResult:
    """Aggregate a record stream into violations / matrix / profiles.

    The stream is consumed once via ``iter_batches``. Violation rows are the
    only O(corpus) hazard here (a systemically-failing check makes them
    proportional to the input): ``max_violations_per_check`` caps what the
    driver RETAINS per check (counts in the matrix stay exact — they come
    from the batch_stats records), and ``violations_path`` streams every
    violation row to a parquet sink batch-by-batch so nothing is lost when
    the in-memory sample is capped. Defaults preserve the collect-all
    behavior for small runs.
    """
    tables: list[pa.Table] = []
    if isinstance(records, pa.Table):
        batches = [records]
    else:
        batches = records.iter_batches(batch_size=65536, batch_format="pyarrow")

    import pyarrow.parquet as pq

    viol_parts: list[pa.Table] = []
    stats_parts: list[pa.Table] = []
    sketch_parts: list[pa.Table] = []
    kept: dict[str, int] = {}
    writer: pq.ParquetWriter | None = None
    n_batches = 0
    try:
        for b in batches:
            n_batches += 1
            kind_col = b["record_type"]
            viol = b.filter(pc.equal(kind_col, "violation"))
            if len(viol):
                v = viol.select(VIOLATIONS_SCHEMA.names)
                if violations_path is not None:
                    if writer is None:
                        writer = pq.ParquetWriter(violations_path, v.schema)
                    writer.write_table(v)
                if max_violations_per_check is None:
                    viol_parts.append(v)
                else:
                    for cid in pc.unique(v["check_id"]).to_pylist():
                        room = max_violations_per_check - kept.get(cid, 0)
                        if room <= 0:
                            continue
                        rows = v.filter(pc.equal(v["check_id"], cid)).slice(0, room)
                        kept[cid] = kept.get(cid, 0) + len(rows)
                        viol_parts.append(rows)
            stats_parts.append(b.filter(pc.equal(kind_col, "batch_stats")))
            sketch_parts.append(b.filter(pc.equal(kind_col, "sketch")))
    finally:
        if writer is not None:
            writer.close()

    if n_batches == 0:
        rec = pa.table({f.name: pa.array([], f.type) for f in VIOLATIONS_SCHEMA})
        if violations_path is not None and writer is None:
            # the sink was promised — deliver an empty file with the schema
            # rather than leaving downstream readers a FileNotFoundError
            pq.write_table(rec, violations_path)
        return ValidationResult(violations=rec,
                                matrix=pd.DataFrame(columns=PASSFAIL_SCHEMA.names))

    violations = (
        pa.concat_tables(viol_parts, promote_options="default")
        if viol_parts
        else pa.table({f.name: pa.array([], f.type) for f in VIOLATIONS_SCHEMA})
    )
    stats = pa.concat_tables(stats_parts, promote_options="default")
    rec = pa.concat_tables(sketch_parts, promote_options="default")

    sdf = stats.select(["partition_id", "check_id", "n_rows", "n_violations"]).to_pandas()
    if len(sdf):
        matrix = (
            sdf.groupby(["partition_id", "check_id"], as_index=False)[
                ["n_violations", "n_rows"]
            ]
            .sum()
        )
        matrix["passed"] = matrix["n_violations"] == 0
        matrix = matrix[["partition_id", "check_id", "passed", "n_violations", "n_rows"]]
        matrix = matrix.sort_values(["partition_id", "check_id"]).reset_index(drop=True)
        n_rows = int(
            matrix.groupby("check_id")["n_rows"].sum().max() if len(matrix) else 0
        )
    else:
        matrix = pd.DataFrame(columns=PASSFAIL_SCHEMA.names)
        n_rows = 0

    sketches = rec
    profiles: dict[str, dict[str, Any]] = {}
    if len(sketches):
        cols = sketches["column"].to_pylist()
        payloads = sketches["payload"].to_pylist()
        by_col: dict[str, list[bytes]] = {}
        for c, p in zip(cols, payloads):
            by_col.setdefault(c, []).append(p)
        profiles = {c: merge_profile_payloads(ps) for c, ps in by_col.items()}

    return ValidationResult(violations=violations, matrix=matrix,
                            profiles=profiles, n_rows=n_rows)


def validate_dataset(
    ds: ray.data.Dataset,
    checks: list[RowCheck] | None = None,
    profile: ProfileSpec | None = None,
    *,
    uniqueness_column: str | None = "url",
    uniqueness_ds: ray.data.Dataset | None = None,
    uniqueness_paths: list[str] | None = None,
    batch_size: int = 2048,
    concurrency: int | tuple[int, int] | None = None,
    path_column: str | None = PATH_COLUMN,
    max_violations_per_check: int | None = None,
    violations_path: str | None = None,
    stage_mode: str = "actors",
) -> ValidationResult:
    """One-shot validation of a Dataset: row checks + profile + uniqueness.

    Uniqueness source, fastest first:
    - ``uniqueness_paths``: parquet fragment paths → explicit numpy hash
      shuffle (stages.shuffle.parquet_key_uniqueness; ~15× faster than the
      Dataset sort-aggregate on this node). Preferred whenever the corpus is
      parquet on disk.
    - ``uniqueness_ds``: a *pruned* re-read of just the key column. Ray's
      projection pushdown does not reach the parquet scan through an
      ``include_paths`` read, so reusing ``ds`` would re-ship every column
      (html blobs included) through the object store — measured 5× slower.
    - fallback: ``ds`` itself (generic but slowest).

    For the checkpointed / resumable variant see ``state.checkpoint.run_validation``.
    """
    checks = checks if checks is not None else default_pages_checks()
    result = summarize_records(
        records_dataset(ds, checks, profile, batch_size=batch_size,
                        concurrency=concurrency, path_column=path_column,
                        stage_mode=stage_mode),
        max_violations_per_check=max_violations_per_check,
        violations_path=violations_path,
    )
    if uniqueness_column:
        if uniqueness_paths is not None:
            from ..stages.shuffle import parquet_key_uniqueness

            pdf = parquet_key_uniqueness(uniqueness_paths, uniqueness_column)
            dup = _dup_frame_to_violations(pdf, uniqueness_column)
        else:
            dup = uniqueness_violations(
                uniqueness_ds if uniqueness_ds is not None else ds, uniqueness_column
            )
        result = _merge_uniqueness(result, dup, uniqueness_column, result.n_rows)
    return result


# ----------------------------------------------------------------- uniqueness


def uniqueness_violations(
    ds: ray.data.Dataset, column: str = "url", check_id: str | None = None
) -> pa.Table:
    """Global uniqueness check — the one unavoidable all-to-all exchange.

    Engine analog of the reference's assumed-unique Mongo ids / per-row ID
    dedup (adapters.py:330-337) promoted to a first-class corpus check
    (north_rule: "uniqueness on url via hash-partitioned groupby-aggregate").

    Scale design: **only the key column is shuffled** (``select_columns``
    before the groupby), so the exchange moves ~bytes-per-key × rows, not the
    corpus. Hot keys are benign here: the aggregate is an additive count, so
    Ray's hash-partitioned sort-aggregate pre-combines within blocks.
    Returns duplicate keys with their multiplicities as violation rows.
    """
    check_id = check_id or f"unique:{column}"
    from ray.data.aggregate import Sum

    def _value_counts(t: pa.Table) -> pa.Table:
        # combiner: collapse to (key, partial_count) inside each batch BEFORE
        # the shuffle — the classic partial-aggregation push-down (SURVEY.md
        # §4.2 "push aggregation partial"); the exchange then moves one row
        # per distinct key per block instead of one per input row.
        c = t[column].combine_chunks().value_counts()
        return pa.table({column: c.field("values"), "n": c.field("counts")})

    counts = (
        ds.select_columns([column])
        .map_batches(_value_counts, batch_format="pyarrow")
        .groupby(column)
        .aggregate(Sum("n", alias_name="n"))
    )

    def _only_dups(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["n"], 1))

    dup = counts.map_batches(_only_dups, batch_format="pyarrow")
    pdf = dup.to_pandas()  # duplicates only — small by construction
    if len(pdf) == 0 or column not in pdf.columns:
        pdf = pd.DataFrame({column: [], "n": []})
    return _dup_frame_to_violations(pdf, column, check_id)


def _dup_frame_to_violations(
    pdf: pd.DataFrame, column: str, check_id: str | None = None
) -> pa.Table:
    """(key, n) duplicate frame → violation rows in the canonical shape."""
    check_id = check_id or f"unique:{column}"
    n = len(pdf)
    return pa.table(
        {
            "url": pa.array(pdf[column].astype(str) if n else [], pa.string()),
            "check_id": pa.array([check_id] * n, pa.string()),
            "column": pa.array([column] * n, pa.string()),
            "observed": pa.array([f"count={c}" for c in pdf["n"]] if n else [],
                                 pa.string()),
            "expected": pa.array(["count=1"] * n, pa.string()),
            "fragment_id": pa.nulls(n, pa.string()),
            "partition_id": pa.array(["__global__"] * n, pa.string()),
            "kind": pa.nulls(n, pa.string()),
        },
        schema=VIOLATIONS_SCHEMA,
    )


def _merge_uniqueness(
    result: ValidationResult, dup: pa.Table, column: str, n_rows: int
) -> ValidationResult:
    check_id = f"unique:{column}"
    result.violations = pa.concat_tables([result.violations, dup])
    extra = pd.DataFrame(
        [
            {
                "partition_id": "__global__",
                "check_id": check_id,
                "passed": len(dup) == 0,
                "n_violations": len(dup),
                "n_rows": n_rows,
            }
        ]
    )
    result.matrix = pd.concat([result.matrix, extra], ignore_index=True)
    return result


# ------------------------------------------------------------------- drift


def drift_report(
    current_profiles: dict[str, dict[str, Any]],
    baseline: dict[str, dict[str, Any]],
    *,
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.2,
) -> pd.DataFrame:
    """KS + PSI of current column histograms vs. a pinned baseline snapshot.

    Engine recast of the reference's before/after coverage comparison
    (metrics/reporter.py:28-143) and tolerance-window alignment
    (metrics/aligner.py:251-295): drift beyond threshold fails the check.
    """
    from ..functions.sketches import ks_statistic, psi as psi_fn

    rows = []
    for col, base in baseline.items():
        cur = current_profiles.get(col)
        if cur is None or "_hist" not in cur or "_hist" not in base:
            continue
        ks = ks_statistic(cur["_hist"], base["_hist"])
        p = psi_fn(cur["_hist"], base["_hist"])
        rows.append(
            {
                "column": col,
                "ks": ks,
                "psi": p,
                "ks_passed": bool(ks <= ks_threshold),
                "psi_passed": bool(p <= psi_threshold),
            }
        )
    return pd.DataFrame(rows, columns=["column", "ks", "psi", "ks_passed", "psi_passed"])


def save_baseline_snapshot(profiles: dict[str, dict[str, Any]], path: str) -> None:
    """Serialize a profile dict as the pinned baseline (FIXTURES.md §3)."""
    ser: dict[str, dict[str, Any]] = {}
    for col, p in profiles.items():
        d = {k: v for k, v in p.items() if not k.startswith("_")}
        if "_hist" in p:
            d["hist_bytes"] = p["_hist"].to_bytes()
        if "_tdigest" in p:
            d["tdigest_bytes"] = p["_tdigest"].to_bytes()
        if "_hll" in p:
            d["hll_bytes"] = p["_hll"].to_bytes()
        ser[col] = d
    with open(path, "wb") as f:
        pickle.dump(ser, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_baseline_snapshot(path: str) -> dict[str, dict[str, Any]]:
    with open(path, "rb") as f:
        ser = pickle.load(f)
    out: dict[str, dict[str, Any]] = {}
    for col, d in ser.items():
        p = dict(d)
        if "hist_bytes" in p:
            p["_hist"] = FixedHistogram.from_bytes(p.pop("hist_bytes"))
        if "tdigest_bytes" in p:
            p["_tdigest"] = TDigest.from_bytes(p.pop("tdigest_bytes"))
        if "hll_bytes" in p:
            p["_hll"] = HyperLogLog.from_bytes(p.pop("hll_bytes"))
        out[col] = p
    return out
