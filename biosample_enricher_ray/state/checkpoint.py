"""Per-partition checkpoint store: lineage + metrics + sketch state + resume.

The reference's only cross-run persistence is its HTTP response cache — a
memoization layer that makes re-runs cheap (/root/reference/biosample_enricher/
http_cache.py:69-130). The engine promotes that idea to *partition
granularity* (SURVEY.md §4.2): every partition of input fragments writes, on
completion, an atomic commit record carrying

- lineage: the input fragment paths + suite version (analog of Observation
  provenance fields, models.py:202-216),
- metrics: the partition's pass/fail matrix rows,
- sketch state: serialized per-column profile partials (HLL/TDigest/histogram),

plus its violation rows as Parquet. A killed run, restarted with the same
``out_dir``, lists committed partitions and re-executes only the remainder —
the resume gate in BASELINE.md.

Scale notes: partitions are *groups of input files* (default ~4 files each);
within a partition Ray Data parallelizes across fragments/blocks, and
``max_concurrent_partitions`` partition pipelines run at once from driver
threads, so the cluster stays busy across partition boundaries while commit
granularity stays small enough for useful resume. Outputs are written to a
temp dir and atomically renamed; re-running a half-written partition is
idempotent (overwrite-on-rename).
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..schema import SUITE_VERSION
from ..stages.checks import RowCheck
from ..stages.validator import ProfileSpec
from ..pipelines.validate import (
    ValidationResult,
    records_dataset,
    summarize_records,
    uniqueness_violations,
)

COMMIT_SUFFIX = ".commit.json"


def input_fingerprints(paths: list[str]) -> list[list]:
    """``[path, size_bytes, mtime_ns]`` per input fragment — the commit
    staleness guard (round-4 VERDICT ask #9): a silently-regenerated input
    (same path, new bytes) changes size or mtime, so commits carrying the
    old fingerprint re-execute instead of reusing stale output. Analog of
    the reference cache's TTL invalidation (http_cache.py:78), keyed on
    input identity rather than wall-clock age."""
    out = []
    for p in paths:
        st = os.stat(p)
        out.append([p, st.st_size, st.st_mtime_ns])
    return out


def suite_fingerprint(checks: list[RowCheck]) -> str:
    """Stable digest of the COMPILED suite so resume can detect edits to a
    user YAML suite, not just bumps of the package SUITE_VERSION constant.

    Serializes each check's class plus its dataclass fields (reprs), skipping
    run-scoped broadcast handles (``dim_ref`` is a fresh ObjectRef every run;
    ``_value_set`` is its resolution). Dim CONTENT is covered via the
    fingerprintable ``dim_digest`` field (suite.py computes it at compile
    time), so editing inline ``values`` or a parquet dim invalidates resume.
    HASH_VERSION ties checkpointed sketch state (HLL registers depend on
    hash64's exact values) to the engine's hash implementation — bumping it
    forces re-execution instead of merging incompatible sketches.
    """
    import dataclasses
    import hashlib

    from ..functions.hashing import HASH_VERSION

    parts = [SUITE_VERSION, f"hashv={HASH_VERSION}"]
    for c in checks:
        fields = []
        for f in dataclasses.fields(c):
            if f.name in ("dim_ref", "_value_set"):
                continue
            fields.append(f"{f.name}={getattr(c, f.name)!r}")
        parts.append(f"{type(c).__name__}({','.join(fields)})")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]

# Dataset *construction* (datasource metadata resolution) is serialized across
# the partition threads: ray's path resolution probes optional fsspec modules,
# and concurrent first-imports of a missing optional dep can surface a partial
# module ("cannot import name ...") instead of the handled ModuleNotFoundError.
# Execution still runs fully parallel — only the cheap setup takes the lock.
import threading

_DATASET_SETUP_LOCK = threading.Lock()


@dataclass
class PartitionPlan:
    partition_id: str
    fragments: list[str]


def plan_partitions(input_paths: list[str], files_per_partition: int = 4) -> list[PartitionPlan]:
    """Deterministic partitioning of input fragments (sorted, chunked)."""
    paths = sorted(input_paths)
    plans = []
    for i in range(0, len(paths), files_per_partition):
        chunk = paths[i : i + files_per_partition]
        plans.append(PartitionPlan(partition_id=f"part-{i // files_per_partition:05d}",
                                   fragments=chunk))
    return plans


def committed_partitions(out_dir: str) -> dict[str, dict[str, Any]]:
    commits_dir = os.path.join(out_dir, "commits")
    if not os.path.isdir(commits_dir):
        return {}
    out = {}
    for name in os.listdir(commits_dir):
        if name.endswith(COMMIT_SUFFIX):
            with open(os.path.join(commits_dir, name)) as f:
                rec = json.load(f)
            out[rec["partition_id"]] = rec
    return out


def write_partitioned_resumable(
    input_paths: list[str],
    out_dir: str,
    *,
    transform=None,
    transform_id: str = "",
    columns: list[str] | None = None,
    files_per_partition: int = 4,
) -> dict[str, Any]:
    """Generic resumable shard-partitioned parquet sink (task brief
    "resumable output"): one output file per input-fragment partition under
    ``out_dir/data/``, an atomic commit marker with lineage (fragments, row
    count, transform version) under ``out_dir/commits/`` — never one giant
    file. A rerun skips partitions whose marker exists, matches
    ``transform_id`` and still has its data file; a killed run loses only
    in-flight partitions (markers land per partition as tasks finish, not at
    the end).

    ``transform``: optional ``pa.Table -> pa.Table`` applied per partition
    (serialized to the task); ``transform_id`` versions it — the
    suite-fingerprint-resume rule applied to sinks, so editing the transform
    invalidates stale output instead of silently reusing it.

    Returns ``{"partitions", "written", "skipped", "rows_written"}``.
    """
    import ray

    plans = plan_partitions(input_paths, files_per_partition)
    commits_dir = os.path.join(out_dir, "commits")
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(commits_dir, exist_ok=True)
    os.makedirs(data_dir, exist_ok=True)
    done = committed_partitions(out_dir)

    plan_by_id = {p.partition_id: p for p in plans}

    def _fresh(pid: str) -> bool:
        rec = done.get(pid)
        return (
            rec is not None
            and rec.get("transform_id") == transform_id
            and os.path.exists(rec.get("path", ""))
            and rec.get("input_fingerprints")
            == input_fingerprints(plan_by_id[pid].fragments)
        )

    @ray.remote
    def write_one(plan: PartitionPlan) -> dict[str, Any]:
        t = pa.concat_tables(
            [pq.read_table(p, columns=columns) for p in plan.fragments]
        )
        if transform is not None:
            t = transform(t)
        data_path = os.path.join(data_dir, plan.partition_id + ".parquet")
        tmp = data_path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, data_path)
        return {
            "partition_id": plan.partition_id,
            "fragments": plan.fragments,
            "input_fingerprints": input_fingerprints(plan.fragments),
            "n_rows": t.num_rows,
            "transform_id": transform_id,
            "path": data_path,
            "committed_at": time.time(),
        }

    todo = [p for p in plans if not _fresh(p.partition_id)]
    pending = {write_one.remote(p): p for p in todo}
    rows_written = 0
    while pending:
        ready, _ = ray.wait(list(pending), num_returns=1)
        rec = ray.get(ready[0])
        pending.pop(ready[0])
        # marker AFTER the data rename — commit order is what makes a kill
        # at any point resumable
        _atomic_write_json(
            os.path.join(commits_dir, rec["partition_id"] + COMMIT_SUFFIX), rec
        )
        rows_written += rec["n_rows"]
    return {
        "partitions": len(plans),
        "written": len(todo),
        "skipped": len(plans) - len(todo),
        "rows_written": rows_written,
    }


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, default=str)
    os.replace(tmp, path)


def run_partition(
    plan: PartitionPlan,
    out_dir: str,
    checks: list[RowCheck],
    profile: ProfileSpec | None,
    *,
    batch_size: int = 2048,
    concurrency: int | None = None,
    max_violations_per_check: int | None = None,
    full_violations_sink: bool = False,
) -> dict[str, Any]:
    """Validate one partition's fragments; write violations + commit record.

    ``max_violations_per_check`` caps what the partition RETAINS per check
    (one-shot-path parity, validate.summarize_records) so a systemically-
    failing check cannot blow a resumable run; matrix counts stay exact.
    With ``full_violations_sink`` every violation row additionally streams
    to ``violations_full.parquet`` inside the partition dir.
    """
    start = time.time()
    with _DATASET_SETUP_LOCK:
        ds = ray.data.read_parquet(plan.fragments, include_paths=True)
    records = records_dataset(ds, checks, profile, batch_size=batch_size,
                              concurrency=concurrency)

    part_dir = os.path.join(out_dir, "partitions", plan.partition_id)
    tmp_dir = part_dir + ".tmp"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir, exist_ok=True)
    result = summarize_records(
        records,
        max_violations_per_check=max_violations_per_check,
        violations_path=(os.path.join(tmp_dir, "violations_full.parquet")
                         if full_violations_sink else None),
    )
    pq.write_table(result.violations, os.path.join(tmp_dir, "violations.parquet"))
    result.matrix.to_parquet(os.path.join(tmp_dir, "passfail.parquet"))
    with open(os.path.join(tmp_dir, "sketches.pkl"), "wb") as f:
        pickle.dump(_serializable_profiles(result.profiles), f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    if os.path.isdir(part_dir):
        shutil.rmtree(part_dir)
    os.replace(tmp_dir, part_dir)

    commit = {
        "partition_id": plan.partition_id,
        "input_fragment_ids": plan.fragments,
        "input_fingerprints": input_fingerprints(plan.fragments),
        "suite_version": suite_fingerprint(checks),
        "n_rows": result.n_rows,
        "n_violations": result.total_violations,
        "wall_sec": round(time.time() - start, 3),
        "status": "committed",
    }
    commits_dir = os.path.join(out_dir, "commits")
    os.makedirs(commits_dir, exist_ok=True)
    _atomic_write_json(
        os.path.join(commits_dir, plan.partition_id + COMMIT_SUFFIX), commit
    )
    return commit


def _serializable_profiles(profiles: dict[str, dict[str, Any]]) -> dict[str, dict[str, Any]]:
    out = {}
    for col, p in profiles.items():
        d = {k: v for k, v in p.items() if not k.startswith("_")}
        for key, attr in (("hist_bytes", "_hist"), ("tdigest_bytes", "_tdigest"),
                          ("hll_bytes", "_hll")):
            if attr in p:
                d[key] = p[attr].to_bytes()
        out[col] = d
    return out


def run_validation(
    input_paths: list[str],
    out_dir: str,
    checks: list[RowCheck],
    profile: ProfileSpec | None = None,
    *,
    files_per_partition: int = 4,
    max_concurrent_partitions: int = 2,
    batch_size: int = 2048,
    concurrency: int | None = None,
    uniqueness_column: str | None = "url",
    resume: bool = True,
    max_violations_per_check: int | None = None,
    violations_path: str | None = None,
) -> ValidationResult:
    """Checkpointed, resumable validation over a list of parquet fragments.

    On resume, committed partitions are *loaded from their checkpoints*
    (violations + matrix + sketches) and only uncommitted partitions execute.
    The global uniqueness check runs once at the end over the full input (it
    cannot be partition-local) and is recorded in the run manifest.

    ``max_violations_per_check`` / ``violations_path`` mirror the one-shot
    path (validate_dataset): the cap bounds what each partition retains per
    check (exact counts stay in the matrix), and the sink path receives the
    FULL violation stream — assembled from per-partition
    ``violations_full.parquet`` files, so a resumed run still delivers every
    row. A commit produced without the sink cannot be reused when the sink
    is requested, so such partitions re-execute.
    """
    os.makedirs(out_dir, exist_ok=True)
    plans = plan_partitions(input_paths, files_per_partition)
    fp = suite_fingerprint(checks)
    commits = committed_partitions(out_dir) if resume else {}
    # A commit is reusable only if it was produced from the SAME input
    # fragments under the SAME suite version: partition ids are positional
    # (part-NNNNN over the sorted path list), so adding/removing an input
    # file or changing the suite silently shifts what each id means — such
    # stale commits must re-execute, not merge into the result.
    def _commit_reusable(p: PartitionPlan) -> bool:
        c = commits.get(p.partition_id)
        if (c is None or c.get("input_fragment_ids") != p.fragments
                or c.get("suite_version") != fp
                # staleness guard: a rewritten input file (same path, new
                # size/mtime) invalidates exactly this partition
                or c.get("input_fingerprints") != input_fingerprints(p.fragments)):
            return False
        if violations_path is not None and not os.path.exists(
            os.path.join(out_dir, "partitions", p.partition_id,
                         "violations_full.parquet")
        ):
            return False  # sink requested but this commit never streamed it
        return True

    done = {p.partition_id: commits[p.partition_id]
            for p in plans if _commit_reusable(p)}
    todo = [p for p in plans if p.partition_id not in done]

    if todo:
        workers = max(1, min(max_concurrent_partitions, len(todo)))
        if concurrency is None:
            # Split the session's CPUs across the concurrently-running
            # partition pipelines, keeping 2 CPUs free for read/shuffle tasks —
            # actor pools that reserve every CPU starve the reads and stall.
            total = int(ray.cluster_resources().get("CPU", 4))
            concurrency = max(1, (total - 2) // workers)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            futures = [
                pool.submit(run_partition, p, out_dir, checks, profile,
                            batch_size=batch_size, concurrency=concurrency,
                            max_violations_per_check=max_violations_per_check,
                            full_violations_sink=violations_path is not None)
                for p in todo
            ]
            for f in futures:
                f.result()

    # assemble global result from per-partition checkpoints
    violations: list[pa.Table] = []
    matrices: list[pd.DataFrame] = []
    merged_profiles: dict[str, dict[str, Any]] = {}
    from ..pipelines.validate import load_baseline_snapshot  # same codec

    for plan in plans:
        part_dir = os.path.join(out_dir, "partitions", plan.partition_id)
        violations.append(pq.read_table(os.path.join(part_dir, "violations.parquet")))
        matrices.append(pd.read_parquet(os.path.join(part_dir, "passfail.parquet")))
        sk_path = os.path.join(part_dir, "sketches.pkl")
        if os.path.exists(sk_path):
            part_profiles = load_baseline_snapshot(sk_path)
            _merge_profiles_into(merged_profiles, part_profiles)

    result = ValidationResult(
        violations=pa.concat_tables(violations) if violations else pa.table({}),
        matrix=(pd.concat(matrices, ignore_index=True) if matrices else pd.DataFrame()),
        profiles=merged_profiles,
    )
    if len(result.matrix):
        result.n_rows = int(result.matrix.groupby("check_id")["n_rows"].sum().max())

    dup = None
    if uniqueness_column:
        # explicit numpy hash shuffle over the key column only — never ships
        # html/text blobs, ~15× faster than the Dataset sort-aggregate
        from ..pipelines.validate import _dup_frame_to_violations, _merge_uniqueness
        from ..stages.shuffle import parquet_key_uniqueness

        pdf = parquet_key_uniqueness(sorted(input_paths), uniqueness_column)
        dup = _dup_frame_to_violations(pdf, uniqueness_column)
        result = _merge_uniqueness(result, dup, uniqueness_column, result.n_rows)

    if violations_path is not None:
        # assemble the FULL violation stream (per-partition sinks + global
        # uniqueness rows) into the caller's single sink file
        full_parts = []
        for plan in plans:
            p_full = os.path.join(out_dir, "partitions", plan.partition_id,
                                  "violations_full.parquet")
            if os.path.exists(p_full):
                full_parts.append(pq.read_table(p_full))
        if dup is not None and len(dup):
            full_parts.append(dup)
        full = (pa.concat_tables(full_parts, promote_options="default")
                if full_parts else result.violations.slice(0, 0))
        pq.write_table(full, violations_path)

    manifest = {
        "suite_version": fp,
        "n_partitions": len(plans),
        "resumed_partitions": sorted(done),
        "executed_partitions": sorted(p.partition_id for p in todo),
        "n_rows": result.n_rows,
        "n_violations": result.total_violations,
        "finished_at": time.time(),
    }
    _atomic_write_json(os.path.join(out_dir, "run_manifest.json"), manifest)
    return result


def _merge_profiles_into(acc: dict[str, dict[str, Any]],
                         part: dict[str, dict[str, Any]]) -> None:
    """Merge per-partition profile dicts (sketches merge, counters add)."""
    for col, p in part.items():
        if col not in acc:
            acc[col] = p
            continue
        a = acc[col]
        a["n"] = a.get("n", 0) + p.get("n", 0)
        a["null_count"] = a.get("null_count", 0) + p.get("null_count", 0)
        for key in ("min",):
            if p.get(key) is not None:
                a[key] = p[key] if a.get(key) is None else min(a[key], p[key])
        for key in ("max",):
            if p.get(key) is not None:
                a[key] = p[key] if a.get(key) is None else max(a[key], p[key])
        for attr in ("_hist", "_tdigest", "_hll"):
            if attr in p:
                if attr in a:
                    a[attr].merge(p[attr])
                else:
                    a[attr] = p[attr]
        if a.get("n"):
            a["null_rate"] = a["null_count"] / a["n"]
        if "_hll" in a:
            a["distinct_hll"] = a["_hll"].estimate()
        if "_tdigest" in a:
            a["quantiles"] = {q: a["_tdigest"].quantile(q)
                              for q in (0.01, 0.25, 0.5, 0.75, 0.99)}


# ------------------------------------------------------------ curation resume

CURATION_VERSION = "1"


def run_curation(
    sf_dir: str,
    out_dir: str,
    *,
    resume: bool = True,
    stop_after: str | None = None,
) -> dict[str, Any]:
    """Two-stage-commit resumable curation pipeline (round-4 VERDICT ask #8):
    the composed gate→dedup→cap pipeline of ``curation_pipeline_documents``
    with a durable commit between its two expensive halves, so a kill
    between stages resumes from the keeper table instead of re-running the
    corpus-wide gated dedup.

    - **Stage 1 "keepers"**: quality/language gate + gated exact dedup →
      ``keepers.parquet`` (sorted keeper doc_ids) + atomic commit marker
      with the documents file's fingerprint.
    - **Stage 2 "capped"**: keeper broadcast semi-join + per-source cap →
      ``capped.parquet`` (doc_id, source, n_chars) + commit marker, which
      also fingerprints ``keepers.parquet`` so a stage-1 re-run invalidates
      stage 2.

    Commits follow the validation-run rules: data rename BEFORE marker,
    ``CURATION_VERSION`` bumps invalidate, rewritten inputs invalidate via
    ``input_fingerprints``. ``stop_after='keepers'`` returns after stage 1
    (the kill-between-stages hook for tests).

    Returns ``{"summary": DataFrame(source, n_kept, sum_chars),
    "resumed_stages": [...], "executed_stages": [...]}`` (summary ``None``
    when stopped after stage 1).
    """
    from ..pipelines.queries import (
        curation_capped_ds,
        curation_keeper_ids,
        curation_summary_frame,
    )

    os.makedirs(out_dir, exist_ok=True)
    docs_path = os.path.join(sf_dir, "documents.parquet")
    docs_fp = input_fingerprints([docs_path])
    keepers_path = os.path.join(out_dir, "keepers.parquet")
    capped_path = os.path.join(out_dir, "capped.parquet")
    k_commit_path = os.path.join(out_dir, "keepers" + COMMIT_SUFFIX)
    c_commit_path = os.path.join(out_dir, "capped" + COMMIT_SUFFIX)

    def _load_commit(path: str) -> dict[str, Any] | None:
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    resumed: list[str] = []
    executed: list[str] = []

    # --- stage 1: keeper table
    k_commit = _load_commit(k_commit_path) if resume else None
    keepers_fresh = (
        k_commit is not None
        and k_commit.get("curation_version") == CURATION_VERSION
        and k_commit.get("input_fingerprints") == docs_fp
        and os.path.exists(keepers_path)
    )
    if keepers_fresh:
        keep_ids = pq.read_table(keepers_path)["keep_id"].to_numpy()
        resumed.append("keepers")
    else:
        import numpy as np

        keep_ids = curation_keeper_ids(sf_dir)
        tmp = keepers_path + ".tmp"
        pq.write_table(
            pa.table({"keep_id": pa.array(np.asarray(keep_ids, np.int64))}),
            tmp,
        )
        os.replace(tmp, keepers_path)
        _atomic_write_json(k_commit_path, {
            "stage": "keepers",
            "curation_version": CURATION_VERSION,
            "input_fingerprints": docs_fp,
            "n_keepers": int(len(keep_ids)),
            "path": keepers_path,
            "committed_at": time.time(),
        })
        executed.append("keepers")
    if stop_after == "keepers":
        return {"summary": None, "resumed_stages": resumed,
                "executed_stages": executed}

    # --- stage 2: capped output (depends on inputs AND the keeper table)
    keepers_fp = input_fingerprints([keepers_path])
    c_commit = _load_commit(c_commit_path) if resume else None
    capped_fresh = (
        c_commit is not None
        and c_commit.get("curation_version") == CURATION_VERSION
        and c_commit.get("input_fingerprints") == docs_fp
        and c_commit.get("keepers_fingerprints") == keepers_fp
        and os.path.exists(capped_path)
    )
    if capped_fresh:
        capped = pq.read_table(capped_path)
        resumed.append("capped")
    else:
        capped = (
            curation_capped_ds(sf_dir, keep_ids)
            .sort(["source", "doc_id"])
            .to_pandas()
        )
        capped = pa.Table.from_pandas(capped, preserve_index=False)
        tmp = capped_path + ".tmp"
        pq.write_table(capped, tmp)
        os.replace(tmp, capped_path)
        _atomic_write_json(c_commit_path, {
            "stage": "capped",
            "curation_version": CURATION_VERSION,
            "input_fingerprints": docs_fp,
            "keepers_fingerprints": keepers_fp,
            "n_rows": capped.num_rows,
            "path": capped_path,
            "committed_at": time.time(),
        })
        executed.append("capped")

    pdf = capped.to_pandas()
    summary = curation_summary_frame(
        pdf.groupby("source", as_index=False)
        .agg(n_kept=("doc_id", "size"), sum_chars=("n_chars", "sum"))
    )
    return {"summary": summary, "resumed_stages": resumed,
            "executed_stages": executed}
