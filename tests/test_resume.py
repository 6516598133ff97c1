"""Checkpoint/resume gate (BASELINE.md): a second run with the same out_dir
executes only uncommitted partitions; results are identical either way."""

import glob
import json
import os

from biosample_enricher_ray.pipelines.validate import default_pages_checks, default_pages_profile
from biosample_enricher_ray.state.checkpoint import (
    committed_partitions,
    plan_partitions,
    run_partition,
    run_validation,
)


def _paths(corpus_dir):
    return sorted(glob.glob(f"{corpus_dir}/pages-*.parquet"))


def test_plan_partitions_deterministic(corpus_dir):
    plans = plan_partitions(_paths(corpus_dir), files_per_partition=2)
    assert [p.partition_id for p in plans] == ["part-00000", "part-00001"]
    assert plans == plan_partitions(list(reversed(_paths(corpus_dir))), 2)


def test_resume_skips_committed_partitions(tmp_path, corpus_dir):
    out = str(tmp_path / "run")
    checks = default_pages_checks()
    profile = default_pages_profile()
    paths = _paths(corpus_dir)
    plans = plan_partitions(paths, files_per_partition=1)

    # simulate a killed run: only partition 0 committed
    run_partition(plans[0], out, checks, profile, batch_size=512, concurrency=2)
    assert set(committed_partitions(out)) == {"part-00000"}

    result = run_validation(
        paths, out, checks, profile, files_per_partition=1,
        max_concurrent_partitions=2, batch_size=512,
    )
    manifest = json.load(open(os.path.join(out, "run_manifest.json")))
    assert manifest["resumed_partitions"] == ["part-00000"]
    assert manifest["executed_partitions"] == ["part-00001", "part-00002", "part-00003"]
    assert result.n_rows == 4000
    assert result.total_violations > 0

    # full fresh run must agree row-for-row (canonical sort)
    out2 = str(tmp_path / "fresh")
    result2 = run_validation(
        paths, out2, checks, profile, files_per_partition=1,
        max_concurrent_partitions=2, batch_size=512,
    )
    assert result.violations_sorted().equals(result2.violations_sorted())
    # merged profiles match too
    assert result.profiles["text"]["null_count"] == result2.profiles["text"]["null_count"]
    assert abs(result.profiles["url"]["distinct_hll"]
               - result2.profiles["url"]["distinct_hll"]) < 1e-6

    # second resume run executes nothing
    result3 = run_validation(
        paths, out, checks, profile, files_per_partition=1,
        max_concurrent_partitions=2, batch_size=512,
    )
    manifest3 = json.load(open(os.path.join(out, "run_manifest.json")))
    assert manifest3["executed_partitions"] == []
    assert result3.total_violations == result.total_violations


def test_stale_commit_reexecutes(tmp_path, corpus_dir):
    """A commit whose input fragments or suite version no longer match the
    current plan must be re-executed, not silently reused (positional
    partition ids shift when the input file list changes)."""
    out = str(tmp_path / "stale")
    checks = default_pages_checks()
    paths = _paths(corpus_dir)

    run_validation(paths, out, checks, None, files_per_partition=1,
                   max_concurrent_partitions=2, batch_size=512)
    manifest = json.load(open(os.path.join(out, "run_manifest.json")))
    assert manifest["executed_partitions"] == [
        "part-00000", "part-00001", "part-00002", "part-00003"]

    # drop the first input file: every positional partition id now refers to
    # a DIFFERENT fragment -> all old commits are stale and must re-execute
    result = run_validation(paths[1:], out, checks, None, files_per_partition=1,
                            max_concurrent_partitions=2, batch_size=512)
    manifest2 = json.load(open(os.path.join(out, "run_manifest.json")))
    assert manifest2["resumed_partitions"] == []
    assert manifest2["executed_partitions"] == [
        "part-00000", "part-00001", "part-00002"]
    assert result.n_rows == 3000


def test_suite_edit_invalidates_commits(tmp_path, corpus_dir):
    """Editing the check suite (e.g. a YAML threshold) must re-execute
    committed partitions — the commit records the compiled-suite
    fingerprint, not just the package constant."""
    from biosample_enricher_ray.stages.checks import LengthRangeCheck

    out = str(tmp_path / "suite_edit")
    paths = _paths(corpus_dir)
    suite_a = [LengthRangeCheck(column="text", lo=1, hi=50_000_000)]
    run_validation(paths, out, suite_a, None, files_per_partition=2,
                   max_concurrent_partitions=2, batch_size=512)
    m1 = json.load(open(os.path.join(out, "run_manifest.json")))
    assert len(m1["executed_partitions"]) == 2

    # tightened threshold: same check_id, different params -> all stale
    suite_b = [LengthRangeCheck(column="text", lo=1, hi=100)]
    result = run_validation(paths, out, suite_b, None, files_per_partition=2,
                            max_concurrent_partitions=2, batch_size=512)
    m2 = json.load(open(os.path.join(out, "run_manifest.json")))
    assert m2["resumed_partitions"] == []
    assert len(m2["executed_partitions"]) == 2
    by = result.matrix.groupby("check_id")["n_violations"].sum()
    assert by["len_range:text"] > 0  # the NEW suite's verdicts, not stale ones

    # unchanged suite resumes everything
    run_validation(paths, out, suite_b, None, files_per_partition=2,
                   max_concurrent_partitions=2, batch_size=512)
    m3 = json.load(open(os.path.join(out, "run_manifest.json")))
    assert m3["executed_partitions"] == []


def test_checkpointed_violation_cap_and_sink(tmp_path, corpus_dir):
    """One-shot-path parity (VERDICT r2 #9): a 100%-failing check through the
    RESUMABLE path must keep exact counts, cap what the driver retains, and
    deliver every violation row to the sink — even across a resume."""
    import pyarrow.parquet as pq

    from biosample_enricher_ray.stages.checks import RegexCheck

    out = str(tmp_path / "capped")
    paths = _paths(corpus_dir)
    checks = [RegexCheck(column="url", pattern=r"^IMPOSSIBLE$",
                         check_id="always_fails")]
    sink = str(tmp_path / "violations_full.parquet")

    result = run_validation(
        paths, out, checks, None, files_per_partition=1,
        max_concurrent_partitions=2, batch_size=512,
        uniqueness_column=None,
        max_violations_per_check=10, violations_path=sink,
    )
    m = result.matrix.groupby("check_id")[["n_violations", "n_rows"]].sum()
    total = int(m.loc["always_fails", "n_violations"])
    assert total == int(m.loc["always_fails", "n_rows"]) == 4000
    # cap is per partition: 4 partitions x 10 retained, not O(corpus)
    assert len(result.violations) == 40
    sunk = pq.read_table(sink)
    assert len(sunk) == total
    assert set(sunk["check_id"].to_pylist()) == {"always_fails"}

    # a commit produced WITHOUT the sink must not satisfy a sink-requesting
    # resume: drop one partition's full sink to simulate it
    os.remove(os.path.join(out, "partitions", "part-00001",
                           "violations_full.parquet"))
    sink2 = str(tmp_path / "violations_full_2.parquet")
    result2 = run_validation(
        paths, out, checks, None, files_per_partition=1,
        max_concurrent_partitions=2, batch_size=512,
        uniqueness_column=None,
        max_violations_per_check=10, violations_path=sink2,
    )
    manifest = json.load(open(os.path.join(out, "run_manifest.json")))
    assert manifest["executed_partitions"] == ["part-00001"]
    assert len(manifest["resumed_partitions"]) == 3
    assert len(pq.read_table(sink2)) == total
    assert result2.violations_sorted().equals(result.violations_sorted())


def test_write_partitioned_resumable(tmp_path, corpus_dir):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from biosample_enricher_ray.state.checkpoint import write_partitioned_resumable

    paths = _paths(corpus_dir)
    out = str(tmp_path / "sink")

    def upper_lang(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(
            t.schema.get_field_index("lang"), "lang", pc.utf8_upper(t["lang"])
        )

    r1 = write_partitioned_resumable(
        paths, out, transform=upper_lang, transform_id="v1",
        columns=["url", "lang"], files_per_partition=1,
    )
    assert r1["written"] == len(paths) and r1["skipped"] == 0
    files = sorted(glob.glob(f"{out}/data/part-*.parquet"))
    assert len(files) == len(paths)  # one file per partition, never one giant
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == r1["rows_written"] > 0
    assert pq.read_table(files[0])["lang"].to_pylist()[0].isupper()

    # rerun: everything skipped, nothing rewritten
    mtimes = [os.path.getmtime(f) for f in files]
    r2 = write_partitioned_resumable(
        paths, out, transform=upper_lang, transform_id="v1",
        columns=["url", "lang"], files_per_partition=1,
    )
    assert r2["written"] == 0 and r2["skipped"] == len(paths)
    assert [os.path.getmtime(f) for f in files] == mtimes

    # kill simulation: drop one marker -> only that partition re-executes
    marker = sorted(glob.glob(f"{out}/commits/*.commit.json"))[0]
    os.remove(marker)
    r3 = write_partitioned_resumable(
        paths, out, transform=upper_lang, transform_id="v1",
        columns=["url", "lang"], files_per_partition=1,
    )
    assert r3["written"] == 1 and r3["skipped"] == len(paths) - 1

    # transform version bump invalidates ALL stale partitions
    r4 = write_partitioned_resumable(
        paths, out, transform=upper_lang, transform_id="v2",
        columns=["url", "lang"], files_per_partition=1,
    )
    assert r4["written"] == len(paths) and r4["skipped"] == 0


def test_curation_two_stage_resume(tmp_path, sf001_dir):
    """Round-4 VERDICT ask #8: the composed curation pipeline commits its
    keeper table before the capped-output stage, so a kill between stages
    resumes from keepers instead of re-running the corpus-wide gated dedup;
    the resumed result equals the one-shot query."""
    import pandas as pd

    from biosample_enricher_ray.pipelines.queries import (
        curation_pipeline_documents,
    )
    from biosample_enricher_ray.state.checkpoint import run_curation

    out = str(tmp_path / "curation")

    # kill between stages: only the keeper table commits
    r1 = run_curation(sf001_dir, out, stop_after="keepers")
    assert r1["executed_stages"] == ["keepers"]
    assert r1["summary"] is None
    assert os.path.exists(os.path.join(out, "keepers.parquet"))
    assert not os.path.exists(os.path.join(out, "capped.parquet"))

    # resume: stage 1 loads from its checkpoint, only stage 2 executes
    k_mtime = os.path.getmtime(os.path.join(out, "keepers.parquet"))
    r2 = run_curation(sf001_dir, out)
    assert r2["resumed_stages"] == ["keepers"]
    assert r2["executed_stages"] == ["capped"]
    assert os.path.getmtime(os.path.join(out, "keepers.parquet")) == k_mtime
    pd.testing.assert_frame_equal(
        r2["summary"], curation_pipeline_documents(sf001_dir))

    # fully-committed rerun executes nothing and agrees
    r3 = run_curation(sf001_dir, out)
    assert r3["resumed_stages"] == ["keepers", "capped"]
    assert r3["executed_stages"] == []
    pd.testing.assert_frame_equal(r3["summary"], r2["summary"])

    # resume=False re-executes both stages
    r4 = run_curation(sf001_dir, out, resume=False)
    assert r4["executed_stages"] == ["keepers", "capped"]
    pd.testing.assert_frame_equal(r4["summary"], r2["summary"])


def test_input_rewrite_invalidates_partition(tmp_path, corpus_dir):
    """Round-4 VERDICT ask #9: commits fingerprint their input fragments
    (size + mtime_ns); rewriting ONE input file re-executes exactly that
    partition on resume."""
    import shutil
    import time as _time

    from biosample_enricher_ray.pipelines.validate import default_pages_checks

    # private copy of the corpus — the fixture is session-scoped
    src = _paths(corpus_dir)
    data = tmp_path / "inputs"
    data.mkdir()
    paths = []
    for p in src:
        q = str(data / os.path.basename(p))
        shutil.copy(p, q)
        paths.append(q)

    out = str(tmp_path / "run")
    checks = default_pages_checks()
    run_validation(paths, out, checks, None, files_per_partition=1,
                   max_concurrent_partitions=2, batch_size=512,
                   uniqueness_column=None)
    m1 = json.load(open(os.path.join(out, "run_manifest.json")))
    assert len(m1["executed_partitions"]) == 4

    # regenerate one input in place: same path and contents, newer mtime
    _time.sleep(0.01)
    os.utime(paths[2])
    result = run_validation(paths, out, checks, None, files_per_partition=1,
                            max_concurrent_partitions=2, batch_size=512,
                            uniqueness_column=None)
    m2 = json.load(open(os.path.join(out, "run_manifest.json")))
    assert m2["executed_partitions"] == ["part-00002"]
    assert sorted(m2["resumed_partitions"]) == [
        "part-00000", "part-00001", "part-00003"]
    assert result.n_rows == 4000
