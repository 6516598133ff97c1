"""End-to-end suite validation over the synthetic pages corpus.

The corpus plants violations at known rates (sources/synthetic.py), so the
pass/fail matrix and violation rows have ground truth: every planted class
must be caught, clean checks must pass, and the run must be deterministic
(canonically sorted violations equal across runs — SURVEY.md §7.4).
"""

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from biosample_enricher_ray.pipelines.validate import (
    default_pages_checks,
    default_pages_profile,
    drift_report,
    load_baseline_snapshot,
    save_baseline_snapshot,
    uniqueness_violations,
    validate_dataset,
)
from biosample_enricher_ray.sources.synthetic import (
    ISO_LANGS,
    CorpusSpec,
    generate_pages_file,
    write_corpus,
)


def _read(corpus_dir):
    return ray.data.read_parquet(
        [f"{corpus_dir}/pages-{i:05d}.parquet" for i in range(4)],
        include_paths=True,
    )


def _dims(corpus_dir):
    lang = pq.read_table(f"{corpus_dir}/lang_dim.parquet")["lang"].combine_chunks()
    dom = pq.read_table(f"{corpus_dir}/domain_dim.parquet")["domain"].combine_chunks()
    return lang, dom


def test_full_suite_catches_planted_violations(corpus_dir):
    import ray

    lang, dom = _dims(corpus_dir)
    checks = default_pages_checks(lang_dim_ref=ray.put(lang), domain_dim_ref=ray.put(dom))
    result = validate_dataset(
        _read(corpus_dir), checks, default_pages_profile(), batch_size=512
    )

    by_check = result.matrix.set_index("check_id")["n_violations"].groupby("check_id").sum()
    # planted classes all caught
    for check_id in (
        "url_format", "lang_format", "ts_window", "lang_in_dim", "domain_in_dim",
        "cross:text->html", "unique:url", "not_empty:text",
    ):
        assert by_check.get(check_id, 0) > 0, f"{check_id} caught nothing"
    # clean checks pass
    assert by_check.get("schema", 1) == 0
    assert by_check.get("not_null:url", 1) == 0
    assert by_check.get("completeness", 1) == 0  # ≥3/4 columns always set

    # violation rows carry lineage
    v = result.violations
    assert set(v.column("partition_id").to_pylist()) >= {
        "pages-00000", "pages-00001", "__global__",
    }
    frag = v.filter(pc.not_equal(v["partition_id"], "__global__"))["fragment_id"]
    assert all(p and p.endswith(".parquet") for p in frag.to_pylist())

    # matrix covers every (partition, check)
    parts = set(result.matrix["partition_id"])
    assert {"pages-00000", "pages-00001", "pages-00002", "pages-00003"} <= parts
    assert result.n_rows == 4000

    # profiles: null rates + sketches materialized
    prof = result.profiles
    assert prof["text"]["null_count"] > 0
    assert 0 < prof["text"]["null_rate"] < 0.05
    assert abs(prof["lang"]["distinct_hll"] - len(ISO_LANGS)) / len(ISO_LANGS) < 0.15
    assert prof["url"]["distinct_hll"] > 3500
    q = prof["text"]["quantiles"]
    assert q[0.25] < q[0.5] < q[0.99]


def test_shrunk_suite_matches_full_suite(corpus_dir):
    """html→html_len at the scan must not change any check's verdict."""
    from biosample_enricher_ray.pipelines.validate import (
        shrink_html_batch,
        shrunk_pages_checks,
        shrunk_pages_profile,
    )

    full = validate_dataset(
        _read(corpus_dir), default_pages_checks(), default_pages_profile(),
        batch_size=512,
    )
    shrunk_ds = _read(corpus_dir).map_batches(shrink_html_batch, batch_format="pyarrow")
    shrunk = validate_dataset(
        shrunk_ds, shrunk_pages_checks(), shrunk_pages_profile(), batch_size=512
    )
    a = full.matrix.groupby("check_id")["n_violations"].sum()
    b = shrunk.matrix.groupby("check_id")["n_violations"].sum()
    for check_id in a.index:
        assert b.get(check_id, 0) == a[check_id], check_id
    # html length profile preserved (as html_len numeric column)
    assert shrunk.profiles["html_len"]["null_count"] == full.profiles["html"]["null_count"]
    assert shrunk.profiles["html_len"]["max"] == full.profiles["html"]["max"]


def test_validation_deterministic(corpus_dir):
    ds1 = validate_dataset(_read(corpus_dir), default_pages_checks(), batch_size=512)
    ds2 = validate_dataset(_read(corpus_dir), default_pages_checks(), batch_size=256)
    a = ds1.violations_sorted()
    b = ds2.violations_sorted()
    assert a.equals(b)  # batch-size independent, row-for-row


def test_uniqueness_counts_match_exact(corpus_dir):
    ds = _read(corpus_dir)
    dup = uniqueness_violations(ds, "url")
    t = pq.read_table(
        [f"{corpus_dir}/pages-{i:05d}.parquet" for i in range(4)], columns=["url"]
    )
    total = len(t)
    distinct = pc.count_distinct(t["url"]).as_py()
    # sum over duplicate groups of (count) == total - distinct + n_groups
    counts = [int(o.split("=")[1]) for o in dup["observed"].to_pylist()]
    assert sum(c - 1 for c in counts) == total - distinct


def test_drift_detection(tmp_path, corpus_dir):
    base = validate_dataset(
        _read(corpus_dir), [], default_pages_profile(), uniqueness_column=None
    )
    snap = tmp_path / "baseline.pkl"
    save_baseline_snapshot(base.profiles, str(snap))
    baseline = load_baseline_snapshot(str(snap))

    # same distribution → no drift
    rep_same = drift_report(base.profiles, baseline)
    assert rep_same["ks_passed"].all() and rep_same["psi_passed"].all()

    # perturbed corpus (longer texts, shifted ts) → drift on text + warc_ts
    drift_dir = tmp_path / "drifted"
    write_corpus(
        str(drift_dir),
        CorpusSpec(n_rows=4000, n_files=4, giant_html_bytes=256 * 1024,
                   text_len_scale=2.5, ts_shift_days=60),
    )
    ds = ray.data.read_parquet(
        [str(drift_dir / f"pages-{i:05d}.parquet") for i in range(4)],
        include_paths=True,
    )
    cur = validate_dataset(ds, [], default_pages_profile(), uniqueness_column=None)
    rep = drift_report(cur.profiles, baseline).set_index("column")
    assert not rep.loc["text", "psi_passed"]
    assert not rep.loc["warc_ts", "ks_passed"]


def test_byte_identical_text_invariant():
    """sha256(text) per url reproducible across generations (FIXTURES.md §4)."""
    from biosample_enricher_ray.functions.hashing import sha256_column

    spec = CorpusSpec(n_rows=2000, n_files=2, giant_html_bytes=64 * 1024)
    t1 = generate_pages_file(spec, 1)
    t2 = generate_pages_file(spec, 1)
    s1 = sha256_column(t1["text"]).to_pylist()
    s2 = sha256_column(t2["text"]).to_pylist()
    assert s1 == s2
    np.testing.assert_array_equal(t1["url"].to_pylist(), t2["url"].to_pylist())


def test_violation_cap_and_sink(tmp_path, corpus_dir):
    """A 100%-failing check must not materialize O(corpus) violations on the
    driver: the in-memory sample is capped per check, counts stay exact, and
    the parquet sink receives every row."""
    import pyarrow.parquet as pq
    import ray.data

    from biosample_enricher_ray.stages.checks import RegexCheck
    from biosample_enricher_ray.pipelines.validate import validate_dataset

    ds = ray.data.read_parquet(f"{corpus_dir}/pages-00000.parquet")
    sink = str(tmp_path / "violations.parquet")
    checks = [RegexCheck(column="url", pattern=r"^IMPOSSIBLE$",
                         check_id="always_fails")]
    result = validate_dataset(
        ds, checks, None, uniqueness_column=None, batch_size=256,
        concurrency=2, path_column=None,
        max_violations_per_check=10, violations_path=sink,
    )
    m = result.matrix.groupby("check_id")[["n_violations", "n_rows"]].sum()
    total = int(m.loc["always_fails", "n_violations"])
    assert total == int(m.loc["always_fails", "n_rows"]) == 1000
    # driver retains only the capped sample...
    assert len(result.violations) == 10
    # ...while the sink holds every violation row
    sunk = pq.read_table(sink)
    assert len(sunk) == total
    assert set(sunk["check_id"].to_pylist()) == {"always_fails"}


def test_poisoned_check_becomes_error_rows(corpus_dir):
    """Round-4 VERDICT ask #6 — per-row error capture in the check contract:
    a custom check whose kernel raises an arbitrary exception must NOT fail
    the task; it materializes kind='error' violation rows (check_id, column,
    exception repr), counts its rows as violating, and leaves every other
    check's verdict untouched (the reference's error-Observation semantics,
    elevation/service.py:246-279)."""
    import ray.data

    from biosample_enricher_ray.stages.checks import NotNullCheck, RowCheck

    class PoisonedCheck(RowCheck):
        def __init__(self):
            super().__init__(check_id="poisoned", column="text",
                             expected="unreachable")

        def mask(self, batch):
            raise ZeroDivisionError("boom in user kernel")

    ds = ray.data.read_parquet(f"{corpus_dir}/pages-00000.parquet")
    checks = [NotNullCheck(column="url"), PoisonedCheck()]
    result = validate_dataset(
        ds, checks, None, uniqueness_column=None, batch_size=256,
        concurrency=2, path_column=None,
    )
    m = result.matrix.groupby("check_id")[["n_violations", "n_rows"]].sum()
    # the poisoned check counts every row as violating...
    assert int(m.loc["poisoned", "n_violations"]) == 1000
    # ...the healthy check is unaffected
    assert int(m.loc["not_null:url", "n_violations"]) == 0
    assert int(m.loc["not_null:url", "n_rows"]) == 1000
    v = result.violations
    err = v.filter(pc.equal(v["check_id"], "poisoned"))
    assert len(err) > 0
    assert set(err["kind"].to_pylist()) == {"error"}
    assert all("ZeroDivisionError" in o and "boom" in o
               for o in err["observed"].to_pylist())
    assert set(err["column"].to_pylist()) == {"text"}


def test_records_dataset_rejects_unknown_stage_mode(corpus_dir):
    import pytest
    from biosample_enricher_ray.pipelines.validate import (
        default_pages_checks, records_dataset)

    ds = ray.data.read_parquet(f"{corpus_dir}/pages-00000.parquet")
    with pytest.raises(ValueError, match="stage_mode"):
        records_dataset(ds, default_pages_checks(), stage_mode="task")
