"""Tests for salted shuffle helpers and the reporting layer."""

import glob

import pyarrow.compute as pc
import ray.data

from biosample_enricher_ray.functions.hashing import extract_domain
from biosample_enricher_ray.pipelines.report import (
    check_summary,
    partition_matrix,
    profile_table,
    to_markdown,
    write_report,
)
from biosample_enricher_ray.pipelines.validate import (
    default_pages_checks,
    default_pages_profile,
    validate_dataset,
)
from biosample_enricher_ray.stages.shuffle import detect_skewed_keys, salted_group_count


def _pages(corpus_dir):
    return ray.data.read_parquet(
        sorted(glob.glob(f"{corpus_dir}/pages-*.parquet")), include_paths=True
    )


def test_salted_group_count_matches_plain(corpus_dir):
    ds = _pages(corpus_dir)

    def domains(t):
        import pyarrow as pa

        d = extract_domain(t["url"].combine_chunks()).drop_null()
        return pa.table({"domain": d})

    dom_ds = ds.map_batches(domains, batch_format="pyarrow")
    salted = salted_group_count(dom_ds, "domain", salt=4).to_pandas()
    plain = dom_ds.groupby("domain").count().to_pandas()
    plain = plain.rename(columns={plain.columns[-1]: "n"})
    a = salted.sort_values("domain").reset_index(drop=True)
    b = plain.sort_values("domain").reset_index(drop=True)
    assert (a["domain"].fillna("∅").tolist() == b["domain"].fillna("∅").tolist())
    assert a["n"].tolist() == b["n"].tolist()
    # zipf-planted hot domain exists
    assert a["n"].max() > a["n"].median() * 5


def test_detect_skewed_keys(corpus_dir):
    ds = _pages(corpus_dir)

    def domains(t):
        import pyarrow as pa

        d = extract_domain(t["url"].combine_chunks()).drop_null()
        return pa.table({"domain": d})

    top = detect_skewed_keys(ds.map_batches(domains, batch_format="pyarrow"),
                             "domain", top=5, sample_frac=0.5)
    assert len(top) == 5
    assert top["n"].iloc[0] >= top["n"].iloc[-1]
    assert "example.com" in set(top["domain"])  # the hottest zipf domain


def test_parquet_key_uniqueness_matches_dataset_path(corpus_dir):
    from biosample_enricher_ray.pipelines.validate import uniqueness_violations
    from biosample_enricher_ray.stages.shuffle import parquet_key_uniqueness

    paths = sorted(glob.glob(f"{corpus_dir}/pages-*.parquet"))
    fast = parquet_key_uniqueness(paths, "url")
    slow = uniqueness_violations(ray.data.read_parquet(paths, columns=["url"]), "url")
    slow_map = {u: int(o.split("=")[1])
                for u, o in zip(slow["url"].to_pylist(), slow["observed"].to_pylist())}
    fast_map = dict(zip(fast["url"], fast["n"].astype(int)))
    assert fast_map == slow_map
    assert len(fast_map) > 0


def test_report_outputs(tmp_path, corpus_dir):
    ds = _pages(corpus_dir)
    result = validate_dataset(
        ds, default_pages_checks(), default_pages_profile(), batch_size=512
    )
    summary = check_summary(result)
    assert {"check_id", "n_violations", "violation_rate", "passed"} <= set(summary.columns)
    assert (summary["n_rows"] == 4000).all()

    pm = partition_matrix(result)
    assert pm.shape[0] >= 4  # 4 partitions + __global__

    prof = profile_table(result)
    assert "p50" in prof.columns
    assert set(prof["column"]) == {"url", "warc_ts", "html", "text", "lang"}

    md = to_markdown(result)
    assert "Per-check summary" in md and "Column profiles" in md

    paths = write_report(result, str(tmp_path / "report"))
    import os

    for p in paths.values():
        assert os.path.exists(p)


def test_html_dashboard_sink(tmp_path, corpus_dir):
    """Dashboard sink (visualizer/dashboard analog): self-contained HTML with
    inline SVG bars, written alongside the CSV/MD/JSON sinks."""
    import ray.data

    from biosample_enricher_ray.pipelines.report import write_report
    from biosample_enricher_ray.pipelines.validate import (
        default_pages_checks,
        default_pages_profile,
        records_dataset,
        summarize_records,
    )

    ds = ray.data.read_parquet(f"{corpus_dir}/pages-00000.parquet")
    res = summarize_records(records_dataset(ds, default_pages_checks(),
                                            default_pages_profile(),
                                            batch_size=512, concurrency=2,
                                            path_column=None))
    paths = write_report(res, str(tmp_path / "report"))
    html = open(paths["html"]).read()
    assert html.startswith("<!DOCTYPE html>")
    assert "<svg" in html and "rows validated" in html
    assert "url_format" in html  # per-check bars present
    # per-column distribution plots (visualizer.py:370-413 analog) rendered
    # from the merged FixedHistogram sketches
    assert "Column distributions" in html
    from biosample_enricher_ray.pipelines.report import column_distribution_svgs
    dists = column_distribution_svgs(res)
    assert dists and all(s.startswith("<svg") for s in dists.values())
    # every drawn bin count equals the sketch's (non-empty plot, exact data)
    col, svg = next(iter(dists.items()))
    assert res.profiles[col]["_hist"].total > 0


def test_deterministic_group_cap_matches_row_number_semantics():
    """Cap == ROW_NUMBER() OVER (PARTITION BY key ORDER BY ranks) <= k,
    independent of batch layout (the map-side partial cap must not change
    the result)."""
    import numpy as np
    import pandas as pd

    from biosample_enricher_ray.stages.shuffle import deterministic_group_cap

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "key": rng.integers(0, 7, n).astype(str),
            "score": rng.integers(0, 50, n),  # heavy ties -> tie-break matters
            "rid": np.arange(n, dtype=np.int64),
        }
    )
    expected = (
        df.sort_values(["key", "score", "rid"], ascending=[True, False, True])
        .groupby("key")
        .head(13)
        .sort_values(["key", "rid"])
        .reset_index(drop=True)
    )
    for blocks in (1, 17):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = (
            deterministic_group_cap(
                ds, "key", k=13, rank_columns=["score", "rid"],
                ascending=[False, True],
            )
            .to_pandas()
            .sort_values(["key", "rid"])
            .reset_index(drop=True)[expected.columns.tolist()]
        )
        pd.testing.assert_frame_equal(got, expected)


def test_deterministic_group_cap_partial_bounds_shuffle_rows():
    """The map-side partial cap keeps <= k rows per key per batch — the
    property that bounds a hot key's shuffle volume at k x n_tasks."""
    import numpy as np
    import pandas as pd

    from biosample_enricher_ray.stages.shuffle import deterministic_group_cap

    # one mega-hot key across many batches
    df = pd.DataFrame(
        {
            "key": ["hot"] * 4000 + ["cold"] * 10,
            "score": np.arange(4010, dtype=np.int64),
            "rid": np.arange(4010, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    out = deterministic_group_cap(
        ds, "key", k=5, rank_columns=["score", "rid"], ascending=[False, True]
    ).to_pandas()
    assert len(out) == 10
    hot = out[out["key"] == "hot"]
    # top-5 scores of the hot key survive exactly
    assert sorted(hot["score"]) == list(range(4000 - 5, 4000))


def test_shuffle_hash_join_matches_pandas_merge():
    """Inner equi-join over two 'fact' tables: every (key multiplicity)
    combination — 0, 1, many on each side — must match pandas merge."""
    import numpy as np
    import pandas as pd

    from biosample_enricher_ray.stages.shuffle import shuffle_hash_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 40, 300),
        "lv": np.arange(300, dtype=np.int64),
    })
    right = pd.DataFrame({
        "rk": rng.integers(20, 60, 150),  # keys 0-19 unmatched, 40-59 right-only
        "rv": np.arange(150, dtype=np.int64) * 10,
    })
    lds = ray.data.from_pandas(left).repartition(6)
    rds = ray.data.from_pandas(right).repartition(4)
    got = (shuffle_hash_join(lds, "k", rds, "rk").to_pandas()
           .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    want = (left.merge(right, left_on="k", right_on="rk")
            .drop(columns=["rk"])
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    assert got[["k", "lv", "rv"]].equals(want[["k", "lv", "rv"]])


def test_shuffle_hash_join_salted_matches_unsalted():
    """salt > 1 (replicated right / round-robin left) must produce exactly
    the same joined rows as the plain partitioned join, including a hot key."""
    import numpy as np
    import pandas as pd

    from biosample_enricher_ray.stages.shuffle import shuffle_hash_join

    left = pd.DataFrame({
        "k": np.concatenate([np.zeros(200, np.int64),          # hot key
                             np.arange(1, 51, dtype=np.int64)]),
        "lv": np.arange(250, dtype=np.int64),
    })
    right = pd.DataFrame({
        "rk": np.arange(0, 60, dtype=np.int64),
        "rv": np.arange(0, 60, dtype=np.int64) * 7,
    })
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(3)

    def run(salt):
        return (shuffle_hash_join(lds, "k", rds, "rk", salt=salt).to_pandas()
                .sort_values(["k", "lv"]).reset_index(drop=True))

    plain, salted = run(1), run(4)
    assert plain.equals(salted)
    assert len(plain) == 250  # every left row matches exactly once


def test_shuffle_hash_join_null_keys_and_empty_blocks():
    """NULL join keys never match (SQL inner semantics); blocks emptied by
    an upstream filter must not break the exchange."""
    import pyarrow as pa

    from biosample_enricher_ray.stages.shuffle import shuffle_hash_join

    left = ray.data.from_items(
        [{"k": None if i % 3 == 0 else i % 5, "lv": i} for i in range(30)],
        override_num_blocks=6,
    ).map_batches(
        lambda t: t.filter(pc.less(t["lv"], 12)), batch_format="pyarrow"
    )
    right = ray.data.from_items(
        [{"rk": i, "rv": i * 100} for i in range(4)], override_num_blocks=2
    )
    got = shuffle_hash_join(left, "k", right, "rk").to_pandas()
    # surviving lv<12 rows with non-null key matching rk in {0..3}
    # (lv=4 has k=4, outside the right key range; lv=0,3,6,9 have NULL keys)
    assert set(got["lv"]) == {1, 2, 5, 7, 8, 10, 11}
    assert (got["rv"] == got["k"] * 100).all()


def test_shuffle_hash_join_left_outer():
    """LEFT OUTER: unmatched and null-key left rows survive null-filled,
    matched rows duplicate per right match — identical under salting."""
    import pandas as pd
    import pyarrow as pa

    from biosample_enricher_ray.stages.shuffle import shuffle_hash_join

    left = pa.table({"k": pa.array([1, 2, 3, None, 5], pa.int64()),
                     "lv": pa.array(list("abcde"))})
    right = pa.table({"rk": pa.array([1, 1, 3], pa.int64()),
                      "rv": pa.array([10, 11, 30], pa.int64())})
    expected = {("a", 10.0), ("a", 11.0), ("b", None), ("c", 30.0),
                ("d", None), ("e", None)}
    for salt in (1, 2):
        got = shuffle_hash_join(
            ray.data.from_arrow(left).repartition(2), "k",
            ray.data.from_arrow(right).repartition(2), "rk",
            salt=salt, how="left",
        ).to_pandas()
        rows = {(r["lv"], None if pd.isna(r["rv"]) else float(r["rv"]))
                for _, r in got.iterrows()}
        assert rows == expected and len(got) == 6, salt


def test_shuffle_hash_join_left_outer_empty_right():
    """A left outer join against a fully-filtered right side keeps every
    left row null-filled (the empty-bucket schema path)."""
    import pyarrow as pa

    from biosample_enricher_ray.stages.shuffle import shuffle_hash_join

    left = ray.data.from_items(
        [{"k": i, "lv": i * 2} for i in range(10)], override_num_blocks=3)
    right = ray.data.from_items(
        [{"rk": i, "rv": i} for i in range(5)], override_num_blocks=2
    ).map_batches(
        lambda t: t.filter(pc.greater(t["rk"], 99)), batch_format="pyarrow"
    )
    got = shuffle_hash_join(left, "k", right, "rk", how="left").to_pandas()
    assert len(got) == 10
    assert got["rv"].isna().all()
    assert set(got["lv"]) == {i * 2 for i in range(10)}


def test_shuffle_hash_join_full_outer():
    """FULL OUTER: both sides' unmatched and null-key rows survive; salt>1
    is rejected (replication would duplicate unmatched right rows)."""
    import pandas as pd
    import pyarrow as pa
    import pytest

    from biosample_enricher_ray.stages.shuffle import shuffle_hash_join

    left = pa.table({"k": pa.array([1, 2, None], pa.int64()),
                     "lv": pa.array(["a", "b", "c"])})
    right = pa.table({"rk": pa.array([1, 4, None], pa.int64()),
                      "rv": pa.array([10, 40, 99], pa.int64())})
    got = shuffle_hash_join(
        ray.data.from_arrow(left).repartition(2), "k",
        ray.data.from_arrow(right).repartition(2), "rk", how="full",
    ).to_pandas()
    assert len(got) == 5
    rows = {(r["lv"], None if pd.isna(r["rv"]) else int(r["rv"]))
            for _, r in got.iterrows()}
    assert rows == {("a", 10), ("b", None), ("c", None),
                    (None, 40), (None, 99)}
    with pytest.raises(ValueError, match="salt"):
        shuffle_hash_join(ray.data.from_arrow(left), "k",
                          ray.data.from_arrow(right), "rk",
                          how="full", salt=2)


def test_shuffle_hash_join_composite_keys():
    """Composite-key join matches a pandas two-key merge; a row with ANY
    null key component never matches (inner) but survives left outer."""
    import pandas as pd
    import pyarrow as pa

    from biosample_enricher_ray.stages.shuffle import shuffle_hash_join

    lt = pa.table({
        "a": pa.array([1, 1, 2, 2, None, 3], pa.int64()),
        "b": pa.array(["x", "y", "x", "y", "x", None]),
        "lv": pa.array(list(range(6)), pa.int64()),
    })
    rt = pa.table({
        "ra": pa.array([1, 2, 2, 9], pa.int64()),
        "rb": pa.array(["x", "x", "y", "x"]),
        "rv": pa.array([10, 20, 21, 90], pa.int64()),
    })
    got = shuffle_hash_join(
        ray.data.from_arrow(lt).repartition(3), ["a", "b"],
        ray.data.from_arrow(rt).repartition(2), ["ra", "rb"],
    ).to_pandas()
    l, r = lt.to_pandas(), rt.to_pandas()
    exp = l.dropna().merge(r, left_on=["a", "b"], right_on=["ra", "rb"])
    assert sorted(got["lv"]) == sorted(exp["lv"])
    assert sorted(got["rv"]) == sorted(exp["rv"])
    left_outer = shuffle_hash_join(
        ray.data.from_arrow(lt).repartition(3), ["a", "b"],
        ray.data.from_arrow(rt).repartition(2), ["ra", "rb"], how="left",
    ).to_pandas()
    assert len(left_outer) == 6  # 3 matches + 1 unmatched + 2 null-key rows


def test_recommend_join_salt():
    """Adaptive salt: a zipf-hot key that dwarfs a fair bucket share gets
    salt > 1; balanced keys get salt 1 (salting is overhead there)."""
    import pyarrow as pa

    from biosample_enricher_ray.stages.shuffle import recommend_join_salt

    hot = ray.data.from_arrow(pa.table({
        "k": pa.array([7] * 9000 + list(range(1000)), pa.int64())
    })).repartition(8)
    s_hot = recommend_join_salt(hot, "k", num_buckets=8, sample_frac=0.5)
    assert s_hot > 1

    flat = ray.data.from_arrow(pa.table({
        "k": pa.array(list(range(10000)), pa.int64())
    })).repartition(8)
    assert recommend_join_salt(flat, "k", num_buckets=8,
                               sample_frac=0.5) == 1


def test_shuffle_hash_join_bloom_prefilter_equality():
    """A Bloom-prefiltered inner join returns exactly the plain join's rows
    (false positives only waste shuffle, never change output); outer modes
    reject the option."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest

    from biosample_enricher_ray.stages.shuffle import shuffle_hash_join

    rng = np.random.default_rng(3)
    lt = pa.table({"k": pa.array(rng.integers(0, 10000, 5000), pa.int64()),
                   "lv": pa.array(np.arange(5000), pa.int64())})
    # selective right side: ~2% of left keys match
    rt = pa.table({"rk": pa.array(np.arange(0, 200), pa.int64()),
                   "rv": pa.array(np.arange(0, 200) * 7, pa.int64())})
    plain = shuffle_hash_join(
        ray.data.from_arrow(lt).repartition(4), "k",
        ray.data.from_arrow(rt).repartition(2), "rk").to_pandas()
    bloomed = shuffle_hash_join(
        ray.data.from_arrow(lt).repartition(4), "k",
        ray.data.from_arrow(rt).repartition(2), "rk",
        bloom_prefilter=True).to_pandas()
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        plain[key].sort_values(key).reset_index(drop=True),
        bloomed[key].sort_values(key).reset_index(drop=True))
    with pytest.raises(ValueError, match="inner"):
        shuffle_hash_join(ray.data.from_arrow(lt), "k",
                          ray.data.from_arrow(rt), "rk",
                          how="left", bloom_prefilter=True)


def test_write_bucketed_by_key_roundtrip(tmp_path):
    """Key-bucketed sink: every key lands in exactly one bucket dir, a
    single-bucket read returns only co-located keys, and the union of all
    buckets is the input."""
    import numpy as np
    import pyarrow as pa

    from biosample_enricher_ray.functions.hashing import hash64
    from biosample_enricher_ray.stages.shuffle import (
        read_key_bucket,
        write_bucketed_by_key,
    )

    rng = np.random.default_rng(11)
    keys = [f"k{v}" for v in rng.integers(0, 300, 3000)]
    t = pa.table({"key": pa.array(keys), "v": pa.array(np.arange(3000))})
    out = str(tmp_path / "bucketed")
    nb = write_bucketed_by_key(
        ray.data.from_arrow(t).repartition(5), "key", out, num_buckets=8)
    assert nb == 8
    shift = np.uint64(64 - 3)
    total = 0
    for b in range(nb):
        part = read_key_bucket(out, b).to_pandas()  # empty bucket -> 0 rows
        total += len(part)
        if len(part) == 0:
            continue
        got = (hash64(pa.array(part["key"].tolist(), pa.string()))
               >> shift).astype(np.int64)
        assert (got == b).all()  # co-location invariant
    assert total == 3000


def test_shuffle_hash_join_outer_empty_right_side():
    """An all-rows-filtered right side must not swallow left rows under
    outer semantics (pre-fix: 0 rows out). Schema-preserving (arrow) empty
    blocks null-fill; a schema-LESS empty side (row-based filter output)
    raises loudly instead of silently dropping rows."""
    import pyarrow as pa
    import pyarrow.compute as _pc
    import pytest

    from biosample_enricher_ray.stages.shuffle import shuffle_hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()), "lv": pa.array(["a", "b"])}))
    right_typed = ray.data.from_blocks(
        [pa.table({"rk": pa.array([7], pa.int64()),
                   "rv": pa.array([70], pa.int64())})]).map_batches(
        lambda t: t.filter(_pc.greater(t["rk"], 99)), batch_format="pyarrow")
    got = shuffle_hash_join(left, "k", right_typed, "rk",
                            how="left").to_pandas()
    assert len(got) == 2 and got["rv"].isna().all()

    right_schemaless = ray.data.from_blocks(
        [pa.table({"rk": pa.array([7], pa.int64()),
                   "rv": pa.array([70], pa.int64())})]).filter(
        lambda r: False)
    with pytest.raises(Exception, match="no schema"):
        shuffle_hash_join(left, "k", right_schemaless, "rk",
                          how="left").to_pandas()


def test_bucketed_hash_join_matches_duckdb(tmp_path):
    """Exchange-free bucket-pair join over two write_bucketed_by_key tables
    must equal the SQL join: inner + left, null keys (never match, left
    keeps them), keys present on only one side, and an empty-bucket pair."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from biosample_enricher_ray.stages.shuffle import (
        bucketed_hash_join,
        write_bucketed_by_key,
    )

    rng = np.random.default_rng(23)
    lk = [f"k{v}" for v in rng.integers(0, 40, 500)] + [None] * 5
    lt = pa.table({"k": pa.array(lk, pa.string()),
                   "lv": pa.array(np.arange(len(lk)), pa.int64())})
    # right side: only even keys exist (odd left keys dangle), with dup rows
    rk = [f"k{v}" for v in range(0, 40, 2) for _ in (0, 1)] + [None]
    rt = pa.table({"k": pa.array(rk, pa.string()),
                   "rv": pa.array(np.arange(len(rk)), pa.int64())})
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed_by_key(ray.data.from_arrow(lt).repartition(4), "k", ld,
                          num_buckets=8)
    write_bucketed_by_key(ray.data.from_arrow(rt), "k", rd, num_buckets=8)

    con = duckdb.connect()
    con.register("lt", lt.to_pandas())
    con.register("rt", rt.to_pandas())
    for how, sql_join in (("inner", "JOIN"), ("left", "LEFT JOIN")):
        got = (bucketed_hash_join(ld, rd, how=how).to_pandas()
               .sort_values(["lv", "rv"], na_position="last")
               .reset_index(drop=True))
        exp = con.execute(
            f"SELECT lt.k, lv, rv FROM lt {sql_join} rt ON lt.k = rt.k "
            "ORDER BY lv, rv NULLS LAST").df()
        assert got["lv"].tolist() == exp["lv"].tolist(), how
        assert got["rv"].fillna(-1).tolist() == exp["rv"].fillna(-1).tolist(), how
        assert got["k"].fillna("∅").tolist() == exp["k"].fillna("∅").tolist(), how


def test_bucketed_hash_join_layout_guards(tmp_path):
    """Mismatched bucket counts and missing manifests must raise — never
    silently join non-co-located layouts; colliding non-key columns must
    demand an explicit projection."""
    import pyarrow as pa
    import pytest

    from biosample_enricher_ray.stages.shuffle import (
        bucketed_hash_join,
        write_bucketed_by_key,
    )

    t = pa.table({"k": pa.array(["a", "b"]), "v": pa.array([1, 2], pa.int64())})
    d8, d16 = str(tmp_path / "b8"), str(tmp_path / "b16")
    write_bucketed_by_key(ray.data.from_arrow(t), "k", d8, num_buckets=8)
    write_bucketed_by_key(ray.data.from_arrow(t), "k", d16, num_buckets=16)
    with pytest.raises(ValueError, match="num_buckets"):
        bucketed_hash_join(d8, d16)
    with pytest.raises(FileNotFoundError, match="manifest"):
        bucketed_hash_join(d8, str(tmp_path / "never_written"))
    with pytest.raises(ValueError, match="collide"):
        bucketed_hash_join(d8, d8)  # both sides carry non-key column "v"
    # disjoint projection resolves the collision: self-join succeeds
    got = bucketed_hash_join(d8, d8, right_columns=["k"]).to_pandas()
    assert sorted(got["k"].tolist()) == ["a", "b"]


def test_bucketed_map_groups_matches_global_groupby(tmp_path):
    """Exchange-free per-group fn over a bucketed table must equal the
    global groupby: a HOLISTIC argmax-with-tiebreak per group (the op class
    that cannot be salted), null keys forming their own group, and column
    projection at the scan."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from biosample_enricher_ray.stages.shuffle import (
        bucketed_map_groups,
        write_bucketed_by_key,
    )

    rng = np.random.default_rng(5)
    keys = [f"d{v}" for v in rng.integers(0, 30, 400)] + [None] * 3
    vals = rng.integers(0, 1000, len(keys))
    ids = np.arange(len(keys))
    t = pa.table({"domain": pa.array(keys, pa.string()),
                  "score": pa.array(vals, pa.int64()),
                  "row_id": pa.array(ids, pa.int64()),
                  "unused": pa.array(ids * 2, pa.int64())})
    d = str(tmp_path / "by_domain")
    write_bucketed_by_key(ray.data.from_arrow(t).repartition(3), "domain", d,
                          num_buckets=8)

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "row_id"], ascending=[False, True])
        return g.head(1)[["domain", "score", "row_id"]]

    got = (bucketed_map_groups(d, best,
                               columns=["score", "row_id"]).to_pandas()
           .sort_values("row_id").reset_index(drop=True))
    df = t.to_pandas()
    exp = (pd.concat([best(g) for _, g in
                      df.groupby("domain", dropna=False, sort=False)])
           .sort_values("row_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)
    assert got["domain"].isna().sum() == 1  # null group survived intact


def test_bucketed_layout_edge_cases(tmp_path):
    """Zero-row datasets commit a valid (empty) bucketed table; a right-side
    payload column named like the LEFT join key must hit the collision
    guard, not a deep Arrow duplicate-field error; sparse tables skip
    absent buckets without schema-less blocks."""
    import pyarrow as pa
    import pytest

    from biosample_enricher_ray.stages.shuffle import (
        bucketed_hash_join,
        bucketed_map_groups,
        write_bucketed_by_key,
    )

    # zero-row input: sink still commits (manifest present), join yields 0 rows
    empty = pa.table({"k": pa.array([], pa.string()),
                      "lv": pa.array([], pa.int64())})
    ed = str(tmp_path / "empty")
    write_bucketed_by_key(ray.data.from_arrow(empty), "k", ed, num_buckets=4)
    full = pa.table({"k": pa.array(["a"]), "rv": pa.array([1], pa.int64())})
    fd = str(tmp_path / "full")
    write_bucketed_by_key(ray.data.from_arrow(full), "k", fd, num_buckets=4)
    assert bucketed_hash_join(ed, fd).count() == 0
    assert bucketed_map_groups(ed, lambda g: g).count() == 0

    # right payload column named like the left key -> explicit guard
    lt = pa.table({"k": pa.array(["a"]), "lv": pa.array([1], pa.int64())})
    rt = pa.table({"rk": pa.array(["a"]), "k": pa.array(["clash"])})
    ld, rd = str(tmp_path / "l"), str(tmp_path / "r")
    write_bucketed_by_key(ray.data.from_arrow(lt), "k", ld, num_buckets=4)
    write_bucketed_by_key(ray.data.from_arrow(rt), "rk", rd, num_buckets=4)
    with pytest.raises(ValueError, match="collide"):
        bucketed_hash_join(ld, rd)
    got = bucketed_hash_join(ld, rd, right_columns=["rk"]).to_pandas()
    assert got["k"].tolist() == ["a"] and got["lv"].tolist() == [1]

    # sparse: 1 key in 64 buckets -> only present dirs spawn tasks
    sparse = bucketed_map_groups(fd, lambda g: g.head(1))
    assert sparse.to_pandas()["k"].tolist() == ["a"]


def test_bucketed_delta_join_matches_duckdb(tmp_path):
    """One-sided join (delta shuffled INTO an existing bucketed layout) must
    equal the SQL join: inner + left (delta is the probe side), null delta
    keys, dangling keys on both sides, duplicate bucketed rows, and an
    empty delta."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from biosample_enricher_ray.stages.shuffle import (
        bucketed_delta_join,
        write_bucketed_by_key,
    )

    rng = np.random.default_rng(31)
    bk = [f"k{v}" for v in range(0, 50, 2) for _ in (0, 1)]  # dup rows
    bt = pa.table({"k": pa.array(bk, pa.string()),
                   "bv": pa.array(np.arange(len(bk)), pa.int64())})
    bd = str(tmp_path / "base")
    write_bucketed_by_key(ray.data.from_arrow(bt).repartition(3), "k", bd,
                          num_buckets=8)

    dk = [f"k{v}" for v in rng.integers(0, 60, 300)] + [None] * 4
    dt = pa.table({"dk": pa.array(dk, pa.string()),
                   "dv": pa.array(np.arange(len(dk)), pa.int64())})

    con = duckdb.connect()
    con.register("bt", bt.to_pandas())
    con.register("dt", dt.to_pandas())
    for how, sql_join in (("inner", "JOIN"), ("left", "LEFT JOIN")):
        got = (bucketed_delta_join(bd, ray.data.from_arrow(dt).repartition(5),
                                   "dk", how=how).to_pandas()
               .sort_values(["dv", "bv"], na_position="last")
               .reset_index(drop=True))
        exp = con.execute(
            f"SELECT dk, dv, bv FROM dt {sql_join} bt ON dk = bt.k "
            "ORDER BY dv, bv NULLS LAST").df()
        assert got["dv"].tolist() == exp["dv"].tolist(), how
        assert got["bv"].fillna(-1).tolist() == exp["bv"].fillna(-1).tolist(), how

    empty = ray.data.from_arrow(dt.slice(0, 0))
    assert bucketed_delta_join(bd, empty, "dk", how="inner").count() == 0
