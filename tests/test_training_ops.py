"""Unit tests for the round-3 training-pipeline operators: redaction,
sequence packing, TF-IDF, sharding, repetition stats."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from biosample_enricher_ray.functions.textstats import (
    DEFAULT_PII_PATTERNS,
    redact_patterns,
)
from biosample_enricher_ray.stages.packing import packed_sequence_spans


# ------------------------------------------------------------------ redaction


def test_redact_patterns_counts_and_replaces():
    texts = pa.array([
        "mail me at a.b@example.com or 10.0.0.1 now",
        "clean text",
        None,
        "a@b.co x@y.org",
    ])
    out = redact_patterns(texts, DEFAULT_PII_PATTERNS)
    red = out["redacted"].to_pylist()
    n = out["n_matches"].to_pylist()
    assert red[0] == "mail me at [REDACTED] or [REDACTED] now"
    assert n[0] == 2
    assert red[1] == "clean text" and n[1] == 0
    assert red[2] is None and n[2] == 0
    assert red[3] == "[REDACTED] [REDACTED]" and n[3] == 2


def test_redact_patterns_sequential_semantics():
    # pattern 2 runs on the output of pattern 1's replacement
    texts = pa.array(["xy"])
    out = redact_patterns(texts, (r"x", r"\]y"), replacement="[REDACTED]")
    # after pat1: "[REDACTED]y"; pat2 matches "]y" — text produced BY the
    # first replacement, proving counts run on the already-scrubbed string
    assert out["redacted"].to_pylist() == ["[REDACTED[REDACTED]"]
    assert out["n_matches"].to_pylist() == [2]


# -------------------------------------------------------------------- packing


def _write_docs(path, ids, texts, row_group_size=None):
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, path, row_group_size=row_group_size or len(ids))


def test_packed_sequence_spans_matches_manual(tmp_path):
    # 7 docs, multiple row groups, seq_len 10
    ids = list(range(7))
    texts = ["a " * n for n in [3, 12, 0, 10, 5, 25, 1]]
    texts[2] = ""  # zero-token doc -> (-1, -1)
    p = str(tmp_path / "docs.parquet")
    _write_docs(p, ids, texts, row_group_size=3)
    spans, total = packed_sequence_spans(p, seq_len=10)
    counts = np.array([3, 12, 0, 10, 5, 25, 1])
    cum_before = np.concatenate(([0], np.cumsum(counts)[:-1]))
    exp_start = np.where(counts > 0, cum_before // 10, -1)
    exp_end = np.where(counts > 0, (cum_before + counts - 1) // 10, -1)
    assert spans["doc_id"].tolist() == ids
    assert spans["n_tokens"].tolist() == counts.tolist()
    assert spans["start_seq"].tolist() == exp_start.tolist()
    assert spans["end_seq"].tolist() == exp_end.tolist()
    assert total == -(-counts.sum() // 10)


def test_packed_sequence_spans_id_cap(tmp_path):
    p = str(tmp_path / "docs.parquet")
    _write_docs(p, list(range(10)), ["w w"] * 10)
    spans, total = packed_sequence_spans(p, seq_len=4, id_cap=3)
    assert spans["doc_id"].tolist() == [0, 1, 2]
    assert total == 5  # 20 tokens / 4


def test_packed_sequence_spans_multi_file(tmp_path):
    # sharded corpus: 3 files x multiple row groups must match the
    # single-file oracle on the concatenated corpus (round-4 VERDICT ask #4)
    rng = np.random.RandomState(7)
    counts = rng.randint(0, 30, size=24)
    ids = list(range(24))
    texts = ["w " * int(n) for n in counts]
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    paths = []
    for i in range(3):
        p = str(shard_dir / f"part-{i:03d}.parquet")
        sl = slice(8 * i, 8 * (i + 1))
        _write_docs(p, ids[sl], texts[sl], row_group_size=3)
        paths.append(p)
    single = str(tmp_path / "all.parquet")
    _write_docs(single, ids, texts, row_group_size=5)
    exp_spans, exp_total = packed_sequence_spans(single, seq_len=16)
    for inp in (paths, str(shard_dir), str(shard_dir / "part-*.parquet")):
        spans, total = packed_sequence_spans(inp, seq_len=16)
        pd.testing.assert_frame_equal(spans, exp_spans)
        assert total == exp_total


def test_packed_sequence_spans_multi_file_rejects_interleaved(tmp_path):
    # per-file sorted but file ranges overlap -> must raise, not mis-pack
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    _write_docs(a, [0, 10], ["x", "y"])
    _write_docs(b, [5, 15], ["x", "y"])
    with pytest.raises(ValueError, match="pack order violated"):
        packed_sequence_spans([a, b], seq_len=10)


def test_packed_sequence_spans_literal_bracket_path(tmp_path):
    # a literal existing path containing '[' must open as a file, not be
    # swallowed by glob character-class expansion (code-review r5)
    d = tmp_path / "run[2024]"
    d.mkdir()
    p = str(d / "docs.parquet")
    _write_docs(p, [0, 1, 2], ["w w", "w", "w w w"])
    spans, total = packed_sequence_spans(p, seq_len=3)
    assert spans["doc_id"].tolist() == [0, 1, 2]
    assert total == 2
    with pytest.raises(FileNotFoundError, match="matched no files"):
        packed_sequence_spans(str(tmp_path / "nope-*.parquet"), seq_len=3)


def test_packed_sequence_spans_rejects_unsorted(tmp_path):
    p = str(tmp_path / "docs.parquet")
    _write_docs(p, [5, 3, 7], ["a", "b", "c"])
    with pytest.raises(ValueError, match="pack order violated"):
        packed_sequence_spans(p, seq_len=10)


def test_packed_sequence_spans_rejects_interleaved_groups(tmp_path):
    # each row-group internally sorted, but group ranges overlap
    p = str(tmp_path / "docs.parquet")
    _write_docs(p, [0, 10, 5, 15], ["a", "b", "c", "d"], row_group_size=2)
    with pytest.raises(ValueError, match="pack order violated"):
        packed_sequence_spans(p, seq_len=10)


# ----------------------------------------------------- query-level operators


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    """Tiny documents table exercising repetition/tfidf/shard edge cases."""
    d = tmp_path_factory.mktemp("training_ops")
    rows = [
        # doc 0: 'dup' dominates (5 of 8 tokens) -> flagged repetitious
        (0, "dup dup dup dup dup one two three", "en", "src0"),
        # doc 1: all distinct
        (1, "alpha beta gamma delta epsilon", "en", "src0"),
        # doc 2: rare word 'zebra' with tf 2 -> high tf/df
        (2, "zebra zebra alpha", "fr", "src1"),
        (3, "alpha beta beta", "fr", "src1"),
        (4, "one two", None, "src2"),
    ]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_repetition_stats_flags_dominant_token(docs_dir):
    from biosample_enricher_ray.pipelines.queries import (
        repetition_stats_documents,
    )

    out = repetition_stats_documents(docs_dir)
    en = out[out["lang"] == "en"].iloc[0]
    # STRICT > contract (ADVICE r3): doc 0 flagged (5*5 > 8); doc 1 is
    # all-distinct (top 1 of 5 tokens = exactly 20%, 5 > 5 false) — the
    # short clean doc is NOT branded repetitious anymore
    assert en["n_docs"] == 2
    assert en["n_flagged"] == 1
    fr = out[out["lang"] == "fr"].iloc[0]
    # doc 2: top 2 of 3 -> 10 > 3 flagged; doc 3: top 2 of 3 -> flagged
    assert fr["n_flagged"] == 2
    unk = out[out["lang"] == "?"].iloc[0]
    # doc 4 'one two': top 1 of 2 = 50% -> 5 > 2 flagged
    assert unk["n_docs"] == 1 and unk["sum_tokens"] == 2


def test_tfidf_ranks_rare_high_tf_terms_first(docs_dir):
    from biosample_enricher_ray.pipelines.queries import tfidf_documents

    out = tfidf_documents(docs_dir)
    # brute force over the same corpus
    docs = {
        0: "dup dup dup dup dup one two three",
        1: "alpha beta gamma delta epsilon",
        2: "zebra zebra alpha",
        3: "alpha beta beta",
        4: "one two",
    }
    tf = {}
    for d, text in docs.items():
        for w in text.split():
            tf[(d, w)] = tf.get((d, w), 0) + 1
    df = {}
    for (d, w) in tf:
        df[w] = df.get(w, 0) + 1
    rows = [(d, w, c, df[w]) for (d, w), c in tf.items()]
    rows.sort(key=lambda r: (-(r[2] / r[3]), r[0], r[1]))
    exp = pd.DataFrame(rows[:50], columns=["doc_id", "word", "tf", "df"])
    got = out.sort_values(["doc_id", "word"]).reset_index(drop=True)
    exp = exp.sort_values(["doc_id", "word"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"tf": "int64", "df": "int64"}),
        exp.astype({"doc_id": "int64", "tf": "int64", "df": "int64"}),
    )
    # the rare doubled term must outrank every df=25-style common word
    assert out.iloc[0]["word"] == "dup"  # tf 5 / df 1
    assert out.iloc[1]["word"] == "zebra"  # tf 2 / df 1


def test_shard_assign_uses_high_bits(docs_dir):
    from biosample_enricher_ray.pipelines.queries import (
        _SAMPLE_MOD,
        _SAMPLE_MULT,
        _SHARD_SHIFT,
        shard_assign_documents,
    )

    out = shard_assign_documents(docs_dir)
    ids = np.arange(5, dtype=np.uint64)
    h = (ids % np.uint64(_SAMPLE_MOD)) * np.uint64(_SAMPLE_MULT) % np.uint64(_SAMPLE_MOD)
    shards = (h >> np.uint64(_SHARD_SHIFT)).astype(np.int64)
    exp = pd.Series(shards).value_counts().sort_index()
    got = out.set_index("shard")["n"]
    assert got.to_dict() == exp.to_dict()
    # high-bit sharding must NOT be doc_id mod 16 for sequential ids
    assert shards.tolist() != (ids % 16).astype(np.int64).tolist()


def test_bigram_lm_score_prefers_common_bigrams(docs_dir):
    from biosample_enricher_ray.pipelines.queries import (
        bigram_lm_score_documents,
    )

    out = bigram_lm_score_documents(docs_dir)
    # brute force: global bigram counts over the fixture corpus
    docs = {
        0: "dup dup dup dup dup one two three",
        1: "alpha beta gamma delta epsilon",
        2: "zebra zebra alpha",
        3: "alpha beta beta",
        4: "one two",
    }
    model = {}
    per = {}
    for d, text in docs.items():
        ws = text.split()
        bgs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        per[d] = bgs
        for bg in bgs:
            model[bg] = model.get(bg, 0) + 1
    rows = [(d, len(bgs), sum(model[b] for b in bgs))
            for d, bgs in per.items() if bgs]
    rows.sort(key=lambda r: (-(r[2] / r[1]), r[0]))
    exp = pd.DataFrame(rows[:20], columns=["doc_id", "n_bigrams", "lm_hits"])
    pd.testing.assert_frame_equal(
        out, exp.astype("int64"), check_dtype=True)
    # doc 0 ('dup dup' x4) must beat the all-unique-bigram docs
    assert out.iloc[0]["doc_id"] == 0


def test_bigram_lm_partitioned_model_matches_broadcast(sf001_dir):
    """When the bigram model exceeds the broadcast threshold, the
    hash-partitioned model-join path must reproduce the broadcast path
    exactly (round-3 VERDICT ask #5: no ray.put of a web-scale model)."""
    from biosample_enricher_ray.pipelines.queries import _bigram_lm_scores

    broadcast = _bigram_lm_scores(sf001_dir)
    partitioned = _bigram_lm_scores(sf001_dir, broadcast_model_limit=0)
    pd.testing.assert_frame_equal(broadcast, partitioned)
