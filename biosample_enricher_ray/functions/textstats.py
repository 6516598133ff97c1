"""Vectorized text-analysis kernels: tokens, quality, language-ID, fingerprint.

Webtext analogs of the reference's text classifiers — the config-driven
keyword/ENVO host classifier (/root/reference/biosample_enricher/host_detector.py:47-122),
precision scorers (adapters.py:355-382), and quality tiers
(weather/providers/base.py:93-147) — re-expressed as batch kernels over a
``text`` column for a training-data pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .parsing import retrim

# BPE-ish token pattern: words-with-apostrophes, numbers, or single non-space
# symbols — the usual pre-tokenizer shape.
TOKEN_PATTERN = r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+|[^\sA-Za-z0-9]"

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (the reference's keyword-set classification pattern,
# host_detector.py:62-65, recast for language).
LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it was for on are with as be at by".split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit von auf für den im".split()),
    "fr": frozenset("le la les et de des un une est pas dans que pour sur avec au".split()),
    "es": frozenset("el la los las y de un una es no en que por con para del se".split()),
    "it": frozenset("il la le e di un una è non in che per con del alla dei".split()),
    "pt": frozenset("o a os as e de um uma é não em que por com para do na".split()),
    "nl": frozenset("de het een en van is in dat niet met op voor aan als zijn".split()),
}


def whitespace_token_count(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Tokens = runs of non-whitespace; '' and null → 0. Pure Arrow kernels."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    trimmed = retrim(pc.fill_null(texts, ""))
    splits = pc.split_pattern_regex(trimmed, r"\s+")
    n = pc.list_value_length(splits)
    # ''.split(r'\s+') yields [''] → correct 0 via null/empty guard
    empty = pc.equal(pc.utf8_length(trimmed), 0)
    return pc.if_else(empty, pa.scalar(0, pa.int32()), n).cast(pa.int64())


def regex_token_count(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """BPE-ish pre-tokenizer count (Arrow RE2 kernel, zero object boxing)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    filled = pc.fill_null(texts, "")
    return pc.count_substring_regex(filled, TOKEN_PATTERN).cast(pa.int64())


def quality_features(
    texts: pa.Array | pa.ChunkedArray, *, score_decimals: int | None = 2
) -> pa.Table:
    """Length / punctuation / stopword / uppercase features + a 0-100 score.

    Score tiers mirror the reference's completeness→score mapping
    (weather/providers/base.py:125-147): weighted sub-scores scaled to 100.
    ``score_decimals=None`` returns the raw float score — aggregates that
    must match a SQL oracle quantize it themselves with exact arithmetic
    (library decimal rounding differs between numpy and DuckDB at half
    boundaries; the raw expression is bit-identical across both).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    filled = pc.fill_null(texts, "")
    n_chars = pc.utf8_length(filled).cast(pa.int64())
    n_tokens = whitespace_token_count(texts)

    # Arrow RE2 kernels over the flat UTF-8 buffer — no object boxing (the
    # round-2 pandas passes were the last non-Arrow hot kernels). RE2 word
    # semantics (\b, \w are ASCII) — the SAME engine DuckDB uses, so the
    # generated oracle SQL and this kernel share regex semantics exactly.
    n_alpha = pc.count_substring_regex(filled, r"[A-Za-z]").to_numpy()
    n_punct = pc.count_substring_regex(filled, r"[^\w\s]").to_numpy()
    n_upper = pc.count_substring_regex(filled, r"[A-Z]").to_numpy()
    n_stop = pc.count_substring_regex(
        pc.utf8_lower(filled),
        r"\b(?:" + "|".join(sorted(LANG_STOPWORDS["en"])) + r")\b",
    ).to_numpy()

    chars = np.maximum(np.asarray(n_chars), 1)
    toks = np.maximum(n_tokens.to_numpy(zero_copy_only=False), 1)
    alpha_ratio = n_alpha / chars
    punct_ratio = n_punct / chars
    upper_ratio = np.where(n_alpha > 0, n_upper / np.maximum(n_alpha, 1), 0.0)
    stop_ratio = n_stop / toks
    mean_token_len = chars / toks

    # 0-100 score: alphabetic-ness, sane punctuation, some stopwords, sane
    # word length, enough content
    score = (
        30.0 * np.clip(alpha_ratio / 0.7, 0, 1)
        + 20.0 * (1.0 - np.clip((punct_ratio - 0.08) / 0.3, 0, 1))
        + 20.0 * np.clip(stop_ratio / 0.25, 0, 1)
        + 15.0 * (1.0 - np.clip(np.abs(mean_token_len - 5.5) / 8.0, 0, 1))
        + 15.0 * np.clip(np.asarray(n_chars) / 500.0, 0, 1)
    )
    score = np.where(np.asarray(n_chars) == 0, 0.0, score)
    if score_decimals is not None:
        score = np.round(score, score_decimals)

    return pa.table(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "alpha_ratio": pa.array(alpha_ratio),
            "punct_ratio": pa.array(punct_ratio),
            "upper_ratio": pa.array(upper_ratio),
            "stopword_ratio": pa.array(stop_ratio),
            "mean_token_len": pa.array(mean_token_len),
            "quality_score": pa.array(score),
        }
    )


def detect_language(texts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Stopword-profile language ID over the supported set; 'und' if no hit.

    Vectorized per language: one RE2 alternation count per profile (Arrow
    ``count_substring_regex`` over the flat buffer — no object boxing), the
    argmax wins (ties → first by language order). Deterministic. RE2 word
    boundaries are ASCII — identical to DuckDB's regexp engine; the only
    divergence from Python ``re`` is a non-ASCII-EDGED stopword ('è', 'é')
    adjacent to spaces, which cannot match under RE2 on either side.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    filled = pc.fill_null(texts, "")
    low = pc.utf8_lower(filled)
    toks = np.maximum(
        pc.count_substring_regex(low, r"\S+").to_numpy(), 1
    )
    langs = list(LANG_STOPWORDS)
    scores = np.zeros((len(langs), len(low)))
    for i, lang in enumerate(langs):
        pat = r"\b(?:" + "|".join(sorted(LANG_STOPWORDS[lang])) + r")\b"
        scores[i] = pc.count_substring_regex(low, pat).to_numpy() / toks
    best = scores.argmax(axis=0)
    best_score = scores.max(axis=0)
    out = np.array(langs, dtype=object)[best]
    out[best_score < 0.08] = "und"
    out[pc.utf8_length(filled).to_numpy(zero_copy_only=False) == 0] = None
    return pa.array(out, pa.string())


_FP_B = np.uint64(1099511628211)  # FNV prime, odd → invertible mod 2^64
_FP_B_INV = np.uint64(pow(int(_FP_B), -1, 1 << 64))
_FP_POW_CACHE: dict[str, tuple[np.ndarray, np.ndarray]] = {}


def _fp_pow_tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Grow-on-demand (B^i, B^-i) tables for the fingerprint base (the
    dedup._pow_tables idiom; input-independent, amortized per worker).
    Single-key atomic assignment — see hashing._pow_tables for the
    two-write race this avoids under threaded task execution."""
    cached = _FP_POW_CACHE.get("tables")
    if cached is None or cached[0].size < n:
        from .hashing import _pow_series

        # log-doubling build — the accumulate version was a ~1 s scalar
        # loop at 2^20, paid by every fingerprint actor's first batch
        size = max(n, 1 << 20)
        cached = (_pow_series(_FP_B, size), _pow_series(_FP_B_INV, size))
        _FP_POW_CACHE["tables"] = cached
    return cached


def rolling_fingerprint(texts: pa.Array | pa.ChunkedArray, window: int = 8) -> pa.Array:
    """Document fingerprint: min of rolling polynomial hashes over byte windows.

    A winnowing-style content fingerprint (stable under identical bytes —
    the reference's canonical-payload-hash idea, elevation/service.py:388-391,
    without full sha256 cost elsewhere). Returns uint64 as int64 column.

    Vectorized over the column's flat UTF-8 buffer (no per-row ``.as_py()``):
    window hash H_i = Σ_j b[i+j]·B^{w-1-j} is computed for EVERY buffer
    position in one pass via prefix sums with the invertible base —
    H_i = (S[i+w] − S[i])·B^{i+w-1} where S is the cumsum of b[i]·B^{-i} —
    then positions whose window crosses a document boundary are masked and
    per-document minima come from one ``np.minimum.reduceat``. Docs shorter
    than the window use the original FNV-style fold (rare tail, looped on
    the numpy buffer).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    from .hashing import _utf8_bytes_and_offsets

    n_docs = len(texts)
    out = np.zeros(n_docs, dtype=np.uint64)
    if n_docs == 0:
        return pa.array(out.view(np.int64))
    data, offsets = _utf8_bytes_and_offsets(texts)
    starts, ends = offsets[:-1], offsets[1:]
    lens = ends - starts
    N = data.size
    w = window
    M = N - w + 1  # number of window positions in the flat buffer
    if M > 0:
        pows, inv_pows = _fp_pow_tables(N + 1)
        with np.errstate(over="ignore"):
            terms = data.astype(np.uint64) * inv_pows[:N]
            S = np.concatenate([[np.uint64(0)], np.cumsum(terms, dtype=np.uint64)])
            H = (S[w:] - S[:M]) * pows[w - 1 : N]
        # mask positions whose window crosses a doc boundary (each doc's last
        # w-1 positions) via a range-diff accumulator
        delta = np.zeros(M + 1, dtype=np.int32)
        bad_s = np.clip(np.maximum(starts, ends - w + 1), 0, M)
        bad_e = np.clip(ends, 0, M)
        np.add.at(delta, bad_s, 1)
        np.add.at(delta, bad_e, -1)
        bad = np.cumsum(delta[:-1]) > 0
        H[bad] = np.uint64(0xFFFFFFFFFFFFFFFF)
        long_docs = lens >= w
        if long_docs.any():
            rs = np.minimum(starts[long_docs], M - 1)
            mins = np.minimum.reduceat(H, rs)
            out[long_docs] = mins
    # short non-empty docs: sequential multiply-xor fold (not prefix-summable)
    for i in np.flatnonzero((lens > 0) & (lens < w)):
        acc = np.uint64(14695981039346656037)
        with np.errstate(over="ignore"):
            for x in data[starts[i] : ends[i]]:
                acc = (acc * _FP_B) ^ np.uint64(x)
        out[i] = acc
    null_mask = pc.is_null(texts).to_numpy(zero_copy_only=False).astype(bool)
    out[null_mask] = 0
    return pa.array(out.view(np.int64))


# Sensitive-pattern scrubbing (the PII-redaction stage of a training-data
# pipeline). Patterns are RE2 — the same engine Arrow's kernels and DuckDB's
# regexp_* functions share, so an oracle can recompute counts and redacted
# lengths exactly. The default set covers the classic PII shapes; a corpus
# gate should pass patterns that actually occur in its data.
DEFAULT_PII_PATTERNS: tuple[str, ...] = (
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",          # email
    r"\b(?:\d{1,3}\.){3}\d{1,3}\b",                             # IPv4
    r"\b(?:\+?\d{1,2}[\s.-]?)?(?:\(\d{3}\)|\d{3})[\s.-]?\d{3}[\s.-]?\d{4}\b",  # phone
)


def redact_patterns(
    texts: pa.Array | pa.ChunkedArray,
    patterns: list[str] | tuple[str, ...] = DEFAULT_PII_PATTERNS,
    replacement: str = "[REDACTED]",
) -> pa.Table:
    """Count and scrub every pattern in one vectorized pass per pattern.

    Returns columns ``redacted`` (string), ``n_matches`` (int64, summed over
    patterns), computed with Arrow's RE2 ``count_substring_regex`` /
    ``replace_substring_regex`` — no Python-level row loop, no object
    boxing. Null text stays null with 0 matches.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    null_mask = pc.is_null(texts)
    out = texts
    n = np.zeros(len(texts), dtype=np.int64)
    for pat in patterns:
        n += pc.count_substring_regex(
            pc.fill_null(out, ""), pat
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        out = pc.replace_substring_regex(out, pat, replacement)
    out = pc.if_else(null_mask, pa.scalar(None, pa.string()), out)
    return pa.table({"redacted": out, "n_matches": pa.array(n, pa.int64())})
