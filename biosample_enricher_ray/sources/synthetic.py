"""Deterministic synthetic ``pages`` corpus generator (FIXTURES.md §1).

The reference ships a versioned synthetic fixture corpus with planted
valid/invalid examples (/root/reference/data/input/synthetic_biosamples.json,
docs/TESTING.md:217-257). This module is its engine analog: a seeded generator
that writes a multi-file Parquet corpus of Common-Crawl-style pages with
*planted violations* at known rates so every check has ground truth:

- ~1% duplicate urls, ~0.5% malformed urls         (uniqueness / regex checks)
- ~0.5% warc_ts outside the pinned crawl window    (range check)
- ~0.3% null html; a few multi-MB giant html blobs (null-rate / skew stress)
- ~1% null/empty text; text-without-html rows      (cross-field check)
- ~0.5% lang codes outside lang_dim; ~0.2% malformed lang (referential / regex)
- zipf-skewed domains with a few hot domains       (shuffle-skew stress)

Generation is per-file deterministic: file i is a pure function of
(seed, i, rows_per_file), so any subset of files can be regenerated
independently — the property the resume tests rely on.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import CRAWL_WINDOW_END, CRAWL_WINDOW_START, PAGES_SCHEMA

ISO_LANGS = [
    "en", "de", "fr", "es", "it", "pt", "nl", "ru", "zh", "ja",
    "ko", "ar", "hi", "bn", "tr", "pl", "sv", "no", "da", "fi",
    "cs", "el", "he", "th", "vi", "id", "ms", "uk", "ro", "hu",
    "bg", "hr", "sk", "sl", "et", "lv", "lt", "fa", "ur", "ta",
    "te", "ml", "mr", "gu", "kn", "sw", "af", "ca", "eu", "gl",
]
BAD_LANGS = ["xx", "qq", "zz", "yy"]  # well-formed but not in lang_dim

DOMAINS = [
    "example.com", "news.example.org", "wiki.example.net", "blog.sample.io",
    "shop.demo.co", "docs.sample.dev", "forum.example.info", "media.demo.tv",
    "data.sample.ai", "mail.example.app",
] + [f"site{i:03d}.example.com" for i in range(90)]
BAD_DOMAINS = ["rogue.invalid", "spam.unlisted"]  # not in domain_dim

WORDS = np.array(
    "the of and to in a is that for it as was with be by on not he i this are "
    "or his from at which but have an had they you were her all she there would "
    "their we him been has when who will more no if out so said what up its "
    "about into than them can only other new some could time these two may then "
    "do first any my now such like our over man me even most made after also "
    "did many before must through years where much your way well down should "
    "because each just those people how too little state good very make world "
    "still own see men work long get here between both life being under never "
    "day same another know while last might us great old year off come since "
    "against go came right used take three".split()
)


@dataclass
class CorpusSpec:
    """Knobs for one deterministic corpus generation."""

    n_rows: int = 10_000
    n_files: int = 4
    seed: int = 42
    dup_url_rate: float = 0.01
    bad_url_rate: float = 0.005
    ts_outlier_rate: float = 0.005
    null_html_rate: float = 0.003
    null_text_rate: float = 0.01
    orphan_html_rate: float = 0.004  # text non-empty but html null (cross-field)
    bad_lang_rate: float = 0.005
    malformed_lang_rate: float = 0.002
    giant_html_per_file: int = 1
    giant_html_bytes: int = 2 * 1024 * 1024
    zipf_a: float = 1.3  # domain skew
    text_len_mu: float = 5.5  # lognormal median ~245 words
    text_len_sigma: float = 1.0
    ts_shift_days: float = 0.0  # drift knob: shift warc_ts distribution
    text_len_scale: float = 1.0  # drift knob: scale text lengths
    domains: list[str] = field(default_factory=lambda: list(DOMAINS))


def _gen_text(rng: np.random.Generator, n_words: np.ndarray) -> list[str]:
    """Deterministic pseudo-text: space-joined dictionary words."""
    total = int(n_words.sum())
    words = WORDS[rng.integers(0, len(WORDS), size=total)]
    out = []
    pos = 0
    for n in n_words:
        out.append(" ".join(words[pos : pos + n]))
        pos += n
    return out


def generate_pages_file(spec: CorpusSpec, file_index: int) -> pa.Table:
    """Generate one file's rows — pure function of (spec.seed, file_index)."""
    rng = np.random.default_rng([spec.seed, file_index])
    n = spec.n_rows // spec.n_files
    base_id = file_index * n

    # --- urls: zipf-skewed domains, deterministic per-row path
    dom_idx = rng.zipf(spec.zipf_a, size=n) - 1
    dom_idx = np.minimum(dom_idx, len(spec.domains) - 1)
    domains = np.array(spec.domains, dtype=object)[dom_idx]
    row_ids = np.arange(base_id, base_id + n)
    urls = np.array(
        [f"https://{d}/page/{i:09d}" for d, i in zip(domains, row_ids)], dtype=object
    )
    # planted duplicate urls: copy an earlier url within the file
    dup_mask = rng.random(n) < spec.dup_url_rate
    dup_mask[0] = False
    dup_src = rng.integers(0, np.maximum(np.arange(n), 1))
    urls[dup_mask] = urls[dup_src[dup_mask]]
    # planted malformed urls
    bad_url_mask = rng.random(n) < spec.bad_url_rate
    urls[bad_url_mask] = np.array(
        [f"not a url {i}" if i % 2 == 0 else f"ftp//broken/{i}" for i in row_ids[bad_url_mask]],
        dtype=object,
    )
    # a slice of rows on rogue domains (referential violation on domain_dim)
    rogue_mask = (~bad_url_mask) & (rng.random(n) < 0.004)
    urls[rogue_mask] = np.array(
        [f"https://{BAD_DOMAINS[i % len(BAD_DOMAINS)]}/p/{i}" for i in row_ids[rogue_mask]],
        dtype=object,
    )

    # --- warc_ts within the crawl window, with planted outliers
    start = np.datetime64(CRAWL_WINDOW_START.replace("T", " "))
    end = np.datetime64(CRAWL_WINDOW_END.replace("T", " "))
    span_us = (end - start) / np.timedelta64(1, "us")
    offs = rng.random(n) * span_us
    if spec.ts_shift_days:
        offs = np.clip(offs + spec.ts_shift_days * 86_400e6, 0, span_us)
    ts = start + offs.astype("int64").astype("timedelta64[us]")
    out_mask = rng.random(n) < spec.ts_outlier_rate
    early = rng.random(n) < 0.5
    ts[out_mask & early] = np.datetime64("1989-06-01 00:00:00")
    ts[out_mask & ~early] = np.datetime64("2031-01-01 00:00:00")

    # --- text: deterministic function of the row id (byte-identical invariant)
    n_words = np.maximum(
        (rng.lognormal(spec.text_len_mu, spec.text_len_sigma, size=n)
         * spec.text_len_scale).astype(int),
        1,
    )
    texts = np.array(_gen_text(np.random.default_rng([spec.seed, 7, file_index]), n_words),
                     dtype=object)
    null_text_mask = rng.random(n) < spec.null_text_rate
    texts[null_text_mask] = None
    empty_text_mask = (~null_text_mask) & (rng.random(n) < spec.null_text_rate / 2)
    texts[empty_text_mask] = ""

    # --- html: pseudo-random bytes ~3-10x text length; planted nulls + giants
    html_lens = (n_words * rng.uniform(15, 40, size=n)).astype(int)
    blob = rng.bytes(int(html_lens.sum()) if n else 0)
    htmls = np.empty(n, dtype=object)
    pos = 0
    for i, ln in enumerate(html_lens):
        htmls[i] = blob[pos : pos + ln]
        pos += ln
    null_html_mask = rng.random(n) < spec.null_html_rate
    htmls[null_html_mask] = None
    # cross-field violation: text present but html null
    orphan_mask = (~null_text_mask) & (~empty_text_mask) & (rng.random(n) < spec.orphan_html_rate)
    htmls[orphan_mask] = None
    # giant blobs (block-size stress)
    for g in range(spec.giant_html_per_file):
        gi = int(rng.integers(0, n))
        htmls[gi] = bytes(rng.bytes(spec.giant_html_bytes))

    # --- lang
    langs = np.array(ISO_LANGS, dtype=object)[rng.integers(0, len(ISO_LANGS), size=n)]
    bad_lang_mask = rng.random(n) < spec.bad_lang_rate
    langs[bad_lang_mask] = np.array(BAD_LANGS, dtype=object)[
        rng.integers(0, len(BAD_LANGS), size=int(bad_lang_mask.sum()))
    ]
    mal_lang_mask = (~bad_lang_mask) & (rng.random(n) < spec.malformed_lang_rate)
    langs[mal_lang_mask] = "xx-!!"

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def write_corpus(out_dir: str, spec: CorpusSpec | None = None) -> list[str]:
    """Write the corpus as ``pages-{i:05d}.parquet`` files; returns paths.

    Multiple files + multiple row groups per file so fragment-level
    parallelism, resume, and skew handling are exercised (FIXTURES.md §1).
    """
    spec = spec or CorpusSpec()
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(spec.n_files):
        table = generate_pages_file(spec, i)
        path = os.path.join(out_dir, f"pages-{i:05d}.parquet")
        pq.write_table(table, path, row_group_size=max(1024, len(table) // 4))
        paths.append(path)
    return paths


def write_corpus_parallel(out_dir: str, spec: CorpusSpec | None = None) -> list[str]:
    """Parallel corpus generation: one Ray task per file (file i is a pure
    function of (seed, i), so parallel generation is byte-identical to the
    sequential path). Requires an initialized Ray session — never inits one.
    """
    import ray

    if not ray.is_initialized():
        return write_corpus(out_dir, spec)
    spec = spec or CorpusSpec()
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def _gen_one(spec: CorpusSpec, i: int, out_dir: str) -> str:
        table = generate_pages_file(spec, i)
        path = os.path.join(out_dir, f"pages-{i:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(table, tmp, row_group_size=max(1024, len(table) // 4))
        os.replace(tmp, path)
        return path

    return ray.get([_gen_one.remote(spec, i, out_dir) for i in range(spec.n_files)])


def write_dims(out_dir: str) -> dict[str, str]:
    """Write lang_dim / domain_dim tables (FIXTURES.md §2)."""
    os.makedirs(out_dir, exist_ok=True)
    lang_path = os.path.join(out_dir, "lang_dim.parquet")
    pq.write_table(pa.table({"lang": pa.array(ISO_LANGS, pa.string())}), lang_path)
    domain_path = os.path.join(out_dir, "domain_dim.parquet")
    cats = ["general"] * 10 + ["site"] * 90
    pq.write_table(
        pa.table({"domain": pa.array(DOMAINS, pa.string()),
                  "category": pa.array(cats, pa.string())}),
        domain_path,
    )
    return {"lang_dim": lang_path, "domain_dim": domain_path}
