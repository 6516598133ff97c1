"""Derived pages view over the driver-provided ``documents`` table.

The flagship suite runs over ``pages(url, warc_ts, html, text, lang)``
(BASELINE.json input_hint); the shared testdata ships ``documents(doc_id,
text, lang, source, n_chars)`` (TESTDATA.md). This module derives a pages
view deterministically from documents — a pure vectorized projection, the
engine analog of the reference's adapter normalizers (M1/M2,
/root/reference/biosample_enricher/adapters.py:42-147) — so the flagship
pipeline exercises real driver data with reproducible results.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..schema import PAGES_SCHEMA

_EPOCH_START_US = np.datetime64("2025-01-01 00:00:00", "us")


def documents_to_pages_batch(batch: pa.Table) -> pa.Table:
    """documents row → pages row (deterministic; text bytes preserved)."""
    doc_id = batch["doc_id"].combine_chunks()
    source = pc.fill_null(batch["source"].combine_chunks(), "unknown")
    url = pc.binary_join_element_wise(
        pa.array(["https://"] * len(batch)),
        source,
        pa.array([".example.org/doc/"] * len(batch)),
        pc.cast(doc_id, pa.string()),
        "",
    )
    ids = doc_id.to_numpy(zero_copy_only=False)
    # spread docs across the crawl window, deterministic in doc_id
    offsets_us = (ids.astype(np.int64) * 9_973_331) % (180 * 86_400_000_000)
    warc_ts = _EPOCH_START_US + offsets_us.astype("timedelta64[us]")
    text = batch["text"].combine_chunks()
    html = pc.binary_join_element_wise(
        pa.array(["<html><body>"] * len(batch)),
        pc.fill_null(text, ""),
        pa.array(["</body></html>"] * len(batch)),
        "",
    )
    return pa.table(
        {
            "url": pc.cast(url, pa.string()),
            "warc_ts": pa.array(warc_ts),
            "html": pc.cast(html, pa.binary()),
            "text": pc.cast(text, pa.large_string()),
            "lang": batch["lang"].combine_chunks(),
        },
        schema=PAGES_SCHEMA,
    )


def pages_from_documents(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    return ds.map_batches(documents_to_pages_batch, batch_format="pyarrow")
