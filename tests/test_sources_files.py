"""Tests for JSON source, multi-format sinks, ordered id fetch (S7/S8/J2)."""

import glob
import json
import os

import pyarrow as pa
import ray.data

from biosample_enricher_ray.schema import PAGES_SCHEMA
from biosample_enricher_ray.sources.files import (
    fetch_by_ids_ordered,
    read_pages_json,
    write_outputs,
)


def test_read_pages_json(tmp_path):
    rows = [
        {"url": "https://a.com/1", "warc_ts": "2025-02-01T10:00:00",
         "html": "<html>x</html>", "text": "hello world", "lang": "en"},
        {"url": "https://b.com/2", "warc_ts": "2025-03-05T00:00:00",
         "text": "bonjour", "lang": "fr"},
    ]
    p = tmp_path / "pages.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = read_pages_json(str(p))
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    assert t.column_names == PAGES_SCHEMA.names
    out = ds.take_all()
    assert out[0]["url"] == "https://a.com/1"
    assert out[0]["lang"] == "en"
    assert out[1]["html"] is None
    assert str(out[0]["warc_ts"]).startswith("2025-02-01")


def test_write_outputs_formats(tmp_path, sf001_dir):
    ds = ray.data.read_parquet(f"{sf001_dir}/documents.parquet").limit(20)
    for fmt, glob_pat in (("parquet", "*.parquet"), ("json", "*.json"),
                          ("csv", "*.csv")):
        out = tmp_path / fmt
        write_outputs(ds, str(out), fmt)
        assert glob.glob(str(out / glob_pat)), fmt
    back = ray.data.read_parquet(str(tmp_path / "parquet")).count()
    assert back == 20


def test_fetch_by_ids_ordered(sf001_dir):
    ds = ray.data.read_parquet(f"{sf001_dir}/documents.parquet")
    want = [42, 7, 199, 3]
    t = fetch_by_ids_ordered(ds, want, "doc_id")
    assert t["doc_id"].to_pylist() == want
    # missing ids are dropped, order of the rest preserved
    t2 = fetch_by_ids_ordered(ds, [42, 10**9, 7], "doc_id")
    assert t2["doc_id"].to_pylist() == [42, 7]
