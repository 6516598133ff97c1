"""Declarative suite spec (SURVEY §2.11): YAML/dict → RowCheck compile,
round-trip equivalence with the Python-constructed suite."""

import textwrap

import pytest
import ray.data

from biosample_enricher_ray.pipelines.validate import (
    default_pages_checks,
    records_dataset,
    summarize_records,
)
from biosample_enricher_ray.schema import (
    CRAWL_WINDOW_END,
    CRAWL_WINDOW_START,
    LANG_REGEX,
    URL_REGEX,
)
from biosample_enricher_ray.stages.suite import compile_suite

SUITE_YAML = textwrap.dedent(f"""
    version: 1
    checks:
      - type: schema
        columns: {{url: string, warc_ts: "timestamp[us]", html: binary,
                   text: large_string, lang: string}}
      - type: not_null
        column: url
      - type: not_null
        column: warc_ts
      - type: not_empty
        column: text
      - type: regex
        column: url
        pattern: '{URL_REGEX}'
        check_id: url_format
      - type: regex
        column: lang
        pattern: '{LANG_REGEX}'
        check_id: lang_format
      - type: range
        column: warc_ts
        lo: "{CRAWL_WINDOW_START}"
        hi: "{CRAWL_WINDOW_END}"
        dtype: timestamp
        check_id: ts_window
      - type: length_range
        column: text
        lo: 1
        hi: 50000000
      - type: length_range
        column: html
        lo: 1
        hi: 536870912
      - type: cross_field
        if_column: text
        then_column: html
      - type: completeness
        columns: [url, warc_ts, text, lang]
        threshold: 0.75
""")


def _matrix(ds, checks):
    res = summarize_records(
        records_dataset(ds, checks, None, batch_size=512, concurrency=2,
                        path_column=None)
    )
    return (
        res.matrix.groupby("check_id", as_index=False)[["n_violations", "n_rows"]]
        .sum()
        .sort_values("check_id")
        .reset_index(drop=True)
    )


def test_yaml_suite_roundtrips_to_python_suite(tmp_path, corpus_dir):
    spec_path = tmp_path / "suite.yaml"
    spec_path.write_text(SUITE_YAML)
    compiled = compile_suite(str(spec_path))
    python_suite = default_pages_checks()
    assert [c.check_id for c in compiled] == [c.check_id for c in python_suite]

    ds = ray.data.read_parquet(f"{corpus_dir}/pages-00000.parquet")
    import pandas as pd

    pd.testing.assert_frame_equal(_matrix(ds, compiled),
                                  _matrix(ds, python_suite))


def test_suite_spec_errors():
    with pytest.raises(ValueError, match="unknown check type"):
        compile_suite({"checks": [{"type": "nope", "column": "x"}]})
    with pytest.raises(ValueError, match="mapping with a 'checks'"):
        compile_suite({"version": 1})


def test_suite_referential_inline_and_enum(corpus_dir):
    spec = {
        "checks": [
            {"type": "referential", "column": "lang",
             "values": ["en", "de", "fr", "es", "it", "pt", "nl", "ru",
                        "zh", "ja", "ko", "ar"],
             "check_id": "lang_in_dim"},
            {"type": "enum", "column": "lang",
             "values": ["en", "de", "fr", "es", "it", "pt", "nl", "ru",
                        "zh", "ja", "ko", "ar"],
             "check_id": "lang_enum"},
        ]
    }
    checks = compile_suite(spec)
    ds = ray.data.read_parquet(f"{corpus_dir}/pages-00000.parquet")
    m = _matrix(ds, checks).set_index("check_id")
    # referential and enum agree on the same dim
    assert (m.loc["lang_in_dim", "n_violations"]
            == m.loc["lang_enum", "n_violations"])
