"""Declarative constraint-suite spec → compiled RowCheck list.

The reference's main user-extension surface is config-driven behavior:
YAML field mappings (/root/reference/biosample_enricher/config/field_mappings.yaml:1-283)
and keyword lists (config/host_detection.yaml:1-141) loaded once at startup
(metrics/aligner.py:21-35, host_detector.py:21-45). This module is the engine
analog (SURVEY.md §2.11): a YAML/dict suite spec compiles to the same
``RowCheck`` objects the Python API builds, so suites are data, versionable,
and user-editable without code.

Spec shape::

    version: 1
    checks:
      - type: not_null          # not_null | not_empty | regex | range |
        column: url             # length_range | enum | completeness |
      - type: regex             # cross_field | referential | schema
        column: url
        pattern: "^https?://.*$"
        check_id: url_format    # optional everywhere
      - type: range
        column: warc_ts
        lo: "2025-01-01T00:00:00"
        hi: "2025-07-01T00:00:00"
        dtype: timestamp        # parse lo/hi as ISO timestamps
      - type: enum
        column: lang
        values: [en, de, fr]
      - type: completeness
        columns: [url, warc_ts, text, lang]
        threshold: 0.75
      - type: cross_field
        if_column: text
        then_column: html
      - type: referential
        column: lang
        values: [en, de]        # inline dim ...
        # parquet: /path/dim.parquet   # ... or a parquet dim table
        # key: lang
        # key_fn: domain
      - type: schema
        columns: {url: string, warc_ts: "timestamp[us]", text: large_string}
"""

from __future__ import annotations

import datetime as dt
from typing import Any

import pyarrow as pa

from .checks import (
    CacheabilityCheck,
    CompletenessCheck,
    CrossFieldCheck,
    EnumCheck,
    LengthRangeCheck,
    NotEmptyCheck,
    NotNullCheck,
    RangeCheck,
    ReferentialCheck,
    RegexCheck,
    RowCheck,
    SchemaCheck,
)


def _parse_bound(value: Any, dtype: str | None) -> Any:
    if value is None:
        return None
    if dtype == "timestamp":
        return dt.datetime.fromisoformat(str(value))
    return value


def _dim_ref(entry: dict) -> tuple[Any, str]:
    """Resolve a referential dim: inline values, or a parquet column —
    ``ray.put`` once so actors resolve it via broadcast, never per batch.
    Returns (ref-or-array, content digest): the digest goes into the
    fingerprintable ``dim_digest`` field so editing e.g. ``values: [en, de]``
    in a YAML suite invalidates checkpoint resume (the ObjectRef itself is
    run-scoped and excluded from the fingerprint)."""
    import ray

    from .checks import dim_content_digest

    if "values" in entry:
        dim = pa.array([str(v) for v in entry["values"]], pa.string())
    elif "parquet" in entry:
        import pyarrow.parquet as pq

        key = entry.get("key") or entry["column"]
        dim = pq.read_table(entry["parquet"], columns=[key])[key].combine_chunks()
    else:
        raise ValueError("referential check needs 'values' or 'parquet'")
    digest = dim_content_digest(dim)
    return (ray.put(dim) if ray.is_initialized() else dim), digest


_COMMON = ("check_id", "expected")


def _common(entry: dict) -> dict:
    return {k: entry[k] for k in _COMMON if k in entry}


def compile_check(entry: dict) -> RowCheck:
    kind = entry.get("type")
    if kind == "not_null":
        return NotNullCheck(column=entry["column"], **_common(entry))
    if kind == "not_empty":
        return NotEmptyCheck(column=entry["column"], **_common(entry))
    if kind == "regex":
        return RegexCheck(column=entry["column"], pattern=entry["pattern"],
                          **_common(entry))
    if kind == "range":
        d = entry.get("dtype")
        return RangeCheck(column=entry["column"],
                          lo=_parse_bound(entry.get("lo"), d),
                          hi=_parse_bound(entry.get("hi"), d), **_common(entry))
    if kind == "length_range":
        return LengthRangeCheck(column=entry["column"],
                                lo=int(entry.get("lo", 0)),
                                hi=int(entry.get("hi", 1 << 62)), **_common(entry))
    if kind == "enum":
        return EnumCheck(column=entry["column"], values=tuple(entry["values"]),
                         **_common(entry))
    if kind == "completeness":
        return CompletenessCheck(columns=tuple(entry["columns"]),
                                 threshold=float(entry.get("threshold", 0.75)),
                                 **_common(entry))
    if kind == "cross_field":
        return CrossFieldCheck(if_column=entry["if_column"],
                               then_column=entry["then_column"], **_common(entry))
    if kind == "referential":
        ref, digest = _dim_ref(entry)
        return ReferentialCheck(column=entry["column"], dim_ref=ref,
                                dim_digest=digest,
                                key_fn=entry.get("key_fn"), **_common(entry))
    if kind == "cacheability":
        kw = {}
        if "ok_statuses" in entry:
            kw["ok_statuses"] = tuple(entry["ok_statuses"])
        if "error_pattern" in entry:
            kw["error_pattern"] = entry["error_pattern"]
        return CacheabilityCheck(column=entry["column"],
                                 body_column=entry.get("body_column", ""),
                                 url_column=entry.get("url_column", ""),
                                 gate_url_pattern=entry.get("gate_url_pattern", ""),
                                 **kw, **_common(entry))
    if kind == "schema":
        fields = [pa.field(n, pa.type_for_alias(t) if isinstance(t, str) else t)
                  for n, t in entry["columns"].items()]
        return SchemaCheck(declared=pa.schema(fields), **_common(entry))
    raise ValueError(f"unknown check type: {kind!r}")


def compile_suite(spec: dict | str) -> list[RowCheck]:
    """dict or YAML-file path → list[RowCheck].

    Unknown top-level keys are ignored (forward compatibility); unknown
    check types raise at compile time, not mid-pipeline.
    """
    if isinstance(spec, str):
        import yaml

        with open(spec) as f:
            spec = yaml.safe_load(f)
    if not isinstance(spec, dict) or "checks" not in spec:
        raise ValueError("suite spec must be a mapping with a 'checks' list")
    return [compile_check(e) for e in spec["checks"]]
