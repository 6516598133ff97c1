"""Unit tests for check kernels on tiny in-memory Arrow tables.

Mirrors the reference's valid/invalid example-corpus pattern
(/root/reference/docs/TESTING.md:217-257, tests/test_adapters.py:17-86): one
row per edge case, exact expected masks.
"""

import datetime as dt

import pyarrow as pa

from biosample_enricher_ray.schema import PAGES_SCHEMA
from biosample_enricher_ray.stages.checks import (
    CompletenessCheck,
    CrossFieldCheck,
    EnumCheck,
    LengthRangeCheck,
    NotEmptyCheck,
    NotNullCheck,
    RangeCheck,
    ReferentialCheck,
    RegexCheck,
    SchemaCheck,
    completeness_column,
)


def tbl(**cols):
    return pa.table(cols)


def masks(check, batch):
    return check.mask(batch).to_pylist()


def test_not_null_and_not_empty():
    b = tbl(x=pa.array(["a", None, "", "  "]))
    assert masks(NotNullCheck(column="x"), b) == [False, True, False, False]
    assert masks(NotEmptyCheck(column="x"), b) == [False, True, True, True]


def test_not_empty_binary():
    b = tbl(x=pa.array([b"ab", b"", None], pa.binary()))
    assert masks(NotEmptyCheck(column="x"), b) == [False, True, True]


def test_range_numeric_and_timestamp():
    b = tbl(v=pa.array([-1.0, 0.0, 5.0, 11.0, None]))
    assert masks(RangeCheck(column="v", lo=0, hi=10), b) == [
        True, False, False, True, False,
    ]
    ts = pa.array(
        [dt.datetime(2025, 3, 1), dt.datetime(1989, 6, 1), dt.datetime(2031, 1, 1), None],
        pa.timestamp("us"),
    )
    c = RangeCheck(column="t", lo=dt.datetime(2025, 1, 1), hi=dt.datetime(2025, 7, 1))
    assert masks(c, tbl(t=ts)) == [False, True, True, False]


def test_regex_and_enum():
    b = tbl(lang=pa.array(["en", "xx-!!", "EN", None, "d"]))
    assert masks(RegexCheck(column="lang", pattern=r"^[a-z]{2}$"), b) == [
        False, True, True, False, True,
    ]
    assert masks(EnumCheck(column="lang", values=("en", "de")), b) == [
        False, True, True, False, True,
    ]


def test_length_range():
    b = tbl(text=pa.array(["", "ok", "x" * 100, None]))
    c = LengthRangeCheck(column="text", lo=1, hi=50)
    assert masks(c, b) == [True, False, True, False]
    assert c.observed(b, c.mask(b)).to_pylist() == ["0", "100"]


def test_referential_plain_and_domain():
    c = ReferentialCheck(column="lang", dim_ref=pa.array(["en", "de"]))
    b = tbl(lang=pa.array(["en", "fr", None]))
    assert masks(c, b) == [False, True, False]

    cd = ReferentialCheck(
        column="url", dim_ref=pa.array(["good.com"]), key_fn="domain"
    )
    b2 = tbl(url=pa.array(["https://good.com/a", "https://evil.io/b", "junk"]))
    assert masks(cd, b2) == [False, True, False]  # unparseable url → regex's job
    assert cd.observed(b2, cd.mask(b2)).to_pylist() == ["evil.io"]


def test_cross_field():
    b = tbl(
        text=pa.array(["hello", "", None, "x"]),
        html=pa.array([b"h", None, None, None], pa.binary()),
    )
    c = CrossFieldCheck(if_column="text", then_column="html")
    assert masks(c, b) == [False, False, False, True]


def test_completeness():
    b = tbl(
        a=pa.array(["x", None]),
        b=pa.array([1, None]),
        c=pa.array(["y", "z"]),
        d=pa.array([None, None], pa.string()),
    )
    scores = completeness_column(b, ("a", "b", "c", "d")).to_pylist()
    assert scores == [0.75, 0.25]
    c = CompletenessCheck(columns=("a", "b", "c", "d"), threshold=0.5)
    assert masks(c, b) == [False, True]


def test_schema_check_mismatches():
    sc = SchemaCheck(declared=PAGES_SCHEMA)
    assert sc.mismatches(PAGES_SCHEMA) == []
    # large_string vs string tolerated
    alt = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    assert sc.mismatches(alt) == []
    missing = pa.schema([pa.field("url", pa.string())])
    assert len(sc.mismatches(missing)) == 4
    wrong = pa.schema(list(alt) [:4] + [pa.field("lang", pa.int64())])
    assert any("lang" in m for m in sc.mismatches(wrong))


def test_cacheability_check():
    """F5 cacheability gate (http_cache.py:55-66 analog): only clean 200s are
    persistable; 200s whose body is a disguised error payload from a gated
    provider are rejected too."""
    from biosample_enricher_ray.stages.checks import CacheabilityCheck, cacheable_mask

    b = tbl(
        status=pa.array([200, 404, 500, 200, 200, None], pa.int32()),
        body=pa.array([
            '{"ok": true}',                       # clean 200 -> cacheable
            "not found",                          # 404 -> not cacheable
            "boom",                               # 500 -> not cacheable
            '{"error": {"message": "quota"}}',    # gated provider error 200
            '{"error_message": "denied"}',        # ungated provider: kept
            None,                                 # null status -> not cacheable
        ]),
        url=pa.array([
            "https://example.com/a",
            "https://example.com/b",
            "https://api.provider.test/c",
            "https://api.provider.test/d",
            "https://example.com/e",
            "https://example.com/f",
        ]),
    )
    chk = CacheabilityCheck(column="status", body_column="body",
                            url_column="url",
                            gate_url_pattern=r"api\.provider\.test")
    assert masks(chk, b) == [False, True, True, True, False, True]
    assert cacheable_mask(b, chk).to_pylist() == [
        True, False, False, False, True, False]
    assert sorted(chk.needs()) == ["body", "status", "url"]

    # ungated variant sniffs every body
    chk2 = CacheabilityCheck(column="status", body_column="body")
    assert masks(chk2, b) == [False, True, True, True, True, True]

    # status-only variant
    chk3 = CacheabilityCheck(column="status", ok_statuses=(200, 304))
    assert masks(chk3, b) == [False, True, True, False, False, True]


def test_cacheability_yaml_suite():
    from biosample_enricher_ray.stages.checks import CacheabilityCheck
    from biosample_enricher_ray.stages.suite import compile_check

    chk = compile_check({
        "type": "cacheability", "column": "status", "body_column": "body",
        "url_column": "url", "gate_url_pattern": "googleapis",
        "ok_statuses": [200, 304], "check_id": "cache_gate",
    })
    assert isinstance(chk, CacheabilityCheck)
    assert chk.check_id == "cache_gate"
    assert chk.ok_statuses == (200, 304)
    assert chk.gate_url_pattern == "googleapis"
