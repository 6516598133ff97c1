"""Declared schemas and suite-wide constants for the pages corpus.

The reference validates rows against a pydantic model with range / regex /
enum / derived-field constraints (``/root/reference/biosample_enricher/models.py:15-134``).
This engine replaces runtime schema *inference* (genson,
``schema_inference.py:44-58``) with a declared ``pyarrow.Schema`` asserted
against every fragment — schema drift is a violation, not a discovery.
"""

from __future__ import annotations

import pyarrow as pa

# The primary corpus table (BASELINE.json input_hint).
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.large_string()),
        pa.field("lang", pa.string()),
    ]
)

# pa.string() text is also accepted (large_string is the declared preference so
# >2 GiB of text per block never overflows 32-bit offsets at scale).
PAGES_SCHEMA_SMALL_TEXT = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

LANG_DIM_SCHEMA = pa.schema([pa.field("lang", pa.string())])
DOMAIN_DIM_SCHEMA = pa.schema(
    [pa.field("domain", pa.string()), pa.field("category", pa.string())]
)

# Violation rows (FIXTURES.md §4); analog of the per-field error rows the
# reference materializes in synthetic_validation_demo.py:82-94.
VIOLATIONS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("check_id", pa.string()),
        pa.field("column", pa.string()),
        pa.field("observed", pa.string()),
        pa.field("expected", pa.string()),
        pa.field("fragment_id", pa.string()),
        pa.field("partition_id", pa.string()),
        # 'error' for per-check kernel-exception captures (the reference's
        # error-Observation semantics, elevation/service.py:246-279); null
        # for ordinary constraint violations.
        pa.field("kind", pa.string()),
    ]
)

# Per-partition pass/fail matrix (FIXTURES.md §4); analog of the summary
# matrix in /root/reference/biosample_enricher/metrics/reporter.py:28-443.
PASSFAIL_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.string()),
        pa.field("check_id", pa.string()),
        pa.field("passed", pa.bool_()),
        pa.field("n_violations", pa.int64()),
        pa.field("n_rows", pa.int64()),
    ]
)

# Plausible crawl window for warc_ts range checks (analog of lat/lon bounds,
# /root/reference/biosample_enricher/models.py:19-24, and provider date gates,
# marine/providers/noaa_oisst.py:80-84).
CRAWL_WINDOW_START = "2025-01-01T00:00:00"
CRAWL_WINDOW_END = "2025-07-01T00:00:00"

# RFC-ish URL shape (scheme://host/path) — analog of the collection_date regex
# constraint (models.py:25-29).
URL_REGEX = r"^https?://[A-Za-z0-9.-]+(:\d+)?(/[^\s]*)?$"
# ISO-639-1 two-letter code shape — analog of the database_source enum regex
# (models.py:38-40).
LANG_REGEX = r"^[a-z]{2}$"

# Columns that feed the per-row completeness score (analog of the derived
# location_completeness over 4 required fields, models.py:86-100).
COMPLETENESS_COLUMNS = ("url", "warc_ts", "text", "lang")

# Version stamp written into lineage records (analog of
# normalization_version on Observation, models.py:202-216).
SUITE_VERSION = "1"
