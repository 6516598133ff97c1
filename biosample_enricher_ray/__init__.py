"""biosample_enricher_ray — a Ray-Data-native schema + constraint validation engine.

A from-scratch re-expression of the QC semantics of
contextualizer-ai/biosample-enricher (see /root/reference, SURVEY.md) as
declarative constraint suites over a Parquet corpus of Common-Crawl-style web
pages ``pages(url, warc_ts, html, text, lang)``, built on ``ray.data.Dataset``
pipelines: zero-copy Arrow ``map_batches`` kernels for row-level checks, actor
pools for compiled-suite/sketch stages, hash-partitioned ``groupby`` for
uniqueness, broadcast semi-joins for referential checks, and mergeable
HLL/TDigest sketches for corpus profiling.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (bench.py, CLI, test fixture, or the evaluation driver).
"""

__version__ = "0.1.0"

# Quiet Ray Data's benign per-block 'Failed to hash the schemas' warning in
# EVERY process that loads this package (driver and workers alike): parquet
# written via pandas carries b'pandas' schema metadata that pyarrow cannot
# hash, so Ray's schema-dedup fast path warns and falls back — harmless, but
# at one line per block it drowns real errors in bench/driver logs.
import logging as _logging

_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).setLevel(_logging.ERROR)
