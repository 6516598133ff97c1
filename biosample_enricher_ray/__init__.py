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
