"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship constraint-suite validation over the sf0.001
testdata; ``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (plus the training-data operators); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query, with column names and
rounding matched exactly.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: derive the pages view,
    run the full constraint suite (row checks + profile sketches +
    uniqueness), return the per-check summary matrix."""
    from biosample_enricher_ray.pipelines.queries import pages_validation_summary

    return pages_validation_summary("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from biosample_enricher_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from biosample_enricher_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
