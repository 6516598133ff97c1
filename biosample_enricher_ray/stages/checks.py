"""Declarative row-level constraint checks, compiled to vectorized Arrow kernels.

Engine recast of the reference's pydantic model constraints
(/root/reference/biosample_enricher/models.py:15-134 — range ge/le, regex
patterns, enum regexes, required fields, derived completeness) and of the
row-validator that materializes per-field error rows
(synthetic_validation_demo.py:46-115). Each check compiles to a function of a
``pyarrow.Table`` batch returning a boolean *violation mask*; the validator
stage (validator.py) turns masks into violation rows + pass/fail counts.

Checks are pure and stateless except ``ReferentialCheck``, whose value set is
broadcast once via ``ray.put`` and resolved in the validator actor's
``__init__`` (the reference's load-config-once singleton pattern,
host_detector.py:21-45).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import extract_domain

OBSERVED_MAX_LEN = 64


def _stringify(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Lossy human-readable rendering of offending values for violation rows."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        lens = pc.binary_length(arr)
        out = pc.binary_join_element_wise(
            pa.array(["<binary len="] * len(arr)), pc.cast(lens, pa.string()),
            pa.array([">"] * len(arr)), "",
        )
        return pc.if_else(pc.is_valid(arr), out, pa.scalar(None, pa.string()))
    s = pc.cast(arr, pa.string())
    return pc.utf8_slice_codeunits(s, 0, OBSERVED_MAX_LEN)


@dataclass
class RowCheck:
    """Base class: subclasses set ``check_id``/``column``/``expected`` and
    implement ``mask(batch) -> BooleanArray`` (True = violation)."""

    check_id: str = ""
    column: str = ""
    expected: str = ""

    def needs(self) -> list[str]:
        return [self.column]

    def compile(self, context: dict[str, Any]) -> None:  # noqa: ARG002
        """Resolve broadcast state; called once per validator actor."""
        return None

    def mask(self, batch: pa.Table) -> pa.Array:
        raise NotImplementedError

    def observed(self, batch: pa.Table, mask: pa.Array) -> pa.Array:
        """Stringified offending values (only materialized for violating rows)."""
        return _stringify(batch[self.column].combine_chunks().filter(mask))


def _as_bool_array(x) -> pa.Array:
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    return x


@dataclass
class NotNullCheck(RowCheck):
    """Required-field check (pydantic required fields; models.py:15-45)."""

    def __post_init__(self):
        self.check_id = self.check_id or f"not_null:{self.column}"
        self.expected = self.expected or "non-null"

    def mask(self, batch: pa.Table) -> pa.Array:
        return _as_bool_array(pc.is_null(batch[self.column]))


@dataclass
class NotEmptyCheck(RowCheck):
    """Null OR empty string/binary is a violation (whitespace-stripped empties
    mirror the reference's null-ish token mapping, metrics/aligner.py:236)."""

    def __post_init__(self):
        self.check_id = self.check_id or f"not_empty:{self.column}"
        self.expected = self.expected or "non-null, non-empty"

    def mask(self, batch: pa.Table) -> pa.Array:
        col = batch[self.column]
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            empty = pc.equal(pc.binary_length(col), 0)
        else:
            # empty-after-\s-trim ⟺ contains no \S: RE2 stops at the first
            # non-whitespace byte (~O(1)/row) instead of rewriting the whole
            # string — this was the suite's single hottest kernel (2.4 µs/row
            # of a 9.6 µs/row total). Same \s set as the oracle's
            # regexp_replace-trim (see functions.parsing.retrim).
            empty = pc.invert(pc.match_substring_regex(col, r"\S"))
        return _as_bool_array(pc.or_kleene(pc.is_null(col), pc.fill_null(empty, True)))


@dataclass
class RangeCheck(RowCheck):
    """Numeric / timestamp range-plausibility (lat/lon ge/le bounds,
    models.py:19-24; provider date gates, noaa_oisst.py:80-84). Nulls pass —
    nullability is NotNullCheck's job."""

    lo: Any = None
    hi: Any = None

    def __post_init__(self):
        self.check_id = self.check_id or f"range:{self.column}"
        self.expected = self.expected or f"in [{self.lo}, {self.hi}]"

    def mask(self, batch: pa.Table) -> pa.Array:
        col = batch[self.column]
        bad = None
        if self.lo is not None:
            bad = pc.less(col, pa.scalar(self.lo, col.type))
        if self.hi is not None:
            over = pc.greater(col, pa.scalar(self.hi, col.type))
            bad = over if bad is None else pc.or_(bad, over)
        return _as_bool_array(pc.fill_null(bad, False))


@dataclass
class RegexCheck(RowCheck):
    """Format check via RE2 (collection_date pattern, models.py:25-29;
    database_source enum regex, models.py:38-40). Nulls pass."""

    pattern: str = ""

    def __post_init__(self):
        self.check_id = self.check_id or f"regex:{self.column}"
        self.expected = self.expected or f"matches {self.pattern}"

    def mask(self, batch: pa.Table) -> pa.Array:
        ok = pc.match_substring_regex(batch[self.column], self.pattern)
        return _as_bool_array(pc.fill_null(pc.invert(ok), False))


@dataclass
class LengthRangeCheck(RowCheck):
    """len(text)/len(html) plausibility bounds (SURVEY.md §7.1 check 2)."""

    lo: int = 0
    hi: int = 1 << 62

    def __post_init__(self):
        self.check_id = self.check_id or f"len_range:{self.column}"
        self.expected = self.expected or f"length in [{self.lo}, {self.hi}]"

    def mask(self, batch: pa.Table) -> pa.Array:
        col = batch[self.column]
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            ln = pc.binary_length(col)
        else:
            ln = pc.utf8_length(col)
        bad = pc.or_(pc.less(ln, self.lo), pc.greater(ln, self.hi))
        return _as_bool_array(pc.fill_null(bad, False))

    def observed(self, batch: pa.Table, mask: pa.Array) -> pa.Array:
        col = batch[self.column].combine_chunks().filter(mask)
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            ln = pc.binary_length(col)
        else:
            ln = pc.utf8_length(col)
        return pc.cast(ln, pa.string())


@dataclass
class EnumCheck(RowCheck):
    """Value ∈ small inline set (database_source ∈ {NMDC, GOLD},
    models.py:38-40). Nulls pass."""

    values: tuple = ()

    def __post_init__(self):
        self.check_id = self.check_id or f"enum:{self.column}"
        self.expected = self.expected or f"in {sorted(self.values)[:8]}"
        self._value_set = pa.array(sorted(self.values), pa.string())

    def mask(self, batch: pa.Table) -> pa.Array:
        ok = pc.is_in(batch[self.column], value_set=self._value_set)
        return _as_bool_array(pc.and_(pc.invert(ok), pc.is_valid(batch[self.column])))


@dataclass
class CacheabilityCheck(RowCheck):
    """Cacheability gate (F5): a fetched row may be persisted to the cache /
    checkpoint store only when its status is an allowed success code AND its
    body is not a disguised error payload (http_cache.py:55-66 — the
    reference rejects 200s from googleapis whose JSON body carries an
    ``error``/``error_message`` field). Violation = NOT cacheable.

    ``column`` is the status-code column; ``body_column`` the payload text;
    ``gate_url_pattern`` (optional, with ``url_column``) restricts the
    error-body sniff to matching providers, as the reference does."""

    body_column: str = ""
    url_column: str = ""
    ok_statuses: tuple = (200,)
    error_pattern: str = r'"error"\s*:|"error_message"\s*:'
    gate_url_pattern: str = ""

    def __post_init__(self):
        self.check_id = self.check_id or f"cacheable:{self.column}"
        self.expected = self.expected or (
            f"status in {sorted(self.ok_statuses)} and no error body")

    def needs(self) -> list[str]:
        cols = [self.column]
        if self.body_column:
            cols.append(self.body_column)
        if self.gate_url_pattern and self.url_column:
            cols.append(self.url_column)
        return cols

    def mask(self, batch: pa.Table) -> pa.Array:
        status = batch[self.column]
        ok_set = pa.array(
            sorted(self.ok_statuses),
            status.type if pa.types.is_integer(status.type) else pa.int64())
        bad = pc.invert(pc.fill_null(pc.is_in(status, value_set=ok_set), False))
        if self.body_column:
            err = pc.fill_null(
                pc.match_substring_regex(batch[self.body_column],
                                         self.error_pattern), False)
            if self.gate_url_pattern and self.url_column:
                gated = pc.fill_null(
                    pc.match_substring_regex(batch[self.url_column],
                                             self.gate_url_pattern), False)
                err = pc.and_(err, gated)
            bad = pc.or_(bad, err)
        return _as_bool_array(bad)


def cacheable_mask(batch: pa.Table, check: "CacheabilityCheck") -> pa.Array:
    """Keep-mask (True = safe to persist) for use as a pre-sink filter:
    ``ds.map_batches(lambda t: t.filter(cacheable_mask(t, check)))``."""
    return _as_bool_array(pc.invert(check.mask(batch)))


def dim_content_digest(dim: pa.Array | pa.ChunkedArray) -> str:
    """Content digest of a dimension array (buffer bytes + length) — stored
    in ``ReferentialCheck.dim_digest`` so the resume fingerprint detects dim
    CONTENT edits (inline YAML ``values`` or a changed parquet dim), not just
    spec-shape edits."""
    import hashlib

    if isinstance(dim, pa.ChunkedArray):
        dim = dim.combine_chunks()
    h = hashlib.sha256()
    h.update(str(len(dim)).encode())
    for buf in dim.buffers():
        if buf is not None:
            h.update(memoryview(buf))
    return h.hexdigest()[:16]


@dataclass
class ReferentialCheck(RowCheck):
    """Key ∈ dimension table — broadcast semi-join complement.

    Reference analog: GOLD biosample → seq_projects lookup
    (adapters.py:610-640); missing keys become violation rows (the anti-join
    the reference only has implicitly, metrics/fetcher.py:95-99).

    ``dim_ref`` is a ``ray.ObjectRef`` to a ``pa.Array`` of valid keys,
    ``ray.put`` once on the driver and resolved per actor in ``compile`` —
    broadcast, never re-shipped per batch. ``key_fn`` optionally derives the
    key column (e.g. url → domain). ``dim_digest`` fingerprints the dim's
    CONTENT for checkpoint resume (auto-computed when ``dim_ref`` is a
    concrete array; the suite compiler sets it before ``ray.put``; callers
    who hand in a bare ObjectRef and later edit the dim behind the same
    spec should set it themselves or bump SUITE_VERSION).
    """

    dim_ref: Any = None  # ray.ObjectRef | pa.Array (tests)
    key_fn: str | None = None  # None | "domain"
    dim_digest: str = ""
    _value_set: pa.Array | None = field(default=None, repr=False)

    def __post_init__(self):
        self.check_id = self.check_id or f"referential:{self.column}"
        self.expected = self.expected or "key present in dimension table"
        if not self.dim_digest and isinstance(
            self.dim_ref, (pa.Array, pa.ChunkedArray)
        ):
            self.dim_digest = dim_content_digest(self.dim_ref)

    def compile(self, context: dict[str, Any]) -> None:
        import ray

        dim = self.dim_ref
        if isinstance(dim, ray.ObjectRef):
            dim = ray.get(dim)
        if isinstance(dim, pa.ChunkedArray):
            dim = dim.combine_chunks()
        if not isinstance(dim, pa.Array):
            dim = pa.array(list(dim), pa.string())
        self._value_set = dim

    def _keys(self, batch: pa.Table) -> pa.Array:
        col = batch[self.column].combine_chunks()
        if self.key_fn == "domain":
            return extract_domain(col)
        return col

    def mask(self, batch: pa.Table) -> pa.Array:
        if self._value_set is None:
            self.compile({})
        keys = self._keys(batch)
        ok = pc.is_in(keys, value_set=self._value_set)
        # null-derived keys (unparseable urls) are RegexCheck's problem
        return _as_bool_array(pc.and_(pc.invert(ok), pc.is_valid(keys)))

    def observed(self, batch: pa.Table, mask: pa.Array) -> pa.Array:
        return _stringify(self._keys(batch).filter(mask))


@dataclass
class CrossFieldCheck(RowCheck):
    """if_column non-empty ⇒ then_column non-null (before/after field-pair
    consistency, metrics/aligner.py:156-218; FIXTURES.md cross-field rows)."""

    if_column: str = ""
    then_column: str = ""

    def __post_init__(self):
        self.column = self.column or self.then_column
        self.check_id = self.check_id or f"cross:{self.if_column}->{self.then_column}"
        self.expected = self.expected or (
            f"{self.then_column} non-null when {self.if_column} non-empty"
        )

    def needs(self) -> list[str]:
        return [self.if_column, self.then_column]

    def mask(self, batch: pa.Table) -> pa.Array:
        cond = batch[self.if_column]
        if pa.types.is_string(cond.type) or pa.types.is_large_string(cond.type):
            nonempty = pc.and_(pc.is_valid(cond),
                               pc.fill_null(pc.greater(pc.utf8_length(cond), 0), False))
        else:
            nonempty = pc.is_valid(cond)
        return _as_bool_array(pc.and_(nonempty, pc.is_null(batch[self.then_column])))

    def observed(self, batch: pa.Table, mask: pa.Array) -> pa.Array:
        n = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
        return pa.array(["null"] * n, pa.string())


def completeness_column(batch: pa.Table, columns: tuple[str, ...]) -> pa.Array:
    """Per-row completeness = fraction of non-null among ``columns``.

    Engine analog of the derived location_completeness score over the four
    required fields (models.py:86-100), vectorized over pc.is_valid masks.
    """
    acc = np.zeros(len(batch), dtype=np.float64)
    for c in columns:
        acc += pc.cast(pc.is_valid(batch[c]), pa.int8()).to_numpy(zero_copy_only=False)
    return pa.array(acc / len(columns))


@dataclass
class CompletenessCheck(RowCheck):
    """Per-row completeness fraction below threshold ⇒ violation."""

    columns: tuple = ()
    threshold: float = 0.75

    def __post_init__(self):
        self.check_id = self.check_id or "completeness"
        self.column = self.column or ",".join(self.columns)
        self.expected = self.expected or f"completeness >= {self.threshold}"

    def needs(self) -> list[str]:
        return list(self.columns)

    def mask(self, batch: pa.Table) -> pa.Array:
        score = completeness_column(batch, self.columns)
        return _as_bool_array(pc.less(score, self.threshold))

    def observed(self, batch: pa.Table, mask: pa.Array) -> pa.Array:
        score = completeness_column(batch, self.columns)
        return pc.cast(score.filter(mask), pa.string())


@dataclass
class SchemaCheck(RowCheck):
    """Declared-schema assertion per batch/fragment.

    Inversion of the reference's genson schema *inference*
    (schema_inference.py:44-58): the schema is declared, drift is a violation.
    Emits a single batch-level violation row (url=null) when names/types
    mismatch; permissive about string vs large_string.
    """

    declared: pa.Schema | None = None

    def __post_init__(self):
        self.check_id = self.check_id or "schema"
        self.column = self.column or "*"
        self.expected = self.expected or "batch schema == declared schema"

    def needs(self) -> list[str]:
        return []  # sees whatever the validator sees

    @staticmethod
    def _norm(t: pa.DataType) -> pa.DataType:
        if pa.types.is_large_string(t):
            return pa.string()
        if pa.types.is_large_binary(t):
            return pa.binary()
        return t

    def mismatches(self, schema: pa.Schema) -> list[str]:
        got = {f.name: self._norm(f.type) for f in schema}
        problems = []
        for f in self.declared:
            if f.name not in got:
                problems.append(f"missing column {f.name}")
            elif got[f.name] != self._norm(f.type):
                problems.append(f"{f.name}: {got[f.name]} != {f.type}")
        return problems

    def mask(self, batch: pa.Table) -> pa.Array:
        # handled specially by the validator (batch-level, not row-level)
        raise NotImplementedError("SchemaCheck is batch-level")
