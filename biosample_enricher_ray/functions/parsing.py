"""Union-typed parsing, coalescing, and precision-classification kernels.

Engine recast of the reference's messy-input normalizers:

- ``parse_coords_any`` — the union-typed coordinate parser
  (/root/reference/biosample_enricher/adapters.py:109-147: ``lat_lon`` as
  ``"lat lon"`` / ``"lat,lon"`` string, ``{"latitude":..}`` dict-JSON, or
  ``[lat, lon]`` list-JSON) with the 5-strategy fallback-chain shape of the
  biosample→request mapper (biosample_elevation_mapper.py:19-122), fully
  vectorized: each strategy is one ``pc.extract_regex`` pass over the rows
  the earlier strategies failed to parse.
- ``coalesce_first`` — prioritized first-non-empty coalesce with null-ish
  token normalization (adapters.py:198-222 location-text coalesce +
  metrics/aligner.py:220-249 value normalizer).
- ``decimal_precision`` — min decimal places of numeric string reprs
  (adapters.py:355-368 coordinate-precision scorer).
- ``string_length_class`` — length→class enum (adapters.py:370-382
  date-precision day/month/year classifier).
- ``merge_field_wise`` — per-row best-quality value across candidate
  columns (weather/service.py:224-280 provider-result integration, J5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

NULLISH_TOKENS = ("", "null", "none", "n/a", "na", "unknown")


def retrim(values: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """RE2 ``\\s`` edge-trim — the single trim definition shared with every
    DuckDB oracle's ``regexp_replace(col, '^\\s+|\\s+$', '', 'g')``. Arrow
    and DuckDB both compile ``\\s`` with RE2, so engine and SQL strip the
    identical byte set; ``utf8_trim_whitespace`` (Unicode White_Space) and
    DuckDB ``trim()`` (spaces only) each silently diverge on edge
    tabs/newlines (ADVICE r4)."""
    return pc.replace_substring_regex(values, pattern=r"^\s+|\s+$",
                                      replacement="")

_COORD_PATTERNS = (
    # "12.5 -7.25" / "12.5, -7.25"
    r"^\s*(?P<lat>[-+]?\d+(?:\.\d+)?)\s*[,\s]\s*(?P<lon>[-+]?\d+(?:\.\d+)?)\s*$",
    # {"latitude": 12.5, "longitude": -7.25} — JSON objects are unordered,
    # so both key orders are strategies in the chain
    r'"latitude"\s*:\s*(?P<lat>[-+]?\d+(?:\.\d+)?).*?"longitude"\s*:\s*(?P<lon>[-+]?\d+(?:\.\d+)?)',
    r'"longitude"\s*:\s*(?P<lon>[-+]?\d+(?:\.\d+)?).*?"latitude"\s*:\s*(?P<lat>[-+]?\d+(?:\.\d+)?)',
    # [12.5, -7.25]  (JSON-ish list)
    r"^\s*\[\s*(?P<lat>[-+]?\d+(?:\.\d+)?)\s*,\s*(?P<lon>[-+]?\d+(?:\.\d+)?)\s*\]\s*$",
)


def parse_coords_any(values: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Union-typed "lat lon" parser: string / dict-JSON / list-JSON → two
    float64 columns (lat, lon), null where no strategy matches or the result
    is out of range (lat ∈ [-90, 90], lon ∈ [-180, 180] — models.py:19-24).

    Fallback chain: strategies run in priority order; a row takes the FIRST
    strategy that parses (vectorized — each pass only fills rows still
    null)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    n = len(values)
    lat = np.full(n, np.nan)
    lon = np.full(n, np.nan)
    for pattern in _COORD_PATTERNS:
        unfilled = np.isnan(lat)
        if not unfilled.any():
            break
        ext = pc.extract_regex(values, pattern)
        got_lat = pc.struct_field(ext, "lat")
        got_lon = pc.struct_field(ext, "lon")
        ok = pc.is_valid(got_lat).to_numpy(zero_copy_only=False) & unfilled
        if ok.any():
            lat_f = pc.cast(got_lat, pa.float64()).to_numpy(zero_copy_only=False)
            lon_f = pc.cast(got_lon, pa.float64()).to_numpy(zero_copy_only=False)
            lat[ok] = lat_f[ok]
            lon[ok] = lon_f[ok]
    out_of_range = (np.abs(lat) > 90) | (np.abs(lon) > 180)
    lat[out_of_range] = np.nan
    lon[out_of_range] = np.nan
    return pa.table(
        {
            "lat": pa.array(lat, pa.float64(), from_pandas=True),
            "lon": pa.array(lon, pa.float64(), from_pandas=True),
        }
    )


def normalize_nullish(values: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Strip whitespace; map null-ish tokens ('', null, none, n/a, na,
    unknown — case-insensitive) to null (metrics/aligner.py:236)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    trimmed = retrim(values)
    lowered = pc.utf8_lower(trimmed)
    nullish = pc.is_in(lowered, value_set=pa.array(NULLISH_TOKENS, pa.string()))
    return pc.if_else(pc.fill_null(nullish, True), pa.scalar(None, pa.string()),
                      trimmed)


def coalesce_first(batch: pa.Table, columns: list[str],
                   default: str | None = None) -> pa.Array:
    """First non-null, non-null-ish value across prioritized ``columns``
    (the 5-field location-text coalesce, adapters.py:198-222)."""
    normalized = [normalize_nullish(batch[c]) for c in columns]
    out = normalized[0]
    for col in normalized[1:]:
        out = pc.coalesce(out, col)
    if default is not None:
        out = pc.fill_null(out, default)
    return out


def decimal_precision(values: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Decimal places of a numeric-string column ('12.345' → 3, '7' → 0,
    null/unparseable → null). Reference: min decimal places of lat/lon
    string reprs as a quality score (adapters.py:355-368)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    ext = pc.extract_regex(values, r"^\s*[-+]?\d+(?:\.(?P<frac>\d+))?\s*$")
    frac = pc.struct_field(ext, "frac")
    num_ok = pc.is_valid(ext)
    n_dec = pc.utf8_length(pc.fill_null(frac, ""))
    return pc.if_else(num_ok, pc.cast(n_dec, pa.int32()),
                      pa.scalar(None, pa.int32()))


def string_length_class(
    values: pa.Array | pa.ChunkedArray,
    classes: dict[int, str],
    default: str = "unknown",
) -> pa.Array:
    """Length → class label ('2025-01-02' → day, '2025-01' → month,
    '2025' → year with classes {10: 'day', 7: 'month', 4: 'year'}) —
    the date-precision classifier (adapters.py:370-382)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    lens = pc.utf8_length(values)
    out = pc.if_else(pc.is_valid(values), pa.scalar(default, pa.string()),
                     pa.scalar(None, pa.string()))
    for length, label in classes.items():
        out = pc.if_else(pc.equal(lens, length), pa.scalar(label, pa.string()),
                         out)
    return out


def json_path_stats_batch(
    values: pa.Array | pa.ChunkedArray, max_depth: int = 8
) -> pa.Table:
    """Recursive JSON path walk → (path, vtype, n) partial counts per batch —
    the engine analog of the reference's recursive document walker + typeof
    classifier incl. NaN/Inf specials (schema_statistics.py:43-103, M22/M23).

    Per-row stdlib-json loop: this is a schema-PROFILING op run on samples
    or as a diagnostic, not a hot-path transform (the reference profiles 50k
    sampled docs, schema_inference.py:23). Downstream: groupby(path, vtype)
    sum — partial aggregation per batch keeps the exchange tiny.
    """
    import json
    import math
    from collections import Counter

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    counts: Counter = Counter()

    def typeof(v) -> str:
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            if math.isinf(v):
                return "inf"
            return "float"
        if isinstance(v, str):
            return "str"
        return type(v).__name__

    def walk(obj, path: str, depth: int) -> None:
        if depth > max_depth:
            counts[(path, "<max-depth>")] += 1
            return
        if isinstance(obj, dict):
            for k, v in obj.items():
                walk(v, f"{path}.{k}", depth + 1)
        elif isinstance(obj, list):
            for v in obj:
                walk(v, f"{path}[*]", depth + 1)
        else:
            counts[(path, typeof(obj))] += 1

    for v in values.to_pylist():
        if v is None:
            continue
        try:
            obj = json.loads(v)
        except (ValueError, TypeError):
            counts[("$", "<invalid>")] += 1
            continue
        walk(obj, "$", 0)

    paths = [p for p, _ in counts]
    vtypes = [t for _, t in counts]
    return pa.table(
        {
            "path": pa.array(paths, pa.string()),
            "vtype": pa.array(vtypes, pa.string()),
            "n": pa.array([counts[(p, t)] for p, t in zip(paths, vtypes)],
                          pa.int64()),
        }
    )


def merge_field_wise(
    batch: pa.Table,
    candidates: list[tuple[str, str]],
) -> pa.Table:
    """Per-row best-quality merge across provider candidates (J5,
    weather/service.py:224-280): ``candidates`` is a prioritized list of
    (value_column, quality_column); each row takes the value whose quality
    is highest (ties → first in list), nulls excluded. Returns
    (merged_value, merged_quality, winner) columns — no shuffle, pure
    same-row reduce."""
    n = len(batch)
    best_q = np.full(n, -np.inf)
    winner = np.full(n, -1, dtype=np.int64)
    for i, (_vc, qc) in enumerate(candidates):
        q = pc.fill_null(pc.cast(batch[qc], pa.float64()), -np.inf).to_numpy(
            zero_copy_only=False
        )
        valid = pc.is_valid(batch[candidates[i][0]]).to_numpy(zero_copy_only=False)
        q = np.where(valid, q, -np.inf)
        better = q > best_q
        best_q = np.where(better, q, best_q)
        winner = np.where(better, i, winner)
    merged = pa.nulls(n, batch[candidates[0][0]].type)
    for i, (vc, _qc) in enumerate(candidates):
        mask = pa.array(winner == i)
        merged = pc.if_else(mask, batch[vc].combine_chunks(), merged)
    quality = np.where(np.isfinite(best_q), best_q, np.nan)
    return pa.table(
        {
            "merged_value": merged,
            "merged_quality": pa.array(quality, pa.float64(), from_pandas=True),
            "winner": pa.array(np.where(winner < 0, None, winner),
                               pa.int64(), from_pandas=True),
        }
    )
