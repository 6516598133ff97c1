"""Union-typed parsing / coalesce / precision / merge / JSON-walk kernels
(M2, M4, M7, M8, M19, M22/M23, J5 — see functions/parsing.py docstring)."""

import numpy as np
import pyarrow as pa

from biosample_enricher_ray.functions.parsing import (
    coalesce_first,
    decimal_precision,
    json_path_stats_batch,
    merge_field_wise,
    normalize_nullish,
    parse_coords_any,
    string_length_class,
)


def test_parse_coords_any_union_types():
    vals = pa.array([
        "12.5 -7.25",                                     # space-separated
        "12.5, -7.25",                                    # comma-separated
        '{"latitude": 48.1, "longitude": 11.5}',          # dict-JSON
        "[40.0, -70.0]",                                  # list-JSON
        "91.0 0.0",                                       # out of range
        "not coordinates",                                # unparseable
        None,
    ])
    out = parse_coords_any(vals)
    lat = out["lat"].to_pylist()
    lon = out["lon"].to_pylist()
    assert lat[:4] == [12.5, 12.5, 48.1, 40.0]
    assert lon[:4] == [-7.25, -7.25, 11.5, -70.0]
    assert lat[4] is None and lat[5] is None and lat[6] is None


def test_normalize_nullish_and_coalesce():
    t = pa.table({
        "a": pa.array([" N/A ", "x", None, "unknown"]),
        "b": pa.array(["fallback", "ignored", "  ", "also-null:none"]),
    })
    assert normalize_nullish(t["a"]).to_pylist() == [None, "x", None, None]
    picked = coalesce_first(t, ["a", "b"], default="dflt")
    assert picked.to_pylist() == ["fallback", "x", "dflt", "also-null:none"]


def test_decimal_precision():
    vals = pa.array(["12.345", "7", "-0.10", "1e5", None, "abc"])
    assert decimal_precision(vals).to_pylist() == [3, 0, 2, None, None, None]


def test_string_length_class_date_precision():
    vals = pa.array(["2025-01-02", "2025-01", "2025", "garbage!", None])
    out = string_length_class(vals, {10: "day", 7: "month", 4: "year"})
    assert out.to_pylist() == ["day", "month", "year", "unknown", None]


def test_merge_field_wise_best_quality():
    t = pa.table({
        "v1": pa.array(["a", None, "c", "d"]),
        "q1": pa.array([0.9, 0.5, 0.2, None]),
        "v2": pa.array(["x", "y", "z", "w"]),
        "q2": pa.array([0.8, 0.7, 0.4, 0.1]),
    })
    out = merge_field_wise(t, [("v1", "q1"), ("v2", "q2")])
    assert out["merged_value"].to_pylist() == ["a", "y", "z", "w"]
    assert out["winner"].to_pylist() == [0, 1, 1, 1]
    # null v1 excluded even with a quality score; null quality loses
    assert out["merged_quality"].to_pylist() == [0.9, 0.7, 0.4, 0.1]


def test_json_path_stats_recursive():
    vals = pa.array([
        '{"a": 1, "b": {"c": "x", "d": [1, 2.5, null]}}',
        '{"a": NaN}',
        "not json",
        None,
    ])
    out = json_path_stats_batch(vals)
    got = {(p, t): n for p, t, n in zip(out["path"].to_pylist(),
                                        out["vtype"].to_pylist(),
                                        out["n"].to_pylist())}
    assert got[("$.a", "int")] == 1
    assert got[("$.b.c", "str")] == 1
    assert got[("$.b.d[*]", "int")] == 1
    assert got[("$.b.d[*]", "float")] == 1
    assert got[("$.b.d[*]", "null")] == 1
    assert got[("$.a", "nan")] == 1  # NaN special (schema_statistics.py:50-57)
    assert got[("$", "<invalid>")] == 1


def test_sampling_variance_consistent(sf001_dir):
    import ray.data

    from biosample_enricher_ray.stages.shuffle import sampling_variance

    ds = ray.data.read_parquet(f"{sf001_dir}/events.parquet")
    out = sampling_variance(ds, "value", n_samples=3, frac=0.3, seed=5)
    assert len(out) == 3
    assert (out["n"] > 100).all()
    # i.i.d. samples of the same distribution: across-sample variance is tiny
    # relative to the value scale (~0-400)
    assert out["across_sample_variance"].iloc[0] < 100.0
