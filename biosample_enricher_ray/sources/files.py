"""File sources/sinks beyond parquet (SURVEY.md §2.1 S7–S9).

Reference analogs: the JSON file fetcher stub
(/root/reference/biosample_enricher/adapters.py:1068-1106) and the
JSON/JSONL/CSV result writers (cli_biosample_elevation.py:200-280). Parquet
stays the canonical interchange; JSON/CSV are for interop edges — note CSV
cannot carry the binary ``html`` column and JSON inflates it (documented
limitation, mirrored from the reference's format notes).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..schema import PAGES_SCHEMA


def read_pages_json(paths: list[str] | str) -> ray.data.Dataset:
    """Read a pages corpus from JSON/JSONL files, coercing to PAGES_SCHEMA.

    ``html`` is expected base64-less (utf-8 text) or absent in JSON inputs;
    timestamps are parsed from ISO strings.
    """
    ds = ray.data.read_json(paths)

    def coerce(t: pa.Table) -> pa.Table:
        cols = {}
        names = t.column_names
        cols["url"] = (
            pc.cast(t["url"], pa.string()) if "url" in names
            else pa.nulls(len(t), pa.string())
        )
        if "warc_ts" in names:
            ts = t["warc_ts"]
            if pa.types.is_timestamp(ts.type):
                cols["warc_ts"] = pc.cast(ts, pa.timestamp("us"))
            else:
                cols["warc_ts"] = pc.strptime(
                    pc.cast(ts, pa.string()), format="%Y-%m-%dT%H:%M:%S", unit="us",
                    error_is_null=True,
                )
        else:
            cols["warc_ts"] = pa.nulls(len(t), pa.timestamp("us"))
        if "html" in names:
            h = t["html"]
            cols["html"] = (
                pc.cast(h, pa.binary()) if not pa.types.is_string(h.type)
                else pc.cast(h, pa.string()).cast(pa.binary())
            )
        else:
            cols["html"] = pa.nulls(len(t), pa.binary())
        cols["text"] = (
            pc.cast(t["text"], pa.large_string()) if "text" in names
            else pa.nulls(len(t), pa.large_string())
        )
        cols["lang"] = (
            pc.cast(t["lang"], pa.string()) if "lang" in names
            else pa.nulls(len(t), pa.string())
        )
        return pa.table(cols, schema=PAGES_SCHEMA)

    return ds.map_batches(coerce, batch_format="pyarrow")


def write_outputs(ds: ray.data.Dataset, out_dir: str, fmt: str = "parquet") -> None:
    """Write a result Dataset as parquet / json(l) / csv (S8 sinks)."""
    if fmt == "parquet":
        ds.write_parquet(out_dir)
    elif fmt in ("json", "jsonl"):
        ds.write_json(out_dir)
    elif fmt == "csv":
        ds.write_csv(out_dir)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def fetch_by_ids_ordered(
    ds: ray.data.Dataset, ids: list, id_column: str
) -> "pa.Table":
    """Semi-join fetch by id list with original list order restored.

    Reference analog: the ``$in`` re-fetch that reorders results to match the
    requested id order (metrics/fetcher.py:88-99): broadcast id-set filter in
    the data plane, order restoration on the (small) result via an index map.
    Missing ids are dropped (the reference drops them too,
    metrics/fetcher.py:95-99).
    """
    id_arr = pa.array(ids)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_column], value_set=id_arr))

    small = pa.Table.from_pandas(
        ds.map_batches(keep, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )
    order = {v: i for i, v in enumerate(ids)}
    import numpy as np

    got = small[id_column].to_pylist()
    idx = np.argsort([order.get(v, len(order)) for v in got], kind="stable")
    return small.take(pa.array(idx, pa.int64()))
