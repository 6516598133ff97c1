"""Global window functions (ROW_NUMBER / NTILE) at corpus scale.

A global ``ROW_NUMBER() OVER (ORDER BY keys)`` is Ray Data's ``sort`` plus a
distributed block-offset prefix sum: the sort's range-partition exchange
leaves the output blocks in global key order, so each block needs exactly ONE
scalar — the number of rows in every block before it — to turn a local
``arange`` into global row numbers. Phase 1 reads each sorted block's length
(O(blocks) scalars to the driver, never rows), the driver does an exclusive
prefix sum, and phase 2 attaches the numbers per block, embarrassingly
parallel. This is the same two-phase distributed-scan shape as
``stages/packing.py`` (token-offset prefix sum), applied to row counts.

NTILE is then a pure per-row function of (row_number, total_rows): SQL's
bucket rule gives the first ``total % n`` buckets ``ceil(total/n)`` rows and
the rest ``floor(total/n)`` — vectorized here to match ``NTILE()`` exactly.

Scale notes: a global window is inherently a full-barrier sort; the driver
holds O(blocks) integers, blocks stay in the object store throughout, and
the attachment pass is one zero-copy column append per block. Reference
analog: the reference's only global ordering is its deterministic report
sort (schema_statistics.py:152, SURVEY §2.7 O6); global ranking itself is
new scope per the training-pipeline brief (quantile bucketing / curriculum
ordering over a cleaned corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _block_len(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _attach_row_numbers(t: pa.Table, offset: int, total: int,
                        n_tiles: int | None) -> pa.Table:
    """Append 1-based ``row_number`` (and ``tile`` when requested) to one
    sorted block given its global row offset."""
    rn = offset + 1 + np.arange(t.num_rows, dtype=np.int64)
    out = t.append_column("row_number", pa.array(rn, pa.int64()))
    if n_tiles is not None:
        out = out.append_column(
            "tile", pa.array(ntile_of(rn, total, n_tiles), pa.int64()))
    return out


def ntile_of(row_number: np.ndarray, total: int, n_tiles: int) -> np.ndarray:
    """SQL NTILE bucket (1-based) for 1-based row numbers: the first
    ``total % n_tiles`` buckets hold ``total // n_tiles + 1`` rows each."""
    r0 = row_number.astype(np.int64) - 1  # 0-based rank
    size = total // n_tiles
    rem = total % n_tiles
    big_span = rem * (size + 1)
    in_big = r0 < big_span
    tile = np.where(
        in_big,
        r0 // max(size + 1, 1),
        rem + (r0 - big_span) // max(size, 1),
    )
    return tile.astype(np.int64) + 1


def global_row_numbers(
    ds: ray.data.Dataset,
    sort_keys: list[str],
    *,
    descending: bool | list[bool] = False,
    n_tiles: int | None = None,
    target_blocks: int | None = None,
) -> ray.data.Dataset:
    """Attach a global 1-based ``row_number`` (and optional ``tile``) column
    ordered by ``sort_keys``.

    Null ordering follows Ray Data's sort; callers wanting SQL parity should
    filter or coalesce nulls in the sort keys first (the oracle-gated query
    does). Ties must be broken by including a unique key in ``sort_keys`` —
    otherwise row numbers among ties depend on the partitioning.

    ``target_blocks`` sizes the sort's range partitioning: Ray's sort
    exchanges O(in_blocks × out_blocks) objects, so a small input fragmented
    into many default blocks pays seconds of pure scheduling overhead.
    Callers that know the row count (parquet metadata) should pass
    ``max(4, rows // rows_per_block)`` — partitions scale with data, and the
    tiny-input case collapses to a handful of tasks.
    """
    if target_blocks is not None:
        ds = ds.repartition(target_blocks)
    sorted_ds = ds.sort(sort_keys, descending=descending)
    refs = sorted_ds.to_arrow_refs()  # sorted blocks, still in object store
    counts = ray.get([_block_len.remote(r) for r in refs])
    total = int(sum(counts))
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
    out_refs = [
        _attach_row_numbers.remote(r, int(off), total, n_tiles)
        for r, off in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(out_refs)
