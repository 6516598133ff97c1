"""Sequence packing: concatenate-and-split span assignment at corpus scale.

The last step of a training-data pipeline turns a cleaned corpus into
fixed-length training sequences by concatenating documents in a canonical
order and splitting every ``seq_len`` tokens (GPT-style "concat and chunk").
The only global state the assignment needs is each document's *token offset*
— a prefix sum over the corpus — so the operator is a textbook two-phase
distributed scan, never a shuffle:

- **Phase 1** (parallel, one task per row-group): count whitespace tokens per
  row-group; return one scalar per row-group.
- **Driver**: exclusive prefix-sum over the row-group totals — O(row-groups)
  scalars, never rows.
- **Phase 2** (parallel): per-row-group token cumsum + the row-group's global
  offset → each doc's ``[start_seq, end_seq]`` span. Output is written/
  consumed per row-group, so the pass is embarrassingly parallel and
  resumable per partition.

Partitioning assumption (documented per the operator brief): the canonical
pack order is ``doc_id`` and rows are stored in ``doc_id`` order within and
across row-groups (phase 2 asserts per-group sortedness and the driver
asserts group ranges don't interleave — violations raise instead of silently
packing a different order). For an unordered corpus, sort once by doc_id
into partitioned parquet first (``ds.sort("doc_id").write_parquet``) and
pack the sorted output.

Reference analog: the reference processes its corpus in deterministic cursor
order (biosample_enricher/adapters.py fetch loops); the packing step itself
is new scope per the round-3 training-pipeline brief.
"""

from __future__ import annotations

import glob as _glob
import os as _os

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import ray

from ..functions.textstats import whitespace_token_count


def _row_group_fragments(path: "str | list[str]") -> list[tuple[str, int]]:
    """(path, row_group_index) work units in file/row-group order.

    ``path`` may be a single parquet file, a directory, a glob pattern, or an
    explicit list of files — a real sharded corpus is thousands of files, and
    the prefix-sum design is indifferent: a fragment is simply
    (file, row_group) and the canonical order is files sorted by path, then
    row groups in file order (the doc_id range-interleave assert below still
    guards the pack order across ALL files).
    """
    if (isinstance(path, str) and not _os.path.exists(path)
            and any(c in path for c in "*?[")):
        # only treat as a glob when it is NOT a literal existing path —
        # a real file named "run[2024]/docs.parquet" must open as a file
        matched = sorted(_glob.glob(path))
        if not matched:
            raise FileNotFoundError(f"pack input glob matched no files: {path}")
        path = matched
    dataset = pads.dataset(path, format="parquet")
    units: list[tuple[str, int]] = []
    for frag in sorted(dataset.get_fragments(), key=lambda f: f.path):
        for rg in frag.row_groups:
            units.append((frag.path, rg.id))
    return units


def _read_counts(path: str, row_group: int, text_column: str,
                 id_column: str) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, token_counts) for one row-group, pruned to two columns."""
    frag = next(
        f for f in pads.dataset(path, format="parquet").get_fragments()
        if f.path == path
    ).subset(row_group_ids=[row_group])
    t = frag.to_table(columns=[id_column, text_column])
    ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
    counts = whitespace_token_count(t[text_column]).to_numpy(
        zero_copy_only=False).astype(np.int64)
    if len(ids) > 1 and not (np.diff(ids) > 0).all():
        raise ValueError(
            f"pack order violated: {path} row-group {row_group} is not "
            f"strictly doc_id-sorted; sort the corpus before packing"
        )
    return ids, counts


@ray.remote
def _phase1_totals(path: str, row_group: int, text_column: str,
                   id_column: str) -> tuple[int, int, int]:
    """(min_id, max_id, total_tokens) for one row-group."""
    ids, counts = _read_counts(path, row_group, text_column, id_column)
    if len(ids) == 0:
        return (0, -1, 0)
    return (int(ids[0]), int(ids[-1]), int(counts.sum()))


@ray.remote
def _phase2_spans(path: str, row_group: int, text_column: str,
                  id_column: str, offset: int, seq_len: int,
                  id_cap: int | None) -> pd.DataFrame:
    """Per-doc packed spans for one row-group given its global token offset."""
    ids, counts = _read_counts(path, row_group, text_column, id_column)
    if len(ids) == 0:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "n_tokens": pd.Series([], dtype="int64"),
            "start_seq": pd.Series([], dtype="int64"),
            "end_seq": pd.Series([], dtype="int64"),
        })
    cum_before = offset + np.concatenate(([0], np.cumsum(counts)[:-1]))
    start_seq = cum_before // seq_len
    # an n-token doc occupies sequences [cum//S, (cum+n-1)//S]; a 0-token
    # doc occupies none — span sentinel -1
    end_seq = np.where(counts > 0, (cum_before + counts - 1) // seq_len, -1)
    start_seq = np.where(counts > 0, start_seq, -1)
    df = pd.DataFrame({
        "doc_id": ids,
        "n_tokens": counts,
        "start_seq": start_seq.astype(np.int64),
        "end_seq": end_seq.astype(np.int64),
    })
    if id_cap is not None:
        df = df[df["doc_id"] < id_cap]
    return df


def packed_sequence_spans(
    path: "str | list[str]",
    *,
    seq_len: int,
    text_column: str = "text",
    id_column: str = "doc_id",
    id_cap: int | None = None,
) -> tuple[pd.DataFrame, int]:
    """Assign every document its packed-sequence span; return
    ``(per_doc_spans, total_sequences)``.

    ``path`` accepts a file, directory, glob, or list of files (sharded
    corpus); spans are identical to packing the concatenated corpus as one
    file. ``id_cap`` bounds the *returned* frame (a reporting gate wants the first
    N docs, not 10^12 rows); the scan itself always covers the corpus. At
    production scale phase 2 would ``write_parquet`` per row-group instead
    of returning frames — the driver only ever holds O(row-groups) scalars
    either way.
    """
    units = _row_group_fragments(path)
    totals = ray.get([
        _phase1_totals.remote(p, rg, text_column, id_column)
        for p, rg in units
    ])
    # canonical order = doc_id: verify row-group ranges don't interleave
    last_max = -1
    for (p, rg), (lo, hi, _) in zip(units, totals):
        if hi < lo:  # empty group
            continue
        if lo <= last_max:
            raise ValueError(
                f"pack order violated: {p} row-group {rg} starts at doc_id "
                f"{lo} <= previous group max {last_max}"
            )
        last_max = hi
    grand_total = sum(t[2] for t in totals)
    offsets = np.concatenate(
        ([0], np.cumsum([t[2] for t in totals])[:-1])
    ).astype(np.int64)
    parts = ray.get([
        _phase2_spans.remote(p, rg, text_column, id_column, int(off),
                             seq_len, id_cap)
        for (p, rg), off in zip(units, offsets)
    ])
    spans = pd.concat(parts, ignore_index=True).sort_values(
        "doc_id").reset_index(drop=True)
    total_sequences = -(-grand_total // seq_len) if grand_total else 0
    return spans, int(total_sequences)
