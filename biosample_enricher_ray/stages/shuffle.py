"""Skew-aware shuffle helpers: salted grouped counting, skew detection.

The north_rule requires explicit skew handling for hot keys (hot domains in a
web corpus follow a zipf law — the synthetic corpus plants them,
sources/synthetic.py). The pattern (FP-Hadoop-style skew splitting,
PAPERS.md): split each hot key's rows across S salt buckets, partially
aggregate per (key, salt), then merge the S partials per key in a second,
tiny exchange. The first shuffle's largest group shrinks by ~S×.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ..functions.hashing import hash64


def salted_group_count(
    ds: ray.data.Dataset, key_column: str, salt: int = 8
) -> ray.data.Dataset:
    """Grouped count with salted two-level aggregation → (key, n).

    Equivalent to ``ds.groupby(key).count()`` but the heavy exchange groups on
    ``(key, __salt)`` so a hot key's rows spread over ``salt`` reducers; the
    second groupby only merges ``salt`` partial rows per key.
    """

    def add_salt_and_precount(t: pa.Table) -> pa.Table:
        # null keys break sort-based groupby partitioning and carry no count
        # semantics — drop them here (nullability is a NotNullCheck concern)
        keys = t[key_column].combine_chunks().drop_null()
        salts = (hash64(keys) % np.uint64(salt)).astype(np.int32)
        pre = pa.table({key_column: keys, "__salt": pa.array(salts)})
        # combiner: collapse within the batch first; rename BY NAME — pyarrow
        # versions differ on whether key columns precede the aggregate column
        g = pre.group_by([key_column, "__salt"]).aggregate([([], "count_all")])
        return g.rename_columns(
            ["n" if c == "count_all" else c for c in g.column_names]
        )

    partial = (
        ds.select_columns([key_column])
        .map_batches(add_salt_and_precount, batch_format="pyarrow")
        .groupby([key_column, "__salt"])
        .aggregate(Sum("n", alias_name="n"))
    )
    merged = (
        partial.groupby(key_column)
        .aggregate(Sum("n", alias_name="n"))
    )
    return merged


def deterministic_group_cap(
    ds: ray.data.Dataset,
    key_column: str,
    *,
    k: int,
    rank_columns: list[str],
    ascending: list[bool],
) -> ray.data.Dataset:
    """Keep at most ``k`` rows per key, chosen deterministically by rank
    order — the per-domain cap / stratified-sample operator of a
    training-data pipeline ("at most k docs per source, prefer the longest";
    SQL twin: ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ranks) <= k``).

    Scale shape: a map-side PARTIAL cap first — each batch keeps at most k
    rows per key it contains (one vectorized mergesort + per-group
    cumcount), because a row outside its batch's local top-k can never be in
    the global top-k. The shuffle therefore moves at most k rows per
    (key, map task) regardless of group size; the ``groupby(key)`` reducer
    re-applies the identical rank over the survivors. A zipf-hot key ships
    k × n_tasks rows, never its full group — no salting needed because the
    combiner is the cap itself.

    Rank order must be total for determinism: include a unique tie-break
    column (e.g. the id) in ``rank_columns``. Null keys must be dropped
    upstream (Ray's sort-based groupby partitioning raises on null keys —
    same contract as salted_group_count).
    """
    if len(rank_columns) != len(ascending):
        raise ValueError("rank_columns and ascending must align")

    def partial_cap(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        # mergesort = stable; with a unique tie-break column the order is
        # total, so stability is belt-and-braces, not load-bearing
        df = df.sort_values(
            [key_column] + rank_columns,
            ascending=[True] + list(ascending),
            kind="mergesort",
        )
        rn = df.groupby(key_column, sort=False).cumcount()
        return df[rn.to_numpy() < k]

    def final_cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(rank_columns, ascending=list(ascending),
                          kind="mergesort")
        return g.head(k).reset_index(drop=True)

    return (
        ds.map_batches(partial_cap, batch_format="pandas")
        .groupby(key_column)
        .map_groups(final_cap, batch_format="pandas")
    )


def recommend_join_salt(
    ds: ray.data.Dataset,
    key_column: str,
    *,
    num_buckets: int | None = None,
    sample_frac: float = 0.05,
    max_salt: int = 16,
) -> int:
    """Adaptive salt factor for :func:`shuffle_hash_join`: probe the key
    distribution with the skew sampler and return the salt that levels the
    hottest key's reducer down to an average bucket's share.

    The estimate is the hot key's share of rows divided by a fair 1/buckets
    share, rounded up — a key holding 3 fair-buckets' worth of rows gets
    salt≈3 (its reducer shrinks ~3×; the narrow right side replicates 3×).
    Returns 1 (no salting) when no key exceeds a fair share: salting is
    pure overhead on balanced keys (the measured salt-bench finding).
    Sampling cost is one pass over ``sample_frac`` of the key column —
    negligible next to the join it tunes.
    """
    import ray

    if num_buckets is None:
        num_buckets = max(4, int(ray.cluster_resources().get("CPU", 4)))

    # ONE sampling pass yields both the hot-key count and the valid-key
    # total (ratio of same-sample estimates — sample_frac cancels). Null
    # keys never shuffle (inner joins drop them; outer joins spread them
    # round-robin), so they are excluded from BOTH numerator and
    # denominator; no ds.count() (which re-executes non-trivial lineage
    # and, over all rows incl. nulls, under-salts null-heavy columns).
    counts = _sampled_key_counts(ds, key_column, sample_frac, drop_nulls=True)
    if counts.empty:
        return 1
    total = float(counts["n"].sum())
    if total <= 0:
        return 1
    hot_share = float(counts["n"].max()) / total
    fair_share = 1.0 / num_buckets
    if hot_share <= fair_share:
        return 1
    return int(min(max_salt, int(np.ceil(hot_share / fair_share))))


def parquet_key_uniqueness(
    paths: list[str], column: str, *, num_buckets: int | None = None,
    files_per_task: int = 2,
) -> pd.DataFrame:
    """Exact duplicate keys over parquet fragments via an explicit hash shuffle.

    Ray Data's sort-based groupby pays a per-row Python-coordinated sort that
    dwarfs this workload (measured 14-34 s for 1.6M keys on this node); the
    Dataset API cannot express a plain hash-count exchange, so this is the
    documented raw-Ray fallback (task brief: "(c) raw Ray tasks/actors as a
    last resort — document the partitioning assumption").

    Partitioning assumption: keys are hashed with a process-stable 64-bit
    hash; bucket b = hash >> (64 - log2(B)). Phase 1 maps fragments →
    per-bucket hash arrays (numpy, no strings shipped); phase 2 reduces each
    bucket with np.unique to find duplicate *hashes*; phase 3 re-scans only
    fragments' rows whose hash is a duplicate candidate and counts the actual
    key strings exactly (hash collisions resolved — correctness never relies
    on hash uniqueness). Shuffle volume: 8 bytes/row, then ~0 for phase 3.

    Returns DataFrame(key, n) for keys with n > 1.
    """
    import ray

    if num_buckets is None:
        num_buckets = max(4, int(ray.cluster_resources().get("CPU", 4)))
    bits = max(1, int(np.ceil(np.log2(num_buckets))))
    num_buckets = 1 << bits
    shift = np.uint64(64 - bits)

    chunks = [paths[i : i + files_per_task] for i in range(0, len(paths), files_per_task)]

    @ray.remote
    def map_hashes(files: list[str]) -> list[np.ndarray]:
        import pyarrow.parquet as pq

        hs = []
        for f in files:
            col = pq.read_table(f, columns=[column])[column].combine_chunks().drop_null()
            hs.append(hash64(col))
        h = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        buckets = (h >> shift).astype(np.int64)
        order = np.argsort(buckets, kind="stable")
        h, buckets = h[order], buckets[order]
        bounds = np.searchsorted(buckets, np.arange(num_buckets + 1))
        return [h[bounds[b] : bounds[b + 1]] for b in range(num_buckets)]

    @ray.remote
    def reduce_bucket(*parts: np.ndarray) -> np.ndarray:
        h = np.concatenate(parts) if parts else np.empty(0, np.uint64)
        if h.size == 0:
            return np.empty(0, np.uint64)
        vals, counts = np.unique(h, return_counts=True)
        return vals[counts > 1]

    map_refs = [map_hashes.options(num_returns=num_buckets).remote(c) for c in chunks]
    if num_buckets == 1:
        map_refs = [[r] for r in map_refs]
    dup_refs = [
        reduce_bucket.remote(*[m[b] for m in map_refs]) for b in range(num_buckets)
    ]
    dup_hashes = np.concatenate(ray.get(dup_refs)) if dup_refs else np.empty(0, np.uint64)
    if dup_hashes.size == 0:
        return pd.DataFrame({column: pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64")})

    dup_set_ref = ray.put(np.sort(dup_hashes))

    @ray.remote
    def fetch_candidates(files: list[str]) -> pd.DataFrame:
        import pyarrow.parquet as pq

        dup_sorted = ray.get(dup_set_ref)
        frames = []
        for f in files:
            col = pq.read_table(f, columns=[column])[column].combine_chunks().drop_null()
            h = hash64(col)
            pos = np.searchsorted(dup_sorted, h)
            pos[pos >= dup_sorted.size] = dup_sorted.size - 1
            mask = dup_sorted[pos] == h
            if mask.any():
                keys = col.filter(pa.array(mask))
                frames.append(pd.DataFrame({column: keys.to_pandas()}))
        if not frames:
            return pd.DataFrame({column: pd.Series(dtype=object)})
        return pd.concat(frames, ignore_index=True)

    cand = pd.concat(ray.get([fetch_candidates.remote(c) for c in chunks]),
                     ignore_index=True)
    counts = cand.groupby(column, sort=True).size()
    counts = counts[counts > 1]
    return pd.DataFrame({column: counts.index.to_numpy(), "n": counts.to_numpy()})


def shuffle_semi_join_complement(
    fact_ds: ray.data.Dataset,
    fact_key: str,
    dim_ds: ray.data.Dataset,
    dim_key: str,
    *,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Referential check via SHUFFLE semi-join — the large-dimension path.

    The broadcast path (stages/checks.py ReferentialCheck) assumes the
    dimension fits in every actor; a web-scale domain dimension (100M+
    registered domains, SURVEY.md §2.5 J1 / adapters.py:610-640) does not.
    Here BOTH sides are hash-partitioned on the join key (key column only —
    8–16 bytes/row leaves the workers, never the fact rows) and each bucket
    counts fact keys absent from the dimension. Exact: the actual key values
    are shipped, bucketed by a process-stable hash, so no collision can
    produce a wrong verdict.

    Returns DataFrame(n_orphans, n_rows): orphan fact ROWS (multiplicity
    counted, null keys pass — NotNullCheck's job) and total fact rows.
    """
    import ray

    if num_buckets is None:
        num_buckets = max(4, int(ray.cluster_resources().get("CPU", 4)))
    bits = max(1, int(np.ceil(np.log2(num_buckets))))
    num_buckets = 1 << bits
    shift = np.uint64(64 - bits)

    @ray.remote
    def map_side(t: pa.Table, col: str) -> list[pa.Array]:
        keys = t[col].combine_chunks().drop_null()
        h = hash64(keys)
        bucket = (h >> shift).astype(np.int64)
        order = np.argsort(bucket, kind="stable")
        keys = keys.take(pa.array(order))
        bounds = np.searchsorted(bucket[order], np.arange(num_buckets + 1))
        return [keys.slice(bounds[b], bounds[b + 1] - bounds[b])
                for b in range(num_buckets)]

    @ray.remote
    def reduce_bucket(n_fact_parts: int, *parts: pa.Array) -> int:
        fact_parts = [p for p in parts[:n_fact_parts] if len(p)]
        dim_parts = [p for p in parts[n_fact_parts:] if len(p)]
        if not fact_parts:
            return 0
        fact = pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
             for p in fact_parts]
        )
        if not dim_parts:
            return len(fact)
        dim = pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
             for p in dim_parts]
        )
        present = pc.is_in(fact, value_set=dim)
        return int(pc.sum(pc.cast(pc.invert(present), pa.int64())).as_py() or 0)

    # project to the join key BEFORE materializing refs: only 8-16 B/row key
    # blocks are pinned, never fact/dim payload columns (round 2 pinned the
    # whole fact side; at 100 TB that is corpus materialization)
    fact_refs = fact_ds.select_columns([fact_key]).to_arrow_refs()
    dim_refs = dim_ds.select_columns([dim_key]).to_arrow_refs()

    @ray.remote
    def block_len(t: pa.Table) -> int:
        return len(t)

    # total fact rows (incl. null keys) from the already-pinned key blocks —
    # no second execution of the fact pipeline
    n_rows = sum(ray.get([block_len.remote(b) for b in fact_refs]))
    fact_maps = [map_side.options(num_returns=num_buckets).remote(b, fact_key)
                 for b in fact_refs]
    dim_maps = [map_side.options(num_returns=num_buckets).remote(b, dim_key)
                for b in dim_refs]
    if num_buckets == 1:
        fact_maps = [[r] for r in fact_maps]
        dim_maps = [[r] for r in dim_maps]
    counts = ray.get([
        reduce_bucket.remote(
            len(fact_maps),
            *[m[b] for m in fact_maps],
            *[m[b] for m in dim_maps],
        )
        for b in range(num_buckets)
    ])
    return pd.DataFrame({"n_orphans": [int(sum(counts))], "n_rows": [int(n_rows)]})


def _slice_by_bucket(t: pa.Table, bucket: np.ndarray,
                     n_parts: int) -> list[pa.Table]:
    """Partition a table into ``n_parts`` zero-copy slices by precomputed
    bucket ids: one stable argsort + searchsorted bounds — the shared
    map-side routing of every explicit hash exchange in this module."""
    order = np.argsort(bucket, kind="stable")
    t = t.take(pa.array(order))
    bounds = np.searchsorted(bucket[order], np.arange(n_parts + 1))
    return [t.slice(bounds[b], bounds[b + 1] - bounds[b])
            for b in range(n_parts)]


def _spread_rows(parts: list[pa.Table], extra: pa.Table) -> list[pa.Table]:
    """Round-robin-spread match-nothing rows (null join keys) across ALL
    parts: any reducer can null-fill them, and pinning them to one part
    would make a null-heavy column a single-reducer hotspot."""
    n_parts = len(parts)
    step = -(-extra.num_rows // n_parts)
    out = []
    for b, p in enumerate(parts):
        chunk = extra.slice(b * step, step)
        out.append(pa.concat_tables([chunk, p]) if chunk.num_rows else p)
    return out


def shuffle_hash_join(
    left_ds: ray.data.Dataset,
    left_key: str | list[str],
    right_ds: ray.data.Dataset,
    right_key: str | list[str],
    *,
    num_buckets: int | None = None,
    salt: int = 1,
    how: str = "inner",
    bloom_prefilter: bool = False,
    bloom_fp_rate: float = 0.01,
    bloom_n_expected: int | None = None,
) -> ray.data.Dataset:
    """General large×large equi-join producing joined rows — the
    missing fact⋈fact operator (round-3 VERDICT ask #6; reference analog J1,
    adapters.py:610-640, promoted from dimension scale to fact scale).

    Ray Data (2.49) has no distributed join primitive, so this is the
    documented raw-Ray fallback: both sides are hash-partitioned on the join
    key (bucket = hash64(key) >> shift — process-stable, same bucketing as
    parquet_key_uniqueness) and each bucket is joined locally with pyarrow's
    C++ hash-join kernel (``Table.join``). Co-location is guaranteed because
    equal keys hash equally on both sides; hash collisions are harmless (the
    in-bucket join compares real key values).

    Scale shape: ONLY the projected columns move (callers must
    ``select_columns`` both sides down to what the join output needs — a
    join that ships unused columns is wrong at 100 TB), and each side moves
    exactly once. ``how`` is ``"inner"`` (default) or ``"left"`` (left
    outer). Null join keys never match (SQL semantics); under ``"left"``
    null-key left rows are still kept — routed to one bucket and emitted
    with null right columns by the in-bucket left-outer join.

    Skew: one bucket holds every row of its keys; a zipf-hot key with large
    groups on BOTH sides makes that reducer the straggler. When the hot
    side's mate is unique-per-key (the fact⋈header case, lineitem⋈orders),
    pass ``salt > 1``: left rows spread round-robin over ``salt`` sub-buckets
    and right rows are REPLICATED to all ``salt`` sub-buckets — the classic
    salted replicated join; reducer input shrinks ~salt× on the left at the
    cost of salt× duplication of the (narrow) right side. Correct for any
    key multiplicities (replication never duplicates output pairs because
    each left row lands in exactly one sub-bucket).

    ``bloom_prefilter=True`` (inner joins only): one extra pass over the
    right side builds a Bloom filter of its key hashes (~1.2 bytes/key at
    1% FP), broadcast once; left map tasks drop non-member rows BEFORE the
    exchange — when most left rows have no match (selective joins), the
    shuffled volume drops to ~match-fraction of the left side. False
    positives only ship a few extra rows; the in-bucket join stays exact.

    Composite keys: pass lists for ``left_key``/``right_key`` (equal
    length). Bucketing mixes the per-column hashes (distinct odd-constant
    multiplies + XOR — collisions only affect balance, never correctness);
    a row with ANY null key component never matches, mirroring SQL.

    Payload column names must be disjoint across sides (pyarrow.join
    contract); the join keys survive once under the left names.
    """
    import ray

    left_keys = [left_key] if isinstance(left_key, str) else list(left_key)
    right_keys = ([right_key] if isinstance(right_key, str)
                  else list(right_key))
    if len(left_keys) != len(right_keys) or not left_keys:
        raise ValueError("left_key and right_key must align (>=1 column)")

    if how not in ("inner", "left", "full"):
        raise ValueError(f"how must be 'inner', 'left' or 'full', got {how!r}")
    if how == "full" and salt > 1:
        raise ValueError(
            "full outer join cannot use salt > 1: replicated right rows "
            "would emit their unmatched copies once per sub-bucket")
    if num_buckets is None:
        num_buckets = max(4, int(ray.cluster_resources().get("CPU", 4)))
    bits = max(1, int(np.ceil(np.log2(num_buckets))))
    num_buckets = 1 << bits
    shift = np.uint64(64 - bits)
    salt = max(1, int(salt))
    n_parts = num_buckets * salt
    join_type = {"inner": "inner", "left": "left outer",
                 "full": "full outer"}[how]
    if bloom_prefilter and how != "inner":
        raise ValueError(
            "bloom_prefilter requires an inner join: outer joins must keep "
            "non-matching rows")

    def _mixed_hash(t: pa.Table, cols: list[str]) -> np.ndarray:
        h = hash64(t[cols[0]].combine_chunks())
        for i, c in enumerate(cols[1:], start=1):
            # mix composite keys: distinct odd multipliers then XOR
            h = h ^ (hash64(t[c].combine_chunks())
                     * np.uint64(0x9E3779B97F4A7C15 + 2 * i))
        return h

    def _valid_mask(t: pa.Table, cols: list[str]):
        valid = pc.is_valid(t[cols[0]])
        for c in cols[1:]:
            valid = pc.and_(valid, pc.is_valid(t[c]))
        return valid

    @ray.remote
    def map_side(cols: list[str], replicate: bool, bloom_bytes,
                 *tables: pa.Table) -> list[pa.Table]:
        good = [t for t in tables
                if t.num_rows and all(c in t.schema.names for c in cols)]
        if not good:
            empty = next((t.slice(0, 0) for t in tables
                          if all(c in t.schema.names for c in cols)),
                         tables[0].slice(0, 0))
            return [empty for _ in range(n_parts)]
        t = (pa.concat_tables(good).combine_chunks()
             if len(good) > 1 else good[0])
        valid = _valid_mask(t, cols)
        nulls = None
        if (how == "left" and not replicate) or how == "full":
            # outer sides keep null-key rows: route them all to one bucket
            # (they match nothing, the local join null-fills them)
            nulls = t.filter(pc.invert(valid))
        t = t.filter(valid)
        h = _mixed_hash(t, cols)
        if bloom_bytes is not None:
            from ..functions.sketches import BloomFilter

            member = BloomFilter.from_bytes(bloom_bytes).contains(h)
            t = t.filter(pa.array(member))
            h = h[member]
        bucket = (h >> shift).astype(np.int64)
        if salt > 1 and not replicate:
            # round-robin sub-bucket: spreads a hot key's rows evenly and
            # deterministically within each map task
            bucket = bucket * salt + (np.arange(len(bucket)) % salt)
        elif salt > 1:
            bucket = bucket * salt  # replicated below
        parts = _slice_by_bucket(t, bucket, n_parts)
        if salt > 1 and replicate:
            # right side: every sub-bucket of a bucket gets the full bucket
            parts = [parts[(b // salt) * salt] for b in range(n_parts)]
        if nulls is not None and nulls.num_rows:
            parts = _spread_rows(parts, nulls)
        return parts

    @ray.remote
    def join_bucket(n_left: int, *parts: pa.Table) -> pa.Table:
        lefts = [p for p in parts[:n_left] if p.num_rows]
        rights = [p for p in parts[n_left:] if p.num_rows]
        if not lefts or not rights:
            # an empty side still needs the full output schema; hunt for
            # any part that carries it (schema-less empty blocks exist)
            lt = next((p for p in parts[:n_left]
                       if all(k in p.schema.names for k in left_keys)), None)
            rt = next((p for p in parts[n_left:]
                       if all(k in p.schema.names for k in right_keys)), None)
            if lt is None or rt is None:
                if (rt is None and lefts and how in ("left", "full")) or (
                        lt is None and rights and how == "full"):
                    # outer semantics must keep these rows, but the empty
                    # side left NO schema to null-fill from (row-based
                    # filters emit schema-less blocks) — fail loudly
                    # rather than silently dropping them
                    raise ValueError(
                        "outer join: the empty side carries no schema to "
                        "null-fill from; produce it with schema-preserving "
                        "(arrow-format) transforms")
                return pa.table({})
            if lefts and how in ("left", "full"):
                # left rows with an empty right side survive an outer
                # join, null-filled
                lt = pa.concat_tables(lefts).combine_chunks()
            else:
                lt = lt.slice(0, 0)
            if rights and how == "full":
                rt = pa.concat_tables(rights).combine_chunks()
            else:
                rt = rt.slice(0, 0)
            return lt.join(
                rt, keys=left_keys, right_keys=right_keys,
                join_type=join_type,
            )
        lt = pa.concat_tables(lefts).combine_chunks()
        rt = pa.concat_tables(rights).combine_chunks()
        return lt.join(rt, keys=left_keys, right_keys=right_keys,
                       join_type=join_type)

    left_refs = left_ds.to_arrow_refs()
    right_refs = right_ds.to_arrow_refs()

    def _schema_empty_ref(d: ray.data.Dataset):
        sch = d.schema(fetch_if_missing=True)
        asch = getattr(sch, "base_schema", sch)
        if not isinstance(asch, pa.Schema):
            # pandas-block lineage: rebuild an arrow schema from the
            # (names, numpy dtypes) pair the wrapper exposes
            try:
                asch = pa.schema([
                    (n, pa.from_numpy_dtype(t))
                    for n, t in zip(sch.names, asch.types)
                ])
            except (AttributeError, TypeError, pa.ArrowNotImplementedError):
                return None
        return ray.put(asch.empty_table())

    # a ZERO-BLOCK side would make every join_bucket lose the surviving
    # side's rows under outer semantics (no part carries the schema):
    # synthesize one empty typed block so the outer join null-fills
    if not right_refs and how in ("left", "full"):
        r = _schema_empty_ref(right_ds)
        if r is not None:
            right_refs = [r]
    if not left_refs and how == "full":
        r = _schema_empty_ref(left_ds)
        if r is not None:
            left_refs = [r]

    def _chunks(refs: list) -> list[list]:
        # the exchange creates n_map_tasks x n_parts objects: coalesce
        # fragmented inputs (e.g. a groupby's O(input-blocks) tiny outputs)
        # so the fan-out stays bounded — no extra exchange, the map task
        # just concats its blocks locally
        max_tasks = 4 * num_buckets
        k = max(1, int(np.ceil(len(refs) / max_tasks)))
        return [refs[i:i + k] for i in range(0, len(refs), k)]

    bloom_ref = None
    if bloom_prefilter:
        from ..functions.sketches import BloomFilter

        @ray.remote
        def tbl_len(t: pa.Table) -> int:
            return t.num_rows

        @ray.remote
        def bloom_chunk(n_expected: int, *tables: pa.Table) -> bytes:
            bf = BloomFilter(n_expected=n_expected, fp_rate=bloom_fp_rate)
            for t in tables:
                if t.num_rows and all(c in t.schema.names
                                      for c in right_keys):
                    tt = t.filter(_valid_mask(t, right_keys))
                    bf.update(_mixed_hash(tt, right_keys))
            return bf.to_bytes()

        # sizing the filter needs the right row count; pass
        # bloom_n_expected (e.g. from parquet metadata) to skip this
        # per-block counting pass
        n_right = bloom_n_expected or max(1, sum(ray.get(
            [tbl_len.remote(r) for r in right_refs])))
        blobs = ray.get([bloom_chunk.remote(n_right, *c)
                         for c in _chunks(right_refs)])
        if blobs:
            bf = BloomFilter.from_bytes(blobs[0])
            for b in blobs[1:]:
                bf.merge(BloomFilter.from_bytes(b))
            bloom_ref = ray.put(bf.to_bytes())
        # else: zero-block right side — skip the bloom (nothing to filter
        # against); the bucket path below already yields the empty result

    left_maps = [
        map_side.options(num_returns=n_parts).remote(
            left_keys, False, bloom_ref, *c)
        for c in _chunks(left_refs)]
    right_maps = [
        map_side.options(num_returns=n_parts).remote(
            right_keys, True, None, *c)
        for c in _chunks(right_refs)]
    if n_parts == 1:
        left_maps = [[r] for r in left_maps]
        right_maps = [[r] for r in right_maps]
    joined = [
        join_bucket.remote(
            len(left_maps),
            *[m[b] for m in left_maps],
            *[m[b] for m in right_maps],
        )
        for b in range(n_parts)
    ]
    return ray.data.from_arrow_refs(joined)


def sampling_variance(
    ds: ray.data.Dataset,
    column: str,
    *,
    n_samples: int = 5,
    frac: float = 0.1,
    seed: int = 23,
) -> pd.DataFrame:
    """Repeated-sample distribution-consistency probe (A11,
    /root/reference/biosample_enricher/random_sampling_demo.py:339-346,
    607-640): draw ``n_samples`` independent fractions, aggregate the target
    column per sample, report per-sample means plus the across-sample
    variance — large variance flags a sampling pipeline that is not i.i.d.
    (e.g. sorted input + block-aligned sampling)."""

    rows = []
    for i in range(n_samples):
        sample = ds.select_columns([column]).random_sample(frac, seed=seed + i)

        def partial(t: pa.Table) -> pa.Table:
            col = t[column].combine_chunks().drop_null()
            s = pc.sum(col).as_py() or 0.0
            return pa.table({"s": pa.array([float(s)]),
                             "n": pa.array([len(col)], pa.int64())})

        agg = sample.map_batches(partial, batch_format="pyarrow").sum(["s", "n"])
        # Dataset.sum returns None when a sample draws zero rows
        n = int(agg["sum(n)"]) if agg else 0
        rows.append({"sample_id": i, "n": n,
                     "mean": (agg["sum(s)"] / n) if n else float("nan")})
    out = pd.DataFrame(rows)
    means = out["mean"].to_numpy()
    means = means[np.isfinite(means)]
    out["across_sample_variance"] = float(np.var(means)) if means.size else float("nan")
    return out


def _sampled_key_counts(
    ds: ray.data.Dataset, key_column: str, sample_frac: float,
    *, drop_nulls: bool,
) -> pd.DataFrame:
    """Shared sampling probe: DataFrame(key_column, n) of per-key counts over
    one ``random_sample(sample_frac, seed=17)`` pass (in-batch value_counts
    combiner, then a tiny groupby-sum). Used by both the skew detector
    (nulls kept — a null-heavy key IS a skew signal for sort-based groupbys,
    which raise on null keys) and the join-salt probe (nulls dropped — null
    keys never shuffle in a join)."""
    sample = ds.select_columns([key_column]).random_sample(sample_frac, seed=17)

    def vc(t: pa.Table) -> pa.Table:
        col = t[key_column].combine_chunks()
        if drop_nulls:
            col = col.drop_null()
        c = col.value_counts()
        return pa.table({key_column: c.field("values"), "n": c.field("counts")})

    return (
        sample.map_batches(vc, batch_format="pyarrow")
        .groupby(key_column)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )


def detect_skewed_keys(
    ds: ray.data.Dataset, key_column: str, *, top: int = 20, sample_frac: float = 0.05
) -> pd.DataFrame:
    """Estimate the hottest keys from a sample — the pre-shuffle skew probe
    (SURVEY.md §4.2 'detect skew from fragment row-counts before shuffle')."""
    counts = _sampled_key_counts(ds, key_column, sample_frac, drop_nulls=False)
    counts["est_total"] = (counts["n"] / max(sample_frac, 1e-9)).astype("int64")
    return (
        counts.sort_values("n", ascending=False)
        .head(top)
        .reset_index(drop=True)
    )


def write_bucketed_by_key(
    ds: ray.data.Dataset,
    key_column: str,
    out_dir: str,
    *,
    num_buckets: int = 64,
) -> int:
    """Materialize a dataset as a KEY-BUCKETED parquet table: hive
    partition dirs ``bucket=<b>`` where ``b = hash64(key) >> (64-log2(B))``
    — the same process-stable bucketing as ``shuffle_hash_join`` and
    ``parquet_key_uniqueness``.

    This is the "pick ONE partitioning key and reuse it" layout: any later
    groupby/join/dedup on the same key can read one bucket directory at a
    time and skip its all-to-all exchange entirely (equal keys are
    guaranteed co-located in one bucket). Writes stream per block (many
    files per bucket, never one giant file) so the sink is restartable per
    bucket directory. Returns the bucket count actually used (rounded to a
    power of two). Null keys go to bucket 0.
    """
    bits = max(1, int(np.ceil(np.log2(num_buckets))))
    num_buckets = 1 << bits
    shift = np.uint64(64 - bits)

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("bucket", pa.array([], pa.int64()))
        keys = t[key_column].combine_chunks()
        valid = pc.is_valid(keys).to_numpy(zero_copy_only=False)
        b = np.zeros(len(t), dtype=np.int64)
        if valid.any():
            b[valid] = (hash64(keys.drop_null()) >> shift).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"])
    # manifest written AFTER the data (commit-marker semantics: its presence
    # means the bucketed table is complete) — bucket-local readers use it to
    # prove two tables share one layout before skipping the exchange.
    # Atomic (tmp + rename): a torn manifest must not look committed.
    # makedirs: a zero-row dataset is a VALID bucketed table, but Ray's
    # write_parquet creates no directory for it. The manifest carries the
    # AUTHORITATIVE Arrow schema (base64 of schema.serialize()): an empty
    # table has no fragments to derive one from, and consumers need it to
    # emit schema-stable empty blocks.
    import base64
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, _BUCKET_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({
            "num_buckets": num_buckets, "key_column": key_column,
            "hash": "hash64_msb", "version": 1,
            "schema_b64": base64.b64encode(
                bytes(_arrow_schema_of(ds).serialize())).decode(),
        }, f)
    os.rename(tmp, os.path.join(out_dir, _BUCKET_MANIFEST))
    return num_buckets


def _arrow_schema_of(ds: ray.data.Dataset) -> pa.Schema:
    """Arrow schema of a Dataset regardless of its block format (pandas
    blocks report a PandasBlockSchema, not a pa.Schema)."""
    base = getattr(ds.schema(), "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    empty = pd.DataFrame({n: pd.Series(dtype=t)
                          for n, t in zip(base.names, base.types)})
    return pa.Table.from_pandas(empty, preserve_index=False).schema


_BUCKET_MANIFEST = "_bucket_manifest.json"


def read_bucket_manifest(table_dir: str) -> dict:
    """Layout manifest of a ``write_bucketed_by_key`` table; raises
    FileNotFoundError when the table was never completed (manifest is the
    commit marker) or predates manifests."""
    import json
    import os

    path = os.path.join(table_dir, _BUCKET_MANIFEST)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no bucket manifest at {path}: not a completed "
            "write_bucketed_by_key table")
    with open(path) as f:
        return json.load(f)


def _manifest_schema(manifest: dict) -> pa.Schema:
    """Authoritative table schema recorded by the sink (survives zero-row
    tables, which leave no fragments to derive a schema from)."""
    import base64

    return pa.ipc.read_schema(
        pa.py_buffer(base64.b64decode(manifest["schema_b64"])))


def bucketed_hash_join(
    left_dir: str,
    right_dir: str,
    *,
    how: str = "inner",
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Exchange-free equi-join of two ``write_bucketed_by_key`` tables.

    The payoff of the "pick ONE partitioning key and reuse it" layout: both
    tables were already hash-partitioned on their bucketing key by the sink,
    so equal keys are guaranteed co-located in equal-numbered bucket dirs —
    each bucket pair joins locally (pyarrow's C++ hash join) with ZERO rows
    moving between tasks. At 100 TB this turns every repeat join on the
    co-location key from an all-to-all exchange into an embarrassingly
    parallel per-bucket scan: bucket b's task reads only ``bucket=b`` files
    from each side (directory-level pruning).

    Layout proof, not trust: both manifests must exist (they are the sinks'
    commit markers) and agree on num_buckets + hash version; the join key of
    each side IS its manifest's ``key_column`` — joining bucketed tables on
    any other column would silently co-locate nothing, so no key override
    exists. ``how`` is ``"inner"`` or ``"left"``. Null keys never match
    (SQL semantics); the sink routes them to bucket 0, where a left join
    null-fills them and an inner join drops them.

    Skew: co-location is frozen at write time, so a hot key cannot be
    salted here — one bucket pair is the straggler. Detect hot keys BEFORE
    bucketing (``detect_skewed_keys``) and either keep them out of the
    bucketed layout or fall back to ``shuffle_hash_join(salt=k)`` for the
    hot slice.

    Non-key output columns must be disjoint across the two sides (project
    with ``left_columns`` / ``right_columns``) — suffix-renaming would make
    the output schema depend on the other side's schema, the kind of
    spooky-action a 50-stage pipeline can't debug.
    """
    import os

    import pyarrow.dataset as pads

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    ml = read_bucket_manifest(left_dir)
    mr = read_bucket_manifest(right_dir)
    for field in ("num_buckets", "hash", "version"):
        if ml[field] != mr[field]:
            raise ValueError(
                f"bucket layouts disagree on {field}: {ml[field]!r} vs "
                f"{mr[field]!r} — rewrite one side with matching "
                "num_buckets or use shuffle_hash_join")
    left_key, right_key = ml["key_column"], mr["key_column"]
    num_buckets = int(ml["num_buckets"])

    schema_l = _manifest_schema(ml)
    schema_r = _manifest_schema(mr)
    left_columns = left_columns or schema_l.names
    right_columns = right_columns or schema_r.names
    if left_key not in left_columns:
        left_columns = [left_key, *left_columns]
    if right_key not in right_columns:
        right_columns = [right_key, *right_columns]
    # the output keeps EVERY left column (incl. the key) plus right non-key
    # columns — so the left key itself collides with a same-named right
    # payload column and must stay in the left set here
    overlap = set(left_columns) & (set(right_columns) - {right_key})
    if overlap:
        raise ValueError(
            f"non-key output columns collide: {sorted(overlap)} — project "
            "one side away with left_columns/right_columns")
    join_type = "inner" if how == "inner" else "left outer"

    @ray.remote
    def join_one_bucket(b: int) -> pa.Table:
        def read_side(table_dir: str, cols: list[str],
                      schema: pa.Schema) -> pa.Table:
            path = os.path.join(table_dir, f"bucket={b}")
            if not os.path.isdir(path):
                return pa.schema(
                    [schema.field(c) for c in cols]).empty_table()
            return pads.dataset(path, format="parquet").to_table(columns=cols)

        lt = read_side(left_dir, left_columns, schema_l)
        rt = read_side(right_dir, right_columns, schema_r)
        return lt.join(rt, keys=left_key, right_keys=right_key,
                       join_type=join_type)

    refs = [join_one_bucket.remote(b) for b in range(num_buckets)]
    return ray.data.from_arrow_refs(refs)


def read_key_bucket(out_dir: str, bucket: int) -> ray.data.Dataset:
    """Read ONE bucket of a `write_bucketed_by_key` table (partition-pruned
    at the directory level — other buckets' files are never opened). A
    bucket that received no rows yields an EMPTY dataset with the same
    schema (hive writes create no dir for it) instead of raising."""
    import os

    path = f"{out_dir}/bucket={bucket}"
    if os.path.isdir(path):
        return ray.data.read_parquet(path)
    return ray.data.read_parquet(out_dir).limit(0).drop_columns(["bucket"])


def bucketed_map_groups(
    table_dir: str,
    fn: "Callable[[pd.DataFrame], pd.DataFrame]",
    *,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Exchange-free ``groupby(key).map_groups(fn)`` over a
    ``write_bucketed_by_key`` table.

    The layout guarantees every row of a key lives in ONE bucket dir, so a
    per-group function — including HOLISTIC ones that must see the whole
    group (argmax, per-group sort, per-group dedup) that normally force the
    all-to-all groupby exchange — runs per bucket with zero shuffle: each
    task reads only its ``bucket=b`` files (directory-pruned, ``columns``
    projected at the scan) and applies ``fn`` to each complete group.

    ``fn`` takes one group as a pandas DataFrame (key column included) and
    returns a DataFrame; outputs across groups must share one schema.
    Absent bucket dirs are skipped on the driver (no task, no schema-less
    block); a bucket whose groups ALL return empty frames yields one empty
    zero-column block — acceptable to every Dataset consumer here, but a
    mixed-schema warning Ray may print for it is this case, not data loss.
    Skew caveat as for
    ``bucketed_hash_join``: the hottest key's bucket is the straggler and
    cannot be salted post-hoc (holistic fns can't be salted at all — that
    is exactly when this layout is the RIGHT answer, per the measured
    salt-bench finding in BASELINE.md).
    """
    import os

    import pyarrow.dataset as pads

    manifest = read_bucket_manifest(table_dir)
    key_column = manifest["key_column"]
    num_buckets = int(manifest["num_buckets"])
    if columns is not None and key_column not in columns:
        columns = [key_column, *columns]

    @ray.remote
    def one_bucket(b: int) -> pa.Table:
        path = os.path.join(table_dir, f"bucket={b}")
        t = pads.dataset(path, format="parquet").to_table(columns=columns)
        if t.num_rows == 0:
            return pa.table({})
        df = t.to_pandas()
        # null keys form their own group only if present (sort=False keeps
        # first-appearance order; dropna=False matches map_groups semantics)
        parts = [fn(g) for _, g in df.groupby(key_column, sort=False,
                                              dropna=False)]
        parts = [p for p in parts if p is not None and len(p)]
        if not parts:
            return pa.table({})
        return pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                    preserve_index=False)

    # absent dirs filtered HERE: spawning their tasks would emit schema-less
    # empty blocks that disagree with the real blocks' schema
    refs = [one_bucket.remote(b) for b in range(num_buckets)
            if os.path.isdir(os.path.join(table_dir, f"bucket={b}"))]
    if not refs:
        # schema-stable empty result: the INPUT columns (fn never ran, so
        # its output schema is unknowable — callers branching on emptiness
        # see the projected scan schema, same as an all-filtered scan)
        schema = _manifest_schema(manifest)
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(refs)


def bucketed_delta_join(
    bucketed_dir: str,
    delta_ds: ray.data.Dataset,
    delta_key: str,
    *,
    how: str = "inner",
    bucketed_columns: list[str] | None = None,
) -> ray.data.Dataset:
    """One-sided join: shuffle ONLY a (small) delta Dataset into an existing
    ``write_bucketed_by_key`` layout and join per bucket.

    The production pattern the bucketed layout exists for: a huge fact table
    is bucketed once; every new increment (today's crawl, a fresh label set)
    joins against it by exchanging only ITS OWN rows — the big side is read
    in place, bucket dir by bucket dir, never moved. Delta rows route to
    ``bucket = hash64(key) >> shift`` with the layout's own hash, so equal
    keys meet the bucketed side's co-located rows by construction.

    ``how``: ``"inner"`` or ``"left"`` — left keeps unmatched DELTA rows
    (the delta is the probe side). Null delta keys never match; under
    ``"left"`` they are spread round-robin and null-filled locally. Non-key
    output columns must be disjoint (project the bucketed side with
    ``bucketed_columns``). Skew: the layout's hot bucket is still one task;
    salting is impossible post-hoc (see ``bucketed_hash_join``) — for a
    hot-key delta use ``shuffle_hash_join(salt=k)`` instead.
    """
    import os

    import pyarrow.dataset as pads

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    manifest = read_bucket_manifest(bucketed_dir)
    # this is the ONE consumer that mixes write-time hashing (the layout)
    # with LIVE hashing (the delta): a layout placed by a different hash
    # version would silently lose matches, so refuse anything but the hash
    # this build implements
    if (manifest.get("hash"), manifest.get("version")) != ("hash64_msb", 1):
        raise ValueError(
            f"layout hashed with {manifest.get('hash')!r} v"
            f"{manifest.get('version')!r}, but this build routes deltas "
            "with hash64_msb v1 — rewrite the layout or use "
            "shuffle_hash_join")
    bkey = manifest["key_column"]
    num_buckets = int(manifest["num_buckets"])
    shift = np.uint64(64 - int(np.log2(num_buckets)))
    bschema = _manifest_schema(manifest)
    bucketed_columns = bucketed_columns or bschema.names
    if bkey not in bucketed_columns:
        bucketed_columns = [bkey, *bucketed_columns]
    delta_schema = _arrow_schema_of(delta_ds)
    overlap = set(delta_schema.names) & (set(bucketed_columns) - {bkey})
    if overlap:
        raise ValueError(
            f"non-key output columns collide: {sorted(overlap)} — project "
            "the bucketed side with bucketed_columns or rename delta columns")
    join_type = "inner" if how == "inner" else "left outer"

    @ray.remote
    def map_delta(*tables: pa.Table) -> list[pa.Table]:
        good = [t for t in tables
                if t.num_rows and delta_key in t.schema.names]
        if not good:
            empty = delta_schema.empty_table()
            return [empty for _ in range(num_buckets)]
        t = (pa.concat_tables(good).combine_chunks()
             if len(good) > 1 else good[0])
        valid = pc.is_valid(t[delta_key])
        nulls = t.filter(pc.invert(valid)) if how == "left" else None
        t = t.filter(valid)
        bucket = (hash64(t[delta_key].combine_chunks()) >> shift).astype(
            np.int64)
        parts = _slice_by_bucket(t, bucket, num_buckets)
        if nulls is not None and nulls.num_rows:
            parts = _spread_rows(parts, nulls)
        return parts

    @ray.remote
    def join_delta_bucket(b: int, *parts: pa.Table) -> pa.Table:
        dts = [p for p in parts if p.num_rows]
        dt = (pa.concat_tables(dts).combine_chunks() if dts
              else delta_schema.empty_table())
        path = os.path.join(bucketed_dir, f"bucket={b}")
        if dt.num_rows == 0:
            # the tiny-delta payoff: a bucket the delta never touched is
            # NEVER read — the result is empty by construction under both
            # inner and left (only delta rows can survive a delta-probe join)
            bt = pa.schema(
                [bschema.field(c) for c in bucketed_columns]).empty_table()
        elif os.path.isdir(path):
            bt = pads.dataset(path, format="parquet").to_table(
                columns=bucketed_columns)
        else:
            bt = pa.schema(
                [bschema.field(c) for c in bucketed_columns]).empty_table()
        return dt.join(bt, keys=delta_key, right_keys=bkey,
                       join_type=join_type)

    delta_refs = delta_ds.to_arrow_refs()
    # bound the exchange fan-out like shuffle_hash_join: coalesce fragmented
    # delta blocks so at most ~4 map tasks per bucket exist
    max_tasks = 4 * num_buckets
    k = max(1, int(np.ceil(len(delta_refs) / max_tasks))) if delta_refs else 1
    chunks = [delta_refs[i:i + k] for i in range(0, len(delta_refs), k)]
    # manifests always record >= 2 buckets (the sink rounds up to a power
    # of two with bits >= 1), so num_returns is always a list
    maps = [map_delta.options(num_returns=num_buckets).remote(*c)
            for c in chunks]
    joined = [join_delta_bucket.remote(b, *[m[b] for m in maps])
              for b in range(num_buckets)]
    return ray.data.from_arrow_refs(joined)
