"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is normalized once,
``ray.put`` once, and every batch does one numpy matmul against it (the
broadcast-small-side pattern; reference analog: the bbox/keyword lookup
tables held per service, elevation/classifier.py:10-33). Per-batch local
top-k partials are reduced to the global top-k, so only num_batches × k × q
rows ever leave the workers.

Scale path: LSH-bucketed variant — random-hyperplane signs bucket vectors,
queries probe only their own bucket (plus optional neighbors), turning the
scan into a partitioned lookup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from . import taskify


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → (n, d) float32 matrix, zero rows for nulls."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    d = int(np.diff(offsets).max()) if len(offsets) > 1 else 0
    n = len(col)
    out = np.zeros((n, d), dtype=np.float32)
    lens = np.diff(offsets)
    if (lens == d).all():
        return flat.reshape(n, d)
    pos = 0
    for i, ln in enumerate(lens):
        out[i, :ln] = flat[pos : pos + ln]
        pos += ln
    return out


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


SCORE_DECIMALS = 6  # tie-granularity: scores equal at 6 dp tie-break on id


class CosineTopK:
    """Actor-pool stage: local top-k cosine scores per query against a
    broadcast query matrix; query matrix fetched once per actor.

    Deterministic across runs and block layouts: scores are computed in
    float64, rounded to ``SCORE_DECIMALS``, and the local k are selected by
    the total order (score DESC, id ASC) — so the global reduce (same order)
    is exact and reproducible even at score ties.
    """

    def __init__(
        self,
        queries_ref,  # ray.ObjectRef | np.ndarray
        k: int = 10,
        id_column: str = "vec_id",
        embedding_column: str = "embedding",
    ) -> None:
        q = queries_ref
        if isinstance(q, ray.ObjectRef):
            q = ray.get(q)
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k
        self.id_column = id_column
        self.embedding_column = embedding_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_to_matrix(batch[self.embedding_column]).astype(np.float64))
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        scores = np.round(vecs @ self.q.T, SCORE_DECIMALS)  # (n, q)
        k = min(self.k, scores.shape[0])
        out_q, out_v, out_s = [], [], []
        for j in range(scores.shape[1]):
            # lexsort: primary -score (desc), secondary id (asc)
            order = np.lexsort((ids, -scores[:, j]))[:k]
            out_q.append(np.full(len(order), j, dtype=np.int64))
            out_v.append(ids[order])
            out_s.append(scores[order, j])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_column: pa.array(np.concatenate(out_v)),
                "score": pa.array(np.concatenate(out_s).astype(np.float64)),
            }
        )


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    concurrency: int | None = None,
    query_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Global cosine top-k per query row of ``queries`` (q, d).

    Returns a DataFrame (query_id, vec_id, score, rank) — small by
    construction (q × k rows). ``query_ids`` optionally relabels the
    0..q-1 positional query index with caller ids.
    """
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    # taskify: setup is one zero-copy ray.get + a normalize over the small
    # query matrix — rebuilt per task in sub-ms, no actor-pool startup
    partials = ds.map_batches(
        taskify(CosineTopK, queries_ref=q_ref, k=k, id_column=id_column,
                embedding_column=embedding_column),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).to_pandas()  # num_batches × k × q rows — small
    out = (
        partials.sort_values(["query_id", "score", id_column],
                             ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount()
    if query_ids is not None:
        out["query_id"] = np.asarray(query_ids, dtype=np.int64)[out["query_id"]]
    return out


# ------------------------------------------------------------------- IVF


def build_ivf_centroids(
    ds: ray.data.Dataset,
    *,
    n_centroids: int = 64,
    sample_limit: int = 20_000,
    iters: int = 10,
    seed: int = 13,
    embedding_column: str = "embedding",
) -> np.ndarray:
    """Coarse IVF centroids via Lloyd k-means on a bounded driver sample.

    The scale path for similarity search (task brief: "an IVF or
    LSH-bucketed variant as the scale path"): train on ≤ ``sample_limit``
    vectors (the reference's 50k-sample profiling precedent,
    schema_inference.py:23), broadcast the (n_centroids, d) matrix once —
    it is tiny — and assign/search per batch. Deterministic in (seed, data).
    """
    n_total = ds.count()
    frac = min(1.0, sample_limit / max(n_total, 1))
    sample = ds.select_columns([embedding_column])
    if frac < 1.0:
        sample = sample.random_sample(frac, seed=seed)
    mats = [
        _to_matrix(b[embedding_column])
        for b in sample.iter_batches(batch_size=8192, batch_format="pyarrow")
        if len(b)
    ]
    x = _normalize(np.concatenate(mats).astype(np.float64))
    # block arrival order varies between runs; lexicographic row sort makes
    # the k-means init (and thus the whole index) order-independent
    x = x[np.lexsort(x.T[::-1])]
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
        cents = _normalize(cents)
    return cents


class IVFLocalTopK:
    """Actor-pool stage: per-batch top-k restricted to each query's probed
    IVF cells — vectors outside the ``n_probe`` nearest centroids of a query
    are skipped entirely, turning the full scan into a partitioned lookup.
    Same determinism contract as CosineTopK."""

    def __init__(self, queries_ref, centroids_ref, k: int = 10,
                 n_probe: int = 4, id_column: str = "vec_id",
                 embedding_column: str = "embedding") -> None:
        q = queries_ref
        if isinstance(q, ray.ObjectRef):
            q = ray.get(q)
        c = centroids_ref
        if isinstance(c, ray.ObjectRef):
            c = ray.get(c)
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.cents = np.asarray(c, dtype=np.float64)
        n_probe = min(n_probe, len(self.cents))
        # per-query probe set: n_probe nearest centroids
        qc = self.q @ self.cents.T  # (nq, ncent)
        self.probe = np.argpartition(-qc, kth=n_probe - 1, axis=1)[:, :n_probe]
        self.k = k
        self.id_column = id_column
        self.embedding_column = embedding_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_to_matrix(batch[self.embedding_column]).astype(np.float64))
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        assign = np.argmax(vecs @ self.cents.T, axis=1)  # (n,)
        out_q, out_v, out_s = [], [], []
        for j in range(self.q.shape[0]):
            m = np.isin(assign, self.probe[j])
            if not m.any():
                continue
            scores = np.round(vecs[m] @ self.q[j], SCORE_DECIMALS)
            sub_ids = ids[m]
            order = np.lexsort((sub_ids, -scores))[: self.k]
            out_q.append(np.full(len(order), j, dtype=np.int64))
            out_v.append(sub_ids[order])
            out_s.append(scores[order])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             self.id_column: pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table(
            {"query_id": pa.array(np.concatenate(out_q)),
             self.id_column: pa.array(np.concatenate(out_v)),
             "score": pa.array(np.concatenate(out_s).astype(np.float64))}
        )


def ivf_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    centroids: np.ndarray | None = None,
    n_centroids: int = 64,
    n_probe: int = 4,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    concurrency: int | None = None,
    query_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Approximate cosine top-k via IVF cells: brute_force_topk's shape, but
    each batch scores only vectors assigned to a query's probed cells —
    the compute per query drops by ~n_centroids/n_probe at equal recall
    knobs. Deterministic given (centroids, data)."""
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    if centroids is None:
        centroids = build_ivf_centroids(
            ds, n_centroids=n_centroids, embedding_column=embedding_column
        )
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))
    partials = ds.map_batches(
        taskify(IVFLocalTopK, queries_ref=q_ref, centroids_ref=c_ref, k=k,
                n_probe=n_probe, id_column=id_column,
                embedding_column=embedding_column),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).to_pandas()
    out = (
        partials.sort_values(["query_id", "score", id_column],
                             ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount()
    if query_ids is not None:
        out["query_id"] = np.asarray(query_ids, dtype=np.int64)[out["query_id"]]
    return out


# ------------------------------------------------- distributed k-means


class _KMeansPartials:
    """Per-batch Lloyd partials against broadcast centroids: one row per
    non-empty cluster with (cluster, count, per-dimension float64 sums).
    Rows are k-bounded per batch, so the follow-up ``groupby("cluster")``
    shuffles at most k × num_batches tiny rows — never the vectors."""

    def __init__(self, centroids_ref, embedding_column: str = "embedding") -> None:
        c = centroids_ref
        if isinstance(c, ray.ObjectRef):
            c = ray.get(c)
        self.cents = np.asarray(c, dtype=np.float64)
        self.embedding_column = embedding_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_to_matrix(batch[self.embedding_column]).astype(np.float64))
        if not len(vecs):
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "count": pa.array([], pa.int64()),
                             "vecsum": pa.array([], pa.list_(pa.float64()))})
        assign = np.argmax(vecs @ self.cents.T, axis=1)
        k, d = self.cents.shape
        counts = np.bincount(assign, minlength=k)
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, assign, vecs)
        nz = np.flatnonzero(counts)
        return pa.table({
            "cluster": pa.array(nz.astype(np.int64)),
            "count": pa.array(counts[nz].astype(np.int64)),
            "vecsum": pa.array(list(sums[nz])),
        })


def kmeans_distributed(
    ds: ray.data.Dataset,
    *,
    n_clusters: int = 16,
    iters: int = 10,
    seed: int = 13,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    concurrency: int | None = None,
) -> np.ndarray:
    """Spherical Lloyd k-means where EVERY iteration streams the full
    dataset: assign per batch against broadcast centroids, reduce the
    k-bounded per-batch (count, sum) partials with one small
    ``groupby("cluster")`` shuffle, update on the driver (k × d doubles).

    Unlike :func:`build_ivf_centroids` (driver-sample training, the bounded
    IVF path), this is the exact-assignment iterative algorithm — the shape
    a 100 TB corpus needs: per-iteration cost is one map pass plus a shuffle
    of ≤ k × num_batches rows of k-bounded partials; vectors never move.

    Init is deterministic and block-order independent: the ``n_clusters``
    vectors whose Knuth-hashed ids are globally smallest (a uniform
    pseudo-random draw reproducible on any cluster size).

    The (id, embedding) projection is materialized ONCE into the object
    store (spill-backed) so the ``iters`` passes stream zero-copy blocks
    instead of re-reading and re-decoding parquet every iteration — the
    standard Ray Data shape for iterative algorithms; the projection is the
    slim two-column table, never the full corpus row.
    """
    from ray.data.dataset import MaterializedDataset

    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    # re-materialize even an already-materialized input when it carries
    # EXTRA columns: the Lloyd iterations would otherwise stream full-width
    # rows every pass (ADVICE r4) — the slim check is on the column set,
    # not the dataset type
    _cols = set(ds.schema(fetch_if_missing=True).names)
    if (not isinstance(ds, MaterializedDataset)
            or _cols != {id_column, embedding_column}):
        ds = ds.select_columns([id_column, embedding_column]).materialize()
    mult, mod = np.uint64(2654435761 + 2 * seed), np.uint64(4294967296)

    def init_partials(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"h": pa.array([], pa.uint64()),
                             id_column: pa.array([], pa.int64()),
                             embedding_column: pa.array([], pa.list_(pa.float64()))})
        ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids % mod) * mult % mod
        order = np.argsort(h, kind="stable")[:n_clusters]
        vecs = _to_matrix(t[embedding_column]).astype(np.float64)[order]
        return pa.table({"h": pa.array(h[order]),
                         id_column: pa.array(ids[order].astype(np.int64)),
                         embedding_column: pa.array(list(vecs))})

    seeds = (
        ds.select_columns([id_column, embedding_column])
        .map_batches(init_partials, batch_format="pyarrow",
                     concurrency=concurrency)
        .to_pandas()  # ≤ k rows per batch
        .sort_values(["h", id_column])
        .head(n_clusters)
    )
    cents = _normalize(np.stack(seeds[embedding_column].to_numpy()))

    for _ in range(iters):
        c_ref = ray.put(cents)
        merged = (
            ds.select_columns([embedding_column])
            .map_batches(
                taskify(_KMeansPartials, centroids_ref=c_ref,
                        embedding_column=embedding_column),
                batch_format="pyarrow", concurrency=concurrency,
            )
            .groupby("cluster")
            .map_groups(
                lambda g: pd.DataFrame({
                    "cluster": [int(g["cluster"].iloc[0])],
                    "count": [int(g["count"].sum())],
                    "vecsum": [np.sum(np.stack(g["vecsum"].to_numpy()), axis=0)],
                }),
                batch_format="pandas",
            )
            .to_pandas()  # exactly ≤ k rows
        )
        new = cents.copy()
        for _, row in merged.iterrows():
            if row["count"]:
                new[int(row["cluster"])] = row["vecsum"] / row["count"]
        cents = _normalize(new)
    return cents


class _ClusterAssigner:
    """Appends the nearest-centroid id per row (broadcast centroids)."""

    def __init__(self, centroids_ref, embedding_column: str = "embedding") -> None:
        c = centroids_ref
        if isinstance(c, ray.ObjectRef):
            c = ray.get(c)
        self.cents = np.asarray(c, dtype=np.float64)
        self.embedding_column = embedding_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_to_matrix(batch[self.embedding_column]).astype(np.float64))
        assign = (np.argmax(vecs @ self.cents.T, axis=1)
                  if len(vecs) else np.array([], dtype=np.int64))
        return batch.append_column("cluster", pa.array(assign.astype(np.int64)))


def semdedup(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.95,
    n_clusters: int = 16,
    kmeans_iters: int = 8,
    centroids: np.ndarray | None = None,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023): semantic dedup via k-means clustering
    plus within-cluster cosine pruning. Returns the REMOVED rows as
    (removed_id, kept_id, cluster): greedy in ascending id order, a row is
    removed iff an already-kept row in its cluster has cosine ≥ threshold
    (keep-lowest-id, the same keeper rule as the MinHash cluster family).

    Scale shape: clustering is :func:`kmeans_distributed` (vectors never
    shuffled); the only vector movement is ONE ``groupby("cluster")`` that
    co-locates each cluster for its exact pairwise pass. Per-cluster work is
    O(c²) in cluster size — n_clusters is the knob that bounds c (the paper
    runs k ≈ 100k on web-scale corpora for the same reason); a skewed giant
    cluster must fit one reducer, the documented partitioning assumption.
    """
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    ds = ds.select_columns([id_column, embedding_column])
    if centroids is None:
        # one slim materialization shared by the Lloyd iterations AND the
        # assignment pass (kmeans_distributed skips re-materializing);
        # with precomputed centroids the single assignment pass streams —
        # materializing would be pure extra object-store pressure
        ds = ds.materialize()
        centroids = kmeans_distributed(
            ds, n_clusters=n_clusters, iters=kmeans_iters,
            id_column=id_column, embedding_column=embedding_column,
            concurrency=concurrency,
        )
    c_ref = ray.put(np.asarray(centroids, dtype=np.float64))
    assigned = ds.map_batches(
        taskify(_ClusterAssigner, centroids_ref=c_ref,
                embedding_column=embedding_column),
        batch_format="pyarrow", concurrency=concurrency,
    )

    def prune_cluster(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"removed_id": pd.Series(dtype="int64"),
                              "kept_id": pd.Series(dtype="int64"),
                              "cluster": pd.Series(dtype="int64")})
        if len(g) < 2:
            return empty
        order = np.argsort(g[id_column].to_numpy(), kind="stable")
        ids = g[id_column].to_numpy()[order]
        vecs = _normalize(np.stack(g[embedding_column].to_numpy())
                          .astype(np.float64)[order])
        sims = vecs @ vecs.T
        kept_mask = np.zeros(len(ids), dtype=bool)
        removed, kept_by = [], []
        for j in range(len(ids)):
            if kept_mask.any():
                s = sims[j] * kept_mask
                i = int(np.argmax(s))
                if s[i] >= threshold:
                    removed.append(ids[j])
                    kept_by.append(ids[i])
                    continue
            kept_mask[j] = True
        if not removed:
            return empty
        return pd.DataFrame({
            "removed_id": pd.Series(removed, dtype="int64"),
            "kept_id": pd.Series(kept_by, dtype="int64"),
            "cluster": pd.Series(np.full(len(removed),
                                         int(g["cluster"].iloc[0])),
                                 dtype="int64"),
        })

    return assigned.groupby("cluster").map_groups(
        prune_cluster, batch_format="pandas"
    )


# ----------------------------------------------------------- LSH-bucketed


class HyperplaneBucketer:
    """Random-hyperplane LSH: adds a bucket id (sign bits) per vector.

    The scale path for near-dup / ANN: bucket once, ``groupby("bucket")``
    co-locates similar vectors, per-bucket exact search replaces full scans.
    """

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 5,
                 embedding_column: str = "embedding") -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
        self.embedding_column = embedding_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _to_matrix(batch[self.embedding_column])
        if vecs.shape[1] != self.planes.shape[0]:
            planes = self.planes[: vecs.shape[1]]
        else:
            planes = self.planes
        bits = (vecs @ planes) > 0
        bucket = np.zeros(len(vecs), dtype=np.int64)
        for i in range(bits.shape[1]):
            bucket |= bits[:, i].astype(np.int64) << i
        return batch.append_column("bucket", pa.array(bucket))


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    *,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    id_column: str = "vec_id",
    embedding_column: str = "embedding",
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs via hyperplane buckets.

    Within-bucket exact cosine (vectors already co-located by the bucket
    groupby); pairs with cos ≥ threshold survive. Recall is governed by
    n_planes (fewer planes → bigger buckets → higher recall, more compute).
    """
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    bucketed = ds.map_batches(
        taskify(HyperplaneBucketer, dim=dim, n_planes=n_planes,
                embedding_column=embedding_column),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")}
            )
        ids = g[id_column].to_numpy()
        vecs = _normalize(np.stack(g[embedding_column].to_numpy()).astype(np.float32))
        sims = vecs @ vecs.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        a, b = ids[iu[keep]], ids[ju[keep]]
        swap = b < a
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame(
            {"id_a": pd.Series(a2, dtype="int64"),
             "id_b": pd.Series(b2, dtype="int64"),
             "cosine": pd.Series(sims[iu[keep], ju[keep]].astype(np.float64))}
        )

    return bucketed.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")
