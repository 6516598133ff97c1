"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's only dedup is per-row ID-list dedup via Python ``set``
(/root/reference/biosample_enricher/adapters.py:330-337,596-606) and
Mongo-id-assumed uniqueness. A training-data engine needs corpus-level
dedup as first-class operators (task brief); everything here is expressed
Ray-Data-first:

- **exact**: vectorized content-hash per batch → hash-partitioned
  ``groupby(hash)`` → per-group representative (min id). Only (hash, id[,
  len]) columns are shuffled, never the documents.
- **MinHash+LSH**: per-batch signature computation (stateful actor holds the
  permutation table) → explode to (band, band_key, id) rows → tiny groupby on
  band keys → candidate pairs → signature-estimated Jaccard filter.
- **SimHash**: 64-bit signatures per batch; near-dup candidates via the
  4×16-bit pigeonhole banding, verified by Hamming distance.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import hash64

# ------------------------------------------------------------------ exact


def exact_dedup_groups(
    ds: ray.data.Dataset, text_column: str = "text", id_column: str = "doc_id"
) -> ray.data.Dataset:
    """Exact duplicate groups: one row per distinct content with (keep_id, n).

    keep_id = min(id) per content — matches the SQL oracle
    ``SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n FROM t GROUP BY text``.

    Scale: the shuffle key is a 64-bit content hash; the full text is carried
    only to disambiguate hash collisions inside each (tiny) group.
    """

    def add_hash(t: pa.Table) -> pa.Table:
        h = hash64(t[text_column])
        return pa.table(
            {
                id_column: t[id_column],
                text_column: t[text_column],
                "__h": pa.array(h.view(np.int64)),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(text_column, sort=True)[id_column].agg(["min", "size"])
        return pd.DataFrame(
            {"keep_id": agg["min"].to_numpy(), "n": agg["size"].astype("int64").to_numpy()}
        )

    return hashed.groupby("__h").map_groups(per_group, batch_format="pandas")


def exact_dedup(
    ds: ray.data.Dataset, text_column: str = "text", id_column: str = "doc_id"
) -> ray.data.Dataset:
    """Keep one representative row id per distinct content (keepers only)."""
    groups = exact_dedup_groups(ds, text_column, id_column)
    return groups.map_batches(
        lambda t: t.select(["keep_id"]), batch_format="pyarrow"
    )


# ----------------------------------------------------------------- MinHash


class MinHasher:
    """Actor-pool stage: per-batch MinHash signatures + LSH band keys.

    Permutation table built once per actor in ``__init__`` (the reference's
    load-once singleton pattern, host_detector.py:21-45); ``__call__`` emits
    one row per (doc, band): (id, band, band_key, sig_bytes).
    """

    MERSENNE = (1 << 61) - 1

    def __init__(
        self,
        text_column: str = "text",
        id_column: str = "doc_id",
        num_perm: int = 64,
        bands: int = 16,
        shingle_k: int = 5,
        seed: int = 7,
    ) -> None:
        assert num_perm % bands == 0
        self.text_column = text_column
        self.id_column = id_column
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, self.MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, self.MERSENNE, size=num_perm, dtype=np.uint64)

    def _shingle_hashes(self, text: str) -> np.ndarray:
        b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        k = self.shingle_k
        if b.size < k:
            b = np.pad(b, (0, k - b.size))
        from numpy.lib.stride_tricks import sliding_window_view

        wins = sliding_window_view(b, min(k, b.size))
        # cheap polynomial hash of each shingle window, vectorized
        weights = (np.uint64(1099511628211) ** np.arange(wins.shape[1], dtype=np.uint64))
        with np.errstate(over="ignore"):
            h = (wins.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
        return np.unique(h)

    def signature(self, text: str) -> np.ndarray:
        sh = self._shingle_hashes(text)
        if sh.size == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) universal hashes, min per permutation
            prod = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(
                self.MERSENNE
            )
        return prod.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        ids = batch[self.id_column].to_pylist()
        n = len(texts)
        ids_out: list[Any] = []
        bands_out: list[int] = []
        keys_out: list[int] = []
        sigs_out: list[bytes] = []
        for i in range(n):
            t = texts[i]
            if not t:
                continue
            sig = self.signature(t)
            sig_bytes = sig.tobytes()
            band_view = sig.reshape(self.bands, self.rows_per_band)
            for b_i in range(self.bands):
                # order-free combine is fine within a fixed-size band
                key = (
                    int(pd.util.hash_array(band_view[b_i].copy()).sum())
                    & 0x7FFFFFFFFFFFFFFF
                )
                ids_out.append(ids[i])
                bands_out.append(b_i)
                keys_out.append(key)
                sigs_out.append(sig_bytes)
        return pa.table(
            {
                self.id_column: pa.array(ids_out),
                "band": pa.array(bands_out, pa.int32()),
                "band_key": pa.array(keys_out, pa.int64()),
                "sig": pa.array(sigs_out, pa.binary()),
            }
        )


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs (id_a < id_b, est_jaccard ≥ threshold).

    Pipeline: actor-pool signatures → explode to band rows → groupby
    (band, band_key) → in-group pairs scored by signature agreement →
    groupby pair → max estimate (dedup across bands).
    """
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    band_rows = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            text_column=text_column, id_column=id_column, num_perm=num_perm,
            bands=bands, shingle_k=shingle_k,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "est_jaccard": pd.Series(dtype="float64")}
        )

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) >= 2:
            g = g.drop_duplicates(subset=[id_column])
        if len(g) < 2:
            return _empty_pairs()
        ids = g[id_column].to_numpy()
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for off, j_est in enumerate(agree):
                if j_est >= jaccard_threshold:
                    a, b = ids[i], ids[i + 1 + off]
                    if b < a:
                        a, b = b, a
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(float(j_est))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "est_jaccard": out_j})

    pairs = band_rows.groupby(["band", "band_key"]).map_groups(
        pairs_in_group, batch_format="pandas"
    )

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("est_jaccard", ascending=False).head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedup_pairs, batch_format="pandas")


# ----------------------------------------------------------------- SimHash


def simhash_column(texts: pa.Array | pa.ChunkedArray, seed: int = 11) -> np.ndarray:
    """64-bit SimHash per document over whitespace tokens (uint64 ndarray)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    out = np.zeros(len(texts), dtype=np.uint64)
    bit_cols = np.arange(64, dtype=np.uint64)
    for i, v in enumerate(texts):
        t = v.as_py()
        if not t:
            continue
        toks = np.array(t.lower().split(), dtype=object)
        if toks.size == 0:
            continue
        th = pd.util.hash_array(toks)
        bits = ((th[:, None] >> bit_cols[None, :]) & np.uint64(1)).astype(np.int64)
        counts = (2 * bits - 1).sum(axis=0)
        out[i] = np.packbits((counts > 0)[::-1]).view(">u8")[0]
    return out


class SimHasher:
    """Actor-pool stage emitting (id, simhash, 4×16-bit chunk keys)."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id") -> None:
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = simhash_column(batch[self.text_column])
        cols = {
            self.id_column: batch[self.id_column],
            "simhash": pa.array(sh.view(np.int64)),
        }
        for c in range(4):
            cols[f"chunk{c}"] = pa.array(
                ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int32)
            )
        return pa.table(cols)


def simhash_near_dups(
    ds: ray.data.Dataset,
    text_column: str = "text",
    id_column: str = "doc_id",
    max_hamming: int = 3,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole: with 4 chunks of 16 bits, any pair within Hamming ≤ 3 agrees
    on at least one whole chunk → 4 small groupbys on chunk value find all
    candidates; exact Hamming verifies. Requires max_hamming ≤ 3.
    """
    assert max_hamming <= 3, "4-chunk pigeonhole covers Hamming ≤ 3"
    if concurrency is None:
        concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    sigs = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_column=text_column, id_column=id_column),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        if len(g) > 1:
            g = g.drop_duplicates(subset=[id_column])
            ids = g[id_column].to_numpy()
            hs = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
            for i in range(len(ids)):
                x = hs[i + 1 :] ^ hs[i]
                # popcount via uint8 view
                ham = (
                    np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
                    if x.size
                    else np.array([], dtype=np.int64)
                )
                for off, d in enumerate(ham):
                    if d <= max_hamming:
                        a, b = ids[i], ids[i + 1 + off]
                        if b < a:
                            a, b = b, a
                        out_a.append(a)
                        out_b.append(b)
                        out_h.append(int(d))
        return pd.DataFrame(
            {"id_a": pd.Series(out_a, dtype="int64"),
             "id_b": pd.Series(out_b, dtype="int64"),
             "hamming": pd.Series(out_h, dtype="int64")}
        )

    chunk_pairs = [
        sigs.select_columns([id_column, "simhash", f"chunk{c}"])
        .groupby(f"chunk{c}")
        .map_groups(pairs_in_group, batch_format="pandas")
        for c in range(4)
    ]
    all_pairs = chunk_pairs[0]
    for p in chunk_pairs[1:]:
        all_pairs = all_pairs.union(p)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return all_pairs.groupby(["id_a", "id_b"]).map_groups(first, batch_format="pandas")


# ------------------------------------------------------------ n-gram Jaccard


def ngram_set(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity (verification kernel for LSH
    candidates — the tolerance-predicate pattern, metrics/aligner.py:251-295)."""
    sa, sb = ngram_set(a, n), ngram_set(b, n)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def verify_pairs_ngram_jaccard(
    ds: ray.data.Dataset,
    pairs: pd.DataFrame,
    text_column: str = "text",
    id_column: str = "doc_id",
    n: int = 3,
) -> pd.DataFrame:
    """Exact-Jaccard verification of a (small) candidate-pair set.

    Fetches only the involved documents via a broadcast id-set semi-join
    (never a full materialization), then scores pairs on the driver.
    """
    if not len(pairs):
        return pairs.assign(jaccard=pd.Series(dtype=float))
    wanted = set(pairs["id_a"]) | set(pairs["id_b"])
    id_arr = pa.array(sorted(wanted))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_column], value_set=id_arr))

    small = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    texts = dict(zip(small[id_column], small[text_column]))
    pairs = pairs.copy()
    pairs["jaccard"] = [
        ngram_jaccard(texts.get(a, ""), texts.get(b, ""), n)
        for a, b in zip(pairs["id_a"], pairs["id_b"])
    ]
    return pairs
