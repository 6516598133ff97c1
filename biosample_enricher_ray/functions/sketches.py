"""Mergeable streaming sketches: HyperLogLog, TDigest, fixed-bucket Histogram.

The reference profiles collections with *exact* Python sets and Counters
(/root/reference/biosample_enricher/schema_statistics.py:68-150) — viable at
50k sampled docs, impossible at 10^12 rows. Per BASELINE.json north_star the
engine substitutes bounded-memory mergeable sketches: one sketch instance per
validator actor, updated per batch, serialized into per-partition checkpoint
records, merged on the driver (or in a tree) for the global profile.

All three sketches implement the same contract::

    s.update(numpy_values)      # vectorized batch update
    s.merge(other)              # in-place merge (same params)
    s.to_bytes() / from_bytes() # checkpoint serialization
"""

from __future__ import annotations

import io
import pickle

import numpy as np

# --------------------------------------------------------------------------- HLL


class HyperLogLog:
    """Dense HyperLogLog over pre-hashed uint64 values.

    Standard HLL (Flajolet et al.) with the small-range linear-counting
    correction. p=14 → 16 KiB of registers, ~0.8% relative error — fine for
    distinct-count *checks* (e.g. "distinct(lang) ≤ 200").
    """

    def __init__(self, p: int = 14) -> None:
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        h = np.asarray(hashes, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # rank = position of the leftmost 1-bit in the remaining 64-p bits
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # count leading zeros of `rest` via bit_length on the complement trick:
        # log2 of a uint64 is cheap with float conversion for values < 2^53;
        # use the exact integer path: 64 - floor(log2(rest)) - 1.
        # rest is never 0 (low bits forced to 1).
        hi = (rest >> np.uint64(32)).astype(np.uint32)
        lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        lz_hi = 32 - _bit_length_u32(hi)
        lz = np.where(hi != 0, lz_hi, 32 + (32 - _bit_length_u32(lo)))
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> None:
        if other.p != self.p:
            raise ValueError("cannot merge HLLs with different p")
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = float(self.m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        raw = _alpha(self.m) * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)  # linear counting
        return float(raw)

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        np.savez_compressed(buf, p=self.p, registers=self.registers)
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        npz = np.load(io.BytesIO(data))
        s = cls(p=int(npz["p"]))
        s.registers = npz["registers"].astype(np.uint8)
        return s


def _bit_length_u32(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint32 (0 → 0)."""
    out = np.zeros(x.shape, dtype=np.int64)
    nz = x != 0
    # uint32 fits exactly in float64 → frexp is exact
    _, exp = np.frexp(x[nz].astype(np.float64))
    out[nz] = exp
    return out


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


# ----------------------------------------------------------------------- TDigest


class TDigest:
    """Merging t-digest (Dunning) for streaming quantiles of a float column.

    Bounded number of centroids (≈ 2·delta); update sorts the incoming batch
    and re-clusters against existing centroids using the k1 scale function's
    size limit q(1-q). Accurate at the tails, mergeable across partitions.
    """

    def __init__(self, delta: int = 200) -> None:
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._min = np.inf
        self._max = -np.inf

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum())

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        if v.size > 4 * self.delta:
            # batch pre-cluster (vectorized): sort once, bucket by the k1
            # scale function k(q) = δ·(asin(2q−1)/π + ½), reduce each bucket
            # to (mean, weight) with reduceat — ≤ δ+1 clusters enter the
            # Python merge loop instead of every raw value (the loop was
            # ~1 µs/row, the dominant cost of the whole profile stage; this
            # is the canonical one-pass t-digest construction, same q(1−q)
            # size bound, merge error bounds unchanged)
            v = np.sort(v)
            q = (np.arange(v.size) + 0.5) / v.size
            k = np.floor(self.delta * (np.arcsin(2.0 * q - 1.0) / np.pi + 0.5))
            starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
            counts = np.diff(np.concatenate([starts, [v.size]]))
            bw = counts.astype(np.float64)
            bm = np.add.reduceat(v, starts) / bw
            self._compress(np.concatenate([self.means, bm]),
                           np.concatenate([self.weights, bw]))
        else:
            self._compress(np.concatenate([self.means, v]),
                           np.concatenate([self.weights, np.ones(v.size)]))

    def merge(self, other: "TDigest") -> None:
        if other.weights.size == 0:
            return
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._compress(np.concatenate([self.means, other.means]),
                       np.concatenate([self.weights, other.weights]))

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_means: list[float] = []
        out_weights: list[float] = []
        cum = 0.0  # weight before current cluster
        cur_m, cur_w = means[0], weights[0]
        for m, w in zip(means[1:], weights[1:]):
            q = (cum + cur_w / 2.0) / total
            limit = 4.0 * total * q * (1.0 - q) / self.delta
            if cur_w + w <= max(limit, 1.0):
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_means.append(cur_m)
                out_weights.append(cur_w)
                cum += cur_w
                cur_m, cur_w = m, w
        out_means.append(cur_m)
        out_weights.append(cur_w)
        self.means = np.asarray(out_means)
        self.weights = np.asarray(out_weights)

    def quantile(self, q: float) -> float:
        if self.weights.size == 0:
            return float("nan")
        if q <= 0:
            return self._min
        if q >= 1:
            return self._max
        target = q * self.total_weight
        cum = np.cumsum(self.weights) - self.weights / 2.0
        idx = np.searchsorted(cum, target)
        if idx == 0:
            lo_m, lo_c = self._min, 0.0
            hi_m, hi_c = self.means[0], cum[0]
        elif idx >= self.means.size:
            lo_m, lo_c = self.means[-1], cum[-1]
            hi_m, hi_c = self._max, self.total_weight
        else:
            lo_m, lo_c = self.means[idx - 1], cum[idx - 1]
            hi_m, hi_c = self.means[idx], cum[idx]
        if hi_c == lo_c:
            return float(lo_m)
        frac = (target - lo_c) / (hi_c - lo_c)
        return float(lo_m + frac * (hi_m - lo_m))

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {"delta": self.delta, "means": self.means, "weights": self.weights,
             "min": self._min, "max": self._max},
            protocol=pickle.HIGHEST_PROTOCOL,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        d = pickle.loads(data)
        s = cls(delta=d["delta"])
        s.means, s.weights = d["means"], d["weights"]
        s._min, s._max = d["min"], d["max"]
        return s


# --------------------------------------------------------------------- Histogram


class FixedHistogram:
    """Fixed-bucket histogram with under/overflow bins — drift-check input.

    Bucket edges are pinned by the baseline snapshot so current and baseline
    histograms are directly comparable (KS / PSI), mirroring the reference's
    before/after coverage matrices (metrics/reporter.py:28-143).
    """

    def __init__(self, edges: np.ndarray) -> None:
        self.edges = np.asarray(edges, dtype=np.float64)
        self.counts = np.zeros(len(self.edges) + 1, dtype=np.int64)

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        idx = np.searchsorted(self.edges, v, side="right")
        self.counts += np.bincount(idx, minlength=len(self.counts)).astype(np.int64)

    def merge(self, other: "FixedHistogram") -> None:
        if not np.array_equal(self.edges, other.edges):
            raise ValueError("cannot merge histograms with different edges")
        self.counts += other.counts

    @property
    def total(self) -> int:
        return int(self.counts.sum())

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        np.savez_compressed(buf, edges=self.edges, counts=self.counts)
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "FixedHistogram":
        npz = np.load(io.BytesIO(data))
        h = cls(npz["edges"])
        h.counts = npz["counts"].astype(np.int64)
        return h


def ks_statistic(a: FixedHistogram, b: FixedHistogram) -> float:
    """Two-sample KS statistic approximated over shared histogram buckets."""
    if a.total == 0 or b.total == 0:
        return float("nan")
    ca = np.cumsum(a.counts) / a.total
    cb = np.cumsum(b.counts) / b.total
    return float(np.abs(ca - cb).max())


def psi(current: FixedHistogram, baseline: FixedHistogram, eps: float = 1e-6) -> float:
    """Population Stability Index over shared buckets (standard formulation)."""
    if current.total == 0 or baseline.total == 0:
        return float("nan")
    p = np.maximum(current.counts / current.total, eps)
    q = np.maximum(baseline.counts / baseline.total, eps)
    return float(np.sum((p - q) * np.log(p / q)))


# ------------------------------------------------------------ heavy hitters


class MisraGries:
    """Misra-Gries heavy-hitter summary over string/object keys.

    Deterministic, mergeable, bounded at ``k`` counters. Guarantee: after
    observing n items, every key with true count > n/(k+1) is present, and
    for any tracked key  est <= true <= est + max_error  (``max_error``
    accumulates each truncation's decrement and adds under merge — so the
    bound stays valid for tree-merged partials, the same contract as the
    HLL/TDigest/Histogram family).

    Batch update is vectorized: callers pass pre-aggregated (keys, counts)
    (one ``value_counts`` per batch — the combiner-first rule), and the
    summary folds them in with a single pandas groupby-sum + partition
    around the (k+1)-th largest count.
    """

    def __init__(self, k: int = 1024) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.keys: np.ndarray = np.empty(0, dtype=object)
        self.counts: np.ndarray = np.empty(0, dtype=np.int64)
        self.max_error = 0
        self.n = 0

    def _fold(self, keys: np.ndarray, counts: np.ndarray) -> None:
        import pandas as pd

        if self.keys.size:
            keys = np.concatenate([self.keys, keys])
            counts = np.concatenate([self.counts, counts])
        s = pd.Series(counts).groupby(pd.Series(keys), sort=False).sum()
        kk = s.index.to_numpy(dtype=object)
        cc = s.to_numpy(dtype=np.int64)
        if kk.size > self.k:
            # decrement by the (k+1)-th largest count, drop non-positives —
            # one truncation instead of per-item decrements, same invariant
            cut = int(np.partition(cc, kk.size - (self.k + 1))[kk.size - (self.k + 1)])
            cc = cc - cut
            keep = cc > 0
            kk, cc = kk[keep], cc[keep]
            self.max_error += cut
        self.keys, self.counts = kk, cc

    def update(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        """Fold a batch in. ``values`` may be raw items (counted here) or
        pre-aggregated distinct keys with ``counts``."""
        values = np.asarray(values, dtype=object)
        if values.size == 0:
            return
        if counts is None:
            import pandas as pd

            vc = pd.Series(values).value_counts(sort=False)
            values = vc.index.to_numpy(dtype=object)
            counts = vc.to_numpy(dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
        self.n += int(counts.sum())
        self._fold(values, counts)

    def merge(self, other: "MisraGries") -> None:
        if other.k != self.k:
            raise ValueError("cannot merge MisraGries with different k")
        self.n += other.n
        self.max_error += other.max_error
        if other.keys.size:
            self._fold(other.keys, other.counts)

    def estimates(self) -> "tuple[np.ndarray, np.ndarray]":
        """(keys, estimated counts), descending by estimate then key."""
        order = np.lexsort((self.keys.astype(str), -self.counts))
        return self.keys[order], self.counts[order]

    def to_bytes(self) -> bytes:
        return pickle.dumps(
            {"k": self.k, "keys": list(self.keys), "counts": self.counts,
             "max_error": self.max_error, "n": self.n}
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "MisraGries":
        d = pickle.loads(b)
        mg = cls(k=d["k"])
        mg.keys = np.asarray(d["keys"], dtype=object)
        mg.counts = np.asarray(d["counts"], dtype=np.int64)
        mg.max_error = d["max_error"]
        mg.n = d["n"]
        return mg


# --------------------------------------------------------------------------- Bloom


class BloomFilter:
    """Bloom membership filter over pre-hashed uint64 values.

    The broadcast-side scale path for decontamination / semi-join probes:
    the exact fingerprint set of the small side costs 8 bytes per element to
    broadcast; at ~1% false-positive rate the Bloom bitset costs ~1.2 BYTES
    per element (m/n ≈ 9.6 bits, k = 7) — an ~6.7x smaller ``ray.put``
    payload that every map task reads zero-copy. False NEGATIVES are
    impossible by construction, so a Bloom-probed decontamination pass can
    never miss a contaminated doc; false positives only add rows to the
    flagged set (measured and gated in ``bloom_fpr_documents``).

    k index derivations per value use Kirsch–Mitzenmacher double hashing
    over the two 32-bit halves of the input (already avalanched upstream by
    ``hash_segments`` / ``hash64``): idx_i = (lo + i*odd(hi)) mod m.

    Same contract as the other sketches: vectorized ``update`` /
    ``contains``, ``merge`` (bitwise OR), ``to_bytes``/``from_bytes`` for
    checkpoints.
    """

    def __init__(self, n_expected: int, fp_rate: float = 0.01) -> None:
        if n_expected < 1:
            n_expected = 1
        if not 0.0 < fp_rate < 1.0:
            raise ValueError(f"fp_rate must be in (0,1), got {fp_rate}")
        ln2 = np.log(2.0)
        m = int(np.ceil(-n_expected * np.log(fp_rate) / (ln2 * ln2)))
        self.m = max(64, (m + 63) // 64 * 64)  # whole words
        self.k = max(1, int(round(self.m / n_expected * ln2)))
        self.n_expected = n_expected
        self.fp_rate = fp_rate
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    def _indices(self, values: np.ndarray) -> np.ndarray:
        """(len(values), k) bit indices via double hashing, vectorized."""
        v = np.ascontiguousarray(values, dtype=np.uint64)
        lo = v & np.uint64(0xFFFFFFFF)
        hi = (v >> np.uint64(32)) | np.uint64(1)  # odd => full-period stride
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return (lo[:, None] + i * hi[:, None]) % np.uint64(self.m)

    def update(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        idx = self._indices(values).ravel()
        word = (idx >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (idx & np.uint64(63))
        np.bitwise_or.at(self.bits, word, bit)

    def contains(self, values: np.ndarray) -> np.ndarray:
        """Vectorized membership probe -> bool mask (no false negatives)."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(values)
        word = (idx >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (idx & np.uint64(63))
        return ((self.bits[word] & bit) != 0).all(axis=1)

    def merge(self, other: "BloomFilter") -> None:
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("cannot merge BloomFilters with different params")
        self.bits |= other.bits

    def to_bytes(self) -> bytes:
        return pickle.dumps({"m": self.m, "k": self.k,
                             "n_expected": self.n_expected,
                             "fp_rate": self.fp_rate,
                             "bits": self.bits.tobytes()})

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        d = pickle.loads(data)
        bf = cls.__new__(cls)
        bf.m, bf.k = d["m"], d["k"]
        bf.n_expected, bf.fp_rate = d["n_expected"], d["fp_rate"]
        bf.bits = np.frombuffer(d["bits"], dtype=np.uint64).copy()
        return bf
