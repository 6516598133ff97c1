"""Vectorized hashing and URL parsing kernels.

Reference analogs: payload sha256 hashing
(/root/reference/biosample_enricher/elevation/service.py:388-391, 443-446) and
coordinate/cache-key canonicalization (http_cache.py:20-44). Here the same
ideas become column kernels: content checksums for the byte-identical
text-per-url invariant, 64-bit hashes for shuffle keys / sketches, and URL →
domain extraction for referential checks (the webtext analog of the
geo_loc_name parser, metrics/evaluator.py:348-460).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_HASH_KEY = 0x9E3779B97F4A7C15  # fixed key → deterministic across processes/runs

# Bumped whenever hash64's VALUES change (not just its speed): checkpointed
# HLL sketch registers embed these hashes, so resume must not merge sketches
# produced by a different hash. v2 = buffer-level polynomial string hashing.
HASH_VERSION = 2


def _utf8_bytes_and_offsets(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy view of a string/binary column's data buffer + byte offsets.

    Nulls/empties become zero-length segments. Works for string,
    large_string, binary and large_binary (the no-pandas-round-trips rule,
    SURVEY.md §7.4)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = col.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype,
                            count=len(col) + 1, offset=col.offset * np.dtype(off_dtype).itemsize)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    offsets = offsets.astype(np.int64)
    # Rebase to the slice: a sliced array's offsets point into the PARENT
    # data buffer (offsets[0] > 0), and the buffer may extend past the last
    # doc. Without rebasing, downstream scans crash (negative doc_of_token)
    # or silently hash trailing sliced-off bytes into the last token.
    data = data[offsets[0] : offsets[-1]]
    offsets = offsets - offsets[0]
    return data, offsets


_POLY_B = np.uint64(0x9E3779B97F4A7C15 | 1)  # odd → invertible mod 2^64
_POLY_B_INV = np.uint64(pow(int(_POLY_B), -1, 1 << 64))


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64-style finalizer (vectorized, bijective)."""
    h = h.copy()
    h ^= h >> np.uint64(30)
    with np.errstate(over="ignore"):
        h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    with np.errstate(over="ignore"):
        h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


_POW_CACHE: dict[str, tuple[np.ndarray, np.ndarray]] = {}


def _pow_tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Grow-on-demand cached (B^i, B^-i) tables — input-independent, so each
    worker process amortizes them across every batch it ever sees. Both
    tables live under ONE key assigned atomically: concurrent tasks in a
    threaded worker otherwise race between the two writes (observed
    KeyError: 'inv' when a reader slipped in after "pows" landed)."""
    cached = _POW_CACHE.get("tables")
    if cached is None or cached[0].size < n:
        size = max(n, 1 << 20)
        # log-doubling build (p[k:2k] = p[:k] * B^k): ~20 vectorized
        # multiplies instead of an element-wise ufunc accumulate, which
        # numpy runs as a ~1 s scalar loop at 2^20 — this was the dominant
        # first-batch cost of every hashing actor (measured 950 ms → 3 ms)
        cached = (_pow_series(_POLY_B, size), _pow_series(_POLY_B_INV, size))
        _POW_CACHE["tables"] = cached
    return cached


def _pow_series(base: np.uint64, size: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(size-1)] mod 2^64 by log-doubling."""
    with np.errstate(over="ignore"):
        p = np.empty(size, dtype=np.uint64)
        p[0] = 1
        if size > 1:
            p[1] = base
        k = 2
        while k < size:
            m = min(k, size - k)
            bk = p[k - 1] * base
            np.multiply(p[:m], bk, out=p[k:k + m])
            k *= 2
    return p


def hash_segments(data: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Hash byte segments [starts[i], ends[i]) of ``data`` without creating
    Python objects: prefix polynomial sums mod 2^64 with an invertible base,
    so H(s..e) = (P[e] - P[s]) · B^{-s}, finalized with a 64-bit mixer.
    One O(n_bytes) pass regardless of segment count."""
    n = data.size
    if n == 0:
        return np.zeros(len(starts), dtype=np.uint64)
    pows, inv_pows = _pow_tables(n)
    with np.errstate(over="ignore"):
        terms = (data.astype(np.uint64) + np.uint64(1)) * pows[:n]
        prefix = np.concatenate([[np.uint64(0)], np.cumsum(terms, dtype=np.uint64)])
        raw = (prefix[ends] - prefix[starts]) * inv_pows[np.minimum(starts, n - 1)]
    return _mix64(raw)


# Pinned hash for empty strings. hash_segments gives mix64(0) == 0 for a
# zero-length segment, which would collide with the null sentinel (0) — so
# the string path rewrites empty rows to this nonzero constant, keeping
# empty != null while staying batch-composition-independent.
_EMPTY_SEGMENT_HASH = np.uint64(0xE2D67F7D4A6B93C5)

_HASH_WINDOW_BYTES = 1 << 20


def _hash_rows_windowed(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """hash_segments over whole rows, processed in ~1 MB byte-windows.

    The hash is content-only (positions cancel via B^-s), so windowing does
    not change values; it bounds the pow tables and the prefix/terms
    intermediates at ~window size instead of O(batch bytes) — a 16k-row
    batch of 3 KB texts would otherwise build 50M-entry pow tables per
    worker, and the intermediates would thrash the shared LLC across a
    24-actor pool (the round-2 fingerprint sub-chunking lesson)."""
    n = len(offsets) - 1
    if data.size <= _HASH_WINDOW_BYTES:
        return hash_segments(data, offsets[:-1], offsets[1:])
    out = np.empty(n, np.uint64)
    i = 0
    while i < n:
        j = int(np.searchsorted(offsets, offsets[i] + _HASH_WINDOW_BYTES,
                                side="right")) - 1
        j = min(max(j, i + 1), n)  # a single over-long row gets its own window
        s0 = offsets[i]
        out[i:j] = hash_segments(
            data[s0 : offsets[j]], offsets[i:j] - s0, offsets[i + 1 : j + 1] - s0
        )
        i = j
    return out


def hash64(values: pa.Array | pa.ChunkedArray | np.ndarray | list) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a column → uint64 ndarray.

    String/binary Arrow columns are hashed straight off the flat data buffer
    via ``hash_segments`` (prefix polynomial + mix64) — zero Python-object
    boxing in the exact-dedup / uniqueness / HLL hot paths (the round-2
    object-array path paid an object per row). Other dtypes use pandas'
    cython hasher. All paths are process-stable (fixed constants) — required
    for shuffle-key bucketing and HLL sketches merged across partitions.
    Nulls hash to 0.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        t = values.type
        if (pa.types.is_string(t) or pa.types.is_large_string(t)
                or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
            chunks = values.chunks if isinstance(values, pa.ChunkedArray) else [values]
            parts: list[np.ndarray] = []
            for ch in chunks:
                if len(ch) == 0:
                    continue
                data, offsets = _utf8_bytes_and_offsets(ch)
                if data.size == 0:
                    h = np.full(len(ch), _EMPTY_SEGMENT_HASH, np.uint64)
                else:
                    h = _hash_rows_windowed(data, offsets)
                    empty = np.diff(offsets) == 0
                    if empty.any():
                        h[empty] = _EMPTY_SEGMENT_HASH
                if ch.null_count:
                    null = np.asarray(
                        pc.is_null(ch).to_numpy(zero_copy_only=False), dtype=bool
                    )
                    h[null] = 0
                parts.append(h)
            if not parts:
                return np.empty(0, np.uint64)
            return np.concatenate(parts) if len(parts) > 1 else parts[0]
        arr = values.to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(values)
    if arr.dtype == object:
        mask = pd.isna(arr)
        if mask.any():
            arr = arr.copy()
            arr[mask] = ""
        out = pd.util.hash_array(arr, hash_key=f"{_HASH_KEY:032d}"[:16])
        if mask.any():
            out[mask] = 0
        return out
    return pd.util.hash_array(arr)


def sha256_column(values: pa.Array | pa.ChunkedArray) -> pa.Array:
    """sha256 hex digest per row of a string/binary column.

    sha256 has no vectorized kernel anywhere in the stack; this loops over the
    Arrow buffers directly (no pandas round-trip). Use only in the dedicated
    checksum stage, not in per-row hot checks.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    out = np.empty(len(values), dtype=object)
    sha = hashlib.sha256
    for i, v in enumerate(values):
        b = v.as_py()
        if b is None:
            out[i] = None
        else:
            if isinstance(b, str):
                b = b.encode("utf-8")
            out[i] = sha(b).hexdigest()
    return pa.array(out, type=pa.string())


def md5_column(values: pa.Array | pa.ChunkedArray) -> pa.Array:
    """md5 hex digest per row (oracle-friendly: DuckDB ships ``md5``)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    out = np.empty(len(values), dtype=object)
    md5 = hashlib.md5
    for i, v in enumerate(values):
        b = v.as_py()
        if b is None:
            out[i] = None
        else:
            if isinstance(b, str):
                b = b.encode("utf-8")
            out[i] = md5(b).hexdigest()
    return pa.array(out, type=pa.string())


_DOMAIN_PATTERN = r"^[a-z][a-z0-9+.-]*://(?P<domain>[^/:?#\s]+)"


def extract_domain(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized URL → registered host (webtext analog of M11 geo parser).

    ``https://sub.example.com:8080/path`` → ``sub.example.com``. Rows that do
    not look like URLs yield null.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    lowered = pc.utf8_lower(urls)
    extracted = pc.extract_regex(lowered, _DOMAIN_PATTERN)
    domain = pc.struct_field(extracted, "domain")
    # strip :port if captured via the non-slash class (pattern stops at ':')
    return pc.if_else(pc.is_valid(domain), domain, pa.scalar(None, pa.string()))


def canonicalize_url(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical URL form for dedup/cache keys (http_cache.py:20-44 analog):
    lowercase scheme+host, strip default ports, drop fragments, strip a
    single trailing slash from the path."""
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ext = pc.extract_regex(
        urls,
        r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/:?#\s]+)"
        r"(?::(?P<port>\d+))?(?P<rest>[^#\s]*)",
    )
    scheme = pc.utf8_lower(pc.struct_field(ext, "scheme"))
    host = pc.utf8_lower(pc.struct_field(ext, "host"))
    port = pc.struct_field(ext, "port")
    rest = pc.fill_null(pc.struct_field(ext, "rest"), "")
    # strip one trailing slash (empty path stays empty)
    rest = pc.replace_substring_regex(rest, r"/$", "")
    default_port = pc.or_kleene(
        pc.and_kleene(pc.equal(scheme, "http"), pc.equal(port, "80")),
        pc.and_kleene(pc.equal(scheme, "https"), pc.equal(port, "443")),
    )
    # RE2 yields "" (not null) for unmatched optional groups
    has_port = pc.greater(pc.utf8_length(pc.fill_null(port, "")), 0)
    keep_port = pc.and_kleene(has_port, pc.invert(pc.fill_null(default_port, False)))
    port_part = pc.if_else(
        keep_port,
        pc.binary_join_element_wise(pa.array([":"] * len(urls)),
                                    pc.fill_null(port, ""), ""),
        pa.scalar("", pa.string()),
    )
    joined = pc.binary_join_element_wise(
        scheme, pa.array(["://"] * len(urls)), host, port_part, rest, ""
    )
    return pc.if_else(pc.is_valid(scheme), joined, pa.scalar(None, pa.string()))


def extract_tld(domains: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Last dot-separated label of the domain (``example.com`` → ``com``)."""
    if isinstance(domains, pa.ChunkedArray):
        domains = domains.combine_chunks()
    ext = pc.extract_regex(domains, r"\.(?P<tld>[a-z0-9-]+)$")
    return pc.struct_field(ext, "tld")
