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


def hash64(values: pa.Array | pa.ChunkedArray | np.ndarray | list) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a column → uint64 ndarray.

    Uses pandas' cython string/object hasher (siphash-based) with a fixed key
    so results are stable across workers — required for shuffle-key salting
    and HLL sketches merged across partitions. Nulls hash to 0.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
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
