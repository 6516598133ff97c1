"""Multimodal column plumbing: binary payloads + typed metadata stages.

Treats image/audio/video as opaque ``binary`` columns with typed metadata,
exactly as the engine treats ``html`` (BASELINE.json input_hint). The Ray
plumbing — actor-pool signatures, small batch sizes for large rows, Arrow
schemas, output layout — is real and tested; the codec work itself is
STUBBED: the decode libraries are not in this container, so each stage
either runs a clearly-marked deterministic fake (for tests) or raises
``NotImplementedError`` (``use_fake_decoder=False``).

Reference analog: the provider plugin contract — abstract base + normalized
output schema + availability gate (/root/reference/biosample_enricher/
elevation/providers/base.py:12-98) — applied to media decoding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

IMAGE_META_SCHEMA = pa.schema(
    [
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("n_channels", pa.int8()),
        pa.field("format", pa.string()),
        pa.field("decode_ok", pa.bool_()),
    ]
)


class ImageDecoder:
    """Actor-pool stage: binary image payload → decoded metadata (+features).

    Use ``ds.map_batches(ImageDecoder, batch_size=64, concurrency=N)`` —
    batches stay small because rows are megabytes (same giant-row rule as the
    html column, FIXTURES.md §1).
    """

    def __init__(self, payload_column: str = "payload", use_fake_decoder: bool = True,
                 resize_to: tuple[int, int] | None = None) -> None:
        self.payload_column = payload_column
        self.use_fake_decoder = use_fake_decoder
        self.resize_to = resize_to
        if not use_fake_decoder:
            raise NotImplementedError(
                "real image decoding requires PIL/opencv, absent in this "
                "environment; run with use_fake_decoder=True"
            )

    def _fake_decode(self, payloads: list[bytes | None]) -> dict[str, list]:
        """Deterministic fake: dimensions derived from payload bytes so tests
        have stable expectations without a codec."""
        out = {"width": [], "height": [], "n_channels": [], "format": [],
               "decode_ok": []}
        for b in payloads:
            if not b:
                out["width"].append(None)
                out["height"].append(None)
                out["n_channels"].append(None)
                out["format"].append(None)
                out["decode_ok"].append(False)
                continue
            h = int.from_bytes(b[:4].ljust(4, b"\0"), "little")
            out["width"].append(64 + h % 1920)
            out["height"].append(64 + (h >> 11) % 1080)
            out["n_channels"].append(3)
            out["format"].append("fake/raw")
            out["decode_ok"].append(True)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_column].to_pylist()
        meta = self._fake_decode(payloads)
        for name in IMAGE_META_SCHEMA.names:
            batch = batch.append_column(
                name, pa.array(meta[name], IMAGE_META_SCHEMA.field(name).type)
            )
        return batch


class AudioFrameSampler:
    """Actor-pool stage: binary audio → fixed-rate frame features (stub).

    Emits one row per sampled frame (flat layout, explode-style) with a
    deterministic fake feature vector; the real DSP is NotImplemented.
    """

    def __init__(self, payload_column: str = "payload", id_column: str = "doc_id",
                 frame_hz: float = 1.0, n_mfcc: int = 4,
                 use_fake_decoder: bool = True) -> None:
        if not use_fake_decoder:
            raise NotImplementedError("real audio decoding not available here")
        self.payload_column = payload_column
        self.id_column = id_column
        self.frame_hz = frame_hz
        self.n_mfcc = n_mfcc

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, feats = [], [], []
        for rid, b in zip(batch[self.id_column].to_pylist(),
                          batch[self.payload_column].to_pylist()):
            if not b:
                continue
            n_frames = max(1, len(b) // 4096)  # fake: 4 KiB ≈ 1 second
            arr = np.frombuffer(b[: n_frames * 4], dtype=np.uint8, count=min(len(b), n_frames * 4))
            for f in range(n_frames):
                ids.append(rid)
                frames.append(f)
                seed = int(arr[f * 4 % max(len(arr), 1)]) if len(arr) else 0
                feats.append([float((seed + j) % 97) / 97.0 for j in range(self.n_mfcc)])
        return pa.table(
            {
                self.id_column: pa.array(ids),
                "frame": pa.array(frames, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class BinaryFeatures:
    """Actor-pool stage: REAL byte-level features for opaque binary columns
    (no codec needed, unlike the stubbed decoders above): exact byte count,
    distinct-byte count, Shannon entropy (bits/byte), and magic-byte format
    sniffing — the content-type gate a multimodal ingest runs before paying
    for a decode (corrupt/mislabeled payloads are filtered on these).

    Fully vectorized over the Arrow binary column's flat buffers: per-row
    256-bin histograms via ONE ``np.bincount`` per row-chunk (row chunks keep
    the scatter index cache-resident — the BASELINE.md sub-chunking rule),
    prefix sniffing via an (n, 8) gather. No per-row Python loop.

    Null payload → all-null features; empty payload → zeros with null
    entropy (undefined) and 'unknown' format.
    """

    MAGICS: tuple[tuple[bytes, str], ...] = (
        (b"\x89PNG\r\n\x1a\n", "png"),
        (b"\xff\xd8\xff", "jpeg"),
        (b"GIF87a", "gif"),
        (b"GIF89a", "gif"),
        (b"RIFF", "riff"),
        (b"%PDF", "pdf"),
        (b"PK\x03\x04", "zip"),
    )
    _PREFIX = 8

    def __init__(self, payload_column: str = "payload",
                 chunk_rows: int = 4096) -> None:
        self.payload_column = payload_column
        self.chunk_rows = chunk_rows
        self._magics = [(np.frombuffer(m, np.uint8), name)
                        for m, name in self.MAGICS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.payload_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
        raw_off = np.frombuffer(col.buffers()[1], off_dtype)
        offsets = raw_off[col.offset: col.offset + n + 1].astype(np.int64)
        data = np.frombuffer(col.buffers()[2], np.uint8)
        lengths = np.diff(offsets)
        is_null = col.is_null().to_numpy(zero_copy_only=False)

        n_distinct = np.zeros(n, np.int64)
        clogc = np.zeros(n, np.float64)
        for s in range(0, n, self.chunk_rows):
            e = min(s + self.chunk_rows, n)
            seg = data[offsets[s]: offsets[e]]
            if not len(seg):
                continue
            rid = np.repeat(np.arange(e - s, dtype=np.int64), lengths[s:e])
            hist = np.bincount(
                rid * 256 + seg, minlength=(e - s) * 256
            ).reshape(e - s, 256)
            n_distinct[s:e] = (hist > 0).sum(axis=1)
            c = hist.astype(np.float64)
            clogc[s:e] = np.where(
                hist > 0, c * np.log2(np.where(hist > 0, c, 1.0)), 0.0
            ).sum(axis=1)

        nb = lengths.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            entropy = np.where(lengths > 0, np.log2(np.maximum(nb, 1.0))
                               - clogc / np.maximum(nb, 1.0), np.nan)

        idx = offsets[:-1, None] + np.arange(self._PREFIX)
        valid = idx < offsets[1:, None]
        prefix = np.zeros((n, self._PREFIX), np.uint8)
        prefix[valid] = data[idx[valid]]
        sniffed = np.full(n, "unknown", dtype=object)
        unresolved = np.ones(n, bool)
        for m, name in self._magics:
            hit = unresolved & (lengths >= len(m)) \
                & (prefix[:, : len(m)] == m).all(axis=1)
            sniffed[hit] = name
            unresolved &= ~hit
        sniffed[is_null] = None

        mask = pa.array(~is_null)
        features = {
            "n_bytes": pc_if(mask, lengths, None, pa.int64()),
            "n_distinct_bytes": pc_if(mask, n_distinct, None, pa.int64()),
            "entropy": pc_if(pa.array(~is_null & (lengths > 0)), entropy,
                             None, pa.float64()),
            "sniffed_format": pa.array(sniffed, pa.string()),
        }
        for name, arr in features.items():
            batch = batch.append_column(name, arr)
        return batch


def pc_if(mask: pa.Array, values: "np.ndarray", _null, typ: pa.DataType) -> pa.Array:
    """Null-out positions where mask is False (binary-features null policy)."""
    import pyarrow.compute as _pc

    return _pc.if_else(mask, pa.array(values).cast(typ), pa.scalar(None, typ))
