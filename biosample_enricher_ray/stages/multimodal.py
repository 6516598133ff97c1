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
