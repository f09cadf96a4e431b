"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as Arrow ``binary`` columns with a small typed
metadata header; decode / feature-extract runs as an actor-pool
``map_batches`` stage with SMALL batches (payloads are orders of magnitude
wider than text rows — batch_size × payload × concurrency must fit the
worker heap; these stages stay in ``batch_format="pyarrow"`` end to end
because binary columns don't round-trip pandas cleanly).

No image/audio libraries exist in this environment, so the DECODE step is
stubbed: ``FakePayloadCodec`` implements a deterministic synthetic format
(8-byte header: width/height/channels/format-tag as uint16 LE + raw bytes);
``RealImageCodec.decode`` raises NotImplementedError with the dependency it
would use. The Ray-side plumbing — schemas, actor signature, batch sizing,
output layout — is real and tested, so swapping in a real codec is a
one-class change.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
from ..sources import read_parquet_clean as _read_parquet_clean

FORMAT_FAKE = 1


class FakePayloadCodec:
    """Deterministic stand-in codec for the sandbox (no PIL/ffmpeg here)."""

    @staticmethod
    def encode(doc_id: int, text: str) -> bytes:
        w = 16 + (doc_id % 48)
        h = 16 + (doc_id % 32)
        header = struct.pack("<HHHH", w, h, 3, FORMAT_FAKE)
        body = hashlib.sha256(text.encode("utf-8")).digest()
        reps = (w * h * 3) // len(body) + 1
        return header + (body * reps)[: w * h * 3]

    @staticmethod
    def decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
        w, h, c, fmt = struct.unpack("<HHHH", payload[:8])
        if fmt != FORMAT_FAKE:
            raise ValueError(f"unknown payload format tag {fmt}")
        pixels = np.frombuffer(payload[8 : 8 + w * h * c], dtype=np.uint8)
        return w, h, c, pixels


class RealImageCodec:
    """The production codec slot — requires an image library."""

    @staticmethod
    def decode(payload: bytes):  # pragma: no cover - documented stub
        raise NotImplementedError(
            "real image decode needs PIL/opencv (not installed in this "
            "sandbox); plug a codec with decode(bytes) -> (w, h, c, ndarray) "
            "into ImageFeaturizer(codec=...)"
        )


def attach_fake_payloads(sf_dir: str):
    """documents → (doc_id, payload: binary) — the synthetic media corpus."""
    import ray.data

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def encode(batch: pa.Table) -> pa.Table:
        payloads = [
            FakePayloadCodec.encode(int(d), t)
            for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist())
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    return ds.map_batches(encode, batch_format="pyarrow")


class ImageFeaturizer:
    """Actor-pool stage: decode payload → (dims, 16-bin byte histogram).

    Codec/state loads once per actor in ``__init__`` (the real-codec slot is
    where a model or decoder init would live); ``__call__`` is per batch.
    """

    def __init__(self, codec=None):
        self.codec = codec or FakePayloadCodec

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, c, pixels = self.codec.decode(payload)
            hist, _ = np.histogram(pixels, bins=16, range=(0, 256))
            total = max(1, hist.sum())
            widths.append(w)
            heights.append(h)
            feats.append((hist / total).astype(np.float32))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


def image_features(sf_dir: str, *, batch_size: int = 256, concurrency=(1, 4)):
    """Full multimodal pipeline: attach payloads → actor-pool featurize.

    Small batch_size on purpose: payload rows are wide; see module doc.
    """
    return attach_fake_payloads(sf_dir).map_batches(
        ImageFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
