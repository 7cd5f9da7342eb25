"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The image/audio codecs are NOT in this container, so the decode kernels are
STUBBED (clearly marked) behind deterministic fakes; the Ray-side plumbing —
schema, batch sizing for large binary payloads, actor signature, output
layout — is real and tested (tests/test_multimodal.py). Swap `_decode_*`
for PIL/libav calls on a real cluster.

The reference's only multimodal operator is EXIF metadata extraction
(image_loader.py:24-76, SURVEY.md §2.1 S10); the resize/feature/frame-sample
stages are the scale additions a training-data pipeline needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("mime_type", pa.string()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB: deterministic fake decode (replace with PIL.Image.open).

    Produces an 8x8 grayscale 'image' derived from the payload hash so
    downstream feature math is exercised with stable values."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer((h * 2)[:64], dtype=np.uint8).reshape(8, 8).astype(np.float32)


def _decode_audio_stub(payload: bytes, n_samples: int = 256) -> np.ndarray:
    """STUB: deterministic fake PCM decode (replace with soundfile/libav)."""
    h = hashlib.sha256(payload).digest()
    reps = -(-n_samples // len(h))
    return (np.frombuffer(h * reps, dtype=np.uint8)[:n_samples].astype(np.float32) - 127.5) / 127.5


class ImageFeatures:
    """Actor-pool stage: binary image column -> feature columns.

    Real plumbing: constructor-held 'model' state (here a fixed projection
    matrix as the stand-in for a vision encoder), small batch sizes for
    wide binary rows, arrow-native output."""

    def __init__(self, feat_dim: int = 16, seed: int = 3):
        rng = np.random.RandomState(seed)
        self.proj = rng.standard_normal((64, feat_dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, means = [], []
        for payload in batch["payload"].to_pylist():
            img = _decode_image_stub(payload or b"")
            flat = img.reshape(-1)
            feats.append((flat @ self.proj).tolist())
            means.append(float(flat.mean()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mean_intensity": pa.array(means, pa.float64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class ImageResize:
    """Actor-pool stage: resize stub — emits (media_id, payload, width,
    height) with the target dims recorded; payload passthrough (a real
    implementation re-encodes)."""

    def __init__(self, width: int = 224, height: int = 224):
        self.width, self.height = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": batch["payload"],
                "width": pa.array([self.width] * n, pa.int32()),
                "height": pa.array([self.height] * n, pa.int32()),
            }
        )


class AudioFeatures:
    """Actor-pool stage: binary audio -> (media_id, rms, zero_crossings)."""

    def __init__(self, n_samples: int = 256):
        self.n_samples = n_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, zc = [], []
        for payload in batch["payload"].to_pylist():
            pcm = _decode_audio_stub(payload or b"", self.n_samples)
            rms.append(float(np.sqrt((pcm**2).mean())))
            zc.append(int(((pcm[:-1] * pcm[1:]) < 0).sum()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "rms": pa.array(rms, pa.float64()),
                "zero_crossings": pa.array(zc, pa.int32()),
            }
        )


def frame_sample(ds: Dataset, every_ms: int = 1000, concurrency: int | None = None) -> Dataset:
    """Video frame sampling stub: explodes each video row into frame rows
    at ``every_ms`` intervals of its duration (payload decode stubbed; the
    explode/row-accounting plumbing is real). Stateless explode -> task
    pool (``concurrency`` caps workers; None lets the executor decide)."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, frame_idx, ts_ms = [], [], []
        for mid, dur in zip(batch["media_id"].to_pylist(), batch["duration_ms"].to_pylist()):
            n = max(1, int(dur or 0) // every_ms)
            for i in range(n):
                ids.append(mid)
                frame_idx.append(i)
                ts_ms.append(i * every_ms)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "ts_ms": pa.array(ts_ms, pa.int32()),
            }
        )

    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(explode, batch_format="pyarrow", batch_size=16, zero_copy_batch=True, **kw)


def image_feature_pipeline(ds: Dataset, concurrency=(1, 4), batch_size: int = 16) -> Dataset:
    """Flagship multimodal plumbing: small batches (wide binary rows),
    actor pool with constructor-held encoder state."""
    return ds.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
