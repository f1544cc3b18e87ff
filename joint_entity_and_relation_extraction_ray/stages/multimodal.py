"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by actor-pool map_batches stages.

The container has no image/audio codecs, so the decode kernels are STUBBED
(driver brief: "STUB the decode step ... make the Ray-side plumbing real
and tested"):

- :class:`PayloadFeaturizer` — REAL plumbing: actor-pool stage, binary
  batches in, fixed-schema features out (byte length, sha256, an 8-dim
  deterministic fake feature vector derived from the digest).
- :func:`decode_image` / :func:`decode_audio` — the real-codec seams;
  they raise ``NotImplementedError`` unless the deterministic fake is
  requested explicitly.

Batch sizing note (at-scale): binary payloads dominate block size — run
this stage with a small ``batch_size`` (e.g. 32–128) and let Ray's
dynamic block splitting keep blocks under ``target_max_block_size``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
    ]
)

FEATURE_DIM = 8


def decode_image(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Seam for a real image decoder (PIL/cv2 not installed here)."""
    if not fake:
        raise NotImplementedError(
            "no image codec in this environment; pass fake=True for the "
            "deterministic surrogate"
        )
    return _fake_features(payload)


def decode_audio(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Seam for a real audio decoder (soundfile/librosa not installed)."""
    if not fake:
        raise NotImplementedError(
            "no audio codec in this environment; pass fake=True for the "
            "deterministic surrogate"
        )
    return _fake_features(payload)


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic 8-dim feature from the payload digest (unit-norm)."""
    d = hashlib.sha256(payload).digest()
    v = np.frombuffer(d[: FEATURE_DIM * 4], dtype="<u4").astype(np.float64)
    v = v / np.float64(2**32)
    n = np.linalg.norm(v)
    return v / (n if n else 1.0)


class PayloadFeaturizer:
    """Actor-pool stage: binary payload → (n_bytes, digest, feature).

    A real deployment loads the codec/model once here in ``__init__``
    (warm replica per actor) — exactly the TripleScorer pattern.
    """

    def __init__(self, use_fake_decoder: bool = True):
        self.use_fake = use_fake_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = [_fake_features(p) for p in payloads] if self.use_fake else [
            decode_image(p) for p in payloads
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "digest": pa.array(
                    [hashlib.sha256(p).hexdigest() for p in payloads],
                    pa.string(),
                ),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float64())
                ),
            }
        )


def featurize(
    media: ray.data.Dataset,
    *,
    concurrency: int = 4,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Run the featurizer actor pool over a MEDIA_SCHEMA dataset."""
    return media.map_batches(
        PayloadFeaturizer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
