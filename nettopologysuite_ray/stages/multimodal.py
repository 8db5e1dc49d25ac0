"""Multimodal column stages: image/audio/video as opaque binary + metadata.

The decode kernels themselves are STUBS (no image/audio libraries in this
container — clearly marked, swap in PIL/librosa/pyav at deploy time); the
Ray-side plumbing is real and tested: schema contracts, actor-pool
signatures, batch sizing for large binary payloads, deterministic fake
features so downstream stages (dedup, ANN) can run end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("image", pa.binary()),       # opaque encoded bytes (jpeg/png/...)
        ("mime", pa.string()),
        ("width", pa.int32()),        # typed metadata travels beside payload
        ("height", pa.int32()),
    ]
)


class ImageDecodeStage:
    """Actor stage: decode + feature-extract image bytes.

    __init__ loads the (stubbed) decoder once per actor; __call__ maps a
    batch.  batch_size for this stage must be SMALL (payloads are large:
    size batch_size*avg_bytes*concurrency against worker heap — SURVEY.md
    'memory-aware').
    """

    def __init__(self, feature_dim: int = 16, real_decoder: bool = False):
        self.feature_dim = feature_dim
        if real_decoder:
            raise NotImplementedError(
                "image decoding requires PIL/opencv, not present in this "
                "container; deploy-time implementations plug in here"
            )
        self.decoder = self._fake_decode

    def _fake_decode(self, data: bytes) -> np.ndarray:
        # deterministic fake: hash bytes into a unit feature vector so
        # downstream dedup/ANN stages exercise real dataflow
        h = hashlib.sha256(data).digest()
        raw = np.frombuffer((h * ((self.feature_dim * 4) // len(h) + 1))[: self.feature_dim * 4], dtype=np.uint32)
        v = raw.astype(np.float64)
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.decoder(b) for b in batch["image"].to_pylist()]
        out = batch.drop_columns(["image"])  # drop the wide payload ASAP
        return out.append_column(
            "image_embedding", pa.array([f.tolist() for f in feats], type=pa.list_(pa.float64()))
        )


class FrameSampleStage:
    """Actor stage: sample frames from video bytes (stub decode).

    Output: one row per sampled frame with frame_idx + frame feature.
    """

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        blobs = batch["video"].to_pylist()
        out_id, out_frame, out_feat = [], [], []
        for i, blob in zip(ids, blobs):
            # stub: pretend the video has len(blob) // 1000 frames
            n_frames = max(1, len(blob) // 1000)
            for f in range(0, n_frames, self.every_n):
                out_id.append(i)
                out_frame.append(f)
                out_feat.append(float(int.from_bytes(hashlib.md5(blob + f.to_bytes(4, "little")).digest()[:4], "little")) / 2**32)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame, type=pa.int64()),
                "frame_feature": pa.array(out_feat, type=pa.float64()),
            }
        )


def synthesize_image_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake image rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    blobs = [rng.integers(0, 256, size=int(rng.integers(500, 4000)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "image": pa.array(blobs, type=pa.binary()),
            "mime": pa.array(["image/fake"] * n),
            "width": pa.array([64] * n, type=pa.int32()),
            "height": pa.array([64] * n, type=pa.int32()),
        }
    )
