"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBS (the image/audio codec libraries are
not available in this environment — see ``decode_image``): they either raise
``NotImplementedError`` or produce a deterministic fake feature vector so the
Ray-side plumbing — schema, batch sizing, actor signature, output layout —
is real and testable. Swap ``_decode_payload`` for a real codec (PIL,
torchaudio, pyav) to productionize; nothing else changes.

Scale notes: binary payloads are large, so stages here default to SMALL
``batch_size`` (payload bytes x batch_size x concurrency must fit worker
heap) and keep everything in ``batch_format="pyarrow"`` (binary columns do
not survive pandas object-dtype round-trips cheaply).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64(), nullable=False),
        pa.field("kind", pa.string(), nullable=False),      # image|audio|video
        pa.field("payload", pa.binary(), nullable=False),   # opaque encoded bytes
        pa.field("mime", pa.string(), nullable=True),
        pa.field("width", pa.int32(), nullable=True),
        pa.field("height", pa.int32(), nullable=True),
        pa.field("duration_ms", pa.int32(), nullable=True),
    ]
)

FEATURE_DIM = 64


def synthesize_media_table(n: int, *, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table for tests/benches (payload = seeded
    pseudo-random bytes; no external data)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)
    kind = kinds[rng.integers(0, 3, size=n)]
    payloads = [rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), type=pa.int64()),
            "kind": pa.array(kind, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "mime": pa.array(
                ["image/png" if k == "image" else
                 "audio/wav" if k == "audio" else "video/mp4" for k in kind]
            ),
            "width": pa.array(
                [64 if k == "image" else None for k in kind], type=pa.int32()
            ),
            "height": pa.array(
                [64 if k == "image" else None for k in kind], type=pa.int32()
            ),
            "duration_ms": pa.array(
                [None if k == "image" else 1000 for k in kind], type=pa.int32()
            ),
        }
    )


def decode_image(payload: bytes) -> np.ndarray:
    """STUB: real implementation would be PIL.Image.open(BytesIO(payload)).
    The codec libraries are not in this container."""
    raise NotImplementedError(
        "image decoding requires a codec library (e.g. PIL); "
        "use MediaFeaturizer(fake_decode=True) for plumbing tests"
    )


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake 'decoded feature': sha256-seeded unit vector —
    stable across processes, so tests can assert exact outputs."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


class MediaFeaturizer:
    """Actor-pool stage: binary payload -> feature vector + payload stats.

    Usage:
        ds.map_batches(MediaFeaturizer,
                       fn_constructor_kwargs={"fake_decode": True},
                       batch_format="pyarrow", batch_size=256,
                       concurrency=4, num_cpus=1)

    ``__init__`` is where a real model/codec would load (once per actor).
    """

    def __init__(self, fake_decode: bool = False, dim: int = FEATURE_DIM):
        self.fake = fake_decode
        self.dim = dim
        # real impl: self.model = load_model(...); self.codec = ...

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        if not self.fake:
            decode_image(payloads[0] if payloads else b"")  # raises
        feats = [_fake_feature(p, self.dim) for p in payloads]
        sizes = [len(p) for p in payloads]
        out = t.drop_columns(["payload"])  # features replace heavy bytes
        out = out.append_column(
            "payload_bytes", pa.array(sizes, type=pa.int64())
        )
        out = out.append_column(
            "feature",
            pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
        )
        return out


class FrameSampler:
    """Actor-pool stage: video payload -> K deterministic 'frame' payloads
    (flat_map-shaped: one output row per sampled frame). Real impl would use
    pyav; the sampling/fan-out plumbing is real."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for mid, kind, payload in zip(
            t["media_id"].to_pylist(), t["kind"].to_pylist(), t["payload"].to_pylist()
        ):
            if kind != "video":
                continue
            n = len(payload)
            for j in range(self.k):
                lo = (n * j) // self.k
                hi = (n * (j + 1)) // self.k
                ids.append(mid)
                frame_idx.append(j)
                frames.append(payload[lo:hi])  # stub 'frame' = byte slice
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "frame_payload": pa.array(frames, type=pa.binary()),
            }
        )
