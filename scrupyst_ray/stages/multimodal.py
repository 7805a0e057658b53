"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The container has no image/audio libraries, so the DECODE step is stubbed
behind an import-try (PIL if ever present, else a deterministic fake); the
Ray-side plumbing — schema, actor-pool stage, batch sizing, output layout —
is real and tested.  Pattern: payloads are large, so the stage runs as an
actor pool with SMALL batches (``batch_size≈32``) and the "model" is loaded
once per actor in ``__init__`` (never per batch).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: BLAKE2b bytes →
    unit-norm float32 vector.  Replace with PIL/torchvision decode when the
    libraries exist (the stage contract is unchanged)."""
    raw = blake2b(payload, digest_size=dim * 4).digest()
    v = np.frombuffer(raw, dtype=np.uint32).astype(np.float32)
    v = (v / np.float32(2**32)) - np.float32(0.5)
    n = float(np.linalg.norm(v))
    return v / (n or 1.0)


class MediaFeatureExtractor:
    """Actor-pool ``map_batches`` stage: binary payload → feature vector.

    Use:  ds.map_batches(MediaFeatureExtractor, batch_size=32,
                         concurrency=N, batch_format="pyarrow")
    """

    def __init__(self, feature_dim: int = FEATURE_DIM):
        self.feature_dim = feature_dim
        try:  # real decoder if the environment ever provides one
            from PIL import Image  # noqa: F401

            self._have_pil = True
        except ImportError:
            self._have_pil = False
        # "model load" happens here, once per actor

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self._have_pil and media_type == "image":
            raise NotImplementedError(
                "real image decode path: PIL present but intentionally "
                "unwired in this sandbox build"
            )
        return _fake_decode_features(payload or b"", self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        types = batch["media_type"].to_pylist()
        feats = np.stack(
            [self._decode(p, t) for p, t in zip(payloads, types)]
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "feature": pa.array(
                    feats.tolist(), pa.list_(pa.float32(), self.feature_dim)
                ),
                "payload_bytes": pa.array(
                    [len(p or b"") for p in payloads], pa.int64()
                ),
            }
        )


def documents_as_media(sf_dir: str):
    """Adapter for tests/queries: wrap the documents table's text bytes as
    fake media payloads with typed metadata (the driver testdata has no
    binary media column)."""
    import os

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def wrap(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        payloads = [t.encode() for t in b["text"].to_pylist()]
        kinds = ["image", "audio", "video"]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(
                    [kinds[i % 3] for i in ids], pa.string()
                ),
                "payload": pa.array(payloads, pa.binary()),
                "meta_width": pa.array([64] * len(ids), pa.int32()),
                "meta_height": pa.array([64] * len(ids), pa.int32()),
                # deterministic nonzero durations for the timed media kinds
                # (exercises FrameSampler's timestamp math)
                "meta_duration_ms": pa.array(
                    [
                        0 if kinds[i % 3] == "image" else 1000 + (i % 7) * 500
                        for i in ids
                    ],
                    pa.int32(),
                ),
            },
            schema=MEDIA_SCHEMA,
        )

    return ds.map_batches(wrap, batch_format="pyarrow")


def media_features(sf_dir: str):
    """The multimodal pipeline: media table → actor-pool feature extraction
    (small batches — payloads are 'large')."""
    return documents_as_media(sf_dir).map_batches(
        MediaFeatureExtractor,
        batch_size=32,
        concurrency=2,
        batch_format="pyarrow",
    ).sort("media_id")


class FrameSampler:
    """Actor-pool ``map_batches`` stage: media row → sampled frame rows.

    video/audio rows explode into *n_frames* evenly-spaced frames (byte
    slices of the payload in this stub — a real build decodes with
    ffmpeg/torchvision and emits encoded frames; the schema, explode
    fan-out, actor signature and timestamp math are the real contract);
    image rows pass through as a single frame at ts 0.

    Use:  ds.map_batches(FrameSampler, batch_size=32, concurrency=N,
                         batch_format="pyarrow")
    """

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames
        # "codec load" happens here, once per actor
        try:
            import av  # noqa: F401  (PyAV, absent in this sandbox)

            self._have_codec = True
        except ImportError:
            self._have_codec = False

    def _slices(self, payload: bytes, k: int) -> list[bytes]:
        n = len(payload)
        bounds = [n * i // k for i in range(k + 1)]
        return [payload[bounds[i] : bounds[i + 1]] for i in range(k)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, types, idxs, tss, sizes, digests = [], [], [], [], [], []
        for mid, mtype, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta_duration_ms"].to_pylist(),
        ):
            payload = payload or b""
            if mtype == "image":
                frames = [payload]
            else:
                frames = self._slices(payload, self.n_frames)
            k = len(frames)
            for i, fr in enumerate(frames):
                ids.append(mid)
                types.append(mtype)
                idxs.append(i)
                tss.append((dur or 0) * i // k)
                sizes.append(len(fr))
                digests.append(blake2b(fr, digest_size=8).hexdigest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_ts_ms": pa.array(tss, pa.int64()),
                "frame_bytes": pa.array(sizes, pa.int64()),
                "frame_digest": pa.array(digests, pa.string()),
            }
        )


def media_frames(sf_dir: str, n_frames: int = 4):
    """Frame-sampling pipeline: media table → actor-pool frame explode."""
    return (
        documents_as_media(sf_dir)
        .map_batches(
            FrameSampler,
            fn_constructor_kwargs={"n_frames": n_frames},
            batch_size=32,
            concurrency=2,
            batch_format="pyarrow",
        )
        .sort(["media_id", "frame_idx"])
    )
