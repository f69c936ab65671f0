"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with typed
metadata columns next to them. The Ray-side plumbing — schema, actor-pool
stage with once-per-actor model setup, bounded batch sizes for large
payloads, scalar feature output — is real and tested; the actual
image/audio DECODE is stubbed (the codec libraries are not in this
container) behind ``decode_image``, which raises NotImplementedError unless
PIL is importable.

The synthetic payload derives deterministically from the documents table
(payload = utf-8 bytes of the text), so the feature query has an exact
DuckDB mirror.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from .entry_queries import register
from ..rayenv import remote_kwargs

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_type", pa.string()),
        ("payload", pa.large_binary()),
        ("payload_len", pa.int64()),
    ]
)

#: large binary payloads need small batches: batch_bytes ~ batch_size x payload
MEDIA_BATCH_SIZE = 256


def attach_payload_batch(batch: pa.Table) -> pa.Table:
    """documents -> media table with an opaque binary payload column."""
    texts = batch.column("text").to_pylist()
    payloads = [t.encode("utf-8") for t in texts]
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(["text/plain"] * len(payloads), pa.string()),
            pa.array(payloads, pa.large_binary()),
            pa.array([len(p) for p in payloads], pa.int64()),
        ],
        schema=MEDIA_SCHEMA,
    )


def decode_image(payload: bytes):
    """STUB: real decode needs an image codec not present in this container."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL; not available in this environment"
        ) from exc
    raise NotImplementedError("decode wiring lands when a codec is available")


class MediaFeatureExtractor:
    """Actor-pool stage: 'model' built once per actor in __init__ (here a
    deterministic projection matrix standing in for a feature network);
    __call__ computes per-payload features vectorized over the batch."""

    EMBED_DIM = 16

    def __init__(self, seed: int = 7):
        rng = np.random.RandomState(seed)
        # stand-in for loading model weights — once per actor, NOT per batch
        self.proj = rng.standard_normal((256, self.EMBED_DIM))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        digests = [hashlib.sha256(p).hexdigest() for p in payloads]
        # byte-histogram -> projected fake embedding (deterministic)
        embeds = []
        for p in payloads:
            hist = np.bincount(
                np.frombuffer(p, dtype=np.uint8), minlength=256
            ).astype(np.float64)
            embeds.append(np.round(hist @ self.proj, 6).tolist())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "payload_len": batch.column("payload_len"),
                "sha256": pa.array(digests, pa.string()),
                "embedding": pa.array(embeds, pa.list_(pa.float64())),
            }
        )


class ImageResizer:
    """Actor-pool resize stage. Real decode->resize->encode needs a codec
    (stubbed in decode_image); the DETERMINISTIC FAKE treats the payload as a
    1-D byte image and strided-samples it to a fixed TARGET_BYTES thumbnail,
    so schema, batch sizing, and output layout are exercised for real."""

    TARGET_BYTES = 64

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        thumbs = []
        for p in payloads:
            if len(p) == 0:
                thumbs.append(b"")
                continue
            idx = np.linspace(0, len(p) - 1, num=min(self.TARGET_BYTES, len(p)))
            thumbs.append(np.frombuffer(p, np.uint8)[idx.astype(np.int64)].tobytes())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_type": batch.column("media_type"),
                "thumb": pa.array(thumbs, pa.large_binary()),
                "thumb_len": pa.array([len(t) for t in thumbs], pa.int64()),
            }
        )


class FrameSampler:
    """Actor-pool frame-sampling stage: payload = concatenated fixed-size
    frames; emit every STRIDE-th frame as its own row (flat-map fan-out, the
    video-pipeline shape). Deterministic fake pending real codecs."""

    FRAME_BYTES = 32
    STRIDE = 4

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_no, frames = [], [], []
        for doc_id, p in zip(
            batch.column("doc_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            n_frames = len(p) // self.FRAME_BYTES
            for f in range(0, n_frames, self.STRIDE):
                ids.append(doc_id)
                frame_no.append(f)
                frames.append(p[f * self.FRAME_BYTES : (f + 1) * self.FRAME_BYTES])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_no, pa.int64()),
                "frame": pa.array(frames, pa.large_binary()),
            }
        )


def _media_ds(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(attach_payload_batch, batch_format="pyarrow", **remote_kwargs())


def q_media_resize(sf_dir: str):
    """(doc_id, thumb_len) through the actor-pool resize stage."""
    return (
        _media_ds(sf_dir)
        .map_batches(
            ImageResizer,
            batch_format="pyarrow",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=(1, 4),
            **remote_kwargs(),
        )
        .select_columns(["doc_id", "thumb_len"])
    )


def q_media_frames(sf_dir: str):
    """(doc_id, frame_no) rows from the frame-sampling flat-map."""
    return (
        _media_ds(sf_dir)
        .map_batches(
            FrameSampler,
            batch_format="pyarrow",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=(1, 4),
            **remote_kwargs(),
        )
        .select_columns(["doc_id", "frame_no"])
    )


# payloads are UTF-8 BYTES of text -> use octet_length, not char length,
# so the oracles hold for non-ASCII documents too
_RESIZE_SQL = (
    f"SELECT doc_id, least({ImageResizer.TARGET_BYTES},"
    " octet_length(encode(text))) AS thumb_len FROM documents"
)
_FRAMES_SQL = f"""
SELECT d.doc_id, t.f * {FrameSampler.STRIDE} AS frame_no
FROM documents d, LATERAL (
  SELECT unnest(range(
    CAST(ceil((octet_length(encode(text)) // {FrameSampler.FRAME_BYTES})
              / {FrameSampler.STRIDE}.0) AS BIGINT))) AS f) t
"""


def q_media_features(sf_dir: str):
    """(doc_id, payload_len, sha256) through the real actor-pool stage."""
    return (
        _media_ds(sf_dir)
        .map_batches(
            MediaFeatureExtractor,
            batch_format="pyarrow",
            batch_size=MEDIA_BATCH_SIZE,
            concurrency=(1, 4),
            **remote_kwargs(),
        )
        .select_columns(["doc_id", "payload_len", "sha256"])
    )


_MEDIA_SQL = (
    "SELECT doc_id, octet_length(encode(text)) AS payload_len,"
    " sha256(text) AS sha256 FROM documents"
)

register("multimodal_features", q_media_features, _MEDIA_SQL)
register("multimodal_resize", q_media_resize, _RESIZE_SQL)
register("multimodal_frame_sample", q_media_frames, _FRAMES_SQL)
