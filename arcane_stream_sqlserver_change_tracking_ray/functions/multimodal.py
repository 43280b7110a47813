"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns next
to typed metadata columns (the same pattern as the engine's ``html``
payload).  Decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages: the codec (a model, a decoder
context) is loaded ONCE per actor in ``__init__``; batches stay small
because each row may be tens of KB-MB.

The actual media codecs are NOT available in this environment, so the
decode step is STUBBED: ``decoder="real"`` raises ``NotImplementedError``
with the library it would use; ``decoder="fake"`` produces a
deterministic fake decode derived from the payload bytes (stable across
runs) so the Ray-side plumbing — schema, batch size, actor signature,
output layout — is real and tested end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from arcane_stream_sqlserver_change_tracking_ray.functions.text import (
    rolling_window_hashes,
)

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media", pa.binary()),
        pa.field("media_type", pa.string()),  # image/jpeg, audio/wav, video/mp4...
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def _content_hash(media: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Whole-payload polynomial rolling hash mod 2^64 (one vectorized
    pass; empty payloads hash to 0).  Same hash family as the text
    fingerprint, so every fake-decode output is exactly replicable in
    SQL (HUGEINT list_reduce) — the stub stays oracle-checkable."""
    # k larger than any payload -> exactly one whole-payload window per
    # non-empty row, zero windows for empty rows
    h, offs = rolling_window_hashes(media, k=1 << 31)
    out = np.zeros(len(offs) - 1, np.uint64)
    out[np.diff(offs) > 0] = h
    return out


class DecodeImageStage:
    """binary -> decoded pixel tensor summary.

    Real path would use PIL/turbojpeg (not installed — stubbed).  The
    fake decoder emits deterministic (height, width, channels, mean
    pixel) derived from the content hash, preserving the exact output
    schema the real decoder would produce."""

    OUT_FIELDS = [
        ("decoded_h", pa.int32()),
        ("decoded_w", pa.int32()),
        ("channels", pa.int32()),
        ("mean_pixel", pa.float64()),
    ]

    def __init__(self, media_col: str = "media", decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError(
                "image decode requires PIL/libjpeg which is not available in "
                "this environment; use decoder='fake' for the deterministic stub"
            )
        self.media_col = media_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = _content_hash(batch[self.media_col])
        size = pc.binary_length(batch[self.media_col]).to_numpy(zero_copy_only=False)
        dh = (64 + (h % np.uint64(448))).astype(np.int32)
        dw = (64 + ((h >> np.uint64(16)) % np.uint64(448))).astype(np.int32)
        mean_pixel = np.round((h % np.uint64(255_000)).astype(np.float64) / 1000.0, 3)
        batch = batch.append_column("decoded_h", pa.array(dh))
        batch = batch.append_column("decoded_w", pa.array(dw))
        batch = batch.append_column("channels", pa.array(np.full(len(h), 3, np.int32)))
        batch = batch.append_column("mean_pixel", pa.array(mean_pixel))
        return batch.append_column("n_bytes", pa.array(size.astype(np.int64)))


class ResizeStage:
    """Resize metadata transform (the real kernel would rescale pixels;
    the plumbing — target size config, aspect handling — is real)."""

    def __init__(self, target: tuple[int, int] = (224, 224)):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        batch = batch.append_column(
            "resized_h", pa.array(np.full(n, self.target[0], np.int32))
        )
        return batch.append_column(
            "resized_w", pa.array(np.full(n, self.target[1], np.int32))
        )


class FrameSampleStage:
    """video binary -> k sampled frame offsets (deterministic): emits one
    output row PER FRAME (flat_map-shaped: n_rows -> n_rows * k)."""

    def __init__(self, media_col: str = "media", frames: int = 4):
        self.media_col = media_col
        self.frames = frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = np.repeat(np.arange(n), self.frames)
        frame_no = np.tile(np.arange(self.frames), n)
        h = _content_hash(batch[self.media_col])[idx]
        offset_ms = ((h % np.uint64(10_000)).astype(np.int64) * (frame_no + 1)) // self.frames
        out = batch.take(pa.array(idx))
        out = out.append_column("frame_no", pa.array(frame_no.astype(np.int32)))
        return out.append_column("frame_offset_ms", pa.array(offset_ms))


class FeatureExtractStage:
    """binary -> embedding (list<float>).  Real path = a vision/audio
    model loaded once per actor; stub = deterministic pseudo-embedding
    seeded by the content hash (stable across runs and batch splits)."""

    def __init__(self, media_col: str = "media", dim: int = 64, model: str = "fake"):
        if model == "real":
            raise NotImplementedError(
                "feature extraction requires a vision model (torch/onnx) not "
                "available here; use model='fake' for the deterministic stub"
            )
        self.media_col = media_col
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = _content_hash(batch[self.media_col])
        n = len(h)
        # deterministic per-row embedding: mix(content_hash, j)
        j = np.arange(self.dim, dtype=np.uint64)
        with np.errstate(over="ignore"):
            m = h[:, None] * np.uint64(0x9E3779B97F4A7C15) + (j[None, :] + np.uint64(1)) * np.uint64(
                0xBF58476D1CE4E5B9
            )
            m ^= m >> np.uint64(31)
        emb = ((m % np.uint64(2_000_001)).astype(np.float32) / 1_000_000.0) - 1.0
        flat = pa.array(emb.reshape(-1))
        offsets = pa.array(np.arange(0, (n + 1) * self.dim, self.dim, dtype=np.int32))
        return batch.append_column(
            "embedding", pa.ListArray.from_arrays(offsets, flat)
        )


def media_pipeline(ds, decode=True, resize=(224, 224), features_dim=64, batch_size=256, concurrency=(1, 8)):
    """The canonical multimodal chain as actor-pool stages: decode ->
    resize -> feature-extract.  Small batch_size because payload rows
    are large (SURVEY guidance: batch x concurrency must fit heap); the
    pool autoscales 1..8 actors per stage so warmup stays cheap on small
    inputs while a wide scan fans out."""
    if decode:
        ds = ds.map_batches(
            DecodeImageStage, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency,
        )
    if resize:
        ds = ds.map_batches(
            ResizeStage, fn_constructor_kwargs={"target": resize},
            batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
        )
    if features_dim:
        ds = ds.map_batches(
            FeatureExtractStage, fn_constructor_kwargs={"dim": features_dim},
            batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
        )
    return ds
