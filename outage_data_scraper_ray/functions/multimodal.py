"""Multimodal plumbing: opaque binary media columns with typed metadata.

The reference's only media artifacts are tile/report URL refs (per_media,
ga_scraper.py:432-434); this module supplies the engine-side plumbing a
training-data pipeline needs for real media: a deterministic synthetic
media table (binary payload + metadata), and decode / feature / resize
stages shaped as actor-pool map_batches over Arrow binary columns.

Image/audio codecs are NOT in this container, so the actual decode is
stubbed: DecodeStage(fake=True) parses our deterministic 16-byte header
(magic, width, height, channels) instead; DecodeStage(fake=False) raises
NotImplementedError("no image codec in sandbox"). Everything around the
stub — schema, batch sizing, actor signature, output layout — is real and
tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_MAGIC = b"SYNI"


def synth_media(n: int = 200, seed: int = 42) -> pa.Table:
    """Deterministic media table: (media_id, kind, payload: binary, meta)."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads, widths, heights = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(16, 256))
        h = int(rng.integers(16, 256))
        body_len = int(rng.integers(64, 2048))
        header = _MAGIC + np.array([w, h, 3], dtype=np.uint32).tobytes()
        body = rng.integers(0, 256, size=body_len, dtype=np.uint8).tobytes()
        ids.append(f"m{i:06d}")
        kinds.append("image" if i % 4 else "audio")
        payloads.append(header + body)
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, type=pa.binary()),
            "width_meta": pa.array(widths, type=pa.int32()),
            "height_meta": pa.array(heights, type=pa.int32()),
        }
    )


class DecodeStage:
    """Actor-pool decode: one codec 'session' per actor.

    fake=True parses the deterministic synthetic header; fake=False is the
    real-codec slot (PIL/libav) and raises in this sandbox."""

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError("no image/audio codec available in this sandbox")
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths = np.empty(len(payloads), dtype=np.int32)
        heights = np.empty(len(payloads), dtype=np.int32)
        ok = np.empty(len(payloads), dtype=bool)
        for i, p in enumerate(payloads):
            if p[:4] == _MAGIC:
                w, h, _c = np.frombuffer(p[4:16], dtype=np.uint32)
                widths[i], heights[i], ok[i] = w, h, True
            else:
                widths[i], heights[i], ok[i] = 0, 0, False
        return (
            batch.drop_columns(["payload"])
            .append_column("width", pa.array(widths))
            .append_column("height", pa.array(heights))
            .append_column("decoded_ok", pa.array(ok))
        )


class FeatureStage:
    """Actor-pool feature extraction stub: deterministic 8-dim payload
    histogram features (a stand-in for a real model's embedding)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.empty((len(payloads), 8), dtype=np.float32)
        for i, p in enumerate(payloads):
            arr = np.frombuffer(p[16:], dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=8, range=(0, 256))
            feats[i] = hist / max(1, arr.size)
        return batch.drop_columns(["payload"]).append_column(
            "features", pa.array(list(feats), type=pa.list_(pa.float32()))
        )


class ResizeStage:
    """Actor-pool resize stub: computes aspect-preserving target dims to fit
    ``max_side`` and emits a new payload whose header carries the target
    dims and whose body is a deterministic stride subsample of the original
    bytes (a real codec resamples pixels; the Ray-side contract — binary in,
    smaller binary out, dims in the header — is identical)."""

    def __init__(self, max_side: int = 64, fake: bool = True):
        if not fake:
            raise NotImplementedError("no image codec available in this sandbox")
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        out_payloads: list[bytes] = []
        out_w = np.empty(len(payloads), dtype=np.int32)
        out_h = np.empty(len(payloads), dtype=np.int32)
        for i, p in enumerate(payloads):
            if p[:4] != _MAGIC:
                out_payloads.append(p)
                out_w[i] = out_h[i] = 0
                continue
            w, h, c = np.frombuffer(p[4:16], dtype=np.uint32)
            scale = min(1.0, self.max_side / max(int(w), int(h), 1))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            body = np.frombuffer(p[16:], dtype=np.uint8)
            stride = max(1, int(round(1.0 / max(scale, 1e-9))))
            new_body = body[::stride].tobytes()
            header = _MAGIC + np.array([nw, nh, c], dtype=np.uint32).tobytes()
            out_payloads.append(header + new_body)
            out_w[i], out_h[i] = nw, nh
        return (
            batch.drop_columns(["payload"])
            .append_column("payload", pa.array(out_payloads, type=pa.binary()))
            .append_column("width", pa.array(out_w))
            .append_column("height", pa.array(out_h))
        )


def resize_media(
    media: rd.Dataset, max_side: int = 64, concurrency: int = 2
) -> rd.Dataset:
    return media.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"max_side": max_side, "fake": True},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


_FRAME_BYTES = 256


def frame_sample(media: rd.Dataset, every: int = 4) -> rd.Dataset:
    """Frame sampling for audio/video payloads: the body is treated as a
    sequence of fixed-size frames; every ``every``-th frame becomes its own
    output row (media_id, frame_idx, frame: binary). Columnar explode —
    offsets computed per batch, one pass, no Python row objects in the
    output construction."""

    def _sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_ids: list[str] = []
        out_idx: list[int] = []
        out_frames: list[bytes] = []
        for mid, p in zip(ids, payloads):
            body = p[16:] if p[:4] == _MAGIC else p
            n_frames = max(1, -(-len(body) // _FRAME_BYTES))
            for f in range(0, n_frames, every):
                out_ids.append(mid)
                out_idx.append(f)
                out_frames.append(body[f * _FRAME_BYTES : (f + 1) * _FRAME_BYTES])
        return pa.table(
            {
                "media_id": pa.array(out_ids, pa.string()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "frame": pa.array(out_frames, pa.binary()),
            }
        )

    return media.map_batches(_sample, batch_format="pyarrow", batch_size=64)


def decode_media(media: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    """Binary payloads are large: small batch_size so batch x concurrency
    stays inside a worker heap (ray_guide memory note)."""
    return media.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def media_features(media: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    return media.map_batches(
        FeatureStage, batch_format="pyarrow", batch_size=64, concurrency=concurrency
    )
