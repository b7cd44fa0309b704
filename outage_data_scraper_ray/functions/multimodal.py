"""Multimodal plumbing: opaque binary media columns with typed metadata.

The reference's only media artifacts are tile/report URL refs (per_media,
ga_scraper.py:432-434); this module supplies the engine-side plumbing a
training-data pipeline needs for real media: a deterministic synthetic
media table (binary payload + metadata), and decode / feature / resize
stages shaped as actor-pool map_batches over Arrow binary columns.

Image/audio codecs are NOT in this container, so the default decode is
stubbed: DecodeStage(fake=True) parses our deterministic 16-byte header
(magic, width, height, channels) instead. The REAL slot (fake=False) takes
a pluggable ``codec`` object — decode(bytes) -> (H, W, C) uint8 array,
encode(array) -> bytes (the PIL/libav seam); PPMCodec (plain P6 PPM,
pure numpy) ships as the in-sandbox instance, so the real path is
executed and tested here, and a production codec drops in without
touching the stages. fake=False with no codec still raises
NotImplementedError. Everything around the codec — schema, batch sizing,
actor signature, output layout — is identical on both paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_MAGIC = b"SYNI"


class PPMCodec:
    """Pure-python P6 PPM codec: the injectable real-slot codec for this
    sandbox (no PIL/libav available). Deterministic, byte-exact round trip
    for uint8 RGB arrays."""

    def encode(self, arr: np.ndarray) -> bytes:
        a = np.ascontiguousarray(arr, dtype=np.uint8)
        if a.ndim == 2:
            a = np.repeat(a[:, :, None], 3, axis=2)
        h, w, _c = a.shape
        return b"P6\n%d %d\n255\n" % (w, h) + a[:, :, :3].tobytes()

    def decode(self, payload: bytes) -> np.ndarray:
        if not payload.startswith(b"P6"):
            raise ValueError("not a P6 PPM payload")
        # header: magic, whitespace-separated w h maxval, single whitespace
        parts = payload.split(b"\n", 3)
        w, h = (int(x) for x in parts[1].split())
        body = parts[3]
        return (
            np.frombuffer(body[: w * h * 3], dtype=np.uint8)
            .reshape(h, w, 3)
            .copy()
        )


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
    """Actor-pool decode: one codec 'session' per actor (built once in
    __init__, the ST1 init-once economics).

    fake=True parses the deterministic synthetic header; fake=False runs
    the REAL path through the injected ``codec`` (decode -> pixel array ->
    dims) and raises NotImplementedError when none is available — never a
    silent fake."""

    def __init__(self, fake: bool = True, codec=None):
        if not fake and codec is None:
            raise NotImplementedError("no image/audio codec available in this sandbox")
        self.fake = fake
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths = np.empty(len(payloads), dtype=np.int32)
        heights = np.empty(len(payloads), dtype=np.int32)
        ok = np.empty(len(payloads), dtype=bool)
        for i, p in enumerate(payloads):
            if not self.fake:
                try:
                    arr = self.codec.decode(p)
                    heights[i], widths[i], ok[i] = arr.shape[0], arr.shape[1], True
                except Exception:
                    widths[i], heights[i], ok[i] = 0, 0, False
            elif p[:4] == _MAGIC:
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

    def __init__(self, max_side: int = 64, fake: bool = True, codec=None):
        if not fake and codec is None:
            raise NotImplementedError("no image codec available in this sandbox")
        self.max_side = max_side
        self.fake = fake
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            return self._real(batch)
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

    def _real(self, batch: pa.Table) -> pa.Table:
        """Real path through the injected codec: decode -> nearest-neighbor
        resample on the actual pixel grid -> re-encode."""
        payloads = batch.column("payload").to_pylist()
        out_payloads: list[bytes] = []
        out_w = np.empty(len(payloads), dtype=np.int32)
        out_h = np.empty(len(payloads), dtype=np.int32)
        for i, p in enumerate(payloads):
            arr = self.codec.decode(p)
            h, w = arr.shape[0], arr.shape[1]
            scale = min(1.0, self.max_side / max(w, h, 1))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            rows = (np.arange(nh) * h // nh).astype(np.intp)
            cols = (np.arange(nw) * w // nw).astype(np.intp)
            out_payloads.append(self.codec.encode(arr[rows][:, cols]))
            out_w[i], out_h[i] = nw, nh
        return (
            batch.drop_columns(["payload"])
            .append_column("payload", pa.array(out_payloads, type=pa.binary()))
            .append_column("width", pa.array(out_w))
            .append_column("height", pa.array(out_h))
        )


def resize_media(
    media: rd.Dataset, max_side: int = 64, concurrency: int = 2,
    fake: bool = True, codec=None,
) -> rd.Dataset:
    return media.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"max_side": max_side, "fake": fake, "codec": codec},
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


def decode_media(
    media: rd.Dataset, concurrency: int = 2, fake: bool = True, codec=None
) -> rd.Dataset:
    """Binary payloads are large: small batch_size so batch x concurrency
    stays inside a worker heap (ray_guide memory note)."""
    return media.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"fake": fake, "codec": codec},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def media_features(media: rd.Dataset, concurrency: int = 2) -> rd.Dataset:
    return media.map_batches(
        FeatureStage, batch_format="pyarrow", batch_size=64, concurrency=concurrency
    )

def ahash64(payloads: list[bytes]) -> np.ndarray:
    """64-bit average-hash per payload: resample the body bytes onto an
    8x8 grid by even index striding, threshold each cell at the grid mean,
    pack bits MSB-first — the classic perceptual-hash reduction, computed
    over the opaque binary column (no codec needed; with a real decoder the
    grid would come from resized grayscale pixels instead)."""
    out = np.zeros(len(payloads), dtype=np.uint64)
    for i, p in enumerate(payloads):
        body = np.frombuffer(p[16:] if p[:4] == _MAGIC else p, dtype=np.uint8)
        if body.size == 0:
            continue
        idx = (np.arange(64, dtype=np.int64) * body.size) // 64
        grid = body[idx].astype(np.float64)
        bits = grid > grid.mean()
        out[i] = np.uint64(int.from_bytes(np.packbits(bits).tobytes(), "big"))
    return out


def phash_dedup(
    media: rd.Dataset, driver_threshold: int = 500_000,
    media_rows: int | None = None,
) -> rd.Dataset:
    """Near-duplicate media grouping by perceptual hash: every payload maps
    to its 64-bit aHash and items sharing a hash form one dup group labeled
    by the lexicographic-min media_id (the exact-dedup keeper rule applied
    to a sketch key — byte-identical re-uploads and hash-colliding
    near-identical payloads collapse together).

    Scale shape: per-batch partials are (phash, min media_id) pairs —
    bounded by DISTINCT hashes per batch, not rows. Under driver_threshold
    total rows the tiny partial set min-merges on the driver and broadcasts
    as the label map (zero shuffles, the exact_dedup economics); above it,
    ONE hash shuffle on phash_hex co-locates each hash's rows and a
    per-block min labels them (hash_partitioned_map_batches doctrine)."""
    import ray

    from ..shuffle import hash_partitioned_map_batches

    def _hashes(batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        h = ahash64(payloads)
        hex_ = [format(int(x), "016x") for x in h]
        return pa.table(
            {"media_id": batch.column("media_id"),
             "phash_hex": pa.array(hex_, pa.string())}
        )

    hashed = media.map_batches(_hashes, batch_format="pyarrow", batch_size=64)
    n = media_rows if media_rows is not None else media.count()
    if n <= driver_threshold:
        # the driver branch reads `hashed` twice (partial min-merge, then
        # labeling); pin the SMALL (id, hex) table so the second pass does
        # not re-decode and re-hash every binary payload — measured 2x at
        # 55k items (the pinned form lives in the spillable object store)
        hashed = hashed.materialize()

        def _partial(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("phash_hex", as_index=False)["media_id"].min()

        part = (
            hashed.map_batches(_partial, batch_format="pandas")
            .to_pandas()
        )
        if "phash_hex" not in part.columns:  # empty input loses the schema
            part = pd.DataFrame({"phash_hex": pd.Series(dtype="object"),
                                 "media_id": pd.Series(dtype="object")})
        labels = dict(
            part.groupby("phash_hex")["media_id"].min().items()
        )
        ref = ray.put(labels)

        def _label(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
            m = ray.get(_r)
            df = df.copy()
            df["dup_group"] = df["phash_hex"].map(m)
            return df

        return hashed.map_batches(_label, batch_format="pandas")

    def _label_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(dup_group=pd.Series(dtype="object"))
        df = df.copy()
        df["dup_group"] = df.groupby("phash_hex")["media_id"].transform("min")
        return df

    return hash_partitioned_map_batches(hashed, ["phash_hex"], _label_block)
