"""Multimodal (binary-payload) columns: image/audio/video treated as
opaque ``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages — the engine's mapping of the reference's blob →
vips-processor path (``blob.go`` payload modes; processor lifecycle
``processor/vipsprocessor/processor.go:127-209``) onto media payloads.

The image/audio codec libraries are NOT available in this container, so
the decode kernel itself is a clearly-marked STUB: real codecs raise
``NotImplementedError`` and the deterministic fake codec (a fixed header
format over seeded bytes, produced by ``gen_media``) stands in. The Ray
side — schema, actor signature, batch sizing for large binary rows,
output layout — is real and tested:

- payloads are ``binary`` Arrow columns; batches stay in
  ``batch_format="pyarrow"`` (binary columns don't survive pandas object
  round-trips cheaply — ray_guide pitfalls);
- the decode stage is a callable CLASS (actor pool): codec "load" happens
  once per actor in ``__init__``, work per batch in ``__call__``;
- ``batch_size`` is small because row payloads are large (batch bytes ×
  concurrency must fit the worker heap).

Fake codec header (16 bytes, big-endian):
``b"IMRF" | u16 width | u16 height | u16 n_frames | u16 channels |
u32 payload_len`` followed by ``payload_len`` seeded bytes.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

__all__ = [
    "MEDIA_SCHEMA",
    "gen_media",
    "MediaDecodeStage",
    "MediaResizeStage",
    "frame_sample",
    "media_features",
]

_MAGIC = b"IMRF"
_HEADER = struct.Struct(">4sHHHHI")

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),       # image | audio | video
    ("payload", pa.binary()),
    ("source", pa.string()),
])


def _encode_fake(width: int, height: int, n_frames: int, channels: int, seed: int) -> bytes:
    body_len = min(width * height, 4096)
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, body_len, dtype=np.uint8).tobytes()
    return _HEADER.pack(_MAGIC, width, height, n_frames, channels, body_len) + body


def gen_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {"media_id": [], "media_type": [], "payload": [], "source": []}
    for i in range(n):
        kind = kinds[i % 3]
        w = int(rng.integers(16, 512))
        h = int(rng.integers(16, 512)) if kind != "audio" else 1
        frames = int(rng.integers(2, 64)) if kind == "video" else 1
        ch = 3 if kind == "image" else (2 if kind == "audio" else 3)
        rows["media_id"].append(i)
        rows["media_type"].append(kind)
        rows["payload"].append(_encode_fake(w, h, frames, ch, seed * 100_000 + i))
        rows["source"].append(f"src{i % 4}")
    return pa.table(rows, schema=MEDIA_SCHEMA)


class MediaDecodeStage:
    """Actor-pool decode stage: ``payload`` → typed metadata columns.

    Use::

        ds.map_batches(MediaDecodeStage, batch_format="pyarrow",
                       batch_size=64,        # large binary rows → small batches
                       concurrency=(1, N), num_cpus=1)

    ``codec="real"`` raises NotImplementedError — the hook where a real
    image/audio library (PIL / libsndfile / pyav) plugs in once available;
    ``codec="fake"`` parses the deterministic IMRF header.
    """

    def __init__(self, codec: str = "fake"):
        if codec == "real":
            raise NotImplementedError(
                "real media codecs are not available in this environment; "
                "plug PIL/pyav/libsndfile here and decode payload bytes"
            )
        self._codec = codec

    def _decode_one(self, payload: bytes) -> tuple[int, int, int, int, int]:
        magic, w, h, frames, ch, blen = _HEADER.unpack_from(payload, 0)
        if magic != _MAGIC:
            raise ValueError("unknown media container")
        return w, h, frames, ch, blen

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, frames, chans, sizes = [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, f, c, blen = self._decode_one(payload)
            widths.append(w)
            heights.append(h)
            frames.append(f)
            chans.append(c)
            sizes.append(len(payload))
        return batch.drop_columns(["payload"]).append_column(
            "width", pa.array(widths, pa.int32())
        ).append_column(
            "height", pa.array(heights, pa.int32())
        ).append_column(
            "n_frames", pa.array(frames, pa.int32())
        ).append_column(
            "channels", pa.array(chans, pa.int32())
        ).append_column(
            "n_bytes", pa.array(sizes, pa.int64())
        )


def frame_sample(batch: pa.Table, every: int = 8) -> pa.Table:
    """Frame-sampling plumbing: one output row per sampled frame index of
    each video (flat_map-shaped expansion done vectorized per batch)."""
    ids, kinds, frame_idx = [], [], []
    decode = MediaDecodeStage()
    for mid, kind, payload in zip(
        batch["media_id"].to_pylist(),
        batch["media_type"].to_pylist(),
        batch["payload"].to_pylist(),
    ):
        _, _, frames, _, _ = decode._decode_one(payload)
        for f in range(0, frames, every):
            ids.append(mid)
            kinds.append(kind)
            frame_idx.append(f)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "media_type": pa.array(kinds, pa.string()),
        "frame_idx": pa.array(frame_idx, pa.int32()),
    })


class MediaResizeStage:
    """Actor-pool resize stage: payload → payload with target dims — the
    media mirror of the text chain's resize step (thumbnail decision
    process.go:402-507). The pixel resample itself is the STUB slot (a
    real library resamples `body`); the plumbing is real: the header is
    rewritten with the fitted dimensions (aspect-preserving fit-in or
    exact stretch), the body is deterministically resampled by index
    gather, and the output stays a binary Arrow column downstream stages
    can decode again.
    """

    def __init__(self, width: int, height: int = 0, fit: str = "fit-in",
                 codec: str = "fake"):
        if codec == "real":
            raise NotImplementedError(
                "real media resampling is not available in this environment; "
                "plug PIL/pyav here"
            )
        self.width = width
        self.height = height
        self.fit = fit

    def _fit_dims(self, w: int, h: int) -> tuple[int, int]:
        tw, th = self.width, self.height or h
        if self.fit == "stretch":
            return tw, th
        # aspect-preserving fit-in (shrink only), like fit-in semantics
        scale = min(tw / max(1, w), th / max(1, h), 1.0)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def _resize_one(self, payload: bytes) -> bytes:
        magic, w, h, frames, ch, blen = _HEADER.unpack_from(payload, 0)
        if magic != _MAGIC:
            raise ValueError("unknown media container")
        nw, nh = self._fit_dims(w, h)
        body = np.frombuffer(payload, dtype=np.uint8, count=blen, offset=_HEADER.size)
        new_len = min(nw * nh, 4096)
        if blen > 0:
            # deterministic nearest-index gather — the resample stub
            idx = (np.arange(new_len) * blen // max(1, new_len)).clip(0, blen - 1)
            new_body = body[idx].tobytes()
        else:
            new_body = b""
        return _HEADER.pack(_MAGIC, nw, nh, frames, ch, len(new_body)) + new_body

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [self._resize_one(p) for p in batch["payload"].to_pylist()]
        i = batch.schema.get_field_index("payload")
        return batch.set_column(i, "payload", pa.array(out, pa.binary()))


def media_features(batch: pa.Table, dim: int = 16) -> pa.Table:
    """Feature-extraction stub: a deterministic payload-hash embedding
    (the actor-pool model-inference slot; batched, vectorized layout)."""
    feats = []
    for payload in batch["payload"].to_pylist():
        h = hashlib.sha256(payload).digest()
        vec = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
        feats.append((vec.astype(np.float64) / 2**32).astype(np.float32))
    return pa.table({
        "media_id": batch["media_id"],
        "embedding": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
    })


def media_hashes(sf_dir: str):
    """Content addressing for binary payloads — the first multimodal
    entry with a FULL SQL oracle: each document's utf8 payload bytes
    (standing in for an opaque media blob; the real pipeline hashes the
    binary column identically) get byte length + sha256. This is the
    dedup/cache key layer every 100 TB media pipeline needs before any
    decode happens (imagor's content-addressed result keys,
    imagor.go:388-398), and it is pure map — zero shuffle.

    Output: doc_id, n_bytes, sha256 (lowercase hex).
    """
    import hashlib

    import pandas as pd
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def hash_batch(b: pd.DataFrame) -> pd.DataFrame:
        payloads = [t.encode("utf-8") for t in b["text"]]
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "n_bytes": pd.Series([len(p) for p in payloads], dtype="int64",
                                 index=b.index),
            "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
        })

    return docs.map_batches(hash_batch, batch_format="pandas")
