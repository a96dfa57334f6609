"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted by an actor-pool stage.

The image/audio codec libraries are not available in this environment, so
``DecodeStub`` is a CLEARLY-MARKED deterministic fake decoder — but all of
the Ray-side plumbing is real and tested: binary Arrow columns through the
object store, small batch sizes for wide rows, actor-pool stage signature,
typed metadata schema, and the output layout a real decoder would produce.
Swap ``DecodeStub._decode`` for PIL/ffmpeg in production.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..sources.readers import read_table

MEDIA_BATCH = 256  # wide binary rows -> small batches (memory-aware)


def media_manifest_ds(sf_dir: str) -> rd.Dataset:
    """documents -> (doc_id, payload:binary, media_type, n_bytes): the shape
    a crawl manifest of opaque media blobs has.  Payload = utf8 bytes of the
    text (deterministic stand-in for real image bytes)."""
    def to_media(b: pa.Table) -> pa.Table:
        payload = b["text"].cast(pa.binary())
        return pa.table({
            "doc_id": b["doc_id"],
            "payload": payload,
            "media_type": pa.array(["image/fake"] * len(b), pa.string()),
            "n_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
        })
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(to_media, batch_format="pyarrow")


class DecodeStub:
    """STUB decoder (no codec libs in this container).  Deterministic fake:
    'width'/'height' derived from byte length, 'checksum' = uint64 sum of
    payload bytes, 8-dim 'feature' = bucketed byte histogram.  A real
    deployment replaces ``_decode`` only; the stage contract (binary in,
    fixed-width features out, setup in __init__, small batches) is real."""

    FEATURE_DIM = 8

    def __init__(self):
        self.buckets = np.linspace(0, 256, self.FEATURE_DIM + 1)

    def _decode(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        a = np.frombuffer(payload, dtype=np.uint8)
        hist, _ = np.histogram(a, bins=self.buckets)
        feat = hist / max(1, len(a))
        return len(a) % 640 + 1, len(a) % 480 + 1, int(a.sum()), feat

    def __call__(self, b: pa.Table) -> pa.Table:
        import hashlib
        payloads = b["payload"].to_pylist()
        w, h, ck, md5s, feats = [], [], [], [], []
        for p in payloads:
            wi, hi, c, f = self._decode(p)
            w.append(wi); h.append(hi); ck.append(c); feats.append(f)
            # content digest per item: per-row work is the actor-pool model
            # here (media decode is inherently per-item); md5 hex doubles as
            # the SQL-checkable lineage id (DuckDB md5() on the oracle side)
            md5s.append(hashlib.md5(p).hexdigest())
        feat_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats) if feats else
                     np.zeros(0), pa.float64()), self.FEATURE_DIM)
        return pa.table({
            "doc_id": b["doc_id"],
            "n_bytes": b["n_bytes"],
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "checksum": pa.array(ck, pa.int64()),
            "checksum_md5": pa.array(md5s, pa.string()),
            "feature": feat_arr,
        })


class ResizeStub:
    """STUB resize stage (real impl: PIL thumbnail).  Deterministic fake:
    truncate the payload to TARGET_BYTES — the stage contract (binary in,
    smaller binary + dims out, actor pool, small batches) is real."""

    TARGET_BYTES = 64

    def __call__(self, b: pa.Table) -> pa.Table:
        sliced = pc.binary_slice(b["payload"].cast(pa.binary()), 0,
                                 self.TARGET_BYTES) \
            if hasattr(pc, "binary_slice") else b["payload"]
        return pa.table({
            "doc_id": b["doc_id"],
            "thumb": sliced,
            "thumb_bytes": pc.cast(pc.binary_length(sliced), pa.int64()),
        })


class FrameSampleStub:
    """STUB frame sampler (real impl: ffmpeg keyframes).  Deterministic
    fake: k evenly-spaced 16-byte windows of the payload, EXPLODED to one
    row per frame (the flat_map shape a video pipeline needs)."""

    K = 4
    WIN = 16

    def __call__(self, b: pa.Table) -> pa.Table:
        doc_ids, frame_idx, frames = [], [], []
        for doc_id, payload in zip(b["doc_id"].to_pylist(),
                                   b["payload"].to_pylist()):
            n = len(payload)
            step = max(1, n // self.K)
            for k in range(self.K):
                off = min(k * step, max(0, n - self.WIN))
                doc_ids.append(doc_id)
                frame_idx.append(k)
                frames.append(payload[off:off + self.WIN])
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def media_thumbnails(sf_dir: str) -> rd.Dataset:
    """manifest -> resize stub (actor pool, small batches)."""
    return media_manifest_ds(sf_dir).map_batches(
        ResizeStub, batch_format="pyarrow",
        concurrency=(1, 4), batch_size=MEDIA_BATCH)


def media_frames(sf_dir: str) -> rd.Dataset:
    """manifest -> frame-sample stub (one row per sampled frame)."""
    return media_manifest_ds(sf_dir).map_batches(
        FrameSampleStub, batch_format="pyarrow",
        concurrency=(1, 4), batch_size=MEDIA_BATCH)


def media_features(sf_dir: str) -> rd.Dataset:
    """manifest -> actor-pool decode/feature-extract (small batches)."""
    return media_manifest_ds(sf_dir).map_batches(
        DecodeStub, batch_format="pyarrow",
        concurrency=(1, 4), batch_size=MEDIA_BATCH)


def media_stats(sf_dir: str) -> rd.Dataset:
    """Oracle-checkable projection of the media path: (doc_id, n_bytes) —
    byte-length accounting survives the stub boundary."""
    return media_features(sf_dir).select_columns(["doc_id", "n_bytes"])


def media_checksums(sf_dir: str) -> rd.Dataset:
    """Oracle-checkable content digests through the decode stage:
    (doc_id, checksum_md5) vs DuckDB md5() on the same payload bytes —
    moves the media pipeline's value check beyond rows-only."""
    return media_features(sf_dir).select_columns(["doc_id", "checksum_md5"])
