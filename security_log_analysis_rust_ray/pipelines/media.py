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

# production decode seam: when an image codec lands in the environment the
# actor-pool stage picks it up without any pipeline change (the stage
# contract — binary in, fixed-width features out, setup in __init__ — is
# identical); this container has no codec libs, so the deterministic stub
# below is what runs (clearly marked)
try:  # pragma: no cover - PIL absent in this container
    from PIL import Image as _PILImage
    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False


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
        if payload[:2] == b"BM":
            # REAL decode: dependency-free 24-bit BMP codec
            # (functions/bmp.py) — this branch runs in CI, not a stub
            try:
                from ..functions.bmp import decode as _bmp_decode
                px = _bmp_decode(payload)
                flat = px.reshape(-1)
                hist, _ = np.histogram(flat, bins=self.buckets)
                return (px.shape[1], px.shape[0], int(flat.sum()),
                        hist / max(1, len(flat)))
            except ValueError:
                pass  # malformed BMP -> deterministic fallback below
        if HAVE_PIL:  # pragma: no cover - real decoder when codecs exist
            import io
            try:
                img = _PILImage.open(io.BytesIO(payload))
                a = np.asarray(img.convert("L"), dtype=np.uint8).reshape(-1)
                hist, _ = np.histogram(a, bins=self.buckets)
                return (img.width, img.height, int(a.sum()),
                        hist / max(1, len(a)))
            except Exception:
                pass  # non-image payload -> deterministic fallback below
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
    row per frame (the flat_map shape a video pipeline needs).  The window
    gather is vectorized over the Arrow binary buffer (offset arithmetic +
    one fancy-index per frame slot — no per-payload Python slicing)."""

    K = 4
    WIN = 16

    def __call__(self, b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "frame_idx": pa.array([], pa.int32()),
                             "frame": pa.array([], pa.binary())})
        col = b["payload"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(pa.binary())
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32,
                             count=len(col) + 1,
                             offset=col.offset * 4).astype(np.int64)
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        starts, n = offs[:-1], np.diff(offs)
        doc = b["doc_id"].to_numpy()
        step = np.maximum(1, n // self.K)
        frames_parts, doc_parts, idx_parts, len_parts = [], [], [], []
        for k in range(self.K):
            off = np.minimum(k * step, np.maximum(0, n - self.WIN))
            lens = np.minimum(self.WIN, n - off)
            # gather each row's window: repeat starts, add per-window arange
            tot = int(lens.sum())
            ends = np.cumsum(lens)
            local = np.arange(tot, dtype=np.int64) - np.repeat(ends - lens, lens)
            src = np.repeat(starts + off, lens) + local
            frames_parts.append(data[src])
            len_parts.append(lens)
            doc_parts.append(doc)
            idx_parts.append(np.full(len(doc), k, dtype=np.int32))
        values = np.concatenate(frames_parts)
        lens_all = np.concatenate(len_parts)
        out_offs = np.concatenate([[0], np.cumsum(lens_all)]).astype(np.int32)
        frame_arr = pa.Array.from_buffers(
            pa.binary(), len(lens_all),
            [None, pa.py_buffer(out_offs.tobytes()),
             pa.py_buffer(values.tobytes())])
        return pa.table({
            "doc_id": pa.array(np.concatenate(doc_parts), pa.int64()),
            "frame_idx": pa.array(np.concatenate(idx_parts)),
            "frame": frame_arr,
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


def media_frame_stats(sf_dir: str) -> rd.Dataset:
    """Oracle-checkable invariants of the frame sampler: exactly K frames
    per doc, max frame length = min(WIN, payload bytes).  All K frames of a
    doc are emitted in one output batch, so the per-batch Arrow group_by is
    globally correct."""
    def stats(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_frames": pa.array([], pa.int64()),
                             "max_frame_bytes": pa.array([], pa.int64())})
        t = pa.table({"doc_id": b["doc_id"],
                      "fb": pc.cast(pc.binary_length(b["frame"]), pa.int64())})
        g = t.group_by(["doc_id"]).aggregate([([], "count_all"), ("fb", "max")])
        return g.rename_columns(["doc_id", "n_frames", "max_frame_bytes"])

    # batch_size=None: operate on the sampler's whole output blocks (each
    # holds complete docs); a row-count re-batch could split a doc's frames
    return media_frames(sf_dir).map_batches(stats, batch_format="pyarrow",
                                            batch_size=None)


BMP_W, BMP_H = 16, 8


def media_bmp_manifest_ds(sf_dir: str, width: int = BMP_W,
                          height: int = BMP_H) -> rd.Dataset:
    """REAL image manifest: one deterministic 24-bit BMP per document,
    pixel(x, y) = (doc_id*31 + x*7 + y*13) % 256 — a formula an oracle can
    re-state in SQL, so the decode path is value-checked end-to-end."""
    from ..functions.bmp import encode_gray

    def to_bmp(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        x = np.arange(width, dtype=np.int64) * 7
        y = np.arange(height, dtype=np.int64) * 13
        grid = (x[None, :] + y[:, None])                   # (h, w)
        # (n, h, w) pixel cube, vectorized over the whole batch
        px = ((ids[:, None, None] * 31 + grid[None, :, :]) % 256) \
            .astype(np.uint8)
        payloads = [encode_gray(px[i]) for i in range(len(ids))]
        pay = pa.array(payloads, pa.binary())
        return pa.table({
            "doc_id": b["doc_id"],
            "payload": pay,
            "media_type": pa.array(["image/bmp"] * len(b), pa.string()),
            "n_bytes": pc.cast(pc.binary_length(pay), pa.int64()),
        })
    return read_table(sf_dir, "documents", columns=["doc_id"]) \
        .map_batches(to_bmp, batch_format="pyarrow", batch_size=MEDIA_BATCH)


def media_bmp_features(sf_dir: str) -> rd.Dataset:
    """GENUINE decode in CI: BMP manifest -> actor-pool decode -> real
    (width, height, pixel-sum checksum) — oracle-checked against the SQL
    restatement of the pixel formula (no codec library involved)."""
    return media_bmp_manifest_ds(sf_dir).map_batches(
        DecodeStub, batch_format="pyarrow",
        concurrency=(1, 4), batch_size=MEDIA_BATCH) \
        .select_columns(["doc_id", "width", "height", "checksum"])


WAV_RATE = 8000


def media_wav_manifest_ds(sf_dir: str) -> rd.Dataset:
    """REAL audio manifest: one deterministic PCM16 WAV per document,
    sample(i) = ((doc_id*37 + i*11) % 4096) - 2048 over n = 64 + doc_id%64
    frames at 8 kHz mono — a formula an oracle can re-state in SQL, so the
    decode path is value-checked end-to-end (the WAV twin of
    ``media_bmp_manifest_ds``)."""
    from ..functions.wav import encode_pcm16

    def to_wav(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        payloads = []
        for d in ids:
            n = 64 + int(d) % 64
            i = np.arange(n, dtype=np.int64)
            samples = ((int(d) * 37 + i * 11) % 4096) - 2048
            payloads.append(encode_pcm16(samples, rate=WAV_RATE))
        pay = pa.array(payloads, pa.binary())
        return pa.table({
            "doc_id": b["doc_id"],
            "payload": pay,
            "media_type": pa.array(["audio/wav"] * len(b), pa.string()),
            "n_bytes": pc.cast(pc.binary_length(pay), pa.int64()),
        })
    return read_table(sf_dir, "documents", columns=["doc_id"]) \
        .map_batches(to_wav, batch_format="pyarrow", batch_size=MEDIA_BATCH)


class WavDecode:
    """GENUINE audio decode stage (stdlib ``wave`` — no codec libs needed):
    binary WAV payloads in, per-item container parse (inherent to media),
    fixed-width acoustic metadata out.  ``sq_sum`` (int64 sum of squared
    samples, an exact energy measure) is the SQL-checkable decode proof."""

    def __call__(self, b: pa.Table) -> pa.Table:
        from ..functions.wav import decode
        rates, chans, nsamp, durs, sq = [], [], [], [], []
        for p in b["payload"].to_pylist():
            rate, ch, data = decode(p)
            rates.append(rate)
            chans.append(ch)
            nsamp.append(len(data) // ch)
            durs.append(len(data) // ch * 1_000_000 // rate)
            sq.append(int((data.astype(np.int64) ** 2).sum()))
        return pa.table({
            "doc_id": b["doc_id"],
            "sample_rate": pa.array(rates, pa.int32()),
            "n_channels": pa.array(chans, pa.int32()),
            "n_samples": pa.array(nsamp, pa.int64()),
            "duration_us": pa.array(durs, pa.int64()),
            "sq_sum": pa.array(sq, pa.int64()),
        })


def media_wav_features(sf_dir: str) -> rd.Dataset:
    """REAL decode in CI: WAV manifest -> actor-pool parse -> exact
    acoustic metadata, oracle-checked against the SQL restatement of the
    sample formula (duration, frame count, energy)."""
    return media_wav_manifest_ds(sf_dir).map_batches(
        WavDecode, batch_format="pyarrow",
        concurrency=(1, 4), batch_size=MEDIA_BATCH)


def media_checksums(sf_dir: str) -> rd.Dataset:
    """Oracle-checkable content digests through the decode stage:
    (doc_id, checksum_md5) vs DuckDB md5() on the same payload bytes —
    moves the media pipeline's value check beyond rows-only."""
    return media_features(sf_dir).select_columns(["doc_id", "checksum_md5"])
