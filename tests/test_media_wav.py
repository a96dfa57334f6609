"""Dependency-free WAV codec (stdlib wave) + genuine audio decode path."""

from __future__ import annotations

import numpy as np
import pytest

from security_log_analysis_rust_ray.functions.wav import decode, encode_pcm16


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(5)
    for n, rate, ch in [(64, 8000, 1), (1, 44100, 1), (100, 16000, 2)]:
        samples = rng.integers(-32768, 32768, size=n * ch, dtype=np.int16)
        r, c, got = decode(encode_pcm16(samples, rate=rate, channels=ch))
        assert (r, c) == (rate, ch)
        assert (got == samples).all()


def test_wav_decode_rejects_garbage():
    import wave
    with pytest.raises((wave.Error, EOFError)):
        decode(b"not a wav file..............................")


@pytest.mark.usefixtures("ray_session")
def test_media_wav_decode_end_to_end():
    """The decode stage must produce genuinely-parsed rates, frame counts
    and sample energy from the WAV containers (no fake fallback)."""
    from security_log_analysis_rust_ray.pipelines import media as M
    out = M.media_wav_features("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert (out["sample_rate"] == M.WAV_RATE).all()
    assert (out["n_channels"] == 1).all()
    ids = out["doc_id"].to_numpy()
    n = 64 + ids % 64
    assert (out["n_samples"].to_numpy() == n).all()
    assert (out["duration_us"].to_numpy() == n * 1_000_000 // M.WAV_RATE).all()
    # exact decoded-sample energy for a handful of docs
    for row in out.head(5).itertuples():
        i = np.arange(row.n_samples, dtype=np.int64)
        s = ((row.doc_id * 37 + i * 11) % 4096) - 2048
        assert row.sq_sum == int((s ** 2).sum())
