"""Checkpoint/resume semantics of the ingest job (FIXTURES §5.5-5.6):
kill after shard k -> rerun -> complete, already-done shards untouched,
final content equal to an uninterrupted run."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from security_log_analysis_rust_ray.pipelines import ingest
from .conftest import SF_SMOKE, canonicalize


def _routed_df(out_dir):
    import ray.data as rd
    df = rd.read_parquet(os.path.join(out_dir, ingest.ROUTED_DIR)).to_pandas()
    return canonicalize(df)


def _shard_mtimes(out_dir):
    root = os.path.join(out_dir, ingest.ROUTED_DIR)
    out = {}
    for shard in os.listdir(root):
        d = os.path.join(root, shard)
        latest = 0
        for r, _dd, files in os.walk(d):
            for f in files:
                latest = max(latest, os.stat(os.path.join(r, f)).st_mtime_ns)
        out[shard] = latest
    return out


@pytest.mark.usefixtures("ray_session")
def test_kill_and_resume(tmp_path):
    full = str(tmp_path / "full")
    part = str(tmp_path / "partial")

    m_full = ingest.run_ingest(SF_SMOKE, full, shards=4, enrich=False)
    assert len(m_full.records) == 4
    assert all(r["status"] == "done" for r in m_full.records.values())
    assert all(r["rows"] > 0 for r in m_full.records.values())
    assert all(r["watermark"] is not None for r in m_full.records.values())

    # "kill" after 2 shards
    m1 = ingest.run_ingest(SF_SMOKE, part, shards=4, enrich=False,
                           stop_after_shard=1)
    assert len(m1.records) == 2
    mtimes_before = _shard_mtimes(part)

    # resume: remaining shards processed, finished ones not rewritten
    m2 = ingest.run_ingest(SF_SMOKE, part, shards=4, enrich=False)
    assert len(m2.records) == 4
    mtimes_after = _shard_mtimes(part)
    for shard in mtimes_before:
        assert mtimes_after[shard] == mtimes_before[shard], (
            f"{shard} was rewritten on resume")

    pd.testing.assert_frame_equal(_routed_df(full), _routed_df(part))
    # aggregates sink exists after a completed run
    assert os.path.isdir(os.path.join(part, ingest.AGG_DIR))


@pytest.mark.usefixtures("ray_session")
def test_incremental_new_shard(tmp_path):
    """A landing zone that grows a new shard between runs: only the new
    shard is processed; existing outputs untouched (manifest fingerprints)."""
    import shutil
    from security_log_analysis_rust_ray import synth

    src = synth.ensure_transcripts_sharded(SF_SMOKE, shards=4)
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for f in files[:3]:
        shutil.copy2(os.path.join(src, f), os.path.join(landing, f))

    out = str(tmp_path / "o")
    m1 = ingest.run_ingest(SF_SMOKE, out, enrich=False, in_dir=landing)
    assert len(m1.records) == 3
    mtimes = _shard_mtimes(out)

    shutil.copy2(os.path.join(src, files[3]), os.path.join(landing, files[3]))
    m2 = ingest.run_ingest(SF_SMOKE, out, enrich=False, in_dir=landing)
    assert len(m2.records) == 4
    after = _shard_mtimes(out)
    for shard, t in mtimes.items():
        assert after[shard] == t, f"{shard} reprocessed"
    # full content present
    import ray.data as rd
    n = rd.read_parquet(os.path.join(out, ingest.ROUTED_DIR)).count()
    full_out = str(tmp_path / "full")
    ingest.run_ingest(SF_SMOKE, full_out, shards=4, enrich=False)
    n_full = rd.read_parquet(os.path.join(full_out, ingest.ROUTED_DIR)).count()
    assert n == n_full


@pytest.mark.usefixtures("ray_session")
def test_rerun_is_noop(tmp_path):
    out = str(tmp_path / "o")
    ingest.run_ingest(SF_SMOKE, out, shards=2, enrich=False)
    before = _shard_mtimes(out)
    ingest.run_ingest(SF_SMOKE, out, shards=2, enrich=False)
    assert _shard_mtimes(out) == before


@pytest.mark.usefixtures("ray_session")
def test_sink_readback_partition_pruning(tmp_path):
    out = str(tmp_path / "o")
    ingest.run_ingest(SF_SMOKE, out, shards=2, enrich=False)
    msgs = ingest.read_sink(out, "message")
    df = msgs.to_pandas()
    assert len(df) > 0
    assert (df["log_level"].notna()).all()
    ssh = ingest.read_sink(out, "ssh").to_pandas()
    assert (ssh["service"] == "ssh").all()


@pytest.mark.usefixtures("ray_session")
def test_follow_ingest_exactly_once(tmp_path):
    """Follow mode (reference daemon loop): shards landing MID-RUN are
    picked up by later passes, every shard processed exactly once, loop
    stops after idle_stop empty scans."""
    import shutil
    from security_log_analysis_rust_ray import synth

    src = synth.ensure_transcripts_sharded(SF_SMOKE, shards=4)
    files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for f in files[:2]:
        shutil.copy2(os.path.join(src, f), os.path.join(landing, f))

    out = str(tmp_path / "o")
    dropped = {"n": 2}

    def land_more(pass_idx, processed):
        # the test hook: drop one new shard after each of the first two
        # passes — simulates journald lines arriving while the daemon runs
        if dropped["n"] < len(files):
            shutil.copy2(os.path.join(src, files[dropped["n"]]),
                         os.path.join(landing, files[dropped["n"]]))
            dropped["n"] += 1

    history = ingest.follow_ingest(SF_SMOKE, out, landing, enrich=False,
                                   idle_stop=2, on_pass=land_more)
    processed = [sid for ids in history for sid in ids]
    # exactly-once: no shard id appears twice across passes
    assert len(processed) == len(set(processed)) == 4
    # trailing passes were idle scans
    assert history[-1] == [] and history[-2] == []
    # content equals a one-shot run over the full input
    import ray.data as rd
    full_out = str(tmp_path / "full")
    ingest.run_ingest(SF_SMOKE, full_out, shards=4, enrich=False)
    got = _routed_df(out)
    exp = _routed_df(full_out)
    pd.testing.assert_frame_equal(got, exp)
    # a follow rerun over the quiet landing zone is a no-op
    h2 = ingest.follow_ingest(SF_SMOKE, out, landing, enrich=False,
                              idle_stop=1)
    assert all(ids == [] for ids in h2)
