"""Sink compaction: content-preserving small-file merge per leaf
partition, idempotent, crash-safe in both directions, and invisible to
`read_sink`'s hive pruning."""

from __future__ import annotations

import os
from glob import glob

import pandas as pd
import pytest

from security_log_analysis_rust_ray.pipelines import ingest
from security_log_analysis_rust_ray.sources.compact import (compact_dir,
                                                            compact_sink,
                                                            leaf_partition_dirs)

SF = "/root/testdata/sf0.001"


def _content(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df[sorted(df.columns)].sort_values(
        sorted(df.columns), na_position="last").reset_index(drop=True)


@pytest.fixture(scope="module")
def sink(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("compact_sink"))
    ingest.run_ingest(SF, out, shards=4)
    return os.path.join(out, "routed")


@pytest.mark.usefixtures("ray_session")
def test_compact_preserves_content_and_reduces_files(sink):
    before = _content(ingest.read_sink(os.path.dirname(sink) + "", "message"))
    n_before = len(glob(os.path.join(sink, "**", "*.parquet"),
                        recursive=True))
    j = compact_sink(sink, target_bytes=1 << 30)  # everything -> 1 file/dir
    assert (j["action"] == "compacted").any()
    n_after = len(glob(os.path.join(sink, "**", "*.parquet"),
                       recursive=True))
    assert n_after < n_before
    assert n_after == len(leaf_partition_dirs(sink))  # one file per leaf
    after = _content(ingest.read_sink(os.path.dirname(sink), "message"))
    pd.testing.assert_frame_equal(before, after)

    # idempotent: second run is all skips, files untouched
    mtimes = {f: os.path.getmtime(f) for f in
              glob(os.path.join(sink, "**", "*.parquet"), recursive=True)}
    j2 = compact_sink(sink, target_bytes=1 << 30)
    assert (j2["action"] == "skip").all()
    assert {f: os.path.getmtime(f) for f in mtimes} == mtimes


@pytest.mark.usefixtures("ray_session")
def test_compact_crash_recovery_both_directions(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path / "part"
    d.mkdir()
    for i in range(4):
        pq.write_table(pa.table({"x": list(range(i * 10, i * 10 + 10))}),
                       str(d / f"f{i}.parquet"))
    orig = pd.concat([pq.read_table(f).to_pandas()
                      for f in sorted(glob(str(d / "*.parquet")))]) \
        .sort_values("x").reset_index(drop=True)

    # crash AFTER originals moved to trash, BEFORE new files moved in:
    # recovery must roll back to the originals
    trash = d / ".compact_trash"
    trash.mkdir()
    for f in glob(str(d / "*.parquet")):
        os.rename(f, str(trash / os.path.basename(f)))
    row = compact_dir(str(d), target_bytes=1 << 30)
    assert row["recovered"] == "rolled-back"
    assert row["action"] == "compacted"          # then compacted normally
    got = pq.read_table(glob(str(d / "*.parquet"))[0]).to_pandas() \
        .sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, orig)

    # crash AFTER new files moved in, BEFORE trash dropped: recovery must
    # finish the swap (keep new files, drop trash) without duplicating rows
    trash.mkdir()
    pq.write_table(pa.table({"x": [999]}), str(trash / "stale.parquet"))
    row2 = compact_dir(str(d), target_bytes=1 << 30)
    assert row2["recovered"] == "finished-crashed-swap"
    assert row2["action"] == "skip"              # already one file
    got2 = pq.read_table(glob(str(d / "*.parquet"))[0]).to_pandas() \
        .sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, orig)
    assert not trash.exists()


@pytest.mark.usefixtures("ray_session")
def test_compact_dry_run_changes_nothing(sink):
    files = sorted(glob(os.path.join(sink, "**", "*.parquet"),
                        recursive=True))
    j = compact_sink(sink, target_bytes=1, dry_run=True)  # 1 byte target
    assert (j["action"] == "skip").all()  # already 1 file/dir from earlier
    assert sorted(glob(os.path.join(sink, "**", "*.parquet"),
                       recursive=True)) == files
