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


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("crash_point", ["pre-swap", "mid-move-out",
                                         "mid-move-in", "pre-cleanup"])
def test_compact_roll_forward_from_any_swap_point(tmp_path, crash_point):
    """A kill at ANY point after the commit rename (tmp -> .compact_ready)
    must roll FORWARD on the next run: the manifest distinguishes
    originals from new files, so no rows are lost or duplicated (r03
    review: the pre-manifest design deleted surviving originals when
    killed mid-swap)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path / f"part_{crash_point}"
    d.mkdir()
    tables = [pa.table({"x": list(range(i * 10, i * 10 + 10))})
              for i in range(4)]
    for i, t in enumerate(tables):
        pq.write_table(t, str(d / f"f{i}.parquet"))
    orig = pd.concat([t.to_pandas() for t in tables]) \
        .sort_values("x").reset_index(drop=True)

    # hand-build the committed state: a complete compacted copy + manifest
    ready = d / ".compact_ready"
    ready.mkdir()
    new_name = "compact-deadbeef-00000.parquet"
    pq.write_table(pa.concat_tables(tables), str(ready / new_name))
    (ready / "_MANIFEST").write_text(new_name + "\n")

    trash = d / ".compact_trash"
    originals = sorted(glob(str(d / "f*.parquet")))
    if crash_point in ("mid-move-out", "mid-move-in", "pre-cleanup"):
        trash.mkdir()
        moved = originals if crash_point != "mid-move-out" \
            else originals[:2]
        for f in moved:
            os.rename(f, str(trash / os.path.basename(f)))
    if crash_point in ("mid-move-in", "pre-cleanup"):
        os.rename(str(ready / new_name), str(d / new_name))
        if crash_point == "mid-move-in":
            # pretend a second chunk is still waiting in ready
            pq.write_table(pa.table({"x": []},
                                    schema=tables[0].schema),
                           str(ready / "ignored-not-in-manifest.parquet"))

    row = compact_dir(str(d), target_bytes=1 << 30)
    assert row["recovered"] == "rolled-forward"
    live = sorted(glob(str(d / "*.parquet")))
    assert [os.path.basename(f) for f in live] == [new_name]
    got = pq.read_table(live[0]).to_pandas() \
        .sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, orig)
    assert not trash.exists() and not ready.exists()


@pytest.mark.usefixtures("ray_session")
def test_compact_zero_live_partition_stays_on_work_list(tmp_path):
    """A partition killed between move-out and move-in has ZERO live
    parquet files; it must still appear in leaf_partition_dirs so
    compact_sink recovers it (r03 review: it used to vanish forever)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    root = tmp_path / "sink"
    d = root / "shard=0" / "sink=a"
    d.mkdir(parents=True)
    trash = d / ".compact_trash"
    trash.mkdir()
    pq.write_table(pa.table({"x": [1, 2, 3]}), str(trash / "f0.parquet"))

    assert str(d) in leaf_partition_dirs(str(root))
    j = compact_sink(str(root), target_bytes=1 << 30)
    assert list(j["recovered"]) == ["rolled-back"]
    got = pq.read_table(str(d / "f0.parquet")).to_pandas()
    assert got["x"].tolist() == [1, 2, 3]
