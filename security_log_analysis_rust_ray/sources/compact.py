"""Small-file compaction for hive-partitioned Parquet sinks.

A resumable streaming ingest writes MANY small files (one per Ray write
task per pass — a 100-TB sink accumulates millions), and both the
reference's month-partitioned export (src/polars_analysis.rs:133-149: one
file per partition, rewritten by merge) and its pairwise merge CLI
(src/parse_opts.rs:86-100) exist to fight exactly this.  This module is
the Ray-native generalization: compact every LEAF partition directory to
``ceil(partition_bytes / target_bytes)`` files.

Design points for the 100-TB case:

- **The work list streams**: partition dirs become a Dataset of work items;
  each dir is compacted by ONE task (`ds.map`, task pool) — a million
  partitions pipeline through the scheduler, nothing global.
- **Partition-local**: a task touches one directory; no shuffle, no
  cross-partition reads.  The hive layout (and therefore `read_sink`
  partition pruning and ingest's per-shard resume lineage) is unchanged.
- **Crash-safe + idempotent**: two-phase swap through dot-prefixed
  ``.compact_tmp`` / ``.compact_trash`` subdirs (invisible to the
  ``*.parquet`` globs readers use).  A re-run after a crash at ANY point
  either rolls the partition back or rolls it forward; a re-run after
  success is a no-op (single-file partitions are skipped).
- **Content-preserving**: rows are concatenated in deterministic filename
  order; equality is by content, not bytes (same contract as ingest
  resume, pipelines/ingest.py:28-33).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from glob import glob

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_TMP = ".compact_tmp"
_TRASH = ".compact_trash"


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _recover(d: str) -> str | None:
    """Roll a crashed compaction forward or back.  Returns the action
    taken (or None).  Invariant: the trash dir is created only AFTER the
    new files are fully written and fsynced, so:

    - trash exists and the dir has live ``*.parquet`` files  -> the swap
      reached (or passed) the move-in phase: finish by deleting trash;
    - trash exists and the dir has NO live files -> crash between
      moving the originals out and moving the new files in: restore the
      originals (the tmp dir may hold a complete copy, but the originals
      are the known-good state — prefer rollback).
    """
    trash, tmp = os.path.join(d, _TRASH), os.path.join(d, _TMP)
    action = None
    if os.path.isdir(trash):
        live = glob(os.path.join(d, "*.parquet"))
        if live:
            shutil.rmtree(trash)
            action = "finished-crashed-swap"
        else:
            for f in sorted(os.listdir(trash)):
                os.rename(os.path.join(trash, f), os.path.join(d, f))
            os.rmdir(trash)
            action = "rolled-back"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
        _fsync_dir(d)
    return action


def compact_dir(d: str, target_bytes: int) -> dict:
    """Compact one leaf partition directory.  Runs inside one Ray task."""
    recovered = _recover(d)
    files = sorted(glob(os.path.join(d, "*.parquet")))
    sizes = [os.path.getsize(f) for f in files]
    total = sum(sizes)
    n_out = max(1, math.ceil(total / target_bytes)) if total else 0
    row = {"dir": d, "files_before": len(files), "bytes": total,
           "recovered": recovered}
    if len(files) <= 1 or n_out >= len(files):
        row.update(action="skip", files_after=len(files))
        return row

    t = pa.concat_tables([pq.read_table(f) for f in files],
                         promote_options="default")
    tmp = os.path.join(d, _TMP)
    os.makedirs(tmp, exist_ok=True)
    # byte-proportional row split into n_out chunks
    n_rows = t.num_rows
    per = math.ceil(n_rows / n_out) if n_rows else 0
    run_id = uuid.uuid4().hex[:12]
    new_names = []
    for i in range(n_out):
        chunk = t.slice(i * per, per)
        if chunk.num_rows == 0:
            continue
        name = f"compact-{run_id}-{i:05d}.parquet"
        path = os.path.join(tmp, name)
        pq.write_table(chunk, path)
        with open(path, "rb+") as fh:
            os.fsync(fh.fileno())
        new_names.append(name)
    _fsync_dir(tmp)

    # two-phase swap: originals -> trash (trash dir creation is the commit
    # point _recover keys on), then new files -> live, then drop trash
    trash = os.path.join(d, _TRASH)
    os.makedirs(trash, exist_ok=True)
    for f in files:
        os.rename(f, os.path.join(trash, os.path.basename(f)))
    for name in new_names:
        os.rename(os.path.join(tmp, name), os.path.join(d, name))
    _fsync_dir(d)
    shutil.rmtree(trash)
    os.rmdir(tmp)
    row.update(action="compacted", files_after=len(new_names))
    return row


def leaf_partition_dirs(root: str) -> list[str]:
    """Every directory under ``root`` that directly holds parquet files."""
    out = []
    for cur, dirs, files in os.walk(root):
        dirs[:] = [x for x in dirs if not x.startswith(".")]
        if any(f.endswith(".parquet") for f in files):
            out.append(cur)
    return sorted(out)


def compact_sink(root: str, target_bytes: int = 128 << 20,
                 dry_run: bool = False) -> pd.DataFrame:
    """Compact every leaf partition of a (hive-partitioned) Parquet sink.
    Returns the per-partition journal.  The work list is a Dataset so a
    million partition dirs stream through a task pool; the journal is one
    tiny row per dir."""
    import ray.data as rd

    dirs = leaf_partition_dirs(root)
    if not dirs:
        return pd.DataFrame(
            columns=["dir", "files_before", "bytes", "recovered", "action",
                     "files_after"])
    if dry_run:
        rows = []
        for d in dirs:
            files = glob(os.path.join(d, "*.parquet"))
            total = sum(os.path.getsize(f) for f in files)
            n_out = max(1, math.ceil(total / target_bytes)) if total else 0
            act = "skip" if len(files) <= 1 or n_out >= len(files) \
                else "compact"
            rows.append({"dir": d, "files_before": len(files),
                         "bytes": total, "recovered": None, "action": act,
                         "files_after": n_out if act == "compact"
                         else len(files)})
        return pd.DataFrame(rows)

    work = rd.from_items([{"dir": d} for d in dirs])
    journal = work.map(lambda r, t=target_bytes: compact_dir(r["dir"], t),
                       num_cpus=1)
    return journal.to_pandas()
