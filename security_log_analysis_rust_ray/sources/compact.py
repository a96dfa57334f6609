"""Small-file compaction for hive-partitioned Parquet sinks.

A resumable streaming ingest writes MANY small files (one per Ray write
task per pass — a 100-TB sink accumulates millions), and both the
reference's month-partitioned export (src/polars_analysis.rs:133-149: one
file per partition, rewritten by merge) and its pairwise merge CLI
(src/parse_opts.rs:86-100) exist to fight exactly this.  This module is
the Ray-native generalization: compact every LEAF partition directory
into file *runs* of ~``target_bytes`` each.

Design points for the 100-TB case:

- **The work list streams**: partition dirs become a Dataset of work items;
  each dir is compacted by ONE task (`ds.map`, task pool) — a million
  partitions pipeline through the scheduler, nothing global.
- **Partition-local**: a task touches one directory; no shuffle, no
  cross-partition reads.  The hive layout (and therefore `read_sink`
  partition pruning and ingest's per-shard resume lineage) is unchanged.
- **Memory-bounded**: inputs are grouped into runs of ~``target_bytes``
  and each run is read+written independently, so task memory scales with
  the target file size, never with the partition size.
- **Crash-safe + idempotent**: the new files and a ``_MANIFEST`` of their
  names are written and fsynced into ``.compact_tmp``; the atomic rename
  of that dir to ``.compact_ready`` is the COMMIT POINT.  Before it, a
  rerun rolls back by deleting tmp (originals were never touched).  After
  it, a rerun always rolls FORWARD from the complete committed copy: the
  manifest distinguishes originals from new files among the live
  ``*.parquet``, so a kill at ANY point of the swap is recoverable with
  no loss and no duplicates.  (An earlier design keyed recovery on the
  trash dir + "any live file" and could delete surviving originals when
  killed mid-swap — the manifest exists to make the two file populations
  distinguishable.)  All recovery dirs are dot-prefixed, invisible to the
  ``*.parquet`` globs readers use.
- **Content-preserving**: rows are concatenated in deterministic filename
  order; equality is by content, not bytes (same contract as ingest
  resume, pipelines/ingest.py:28-33).
"""

from __future__ import annotations

import os
import shutil
import uuid
from glob import glob

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_TMP = ".compact_tmp"
_TRASH = ".compact_trash"
_READY = ".compact_ready"
_MANIFEST = "_MANIFEST"


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _read_manifest(ready: str) -> list[str]:
    with open(os.path.join(ready, _MANIFEST)) as fh:
        return [ln.strip() for ln in fh if ln.strip()]


def _roll_forward(d: str, ready: str) -> None:
    """Finish a committed swap from the ``.compact_ready`` dir: move the
    surviving originals (live files NOT named in the manifest) to trash,
    move the remaining new files in (names already live were moved by the
    crashed attempt — skipped), then drop trash and the ready dir.
    Idempotent: safe to re-run from any interruption point."""
    names = set(_read_manifest(ready))
    trash = os.path.join(d, _TRASH)
    originals = [f for f in glob(os.path.join(d, "*.parquet"))
                 if os.path.basename(f) not in names]
    if originals:
        os.makedirs(trash, exist_ok=True)
        for f in originals:
            os.rename(f, os.path.join(trash, os.path.basename(f)))
    for name in sorted(names):
        src = os.path.join(ready, name)
        if os.path.exists(src):
            os.rename(src, os.path.join(d, name))
    _fsync_dir(d)
    if os.path.isdir(trash):
        shutil.rmtree(trash)
    # rmtree, not rmdir: every manifest name was moved out above, so
    # anything left in ready is an unreferenced stray — drop it with the dir
    shutil.rmtree(ready)


def _recover(d: str) -> str | None:
    """Roll a crashed compaction forward or back.  Returns the action
    taken (or None).

    - ``.compact_ready`` exists -> the commit point was passed: always
      roll FORWARD from the committed copy (see ``_roll_forward``);
    - no ready dir but ``.compact_trash`` exists -> a pre-manifest layout
      (or foreign state): restore the originals when the dir has no live
      files, else the trash is already-swapped residue — drop it;
    - a leftover ``.compact_tmp`` (pre-commit crash) is simply deleted:
      the originals were never touched before the commit rename.
    """
    ready = os.path.join(d, _READY)
    trash, tmp = os.path.join(d, _TRASH), os.path.join(d, _TMP)
    action = None
    if os.path.isdir(ready):
        _roll_forward(d, ready)
        action = "rolled-forward"
    elif os.path.isdir(trash):
        if glob(os.path.join(d, "*.parquet")):
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


def _plan_runs(files: list[str], sizes: list[int],
               target_bytes: int) -> list[list[str]]:
    """Group files (in deterministic name order) into runs of roughly
    ``target_bytes`` input each — one output file per run."""
    runs: list[list[str]] = []
    cur: list[str] = []
    cur_b = 0
    for f, s in zip(files, sizes):
        if cur and cur_b + s > target_bytes:
            runs.append(cur)
            cur, cur_b = [], 0
        cur.append(f)
        cur_b += s
    if cur:
        runs.append(cur)
    return runs


def compact_dir(d: str, target_bytes: int) -> dict:
    """Compact one leaf partition directory.  Runs inside one Ray task."""
    recovered = _recover(d)
    files = sorted(glob(os.path.join(d, "*.parquet")))
    sizes = [os.path.getsize(f) for f in files]
    total = sum(sizes)
    runs = _plan_runs(files, sizes, target_bytes)
    row = {"dir": d, "files_before": len(files), "bytes": total,
           "recovered": recovered}
    if len(files) <= 1 or len(runs) >= len(files):
        row.update(action="skip", files_after=len(files))
        return row

    tmp = os.path.join(d, _TMP)
    os.makedirs(tmp, exist_ok=True)
    run_id = uuid.uuid4().hex[:12]
    new_names = []
    # one run in memory at a time: task heap scales with target_bytes,
    # not with the partition
    for i, run in enumerate(runs):
        chunk = pa.concat_tables([pq.read_table(f) for f in run],
                                 promote_options="default")
        if chunk.num_rows == 0:
            continue
        name = f"compact-{run_id}-{i:05d}.parquet"
        path = os.path.join(tmp, name)
        pq.write_table(chunk, path)
        with open(path, "rb+") as fh:
            os.fsync(fh.fileno())
        new_names.append(name)
    mpath = os.path.join(tmp, _MANIFEST)
    with open(mpath, "w") as fh:
        fh.write("\n".join(new_names) + "\n")
        fh.flush()
        os.fsync(fh.fileno())
    _fsync_dir(tmp)

    # COMMIT: atomic rename of the complete, fsynced dir; after this a
    # crash at any point is rolled forward by _recover on the next run
    os.rename(tmp, os.path.join(d, _READY))
    _fsync_dir(d)
    _roll_forward(d, os.path.join(d, _READY))
    row.update(action="compacted", files_after=len(new_names))
    return row


def leaf_partition_dirs(root: str) -> list[str]:
    """Every directory under ``root`` that directly holds parquet files —
    or holds a crashed compaction's recovery dirs (a kill between move-out
    and move-in can leave ZERO live files; such a dir must stay on the
    work list so `_recover` can restore it)."""
    out = []
    for cur, dirs, files in os.walk(root):
        has_recovery = any(x in (_TMP, _TRASH, _READY) for x in dirs)
        dirs[:] = [x for x in dirs if not x.startswith(".")]
        if has_recovery or any(f.endswith(".parquet") for f in files):
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
            files = sorted(glob(os.path.join(d, "*.parquet")))
            sizes = [os.path.getsize(f) for f in files]
            n_out = len(_plan_runs(files, sizes, target_bytes))
            act = "skip" if len(files) <= 1 or n_out >= len(files) \
                else "compact"
            rows.append({"dir": d, "files_before": len(files),
                         "bytes": sum(sizes), "recovered": None,
                         "action": act,
                         "files_after": n_out if act == "compact"
                         else len(files)})
        return pd.DataFrame(rows)

    work = rd.from_items([{"dir": d} for d in dirs])
    journal = work.map(lambda r, t=target_bytes: compact_dir(r["dir"], t),
                       num_cpus=1)
    return journal.to_pandas()
