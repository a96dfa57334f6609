"""Two-writer store reconciliation — the reference's S3 sync flag
computation + conflict merge, re-stated for two Parquet stores.

The reference scans the local dir and the S3 listing, keeps one
``KeyItemCache`` row per key with etag/size/timestamp from BOTH sides, and
derives ``do_upload`` / ``do_download`` flags from their diff
(/root/reference/src/s3_sync.rs:130-231 over src/models.rs:849-859); a
conflicting download is merged with the local file via the pairwise
merge-and-dedup (src/s3_sync.rs:337-348 -> src/polars_analysis.rs:169-195).
Etags are md5, like the reference's md5 helper (src/lib.rs:69-88).

Here a "store" is a directory of Parquet files keyed by file name; sync is
symmetric: key only on one side -> copy over; key on both sides with equal
etags -> noop; different etags -> CONFLICT: merge both versions with the K3
keep-first dedup merge and install the merged result on BOTH sides (the
reference resolves conflicts by merge-then-reupload).  A plan is computed
first (pure flag computation, unit-testable), then executed.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from dataclasses import dataclass


def file_etag(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def scan_store(d: str) -> dict[str, dict]:
    """One record per key (file name): etag/size/mtime — the KeyItemCache
    row analog."""
    out: dict[str, dict] = {}
    if not os.path.isdir(d):
        return out
    for fn in sorted(os.listdir(d)):
        if not fn.endswith(".parquet"):
            continue
        p = os.path.join(d, fn)
        if not os.path.isfile(p):   # crashed-merge leftovers are dirs
            continue
        st = os.stat(p)
        out[fn] = {"etag": file_etag(p), "size": st.st_size,
                   "mtime_ns": st.st_mtime_ns}
    return out


@dataclass
class SyncItem:
    key: str
    action: str  # 'upload' | 'download' | 'merge' | 'noop'


def sync_plan(local: str, remote: str) -> list[SyncItem]:
    """The flag computation: diff the two stores' key->etag maps."""
    ls, rs = scan_store(local), scan_store(remote)
    plan: list[SyncItem] = []
    for key in sorted(set(ls) | set(rs)):
        in_l, in_r = key in ls, key in rs
        if in_l and not in_r:
            plan.append(SyncItem(key, "upload"))
        elif in_r and not in_l:
            plan.append(SyncItem(key, "download"))
        elif ls[key]["etag"] != rs[key]["etag"]:
            plan.append(SyncItem(key, "merge"))
        else:
            plan.append(SyncItem(key, "noop"))
    return plan


def run_sync(local: str, remote: str, keys: list[str] | None = None,
             order: list[str] | None = None) -> list[SyncItem]:
    """Execute the plan.  Conflict merge = K3 pairwise keep-first dedup
    (sources/exports.merge_parquet_pair) written to one file per side via a
    tmp dir + atomic rename.  Returns the executed plan."""
    from ..stages import dedup as dd
    from .exports import merge_parquet_pair

    plan = sync_plan(local, remote)
    os.makedirs(local, exist_ok=True)
    os.makedirs(remote, exist_ok=True)
    for item in plan:
        lp, rp = os.path.join(local, item.key), os.path.join(remote, item.key)
        if item.action == "upload":
            shutil.copy2(lp, rp)
        elif item.action == "download":
            shutil.copy2(rp, lp)
        elif item.action == "merge":
            import pyarrow.parquet as pq
            import ray.data as rd
            # tmp names must never end in ".parquet": a crash mid-
            # merge would leave a directory that scan_store treats
            # as a key and file_etag crashes opening (r03 review)
            tmp = os.path.join(local, f"_tmp-sync-{item.key}.d")
            merge_parquet_pair(lp, rp, tmp,
                               keys=keys or dd.NATURAL_KEY,
                               order=order or dd.ORDER_COLS)
            # one-file store layout: rewrite the merged dir as a single
            # file.  Both conflicting files can be empty (ADVICE r02: the
            # old unconditional concat of an empty block list raised
            # ArrowInvalid and aborted the whole sync run) — a zero-row
            # merge writes NO parquet files, so fall back to an empty
            # table with the local file's schema.
            import pyarrow as pa
            import ray
            files = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
            if files:
                merged = rd.read_parquet(tmp).to_arrow_refs()
                blocks = [b for b in ray.get(list(merged)) if b.num_rows > 0]
            else:
                blocks = []
            t = pa.concat_tables(blocks) if blocks \
                else pq.read_schema(lp).empty_table()
            one = os.path.join(local, f"_tmp-sync-{item.key}.part")
            pq.write_table(t, one)
            shutil.rmtree(tmp)
            os.replace(one, lp)
            shutil.copy2(lp, rp)
    return plan
