"""Targeted key purge (right-to-erasure / takedown) over a clustered
Parquet layout.

The operational problem at 100 TB: delete every row belonging to a small
key set WITHOUT rewriting the table.  The reference's analog is a keyed
SQL DELETE behind its cleanup path (src/security_log_http.rs cleanup
handlers); the lake-native equivalent is footer-planned file surgery:

- PLAN on zone maps only: a file is a candidate iff any target key falls
  inside some row group's [min, max] for the key column — footers are
  KBs per file, so planning a 100-TB table reads no data.
- REWRITE only candidates, each in its own Ray task: read, drop matching
  rows, write dot-tmp with the layout's row-group size (zone maps stay
  tight), fsync, atomic rename over the original.  A candidate whose
  rows don't actually match (zone-map false positive — min <= key <= max
  but key absent) is left byte-untouched, which also makes re-running a
  purge a no-op (idempotent, crash-safe: a half-finished purge rerun
  skips already-clean files and redoes the rest).
- AUDIT: one JSON-lines record per rewritten file (rows before/after)
  plus a totals line — the provenance trail an erasure request requires.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from .clustered import ROW_GROUP_ROWS


def _candidate_files(data_dir: str, key_col: str,
                     keys: list[str]) -> tuple[list[str], int]:
    """Footer-only plan: files whose zone maps could hold any target key."""
    cands, total = [], 0
    for f in sorted(glob.glob(os.path.join(data_dir, "*.parquet"))):
        total += 1
        md = pq.ParquetFile(f).metadata
        col = next(i for i in range(len(md.schema))
                   if md.schema.column(i).name == key_col)
        hit = False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            if st is None or not st.has_min_max:
                hit = True
                break
            if any(st.min <= k <= st.max for k in keys):
                hit = True
                break
        if hit:
            cands.append(f)
    return cands, total


@ray.remote
def _purge_file(path: str, key_col: str, keys: list[str],
                row_group_rows: int) -> dict:
    """Rewrite one candidate file without the target keys (atomic); a
    zone-map false positive leaves the file byte-untouched."""
    t = pq.read_table(path)
    mask = pc.is_in(t[key_col], value_set=pa.array(keys))
    n_hit = pc.sum(mask).as_py() or 0
    if not n_hit:
        return {"file": path, "rows_before": t.num_rows,
                "rows_after": t.num_rows, "purged": 0, "rewritten": False}
    kept = t.filter(pc.invert(mask))
    tmp = path + ".tmp"
    pq.write_table(kept, tmp, row_group_size=row_group_rows)
    with open(tmp, "rb") as fh:
        os.fsync(fh.fileno())
    os.rename(tmp, path)
    return {"file": path, "rows_before": t.num_rows,
            "rows_after": kept.num_rows, "purged": int(n_hit),
            "rewritten": True}


def purge_keys(index_dir: str, keys: list[str], key_col: str = "host",
               audit_path: str | None = None) -> dict:
    """Purge every row whose ``key_col`` is in ``keys`` from the clustered
    layout at ``index_dir`` (as built by ``clustered.clustered_build``).
    Returns totals; writes a JSON-lines audit when ``audit_path`` given."""
    data_dir = os.path.join(index_dir, "data")
    cands, n_files = _candidate_files(data_dir, key_col, keys)
    results = ray.get([
        _purge_file.remote(f, key_col, list(keys), ROW_GROUP_ROWS)
        for f in cands])
    purged = sum(r["purged"] for r in results)
    rewritten = [r for r in results if r["rewritten"]]

    man_path = os.path.join(index_dir, "manifest.json")
    if purged and os.path.exists(man_path):
        with open(man_path) as fh:
            man = json.load(fh)
        man["rows"] = int(man.get("rows", 0)) - purged
        tmp = man_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(man, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, man_path)

    totals = {"files_total": n_files, "files_candidates": len(cands),
              "files_rewritten": len(rewritten), "rows_purged": purged,
              "keys": sorted(keys)}
    if audit_path:
        with open(audit_path, "a") as fh:
            for r in rewritten:
                fh.write(json.dumps(r) + "\n")
            fh.write(json.dumps({"totals": totals}) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
    return totals
