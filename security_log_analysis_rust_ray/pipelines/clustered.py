"""Clustered (sort-keyed) Parquet layout with zone-map row-group pruning.

The reference serves host point-lookups from a Postgres btree
(src/security_log_http.rs intrusion-log handlers); the lake-native
equivalent is a table SORTED by the lookup key written with small row
groups, so every row group's footer min/max forms a zone map and a point
lookup touches only the row groups whose [min, max] straddle the key —
O(matching rows) I/O out of a 100-TB table, with only footers (KBs per
file) read for planning.  Same build-once/prune-at-read discipline as the
IVF/LSH/inverted indexes; hive path pruning (P14) prunes FILES by
partition value, this prunes WITHIN files by sort order.

Plan side: footer metadata is tiny and reads driver-side; the selected
(file, row-group) work list ships to ``read_parquet(files=..., filter=)``
fragments?  No — Ray's reader plans per file.  Selected row groups are
read in PARALLEL Ray tasks via ``from_items`` over the work list +
``map_batches`` (one pyarrow row-group read per item), so the scan stays
distributed and each task does one contiguous columnar read.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from . import reports

ROW_GROUP_ROWS = 2048
LOOKUP_HOST = "h7.example.com"   # stable at every sf (hosts = h0..h49+)


def clustered_build(sf_dir: str, index_dir: str) -> dict:
    """Write the parsed sink sorted by (host, ts, conv_id, turn_idx) with
    small row groups (atomic tmp+rename; manifest makes rebuilds no-ops)."""
    man_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as fh:
            return json.load(fh)
    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds = reports.parsed(sf_dir).sort(["host", "ts", "conv_id", "turn_idx"])
    ds.write_parquet(os.path.join(tmp, "data"),
                     row_group_size=ROW_GROUP_ROWS)
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in
            glob.glob(os.path.join(tmp, "data", "*.parquet")))
    man = {"rows": int(n), "sort_key": ["host", "ts", "conv_id",
                                        "turn_idx"],
           "row_group_rows": ROW_GROUP_ROWS}
    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump(man, fh)
    os.rename(tmp, index_dir)
    return man


def _plan_row_groups(index_dir: str, host: str) -> tuple[list, int, int]:
    """Zone-map planning: footers only.  Returns (work list of
    (file, row_group_idx), selected count, total count)."""
    work, total = [], 0
    for f in sorted(glob.glob(os.path.join(index_dir, "data",
                                           "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        hcol = None
        for i in range(len(md.schema)):
            if md.schema.column(i).name == "host":
                hcol = i
                break
        for rg in range(md.num_row_groups):
            total += 1
            st = md.row_group(rg).column(hcol).statistics
            if st is None or not st.has_min_max \
                    or (st.min <= host <= st.max):
                work.append((f, rg))
    return work, len(work), total


def clustered_host_lookup(sf_dir: str, host: str = LOOKUP_HOST,
                          index_dir: str | None = None) -> rd.Dataset:
    """All parsed rows for ``host`` reading ONLY the zone-map-selected row
    groups (pytest asserts the selected fraction is small), each in its
    own Ray task.  Output sorted (ts, conv_id, turn_idx)."""
    if index_dir is None:
        from ..synth import CACHE_ROOT
        tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
        index_dir = os.path.join(CACHE_ROOT, tag, "clustered_host")
    clustered_build(sf_dir, index_dir)
    work, _, _ = _plan_row_groups(index_dir, host)
    schema = pq.read_schema(
        sorted(glob.glob(os.path.join(index_dir, "data", "*.parquet")))[0])
    if not work:
        return rd.from_arrow(schema.empty_table())

    def read_rgs(b: dict) -> pa.Table:
        import pyarrow.compute as pc
        parts = []
        for f, rg in zip(b["file"], b["rg"]):
            t = pq.ParquetFile(f).read_row_group(int(rg))
            parts.append(t.filter(pc.equal(t["host"], host)))
        return pa.concat_tables(parts)

    items = [{"file": f, "rg": rg} for f, rg in work]
    return rd.from_items(items,
                         override_num_blocks=min(len(items), 64)) \
        .map_batches(read_rgs, batch_format="numpy", batch_size=None) \
        .sort(["ts", "conv_id", "turn_idx"])
