"""Z-ORDER (Morton-interleaved) clustered layout: 2-D zone-map pruning.

``pipelines/clustered.py`` sorts by ONE key, so point lookups on that key
prune row groups but any predicate on a second column scans everything —
the classic lake-layout dilemma.  Interleaving the bits of two columns
into one Morton key and sorting by THAT bounds every row group in BOTH
dimensions at once: each row group's footer min/max for user_id AND for
ts is tight, so a (user band × day) lookup reads only the row groups
whose zone maps straddle both predicates.  Same build-once /
footer-only-planning / parallel-row-group-read discipline as the 1-D
layout; nothing here is specific to two dimensions (interleave more
columns for more).

The lookup constants are fixed so the query is oracle-checkable at any
sf (events span 2024-01; user band 3-6 exists at every scale).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..sources.readers import read_table

ROW_GROUP_ROWS = 2048
LOOKUP_USER_LO, LOOKUP_USER_HI = 3, 6
LOOKUP_DAY = "2024-01-15"
_DAY_US = 86_400_000_000


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 16 bits of x to the even bit positions."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave the low 16 bits of a (odd positions) and b (even)."""
    return ((_part1by1(a) << np.uint64(1)) | _part1by1(b)).astype(np.int64)


def zorder_build(sf_dir: str, index_dir: str) -> dict:
    """Events sorted by morton(user_id, day-index), small row groups,
    atomic tmp+rename; a manifest makes rebuilds no-ops."""
    man_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as fh:
            return json.load(fh)
    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def zkey(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        day = (b["ts"].cast(pa.int64()).to_numpy() // _DAY_US)
        return b.append_column("_z", pa.array(morton2(uid, day), pa.int64()))

    ds = read_table(sf_dir, "events").map_batches(
        zkey, batch_format="pyarrow").sort("_z")
    ds = ds.drop_columns(["_z"])
    ds.write_parquet(os.path.join(tmp, "data"),
                     row_group_size=ROW_GROUP_ROWS)
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in
            glob.glob(os.path.join(tmp, "data", "*.parquet")))
    man = {"rows": int(n), "layout": "morton(user_id, day)",
           "row_group_rows": ROW_GROUP_ROWS}
    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump(man, fh)
    os.rename(tmp, index_dir)
    return man


def _plan(index_dir: str, user_lo: int, user_hi: int,
          day_lo_us: int, day_hi_us: int) -> tuple[list, int, int]:
    """Footer-only 2-D plan: row groups whose [min,max] straddle BOTH the
    user band and the day window."""
    work, total = [], 0
    for f in sorted(glob.glob(os.path.join(index_dir, "data",
                                           "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(len(md.schema))}
        for rg in range(md.num_row_groups):
            total += 1
            su = md.row_group(rg).column(cols["user_id"]).statistics
            st = md.row_group(rg).column(cols["ts"]).statistics
            if su is not None and su.has_min_max and \
                    (su.max < user_lo or su.min > user_hi):
                continue
            if st is not None and st.has_min_max:
                lo = int(pa.scalar(st.min, pa.timestamp("us"))
                         .cast(pa.int64()).as_py())
                hi = int(pa.scalar(st.max, pa.timestamp("us"))
                         .cast(pa.int64()).as_py())
                if hi < day_lo_us or lo >= day_hi_us:
                    continue
            work.append((f, rg))
    return work, len(work), total


def zorder_plan_stats(sf_dir: str, index_dir: str | None = None) -> dict:
    """Selected/total row-group counts for the canonical lookup — the
    pruning evidence pytest pins down."""
    index_dir = _default_dir(sf_dir) if index_dir is None else index_dir
    zorder_build(sf_dir, index_dir)
    day_lo = int(np.datetime64(LOOKUP_DAY, "us").astype(np.int64))
    work, sel, total = _plan(index_dir, LOOKUP_USER_LO, LOOKUP_USER_HI,
                             day_lo, day_lo + _DAY_US)
    return {"selected": sel, "total": total}


def _default_dir(sf_dir: str) -> str:
    from ..synth import CACHE_ROOT
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return os.path.join(CACHE_ROOT, tag, "zorder_events")


def events_zorder_lookup(sf_dir: str,
                         index_dir: str | None = None) -> rd.Dataset:
    """All events in the canonical (user band × day) cell, reading ONLY
    the 2-D zone-map-selected row groups, one Ray task per contiguous
    row-group read.  Output the full events row, sorted by event_id."""
    index_dir = _default_dir(sf_dir) if index_dir is None else index_dir
    zorder_build(sf_dir, index_dir)
    day_lo = int(np.datetime64(LOOKUP_DAY, "us").astype(np.int64))
    day_hi = day_lo + _DAY_US
    work, _, _ = _plan(index_dir, LOOKUP_USER_LO, LOOKUP_USER_HI,
                       day_lo, day_hi)
    schema = pq.read_schema(
        sorted(glob.glob(os.path.join(index_dir, "data", "*.parquet")))[0])
    if not work:
        return rd.from_arrow(schema.empty_table())

    def read_rgs(b: dict) -> pa.Table:
        parts = []
        for f, rg in zip(b["file"], b["rg"]):
            t = pq.ParquetFile(f).read_row_group(int(rg))
            ts = t["ts"].cast(pa.int64())
            m = pc.and_(
                pc.and_(pc.greater_equal(t["user_id"], LOOKUP_USER_LO),
                        pc.less_equal(t["user_id"], LOOKUP_USER_HI)),
                pc.and_(pc.greater_equal(ts, day_lo), pc.less(ts, day_hi)))
            parts.append(t.filter(m))
        return pa.concat_tables(parts)

    items = [{"file": f, "rg": rg} for f, rg in work]
    return rd.from_items(items,
                         override_num_blocks=min(len(items), 64)) \
        .map_batches(read_rgs, batch_format="numpy", batch_size=None) \
        .sort("event_id")
