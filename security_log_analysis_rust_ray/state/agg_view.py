"""Incrementally-maintained grouped-count view: persisted partial counts
merged with each night's delta — aggregate-view maintenance for a
recurring ingest, so the nightly job costs O(delta) instead of a full
recompute over an ever-growing corpus.

Semantics follow the ingest manifest's exactly-once discipline
(state/manifest.py, reference KeyItemCache src/parse_logs.rs:180-197):
every delta application carries a TAG; the view manifest records applied
tags and re-applying a seen tag is a no-op, so a crashed-and-rerun night
cannot double-count.  Storage is versioned: each merge writes a fresh
``v{n}`` directory of partitioned Parquet counts and flips the manifest
atomically (tmp+rename), so readers never see a half-written view and a
crash mid-merge leaves the previous version intact.  Only the newest two
versions are kept.

The merge itself is dataset-native: delta -> in-batch partial counts,
UNION with the persisted counts (already one row per key), one
``grouped_sum`` exchange — the persisted side enters as counts, never as
raw rows, so merge cost scales with keys + delta, not corpus size.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import ray.data as rd

from ..stages.aggregate import grouped_count, grouped_sum


def _manifest_path(view_dir: str) -> str:
    return os.path.join(view_dir, "MANIFEST.json")


def _read_manifest(view_dir: str) -> dict | None:
    p = _manifest_path(view_dir)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def read_counts_view(view_dir: str) -> rd.Dataset | None:
    """Current merged counts (keys + cnt), or None before the first
    delta."""
    man = _read_manifest(view_dir)
    if man is None:
        return None
    return rd.read_parquet(os.path.join(view_dir, man["current"]))


def update_counts_view(view_dir: str, delta: rd.Dataset, keys: list[str],
                       tag: str, alias: str = "cnt") -> rd.Dataset:
    """Merge ``delta``'s grouped counts into the persisted view under an
    exactly-once ``tag``; returns the (possibly unchanged) current view."""
    os.makedirs(view_dir, exist_ok=True)
    man = _read_manifest(view_dir)
    if man is not None and tag in man["applied"]:
        return read_counts_view(view_dir)          # already applied: no-op
    part = grouped_count(delta, keys, alias=alias)
    if man is not None:
        prev = read_counts_view(view_dir)
        merged = grouped_sum(prev.union(part), keys, alias, alias=alias)
    else:
        merged = part

    def as_int(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index(alias)
        return b.set_column(i, alias, b[alias].cast(pa.int64()))

    merged = merged.map_batches(as_int, batch_format="pyarrow",
                                batch_size=None)
    version = (man["version"] + 1) if man else 1
    vdir = f"v{version}"
    tmp = os.path.join(view_dir, vdir + ".tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write_parquet(tmp)
    os.rename(tmp, os.path.join(view_dir, vdir))
    new_man = {"version": version, "current": vdir,
               "applied": (man["applied"] if man else []) + [tag],
               "keys": keys, "alias": alias}
    mtmp = _manifest_path(view_dir) + ".tmp"
    with open(mtmp, "w") as fh:
        json.dump(new_man, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(mtmp, _manifest_path(view_dir))
    # prune all but the two newest versions (the current one + one back
    # for in-flight readers)
    for name in os.listdir(view_dir):
        if name.startswith("v") and name[1:].isdigit() \
                and int(name[1:]) < version - 1:
            shutil.rmtree(os.path.join(view_dir, name),
                          ignore_errors=True)
    return read_counts_view(view_dir)
