"""Exact dedup shuffles (reference §2.8 D1-D6).

Keep-first semantics, made deterministic for a distributed shuffle (SURVEY
§7.4): within a natural-key group the kept row is the minimum under
``(ts, conv_id, turn_idx)`` — the distributed re-statement of the
reference's "sort by datetime, dedup adjacent, keep first"
(/root/reference/src/parse_logs.rs:198-201) and of its SQL self-join delete
that keeps the smallest id (/root/reference/src/host_country_metadata.rs:179-209).

NULL-key handling: the reference needed a second SQL query because
``username = NULL`` never matches in SQL (host_country_metadata.rs:192-203);
here nulls are filled with a sentinel before the groupby so null == null
(matching the reference's *intent*), then restored.

Scale note: the shuffle is hash-partitioned on the key columns by Ray's
groupby; per-group work is a tiny head-1.  For skewed keys the group is
still one (service,server,hour,host,user) bucket — bounded by construction.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

NATURAL_KEY = ["service", "server", "datetime", "host", "username"]
ORDER_COLS = ["ts", "conv_id", "turn_idx"]
_NULL_SENTINEL = "\x00__null__"


def _fill_sentinel(batch: pa.Table, cols: list[str]) -> pa.Table:
    for c in cols:
        if batch.schema.field(c).type == pa.string():
            batch = batch.set_column(
                batch.schema.get_field_index(c), c,
                pc.fill_null(batch[c], _NULL_SENTINEL),
            )
    return batch


def _restore_sentinel(batch: pa.Table, cols: list[str]) -> pa.Table:
    for c in cols:
        if batch.schema.field(c).type == pa.string():
            arr = batch[c]
            mask = pc.equal(arr, _NULL_SENTINEL)
            batch = batch.set_column(
                batch.schema.get_field_index(c), c,
                pc.if_else(mask, pa.nulls(len(batch), pa.string()), arr),
            )
    return batch


def dedup_keep_first(ds: rd.Dataset, keys: list[str] | None = None,
                     order: list[str] | None = None) -> rd.Dataset:
    """Exact dedup on ``keys`` keeping the minimum row under ``order``."""
    keys = keys or NATURAL_KEY
    order = order or ORDER_COLS

    ds = ds.map_batches(lambda b: _fill_sentinel(b, keys), batch_format="pyarrow")

    def head1(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order, kind="stable").head(1)

    out = ds.groupby(keys).map_groups(head1, batch_format="pandas")
    return out.map_batches(lambda b: _restore_sentinel(b, keys),
                           batch_format="pyarrow")


def distinct_rows(ds: rd.Dataset, cols: list[str]) -> rd.Dataset:
    """D4/D6: distinct over ``cols`` (keep-any) via per-batch pre-distinct
    (combiner) then a grouped head-1 — the partial/final pattern so the
    shuffle moves only unique rows per block."""
    def batch_distinct(b: pa.Table) -> pa.Table:
        b = _fill_sentinel(b.select(cols), cols)
        return b.group_by(cols).aggregate([])

    pre = ds.map_batches(batch_distinct, batch_format="pyarrow")
    out = pre.groupby(cols).map_groups(lambda g: g.head(1), batch_format="pandas")
    return out.map_batches(lambda b: _restore_sentinel(b, cols),
                           batch_format="pyarrow")
