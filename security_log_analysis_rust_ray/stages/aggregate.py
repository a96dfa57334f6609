"""Aggregation stages with the partial/final (combiner) pattern.

The reference's own Parquet analytics path already demonstrates
partial-then-final aggregation (per-file group_by count, vstack, re-group sum
— /root/reference/src/polars_analysis.rs:222-284).  Here the partial happens
*inside* ``map_batches`` via Arrow's in-batch hash groupby, so the wide
``groupby`` shuffle only ever moves one row per (key, block) — this is also
the salted-key answer to hot-key skew: a hot key contributes at most
``num_blocks`` partial rows regardless of its row count.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

_NULL_SENTINEL = "\x00__null__"


def _fill(batch: pa.Table, cols: list[str]) -> pa.Table:
    for c in cols:
        if batch.schema.field(c).type == pa.string():
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(i, c, pc.fill_null(batch[c], _NULL_SENTINEL))
    return batch


def _restore(batch: pa.Table, cols: list[str]) -> pa.Table:
    for c in cols:
        if batch.schema.field(c).type == pa.string():
            arr = batch[c]
            i = batch.schema.get_field_index(c)
            batch = batch.set_column(
                i, c, pc.if_else(pc.equal(arr, _NULL_SENTINEL),
                                 pa.nulls(len(batch), pa.string()), arr))
    return batch


def grouped_count(ds: rd.Dataset, keys: list[str], alias: str = "cnt",
                  high_cardinality: bool = False,
                  small_keyspace: bool = False) -> rd.Dataset:
    """groupby(keys).count() with per-batch partial counts (combiner first).

    Null key values group together (matching SQL GROUP BY), via sentinel fill.

    ``high_cardinality=True`` switches the final exchange from the sort-based
    aggregate to hash-repartition + per-block Arrow sum — 3x faster when the
    partial rows barely compress (millions of distinct keys); the sort path
    wins for small key spaces (it emits globally sorted tiny output).
    """
    def partial(b: pa.Table) -> pa.Table:
        b = _fill(b.select(keys), keys)
        g = b.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["_partial"])

    return _grouped_fold(ds, keys, partial, alias,
                         high_cardinality, small_keyspace)


def grouped_sum(ds: rd.Dataset, keys: list[str], value_col: str,
                alias: str = "sum",
                high_cardinality: bool = False,
                small_keyspace: bool = False) -> rd.Dataset:
    """groupby(keys).sum(value_col) with the same partial/final combiner
    plan as ``grouped_count`` — the in-batch Arrow partial means the
    exchange moves one row per (key, block), and ``high_cardinality=True``
    swaps the sort-based final for hash-repartition + per-block sum (the
    term-count "LM training" fold in ``doc_lm_score`` went 27 s -> ~2 s on
    the 100k bench corpus with this path vs the native sort groupby)."""
    def partial(b: pa.Table) -> pa.Table:
        b = _fill(b.select(keys + [value_col]), keys)
        g = b.group_by(keys).aggregate([(value_col, "sum")])
        return g.rename_columns(keys + ["_partial"])

    return _grouped_fold(ds, keys, partial, alias,
                         high_cardinality, small_keyspace)


def _grouped_fold(ds: rd.Dataset, keys: list[str], partial, alias: str,
                  high_cardinality: bool, small_keyspace: bool,
                  combine: str = "sum") -> rd.Dataset:
    """Shared final-exchange plan under ``grouped_count``/``grouped_sum``/
    ``grouped_min``: ``partial`` emits (keys + "_partial") per batch; the
    final folds "_partial" per key with ``combine`` ("sum" or "min" — both
    are associative+commutative, so the partial/final split is exact) via
    driver combine (guarded small keyspace), hash-repartition + per-block
    fold (high cardinality), or the sort-based aggregate (default)."""
    if small_keyspace:
        # guard (VERDICT r01): partial rows scale with BLOCK COUNT, so the
        # driver-side final combine is only safe while the input (hence its
        # block count) is bounded; past ~64 GB estimated input, fall back to
        # the distributed final even if the caller claimed a small keyspace
        from .dedup import _estimate_bytes
        est = _estimate_bytes(ds)
        if est is not None and est > (64 << 30):
            small_keyspace = False
    if small_keyspace:
        # the partial stage has already reduced the data to one row per
        # (key, block); for a SMALL key space (e.g. 26 countries) the final
        # combine is a tiny vstack + re-aggregate — the reference's own A2
        # final step (/root/reference/src/polars_analysis.rs:222-241).
        # Collecting a few hundred partial rows driver-side avoids the fixed
        # multi-second cost of a distributed shuffle for a 26-row result.
        import ray
        pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        # empty blocks arrive as ZERO-COLUMN tables (parallelism-dependent)
        # — or, downstream of a pandas-block stage, as raw zero-row pandas
        # frames that to_arrow_refs passes through unconverted — drop both
        # before concat
        import pandas as _pd
        blocks = []
        for t in ray.get(list(pre.to_arrow_refs())):
            if isinstance(t, _pd.DataFrame):
                if not len(t):
                    continue
                t = pa.Table.from_pandas(t, preserve_index=False)
            if t.num_rows > 0:
                blocks.append(t)
        if not blocks:
            empty = pa.table(
                {**{k: pa.array([], pa.string()) for k in keys},
                 alias: pa.array([], pa.int64())})
            return rd.from_arrow(empty)
        t = pa.concat_tables(blocks)
        g = t.group_by(keys).aggregate([("_partial", combine)])
        g = g.rename_columns(keys + [alias])
        return rd.from_arrow(_restore(g, keys))

    if high_cardinality:
        from .dedup import _num_partitions, _use_hash_shuffle

        def final_block(b: pa.Table) -> pa.Table:
            g = b.group_by(keys).aggregate([("_partial", combine)])
            return g.rename_columns(keys + [alias])

        pre = _use_hash_shuffle(ds).map_batches(
            partial, batch_format="pyarrow", batch_size=None)
        out = pre.repartition(num_blocks=_num_partitions(ds), keys=keys) \
                 .map_batches(final_block, batch_format="pyarrow",
                              batch_size=None)
    else:
        pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        # if this chain inherited HASH_SHUFFLE (e.g. from an upstream join),
        # cap the hash-aggregate partition count to the data-sized value —
        # Ray's 200-partition default starves small CPU budgets
        from ray.data.context import ShuffleStrategy
        if pre.context.shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE:
            from .dedup import _num_partitions
            pre.context.default_hash_shuffle_parallelism = _num_partitions(ds)
        from ray.data.aggregate import Max, Min
        agg_cls = {"sum": Sum, "min": Min, "max": Max}[combine]
        out = pre.groupby(keys).aggregate(agg_cls("_partial",
                                                  alias_name=alias))
    return out.map_batches(lambda b: _restore(b, keys), batch_format="pyarrow",
                           batch_size=None)


def grouped_min(ds: rd.Dataset, keys: list[str], value_col: str,
                alias: str = "min",
                high_cardinality: bool = False,
                small_keyspace: bool = False) -> rd.Dataset:
    """groupby(keys).min(value_col) with the same partial/final combiner
    plan as ``grouped_count`` — min is associative+commutative so the
    in-batch partial is exact, and the exchange moves one row per
    (key, block)."""
    def partial(b: pa.Table) -> pa.Table:
        b = _fill(b.select(keys + [value_col]), keys)
        g = b.group_by(keys).aggregate([(value_col, "min")])
        return g.rename_columns(keys + ["_partial"])

    return _grouped_fold(ds, keys, partial, alias,
                         high_cardinality, small_keyspace, combine="min")


def grouped_max(ds: rd.Dataset, keys: list[str], value_col: str,
                alias: str = "max",
                high_cardinality: bool = False,
                small_keyspace: bool = False) -> rd.Dataset:
    """groupby(keys).max(value_col) — ``grouped_min``'s mirror (max is
    associative+commutative, partial/final split exact)."""
    def partial(b: pa.Table) -> pa.Table:
        b = _fill(b.select(keys + [value_col]), keys)
        g = b.group_by(keys).aggregate([(value_col, "max")])
        return g.rename_columns(keys + ["_partial"])

    return _grouped_fold(ds, keys, partial, alias,
                         high_cardinality, small_keyspace, combine="max")


def top_k(ds: rd.Dataset, sort_col: str, keys_asc: list[str], k: int) -> rd.Dataset:
    """O2/O3: sort desc on ``sort_col`` with deterministic ascending
    tie-breaks, take k (reference sort+take(10),
    /root/reference/src/parse_opts.rs:228-229)."""
    cols = [sort_col] + keys_asc
    desc = [True] + [False] * len(keys_asc)
    return ds.sort(cols, descending=desc).limit(k)


def grouped_top_k(ds: rd.Dataset, group_cols: list[str], order_col: str,
                  k: int, descending: bool = True,
                  tie_cols: list[str] | None = None) -> rd.Dataset:
    """Per-GROUP top-k (SQL ``row_number() OVER (PARTITION BY group ORDER
    BY order_col) <= k``), distributed as partial/final:

    1. per-block partial: each block keeps at most k rows per group — a
       correct combiner, since a row in the global per-group top-k is
       necessarily in its own block's per-group top-k;
    2. one hash exchange on ``group_cols`` co-locates each group's
       survivors (≤ k × n_blocks rows per group, usually ≪ the group);
    3. the same kernel per partition yields the exact answer.

    The kernel is one Arrow multi-column sort + a vectorized numpy
    rank-within-group (boundary cumsum over the sorted order) — no
    per-group Python.  Ties are broken ascending on ``tie_cols`` so the
    result is deterministic and oracle-checkable against ROW_NUMBER.
    Null group keys form their own group (SQL GROUP BY parity) via the
    sentinel fill; null order values sort last.
    """
    import numpy as np

    tie_cols = tie_cols or []
    sort_keys = [(c, "ascending") for c in group_cols] \
        + [(order_col, "descending" if descending else "ascending")] \
        + [(c, "ascending") for c in tie_cols]

    def head_per_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t
        t = _fill(t, group_cols)
        t = t.take(pc.sort_indices(
            t, sort_keys=sort_keys, null_placement="at_end"))
        n = t.num_rows
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for c in group_cols:
            col = t[c].combine_chunks()
            a, b = col.slice(1), col.slice(0, n - 1)
            # null-safe equality: null==null is SAME group (SQL GROUP BY)
            same = pc.or_(pc.fill_null(pc.equal(a, b), False),
                          pc.and_(pc.is_null(a), pc.is_null(b)))
            change[1:] |= ~np.asarray(same)
        gid = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        rank = np.arange(n) - starts[gid]
        return _restore(t.filter(pa.array(rank < k)), group_cols)

    from .dedup import _num_partitions, _use_hash_shuffle
    pre = ds.map_batches(head_per_group, batch_format="pyarrow",
                         batch_size=None)
    return _use_hash_shuffle(pre).repartition(
        num_blocks=_num_partitions(ds), keys=group_cols) \
        .map_batches(head_per_group, batch_format="pyarrow",
                     batch_size=None)


def add_year_month(batch: pa.Table) -> pa.Table:
    """A3: derive partition columns from the fact timestamp
    (/root/reference/src/polars_analysis.rs:83-93)."""
    return (batch
            .append_column("year", pc.cast(pc.year(batch["datetime"]), pa.int32()))
            .append_column("month", pc.cast(pc.month(batch["datetime"]), pa.int32())))


def grouped_count_rollup(ds: rd.Dataset, keys: list[str], alias: str = "cnt",
                         grp_col: str = "grp_id",
                         high_cardinality: bool = False,
                         small_keyspace: bool = False) -> rd.Dataset:
    """GROUP BY ROLLUP(keys) counts — every trailing-prefix grouping level
    in ONE pass / one exchange (the reference reports per-(service,server)
    AND per-service totals as separate queries; a 100-TB corpus can't
    afford a scan per level).  Per batch: one in-batch full-key count,
    then each coarser level folds from that already-tiny partial (never
    re-touching the batch rows); all levels union into the same exchange,
    keyed by (keys..., ``grp_col``).  ``grp_col`` follows SQL
    ``GROUPING(keys...)`` bit semantics (trailing-roll levels: 0, 1, 3,
    ...), so rolled cells (emitted NULL) can never collide with genuine
    null key values at a different level.  String keys only (the sentinel
    trick needs a string domain).  Empty input -> 0 rows (note: SQL ROLLUP
    emits a grand-total row even for empty input; callers on possibly
    empty corpora must add it — the queries here run on never-empty
    sinks)."""
    for k in keys:
        f = ds.schema().base_schema.field(k)
        assert f.type in (pa.string(), pa.large_string()), (k, f.type)
    full = keys + [grp_col]

    def partial(b: pa.Table) -> pa.Table:
        base = _fill(b.select(keys), keys)
        g = base.group_by(keys).aggregate([([], "count_all")]) \
            .rename_columns(keys + ["n"])
        outs = []
        for level in range(len(keys) + 1):
            kept = keys[:len(keys) - level]
            if kept:
                gl = g.group_by(kept).aggregate([("n", "sum")]) \
                    .rename_columns(kept + ["n"])
            elif g.num_rows:
                gl = pa.table({"n": pa.array(
                    [pc.sum(g["n"]).as_py()], pa.int64())})
            else:
                continue
            cols = {k: gl[k] for k in kept}
            for k in keys[len(kept):]:
                cols[k] = pa.array([_NULL_SENTINEL] * gl.num_rows,
                                   pa.string())
            cols[grp_col] = pa.array([(1 << level) - 1] * gl.num_rows,
                                     pa.int64())
            cols["_partial"] = pc.cast(gl["n"], pa.int64())
            outs.append(pa.table(cols))
        live = [t for t in outs if t.num_rows]
        if not live:
            return pa.table(
                {**{k: pa.array([], pa.string()) for k in keys},
                 grp_col: pa.array([], pa.int64()),
                 "_partial": pa.array([], pa.int64())})
        return pa.concat_tables(live)

    return _grouped_fold(ds, full, partial, alias,
                         high_cardinality, small_keyspace)


def grouped_count_cube(ds: rd.Dataset, keys: list[str], alias: str = "cnt",
                       grp_col: str = "grp_id",
                       high_cardinality: bool = False,
                       small_keyspace: bool = False) -> rd.Dataset:
    """GROUP BY CUBE(keys) counts — ALL 2^k grouping sets in one pass /
    one exchange (ROLLUP's trailing-prefix levels generalized to every
    subset; the dashboard shape "totals by service, by server, by pair,
    and overall" without four scans).  Per batch: one in-batch full-key
    count, then each of the 2^k subsets folds from that already-tiny
    partial.  ``grp_col`` follows SQL ``GROUPING(keys...)`` bit semantics
    (bit for keys[i] = 1 << (k-1-i) when keys[i] is rolled up), so rolled
    NULL cells can't collide with genuine null key values in a different
    grouping set.  String keys only; same empty-input caveat as
    ``grouped_count_rollup``."""
    for k in keys:
        f = ds.schema().base_schema.field(k)
        assert f.type in (pa.string(), pa.large_string()), (k, f.type)
    nk = len(keys)
    full = keys + [grp_col]

    def partial(b: pa.Table) -> pa.Table:
        base = _fill(b.select(keys), keys)
        g = base.group_by(keys).aggregate([([], "count_all")]) \
            .rename_columns(keys + ["n"])
        outs = []
        for mask in range(1 << nk):
            kept = [keys[i] for i in range(nk)
                    if not (mask & (1 << (nk - 1 - i)))]
            if kept:
                gl = g.group_by(kept).aggregate([("n", "sum")]) \
                    .rename_columns(kept + ["n"])
            elif g.num_rows:
                gl = pa.table({"n": pa.array(
                    [pc.sum(g["n"]).as_py()], pa.int64())})
            else:
                continue
            cols = {k: gl[k] for k in kept}
            for k in keys:
                if k not in kept:
                    cols[k] = pa.array([_NULL_SENTINEL] * gl.num_rows,
                                       pa.string())
            cols[grp_col] = pa.array([mask] * gl.num_rows, pa.int64())
            cols["_partial"] = pc.cast(gl["n"], pa.int64())
            outs.append(pa.table(cols).select(full + ["_partial"]))
        live = [t for t in outs if t.num_rows]
        if not live:
            return pa.table(
                {**{k: pa.array([], pa.string()) for k in keys},
                 grp_col: pa.array([], pa.int64()),
                 "_partial": pa.array([], pa.int64())})
        return pa.concat_tables(live)

    return _grouped_fold(ds, full, partial, alias,
                         high_cardinality, small_keyspace)


def pivot_counts(ds: rd.Dataset, key: str, col: str,
                 values: list[str], alias_fmt: str = "{v}") -> rd.Dataset:
    """Crosstab: one row per ``key``, one int64 count column per value of
    ``col`` (``values`` must enumerate them — a pivot's output schema is
    fixed up front; unseen values produce all-zero columns, values outside
    the list are NOT counted).  Same combiner discipline as
    ``grouped_count``: the per-batch hash count collapses the batch to one
    row per (key, col) BEFORE the local pivot, so the exchange moves at
    most len(values) ints per (key, block).  SQL equivalent:
    ``count(*) FILTER (WHERE col = v) AS v`` per value."""
    names = [alias_fmt.format(v=v) for v in values]

    def partial(b: pa.Table) -> pa.Table:
        base = _fill(b.select([key, col]), [key])
        g = base.group_by([key, col]).aggregate([([], "count_all")]) \
            .rename_columns([key, col, "n"])
        n = pc.cast(g["n"], pa.int64())
        wide = pa.table(
            {key: g[key],
             **{name: pc.if_else(pc.equal(g[col], v), n, pa.scalar(0))
                for name, v in zip(names, values)}})
        out = wide.group_by([key]).aggregate([(nm, "sum") for nm in names])
        return out.rename_columns([key] + names)

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    out = pre.groupby(key).aggregate(
        *[Sum(nm, alias_name=nm) for nm in names])

    def finish(b: pa.Table) -> pa.Table:
        cols = {key: b[key]}
        for nm in names:
            cols[nm] = pc.cast(pc.fill_null(b[nm], 0), pa.int64())
        return _restore(pa.table(cols), [key])
    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


def grouped_stats(ds: rd.Dataset, keys: list[str], value_col: str,
                  round_to: int = 6) -> rd.Dataset:
    """Per-group (n, mean, std, min, max) in ONE pass via the classic
    mergeable-moments fold: each batch emits (n, Σv, Σv², min, max) per
    key, the final exchange sums/extremizes them, and mean/sample-std
    derive at the end (std = sqrt((Σv² − (Σv)²/n)/(n−1)), null for n<2 —
    SQL stddev_samp semantics).  Exactly the reference's A6 EmailStats
    fold generalized to grouped form (src/ses_client.rs:68-109 folds one
    global row).  mean/std round half-away-from-zero to ``round_to`` (the
    oracle restates std from the same Σ/Σ² formula, so both sides round
    the same quantity); min/max are exact."""
    import numpy as np
    from ..functions.util import round_half_up

    def partial(b: pa.Table) -> pa.Table:
        b = _fill(b.select(keys + [value_col]), keys)
        v2 = pc.multiply(b[value_col], b[value_col])
        b = b.append_column("_v2", v2)
        g = b.group_by(keys).aggregate([
            (value_col, "count"), (value_col, "sum"), ("_v2", "sum"),
            (value_col, "min"), (value_col, "max")])
        return g.rename_columns(keys + ["_n", "_s", "_ss", "_min", "_max"])

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    from ray.data.aggregate import Max, Min
    out = pre.groupby(keys).aggregate(
        Sum("_n", alias_name="n_f"), Sum("_s", alias_name="s"),
        Sum("_ss", alias_name="ss"), Min("_min", alias_name="min_v"),
        Max("_max", alias_name="max_v"))

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_f"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = b["s"].to_numpy(zero_copy_only=False)
        ss = b["ss"].to_numpy(zero_copy_only=False)
        mean = s / n
        with np.errstate(invalid="ignore"):
            var = np.where(n > 1, (ss - s * s / n) / (n - 1), np.nan)
            std = np.sqrt(np.maximum(var, 0.0))
        t = pa.table({
            **{k: b[k] for k in keys},
            "n": pa.array(n.astype(np.int64)),
            "mean": pa.array(round_half_up(mean, round_to)),
            "std": pa.array(np.where(np.isnan(std), np.nan,
                                     round_half_up(std, round_to))),
            "min_v": b["min_v"], "max_v": b["max_v"],
        })
        if t.num_rows:
            mask = pa.array(~np.isnan(std))
            i = t.schema.get_field_index("std")
            t = t.set_column(i, "std", pc.if_else(
                mask, t["std"], pa.nulls(t.num_rows, pa.float64())))
        return _restore(t, keys)

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)
