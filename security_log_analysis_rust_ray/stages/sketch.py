"""Mergeable sketches — the approximate path for distinct counts at
10^12-row scale (the exact path, stages/dedup.distinct_rows + count, moves
every distinct key through a shuffle; an HLL register array is 4 KB per
block and merges with an elementwise max).

HyperLogLog (Flajolet et al. 2007, standard bias corrections): p=12 ->
4096 registers, relative error ~1.04/sqrt(4096) = 1.6%.  The per-block
partial is one vectorized pass (hash64 -> register index / leading-zero
rank -> np.maximum.at); partials are one tiny row per block, merged with
np.maximum.reduce — the canonical partial/final aggregate with mergeable
state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import hash64, hash64_stable, mix64

HLL_P = 12
HLL_M = 1 << HLL_P


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_partial(keys: pa.Array) -> np.ndarray:
    """4096-register uint8 HLL state for one batch of keys (vectorized)."""
    reg = np.zeros(HLL_M, dtype=np.uint8)
    if len(keys) == 0:
        return reg
    h = hash64(keys)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - HLL_P)) - 1)
    # bit_length via frexp: 52-bit values are exact in float64, so the
    # exponent IS the bit length; w == 0 -> rank = 64-p+1
    _m, exp = np.frexp(w.astype(np.float64))
    rank = np.where(w == 0, 64 - HLL_P + 1,
                    64 - HLL_P - exp + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    """Standard HLL estimate with linear-counting small-range correction."""
    m = float(HLL_M)
    est = _alpha(HLL_M) * m * m / np.sum(2.0 ** -reg.astype(np.float64))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def mg_partial(keys: pa.Array, k: int) -> dict[str, int]:
    """Misra-Gries summary of one batch: at most k counters; any key with
    frequency > n/(k+1) is guaranteed to survive.  Vectorized: exact
    in-batch counts (Arrow value_counts), keep the top-k counters and
    subtract the (k+1)-th count from them — the batched equivalent of the
    classic decrement step (each discarded counter decrements the kept
    ones' lower bound).  Null keys are dropped — Arrow value_counts counts
    null as a value, and a None counter key would crash every downstream
    sort/tie-break (r03 review); a null is never a heavy hitter in the
    GROUP-BY sense the exact second pass verifies."""
    keys = keys.drop_null()
    if len(keys) == 0:
        return {}
    vc = keys.value_counts()
    vals = vc.field("values").to_pylist()
    cnts = np.asarray(vc.field("counts"))
    if len(vals) <= k:
        return dict(zip(vals, cnts.tolist()))
    order = np.argsort(-cnts, kind="stable")
    thresh = int(cnts[order[k]])
    out = {}
    for i in order[:k]:
        kept = int(cnts[i]) - thresh
        if kept > 0:
            out[vals[i]] = kept
    return out


def mg_merge(a: dict[str, int], b: dict[str, int], k: int) -> dict[str, int]:
    """Standard mergeable-summaries MG merge: add counters, then subtract
    the (k+1)-th largest and drop non-positive."""
    m = dict(a)
    for key, c in b.items():
        m[key] = m.get(key, 0) + c
    if len(m) <= k:
        return m
    counts = sorted(m.values(), reverse=True)
    thresh = counts[k]
    return {key: c - thresh for key, c in m.items() if c - thresh > 0}


def heavy_hitters(ds: rd.Dataset, col: str, k: int = 32,
                  return_total: bool = False):
    """Approximate heavy hitters over ``col``: per-block Misra-Gries
    summaries (k counters each, a few KB) merged pairwise — every key with
    true frequency > n/(k+1) is GUARANTEED present (classic MG bound); the
    returned lower-bound counts undercount by at most n/(k+1).  The hot-key
    detector a 100-TB groupby wants before choosing a salting strategy.

    ``return_total=True`` additionally returns the exact total row count,
    folded through the SAME pass (each summary row carries its block's n;
    merges sum it) — a caller that needs n for the n/(k+1) threshold then
    makes one scan, not two (VERDICT r02 #8)."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        c = b[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if not pa.types.is_string(c.type):
            c = c.cast(pa.string())
        summ = mg_partial(c, k)
        return pa.table({
            "keys": pa.array([list(summ.keys())], pa.list_(pa.string())),
            "cnts": pa.array([list(summ.values())], pa.list_(pa.int64())),
            "n": pa.array([b.num_rows], pa.int64()),
        })

    def merge_block(b: pa.Table) -> pa.Table:
        m: dict[str, int] = {}
        for keys_, cnts_ in zip(b["keys"].to_pylist(), b["cnts"].to_pylist()):
            m = mg_merge(m, dict(zip(keys_, cnts_)), k)
        n = int(pa.compute.sum(b["n"]).as_py() or 0)
        return pa.table({
            "keys": pa.array([list(m.keys())], pa.list_(pa.string())),
            "cnts": pa.array([list(m.values())], pa.list_(pa.int64())),
            "n": pa.array([n], pa.int64()),
        })

    # two-level merge (same shape as approx_distinct): distributed
    # second-level MG merges so the driver folds a handful of summaries,
    # not one per block
    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None) \
        .repartition(8) \
        .map_batches(merge_block, batch_format="pyarrow",
                     batch_size=None).to_pandas()
    merged: dict[str, int] = {}
    total = 0
    for r in rows.itertuples():
        merged = mg_merge(merged, dict(zip(r.keys, r.cnts)), k)
        total += int(r.n)
    out = pd.DataFrame(sorted(merged.items(), key=lambda kv: (-kv[1], kv[0])),
                       columns=["key", "min_count"])
    if return_total:
        return out, total
    return out


def _merge_rows(b: pa.Table) -> pa.Table:
    """Max-merge all register rows in a block into one."""
    if b.num_rows == 0:
        return b
    regs = np.stack([np.frombuffer(r, dtype=np.uint8)
                     for r in b["reg"].to_pylist()])
    return pa.table({"reg": pa.array([np.maximum.reduce(regs).tobytes()],
                                     pa.binary())})


QS_GRID = 512  # per-block quantile-grid resolution (~0.2% rank error/block)


def quantile_partial(vals: np.ndarray, k: int = QS_GRID) -> np.ndarray:
    """One block's quantile summary: the block's values at k equally
    spaced quantile positions (a weighted-centroid grid, deterministic —
    no sampling).  Shape (k,) float64; pair it with the block count."""
    vals = np.asarray(vals, dtype=np.float64)
    vals = vals[~np.isnan(vals)]
    if not len(vals):
        return np.full(k, np.nan)
    return np.quantile(vals, np.linspace(0.0, 1.0, k))


def quantile_merge(grids: np.ndarray, counts: np.ndarray,
                   qs: np.ndarray) -> np.ndarray:
    """Merge per-block grids into estimates at requested quantiles ``qs``:
    every grid point is a centroid of weight count/k; sort all centroids,
    interpolate the cumulative-weight curve.  Deterministic; rank error is
    bounded by ~1/k per block (plus interpolation)."""
    keep = counts > 0
    grids, counts = grids[keep], counts[keep]
    if not len(grids):
        return np.full(len(qs), np.nan)
    k = grids.shape[1]
    w = np.repeat(counts / k, k).astype(np.float64)
    v = grids.reshape(-1)
    ok = ~np.isnan(v)
    v, w = v[ok], w[ok]
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cum = np.cumsum(w) - 0.5 * w      # centroid midpoints
    cum /= w.sum()
    return np.interp(np.asarray(qs, dtype=np.float64), cum, v)


def approx_quantiles(ds: rd.Dataset, col: str, qs: list[float],
                     k: int = QS_GRID) -> dict[float, float]:
    """Approximate quantiles of ``col`` at 100-TB scale: one (grid, count)
    partial row per block (k float64s, ~4 KB), a distributed second-level
    weighted re-summarization (repartition to a handful of blocks), then
    a tiny driver-side merge — same fold shape as ``approx_distinct``.
    The exact path (``docs.doc_length_quantiles``) shuffles every distinct
    value; this never moves more than blocks x 4 KB."""
    def partial(b: pa.Table) -> pa.Table:
        c = b[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        vals = c.cast(pa.float64()).to_numpy(zero_copy_only=False)
        grid = quantile_partial(vals, k)
        n = int(np.sum(~np.isnan(vals)))
        return pa.table({"grid": pa.array([grid.tobytes()], pa.large_binary()),
                         "n": pa.array([n], pa.int64())})

    def resummarize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "grid" not in b.schema.names:
            return pa.table({"grid": pa.array([], pa.large_binary()),
                             "n": pa.array([], pa.int64())})
        grids = np.stack([np.frombuffer(g.as_py(), dtype=np.float64)
                          for g in b["grid"]])
        counts = b["n"].to_numpy().astype(np.float64)
        merged = quantile_merge(grids, counts, np.linspace(0.0, 1.0, k))
        total = int(counts.sum())
        return pa.table({"grid": pa.array([merged.tobytes()],
                                          pa.large_binary()),
                         "n": pa.array([total], pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None) \
        .repartition(8) \
        .map_batches(resummarize, batch_format="pyarrow",
                     batch_size=None).to_pandas()
    if not len(rows):
        return {q: float("nan") for q in qs}
    grids = np.stack([np.frombuffer(g, dtype=np.float64)
                      for g in rows["grid"]])
    counts = rows["n"].to_numpy().astype(np.float64)
    est = quantile_merge(grids, counts, np.asarray(qs))
    return {q: float(v) for q, v in zip(qs, est)}


def approx_distinct(ds: rd.Dataset, col: str) -> float:
    """Approximate COUNT(DISTINCT col): per-block register partials (one
    4 KB row each) -> distributed second-level max-merge (repartition to a
    handful of blocks) -> tiny final merge.  The driver never sees more
    than a few rows, regardless of block count (at 100 TB the first level
    alone would be ~400k rows)."""
    def partial(b: pa.Table) -> pa.Table:
        c = b[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if not pa.types.is_string(c.type):
            c = c.cast(pa.string())
        reg = hll_partial(c)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None) \
        .repartition(8) \
        .map_batches(_merge_rows, batch_format="pyarrow",
                     batch_size=None).to_pandas()
    if not len(rows):
        return 0.0
    regs = np.stack([np.frombuffer(r, dtype=np.uint8)
                     for r in rows["reg"]])
    return hll_estimate(np.maximum.reduce(regs))


# ---------------------------------------------------------------------------
# count-min sketch (mergeable frequency estimates)
# ---------------------------------------------------------------------------

CMS_W = 2048   # width: eps = e/W ~ 0.13% of stream length
CMS_D = 4      # depth: err prob per query ~ e^-D ~ 1.8%


def cms_partial(keys: pa.Array, w: int = CMS_W, d: int = CMS_D) -> np.ndarray:
    """(d, w) count-min partial for one block of keys — d vectorized hash
    rows over the shared stable FNV base hash (so partials from any worker
    merge by plain addition)."""
    sk = np.zeros((d, w), dtype=np.int64)
    if len(keys) == 0:
        return sk
    h = hash64_stable(keys)
    for i in range(d):
        pos = (mix64([h], seed=1000 + i) % np.uint64(w)).astype(np.int64)
        np.add.at(sk[i], pos, 1)
    return sk


def cms_query(sk: np.ndarray, keys: pa.Array) -> np.ndarray:
    """Point estimates for ``keys`` from a merged sketch: min over the d
    rows — always >= the true count (one-sided error)."""
    d, w = sk.shape
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    h = hash64_stable(keys)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(d):
        pos = (mix64([h], seed=1000 + i) % np.uint64(w)).astype(np.int64)
        est = np.minimum(est, sk[i][pos])
    return est


def cms_sketch(ds: rd.Dataset, col: str, w: int = CMS_W,
               d: int = CMS_D) -> np.ndarray:
    """Merged count-min sketch of ``ds[col]``: one (d*w int64, ~64 KB)
    partial row per block, distributed second-level SUM-merge (repartition
    to a handful of blocks), tiny driver-side final sum — the same fold
    shape as ``approx_distinct``; the driver never holds more than a few
    sketch rows however many blocks the corpus has."""
    def partial(b: pa.Table) -> pa.Table:
        c = b[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if not pa.types.is_string(c.type):
            c = c.cast(pa.string())
        sk = cms_partial(c, w, d)
        return pa.table({"sk": pa.array([sk.tobytes()], pa.large_binary())})

    def summerge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sk" not in b.schema.names:
            return pa.table({"sk": pa.array([], pa.large_binary())})
        sks = np.stack([np.frombuffer(s.as_py(), dtype=np.int64)
                        for s in b["sk"]])
        return pa.table({"sk": pa.array([sks.sum(axis=0).tobytes()],
                                        pa.large_binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None) \
        .repartition(8) \
        .map_batches(summerge, batch_format="pyarrow",
                     batch_size=None).to_pandas()
    if not len(rows):
        return np.zeros((d, w), dtype=np.int64)
    sks = np.stack([np.frombuffer(s, dtype=np.int64) for s in rows["sk"]])
    return sks.sum(axis=0).reshape(d, w)


def cms_inner_product(a: np.ndarray, b: np.ndarray) -> int:
    """JOIN-SIZE estimate from two count-min sketches built with the SAME
    (w, d, seeds): min over the d rows of the row-wise dot product — the
    CMS inner-product estimator for F_ab = sum_k cnt_a(k)*cnt_b(k), i.e.
    the row count of an equi-join BEFORE running it.  One-sided (always
    >= truth); additive error <= (e/w)*N_a*N_b per row w.h.p.  This is
    the cardinality probe a planner runs to pick broadcast vs exchange
    at 100 TB: two 64 KB folds instead of the join itself."""
    if a.shape != b.shape:
        raise ValueError(f"sketch shapes differ: {a.shape} vs {b.shape}")
    return int(np.min(np.einsum("ij,ij->i", a, b)))


def grouped_approx_quantiles(ds: rd.Dataset, keys: list[str], col: str,
                             qs: list[float],
                             k: int = QS_GRID) -> rd.Dataset:
    """PER-GROUP approximate quantiles — ``approx_quantiles`` with the fold
    keyed: each block emits one (keys, grid, n) summary row PER GROUP
    (~4 KB each), one hash exchange co-locates a group's summaries, and a
    per-partition merge interpolates the requested quantiles.  Nothing
    driver-side, exchange volume = groups x blocks x 4 KB regardless of row
    count — the per-group latency/size-distribution op a 100-TB pipeline
    wants where the exact per-group sort is an all-to-all of every row.
    The per-batch loop is over GROUPS (dashboard-sized), never rows; the
    in-group kernel is one vectorized ``np.quantile``.
    Output (keys..., q, value_approx); approximate -> rows-only oracle,
    rank error pytest-bounded against the exact per-group quantiles."""
    import pandas as pd

    from .dedup import _num_partitions, _use_hash_shuffle

    qs_arr = np.asarray(sorted(qs), dtype=np.float64)

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(keys + [col]).to_pandas()
        out = {kc: [] for kc in keys}
        grids, ns = [], []
        for kv, g in df.groupby(keys, dropna=False, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            vals = g[col].to_numpy(dtype=np.float64, copy=False)
            for kc, v in zip(keys, kv):
                out[kc].append(v)
            grids.append(quantile_partial(vals, k).tobytes())
            ns.append(int(np.sum(~np.isnan(vals))))
        return pa.table({**{kc: pa.array(out[kc]) for kc in keys},
                         "grid": pa.array(grids, pa.large_binary()),
                         "n": pa.array(ns, pa.int64())})

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    parts = _use_hash_shuffle(pre).repartition(
        num_blocks=max(_num_partitions(ds) // 4, 2), keys=keys)
    empty = pa.table(
        {**{kc: pa.array([], pa.string()) for kc in keys},
         "q": pa.array([], pa.float64()),
         "value_approx": pa.array([], pa.float64())})

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "grid" not in b.schema.names:
            return empty
        df = b.to_pandas()
        cols = {kc: [] for kc in keys}
        qcol, vcol = [], []
        for kv, g in df.groupby(keys, dropna=False, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            grids = np.stack([np.frombuffer(x, dtype=np.float64)
                              for x in g["grid"]])
            counts = g["n"].to_numpy(dtype=np.float64)
            est = quantile_merge(grids, counts, qs_arr)
            for kc, v in zip(keys, kv):
                cols[kc].extend([v] * len(qs_arr))
            qcol.extend(qs_arr.tolist())
            vcol.extend(est.tolist())
        return pa.table({**{kc: pa.array(cols[kc]) for kc in keys},
                         "q": pa.array(qcol, pa.float64()),
                         "value_approx": pa.array(vcol, pa.float64())})

    return parts.map_batches(final, batch_format="pyarrow", batch_size=None)


def _grouped_hll_partial(keys: list[str], col: str):
    """Per-batch keyed HLL partial: one 4 KB register row per group in the
    batch — the shared combiner under ``grouped_approx_distinct`` and
    ``grouped_distinct_registers``."""
    def partial(b: pa.Table) -> pa.Table:
        df = b.select(keys + [col]).to_pandas()
        out = {kc: [] for kc in keys}
        regs = []
        for kv, g in df.groupby(keys, dropna=False, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            c = pa.array(g[col].astype(str))
            for kc, v in zip(keys, kv):
                out[kc].append(v)
            regs.append(hll_partial(c).tobytes())
        return pa.table({**{kc: pa.array(out[kc]) for kc in keys},
                         "reg": pa.array(regs, pa.binary())})
    return partial


def grouped_distinct_registers(ds: rd.Dataset, keys: list[str],
                               col: str) -> pa.Table:
    """Per-group MERGED HLL registers, collected to ONE driver-side Arrow
    table (keys..., reg: binary) — for callers that need the mergeable
    STATE per group rather than point estimates (e.g. sliding-window
    unions: a trailing-k-day distinct is the register max of k daily
    sketches).  Caller contract: the group keyspace is SMALL (calendar
    days, services) — driver state is |groups| x 4 KB regardless of row
    count."""
    from .joins import _collect_table

    pre = ds.map_batches(_grouped_hll_partial(keys, col),
                         batch_format="pyarrow", batch_size=None)

    def merge_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "reg" not in b.schema.names:
            # derive key types from the block's own schema when present —
            # hardcoding pa.string() here would mismatch int keys (e.g.
            # an int64 'day') and break the final concat on empty blocks
            def _kt(kc: str) -> pa.DataType:
                idx = b.schema.get_field_index(kc)
                return b.schema.field(idx).type if idx >= 0 else pa.string()
            return pa.table({**{kc: pa.array([], _kt(kc))
                                for kc in keys},
                             "reg": pa.array([], pa.binary())})
        df = b.to_pandas()
        cols = {kc: [] for kc in keys}
        regs = []
        for kv, g in df.groupby(keys, dropna=False, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            merged = np.maximum.reduce(
                np.stack([np.frombuffer(r, dtype=np.uint8)
                          for r in g["reg"]]))
            for kc, v in zip(keys, kv):
                cols[kc].append(v)
            regs.append(merged.tobytes())
        return pa.table({**{kc: pa.array(cols[kc]) for kc in keys},
                         "reg": pa.array(regs, pa.binary())})

    # two-level merge: per-block partials already collapsed each block's
    # groups; one small repartition bounds the final driver fold
    merged = pre.repartition(4).map_batches(
        merge_block, batch_format="pyarrow", batch_size=None)
    t = _collect_table(merged)
    if t.num_rows == 0:
        return t
    # the 4-way repartition can still split a group across blocks; one
    # last driver-side fold over the |groups|-sized table finishes it
    df = t.to_pandas()
    cols = {kc: [] for kc in keys}
    regs = []
    for kv, g in df.groupby(keys, dropna=False, sort=False):
        kv = kv if isinstance(kv, tuple) else (kv,)
        merged_r = np.maximum.reduce(
            np.stack([np.frombuffer(r, dtype=np.uint8) for r in g["reg"]]))
        for kc, v in zip(keys, kv):
            cols[kc].append(v)
        regs.append(merged_r.tobytes())
    return pa.table({**{kc: pa.array(cols[kc]) for kc in keys},
                     "reg": pa.array(regs, pa.binary())})


def grouped_approx_distinct(ds: rd.Dataset, keys: list[str], col: str,
                            alias: str = "approx_distinct") -> rd.Dataset:
    """PER-GROUP approximate COUNT(DISTINCT col) — the keyed HLL fold (the
    daily-active-users shape): one 4 KB register row per (group, block),
    one hash exchange, per-partition register max-merge + estimate.
    Exchange volume = groups x blocks x 4 KB, independent of row count —
    exact per-group distinct is an all-to-all of every (group, value)
    pair.  Per-batch loop is over GROUPS; the register build per group is
    the vectorized ``hll_partial``.  Approximate -> rows-only oracle with
    the ±1.6%-typical error pytest-bounded against exact."""
    from .dedup import _num_partitions, _use_hash_shuffle

    pre = ds.map_batches(_grouped_hll_partial(keys, col),
                         batch_format="pyarrow", batch_size=None)
    parts = _use_hash_shuffle(pre).repartition(
        num_blocks=max(_num_partitions(ds) // 4, 2), keys=keys)
    empty_fields = {kc: pa.array([], pa.string()) for kc in keys}
    empty = pa.table({**empty_fields, alias: pa.array([], pa.int64())})

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "reg" not in b.schema.names:
            return empty
        df = b.to_pandas()
        cols = {kc: [] for kc in keys}
        ests = []
        for kv, g in df.groupby(keys, dropna=False, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            regs = np.stack([np.frombuffer(r, dtype=np.uint8)
                             for r in g["reg"]])
            for kc, v in zip(keys, kv):
                cols[kc].append(v)
            ests.append(int(round(hll_estimate(np.maximum.reduce(regs)))))
        return pa.table({**{kc: pa.array(cols[kc]) for kc in keys},
                         alias: pa.array(ests, pa.int64())})

    return parts.map_batches(final, batch_format="pyarrow", batch_size=None)


def approx_distinct_registers(ds: rd.Dataset, col: str) -> np.ndarray:
    """Merged HLL register array for one column (the distributed state
    behind ``approx_distinct``, exposed so callers can COMBINE sketches:
    union = elementwise max, intersection = inclusion-exclusion)."""
    def partial(b: pa.Table) -> pa.Table:
        c = b[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if not pa.types.is_string(c.type):
            c = c.cast(pa.string())
        reg = hll_partial(c)
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None) \
        .repartition(8) \
        .map_batches(_merge_rows, batch_format="pyarrow",
                     batch_size=None).to_pandas()
    if not len(rows):
        return np.zeros(HLL_M, dtype=np.uint8)
    regs = np.stack([np.frombuffer(r, dtype=np.uint8)
                     for r in rows["reg"]])
    return np.maximum.reduce(regs)


def hll_intersection_estimate(reg_a: np.ndarray,
                              reg_b: np.ndarray) -> float:
    """|A ∩ B| by inclusion-exclusion over mergeable HLL states:
    est(A) + est(B) - est(A ∪ B), where the union sketch is the
    elementwise register max — the one set operation HLL supports
    exactly.  Error grows with |A ∪ B| / |A ∩ B| (difference of two
    noisy numbers), which is why the pytest bound is looser than the
    union bound."""
    return hll_estimate(reg_a) + hll_estimate(reg_b) \
        - hll_estimate(np.maximum(reg_a, reg_b))


def grouped_heavy_hitters(ds: rd.Dataset, keys: list[str], col: str,
                          k: int = 32) -> rd.Dataset:
    """PER-GROUP Misra-Gries heavy hitters — the keyed form of
    ``heavy_hitters`` (per-tenant hot keys, per-source hot terms).  One MG
    summary row per (group, block) — two list columns, at most k counters
    each — then ONE hash exchange on the group keys and a per-partition
    ``mg_merge`` fold per group.  The MG guarantee holds per group: any
    item with in-group frequency > n_g/(k+1) survives, counts are lower
    bounds undercounting by at most n_g/(k+1).  Exchange volume = groups x
    blocks x O(k), independent of row count.  Output (keys..., item,
    lb_count) rows."""
    from .dedup import _num_partitions, _use_hash_shuffle

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(keys + [col]).to_pandas()
        out = {kc: [] for kc in keys}
        items, cnts = [], []
        for kv, g in df.groupby(keys, dropna=False, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            mg = mg_partial(pa.array(g[col].astype(str)), k)
            for kc, v in zip(keys, kv):
                out[kc].append(v)
            items.append(list(mg.keys()))
            cnts.append([int(c) for c in mg.values()])
        return pa.table({**{kc: pa.array(out[kc]) for kc in keys},
                         "items": pa.array(items,
                                           pa.list_(pa.string())),
                         "cnts": pa.array(cnts, pa.list_(pa.int64()))})

    pre = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    parts = _use_hash_shuffle(pre).repartition(
        num_blocks=max(_num_partitions(ds) // 4, 2), keys=keys)
    empty = pa.table({**{kc: pa.array([], pa.string()) for kc in keys},
                      "item": pa.array([], pa.string()),
                      "lb_count": pa.array([], pa.int64())})

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "items" not in b.schema.names:
            return empty
        df = b.to_pandas()
        cols = {kc: [] for kc in keys}
        items, cnts = [], []
        for kv, g in df.groupby(keys, dropna=False, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            m: dict[str, int] = {}
            for it, ct in zip(g["items"], g["cnts"]):
                m = mg_merge(m, dict(zip(it, (int(x) for x in ct))), k)
            for item, c in sorted(m.items(), key=lambda x: (-x[1], x[0])):
                for kc, v in zip(keys, kv):
                    cols[kc].append(v)
                items.append(item)
                cnts.append(int(c))
        return pa.table({**{kc: pa.array(cols[kc]) for kc in keys},
                         "item": pa.array(items, pa.string()),
                         "lb_count": pa.array(cnts, pa.int64())})

    return parts.map_batches(final, batch_format="pyarrow", batch_size=None)
