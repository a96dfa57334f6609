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

from ..functions.hashing import hash64

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
    ones' lower bound)."""
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
