"""Distributed Bloom filter: pre-exchange pruning for large-key-set
semi/anti joins.

Why: past the broadcast byte budget, ``semi_join``/``anti_join`` fall back
to ``_shuffled_membership`` — an all-to-all exchange of the ENTIRE fact
stream.  At the 100-TB design point that exchange dominates the join even
when only a sliver of fact rows actually match (semi) or miss (anti).  A
Bloom filter over the key set costs ~1-2 bytes/key to broadcast (vs tens
of bytes for the exact keys) and has NO false negatives, so:

- ``semi_join``: rows whose key misses the filter are DEFINITELY
  non-members — drop them before the exchange; only members + false
  positives shuffle.  The exact probe after the exchange removes the FPs,
  so results are bit-identical to the unfiltered plan.
- ``anti_join``: rows whose key misses the filter are DEFINITELY kept —
  emit them with no exchange at all; only the Bloom-positive residue goes
  through the exact shuffled probe.

Mechanics mirror the HLL fold in ``stages/sketch.py``: one fixed-size
partial per block (here an m-bit bitmap of uint64 words), a distributed
second-level OR-merge (repartition to a handful of blocks), and a tiny
driver-side final fold — the driver never holds more than a few bitmaps.
Double hashing (Kirsch–Mitzenmacher) gives the k probe positions from two
vectorized ``hash64`` passes; both build and probe are pure numpy over
whole Arrow columns (no per-row Python).

Sizing: ``Config.bloom_bits`` (default 2^27 = 16 MB bitmap) holds ~13
bits/key at 10M distinct keys (FPR ~0.2% with k=6) and stays useful to
~50M keys (FPR ~5%); beyond that the filter degrades gracefully — FPR
rises toward 1 and the plan converges to the unfiltered exchange, never
to a wrong answer.  Callers with a key-count estimate can size m
explicitly.  The filter is intra-run only (``hash64``'s polars fast path
is process-stable, not persistence-stable), which is all a join needs.

Reference anchor: the reference's only membership probes are driver-local
HashMaps (src/parse_logs.rs:333-358); this is the scale-path analog.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import hash64

_SEED1 = 0x51ED270B
_SEED2 = 0xD24F7F2E


def _as_hash_input(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
            or pa.types.is_binary(col.type)
            or pa.types.is_large_binary(col.type)):
        col = col.cast(pa.string())
    return col


def _positions(col: pa.Array, m_bits: int, k: int) -> np.ndarray:
    """(k, n) uint64 probe positions via double hashing; null rows get
    position 0 in every probe — callers mask nulls out separately."""
    col = _as_hash_input(col)
    h1 = hash64(col, seed=_SEED1)
    h2 = hash64(col, seed=_SEED2) | np.uint64(1)   # odd -> full-period step
    i = np.arange(k, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


def bloom_partial(col: pa.Array, m_bits: int, k: int) -> np.ndarray:
    """One block's bitmap (uint64 words, length m_bits/64).  Null keys are
    skipped (a null never matches a semi/anti probe)."""
    words = np.zeros(m_bits >> 6, dtype=np.uint64)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = col.drop_null()
    if len(col) == 0:
        return words
    pos = _positions(col, m_bits, k)
    np.bitwise_or.at(words, (pos >> np.uint64(6)).ravel(),
                     np.uint64(1) << (pos & np.uint64(63)).ravel())
    return words


def bloom_contains(words: np.ndarray, col, m_bits: int,
                   k: int) -> np.ndarray:
    """Vectorized membership probe: bool ndarray, False for null keys."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(col, m_bits, k)
    hits = (words[(pos >> np.uint64(6))] >> (pos & np.uint64(63))) \
        & np.uint64(1)
    out = hits.all(axis=0)
    if col.null_count:
        out &= np.asarray(pa.compute.is_valid(col))
    return out


def build_bloom(keys: rd.Dataset, col: str, m_bits: int,
                k: int) -> np.ndarray:
    """Distributed build: per-block bitmap partials -> second-level OR
    merge across a handful of partitions -> driver ORs the survivors.
    Returns the uint64 word array (broadcast it with ``ray.put``)."""
    def partial(b: pa.Table) -> pa.Table:
        if col not in b.schema.names or b.num_rows == 0:
            w = np.zeros(m_bits >> 6, dtype=np.uint64)
        else:
            w = bloom_partial(b[col], m_bits, k)
        return pa.table({"bits": pa.array([w.tobytes()], pa.large_binary())})

    def or_merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "bits" not in b.schema.names:
            return pa.table({"bits": pa.array([], pa.large_binary())})
        acc = np.zeros(m_bits >> 6, dtype=np.uint64)
        for buf in b["bits"]:
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
        return pa.table(
            {"bits": pa.array([acc.tobytes()], pa.large_binary())})

    rows = keys.map_batches(partial, batch_format="pyarrow",
                            batch_size=None) \
        .repartition(8) \
        .map_batches(or_merge, batch_format="pyarrow",
                     batch_size=None).take_all()
    acc = np.zeros(m_bits >> 6, dtype=np.uint64)
    for r in rows:
        acc |= np.frombuffer(r["bits"], dtype=np.uint64)
    return acc
