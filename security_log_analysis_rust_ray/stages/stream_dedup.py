"""Streaming first-seen dedup via a SHARED MUTABLE INDEX — the one op in
this engine that drops to raw Ray actors.

The Dataset API can express batch dedup (hash-partition + per-block
keep-first, see stages/dedup.py).  What it cannot express is *online*
at-most-once emission over an unordered stream: "emit a key the first time
any batch anywhere sees it" requires state shared ACROSS concurrently
executing tasks — a shared mutable index.  This mirrors the reference's
daemon path, where the Postgres unique constraint is exactly that shared
index (`ON CONFLICT DO NOTHING` per row, /root/reference/src/models.rs:429-448).

Design: ``n_shards`` index actors, each owning the key-hash range
``hash(key) % n_shards == shard_id``; a map_batches stage splits each batch
by shard and asks each owning actor atomically "which of these are new?".
Per-key ordering is total within a shard (actor = serialized executor), so
emission is exactly-once per key regardless of task interleaving.  The
emitted KEY SET is deterministic (= DISTINCT keys); which physical row
arrives first is not, so the op emits keys, not rows.

Scale notes: actors shard horizontally (key-hash), memory = O(distinct keys)
spread over shards; at 10^12-turn scale the in-RAM set becomes a per-shard
RocksDB/Bloom hybrid behind the same actor interface.  Throughput is bounded
by one round-trip per (batch, shard) — batches of tens of thousands of keys
amortize it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

_SEP = "\x01"
_NULL = "\x00"


@ray.remote
class KeyIndexShard:
    """One shard of the shared index.  Method execution is serialized by the
    actor model — `first_seen` is atomic check-and-insert."""

    def __init__(self):
        self.seen: set[bytes] = set()

    def first_seen(self, keys: list[bytes]) -> list[bool]:
        out = []
        seen = self.seen
        for k in keys:
            if k in seen:
                out.append(False)
            else:
                seen.add(k)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self.seen)


def _key_bytes(batch: pa.Table, cols: list[str]) -> list[bytes]:
    parts = []
    for c in cols:
        col = batch[c]
        arr = col.to_pylist()
        parts.append([_NULL if v is None else str(v) for v in arr])
    return [_SEP.join(vals).encode() for vals in zip(*parts)]


class StreamDedup:
    """map_batches callable: route each batch's keys to their owning index
    shards, keep only first-seen rows' keys."""

    def __init__(self, actors: list, cols: list[str]):
        self.actors = actors
        self.cols = cols
        self.n = len(actors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select(self.cols)
        keys = _key_bytes(batch, self.cols)
        shard_of = np.array(
            [int.from_bytes(hashlib.blake2b(k, digest_size=4).digest(),
                            "little") % self.n for k in keys])
        fresh = np.zeros(len(keys), dtype=bool)
        futures, idxs = [], []
        for s in range(self.n):
            idx = np.flatnonzero(shard_of == s)
            if len(idx):
                futures.append(
                    self.actors[s].first_seen.remote([keys[i] for i in idx]))
                idxs.append(idx)
        for fut, idx in zip(futures, idxs):
            fresh[idx] = ray.get(fut)
        return batch.select(self.cols).filter(pa.array(fresh))


def stream_dedup_keys(ds: rd.Dataset, cols: list[str],
                      n_shards: int = 4) -> rd.Dataset:
    """Online first-seen key emission over ``ds`` (see module docstring).
    Returns the deterministic distinct-key set of ``cols``."""
    actors = [KeyIndexShard.remote() for _ in range(n_shards)]

    def make_stage():
        stage = StreamDedup(actors, cols)
        return stage

    stage = make_stage()
    # tasks (not an actor pool) so many batches stream concurrently; the
    # shared state lives in the index actors, not the mapper
    return ds.map_batches(stage, batch_format="pyarrow", batch_size=None)
