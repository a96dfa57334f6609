"""Embedding similarity search: brute-force cosine top-k (baseline),
IVF-bucketed ANN (scale path), and embedding-cosine near-dup pairs.

The small side (query matrix / centroids / full base matrix at test scale)
is broadcast once with ``ray.put`` and read in each task — never re-shipped
per batch.  All kernels are float64 numpy matmuls over batches.

Scale notes: brute-force is O(N*Q) per batch and exact; at 10^9+ vectors the
IVF variant bounds work to nprobe/nlist of the base, and near-dup all-pairs
becomes LSH-bucketed (bucket by coarse centroid, pairs within bucket) — the
IVF assignment stage here is exactly that bucketing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.util import round_half_up
from ..sources.readers import read_table

DIM = 64
NEAR_DUP_COS = 0.95
N_QUERIES = 5
TOP_K = 10
IVF_NLIST = 16
IVF_NPROBE = 4


def _mat(batch_col) -> np.ndarray:
    """list<float> column -> (n, DIM) float64 matrix, zero-copy flatten."""
    arr = batch_col.combine_chunks() if isinstance(batch_col, pa.ChunkedArray) \
        else batch_col
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(-1, DIM)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def embeddings_aug_ds(sf_dir: str) -> rd.Dataset:
    """embeddings + deterministic exact (vec_id+1e6, every 10th) and near
    (vec_id+2e6, every 7th, first element +0.25) duplicate vectors —
    mirrored in the oracle SQL."""
    base = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def exact(b: pa.Table) -> pa.Table:
        m = np.mod(b["vec_id"].to_numpy(), 10) == 0
        t = b.filter(pa.array(m))
        return pa.table({"vec_id": pc.add(t["vec_id"], 1_000_000),
                         "embedding": t["embedding"]})

    def near(b: pa.Table) -> pa.Table:
        m = np.mod(b["vec_id"].to_numpy(), 7) == 0
        t = b.filter(pa.array(m))
        v = _mat(t["embedding"])
        v = v.copy()
        v[:, 0] += 0.25
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(v.reshape(-1), pa.float64()), DIM).cast(
            pa.list_(pa.float64()))
        return pa.table({"vec_id": pc.add(t["vec_id"], 2_000_000),
                         "embedding": emb})

    def to_f64(b: pa.Table) -> pa.Table:
        v = _mat(b["embedding"])
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(v.reshape(-1), pa.float64()), DIM).cast(
            pa.list_(pa.float64()))
        return pa.table({"vec_id": b["vec_id"], "embedding": emb})

    b64 = base.map_batches(to_f64, batch_format="pyarrow")
    return b64.union(b64.map_batches(exact, batch_format="pyarrow"),
                     b64.map_batches(near, batch_format="pyarrow"))


EMB_AUG_SQL = """
emb_aug AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, list_transform(embedding, x -> CAST(x AS DOUBLE))
  FROM embeddings WHERE vec_id % 10 = 0
  UNION ALL
  SELECT vec_id + 2000000,
         list_prepend(CAST(embedding[1] AS DOUBLE) + 0.25,
                      list_transform(embedding[2:], x -> CAST(x AS DOUBLE)))
  FROM embeddings WHERE vec_id % 7 = 0
)"""


def _base_matrix(sf_dir: str, aug: bool) -> tuple[np.ndarray, np.ndarray]:
    """(ids, normalized matrix) for the broadcast side."""
    ds = embeddings_aug_ds(sf_dir) if aug \
        else read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    t = pa.concat_tables(
        ray.get(list(ds.to_arrow_refs()))
    ).combine_chunks()
    ids = t["vec_id"].to_numpy()
    return ids, _normalize(_mat(t["embedding"]))


def embedding_near_dup_pairs(sf_dir: str,
                             threshold: float = NEAR_DUP_COS) -> rd.Dataset:
    """All pairs (a < b) with cosine >= threshold: batches stream against a
    broadcast normalized base matrix (exact; LSH/IVF-bucketed at scale)."""
    ids, base = _base_matrix(sf_dir, aug=True)
    ref = ray.put((ids, base))

    class Pairs:
        def __init__(self):
            self.ids, self.base = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            q_ids = b["vec_id"].to_numpy()
            q = _normalize(_mat(b["embedding"]))
            sims = q @ self.base.T
            ii, jj = np.nonzero(sims >= threshold)
            a, bb, s = q_ids[ii], self.ids[jj], sims[ii, jj]
            keep = a < bb
            return pa.table({
                "a": pa.array(a[keep]), "b": pa.array(bb[keep]),
                "cos_sim": pa.array(round_half_up(s[keep])),
            })

    return embeddings_aug_ds(sf_dir).map_batches(
        Pairs, batch_format="pyarrow", concurrency=(1, 8), batch_size=4096)


def ann_topk(sf_dir: str, k: int = TOP_K) -> rd.Dataset:
    """Brute-force cosine top-k for query vectors (vec_id < N_QUERIES)
    against the base table: per-batch partial top-k, then a tiny final
    per-query reduction (the canonical partial/final ANN plan)."""
    qds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]) \
        .filter(lambda r: r["vec_id"] < N_QUERIES)
    qt = qds.to_pandas()
    q_ids = qt["vec_id"].to_numpy()
    qm = _normalize(np.stack(qt["embedding"].to_numpy()).astype(np.float64))
    ref = ray.put((q_ids, qm))

    class PartialTopK:
        def __init__(self):
            self.q_ids, self.qm = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b["vec_id"].to_numpy()
            m = _normalize(_mat(b["embedding"]))
            sims = self.qm @ m.T                      # (Q, B)
            out_q, out_n, out_s = [], [], []
            kk = min(k, sims.shape[1])
            for qi in range(sims.shape[0]):
                # partial top-k with deterministic (sim desc, id asc) order
                idx = np.argpartition(-sims[qi], kk - 1)[:kk]
                out_q.extend([self.q_ids[qi]] * len(idx))
                out_n.extend(ids[idx])
                out_s.extend(sims[qi, idx])
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos_sim": pa.array(np.asarray(out_s)),
            })

    partial = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]) \
        .map_batches(PartialTopK, batch_format="pyarrow",
                     concurrency=(1, 8), batch_size=8192)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_sim", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g["cos_sim"] = round_half_up(g["cos_sim"].to_numpy())
        return g

    return partial.groupby("query_id").map_groups(final, batch_format="pandas")


def ann_ivf_topk(sf_dir: str, k: int = TOP_K, nprobe: int = IVF_NPROBE) -> rd.Dataset:
    """IVF ANN: coarse-quantize the base into IVF_NLIST buckets (centroids =
    deterministic sample of base vectors), probe the nprobe nearest buckets
    per query. Approximate — recall vs brute force asserted in pytest."""
    ids, base = _base_matrix(sf_dir, aug=False)
    centroids = base[:: max(1, len(base) // IVF_NLIST)][:IVF_NLIST]
    assign = np.argmax(base @ centroids.T, axis=1)

    qmask = ids < N_QUERIES
    q_ids, qm = ids[qmask], base[qmask]
    probe = np.argsort(-(qm @ centroids.T), axis=1)[:, :nprobe]

    rows = {"query_id": [], "neighbor_id": [], "cos_sim": []}
    for qi in range(len(q_ids)):
        cand = np.isin(assign, probe[qi])
        sims = base[cand] @ qm[qi]
        cids = ids[cand]
        idx = np.argsort(-sims)[:k]
        rows["query_id"].extend([q_ids[qi]] * len(idx))
        rows["neighbor_id"].extend(cids[idx])
        rows["cos_sim"].extend(round_half_up(sims[idx]))
    return rd.from_pandas(pd.DataFrame(rows))
