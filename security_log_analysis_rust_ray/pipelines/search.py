"""Persisted inverted text index: term -> posting lists, bucket-partitioned
Parquet, with bucket-pruned boolean-AND retrieval.

The reference exposes log search only as SQL LIKE filters pushed to
Postgres (src/security_log_http.rs query handlers); at 100-TB corpus scale
the equivalent primitive is an inverted index built ONCE as a dataset job
and queried by reading only the term's hash bucket — the same
build-once/prune-at-read discipline as the IVF (`ann.ann_build_index`) and
LSH (`docs.lsh_build_index`) indexes.  Buckets use the PINNED
``hash64_stable`` (never the polars fast path) so a persisted index stays
valid across library upgrades — the manifest records the tag and a
mismatched reader refuses rather than silently missing postings.

Scale notes: postings are (term, doc_id) distinct rows, hive-partitioned
by ``bucket = hash64_stable(term) % SEARCH_BUCKETS``; a query touches
len(terms) buckets ≈ 1/SEARCH_BUCKETS of the index each, regardless of
corpus size.  The AND is a grouped count over the pruned postings (all
postings distinct by construction, so count == n_terms ⇔ every term hit).
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import hash64_stable
from ..functions.util import round_half_up
from ..stages import aggregate as agg
from .docs import docs_aug_ds

SEARCH_BUCKETS = 64
SEARCH_TERMS = ["batch", "join"]   # default demo query (common corpus terms)
_HASH_IMPL = "fnv-fmix-pinned"     # hash64_stable is self-contained


def _posting_rows(b: pa.Table) -> pa.Table:
    """(term, doc_id, bucket) DISTINCT rows for one doc batch — one Arrow
    split + offsets-repeat explode; a doc lives entirely in one row, so the
    in-batch distinct is globally exact."""
    tk = pc.split_pattern(b["text"], " ")
    if isinstance(tk, pa.ChunkedArray):
        tk = tk.combine_chunks()
    flat = tk.values
    offs = np.asarray(tk.offsets, dtype=np.int64)
    doc = np.repeat(b["doc_id"].to_numpy(zero_copy_only=False),
                    np.diff(offs))
    t = pa.table({"term": flat, "doc_id": pa.array(doc, pa.int64())})
    t = t.group_by(["term", "doc_id"]).aggregate([]).combine_chunks()
    bucket = hash64_stable(t["term"].combine_chunks()) % SEARCH_BUCKETS
    return t.append_column("bucket", pa.array(bucket.astype(np.int64)))


def search_build_index(sf_dir: str, index_dir: str) -> dict:
    """Build the inverted index once (atomic tmp+rename; a present manifest
    makes the rebuild a no-op, so nightly jobs are idempotent)."""
    man_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as fh:
            return json.load(fh)
    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    docs = docs_aug_ds(sf_dir)
    n = docs.count()
    docs.map_batches(_posting_rows, batch_format="pyarrow",
                     batch_size=None) \
        .write_parquet(os.path.join(tmp, "postings"),
                       partition_cols=["bucket"])
    man = {"n_docs": int(n), "buckets": SEARCH_BUCKETS,
           "hash_impl": _HASH_IMPL}
    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump(man, fh)
    os.rename(tmp, index_dir)
    return man


def _probed_postings(index_dir: str, terms: list[str],
                     columns: list[str] | None = None
                     ) -> rd.Dataset | None:
    """Read ONLY the buckets the query terms hash to (path-pruned; at 64
    buckets a 2-term query scans ~3% of the index).  ``read_parquet``
    rejects a list of directories, so expand to file globs."""
    with open(os.path.join(index_dir, "manifest.json")) as fh:
        man = json.load(fh)
    if man["hash_impl"] != _HASH_IMPL:
        raise ValueError(
            f"index built under hash_impl={man['hash_impl']!r}, reader is "
            f"{_HASH_IMPL!r}; rebuild the index")
    tarr = pa.array(terms, pa.string())
    buckets = sorted(set(
        (hash64_stable(tarr) % man["buckets"]).astype(int).tolist()))
    files: list[str] = []
    for k in buckets:
        files.extend(sorted(_glob.glob(
            os.path.join(index_dir, "postings", f"bucket={k}", "*.parquet"))))
    if not files:
        return None
    return rd.read_parquet(files,
                           columns=columns or ["term", "doc_id"])


def _pos_posting_rows(b: pa.Table) -> pa.Table:
    """(term, doc_id, pos, bucket) rows — the POSITIONAL posting variant
    (not distinct: every occurrence matters for phrase adjacency).  Same
    one-explode shape as ``_posting_rows`` plus a per-doc position counter
    derived from the split offsets (arange minus each doc's start)."""
    tk = pc.split_pattern(b["text"], " ")
    if isinstance(tk, pa.ChunkedArray):
        tk = tk.combine_chunks()
    flat = tk.values
    offs = np.asarray(tk.offsets, dtype=np.int64)
    lens = np.diff(offs)
    doc = np.repeat(b["doc_id"].to_numpy(zero_copy_only=False), lens)
    pos = np.arange(offs[-1] - offs[0], dtype=np.int64) \
        - np.repeat(offs[:-1] - offs[0], lens)
    t = pa.table({"term": flat, "doc_id": pa.array(doc, pa.int64()),
                  "pos": pa.array(pos)})
    bucket = hash64_stable(t["term"].combine_chunks()) % SEARCH_BUCKETS
    return t.append_column("bucket", pa.array(bucket.astype(np.int64)))


def search_build_pos_index(sf_dir: str, index_dir: str) -> dict:
    """Positional sibling of ``search_build_index`` (same atomic
    tmp+rename, same bucket partitioning, ~positions× larger postings —
    the classic index-size/phrase-capability trade)."""
    man_path = os.path.join(index_dir, "manifest.json")
    if os.path.exists(man_path):
        with open(man_path) as fh:
            return json.load(fh)
    tmp = index_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    docs = docs_aug_ds(sf_dir)
    n = docs.count()
    docs.map_batches(_pos_posting_rows, batch_format="pyarrow",
                     batch_size=None) \
        .write_parquet(os.path.join(tmp, "postings"),
                       partition_cols=["bucket"])
    man = {"n_docs": int(n), "buckets": SEARCH_BUCKETS,
           "hash_impl": _HASH_IMPL, "positional": True}
    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump(man, fh)
    os.rename(tmp, index_dir)
    return man


def search_docs_phrase(sf_dir: str, terms: list[str] | None = None,
                       index_dir: str | None = None) -> rd.Dataset:
    """doc_ids containing the terms as an ADJACENT IN-ORDER phrase —
    Lucene-style positional-index phrase match.  Each posting (t, d, p)
    with t == terms[i] votes for a phrase START at base = p - i; a base
    wins when all len(terms) slots voted: dedup (d, base, slot) ->
    grouped count == n -> distinct doc_id.  Only the phrase terms'
    buckets are read; no corpus rescan.  Returns (doc_id) sorted.

    Tokenizer contract (single-space split, same as the AND/OR index)
    makes this bit-equivalent to the oracle's
    ``' ' || text || ' ' LIKE '% t0 t1 %'`` containment rule."""
    from ..stages.dedup import distinct_rows
    terms = list(terms if terms is not None else SEARCH_TERMS)
    if index_dir is None:
        from ..synth import CACHE_ROOT
        tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
        index_dir = os.path.join(CACHE_ROOT, tag, "search_pos_index")
    search_build_pos_index(sf_dir, index_dir)
    empty = pa.schema([pa.field("doc_id", pa.int64())]).empty_table()
    if not terms:
        return rd.from_arrow(empty)
    post = _probed_postings(index_dir, sorted(set(terms)),
                            columns=["term", "doc_id", "pos"])
    if post is None:
        return rd.from_arrow(empty)
    n = len(terms)
    slots: dict[str, list[int]] = {}
    for i, t in enumerate(terms):
        slots.setdefault(t, []).append(i)

    def vote(b: pa.Table) -> pa.Table:
        outs = []
        for t, idxs in slots.items():
            m = b.filter(pc.equal(b["term"], t))
            if m.num_rows == 0:
                continue
            for i in idxs:
                outs.append(pa.table({
                    "doc_id": m["doc_id"],
                    "base": pc.subtract(m["pos"], pa.scalar(i)),
                    "slot": pa.array(
                        np.full(m.num_rows, i, dtype=np.int64))}))
        if not outs:
            return pa.schema([
                pa.field("doc_id", pa.int64()), pa.field("base", pa.int64()),
                pa.field("slot", pa.int64())]).empty_table()
        return pa.concat_tables(outs)

    votes = post.map_batches(vote, batch_format="pyarrow", batch_size=None)
    votes = distinct_rows(votes, ["doc_id", "base", "slot"])
    counts = agg.grouped_count(votes, ["doc_id", "base"])

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_id" not in b.schema.names:
            return empty
        return b.filter(pc.equal(b["cnt"], n)).select(["doc_id"])

    hits = counts.map_batches(final, batch_format="pyarrow",
                              batch_size=None)
    return distinct_rows(hits, ["doc_id"]).map_batches(
        lambda t: t if t.num_columns else empty,
        batch_format="pyarrow", batch_size=None).sort("doc_id")


def search_docs_and(sf_dir: str, terms: list[str] | None = None,
                    index_dir: str | None = None) -> rd.Dataset:
    """doc_ids containing EVERY query term (boolean AND), via the persisted
    index: prune to the terms' buckets, keep probe-term rows, grouped count
    per doc — count == n_terms ⇔ all terms present (postings are distinct).
    Returns (doc_id) sorted ascending."""
    terms = sorted(set(terms if terms is not None else SEARCH_TERMS))
    if index_dir is None:
        from ..synth import CACHE_ROOT
        tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
        index_dir = os.path.join(CACHE_ROOT, tag, "search_index")
    search_build_index(sf_dir, index_dir)
    post = _probed_postings(index_dir, terms)
    empty = pa.schema([pa.field("doc_id", pa.int64())]).empty_table()
    if post is None or not terms:
        return rd.from_arrow(empty)
    tset = pa.array(terms, pa.string())

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["term"], value_set=tset))

    hits = post.map_batches(keep, batch_format="pyarrow", batch_size=None)
    counts = agg.grouped_count(hits, ["doc_id"])
    n = len(terms)

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "doc_id" not in b.schema.names:
            return empty
        return b.filter(pc.equal(b["cnt"], n)).select(["doc_id"])

    return counts.map_batches(final, batch_format="pyarrow",
                              batch_size=None).sort("doc_id")


def search_docs_or(sf_dir: str, terms: list[str] | None = None,
                   index_dir: str | None = None) -> rd.Dataset:
    """doc_ids containing ANY query term (boolean OR): pruned postings,
    keep probe terms, distinct doc_id.  Returns (doc_id) sorted."""
    from ..stages.dedup import distinct_rows
    terms = sorted(set(terms if terms is not None else SEARCH_TERMS))
    if index_dir is None:
        from ..synth import CACHE_ROOT
        tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
        index_dir = os.path.join(CACHE_ROOT, tag, "search_index")
    search_build_index(sf_dir, index_dir)
    post = _probed_postings(index_dir, terms)
    empty = pa.schema([pa.field("doc_id", pa.int64())]).empty_table()
    if post is None or not terms:
        return rd.from_arrow(empty)
    tset = pa.array(terms, pa.string())

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["term"], value_set=tset)) \
            .select(["doc_id"])

    hits = post.map_batches(keep, batch_format="pyarrow", batch_size=None)
    out = distinct_rows(hits, ["doc_id"])
    return out.map_batches(
        lambda t: t if t.num_columns else empty,
        batch_format="pyarrow", batch_size=None).sort("doc_id")


def search_docs_and_not(sf_dir: str, terms: list[str] | None = None,
                        exclude: list[str] | None = None,
                        index_dir: str | None = None) -> rd.Dataset:
    """AND retrieval minus any doc containing an excluded term — the AND
    result anti-joined against the excluded terms' OR postings (both sides
    bucket-pruned; the blocklist filter shape, at index speed)."""
    from ..stages.joins import anti_join
    exclude = sorted(set(exclude if exclude is not None else ["slow"]))
    keep = search_docs_and(sf_dir, terms, index_dir=index_dir)
    if not exclude:
        return keep
    drop = search_docs_or(sf_dir, exclude, index_dir=index_dir)
    return anti_join(keep, drop, "doc_id", "doc_id").sort("doc_id")


# ---------------------------------------------------------------------------
# BM25 ranked retrieval + reciprocal-rank fusion (RAG retrieval tier).
# The reference's only ranking is Postgres ORDER BY over LIKE hits
# (src/security_log_http.rs query handlers); a training-data/RAG pipeline
# needs scored retrieval.  Okapi BM25 (Robertson et al.) with the Lucene
# idf = ln(1 + (N - df + 0.5)/(df + 0.5)).

BM25_K1 = 1.2
BM25_B = 0.75
BM25_K = 10
RRF_C = 60      # Cormack et al. reciprocal-rank-fusion constant
RRF_N = 50      # depth of each fused ranked list


def _term_tf_batch(b: pa.Table, terms: list[str]) -> pa.Table:
    """(doc_id, dl, tf_0..tf_{T-1}) for docs in this batch that contain at
    least one query term.  One Arrow split; per-term tf by a cumsum-gather
    segment sum (T is the QUERY length — a handful — so the per-term loop
    is over terms, never rows)."""
    tk = pc.split_pattern(b["text"], " ")
    if isinstance(tk, pa.ChunkedArray):
        tk = tk.combine_chunks()
    flat = tk.values
    offs = np.asarray(tk.offsets, dtype=np.int64)
    dl = np.diff(offs)
    tf = np.zeros((len(dl), len(terms)), dtype=np.int64)
    for i, t in enumerate(terms):
        eq = pc.equal(flat, t).to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(eq)])
        tf[:, i] = cum[offs[1:]] - cum[offs[:-1]]
    keep = tf.sum(axis=1) > 0
    cols = {"doc_id": pa.array(b["doc_id"].to_numpy()[keep], pa.int64()),
            "dl": pa.array(dl[keep], pa.int64())}
    for i in range(len(terms)):
        cols[f"tf_{i}"] = pa.array(tf[keep, i], pa.int64())
    return pa.table(cols)


def _bm25_scored(sf_dir: str, terms: list[str]):
    """Shared BM25 scoring plan: returns a MATERIALIZED matched-docs
    dataset with (doc_id, dl, score_raw).  Corpus stats (N, avgdl) and the
    per-term df vector are tiny per-block folds summed driver-side — the
    corpus itself streams and never co-locates; only docs containing a
    query term survive into the scored stream (worst case the corpus, in
    practice a small fraction)."""
    from ..pipelines.docs import docs_aug_ds
    from ..stages.joins import _collect_table
    docs = docs_aug_ds(sf_dir)

    def stats_row(b: pa.Table) -> pa.Table:
        tk = pc.split_pattern(b["text"], " ")
        if isinstance(tk, pa.ChunkedArray):
            tk = tk.combine_chunks()
        return pa.table({"n": pa.array([b.num_rows], pa.int64()),
                         "sdl": pa.array([len(tk.values)], pa.int64())})

    st = _collect_table(docs.map_batches(stats_row, batch_format="pyarrow",
                                         batch_size=None))
    n_docs = int(pc.sum(st["n"]).as_py())
    avgdl = float(pc.sum(st["sdl"]).as_py()) / max(n_docs, 1)

    tf_ds = docs.map_batches(lambda b: _term_tf_batch(b, terms),
                             batch_format="pyarrow",
                             batch_size=None).materialize()

    def df_row(b: pa.Table) -> pa.Table:
        return pa.table({f"df_{i}": pa.array(
            [int(np.count_nonzero(b[f"tf_{i}"].to_numpy()))], pa.int64())
            for i in range(len(terms))})

    dft = _collect_table(tf_ds.map_batches(df_row, batch_format="pyarrow",
                                           batch_size=None))
    df = np.array([int(pc.sum(dft[f"df_{i}"]).as_py())
                   for i in range(len(terms))], dtype=np.float64)
    idf = np.log1p((n_docs - df + 0.5) / (df + 0.5))

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64()),
                             "score_raw": pa.array([], pa.float64())})
        dl = b["dl"].to_numpy().astype(np.float64)
        denom = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        s = np.zeros(len(dl), dtype=np.float64)
        # summed in term order; the default query is 2 terms, where the
        # two-addend float sum is order-exact vs the oracle's SQL SUM
        for i in range(len(terms)):
            tf = b[f"tf_{i}"].to_numpy().astype(np.float64)
            s += idf[i] * tf * (BM25_K1 + 1.0) / (tf + denom)
        return pa.table({"doc_id": b["doc_id"], "dl": b["dl"],
                         "score_raw": pa.array(s)})

    return tf_ds.map_batches(score, batch_format="pyarrow",
                             batch_size=None).materialize()


def doc_bm25_topk(sf_dir: str, terms: list[str] | None = None,
                  k: int = BM25_K) -> rd.Dataset:
    """Okapi-BM25 top-k retrieval for the demo query: per-block top-k
    combiner (each block keeps its k best) then ONE tiny exchange for the
    final order — the corpus never shuffles.  Output (doc_id, score
    rounded 6), score descending, doc_id tie-break."""
    terms = list(SEARCH_TERMS if terms is None else terms)
    scored = _bm25_scored(sf_dir, terms)

    def block_topk(b: pa.Table) -> pa.Table:
        b = b.select(["doc_id", "score_raw"])
        if b.num_rows <= k:
            return b
        b = b.sort_by([("score_raw", "descending"),
                       ("doc_id", "ascending")])
        return b.slice(0, k)

    top = scored.map_batches(block_topk, batch_format="pyarrow",
                             batch_size=None) \
        .sort(["score_raw", "doc_id"], descending=[True, False]).limit(k)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b["doc_id"],
            "score": pa.array(round_half_up(
                b["score_raw"].to_numpy(zero_copy_only=False), 6))})

    return top.map_batches(finish, batch_format="pyarrow", batch_size=None)


def doc_search_rrf(sf_dir: str, terms: list[str] | None = None,
                   n: int = RRF_N, k: int = BM25_K) -> rd.Dataset:
    """Reciprocal-rank fusion of two ranked retrieval lists over the
    matched set: (A) BM25 top-n, (B) concise-doc top-n (shortest dl — the
    "prefer short passages" retrieval heuristic).  rrf = sum over lists
    containing the doc of 1/(RRF_C + rank).

    Scale shape: each ranked list is the ``doc_bm25_topk`` two-level
    reduce — a per-block top-n combiner then ONE distributed
    ``sort().limit(n)`` — so only the <= n-row FINAL list of each
    criterion ever reaches the driver (not <= 2n rows per block, which
    is linear in block count and multi-GB at 10^5-10^6 blocks).  Rank
    assignment and fusion happen on the two <= n-row lists, the standard
    RRF regime (fuse RETRIEVED lists, not corpora)."""
    terms = list(SEARCH_TERMS if terms is None else terms)
    scored = _bm25_scored(sf_dir, terms)

    def _ranked_list(sort_keys, desc) -> "pd.DataFrame":
        def block_top(b: pa.Table) -> pa.Table:
            b = b.select(["doc_id", "score_raw", "dl"])
            if b.num_rows <= n:
                return b
            return b.sort_by([(c, "descending" if d else "ascending")
                              for c, d in zip(sort_keys, desc)]).slice(0, n)
        return scored.map_batches(block_top, batch_format="pyarrow",
                                  batch_size=None) \
            .sort(list(sort_keys), descending=list(desc)) \
            .limit(n).to_pandas()

    list_a = _ranked_list(("score_raw", "doc_id"), (True, False))
    list_b = _ranked_list(("dl", "doc_id"), (False, False))
    rrf = {}
    for r, d in enumerate(list_a["doc_id"], start=1):
        rrf[d] = rrf.get(d, 0.0) + 1.0 / (RRF_C + r)
    for r, d in enumerate(list_b["doc_id"], start=1):
        rrf[d] = rrf.get(d, 0.0) + 1.0 / (RRF_C + r)
    items = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    out = pa.table({
        "doc_id": pa.array([d for d, _ in items], pa.int64()),
        "rrf": pa.array(round_half_up(
            np.array([v for _, v in items], dtype=np.float64), 6))})
    return rd.from_arrow(out)
