"""Property-based tests for the round-2 kernels: each vectorized
implementation is compared against an independent brute-force reference on
randomized inputs (hypothesis), mirroring the golden-line strategy the
reference uses for its parsers (SURVEY §5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from security_log_analysis_rust_ray.functions.hashing import hash64

token = st.text(alphabet="abcdefg", min_size=1, max_size=4)
doc = st.lists(token, min_size=1, max_size=40).map(" ".join)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(st.lists(doc, min_size=1, max_size=8))
def test_shingles_match_bruteforce(texts):
    from security_log_analysis_rust_ray.pipelines.docs import (
        NGRAM, _distinct_shingles_batch)
    b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    got = _distinct_shingles_batch(b).to_pydict()
    got_set = set(zip(got["doc_id"], got["g"]))
    exp = set()
    for i, t in enumerate(texts):
        toks = t.split(" ")
        for j in range(max(0, len(toks) - NGRAM + 1)):
            exp.add((i, " ".join(toks[j:j + NGRAM])))
    assert got_set == exp


@settings(max_examples=20, deadline=None, derandomize=True)
@given(st.lists(doc, min_size=1, max_size=6))
def test_winnow_matches_bruteforce(texts):
    """Vectorized winnowing == per-doc brute force (sliding-window minima
    over shingle hashes, distinct)."""
    from security_log_analysis_rust_ray.pipelines import docs as D
    b = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    w = D.WINNOW_W

    # brute-force reference
    exp = set()
    for i, t in enumerate(texts):
        toks = t.split(" ")
        sh = [" ".join(toks[j:j + D.NGRAM])
              for j in range(max(0, len(toks) - D.NGRAM + 1))]
        if not sh:
            continue
        hs = hash64(np.array(sh, dtype=object))
        k = min(w, len(hs))
        for j in range(len(hs) - k + 1):
            exp.add((i, int(np.int64(hs[j:j + k].min().view(np.int64)))))
    # engine kernel on one in-memory batch (no Ray session needed)
    out = _run_winnow_batch(D, b, w)
    got = set(zip(out["doc_id"].to_pylist(), out["fp"].to_pylist()))
    assert got == exp


def _run_winnow_batch(D, b, w):
    """Invoke the winnow kernel on one in-memory batch (no Ray session)."""
    import pyarrow.compute as pc
    from numpy.lib.stride_tricks import sliding_window_view
    tk = pc.split_pattern(b["text"], " ")
    if isinstance(tk, pa.ChunkedArray):
        tk = tk.combine_chunks()
    flat = tk.values
    offs = np.asarray(tk.offsets)
    lens = np.diff(offs)
    wins = np.maximum(lens - (D.NGRAM - 1), 0)
    starts = np.repeat(offs[:-1], wins) + D._concat_aranges(wins)
    if len(starts) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "fp": pa.array([], pa.int64())})
    cols = [flat.take(pa.array(starts + s)) for s in range(D.NGRAM)]
    g = pc.binary_join_element_wise(*cols, " ")
    h = hash64(g)
    doc_ids = np.repeat(b["doc_id"].to_numpy(), wins)
    k = min(w, len(h))
    sw = sliding_window_view(h, k)
    mins = sw.min(axis=1)
    d_sw = sliding_window_view(doc_ids, k)
    same_doc = d_sw[:, 0] == d_sw[:, -1]
    out_doc = [doc_ids[: len(mins)][same_doc]]
    out_fp = [mins[same_doc]]
    sel = (wins > 0) & (wins < k)
    if sel.any():
        s_starts = np.concatenate([[0], np.cumsum(wins)])[:-1][sel]
        s_lens = wins[sel]
        ends = np.cumsum(s_lens)
        local = np.arange(int(s_lens.sum())) - np.repeat(ends - s_lens, s_lens)
        idx = np.repeat(s_starts, s_lens) + local
        seg = np.repeat(np.arange(len(s_lens)), s_lens)
        m = np.full(len(s_lens), np.iinfo(np.uint64).max, dtype=np.uint64)
        np.minimum.at(m, seg, h[idx])
        out_doc.append(b["doc_id"].to_numpy()[sel])
        out_fp.append(m)
    return pa.table({"doc_id": pa.array(np.concatenate(out_doc)),
                     "fp": pa.array(np.concatenate(out_fp).view(np.int64))})


@settings(max_examples=15, deadline=None, derandomize=True)
@given(st.integers(min_value=1, max_value=30_000), st.integers(0, 5))
def test_hll_rank_kernel_matches_bitlength(n, seed_shift):
    """The frexp-based leading-zero rank equals exact int.bit_length."""
    from security_log_analysis_rust_ray.stages.sketch import HLL_P, hll_partial
    keys = pa.array([f"s{seed_shift}_{i}" for i in range(min(n, 2000))])
    h = hash64(keys)
    w = h & np.uint64((1 << (64 - HLL_P)) - 1)
    _m, exp = np.frexp(w.astype(np.float64))
    rank = np.where(w == 0, 64 - HLL_P + 1, 64 - HLL_P - exp + 1)
    for wi, ri in zip(w[:200], rank[:200]):
        assert int(ri) == 64 - HLL_P - int(wi).bit_length() + 1


@settings(max_examples=25, deadline=None, derandomize=True)
@given(st.lists(doc, min_size=1, max_size=6))
def test_simhash_matches_bruteforce_reference(texts):
    """The 1-D bit-pass simhash (cumsum + boundary diff per bit) equals a
    naive per-doc popcount majority vote."""
    import pyarrow.compute as pc
    tk = pc.split_pattern(pa.array(texts), " ")
    if isinstance(tk, pa.ChunkedArray):
        tk = tk.combine_chunks()
    flat = hash64(tk.values)
    offs = np.asarray(tk.offsets, dtype=np.int64)

    # naive per-doc reference
    exp = []
    for i in range(len(texts)):
        hs = flat[offs[i]:offs[i + 1]]
        fp = np.uint64(0)
        for j in range(64):
            cnt = int(((hs >> np.uint64(j)) & np.uint64(1)).sum())
            if 2 * cnt > len(hs):
                fp |= np.uint64(1) << np.uint64(j)
        exp.append(int(fp.astype(np.uint64).view(np.int64)))

    # the engine's vectorized formulation (same code shape as simhash64)
    cum = np.empty(len(flat) + 1, dtype=np.int64)
    cum[0] = 0
    n_tok = np.diff(offs)
    fp_vec = np.zeros(len(n_tok), dtype=np.uint64)
    for j in range(64):
        bit_j = ((flat >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        np.cumsum(bit_j, out=cum[1:])
        cnt = cum[offs[1:]] - cum[offs[:-1]]
        fp_vec |= (2 * cnt > n_tok).astype(np.uint64) << np.uint64(j)
    assert [int(x) for x in fp_vec.view(np.int64)] == exp


def test_hash64_stable_pinned_goldens():
    """hash64_stable is the PERSISTED-fingerprint hash: its values are
    pinned forever (ADVICE r02: the polars-backed hash64 can change under
    a library upgrade; this one cannot — it is defined entirely in
    functions/hashing.py).  These goldens must NEVER change."""
    import pyarrow as pa
    from security_log_analysis_rust_ray.functions.hashing import hash64_stable
    got = [int(x) for x in hash64_stable(
        pa.array(["", "a", "security", "log analysis"]))]
    assert got == [16132506952055667079, 1000318964316841956,
                   7310207410189655051, 17580693851026809863]


def test_hash64_stable_properties():
    import numpy as np
    import pyarrow as pa
    from security_log_analysis_rust_ray.functions.hashing import hash64_stable
    strs = [f"token-{i}" for i in range(5000)] + \
        ["x" * n for n in range(1, 40)] + ["abc", "abc\x00", "abc\x00\x00"]
    h = hash64_stable(pa.array(strs))
    # injective on this corpus (incl. zero-padding distinctions)
    assert len(set(h.tolist())) == len(strs)
    # deterministic across calls and input container types
    h2 = hash64_stable(np.array(strs, dtype=object))
    assert (h == h2).all()
    # seed changes the values
    h3 = hash64_stable(pa.array(strs), seed=999)
    assert (h != h3).any()


# ---- segmented as-of core (relational._asof_match_idx) -------------------

@given(st.lists(st.tuples(st.integers(0, 3),      # segment id
                          st.integers(0, 6),      # t
                          st.booleans()),         # is_match
                min_size=0, max_size=60))
@settings(max_examples=300, deadline=None)
def test_asof_match_idx_matches_bruteforce(rows):
    """For each row i: the matched index must point at a match row in the
    same segment with t <= t_i, carrying the LARGEST such t (value
    semantics: same-t matches sorted after i still count) — checked
    against an O(n^2) reference on arbitrary segment/t/match layouts."""
    from security_log_analysis_rust_ray.pipelines.relational import \
        _asof_match_idx
    rows = sorted(rows)                      # (u, t) contiguous + ordered
    u = np.array([r[0] for r in rows], dtype=np.int64)
    t = np.array([r[1] for r in rows], dtype=np.int64)
    m = np.array([r[2] for r in rows], dtype=bool)
    idx, found = _asof_match_idx(u, t, m)
    for i in range(len(rows)):
        cands = [j for j in range(len(rows))
                 if u[j] == u[i] and m[j] and t[j] <= t[i]]
        if not cands:
            assert not found[i]
        else:
            assert found[i]
            j = idx[i]
            assert u[j] == u[i] and m[j]
            assert t[j] == max(t[c] for c in cands)


@given(st.lists(st.tuples(st.integers(0, 4),          # user
                          st.integers(0, 20),         # ts
                          st.sampled_from(["signup", "view", "click",
                                           "purchase"])),
                min_size=0, max_size=50))
@settings(max_examples=200, deadline=None)
def test_funnel_scatter_min_matches_sequential(rows):
    """The funnel kernel's scatter-min stage walk must equal the obvious
    per-user sequential definition: stage k completes at the first
    qualifying event strictly after stage k-1's completion time."""
    from security_log_analysis_rust_ray.pipelines.relational import \
        FUNNEL_STAGES

    # sequential reference
    per_user: dict[int, list[tuple[int, str]]] = {}
    for u_, t_, e_ in sorted(rows, key=lambda r: (r[0], r[1])):
        per_user.setdefault(u_, []).append((t_, e_))
    expected = []
    for k, ev in enumerate(FUNNEL_STAGES, start=1):
        n = 0
        # recompute cumulatively to stage k
        for u_, evs in per_user.items():
            prev = None
            ok = True
            for ev_k in FUNNEL_STAGES[:k]:
                t_hit = None
                for t_, e_ in evs:
                    if e_ == ev_k and (prev is None or t_ > prev):
                        t_hit = t_
                        break
                if t_hit is None:
                    ok = False
                    break
                prev = t_hit
            if ok:
                n += 1
        expected.append(n)
        if n == 0:
            break

    # kernel under test (the same numpy stage walk user_funnel_counts runs)
    u = np.array([r[0] for r in rows], dtype=np.int64)
    t = np.array([r[1] for r in rows], dtype=np.int64)
    e = np.array([r[2] for r in rows], dtype=object)
    got = []
    if len(rows):
        uid, inv = np.unique(u, return_inverse=True)
        none = np.iinfo(np.int64).max
        prev = None
        for k, ev in enumerate(FUNNEL_STAGES, start=1):
            m = e == ev
            if prev is not None:
                p = prev[inv]
                m = m & (p != none) & (t > p)
            cur = np.full(len(uid), none, dtype=np.int64)
            np.minimum.at(cur, inv[m], t[m])
            n = int((cur != none).sum())
            got.append(n)
            prev = cur
            if n == 0:
                break
    else:
        got = [0]
        expected = expected or [0]
    assert got == expected
