"""Distributed BPE merge learning: iterative + tie-broken, so no SQL
oracle — the contract is an EXACT match against a pure-Python reference
of the Sennrich et al. algorithm, plus the leftmost-greedy overlap rule."""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pytest

from security_log_analysis_rust_ray.pipelines import docs as D
from .conftest import SF_SMOKE


def _reference_bpe(texts, n_merges):
    vocab = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            vocab[w] += 1
    state = {w: tuple(list(w) + [D.BPE_EOW]) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pc_ = collections.Counter()
        for w, c in vocab.items():
            s = state[w]
            for i in range(len(s) - 1):
                pc_[(s[i], s[i + 1])] += c
        if not pc_:
            break
        (l, r), c = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((l, r, c))
        for w in vocab:
            s, out, i = state[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            state[w] = tuple(out)
    return merges


@pytest.mark.usefixtures("ray_session")
def test_bpe_learn_matches_reference():
    texts = D.docs_aug_ds(SF_SMOKE).to_pandas()["text"].tolist()
    got = D.bpe_learn(SF_SMOKE, 6)
    assert got == _reference_bpe(texts, 6)
    assert len(got) == 6                        # corpus is rich enough
    # merge table dataset mirrors the list
    t = D.bpe_merges(SF_SMOKE, 6).to_pandas()
    assert list(map(tuple, t[["left", "right", "pair_count"]].values)) \
        == got
    assert t["merge_idx"].tolist() == list(range(6))


def test_bpe_apply_merge_overlap_rule():
    """'aaaa' under ('a','a') -> ['aa','aa',EOW]; 'aaa' -> ['aa','a',EOW]
    (leftmost-greedy, merged symbols never chain within one round)."""
    b = pa.table({
        "word": pa.array(["aaaa", "aaa", "ba"]),
        "cnt": pa.array([1, 1, 1], pa.int64()),
        "syms": pa.array([list("aaaa") + [D.BPE_EOW],
                          list("aaa") + [D.BPE_EOW],
                          list("ba") + [D.BPE_EOW]],
                         pa.list_(pa.string())),
    })
    out = D._bpe_apply_merge("a", "a")(b)
    got = out["syms"].to_pylist()
    assert got == [["aa", "aa", D.BPE_EOW],
                   ["aa", "a", D.BPE_EOW],
                   ["b", "a", D.BPE_EOW]]
    # pair counting sees word boundaries: no cross-word pairs
    pc_ = D._bpe_pair_counts(out).to_pydict()
    pairs = dict(zip(zip(pc_["left"], pc_["right"]), pc_["c"]))
    assert pairs[("aa", "aa")] == 1
    assert ("</w>", "aa") not in pairs and ("</w>", "b") not in pairs


@pytest.mark.usefixtures("ray_session")
def test_bpe_learned_token_count_matches_reference():
    """End-to-end: learn merges, tokenize, count per doc — exact match
    against the pure-Python reference apply."""
    texts_df = D.docs_aug_ds(SF_SMOKE).to_pandas()
    merges = D.bpe_learn(SF_SMOKE, 5)

    # reference apply: one full pass per merge, in rank order
    def ref_tokens(word):
        s = list(word) + [D.BPE_EOW]
        for l, r, _ in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return len(s)

    lens = D.bpe_vocab_token_lens(SF_SMOKE, merges).to_pandas()
    lut = dict(zip(lens["term"], lens["n_tokens"]))
    for w in list(lut)[:200]:
        assert lut[w] == ref_tokens(w), w

    got = D.doc_bpe_learned_token_count(SF_SMOKE, 5).to_pandas()
    exp = {int(r.doc_id): sum(ref_tokens(w) for w in r.text.split(" "))
           for r in texts_df.itertuples()}
    assert dict(zip(got["doc_id"], got["n_tokens"])) == exp
