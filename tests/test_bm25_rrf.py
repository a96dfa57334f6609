"""BM25 ranked retrieval, reciprocal-rank fusion, and per-user running
distinct-type counts vs pure-Python/pandas references (sf0.001)."""
import math

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TERMS = ["batch", "join"]


def _brute_bm25(sf_dir):
    """Row-at-a-time BM25 over docs_aug — the slow reference."""
    from security_log_analysis_rust_ray.pipelines.docs import docs_aug_ds
    from security_log_analysis_rust_ray.pipelines.search import (BM25_B,
                                                                 BM25_K1)
    docs = docs_aug_ds(sf_dir).to_pandas().sort_values("doc_id")
    toks = docs["text"].str.split(" ")
    dl = toks.str.len().to_numpy(dtype=np.float64)
    n = len(docs)
    avgdl = dl.sum() / n
    rows = []
    tf_cols = {t: np.array([row.count(t) for row in toks], dtype=np.float64)
               for t in TERMS}
    df = {t: int((tf_cols[t] > 0).sum()) for t in TERMS}
    for i, d in enumerate(docs["doc_id"].to_numpy()):
        s = 0.0
        for t in TERMS:
            tf = tf_cols[t][i]
            idf = math.log1p((n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl[i] / avgdl))
        if s > 0:
            rows.append((int(d), int(dl[i]), s))
    return rows


@pytest.mark.usefixtures("ray_session")
def test_bm25_topk_matches_brute_force():
    from security_log_analysis_rust_ray.pipelines.search import (BM25_K,
                                                                 doc_bm25_topk)
    got = doc_bm25_topk(SF).to_pandas()
    rows = _brute_bm25(SF)
    rows.sort(key=lambda r: (-r[2], r[0]))
    want = rows[:BM25_K]
    assert len(got) == len(want) > 0
    assert got["doc_id"].tolist() == [d for d, _, _ in want]
    from security_log_analysis_rust_ray.functions.util import round_half_up
    np.testing.assert_array_equal(
        got["score"].to_numpy(),
        round_half_up(np.array([s for _, _, s in want]), 6))


@pytest.mark.usefixtures("ray_session")
def test_rrf_matches_brute_force_fusion():
    from security_log_analysis_rust_ray.pipelines.search import (
        BM25_K, RRF_C, RRF_N, doc_search_rrf)
    got = doc_search_rrf(SF).to_pandas()
    rows = _brute_bm25(SF)
    fused = {}
    by_score = sorted(rows, key=lambda r: (-r[2], r[0]))[:RRF_N]
    for r, (d, _, _) in enumerate(by_score, start=1):
        fused[d] = fused.get(d, 0.0) + 1.0 / (RRF_C + r)
    by_dl = sorted(rows, key=lambda r: (r[1], r[0]))[:RRF_N]
    for r, (d, _, _) in enumerate(by_dl, start=1):
        fused[d] = fused.get(d, 0.0) + 1.0 / (RRF_C + r)
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_K]
    assert got["doc_id"].tolist() == [d for d, _ in want]
    from security_log_analysis_rust_ray.functions.util import round_half_up
    np.testing.assert_array_equal(
        got["rrf"].to_numpy(),
        round_half_up(np.array([v for _, v in want]), 6))
    # a doc ranked in BOTH lists must carry both contributions
    both = set(d for d, _, _ in by_score) & set(d for d, _, _ in by_dl)
    assert both, "fixture corpus should have docs in both lists"


@pytest.mark.usefixtures("ray_session")
def test_cumulative_distinct_matches_pandas():
    from security_log_analysis_rust_ray.pipelines.relational import \
        user_cumulative_distinct
    got = user_cumulative_distinct(SF).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "user_id", "ts", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["first"] = ~ev.duplicated(["user_id", "event_type"])
    ev["n_types_seen"] = ev.groupby("user_id")["first"].cumsum().astype(np.int64)
    want = ev.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got.set_index("event_id")["n_types_seen"],
        want.set_index("event_id")["n_types_seen"], check_names=False)
    # running counts are non-decreasing per user and start at 1
    for _, g in got.merge(want[["event_id", "ts"]], on="event_id") \
            .sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        v = g["n_types_seen"].to_numpy()
        assert v[0] == 1 and (np.diff(v) >= 0).all()
