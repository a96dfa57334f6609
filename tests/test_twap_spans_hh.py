"""Time-weighted average, span-corruption pairs (oracle + reconstruction
invariant), and per-group Misra-Gries heavy hitters."""
import numpy as np
import pytest

from .conftest import SF_SMOKE, assert_matches_oracle, to_pandas


@pytest.mark.usefixtures("ray_session")
def test_twap_matches_oracle(oracle_smoke):
    import __ray_entry__ as mod
    from security_log_analysis_rust_ray.pipelines.relational import \
        user_time_weighted_value
    assert_matches_oracle(user_time_weighted_value(SF_SMOKE), oracle_smoke,
                          mod.oracle_sql()["user_time_weighted_value"])


@pytest.mark.usefixtures("ray_session")
def test_span_corruption_matches_oracle(oracle_smoke):
    import __ray_entry__ as mod
    from security_log_analysis_rust_ray.pipelines.docs import \
        doc_span_corruption_pairs
    assert_matches_oracle(doc_span_corruption_pairs(SF_SMOKE), oracle_smoke,
                          mod.oracle_sql()["doc_span_corruption_pairs"])


@pytest.mark.usefixtures("ray_session")
def test_span_corruption_reconstructs_original():
    """Interleaving target spans over the input's sentinels must restore
    every original document exactly — the property pretraining relies on."""
    from security_log_analysis_rust_ray.pipelines.docs import (
        doc_span_corruption_pairs, docs_aug_ds)

    got = to_pandas(doc_span_corruption_pairs(SF_SMOKE)).set_index("doc_id")
    orig = to_pandas(docs_aug_ds(SF_SMOKE)).set_index("doc_id")
    for did, row in got.iterrows():
        spans, cur = {}, None
        for t in row["target_text"].split(" "):
            if t.startswith("<X"):
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        out = []
        for t in row["input_text"].split(" "):
            out.extend(spans.get(t, [])) if t.startswith("<X") \
                else out.append(t)
        assert " ".join(out) == orig.loc[did, "text"]


@pytest.mark.usefixtures("ray_session")
def test_grouped_heavy_hitters_guarantee(oracle_smoke):
    """Per-group MG guarantee: every item with in-group frequency
    > n_g/(k+1) must appear, and lb_count never exceeds the true count."""
    from security_log_analysis_rust_ray.pipelines.docs import \
        source_top_terms_approx

    k = 16
    got = to_pandas(source_top_terms_approx(SF_SMOKE, k=k))
    exact = oracle_smoke.execute(
        "WITH f AS (SELECT source, unnest(str_split(text, ' ')) AS term"
        " FROM documents)"
        " SELECT source, term, count(*) c,"
        " sum(count(*)) OVER (PARTITION BY source) n"
        " FROM f GROUP BY source, term").df()
    truth = {(s, t): c for s, t, c in
             zip(exact["source"], exact["term"], exact["c"])}
    for src, g in exact.groupby("source"):
        n = g["n"].iloc[0]
        must = set(g.loc[g["c"] > n / (k + 1), "term"])
        have = set(got.loc[got["source"] == src, "item"])
        assert must <= have, f"missing guaranteed hitters for {src}"
    for s, t, lb in zip(got["source"], got["item"], got["lb_count"]):
        assert lb <= truth.get((s, t), 0), "lb_count must lower-bound truth"
