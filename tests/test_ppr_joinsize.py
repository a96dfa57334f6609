"""Personalized PageRank vs a dense numpy reference; CMS inner-product
join-size estimate vs the exact join cardinality."""
import numpy as np
import pandas as pd
import pytest

from .conftest import SF_SMOKE


def _reference_ppr(edges_df, seeds, iters, damping=0.85):
    nodes = sorted(set(edges_df["src"]) | set(edges_df["dst"]))
    idx = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for s, d, c in edges_df[["src", "dst", "w"]].itertuples(index=False):
        w[idx[s], idx[d]] += c
    out = w.sum(axis=1)
    dangling = out == 0
    nw = np.divide(w, out[:, None], out=np.zeros_like(w),
                   where=out[:, None] > 0)
    p = np.zeros(n)
    for h in seeds:
        p[idx[h]] = 1.0 / len(seeds)
    r = p.copy()
    for _ in range(iters):
        d_mass = r[dangling].sum()
        r = (1 - damping) * p + damping * (nw.T @ r) + damping * d_mass * p
    return dict(zip(nodes, r))


@pytest.mark.usefixtures("ray_session")
def test_personalized_pagerank_matches_dense_reference():
    import re
    from security_log_analysis_rust_ray.pipelines import reports as R
    edges = R.host_transition_edges(SF_SMOKE).to_pandas()
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    seeds = [h for h in nodes
             if (m := re.match(r"^h(\d+)\.", h))
             and int(m.group(1)) % R.PPR_SEED_MOD == 0]
    assert seeds and len(seeds) < len(nodes)
    ref = _reference_ppr(edges, seeds, iters=5)
    got = R.host_personalized_pagerank(SF_SMOKE, iters=5).to_pandas()
    assert len(got) == len(ref)
    merged = got.set_index("host")["rank"]
    for h, r in ref.items():
        assert abs(merged[h] - r) < 1e-4, h
    # mass invariant
    assert abs(got["rank"].sum() - 1.0) < 1e-3
    # every seed keeps teleport mass
    assert all(merged[h] > 0 for h in seeds)


@pytest.mark.usefixtures("ray_session")
def test_ppr_distributed_loop_matches_one_task():
    """Force the distributed join loop (local_max_edges=0) and check it
    agrees with the one-task numpy path on the same restart vector."""
    import re
    from security_log_analysis_rust_ray.pipelines import reports as R
    from security_log_analysis_rust_ray.stages.graph import pagerank
    edges = R.host_transition_edges(SF_SMOKE).materialize()
    nodes = sorted(set(edges.to_pandas()["src"])
                   | set(edges.to_pandas()["dst"]))
    seeds = [h for h in nodes
             if (m := re.match(r"^h(\d+)\.", h))
             and int(m.group(1)) % 10 == 0]
    restart = {h: 1.0 / len(seeds) for h in seeds}
    one = pagerank(edges, weight="w", iters=4, restart=restart) \
        .to_pandas().set_index("node")["rank"]
    dist = pagerank(edges, weight="w", iters=4, restart=restart,
                    local_max_edges=0) \
        .to_pandas().set_index("node")["rank"]
    assert len(one) == len(dist)
    for h in one.index:
        assert abs(one[h] - dist[h]) < 1e-9, h


@pytest.mark.usefixtures("ray_session")
def test_join_size_estimate_bounds_exact():
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_customer_join_size_approx
    est = int(events_customer_join_size_approx(SF_SMOKE)
              .to_pandas()["est_join_rows"].iloc[0])
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["user_id"])
    cu = pd.read_parquet(f"{SF_SMOKE}/customer.parquet",
                         columns=["c_custkey"])
    ce = ev["user_id"].value_counts()
    cc = cu["c_custkey"].value_counts()
    exact = int(sum(int(ce[k]) * int(cc[k])
                    for k in set(ce.index) & set(cc.index)))
    assert exact > 0
    # CMS inner product is one-sided: est >= exact, within the additive
    # (e/w) * N_a * N_b row bound (w=2048, d=4)
    assert est >= exact
    bound = np.e / 2048 * len(ev) * len(cu)
    assert est - exact <= bound


@pytest.mark.usefixtures("ray_session")
def test_partition_skew_accounts_for_every_row():
    from security_log_analysis_rust_ray.pipelines.relational import (
        SAMPLE_MOD, SAMPLE_MULT, SKEW_PARTS, events_partition_skew)
    got = events_partition_skew(SF_SMOKE).to_pandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["user_id"])
    assert got["n_rows"].sum() == len(ev)
    p = (ev["user_id"] % SAMPLE_MOD * SAMPLE_MULT) % SAMPLE_MOD % SKEW_PARTS
    ref = p.value_counts().sort_index()
    m = got.set_index("partition")["n_rows"]
    assert m.sort_index().tolist() == ref.tolist()
    # load ratios average to 1 over the observed partitions
    assert abs(got["load_ratio"].mean() - 1.0) < 1e-4


@pytest.mark.usefixtures("ray_session")
def test_json_field_stats_matches_pandas():
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_json_field_stats
    got = events_json_field_stats(SF_SMOKE).to_pandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet",
                         columns=["event_type", "props"])
    import json as _json
    ev["k"] = ev["props"].map(lambda s: _json.loads(s)["k"])
    ref = ev.groupby("event_type")["k"].agg(["count", "sum"]).sort_index()
    assert got["event_type"].tolist() == ref.index.tolist()
    assert got["n"].tolist() == ref["count"].tolist()
    assert got["sum_k"].tolist() == ref["sum"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_band_join_matches_brute_force():
    from security_log_analysis_rust_ray.pipelines.relational import (
        BAND_EPS, events_value_band_join)
    got = events_value_band_join(SF_SMOKE).to_pandas() \
        .sort_values(["a_id", "b_id"]).reset_index(drop=True)
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    a = ev[ev["event_type"] == "click"]
    b = ev[ev["event_type"] == "view"]
    pairs = []
    for aid, av in zip(a["event_id"], a["value"]):
        m = (b["value"] - av).abs() < BAND_EPS
        for bid in b.loc[m, "event_id"]:
            pairs.append((aid, bid))
    want = sorted(pairs)
    assert len(got) == len(want) > 0
    assert list(zip(got["a_id"], got["b_id"])) == want
    # a pair never appears twice (each qualifying pair meets in exactly
    # one bucket — the click row's own)
    assert not got.duplicated(["a_id", "b_id"]).any()


@pytest.mark.usefixtures("ray_session")
def test_onehot_features_cover_every_event_twice():
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_onehot_features
    got = events_onehot_features(SF_SMOKE).to_pandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["event_id"])
    assert len(got) == 2 * len(ev)
    # ids form a dense 0..V-1 dictionary in sorted feature order
    vocab = got[["feature", "feature_id"]].drop_duplicates() \
        .sort_values("feature_id")
    assert vocab["feature_id"].tolist() == list(range(len(vocab)))
    assert vocab["feature"].tolist() == sorted(vocab["feature"])


@pytest.mark.usefixtures("ray_session")
def test_target_encoding_is_leakage_safe():
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_target_encoded
    got = events_target_encoded(SF_SMOKE).to_pandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    m = got.merge(ev, on="event_id")
    cents = np.floor(m["value"].to_numpy() * 100).astype(np.int64)
    st = pd.DataFrame({"t": m["event_type"], "c": cents}) \
        .groupby("t")["c"].agg(["sum", "count"])
    ref = (st.loc[m["event_type"], "sum"].to_numpy() - cents) \
        / (st.loc[m["event_type"], "count"].to_numpy() - 1) / 100.0
    from security_log_analysis_rust_ray.functions.util import round_half_up
    np.testing.assert_array_equal(got["loo_mean"].to_numpy(),
                                  round_half_up(ref, 6))
    # the row's own value is excluded: encoding != plain category mean
    plain = (st.loc[m["event_type"], "sum"].to_numpy()
             / st.loc[m["event_type"], "count"].to_numpy() / 100.0)
    assert (np.abs(got["loo_mean"].to_numpy() - plain) > 1e-12).any()
