"""Adversarial-skew tests for the generalized multi-rank selection core
(winsorize/outlier path) and the cumulative-distinct kernel: one hot
group spanning many blocks plus a tiny group inside one block."""
import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _write_events(tmp_path, n_big=20_000, n_small=7, seed=13):
    import pyarrow.parquet as pq
    rng = np.random.default_rng(seed)
    n = n_big + n_small
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(["hot"] * n_big + ["cold"] * n_small),
        "value": pa.array(np.round(rng.uniform(0, 100, n), 2),
                          pa.float64()),
        "ts": pa.array(
            rng.integers(0, 10**12, n).astype("datetime64[us]")),
        "user_id": pa.array(np.r_[np.zeros(n_big, np.int64),
                                  np.arange(1, n_small + 1)], pa.int64()),
        "props": pa.array(["{}"] * n),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    return d


@pytest.mark.usefixtures("ray_session")
def test_winsorize_skewed_multiblock(tmp_path):
    """Both p05/p95 bounds of a 95%-hot type that spans many sorted
    blocks must be exact (multi-target picks inside ONE summary fold)."""
    from security_log_analysis_rust_ray.pipelines import relational as REL
    d = _write_events(tmp_path)
    got = REL.events_value_winsorized(str(d)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM"
                f" read_parquet('{d / 'events.parquet'}')")
    exp = con.execute(
        "WITH r AS (SELECT event_id, event_type, value,"
        " row_number() OVER (PARTITION BY event_type"
        " ORDER BY value, event_id) AS rn,"
        " count(*) OVER (PARTITION BY event_type) AS n FROM events),"
        "b AS (SELECT event_type,"
        " max(CASE WHEN rn = CAST(floor(0.05 * (n - 1)) AS BIGINT) + 1"
        " THEN value END) AS lo,"
        " max(CASE WHEN rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1"
        " THEN value END) AS hi FROM r GROUP BY 1)"
        "SELECT e.event_id,"
        " round(least(greatest(e.value, b.lo), b.hi), 6) AS value_w"
        " FROM events e JOIN b USING (event_type) ORDER BY e.event_id"
    ).df()
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["value_w"].to_numpy(),
                                  exp["value_w"].to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_cumulative_distinct_hot_user(tmp_path):
    """A user holding 95% of all rows (co-located by the exchange, but
    dominating its block) still counts first occurrences exactly."""
    from security_log_analysis_rust_ray.pipelines import relational as REL
    d = _write_events(tmp_path)
    # re-type rows randomly so the hot user's distinct count grows past 1
    import pyarrow.parquet as pq
    t = pq.read_table(d / "events.parquet")
    rng = np.random.default_rng(29)
    types = np.array(["a", "b", "c", "d", "e"])[
        rng.integers(0, 5, t.num_rows)]
    t = t.set_column(t.schema.get_field_index("event_type"),
                     "event_type", pa.array(types))
    pq.write_table(t, d / "events.parquet")
    got = REL.user_cumulative_distinct(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM"
                f" read_parquet('{d / 'events.parquet'}')")
    exp = con.execute(
        "WITH f AS (SELECT event_id, user_id, ts,"
        " row_number() OVER (PARTITION BY user_id, event_type"
        " ORDER BY ts, event_id) AS rn FROM events)"
        "SELECT event_id,"
        " CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER"
        " (PARTITION BY user_id ORDER BY ts, event_id"
        " ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen"
        " FROM f ORDER BY event_id").df()
    got = got.sort_values("event_id").reset_index(drop=True)
    assert got["n_types_seen"].tolist() == exp["n_types_seen"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_latency_percentiles_ordered_and_consistent():
    """p50 <= p90 <= p99 per server, each an actual observed latency, and
    consistent with the moments fold's min/max bracket."""
    from security_log_analysis_rust_ray.pipelines.reports import (
        assistant_latency_percentiles, assistant_latency_stats)
    sf = "/root/testdata/sf0.001"
    got = assistant_latency_percentiles(sf).to_pandas()
    st = assistant_latency_stats(sf).to_pandas().set_index("server")
    assert len(got) > 0
    for _, r in got.iterrows():
        assert r["p50"] <= r["p90"] <= r["p99"]
        assert st.loc[r["server"], "min_v"] <= r["p50"]
        assert r["p99"] <= st.loc[r["server"], "max_v"]


@pytest.mark.usefixtures("ray_session")
def test_quantile_normalization_matches_pandas():
    import pandas as pd
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_value_quantile_normalized
    sf = "/root/testdata/sf0.001"
    got = events_value_quantile_normalized(sf).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    g = ev.sort_values(["value", "event_id"]).reset_index(drop=True)
    big_n = len(ev) - 1
    rows = []
    for t, grp in ev.groupby("event_type"):
        grp = grp.sort_values(["value", "event_id"]).reset_index(drop=True)
        n = len(grp)
        for r, eid in enumerate(grp["event_id"]):
            pos = 0 if n <= 1 else (r * big_n) // (n - 1)
            rows.append((eid, g["value"].iat[pos]))
    want = pd.DataFrame(rows, columns=["event_id", "qnorm_value"]) \
        .sort_values("event_id").reset_index(drop=True)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    np.testing.assert_array_equal(got["qnorm_value"].to_numpy(),
                                  want["qnorm_value"].to_numpy())
    # after normalization every type's extremes meet the global extremes
    m = got.merge(ev[["event_id", "event_type"]], on="event_id")
    for _, grp in m.groupby("event_type"):
        assert grp["qnorm_value"].min() == ev["value"].min()
        assert grp["qnorm_value"].max() == ev["value"].max()


@pytest.mark.usefixtures("ray_session")
def test_fk_audit_clean_then_detects_injected_orphans(tmp_path):
    import shutil
    import pyarrow.parquet as pq
    from security_log_analysis_rust_ray.pipelines.relational import \
        fk_integrity_audit
    sf = "/root/testdata/sf0.001"
    clean = fk_integrity_audit(sf).to_pandas()
    assert len(clean) == 7 and (clean["violations"] == 0).all()
    # corrupt a copy: point 5 orders at a non-existent customer
    d = tmp_path / "sf"
    d.mkdir()
    for f in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        shutil.copy(f"{sf}/{f}.parquet", d / f"{f}.parquet")
    t = pq.read_table(d / "orders.parquet")
    ck = t["o_custkey"].to_numpy().copy()
    ck[:5] = 99_999_999
    t = t.set_column(t.schema.get_field_index("o_custkey"), "o_custkey",
                     pa.array(ck, pa.int64()))
    pq.write_table(t, d / "orders.parquet")
    dirty = fk_integrity_audit(str(d)).to_pandas().set_index("edge")
    assert dirty.loc["orders.o_custkey->customer", "violations"] == 5
    assert dirty.drop("orders.o_custkey->customer")["violations"] \
        .sum() == 0


@pytest.mark.usefixtures("ray_session")
def test_ab_ztest_matches_scipy_style_reference():
    import pandas as pd
    from security_log_analysis_rust_ray.pipelines.relational import (
        AB_HASH_MOD, AB_HASH_MULT, events_ab_conversion_ztest)
    sf = "/root/testdata/sf0.001"
    got = events_ab_conversion_ztest(sf).to_pandas().iloc[0]
    ev = pd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "event_type", "value"])
    cents = np.floor(ev["value"].to_numpy() * 100).astype(np.int64)
    ev["c"] = ((ev["event_type"] == "purchase")
               & (cents % 7 == 0)).astype(int)
    cu = ev.groupby("user_id")["c"].max()
    arm = (cu.index.to_numpy() * AB_HASH_MULT) % AB_HASH_MOD % 2
    n_a, n_b = int((arm == 0).sum()), int((arm == 1).sum())
    ca = int(cu[arm == 0].sum()); cb = int(cu[arm == 1].sum())
    assert (got["n_a"], got["conv_a"], got["n_b"], got["conv_b"]) \
        == (n_a, ca, n_b, cb)
    # the split is non-degenerate at this sf
    assert 0 < ca < n_a or 0 < cb < n_b
    pool = (ca + cb) / (n_a + n_b)
    z = (ca / n_a - cb / n_b) / np.sqrt(
        pool * (1 - pool) * (1 / n_a + 1 / n_b))
    assert abs(got["z"] - z) < 1e-6
