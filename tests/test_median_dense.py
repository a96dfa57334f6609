"""Exact distributed median (global + per-group selection), gap-filled
dense daily counts, and the conversation-level split vs their DuckDB
oracles, plus the edge cases the sf oracles can't exercise (calendar
gaps, a type skewed across many blocks, a type entirely inside one
block)."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from .conftest import SF_SMOKE, assert_matches_oracle


@pytest.mark.usefixtures("ray_session")
def test_median_exact_matches_oracle(oracle_smoke):
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_value_median_exact
    assert_matches_oracle(
        events_value_median_exact(SF_SMOKE), oracle_smoke,
        "SELECT value AS median_value FROM"
        " (SELECT value, row_number() OVER (ORDER BY value, event_id) rn,"
        "  count(*) OVER () n FROM events)"
        " WHERE rn = (n + 1) // 2")


@pytest.mark.usefixtures("ray_session")
def test_median_by_type_matches_oracle(oracle_smoke):
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_value_median_by_type
    assert_matches_oracle(
        events_value_median_by_type(SF_SMOKE), oracle_smoke,
        "SELECT event_type, value AS median_value FROM"
        " (SELECT event_type, value, row_number() OVER ("
        "   PARTITION BY event_type ORDER BY value, event_id) rn,"
        "  count(*) OVER (PARTITION BY event_type) n FROM events)"
        " WHERE rn = (n + 1) // 2 ORDER BY event_type")


@pytest.mark.usefixtures("ray_session")
def test_median_by_type_skewed_multiblock(tmp_path):
    """One type holds 95% of rows (spans MANY sorted blocks — the shape
    that kills a per-group collect) and one tiny type sits entirely
    inside a single block; both medians must be exact."""
    import pyarrow.parquet as pq

    from security_log_analysis_rust_ray.pipelines import relational as REL

    rng = np.random.default_rng(7)
    n_big, n_small = 20_000, 7
    t = pa.table({
        "event_id": pa.array(np.arange(n_big + n_small), pa.int64()),
        "event_type": pa.array(["hot"] * n_big + ["cold"] * n_small),
        "value": pa.array(
            np.round(rng.uniform(0, 100, n_big + n_small), 2),
            pa.float64()),
        "ts": pa.array([0] * (n_big + n_small), pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n_big + n_small), pa.int64()),
        "props": pa.array([""] * (n_big + n_small)),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    got = REL.events_value_median_by_type(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM"
                f" read_parquet('{d / 'events.parquet'}')")
    exp = con.execute(
        "SELECT event_type, value AS median_value FROM"
        " (SELECT event_type, value, row_number() OVER ("
        "   PARTITION BY event_type ORDER BY value, event_id) rn,"
        "  count(*) OVER (PARTITION BY event_type) n FROM events)"
        " WHERE rn = (n + 1) // 2 ORDER BY event_type").df()
    con.close()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


@pytest.mark.usefixtures("ray_session")
def test_daily_dense_matches_oracle(oracle_smoke):
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_daily_dense
    assert_matches_oracle(
        events_daily_dense(SF_SMOKE), oracle_smoke,
        "WITH bounds AS (SELECT date_trunc('day', min(ts)) lo,"
        " date_trunc('day', max(ts)) hi FROM events),\n"
        "days AS (SELECT unnest(generate_series(lo, hi,"
        " INTERVAL 1 DAY)) AS day FROM bounds),\n"
        "types AS (SELECT DISTINCT event_type FROM events),\n"
        "cnts AS (SELECT event_type, date_trunc('day', ts) AS day,"
        " count(*) AS cnt FROM events GROUP BY 1, 2)\n"
        "SELECT t.event_type, d.day,"
        " CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt"
        " FROM days d CROSS JOIN types t LEFT JOIN cnts c"
        " ON c.event_type = t.event_type AND c.day = d.day")


@pytest.mark.usefixtures("ray_session")
def test_daily_dense_fills_gaps(tmp_path):
    """Events on day 1 and day 5 only: days 2-4 must appear zero-filled
    for every type, and a type absent on an active day reads 0 there."""
    import pyarrow.parquet as pq

    from security_log_analysis_rust_ray.pipelines import relational as REL

    day = 86_400_000_000  # us
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "event_type": pa.array(["a", "a", "b"]),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "ts": pa.array([0, 4 * day, 4 * day], pa.timestamp("us")),
        "user_id": pa.array([0, 0, 0], pa.int64()),
        "props": pa.array(["", "", ""]),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    got = REL.events_daily_dense(str(d)).to_pandas()
    # 2 types x 5 days, zero-filled except (a,d0) (a,d4) (b,d4)
    assert len(got) == 10
    assert int((got["cnt"] == 0).sum()) == 7
    byk = got.set_index(["event_type", "day"])["cnt"]
    d0 = pd.Timestamp(0)
    d4 = pd.Timestamp(4 * day * 1000)
    assert byk[("a", d0)] == 1 and byk[("a", d4)] == 1
    assert byk[("b", d4)] == 1 and byk[("b", d0)] == 0


@pytest.mark.usefixtures("ray_session")
def test_conversation_split_leakage_safe(oracle_smoke):
    """Every turn of a conversation gets ONE split (conversation
    granularity), and the assignment matches the SQL restatement."""
    from security_log_analysis_rust_ray.pipelines.reports import \
        CONV_SPLIT_MOD, CONV_SPLIT_MULT, conversation_split_assign
    ds = conversation_split_assign(SF_SMOKE)
    df = ds.to_pandas()
    per_conv = df.groupby("conv_id")["split"].nunique()
    assert (per_conv == 1).all()
    assert set(df["split"].unique()) <= {"train", "val", "test"}
    from security_log_analysis_rust_ray.synth import oracle_query
    assert_matches_oracle(
        conversation_split_assign(SF_SMOKE), oracle_smoke,
        oracle_query(
        "SELECT conv_id, turn_idx, CASE"
        " WHEN ((CAST(regexp_extract(conv_id, 'conv_(\\d+)', 1)"
        f"   AS BIGINT) * {CONV_SPLIT_MULT})"
        f"  % {CONV_SPLIT_MOD}) % 10 < 8 THEN 'train'"
        " WHEN ((CAST(regexp_extract(conv_id, 'conv_(\\d+)', 1)"
        f"   AS BIGINT) * {CONV_SPLIT_MULT})"
        f"  % {CONV_SPLIT_MOD}) % 10 = 8 THEN 'val'"
        " ELSE 'test' END AS split FROM transcripts"))


@pytest.mark.usefixtures("ray_session")
def test_snapshot_diff_matches_oracle(oracle_smoke):
    from security_log_analysis_rust_ray.pipelines.streaming import (
        DIFF_ADDED_EVERY, DIFF_CHANGED_EVERY, DIFF_REMOVED_EVERY,
        events_snapshot_diff)
    assert_matches_oracle(
        events_snapshot_diff(SF_SMOKE), oracle_smoke,
        "WITH a AS (SELECT event_id, value FROM events),\n"
        "b AS (SELECT event_id, CASE WHEN event_id %"
        f" {DIFF_CHANGED_EVERY} = 0 THEN value + 1.0"
        " ELSE value END AS value FROM events"
        f" WHERE event_id % {DIFF_REMOVED_EVERY} <> 0\n"
        " UNION ALL SELECT -event_id, value FROM events"
        f" WHERE event_id % {DIFF_ADDED_EVERY} = 0)\n"
        "SELECT COALESCE(a.event_id, b.event_id) AS event_id,"
        " CASE WHEN a.event_id IS NULL THEN 'added'"
        "  WHEN b.event_id IS NULL THEN 'removed'"
        "  ELSE 'changed' END AS change,"
        " a.value AS value_a, b.value AS value_b"
        " FROM a FULL OUTER JOIN b ON a.event_id = b.event_id"
        " WHERE a.event_id IS NULL OR b.event_id IS NULL"
        "  OR a.value <> b.value")


@pytest.mark.usefixtures("ray_session")
def test_snapshot_diff_identical_snapshots_empty(tmp_path):
    """Two byte-identical snapshots diff to ZERO rows (the anti-entropy
    fast path: ids that are multiples of none of the rule moduli)."""
    import pyarrow.parquet as pq

    from security_log_analysis_rust_ray.pipelines import streaming as STR

    ids = [1, 2, 3, 5, 7, 11, 199]  # coprime to all three moduli
    t = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "event_type": pa.array(["a"] * len(ids)),
        "value": pa.array([float(i) for i in ids], pa.float64()),
        "ts": pa.array([0] * len(ids), pa.timestamp("us")),
        "user_id": pa.array([0] * len(ids), pa.int64()),
        "props": pa.array([""] * len(ids)),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    assert STR.events_snapshot_diff(str(d)).count() == 0


@pytest.mark.usefixtures("ray_session")
def test_percentiles_exact_matches_oracle(oracle_smoke):
    from security_log_analysis_rust_ray.pipelines.relational import (
        PCTS_EXACT, events_value_percentiles_exact)
    assert_matches_oracle(
        events_value_percentiles_exact(SF_SMOKE), oracle_smoke,
        "WITH r AS (SELECT value,"
        " row_number() OVER (ORDER BY value, event_id) rn,"
        " count(*) OVER () n FROM events)\n"
        "SELECT p.pct, r.value AS pct_value"
        " FROM (SELECT unnest(["
        + ", ".join(str(p) for p in PCTS_EXACT) + "]) AS pct) p"
        " JOIN r ON r.rn = CAST(ceil(p.pct * r.n) AS BIGINT)"
        " ORDER BY p.pct")


@pytest.mark.usefixtures("ray_session")
def test_trimmed_mean_by_type_skewed_multiblock(tmp_path):
    """Trimmed mean: one hot type spanning many sorted blocks (its keep
    window crosses block boundaries, exercising both the fully-inside
    summary path and the boundary slice-extract path) plus a tiny type
    inside one block; exact vs the window-SQL oracle."""
    import pyarrow.parquet as pq

    from security_log_analysis_rust_ray.pipelines import relational as REL

    rng = np.random.default_rng(11)
    n_big, n_small = 20_000, 9
    t = pa.table({
        "event_id": pa.array(np.arange(n_big + n_small), pa.int64()),
        "event_type": pa.array(["hot"] * n_big + ["cold"] * n_small),
        "value": pa.array(
            np.round(rng.uniform(0, 100, n_big + n_small), 2),
            pa.float64()),
        "ts": pa.array([0] * (n_big + n_small), pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n_big + n_small), pa.int64()),
        "props": pa.array([""] * (n_big + n_small)),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    got = REL.events_value_trimmed_mean_by_type(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM"
                f" read_parquet('{d / 'events.parquet'}')")
    exp = con.execute(
        "WITH ranked AS (SELECT event_type, value,"
        " row_number() OVER (PARTITION BY event_type"
        " ORDER BY value, event_id) AS rn,"
        " count(*) OVER (PARTITION BY event_type) AS n FROM events)\n"
        "SELECT event_type, round(sum(value) / count(*), 4)"
        " AS trimmed_mean FROM ranked"
        f" WHERE rn > floor({REL.TRIM_FRACTION} * n)"
        f" AND rn <= n - floor({REL.TRIM_FRACTION} * n)"
        " GROUP BY event_type ORDER BY event_type").df()
    con.close()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


@pytest.mark.usefixtures("ray_session")
def test_gini_by_type_skewed_multiblock(tmp_path):
    """Gini: the hot type's segments span many sorted blocks, so the
    global rank-weighted sum must be assembled from per-segment local
    sums + prefix offsets; exact vs the window-SQL oracle."""
    import pyarrow.parquet as pq

    from security_log_analysis_rust_ray.pipelines import relational as REL

    rng = np.random.default_rng(13)
    n_big, n_small = 20_000, 6
    t = pa.table({
        "event_id": pa.array(np.arange(n_big + n_small), pa.int64()),
        "event_type": pa.array(["hot"] * n_big + ["cold"] * n_small),
        "value": pa.array(
            np.round(rng.uniform(0.01, 100, n_big + n_small), 2),
            pa.float64()),
        "ts": pa.array([0] * (n_big + n_small), pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n_big + n_small), pa.int64()),
        "props": pa.array([""] * (n_big + n_small)),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    got = REL.events_value_gini_by_type(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM"
                f" read_parquet('{d / 'events.parquet'}')")
    exp = con.execute(
        "WITH r AS (SELECT event_type, value,"
        " row_number() OVER (PARTITION BY event_type"
        " ORDER BY value, event_id) AS rn FROM events)\n"
        "SELECT event_type,"
        " round(2.0 * sum(rn * value) / (count(*) * sum(value))"
        " - (count(*) + 1.0) / count(*), 6) AS gini"
        " FROM r GROUP BY event_type ORDER BY event_type").df()
    con.close()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


@pytest.mark.usefixtures("ray_session")
def test_weighted_median_by_type_skewed_multiblock(tmp_path):
    """Weighted median: hot type spans blocks so the crossing segment's
    in-block weight cumsum must compose with driver prefix weights."""
    import pyarrow.parquet as pq

    from security_log_analysis_rust_ray.pipelines import relational as REL

    rng = np.random.default_rng(17)
    n_big, n_small = 20_000, 8
    t = pa.table({
        "event_id": pa.array(np.arange(n_big + n_small), pa.int64()),
        "event_type": pa.array(["hot"] * n_big + ["cold"] * n_small),
        "value": pa.array(
            np.round(rng.uniform(0, 100, n_big + n_small), 2),
            pa.float64()),
        "ts": pa.array([0] * (n_big + n_small), pa.timestamp("us")),
        "user_id": pa.array(
            rng.integers(0, 1000, n_big + n_small), pa.int64()),
        "props": pa.array([""] * (n_big + n_small)),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    got = REL.events_value_weighted_median_by_type(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM"
                f" read_parquet('{d / 'events.parquet'}')")
    exp = con.execute(
        "WITH w AS (SELECT event_type, value, event_id,"
        f" (user_id % {REL.WMED_WEIGHT_MOD}) + 1 AS wt FROM events),\n"
        "c AS (SELECT *, sum(wt) OVER (PARTITION BY event_type"
        " ORDER BY value, event_id ROWS UNBOUNDED PRECEDING) AS cw,"
        " sum(wt) OVER (PARTITION BY event_type) AS tw FROM w)\n"
        "SELECT event_type, min(value) AS wmedian FROM c"
        " WHERE 2 * cw >= tw GROUP BY event_type"
        " ORDER BY event_type").df()
    con.close()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


@pytest.mark.usefixtures("ray_session")
def test_ks_two_sample_multiblock(tmp_path):
    """KS over a 20k-row two-type stream (samples interleave across many
    sorted blocks, so per-block CDF gaps must compose through the
    entering offsets); exact vs the windowed-SQL oracle, plus the
    identical-distribution sanity (KS ~ 0 when A == B)."""
    import pyarrow.parquet as pq

    from security_log_analysis_rust_ray.pipelines import relational as REL

    rng = np.random.default_rng(19)
    n = 20_000
    vals = np.concatenate([rng.uniform(0, 100, n // 2),        # click
                           rng.uniform(20, 120, n // 2)])       # view
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array([REL.KS_TYPE_A] * (n // 2)
                               + [REL.KS_TYPE_B] * (n // 2)),
        "value": pa.array(np.round(vals, 3), pa.float64()),
        "ts": pa.array([0] * n, pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n), pa.int64()),
        "props": pa.array([""] * n),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    got = REL.events_ks_statistic(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM"
                f" read_parquet('{d / 'events.parquet'}')")
    import __ray_entry__ as mod
    exp = con.execute(mod.oracle_sql()["events_ks_statistic"]).df()
    con.close()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    # shifted distributions: KS must be large
    assert got["ks"].iloc[0] > 0.1


@pytest.mark.usefixtures("ray_session")
def test_rank_auc_properties(tmp_path):
    """AUC sanity: a strictly-shifted sample B gives AUC near 0 (A's
    values rank lower), and AUC stays in [0, 1]; exact vs oracle."""
    import pyarrow.parquet as pq

    from security_log_analysis_rust_ray.pipelines import relational as REL

    rng = np.random.default_rng(23)
    n = 10_000
    vals = np.concatenate([rng.uniform(0, 10, n // 2),     # A low
                           rng.uniform(20, 30, n // 2)])    # B high
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array([REL.KS_TYPE_A] * (n // 2)
                               + [REL.KS_TYPE_B] * (n // 2)),
        "value": pa.array(np.round(vals, 3), pa.float64()),
        "ts": pa.array([0] * n, pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n), pa.int64()),
        "props": pa.array([""] * n),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    got = REL.events_rank_auc(str(d)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM"
                f" read_parquet('{d / 'events.parquet'}')")
    import __ray_entry__ as mod
    exp = con.execute(mod.oracle_sql()["events_rank_auc"]).df()
    con.close()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)
    auc = got["auc"].iloc[0]
    assert 0.0 <= auc <= 1.0 and auc < 0.05  # A strictly below B
