"""Pareto skyline, distributed grouped NTILE, and the Q4/Q12-shape
queries vs their DuckDB oracles, plus skyline edge cases the oracle's
NOT EXISTS rule pins down (duplicates, single point, dominated chains)."""
import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from .conftest import SF_SMOKE, assert_matches_oracle


@pytest.mark.usefixtures("ray_session")
def test_skyline_matches_oracle(oracle_smoke):
    from security_log_analysis_rust_ray.pipelines.relational import \
        part_price_size_skyline
    assert_matches_oracle(
        part_price_size_skyline(SF_SMOKE), oracle_smoke,
        "SELECT p_partkey, p_retailprice, p_size FROM part p"
        " WHERE NOT EXISTS (SELECT 1 FROM part q"
        "  WHERE q.p_retailprice <= p.p_retailprice"
        "  AND q.p_size >= p.p_size"
        "  AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))")


@pytest.mark.usefixtures("ray_session")
def test_skyline_block_kernel_edge_cases():
    """Duplicates on both axes survive together; a dominated chain leaves
    only the frontier; local-then-final equals one-shot."""
    import ray.data as rd
    from security_log_analysis_rust_ray.pipelines.relational import \
        _skyline_block

    t = pa.table({
        "p_partkey": [1, 2, 3, 4, 5, 6],
        "p_retailprice": [10.0, 10.0, 11.0, 9.0, 12.0, 9.0],
        "p_size": [5, 5, 5, 3, 9, 3],
    })
    out = _skyline_block(t).to_pandas().sort_values("p_partkey")
    # frontier: (9,3)x2 dupes survive TOGETHER, (10,5)x2 dupes, (12,9)
    assert sorted(out["p_partkey"]) == [1, 2, 4, 5, 6]

    # combiner property: skyline(local skylines) == skyline(all rows)
    ds = rd.from_arrow(t).repartition(3)
    local = ds.map_batches(_skyline_block, batch_format="pyarrow",
                           batch_size=None)
    final = local.repartition(num_blocks=1).map_batches(
        _skyline_block, batch_format="pyarrow", batch_size=None).to_pandas()
    assert sorted(final["p_partkey"]) == [1, 2, 4, 5, 6]


@pytest.mark.usefixtures("ray_session")
def test_ntile_matches_oracle(oracle_smoke):
    from security_log_analysis_rust_ray.pipelines.relational import \
        events_value_ntile
    assert_matches_oracle(
        events_value_ntile(SF_SMOKE), oracle_smoke,
        "SELECT event_id, event_type, value, CAST(ntile(4) OVER ("
        "PARTITION BY event_type ORDER BY value, event_id) AS BIGINT)"
        " AS quartile FROM events")


@pytest.mark.usefixtures("ray_session")
def test_ntile_tiny_groups_match_sql_rule():
    """Groups smaller than the tile count (base == 0) follow the SQL rule:
    every tile gets one row, later tiles stay empty."""
    import ray.data as rd
    import numpy as np
    got = None
    # build a tiny parquet dir shaped like the events table
    import tempfile, os
    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        t = pa.table({
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "ts": pa.array([pd.Timestamp("2024-01-01")] * 7).cast(
                pa.timestamp("us")),
            "user_id": pa.array([0] * 7, pa.int64()),
            "event_type": ["a", "a", "b", "b", "b", "b", "b"],
            "value": [5.0, 1.0, 4.0, 2.0, 9.0, 9.0, 0.5],
            "props": ["{}"] * 7,
        })
        pq.write_table(t, os.path.join(d, "events.parquet"))
        from security_log_analysis_rust_ray.pipelines.relational import \
            events_value_ntile
        got = events_value_ntile(d).to_pandas()
        exp = duckdb.sql(
            "SELECT event_id, event_type, value, CAST(ntile(4) OVER ("
            "PARTITION BY event_type ORDER BY value, event_id) AS BIGINT)"
            f" AS quartile FROM read_parquet('{d}/events.parquet')").df()
    key = ["event_type", "value", "event_id"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)],
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_q4_q12_shapes_match_oracle(oracle_smoke):
    from security_log_analysis_rust_ray.pipelines.relational import (
        line_priority_counts, order_priority_exists_counts)
    assert_matches_oracle(
        order_priority_exists_counts(SF_SMOKE), oracle_smoke,
        "SELECT o_orderpriority, count(*) AS n_orders FROM orders o"
        " WHERE EXISTS (SELECT 1 FROM lineitem l"
        "  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')"
        " GROUP BY o_orderpriority")
    assert_matches_oracle(
        line_priority_counts(SF_SMOKE), oracle_smoke,
        "SELECT l_returnflag,"
        " CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')"
        "  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,"
        " CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')"
        "  THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " GROUP BY l_returnflag")
