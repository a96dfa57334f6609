"""Regression tests for the r04 ADVICE findings fixed in r05:

1. ``grouped_distinct_registers`` must keep the key column's real dtype in
   its empty-partition guard (an int64 ``day`` key + a forced-empty
   repartition block used to concat-fail on a string/int schema mismatch).
2. ``pagerank(restart=...)`` must renormalize teleport mass over the nodes
   actually present in the graph — restart keys absent from the edge set
   previously bled mass and ranks no longer summed to 1 (both the one-task
   and distributed paths).
3. ``fk_integrity_audit``'s fused edge<<48|key encoding must reject keys
   outside [0, 2^48) loudly instead of silently aliasing across edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


@pytest.mark.usefixtures("ray_session")
def test_grouped_registers_int_key_with_empty_partition():
    from security_log_analysis_rust_ray.stages.sketch import (
        grouped_distinct_registers, hll_estimate)
    # 2 int64-keyed groups, 3 rows -> repartition(4) inside the fold
    # leaves at least one empty block whose guard must emit int64 keys
    t = pa.table({"day": pa.array([7, 7, 9], pa.int64()),
                  "uid": pa.array([1, 2, 1], pa.int64())})
    regs = grouped_distinct_registers(rd.from_arrow(t), ["day"], "uid")
    assert regs.num_rows == 2
    assert regs.schema.field("day").type == pa.int64()
    est = {int(d.as_py()): hll_estimate(
        np.frombuffer(r.as_py(), dtype=np.uint8))
        for d, r in zip(regs["day"], regs["reg"])}
    # tiny cardinalities are exact under HLL's linear-counting regime
    assert round(est[7]) == 2 and round(est[9]) == 1


@pytest.mark.usefixtures("ray_session")
def test_pagerank_restart_renormalizes_missing_keys():
    from security_log_analysis_rust_ray.stages.graph import pagerank
    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "a"],
        "dst": ["b", "c", "a", "c"],
    }))
    # half the teleport mass targets a key absent from the graph; a
    # correct implementation renormalizes over {a,b,c} so rank mass
    # stays 1, for BOTH the one-task and distributed paths
    restart = {"a": 0.5, "zz-not-in-graph": 0.5}
    for forced in (None, 0):
        kw = {} if forced is None else {"local_max_edges": forced}
        got = pagerank(edges, iters=10, restart=restart, **kw).to_pandas()
        assert abs(got["rank"].sum() - 1.0) < 1e-9, kw
        # renormalized teleport == restart={"a": 1.0}
        ref = pagerank(edges, iters=10, restart={"a": 1.0}, **kw) \
            .to_pandas().set_index("node")["rank"]
        for n, r in zip(got["node"], got["rank"]):
            assert abs(r - ref[n]) < 1e-12
    with pytest.raises(Exception):
        pagerank(edges, iters=2, restart={"zz": 1.0}).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_fk_audit_rejects_out_of_contract_keys(tmp_path):
    import pyarrow.parquet as pq
    from security_log_analysis_rust_ray.pipelines.relational import (
        fk_integrity_audit)
    # minimal warehouse where one child key is negative -> must raise,
    # not alias into a neighboring edge's keyspace
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({"r_regionkey": pa.array([0], pa.int64()),
                             "r_name": ["r"]}), sf / "region.parquet")
    pq.write_table(pa.table({"n_nationkey": pa.array([0], pa.int64()),
                             "n_regionkey": pa.array([0], pa.int64()),
                             "n_name": ["n"]}), sf / "nation.parquet")
    pq.write_table(pa.table({"c_custkey": pa.array([1], pa.int64()),
                             "c_nationkey": pa.array([-5], pa.int64())}),
                   sf / "customer.parquet")
    pq.write_table(pa.table({"s_suppkey": pa.array([1], pa.int64()),
                             "s_nationkey": pa.array([0], pa.int64())}),
                   sf / "supplier.parquet")
    pq.write_table(pa.table({"p_partkey": pa.array([1], pa.int64())}),
                   sf / "part.parquet")
    pq.write_table(pa.table({"o_orderkey": pa.array([1], pa.int64()),
                             "o_custkey": pa.array([1], pa.int64())}),
                   sf / "orders.parquet")
    pq.write_table(pa.table({"l_orderkey": pa.array([1], pa.int64()),
                             "l_partkey": pa.array([1], pa.int64()),
                             "l_suppkey": pa.array([1], pa.int64())}),
                   sf / "lineitem.parquet")
    with pytest.raises(Exception, match="alias|2\\^48|outside"):
        fk_integrity_audit(str(sf)).to_pandas()
