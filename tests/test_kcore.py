"""k-core peel vs a pure-Python reference (both size paths), plus the
supplier pipeline wiring and triangle-count parity after the shared
edge-extraction refactor."""
import random

import pyarrow as pa
import pytest

from .conftest import SF_SMOKE


def _py_kcore(edges, k):
    from collections import defaultdict
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        for n in list(alive):
            if len(adj[n] & alive) < k:
                alive.discard(n)
                changed = True
    return sorted(alive)


def _nodes(ds):
    df = ds.to_pandas()
    return sorted(df["node"]) if len(df) else []


@pytest.mark.usefixtures("ray_session")
def test_kcore_both_paths_match_reference():
    import ray.data as rd
    import security_log_analysis_rust_ray.stages.graph as G

    random.seed(7)
    edges = [(a, b) for a, b in
             {(random.randint(0, 60), random.randint(0, 60))
              for _ in range(150)} if a != b]
    t = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                  "b": pa.array([e[1] for e in edges], pa.int64())})
    for k in (2, 3, 5):
        want = _py_kcore(edges, k)
        got = _nodes(G.kcore(rd.from_arrow(t).repartition(4), k))
        assert got == want, f"one-task path k={k}"
        old = G.KCORE_LOCAL_MAX_EDGES
        G.KCORE_LOCAL_MAX_EDGES = 0
        try:
            got2 = _nodes(G.kcore(rd.from_arrow(t).repartition(4), k))
        finally:
            G.KCORE_LOCAL_MAX_EDGES = old
        assert got2 == want, f"distributed path k={k}"


@pytest.mark.usefixtures("ray_session")
def test_kcore_peel_depth_chain():
    """A path graph peels one endpoint layer per round — the worst case
    for round count; 2-core of any tree is empty."""
    import ray.data as rd
    from security_log_analysis_rust_ray.stages.graph import kcore

    n = 30
    t = pa.table({"a": pa.array(list(range(n - 1)), pa.int64()),
                  "b": pa.array(list(range(1, n)), pa.int64())})
    assert _nodes(kcore(rd.from_arrow(t).repartition(3), 2)) == []
    # every interior chain node holds degree >= 1
    assert len(_nodes(kcore(rd.from_arrow(t).repartition(3), 1))) == n


@pytest.mark.usefixtures("ray_session")
def test_supplier_kcore_subset_of_graph(oracle_smoke):
    """Pipeline wiring: the k-core node set must match the pure-Python
    peel of the SAME edge set the oracle derives from lineitem."""
    from security_log_analysis_rust_ray.pipelines.relational import \
        supplier_kcore

    edges = oracle_smoke.execute(
        "WITH so AS (SELECT DISTINCT l_orderkey o, l_suppkey s"
        " FROM lineitem)"
        " SELECT DISTINCT least(a.s, b.s) x, greatest(a.s, b.s) y"
        " FROM so a JOIN so b ON a.o = b.o AND a.s < b.s").fetchall()
    want = _py_kcore(edges, 3)
    got = _nodes(supplier_kcore(SF_SMOKE, k=3))
    assert got == want
