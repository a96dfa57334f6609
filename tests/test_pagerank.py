"""Distributed PageRank: iterative float accumulation -> no SQL oracle;
the contract is a dense numpy reference match plus the mass invariant."""

from __future__ import annotations

import numpy as np
import pytest

from security_log_analysis_rust_ray.pipelines import reports as R
from .conftest import SF_SMOKE

ITERS = 5


def _reference_pagerank(edges_df, iters, damping=0.85):
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
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        d_mass = r[dangling].sum()
        r = (1 - damping) / n + damping * (nw.T @ r) + damping * d_mass / n
    return dict(zip(nodes, r))


@pytest.mark.usefixtures("ray_session")
def test_host_pagerank_matches_dense_reference():
    edges = R.host_transition_edges(SF_SMOKE).to_pandas()
    assert len(edges) > 0
    ref = _reference_pagerank(edges, ITERS)
    got = R.host_pagerank(SF_SMOKE, iters=ITERS).to_pandas()
    assert len(got) == len(ref)
    assert abs(got["rank"].sum() - 1.0) < 1e-3     # mass invariant (rounded)
    for h, r in zip(got["host"], got["rank"]):
        assert abs(r - ref[h]) < 2e-6, h
    # determinism
    again = R.host_pagerank(SF_SMOKE, iters=ITERS).to_pandas()
    assert (got["rank"] == again["rank"]).all()


@pytest.mark.usefixtures("ray_session")
def test_pagerank_distributed_path_matches_one_task():
    # local_max_edges=0 forces the join-loop path; it must agree with the
    # one-task numpy path (the default at this size) to float tolerance
    import pyarrow as pa
    import ray.data as rd
    from security_log_analysis_rust_ray.stages.graph import pagerank

    e = rd.from_arrow(pa.table({
        "src": ["a", "a", "b", "c", "c", "d"],
        "dst": ["b", "c", "c", "a", "d", "a"],
        "w":   [2.0, 1.0, 1.0, 3.0, 1.0, 1.0],
    }))
    fast = pagerank(e, weight="w", iters=8).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    dist = pagerank(e, weight="w", iters=8, local_max_edges=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert list(fast["node"]) == list(dist["node"])
    assert abs(fast["rank"].sum() - 1.0) < 1e-9
    for f, d in zip(fast["rank"], dist["rank"]):
        assert abs(f - d) < 1e-9


@pytest.mark.usefixtures("ray_session")
def test_pagerank_empty_and_dangling():
    import pyarrow as pa
    import ray.data as rd
    from security_log_analysis_rust_ray.stages.graph import pagerank

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.string()),
                                    "dst": pa.array([], pa.string())}))
    assert pagerank(empty).count() == 0

    # b and c are dangling (no out-edges): their mass must recycle, so
    # ranks still sum to 1
    e = rd.from_arrow(pa.table({"src": ["a", "a"], "dst": ["b", "c"]}))
    out = pagerank(e, iters=10).to_pandas()
    assert set(out["node"]) == {"a", "b", "c"}
    assert abs(out["rank"].sum() - 1.0) < 1e-9
    # symmetric targets of the only source tie exactly
    r = dict(zip(out["node"], out["rank"]))
    assert r["b"] == r["c"]
