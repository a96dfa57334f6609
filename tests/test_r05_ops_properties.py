"""Reference-based property tests for the r05 operators: random inputs
checked against independent pure-Python/pandas/numpy references — the
belt to the sweep's oracle suspenders (the oracle checks THE corpus;
these check the kernels' semantics across many shapes)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from .conftest import SF_SMOKE


def _ref_bfs(edges, seeds):
    """Plain dict/set BFS — the independent reference."""
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_bfs_random_digraphs_match_reference(seed):
    from security_log_analysis_rust_ray.stages.graph import bfs_layers
    rng = np.random.default_rng(seed)
    n_nodes = int(rng.integers(5, 40))
    n_edges = int(rng.integers(1, 4 * n_nodes))
    names = [f"n{i}" for i in range(n_nodes)]
    e = [(names[int(a)], names[int(b)])
         for a, b in rng.integers(0, n_nodes, size=(n_edges, 2))
         if a != b]
    if not e:
        e = [(names[0], names[1 % n_nodes])]
    seeds = sorted({names[int(i)] for i in
                    rng.integers(0, n_nodes, size=max(1, n_nodes // 5))})
    ref = _ref_bfs(e, seeds)
    edges_ds = rd.from_arrow(pa.table({
        "src": [a for a, _ in e], "dst": [b for _, b in e]}))
    seeds_ds = rd.from_arrow(pa.table({"node": seeds}))
    for kw in ({}, {"local_max_edges": 0}):
        got = bfs_layers(edges_ds, seeds_ds, **kw).to_pandas()
        assert dict(zip(got["node"], got["dist"])) == ref, (seed, kw)


@pytest.mark.usefixtures("ray_session")
def test_user_percent_rank_matches_pandas():
    from security_log_analysis_rust_ray.pipelines.relational import (
        user_value_percent_rank)
    got = user_value_percent_rank(SF_SMOKE).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet",
                         columns=["event_id", "user_id", "value"]) \
        .sort_values("event_id").reset_index(drop=True)
    g = ev.groupby("user_id")["value"]
    rank = g.rank(method="min") - 1
    n = g.transform("size")
    ref = (rank / (n - 1).clip(lower=1)).round(6)
    assert len(got) == len(ev)
    assert np.allclose(got["pct_rank"].to_numpy(), ref.to_numpy(),
                       atol=1e-9)
    # per-user max is 1 whenever the user has >1 distinct value
    m = got.groupby("user_id")["pct_rank"].max()
    multi = ev.groupby("user_id")["value"].nunique() > 1
    assert (m[multi.reindex(m.index, fill_value=False)] == 1.0).all()


@pytest.mark.usefixtures("ray_session")
def test_quantile_cont_matches_numpy_linear():
    from security_log_analysis_rust_ray.pipelines.relational import (
        CONT_QS, events_value_quartiles_cont_by_type)
    got = events_value_quartiles_cont_by_type(SF_SMOKE).to_pandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet",
                         columns=["event_type", "value"])
    for (t, q), v in got.set_index(["event_type", "q"])[
            "value_cont"].items():
        ref = float(np.quantile(
            ev.loc[ev["event_type"] == t, "value"].to_numpy(), q,
            method="linear"))
        assert abs(v - round(ref, 6)) <= 1e-6, (t, q)
    assert len(got) == ev["event_type"].nunique() * len(CONT_QS)


@pytest.mark.usefixtures("ray_session")
def test_scene_changes_match_frame_recompute():
    from security_log_analysis_rust_ray.pipelines.media import (
        SCENE_DELTA_PER_PX, Y4M_H, Y4M_W, media_frames,
        media_scene_changes)
    frames = media_frames(SF_SMOKE).to_pandas() \
        .sort_values(["doc_id", "frame_idx"])
    thresh = SCENE_DELTA_PER_PX * Y4M_W * Y4M_H
    exp = []
    for doc, g in frames.groupby("doc_id"):
        ls = g["luma_sum"].to_numpy()
        for i in range(1, len(ls)):
            d = abs(int(ls[i]) - int(ls[i - 1]))
            if d > thresh:
                exp.append((doc, int(g["frame_idx"].iloc[i]), d))
    got = media_scene_changes(SF_SMOKE).to_pandas()
    got_set = set(zip(got["doc_id"], got["frame_idx"], got["delta"]))
    assert got_set == set(exp)
    assert len(got) == len(exp)
