"""Multi-source BFS layers (stages/graph.bfs_layers): the one-task and
distributed paths must agree with each other and with a hand-checkable
reference; seeds absent from the edge set still report dist 0; the
pipeline query matches its recursive-CTE oracle via the sweep."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from security_log_analysis_rust_ray.stages.graph import bfs_layers
from .conftest import SF_SMOKE


def _toy():
    #   a -> b -> c -> d        z (isolated seed)
    #   e -> b   (joins the b layer from a second seed)
    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "e"],
        "dst": ["b", "c", "d", "b"],
    }))
    seeds = rd.from_arrow(pa.table({"node": ["a", "z"]}))
    return edges, seeds


EXPECT = {"a": 0, "z": 0, "b": 1, "c": 2, "d": 3}


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("forced", [None, 0], ids=["one-task", "distributed"])
def test_bfs_layers_toy(forced):
    edges, seeds = _toy()
    kw = {} if forced is None else {"local_max_edges": forced}
    got = bfs_layers(edges, seeds, **kw).to_pandas()
    assert dict(zip(got["node"], got["dist"])) == EXPECT
    # 'e' has no inbound path from a seed -> omitted, not dist 0


@pytest.mark.usefixtures("ray_session")
def test_bfs_paths_agree_on_real_graph():
    from security_log_analysis_rust_ray.pipelines.reports import (
        _seed_host_rows, host_transition_edges)
    from security_log_analysis_rust_ray.stages.dedup import distinct_rows
    edges = host_transition_edges(SF_SMOKE).materialize()
    nodes = distinct_rows(
        edges.map_batches(lambda t: pa.table({"node": t["src"]}),
                          batch_format="pyarrow", batch_size=None).union(
            edges.map_batches(lambda t: pa.table({"node": t["dst"]}),
                              batch_format="pyarrow", batch_size=None)),
        ["node"])
    seeds = nodes.map_batches(_seed_host_rows, batch_format="pyarrow",
                              batch_size=None)
    one = bfs_layers(edges, seeds).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    dist = bfs_layers(edges, seeds, local_max_edges=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert len(one) > 0
    assert one.equals(dist)
    assert (one.loc[one["dist"] == 0, "node"].str
            .extract(r"^h(\d+)\.")[0].astype(int) % 10 == 0).all()
