"""Distributed connected components (min-label propagation) — the custom
graph operator under near-duplicate CLUSTERING (pipelines/docs.dup_clusters).

Ray Data has no graph ops; this is the batch re-statement of hash-to-min
label propagation as dataset primitives only (VERDICT r01 #2 prescribed
exactly this, replacing a per-edge Python loop over a driver-materialized
pair graph):

  state   = (node, label) rows, label initialised to the node id
  round   = neighbor-min:  join edges with labels on dst -> per-src min
            pointer-jump:  label <- label(label)  (halves chain lengths, so
            convergence is O(log diameter) rounds, not O(diameter))
  stop    = a round changes zero labels (an anti-join count, not a collect)

Everything per round is a hash join / groupby-min / count over (node,label)
rows — the driver orchestrates rounds but never materializes edges or
labels.  Partitioning assumption: labels and edge endpoints hash-partition
on the node id; a hot node (one doc near-duplicated everywhere) bounds at
one (node, label) row after the per-round groupby-min, so skew dies in the
combiner exactly like a hot aggregation key.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min


def _rename(ds: rd.Dataset, names: list[str]) -> rd.Dataset:
    return ds.map_batches(lambda t, n=tuple(names): t.rename_columns(list(n)),
                          batch_format="pyarrow", batch_size=None)


def connected_components(edges: rd.Dataset, src: str = "a", dst: str = "b",
                         nparts: int = 8, max_rounds: int = 50) -> rd.Dataset:
    """(node, cluster) for every node appearing in ``edges``; cluster = min
    node id of the connected component.  ``edges`` needs int64 src/dst."""
    both = edges.map_batches(
        lambda t: pa.table({"x": t[src].cast(pa.int64()),
                            "y": t[dst].cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None).union(
        edges.map_batches(
            lambda t: pa.table({"x": t[dst].cast(pa.int64()),
                                "y": t[src].cast(pa.int64())}),
            batch_format="pyarrow", batch_size=None)).materialize()

    labels = both.groupby("x").aggregate(Min("y", alias_name="_min")) \
        .map_batches(lambda t: pa.table({"node": t["x"], "label": t["x"]}),
                     batch_format="pyarrow", batch_size=None).materialize()
    if labels.count() == 0:
        return labels

    for _ in range(max_rounds):
        # neighbor-min: every dst's label flows to its src
        nbr = both.join(labels, "inner", nparts,
                        on=("y",), right_on=("node",))
        nbr = nbr.map_batches(
            lambda t: pa.table({"node": t["x"], "label": t["label"]}),
            batch_format="pyarrow", batch_size=None)
        new = nbr.union(labels).groupby("node") \
            .aggregate(Min("label", alias_name="label")).materialize()
        # pointer jump: label <- label(label) (labels are node ids, so the
        # lookup is a self-join; every label exists as a node by induction;
        # materialized first so the self-join doesn't re-execute the plan)
        new = new.join(_rename(new, ["jnode", "jlabel"]), "inner", nparts,
                       on=("label",), right_on=("jnode",))
        new = new.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["jlabel"]}),
            batch_format="pyarrow", batch_size=None).materialize()
        changed = new.join(_rename(labels, ["node", "old"]), "inner", nparts,
                           on=("node",), right_on=("node",))
        n_changed = changed.map_batches(
            lambda t: t.filter(pa.compute.not_equal(t["label"], t["old"])),
            batch_format="pyarrow", batch_size=None).count()
        labels = new
        if n_changed == 0:
            break
    return labels
