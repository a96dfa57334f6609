"""Incrementally-maintained counts view: exactly-once tags, crash-safe
versions, final equals one-shot recompute."""
import json
import os

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_counts_view_incremental_equals_recompute(tmp_path):
    import ray.data as rd
    from security_log_analysis_rust_ray.stages.aggregate import grouped_count
    from security_log_analysis_rust_ray.state.agg_view import (
        read_counts_view, update_counts_view)

    d = str(tmp_path / "view")
    n1 = pa.table({"k": ["a", "b", "a", "c"]})
    n2 = pa.table({"k": ["b", "b", "d"]})

    v1 = update_counts_view(d, rd.from_arrow(n1), ["k"], tag="n1")
    got1 = v1.to_pandas().set_index("k")["cnt"].to_dict()
    assert got1 == {"a": 2, "b": 1, "c": 1}

    # re-applying the same tag is a NO-OP (exactly-once)
    again = update_counts_view(d, rd.from_arrow(n1), ["k"], tag="n1")
    assert again.to_pandas().set_index("k")["cnt"].to_dict() == got1

    v2 = update_counts_view(d, rd.from_arrow(n2), ["k"], tag="n2")
    got2 = v2.to_pandas().set_index("k")["cnt"].to_dict()
    want = grouped_count(
        rd.from_arrow(pa.concat_tables([n1, n2])), ["k"]) \
        .to_pandas().set_index("k")["cnt"].to_dict()
    assert got2 == want == {"a": 2, "b": 3, "c": 1, "d": 1}

    man = json.load(open(os.path.join(d, "MANIFEST.json")))
    assert man["applied"] == ["n1", "n2"] and man["version"] == 2
    # pruning keeps at most the two newest versions
    v3 = update_counts_view(d, rd.from_arrow(n1), ["k"], tag="n3")
    vers = sorted(x for x in os.listdir(d) if x.startswith("v")
                  and x[1:].isdigit())
    assert vers == ["v2", "v3"]
    assert read_counts_view(d).to_pandas().set_index("k")["cnt"]["a"] == 4
