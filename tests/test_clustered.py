"""Clustered sorted layout: zone-map row-group pruning + lookup parity."""
import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cl") / "clustered_host")


@pytest.mark.usefixtures("ray_session")
def test_clustered_lookup_matches_full_scan_and_prunes(index_dir):
    import pyarrow.compute as pc
    from security_log_analysis_rust_ray.pipelines import reports
    from security_log_analysis_rust_ray.pipelines.clustered import (
        _plan_row_groups, clustered_build, clustered_host_lookup)

    host = "h3.example.com"
    got = clustered_host_lookup(SF, host=host, index_dir=index_dir) \
        .to_pandas()
    want = reports.parsed(SF).map_batches(
        lambda b: b.filter(pc.equal(b["host"], host)),
        batch_format="pyarrow").to_pandas() \
        .sort_values(["ts", "conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert (got["conv_id"].values == want["conv_id"].values).all()
    assert (got["ts"].values == want["ts"].values).all()

    _, sel, tot = _plan_row_groups(index_dir, host)
    assert tot >= 4 and sel < tot  # zone map genuinely prunes
    # rebuild is a no-op (manifest present)
    files = []
    for root, _, names in os.walk(index_dir):
        files += [os.path.join(root, n) for n in names]
    mt = {f: os.path.getmtime(f) for f in files}
    clustered_build(SF, index_dir)
    assert {f: os.path.getmtime(f) for f in files} == mt


@pytest.mark.usefixtures("ray_session")
def test_clustered_lookup_missing_host_empty(index_dir):
    from security_log_analysis_rust_ray.pipelines.clustered import \
        clustered_host_lookup
    out = clustered_host_lookup(SF, host="zz.nope", index_dir=index_dir)
    assert out.count() == 0
