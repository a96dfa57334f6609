"""Merge-on-read sorted scan: global order without a re-sort, and the
overlap-run planner on crafted boundary-overlapping files."""
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
KEY = ["host", "ts", "conv_id", "turn_idx"]


@pytest.mark.usefixtures("ray_session")
def test_sorted_scan_matches_full_sort(tmp_path):
    from security_log_analysis_rust_ray.pipelines import clustered as C
    from security_log_analysis_rust_ray.pipelines.reports import parsed
    idx = str(tmp_path / "idx")
    got = C.sorted_scan(SF, index_dir=idx).to_pandas()
    want = parsed(SF).to_pandas().sort_values(KEY).reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[sorted(got.columns)],
        want[sorted(want.columns)], check_dtype=False)
    # the stream really is in global key order, not just same content
    keys = got[KEY]
    assert not keys.ne(keys.sort_values(KEY)).any().any()


@pytest.mark.usefixtures("ray_session")
def test_overlap_runs_merge_and_stay_sorted(tmp_path):
    """Files with overlapping host ranges group into one run and come
    back sorted; disjoint files concatenate untouched."""
    from security_log_analysis_rust_ray.pipelines import clustered as C

    def mk(path, hosts):
        n = len(hosts)
        t = pa.table({
            "conv_id": pa.array([f"c{i}" for i in range(n)]),
            "turn_idx": pa.array(np.arange(n), pa.int32()),
            "service": pa.array(["ssh"] * n),
            "server": pa.array(["s0"] * n),
            "datetime": pa.array([0] * n, pa.timestamp("us")),
            "host": pa.array(hosts),
            "username": pa.array(["u"] * n),
            "ts": pa.array(np.arange(n), pa.timestamp("us")),
            "text": pa.array(["x"] * n),
        }).sort_by([("host", "ascending")])
        pq.write_table(t, path)

    idx = tmp_path / "idx"
    (idx / "data").mkdir(parents=True)
    mk(idx / "data" / "a.parquet", ["a1", "b1", "c9"])   # overlaps b at c*
    mk(idx / "data" / "b.parquet", ["c1", "d1", "e1"])
    mk(idx / "data" / "c.parquet", ["f1", "g1"])         # disjoint
    with open(idx / "manifest.json", "w") as fh:
        json.dump({"rows": 8, "sort_key": KEY, "row_group_rows": 2048}, fh)

    files = sorted(str(idx / "data" / f)
                   for f in os.listdir(idx / "data"))
    runs = C._plan_sorted_runs(files)
    assert [len(r) for r in runs] == [2, 1]

    got = C.sorted_scan(SF, index_dir=str(idx)).to_pandas()
    assert got["host"].tolist() == sorted(
        ["a1", "b1", "c9", "c1", "d1", "e1", "f1", "g1"])


@pytest.mark.usefixtures("ray_session")
def test_parse_rejects_account_for_every_turn():
    """Every transcript turn lands in EXACTLY one of: parsed (intrusion),
    messages, or the dead-letter stream — router + audit share kernels,
    so the three-way partition must be exact."""
    from security_log_analysis_rust_ray.pipelines import reports as R
    n_tr = R.transcripts(SF).count()
    n_parsed = R.parsed(SF).count()
    n_msg = R.messages(SF).count()
    rej = R.parse_rejects(SF).to_pandas()
    assert n_tr == n_parsed + n_msg + len(rej)
    assert set(rej["reason"]) <= {"negative_filter", "ssh_parse_fail",
                                  "no_level"}
    assert (rej["reason"] == "negative_filter").any()
    assert (rej["reason"] == "no_level").any()
    # no turn appears twice in the quarantine
    assert not rej.duplicated(["conv_id", "turn_idx"]).any()
