"""Targeted key purge over the clustered layout: planning touches only
zone-map candidates, non-candidate files stay byte-untouched, the purge
is exact and idempotent, and the audit trail records every rewrite."""
import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from .conftest import SF_SMOKE

PURGE_HOSTS = ["h7.example.com", "h23.example.com"]


def _mtimes(data_dir):
    return {f: os.stat(f).st_mtime_ns
            for f in glob.glob(os.path.join(data_dir, "*.parquet"))}


def _host_counts(data_dir, hosts):
    import pyarrow.compute as pc
    total = hit = 0
    for f in glob.glob(os.path.join(data_dir, "*.parquet")):
        t = pq.read_table(f, columns=["host"])
        total += t.num_rows
        hit += pc.sum(pc.is_in(t["host"],
                               value_set=__import__("pyarrow")
                               .array(hosts))).as_py() or 0
    return total, hit


@pytest.mark.usefixtures("ray_session")
def test_purge_exact_pruned_idempotent(tmp_path):
    from security_log_analysis_rust_ray.pipelines.clustered import \
        clustered_build
    from security_log_analysis_rust_ray.pipelines.purge import purge_keys

    idx = str(tmp_path / "clustered")
    clustered_build(SF_SMOKE, idx)
    data = os.path.join(idx, "data")
    before_total, before_hit = _host_counts(data, PURGE_HOSTS)
    assert before_hit > 0, "fixture must contain the purge hosts"
    m0 = _mtimes(data)
    audit = str(tmp_path / "audit.jsonl")

    tot = purge_keys(idx, PURGE_HOSTS, key_col="host", audit_path=audit)
    # exact: every target row gone, nothing else lost
    after_total, after_hit = _host_counts(data, PURGE_HOSTS)
    assert after_hit == 0
    assert tot["rows_purged"] == before_hit
    assert after_total == before_total - before_hit
    # pruned: the clustered sort means most files can't hold the hosts;
    # only candidates may be rewritten, and non-candidates are untouched
    assert tot["files_rewritten"] <= tot["files_candidates"] \
        <= tot["files_total"]
    m1 = _mtimes(data)
    untouched = [f for f in m0 if m1[f] == m0[f]]
    rewritten = [f for f in m0 if m1[f] != m0[f]]
    assert len(rewritten) == tot["files_rewritten"]
    if tot["files_total"] > tot["files_candidates"]:
        assert untouched, "zone-map pruning should spare some files"
    # manifest row count maintained
    with open(os.path.join(idx, "manifest.json")) as fh:
        assert json.load(fh)["rows"] == after_total
    # audit: one record per rewritten file + totals line
    lines = [json.loads(ln) for ln in open(audit)]
    assert sum(1 for r in lines if r.get("rewritten")) == len(rewritten)
    assert lines[-1]["totals"]["rows_purged"] == before_hit

    # idempotent: second purge rewrites nothing and touches no file
    tot2 = purge_keys(idx, PURGE_HOSTS, key_col="host")
    assert tot2["rows_purged"] == 0 and tot2["files_rewritten"] == 0
    assert _mtimes(data) == m1
