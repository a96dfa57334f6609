"""Estimate-vs-exact audits (pipelines/audits.py): every audit must come
back all-ok on the synthetic corpus — that is the exact condition the
DuckDB oracle hash asserts (exact values + TRUE), so a red here is a red
in the driver gate.  The underlying estimators keep their own
error-bound witnesses in the sketch/ANN test files."""

from __future__ import annotations

import pytest

from security_log_analysis_rust_ray.pipelines import audits as A
from .conftest import SF_SMOKE


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("fn", [
    A.rolling_wau_audit,
    A.daily_active_users_audit,
    A.distinct_terms_audit,
    A.service_host_overlap_audit,
    A.host_counts_cms_audit,
    A.join_size_probe_audit,
    A.doc_length_quantiles_audit,
    A.events_value_quantiles_audit,
    A.source_top_terms_audit,
], ids=lambda f: f.__name__)
def test_audit_all_ok(fn):
    df = fn(SF_SMOKE).to_pandas()
    assert len(df) > 0
    assert df["ok"].all(), df[~df["ok"]].head()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("fn", [
    A.ann_ivf_recall_audit,
    A.ann_pq_recall_audit,
    A.ann_index_recall_audit,
    A.ann_index_append_recall_audit,
], ids=lambda f: f.__name__)
def test_ann_recall_audits_ok(fn):
    df = fn(SF_SMOKE).to_pandas()
    assert len(df) == 1
    assert bool(df["ok"].iloc[0])
    assert int(df["n_queries"].iloc[0]) > 0
