"""RANGE-frame rolling 7-day sum (incl. tie semantics) and the per-doc
filter audit trail vs their DuckDB oracles."""
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .conftest import SF_SMOKE, assert_matches_oracle


@pytest.mark.usefixtures("ray_session")
def test_rolling_7d_matches_oracle(oracle_smoke):
    import __ray_entry__ as mod
    from security_log_analysis_rust_ray.pipelines.relational import \
        user_rolling_value_7d
    assert_matches_oracle(user_rolling_value_7d(SF_SMOKE), oracle_smoke,
                          mod.oracle_sql()["user_rolling_value_7d"])


@pytest.mark.usefixtures("ray_session")
def test_rolling_range_frame_tie_semantics():
    """Equal-ts peers AFTER the current row are INSIDE a RANGE frame —
    the side='right' upper bound must reproduce that."""
    import duckdb
    from security_log_analysis_rust_ray.pipelines.relational import \
        user_rolling_value_7d

    ts0 = pd.Timestamp("2024-03-01")
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([ts0, ts0, ts0 + pd.Timedelta(days=3),
                        ts0 + pd.Timedelta(days=20)]).cast(
            pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "event_type": pa.array(["e"] * 4),
        "value": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
        "props": pa.array(["{}"] * 4),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = user_rolling_value_7d(d).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
    # rows 1 and 2 share a ts: both frames include BOTH tied values
    assert got["rolling_7d"].tolist() == [3.0, 3.0, 7.0, 8.0]


@pytest.mark.usefixtures("ray_session")
def test_filter_audit_matches_oracle(oracle_smoke):
    import __ray_entry__ as mod
    from security_log_analysis_rust_ray.pipelines.docs import \
        doc_filter_audit
    assert_matches_oracle(doc_filter_audit(SF_SMOKE), oracle_smoke,
                          mod.oracle_sql()["doc_filter_audit"])


@pytest.mark.usefixtures("ray_session")
def test_filter_audit_consistent_with_standalone_filters():
    """'pass' docs in the audit == docs surviving every standalone gate."""
    from security_log_analysis_rust_ray.pipelines.docs import (
        doc_blocklist_filter, doc_filter_audit, doc_gopher_filter)

    audit = doc_filter_audit(SF_SMOKE).to_pandas()
    passing = set(audit.loc[audit["verdict"] == "pass", "doc_id"])
    gop = set(doc_gopher_filter(SF_SMOKE).to_pandas()["doc_id"])
    blk = set(doc_blocklist_filter(SF_SMOKE).to_pandas()["doc_id"])
    assert passing <= gop and passing <= blk
    # nothing labeled 'gopher' survives the gopher gate
    gophered = set(audit.loc[audit["verdict"] == "gopher", "doc_id"])
    assert not (gophered & gop)
