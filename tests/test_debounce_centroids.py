"""Debounce (windowed dedup) and grouped vector-mean centroids vs their
DuckDB oracles, plus a hand-built debounce edge case."""
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .conftest import SF_SMOKE, assert_matches_oracle


@pytest.mark.usefixtures("ray_session")
def test_debounce_matches_oracle(oracle_smoke):
    import __ray_entry__ as mod
    from security_log_analysis_rust_ray.pipelines.streaming import \
        events_debounced
    assert_matches_oracle(events_debounced(SF_SMOKE), oracle_smoke,
                          mod.oracle_sql()["events_debounced"])


@pytest.mark.usefixtures("ray_session")
def test_debounce_lag_rule_not_kept_rule():
    """The gap measures to the previous RAW event: three events 40 min
    apart each -> #2 dropped (40m < 1h) but #3 ALSO dropped (40m to #2),
    even though #2 was dropped — SQL lag() semantics."""
    from security_log_analysis_rust_ray.pipelines.streaming import \
        events_debounced

    t0 = pd.Timestamp("2024-05-01")
    rows = [(1, t0), (2, t0 + pd.Timedelta(minutes=40)),
            (3, t0 + pd.Timedelta(minutes=80)),
            (4, t0 + pd.Timedelta(minutes=200))]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows]).cast(pa.timestamp("us")),
        "user_id": pa.array([1] * 4, pa.int64()),
        "event_type": pa.array(["click"] * 4),
        "value": pa.array([1.0] * 4, pa.float64()),
        "props": pa.array(["{}"] * 4),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = events_debounced(d).to_pandas()
    assert sorted(out["event_id"]) == [1, 4]


@pytest.mark.usefixtures("ray_session")
def test_label_centroids_match_oracle(oracle_smoke):
    import __ray_entry__ as mod
    from security_log_analysis_rust_ray.pipelines.ann import \
        embedding_label_centroids
    assert_matches_oracle(embedding_label_centroids(SF_SMOKE),
                          oracle_smoke,
                          mod.oracle_sql()["embedding_label_centroids"])
