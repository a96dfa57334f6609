"""Batched Levenshtein kernel vs a pure-Python DP, edit-distance fuzzy
pairs vs the DuckDB levenshtein oracle, and the CDC snapshot merge
(including the tombstone-is-latest subtlety)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from .conftest import SF_SMOKE, assert_matches_oracle


def _py_lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[n]


def test_levenshtein_kernel_exact():
    import random
    from security_log_analysis_rust_ray.functions.editdist import \
        levenshtein_pairs

    random.seed(3)
    alph = "abcde "
    cases = [("".join(random.choice(alph) for _ in range(random.randint(0, 25))),
              "".join(random.choice(alph) for _ in range(random.randint(0, 25))))
             for _ in range(200)]
    cases += [("", ""), ("abc", ""), ("", "xyz"), ("same", "same"),
              ("kitten", "sitting"), ("日本語", "日本誤")]
    got = levenshtein_pairs([c[0] for c in cases], [c[1] for c in cases])
    want = np.array([_py_lev(a, b) for a, b in cases])
    assert (got == want).all()


@pytest.mark.usefixtures("ray_session")
def test_edit_similar_pairs_match_oracle(oracle_smoke):
    import __ray_entry__ as mod
    from security_log_analysis_rust_ray.pipelines.docs import \
        doc_edit_similar_pairs
    assert_matches_oracle(doc_edit_similar_pairs(SF_SMOKE), oracle_smoke,
                          mod.oracle_sql()["doc_edit_similar_pairs"])


@pytest.mark.usefixtures("ray_session")
def test_cdc_snapshot_matches_oracle(oracle_smoke):
    import __ray_entry__ as mod
    from security_log_analysis_rust_ray.pipelines.streaming import \
        events_cdc_snapshot
    assert_matches_oracle(events_cdc_snapshot(SF_SMOKE), oracle_smoke,
                          mod.oracle_sql()["events_cdc_snapshot"])


@pytest.mark.usefixtures("ray_session")
def test_cdc_tombstone_is_latest_wins():
    """A key whose LATEST op is a delete must vanish even when earlier
    upserts exist in other blocks — the combiner must carry tombstones."""
    import ray.data as rd
    from security_log_analysis_rust_ray.pipelines import streaming as S

    # user 1: upsert(seq 1), delete(seq 13)  -> gone
    # user 2: delete(seq 26), upsert(seq 27) -> survives with value 7.0
    t = pa.table({
        "event_id": pa.array([1, 13, 26, 27], pa.int64()),
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "value": pa.array([5.0, 0.0, 0.0, 7.0], pa.float64()),
    })
    import os
    import tempfile

    import pyarrow.parquet as pq
    with tempfile.TemporaryDirectory() as d:
        full = pa.table({
            "event_id": t["event_id"],
            "ts": pa.array([pd.Timestamp("2024-01-01")] * 4).cast(
                pa.timestamp("us")),
            "user_id": t["user_id"],
            "event_type": pa.array(["e"] * 4),
            "value": t["value"],
            "props": pa.array(["{}"] * 4),
        })
        pq.write_table(full, os.path.join(d, "events.parquet"))
        out = S.events_cdc_snapshot(d).to_pandas()
    assert list(out["user_id"]) == [2]
    assert list(out["value"]) == [7.0]
    assert list(out["last_seq"]) == [27]
