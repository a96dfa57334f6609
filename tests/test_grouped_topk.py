"""grouped_top_k (stages/aggregate.py): exact ROW_NUMBER()-style per-group
head across blocks, deterministic ties, null keys, k larger than group."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from security_log_analysis_rust_ray.stages.aggregate import grouped_top_k


def _expected(df, group, order, k, tie):
    ranked = df.sort_values([group, order, tie],
                            ascending=[True, False, True])
    return ranked.groupby(group, dropna=False).head(k)


def _roundtrip(tmp_path, df, **kw):
    import ray.data as rd
    p = tmp_path / "gtk"
    p.mkdir(exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df), str(p / "x.parquet"))
    # force many small blocks so the partial/final split is exercised
    ds = rd.read_parquet(str(p)).repartition(7)
    return grouped_top_k(ds, **kw).to_pandas()


def _canon(df, cols):
    return df.sort_values(cols).reset_index(drop=True)[cols]


@pytest.mark.usefixtures("ray_session")
def test_grouped_top_k_matches_row_number(tmp_path):
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "g": [f"g{i % 13}" for i in range(4000)],
        "score": rng.randint(0, 50, 4000),
        "id": np.arange(4000),
    })
    got = _roundtrip(tmp_path, df, group_cols=["g"], order_col="score",
                     k=5, tie_cols=["id"])
    exp = _expected(df, "g", "score", 5, "id")
    cols = ["g", "score", "id"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_grouped_top_k_null_group_and_small_groups(tmp_path):
    df = pd.DataFrame({
        "g": ["a", "a", "a", None, None, "b"],
        "score": [3, 1, 2, 9, 8, 5],
        "id": [0, 1, 2, 3, 4, 5],
    })
    got = _roundtrip(tmp_path, df, group_cols=["g"], order_col="score",
                     k=2, tie_cols=["id"])
    exp = _expected(df, "g", "score", 2, "id")
    cols = ["g", "score", "id"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)
    # null group keys grouped TOGETHER (SQL GROUP BY), k=2 keeps both
    assert got["g"].isna().sum() == 2


@pytest.mark.usefixtures("ray_session")
def test_grouped_top_k_composite_group(tmp_path):
    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "g1": [f"x{i % 4}" for i in range(1000)],
        "g2": rng.randint(0, 3, 1000),
        "score": rng.randint(0, 100, 1000),
        "id": np.arange(1000),
    })
    got = _roundtrip(tmp_path, df, group_cols=["g1", "g2"],
                     order_col="score", k=3, tie_cols=["id"])
    exp = df.sort_values(["g1", "g2", "score", "id"],
                         ascending=[True, True, False, True]) \
            .groupby(["g1", "g2"]).head(3)
    cols = ["g1", "g2", "score", "id"]
    pd.testing.assert_frame_equal(_canon(got, cols), _canon(exp, cols),
                                  check_dtype=False)
