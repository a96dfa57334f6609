"""interval_join (pipelines/relational.py): non-overlapping-interval range
join vs a pandas BETWEEN-join oracle; inner/left, null keys, misses."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from security_log_analysis_rust_ray.pipelines.relational import interval_join


def _mk(tmp_path):
    rng = np.random.RandomState(3)
    left = pd.DataFrame({
        "k": [None if i % 37 == 0 else i % 11 for i in range(800)],
        "ts": rng.randint(0, 1000, 800).astype("int64"),
        "lid": np.arange(800),
    })
    # non-overlapping windows per key: [0,99], [200,299], ... (gaps miss)
    rows = []
    for k in range(11):
        for w in range(5):
            rows.append({"k": k, "lo": w * 200, "hi": w * 200 + 99,
                         "label": f"w{k}-{w}"})
    right = pd.DataFrame(rows)
    ldir, rdir = tmp_path / "ij_l", tmp_path / "ij_r"
    ldir.mkdir(), rdir.mkdir()
    pq.write_table(pa.Table.from_pandas(left), str(ldir / "p.parquet"))
    pq.write_table(pa.Table.from_pandas(right), str(rdir / "p.parquet"))
    return str(ldir), str(rdir), left, right


def _expected(left, right, how):
    m = left.dropna(subset=["k"]).merge(right, on="k")
    m = m[(m["ts"] >= m["lo"]) & (m["ts"] <= m["hi"])]
    m = m[["k", "ts", "lid", "label"]]
    if how == "inner":
        return m
    missed = left[~left["lid"].isin(m["lid"])].assign(label=pd.NA)
    return pd.concat([m, missed[["k", "ts", "lid", "label"]]],
                     ignore_index=True)


def _canon(df):
    return df.sort_values(["lid"]).reset_index(drop=True)[
        ["k", "ts", "lid", "label"]]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("how", ["inner", "left"])
def test_interval_join_vs_between_oracle(tmp_path, how):
    import ray.data as rd
    ldir, rdir, left, right = _mk(tmp_path)
    got = interval_join(rd.read_parquet(ldir).repartition(5),
                        rd.read_parquet(rdir), key="k", left_ts="ts",
                        lo_col="lo", hi_col="hi",
                        right_payload=["label"], how=how).to_pandas()
    exp = _expected(left, right, how)
    pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                  check_dtype=False)
    if how == "left":
        # null-key left rows survive with null payload
        assert got[got["k"].isna()]["label"].isna().all()
        assert len(got) == len(left)
