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


@pytest.mark.usefixtures("ray_session")
def test_interval_join_nullable_int_key_blocks_agree():
    """A nullable int64 left key materializes as float64 in pandas blocks
    that contain a null and int64 in blocks that don't; without a
    null-stable key cast the hash exchange split equal keys across
    partitions and silently dropped matches (r03 review)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from security_log_analysis_rust_ray.pipelines.relational import interval_join

    b1 = pa.table({"k": pa.array([7, None], pa.int64()),
                   "ts": pa.array([5, 6], pa.int64()),
                   "ev": pa.array(["a", "b"])})
    b2 = pa.table({"k": pa.array([7], pa.int64()),
                   "ts": pa.array([15], pa.int64()),
                   "ev": pa.array(["c"])})
    left = rd.from_arrow([b1, b2])
    right = rd.from_arrow(pa.table({"k": pa.array([7], pa.int64()),
                                    "lo": pa.array([0], pa.int64()),
                                    "hi": pa.array([20], pa.int64()),
                                    "sid": pa.array([100], pa.int64())}))
    inner = interval_join(left, right, key="k", left_ts="ts", lo_col="lo",
                          hi_col="hi", right_payload=["sid"],
                          how="inner").to_pandas()
    assert sorted(inner["ev"]) == ["a", "c"]
    lj = interval_join(left, right, key="k", left_ts="ts", lo_col="lo",
                       hi_col="hi", right_payload=["sid"],
                       how="left").to_pandas()
    assert len(lj) == 3 and int(lj["sid"].notna().sum()) == 2
