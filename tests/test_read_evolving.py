"""Schema-evolution reader: field-union widening, typed-null backfill,
column pruning, deterministic order, and type-drift refusal."""
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def shard_dir(tmp_path):
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64()),
                             "b": pa.array(["x", "y"])}),
                   str(tmp_path / "s1.parquet"))
    pq.write_table(pa.table({"a": pa.array([3], pa.int64()),
                             "c": pa.array([9.5], pa.float64())}),
                   str(tmp_path / "s2.parquet"))
    return tmp_path


@pytest.mark.usefixtures("ray_session")
def test_union_widen_and_backfill(shard_dir):
    from security_log_analysis_rust_ray.sources.readers import read_evolving

    ds = read_evolving([str(shard_dir / "s1.parquet"),
                        str(shard_dir / "s2.parquet")])
    df = ds.to_pandas().sort_values("a").reset_index(drop=True)
    assert list(df.columns) == ["a", "b", "c"]
    assert df["b"].tolist() == ["x", "y", None]
    assert df["c"].isna().tolist() == [True, True, False]
    # widened dtypes come from the shard that HAS the field
    sch = {f.name: f.type for f in ds.schema().base_schema}
    assert sch["c"] == pa.float64() and sch["b"] == pa.string()


@pytest.mark.usefixtures("ray_session")
def test_column_pruning_and_missing_column(shard_dir):
    from security_log_analysis_rust_ray.sources.readers import read_evolving

    paths = [str(shard_dir / "s1.parquet"), str(shard_dir / "s2.parquet")]
    df = read_evolving(paths, columns=["a", "c"]).to_pandas()
    assert sorted(df.columns) == ["a", "c"]
    with pytest.raises(ValueError, match="in no shard"):
        read_evolving(paths, columns=["nope"])


@pytest.mark.usefixtures("ray_session")
def test_type_drift_refused(shard_dir):
    from security_log_analysis_rust_ray.sources.readers import read_evolving

    pq.write_table(pa.table({"a": pa.array(["oops"])}),
                   str(shard_dir / "s3.parquet"))
    with pytest.raises(ValueError, match="changed type"):
        read_evolving([str(shard_dir / "s1.parquet"),
                       str(shard_dir / "s3.parquet")])
