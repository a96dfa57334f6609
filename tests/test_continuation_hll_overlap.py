"""Kneser-Ney continuation counts vs the DuckDB oracle, and HLL set
algebra (union exactness bound + inclusion-exclusion intersection)."""
import numpy as np
import pyarrow as pa
import pytest

from .conftest import SF_SMOKE, assert_matches_oracle


@pytest.mark.usefixtures("ray_session")
def test_continuation_counts_match_oracle(oracle_smoke):
    import __ray_entry__ as mod
    from security_log_analysis_rust_ray.pipelines.docs import \
        corpus_continuation_counts
    assert_matches_oracle(
        corpus_continuation_counts(SF_SMOKE), oracle_smoke,
        mod.oracle_sql()["corpus_continuation_counts"])


@pytest.mark.usefixtures("ray_session")
def test_hll_union_and_intersection_bounds():
    """Union estimate within the standard HLL error; intersection by
    inclusion-exclusion within a small fraction of the UNION size (its
    error scales with the union, not the intersection)."""
    import ray.data as rd
    from security_log_analysis_rust_ray.stages.sketch import (
        approx_distinct_registers, hll_estimate, hll_intersection_estimate)

    a_keys = [f"k{i}" for i in range(4000)]
    b_keys = [f"k{i}" for i in range(3000, 9000)]  # overlap = 1000
    a = rd.from_arrow(pa.table({"k": pa.array(a_keys)})).repartition(4)
    b = rd.from_arrow(pa.table({"k": pa.array(b_keys)})).repartition(4)
    ra = approx_distinct_registers(a, "k")
    rb = approx_distinct_registers(b, "k")

    union_est = hll_estimate(np.maximum(ra, rb))
    assert abs(union_est - 9000) / 9000 < 0.05
    inter_est = hll_intersection_estimate(ra, rb)
    assert abs(inter_est - 1000) <= 0.05 * 9000


@pytest.mark.usefixtures("ray_session")
def test_service_host_overlap_approx_close_to_exact():
    from security_log_analysis_rust_ray.pipelines.reports import (
        service_host_overlap, service_host_overlap_approx)

    approx = service_host_overlap_approx(SF_SMOKE).to_pandas().iloc[0]
    exact = len(service_host_overlap(SF_SMOKE).to_pandas())
    union_bound = approx["n_even_est"] + approx["n_odd_est"]
    assert abs(approx["n_overlap_est"] - exact) <= max(
        0.05 * union_bound, 10)
