"""Mergeable quantile-grid sketch (stages/sketch.py): rank-error bound vs
exact quantiles, mergeability, determinism, and the docs pipeline entry
agreeing with the exact histogram path."""

from __future__ import annotations

import numpy as np
import pytest

from security_log_analysis_rust_ray.stages.sketch import (
    QS_GRID, quantile_merge, quantile_partial)


def _rank_error(vals, q, est):
    """|rank(est) - q| in normalized rank space."""
    vals = np.sort(vals)
    rank = np.searchsorted(vals, est, side="right") / len(vals)
    return abs(rank - q)


def test_partial_then_merge_rank_error_bounded():
    rng = np.random.default_rng(11)
    # heavy-tailed: the regime the exact bounded-domain plan can't handle
    vals = np.exp(rng.normal(0, 2, 200_000))
    blocks = np.array_split(vals, 37)
    grids = np.stack([quantile_partial(b) for b in blocks])
    counts = np.array([len(b) for b in blocks], dtype=np.float64)
    qs = np.array([0.01, 0.25, 0.5, 0.9, 0.99])
    est = quantile_merge(grids, counts, qs)
    for q, e in zip(qs, est):
        assert _rank_error(vals, q, e) < 0.01, (q, e)


def test_mergeability_two_level():
    rng = np.random.default_rng(5)
    vals = rng.normal(100, 15, 100_000)
    a, b = vals[:60_000], vals[60_000:]
    one = quantile_merge(np.stack([quantile_partial(vals)]),
                         np.array([len(vals)], dtype=np.float64),
                         np.array([0.5]))
    two = quantile_merge(
        np.stack([quantile_partial(a), quantile_partial(b)]),
        np.array([len(a), len(b)], dtype=np.float64), np.array([0.5]))
    assert abs(one[0] - two[0]) < 0.5  # both within a sliver of the median


def test_determinism_and_empty_and_nan():
    vals = np.arange(1000, dtype=np.float64)
    assert (quantile_partial(vals) == quantile_partial(vals)).all()
    assert np.isnan(quantile_partial(np.array([]))).all()
    withnan = np.concatenate([vals, [np.nan] * 50])
    assert np.allclose(quantile_partial(withnan), quantile_partial(vals))
    est = quantile_merge(np.stack([np.full(QS_GRID, np.nan)]),
                         np.array([0.0]), np.array([0.5]))
    assert np.isnan(est).all()


@pytest.mark.usefixtures("ray_session")
def test_docs_approx_vs_exact_quantiles():
    from security_log_analysis_rust_ray.pipelines import docs as D
    sf = "/root/testdata/sf0.001"
    exact = D.doc_length_quantiles(sf).to_pandas().set_index("q")["n_tokens"]
    approx = D.doc_length_quantiles_approx(sf).to_pandas() \
        .set_index("q")["n_tokens_approx"]
    for q in (0.25, 0.5, 0.9, 0.99):
        # token counts are small ints; allow the interpolation to land
        # within a few tokens of the exact discrete quantile
        assert abs(approx[q] - exact[q]) <= max(2, 0.05 * exact[q]), q


@pytest.mark.usefixtures("ray_session")
def test_count_min_one_sided_and_bounded():
    """CMS contract vs exact counts: every estimate >= the true count
    (one-sided error), total overshoot within the eps*N guarantee, and the
    sketch is add-mergeable (two half-sketches sum to the full one)."""
    import numpy as np
    import pyarrow as pa

    from security_log_analysis_rust_ray.pipelines.relational import \
        host_counts_cms
    from security_log_analysis_rust_ray.pipelines.reports import parsed
    from security_log_analysis_rust_ray.stages.sketch import (
        CMS_W, cms_partial, cms_query)
    from .conftest import SF_SMOKE

    est = host_counts_cms(SF_SMOKE).to_pandas().set_index("host")["est_cnt"]
    exact = parsed(SF_SMOKE).to_pandas()["host"].value_counts()
    assert sorted(est.index) == sorted(exact.index)
    exact = exact.reindex(est.index)
    assert (est >= exact).all()
    n = int(exact.sum())
    eps = np.e / CMS_W
    assert ((est - exact) <= max(1, int(eps * n))).all()

    # mergeability: partial(a) + partial(b) == partial(a ++ b)
    keys = pa.array([f"k{i % 17}" for i in range(1000)])
    full = cms_partial(keys)
    half = cms_partial(keys.slice(0, 500)) + cms_partial(keys.slice(500))
    assert (full == half).all()
    probe = pa.array([f"k{i}" for i in range(17)])
    assert (cms_query(full, probe) == cms_query(half, probe)).all()


@pytest.mark.usefixtures("ray_session")
def test_grouped_approx_quantiles_rank_error_bounded():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from security_log_analysis_rust_ray.stages.sketch import \
        grouped_approx_quantiles

    rng = np.random.RandomState(7)
    n = 20000
    grp = np.where(rng.rand(n) < 0.7, "a", "b")
    # different shapes per group: lognormal vs uniform
    vals = np.where(grp == "a", rng.lognormal(0, 1, n), rng.rand(n) * 50)
    ds = rd.from_arrow(pa.table({"g": grp, "v": vals})).repartition(16)
    qs = [0.5, 0.9, 0.99]
    got = grouped_approx_quantiles(ds, ["g"], "v", qs).to_pandas()
    assert len(got) == 6
    for g in ("a", "b"):
        sub = np.sort(vals[grp == g])
        for q in qs:
            est = float(got[(got["g"] == g) & (got["q"] == q)]
                        ["value_approx"].iloc[0])
            # rank of the estimate within the true distribution
            rank = np.searchsorted(sub, est) / len(sub)
            assert abs(rank - q) < 0.02, (g, q, rank)


@pytest.mark.usefixtures("ray_session")
def test_grouped_approx_distinct_error_bounded():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from security_log_analysis_rust_ray.stages.sketch import \
        grouped_approx_distinct

    rng = np.random.RandomState(11)
    n = 30000
    grp = np.where(rng.rand(n) < 0.5, "d1", "d2")
    # d1 ~5k distinct of 15k rows, d2 ~500 distinct
    vals = np.where(grp == "d1", rng.randint(0, 5000, n),
                    rng.randint(0, 500, n))
    ds = rd.from_arrow(pa.table({"g": grp, "v": vals.astype("int64")})) \
        .repartition(12)
    got = grouped_approx_distinct(ds, ["g"], "v").to_pandas() \
        .set_index("g")["approx_distinct"]
    for g in ("d1", "d2"):
        exact = len(np.unique(vals[grp == g]))
        assert abs(got[g] - exact) / exact < 0.05, (g, got[g], exact)
