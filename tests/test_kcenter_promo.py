"""Greedy k-center coreset vs a dense numpy reference, plus the Q14-shape
promo revenue share vs its oracle."""
import numpy as np
import pyarrow.parquet as pq
import pytest

from .conftest import SF_SMOKE, assert_matches_oracle


@pytest.mark.usefixtures("ray_session")
def test_kcenter_matches_dense_reference():
    from security_log_analysis_rust_ray.pipelines.ann import \
        embedding_kcenter_sample

    k = 8
    got = embedding_kcenter_sample(SF_SMOKE, k=k).to_pandas()

    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    V = np.stack(t["embedding"].to_numpy(zero_copy_only=False)) \
        .astype(np.float64)
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    sel = [0]
    for _ in range(k - 1):
        C = V[sel]
        d2 = (V * V).sum(1)[:, None] - 2 * V @ C.T + (C * C).sum(1)[None, :]
        dmin = d2.min(1)
        dmin[sel] = -1
        sel.append(int(np.lexsort((ids, -dmin))[0]))
    assert list(got["vec_id"]) == [int(ids[i]) for i in sel]
    # farthest-point property: the selection distances never increase
    d = got["dist_to_prev"].to_numpy()[1:]
    assert (np.diff(d) <= 1e-9).all()


@pytest.mark.usefixtures("ray_session")
def test_promo_revenue_share_oracle(oracle_smoke):
    from security_log_analysis_rust_ray.pipelines.relational import \
        promo_revenue_share
    assert_matches_oracle(
        promo_revenue_share(SF_SMOKE), oracle_smoke,
        "SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'"
        " THEN l_extendedprice * (1 - l_discount) ELSE 0 END)"
        " / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share"
        " FROM lineitem JOIN part ON l_partkey = p_partkey")
