"""Spherical k-means tier: the iterative fit has no SQL oracle (float
accumulation order), so its contract is invariants: monotone inertia,
complete deterministic assignments, and the stratified sample's per-
cluster bounds."""

from __future__ import annotations

import numpy as np
import pytest

from security_log_analysis_rust_ray.pipelines import ann as A
from .conftest import SF_SMOKE


@pytest.mark.usefixtures("ray_session")
def test_kmeans_inertia_monotone_and_assignment_complete():
    cm, hist = A.kmeans_fit(SF_SMOKE)
    assert len(hist) == A.KM_ITERS
    # Lloyd's algorithm never increases inertia (tiny FP slack)
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-9, f"inertia rose: {hist}"
    assert hist[-1] < hist[0], "no improvement over seed centroids at all"
    # centroids stay unit-norm (spherical variant)
    assert np.allclose(np.linalg.norm(cm, axis=1), 1.0)

    out = A.embedding_kmeans(SF_SMOKE).to_pandas()
    base_n = A.read_table(SF_SMOKE, "embeddings",
                          columns=["vec_id"]).count()
    assert len(out) == base_n
    assert out["vec_id"].is_unique
    assert set(out["cluster"].unique()) <= set(range(A.KM_K))
    # deterministic: a second run reproduces the exact assignment
    out2 = A.embedding_kmeans(SF_SMOKE).to_pandas()
    assert out.sort_values("vec_id").reset_index(drop=True) \
        .equals(out2.sort_values("vec_id").reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_cluster_sample_bounds():
    samp = A.embedding_cluster_sample(SF_SMOKE).to_pandas()
    assign = A.embedding_kmeans_assign(SF_SMOKE).to_pandas()
    sizes = assign.groupby("cluster").size()
    got = samp.groupby("cluster").size()
    for cl, n in got.items():
        assert n == min(A.KM_SAMPLE, sizes[cl])
    # sampled ids really belong to the cluster they are listed under
    merged = samp.merge(assign, on="vec_id", suffixes=("_s", "_a"))
    assert (merged["cluster_s"] == merged["cluster_a"]).all()


@pytest.mark.usefixtures("ray_session")
def test_pca_fit_invariants():
    """Components are orthonormal, explained variance is descending and
    the projected data's per-axis variance equals the eigenvalues (that
    IS what PCA solves for)."""
    mean, comps, ev = A.pca_fit(SF_SMOKE)
    k = A.PCA_K
    assert comps.shape == (k, A.DIM) and ev.shape == (k,)
    np.testing.assert_allclose(comps @ comps.T, np.eye(k), atol=1e-8)
    assert np.all(np.diff(ev) <= 1e-12)          # descending
    assert ev[0] > 0

    proj = A.embedding_pca_project(SF_SMOKE).to_pandas()
    m = np.stack(proj["embedding"].to_numpy())
    assert m.shape[1] == k
    # mean-centered projection: per-axis variance == eigenvalue
    np.testing.assert_allclose(m.mean(axis=0), 0, atol=1e-8)
    np.testing.assert_allclose(m.var(axis=0), ev, rtol=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_pca_projection_complete_and_deterministic():
    a = A.embedding_pca_project(SF_SMOKE).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    b = A.embedding_pca_project(SF_SMOKE).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert a["vec_id"].is_unique
    ma, mb = np.stack(a["embedding"]), np.stack(b["embedding"])
    np.testing.assert_allclose(ma, mb, rtol=1e-9)
    assert (a["vec_id"] == b["vec_id"]).all()


@pytest.mark.usefixtures("ray_session")
def test_semdedup_invariants():
    """Survivors are unique, the keep rule holds exactly: a vector is
    dropped iff some LOWER-id same-cluster vector sits at cos >= tau
    (recomputed densely here at smoke scale)."""
    out = A.embedding_semdedup(SF_SMOKE).to_pandas()
    assert out["vec_id"].is_unique

    aug = A.embeddings_aug_ds(SF_SMOKE).to_pandas().sort_values("vec_id")
    ids = aug["vec_id"].to_numpy()
    m = A._normalize(np.stack(aug["embedding"].to_numpy()))
    cm = A._km_seed_centroids(SF_SMOKE)
    cl = np.argmax(cm @ m.T, axis=0)
    g = m @ m.T
    same = cl[:, None] == cl[None, :]
    lower = ids[:, None] > ids[None, :]          # column id < row id
    dropped = np.any(same & lower & (g >= A.SEMDEDUP_COS), axis=1)
    expect = set(ids[~dropped])
    assert set(out["vec_id"]) == expect
    # at least the injected exact duplicates (+1e6 ids) must be dropped
    assert len(out) < len(aug)
    # surviving cluster labels match the dense assignment
    dense = dict(zip(ids, cl))
    assert all(dense[v] == c for v, c in
               zip(out["vec_id"], out["cluster"]))


@pytest.mark.usefixtures("ray_session")
def test_semdedup_hot_cluster_guard():
    """A cluster whose pair count exceeds Config.max_group_pairs is kept
    UN-deduped (and logged) rather than doing an s^2 gram matmul."""
    from security_log_analysis_rust_ray.config import override, set_config
    n_aug = A.embeddings_aug_ds(SF_SMOKE).count()
    prev = override(max_group_pairs=1)     # every real cluster is "hot"
    try:
        out = A.embedding_semdedup(SF_SMOKE).to_pandas()
    finally:
        set_config(prev)
    assert len(out) == n_aug               # nothing dropped under the guard


@pytest.mark.usefixtures("ray_session")
def test_kmeans_checkpoint_resume_is_exact(tmp_path):
    """Kill-after-2-rounds + resume == uninterrupted run, bit-for-bit:
    the per-round state is only the centroid matrix."""
    ck = str(tmp_path / "ck")
    full_cm, full_hist = A.kmeans_fit(SF_SMOKE)       # no checkpoints

    # "killed" run: only 2 of KM_ITERS rounds complete
    cm2, hist2 = A.kmeans_fit(SF_SMOKE, iters=2, checkpoint_dir=ck)
    import os
    assert sorted(os.listdir(ck)) == ["iter-0000.json", "iter-0001.json"]

    # resume finishes the remaining rounds from the persisted state
    cm_r, hist_r = A.kmeans_fit(SF_SMOKE, checkpoint_dir=ck)
    np.testing.assert_array_equal(cm_r, full_cm)
    assert hist_r == full_hist
    # resumed run only appended the missing rounds
    assert hist_r[:2] == hist2

    # a second resume after completion is a pure no-op (0 corpus passes)
    cm_n, hist_n = A.kmeans_fit(SF_SMOKE, checkpoint_dir=ck)
    np.testing.assert_array_equal(cm_n, full_cm)
    assert hist_n == full_hist


@pytest.mark.usefixtures("ray_session")
def test_ann_persisted_index_matches_ivf(tmp_path):
    """Build-once index + bucket-pruned query == the rebucket-per-run
    IVF pipeline, bit-for-bit; rebuild is a no-op; non-probed bucket
    directories are never read."""
    import os
    idx = str(tmp_path / "ivf_index")
    man = A.ann_build_index(SF_SMOKE, idx)
    assert man["n_vectors"] == 500 and man["nlist"] == A.IVF_NLIST
    assert os.path.exists(os.path.join(idx, "manifest.json"))
    # rebuild = manifest read, no tmp dir left behind
    man2 = A.ann_build_index(SF_SMOKE, idx)
    assert man2 == man and not os.path.exists(idx + ".tmp")

    got = A.ann_query_index(idx, SF_SMOKE).to_pandas() \
        .sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    ref = A.ann_ivf_topk(SF_SMOKE).to_pandas() \
        .sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_ann_incremental_append(tmp_path):
    """Night-0 evens built + night-1 odds appended == an index built over
    everything, bit-for-bit at query time; re-appending the same tag is a
    no-op (the tag dir IS the applied marker); a leftover half-written
    tmp delta is invisible to queries and repaired by the next append."""
    import glob
    import os

    import pandas as pd

    full = str(tmp_path / "full_index")
    A.ann_build_index(SF_SMOKE, full)
    want = A.ann_query_index(full, SF_SMOKE).to_pandas() \
        .sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)

    inc = str(tmp_path / "inc_index")
    man0 = A.ann_build_index(SF_SMOKE, inc, parity=0)
    assert man0["n_vectors"] == 250
    # simulate a killed earlier append: stale dot-tmp must not break
    # anything or be read by queries
    os.makedirs(os.path.join(inc, "appends", ".night1.tmp", "bucket=0"),
                exist_ok=True)
    man1 = A.ann_append_index(SF_SMOKE, inc, "night1", parity=1)
    assert man1["n_vectors"] == 500 and man1["applied"] == ["night1"]

    got = A.ann_query_index(inc, SF_SMOKE).to_pandas() \
        .sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    n_files = len(glob.glob(os.path.join(inc, "appends", "night1", "**",
                                         "*.parquet"), recursive=True))
    man2 = A.ann_append_index(SF_SMOKE, inc, "night1", parity=1)
    assert man2 == man1
    assert n_files == len(glob.glob(os.path.join(
        inc, "appends", "night1", "**", "*.parquet"), recursive=True))
