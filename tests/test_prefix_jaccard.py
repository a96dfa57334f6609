"""PPJoin-style prefix-filtered Jaccard join: same result set as the
full inverted-index plan, with provably fewer candidate pairs."""
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_prefix_plan_matches_full_plan():
    from security_log_analysis_rust_ray.pipelines.docs import (
        doc_jaccard_prefix_pairs, doc_ngram_jaccard_pairs)
    got = doc_jaccard_prefix_pairs(SF).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    want = doc_ngram_jaccard_pairs(SF).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert len(want) > 0
    assert got[["a", "b"]].values.tolist() == want[["a", "b"]].values.tolist()
    np.testing.assert_array_equal(got["jaccard"].to_numpy(),
                                  want["jaccard"].to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_prefix_filter_prunes_candidates():
    from security_log_analysis_rust_ray.pipelines import docs as D
    from security_log_analysis_rust_ray.stages import aggregate as agg
    from security_log_analysis_rust_ray.stages.dedup import distinct_rows
    nparts = D._join_parts(SF)
    pref_cands = D._prefix_candidates(SF, D.JACCARD_THRESHOLD, nparts)
    full_pairs = distinct_rows(
        D._group_pairs(D.shingles_ds(SF), ["g"], nparts), ["a", "b"])
    n_pref, n_full = pref_cands.count(), full_pairs.count()
    # the prefix plan must consider strictly fewer candidates than the
    # full inverted-index expansion, while (per the test above) still
    # finding every qualifying pair
    assert 0 < n_pref < n_full


@pytest.mark.usefixtures("ray_session")
def test_prefix_lossless_on_adversarial_threshold_boundary():
    """Pairs sitting exactly AT the threshold must survive the prefix cut
    (the floor-vs-ceil prefix-length choice is the lossless direction)."""
    from security_log_analysis_rust_ray.pipelines.docs import (
        JACCARD_THRESHOLD, doc_jaccard_prefix_pairs)
    got = doc_jaccard_prefix_pairs(SF).to_pandas()
    assert (got["jaccard"] >= JACCARD_THRESHOLD).all()


from hypothesis import given, settings, strategies as st

_elem = st.integers(min_value=0, max_value=60)
_set = st.frozensets(_elem, min_size=1, max_size=30)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(_set, _set, st.randoms(use_true_random=False))
def test_prefix_lemma_lossless_on_random_sets(xs, ys, rng):
    """The prefix-filter lemma the plan relies on, checked directly: if
    jaccard(x, y) >= t, then under ANY shared total order the first
    |x| - floor(t*|x|) + 1 of x and the first |y| - floor(t*|y|) + 1 of
    y must intersect (floor is the lossless direction)."""
    from security_log_analysis_rust_ray.pipelines.docs import \
        JACCARD_THRESHOLD as T
    inter = len(xs & ys)
    union = len(xs | ys)
    if inter / union < T:
        return  # lemma only constrains qualifying pairs
    # random-but-deterministic global order over the element universe
    universe = list(range(61))
    rng.shuffle(universe)
    rank = {e: i for i, e in enumerate(universe)}
    px = sorted(xs, key=rank.get)[: len(xs) - int(np.floor(T * len(xs))) + 1]
    py = sorted(ys, key=rank.get)[: len(ys) - int(np.floor(T * len(ys))) + 1]
    assert set(px) & set(py), (sorted(xs), sorted(ys))
