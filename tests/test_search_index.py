"""Persisted inverted index: AND retrieval vs brute force, bucket pruning,
idempotent rebuild, hash-impl refusal."""
import glob
import json
import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("inv") / "search_index")


@pytest.mark.usefixtures("ray_session")
def test_search_and_matches_brute_force(index_dir):
    import pyarrow.compute as pc
    from security_log_analysis_rust_ray.pipelines.docs import docs_aug_ds
    from security_log_analysis_rust_ray.pipelines.search import \
        search_docs_and

    got = search_docs_and(SF, ["batch", "join"], index_dir=index_dir) \
        .to_pandas()["doc_id"].tolist()

    def brute(b):
        import pyarrow as pa
        toks = pc.split_pattern(b["text"], " ")
        m = [all(t in set(row) for t in ("batch", "join"))
             for row in toks.to_pylist()]
        return b.filter(pa.array(m)).select(["doc_id"])

    want = sorted(docs_aug_ds(SF).map_batches(brute, batch_format="pyarrow")
                  .to_pandas()["doc_id"].tolist())
    assert got == want and len(got) > 0


@pytest.mark.usefixtures("ray_session")
def test_search_reads_only_probed_buckets(index_dir):
    from security_log_analysis_rust_ray.functions.hashing import hash64_stable
    from security_log_analysis_rust_ray.pipelines.search import (
        SEARCH_BUCKETS, _probed_postings)
    import pyarrow as pa

    ds = _probed_postings(index_dir, ["batch", "join"])
    probed = set((hash64_stable(pa.array(["batch", "join"]))
                  % SEARCH_BUCKETS).astype(int).tolist())
    touched = {os.path.basename(os.path.dirname(f))
               for f in ds.input_files()}
    assert touched == {f"bucket={k}" for k in probed}
    total = len(glob.glob(os.path.join(index_dir, "postings", "bucket=*")))
    assert total > len(probed)  # pruning is real, not a 1-bucket index


@pytest.mark.usefixtures("ray_session")
def test_search_rebuild_noop_and_impl_refusal(index_dir):
    from security_log_analysis_rust_ray.pipelines.search import (
        search_build_index, search_docs_and)

    files = sorted(glob.glob(os.path.join(index_dir, "postings", "**",
                                          "*.parquet"), recursive=True))
    mtimes = [os.path.getmtime(f) for f in files]
    man = search_build_index(SF, index_dir)  # second call: no-op
    assert [os.path.getmtime(f) for f in files] == mtimes
    assert man["n_docs"] > 0

    man_path = os.path.join(index_dir, "manifest.json")
    with open(man_path) as fh:
        j = json.load(fh)
    j["hash_impl"] = "other-hash-v9"
    with open(man_path, "w") as fh:
        json.dump(j, fh)
    with pytest.raises(ValueError, match="hash_impl"):
        search_docs_and(SF, ["batch"], index_dir=index_dir)
    j["hash_impl"] = man["hash_impl"]
    with open(man_path, "w") as fh:
        json.dump(j, fh)


@pytest.mark.usefixtures("ray_session")
def test_search_no_hit_term_returns_empty(index_dir):
    from security_log_analysis_rust_ray.pipelines.search import \
        search_docs_and
    out = search_docs_and(SF, ["batch", "zqxjkwv"], index_dir=index_dir)
    assert out.count() == 0


@pytest.fixture(scope="module")
def pos_index_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("inv") / "search_pos_index")


@pytest.mark.usefixtures("ray_session")
def test_phrase_matches_brute_force(pos_index_dir):
    from security_log_analysis_rust_ray.pipelines.docs import docs_aug_ds
    from security_log_analysis_rust_ray.pipelines.search import \
        search_docs_phrase

    got = search_docs_phrase(SF, ["batch", "join"],
                             index_dir=pos_index_dir) \
        .to_pandas()["doc_id"].tolist()

    def brute(b):
        import pyarrow as pa
        m = [(" batch join " in f" {t} ") for t in b["text"].to_pylist()]
        return b.filter(pa.array(m)).select(["doc_id"])

    want = sorted(docs_aug_ds(SF).map_batches(brute, batch_format="pyarrow")
                  .to_pandas()["doc_id"].tolist())
    assert got == want and len(got) > 0
    # phrase hits are a subset of the AND hits
    from security_log_analysis_rust_ray.pipelines.search import \
        search_docs_and
    both = set(search_docs_and(SF, ["batch", "join"])
               .to_pandas()["doc_id"].tolist())
    assert set(got) <= both


@pytest.mark.usefixtures("ray_session")
def test_phrase_repeated_term_and_order(pos_index_dir):
    """A phrase with a repeated term only matches true repetition, and
    order matters (reversed phrase != original)."""
    from security_log_analysis_rust_ray.pipelines.docs import docs_aug_ds
    from security_log_analysis_rust_ray.pipelines.search import \
        search_docs_phrase

    def brute(phrase):
        needle = " " + " ".join(phrase) + " "

        def fn(b):
            import pyarrow as pa
            m = [(needle in f" {t} ") for t in b["text"].to_pylist()]
            return b.filter(pa.array(m)).select(["doc_id"])
        return sorted(docs_aug_ds(SF).map_batches(
            fn, batch_format="pyarrow").to_pandas()["doc_id"].tolist())

    for phrase in (["the", "the"], ["join", "batch"],
                   ["the", "batch", "join"]):
        got = search_docs_phrase(SF, phrase, index_dir=pos_index_dir) \
            .to_pandas()["doc_id"].tolist()
        assert got == brute(phrase), phrase


@pytest.mark.usefixtures("ray_session")
def test_phrase_empty_and_miss(pos_index_dir):
    from security_log_analysis_rust_ray.pipelines.search import \
        search_docs_phrase
    assert search_docs_phrase(SF, [], index_dir=pos_index_dir).count() == 0
    assert search_docs_phrase(SF, ["zqxjkwv", "batch"],
                              index_dir=pos_index_dir).count() == 0
