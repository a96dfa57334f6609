"""S9: paginated object-list source with S3 marker semantics
(reference src/s3_sync.rs:118-171)."""

from __future__ import annotations

import os

from security_log_analysis_rust_ray.sources import objstore as OS
from security_log_analysis_rust_ray.state.manifest import Manifest


def _mk_store(d, n=23, prefix="k"):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        with open(os.path.join(d, f"{prefix}{i:04d}.parquet"), "wb") as f:
            f.write(b"x" * (i + 1))


def test_list_objects_marker_pagination(tmp_path):
    store = str(tmp_path / "store")
    _mk_store(store, n=23)

    # page 1: 10 keys, truncated, marker = last key
    p1 = OS.list_objects(store, page_size=10)
    assert len(p1.contents) == 10 and p1.is_truncated
    assert p1.next_marker == p1.contents[-1]["key"]
    # marker excludes everything <= marker (strictly-greater semantics)
    p2 = OS.list_objects(store, marker=p1.next_marker, page_size=10)
    assert p2.contents[0]["key"] > p1.next_marker
    assert len(p2.contents) == 10 and p2.is_truncated
    p3 = OS.list_objects(store, marker=p2.contents[-1]["key"], page_size=10)
    assert len(p3.contents) == 3 and not p3.is_truncated
    assert p3.next_marker is None

    # the page loop sees every key exactly once, in order
    seen = [o["key"] for page in OS.iter_object_pages(store, page_size=10)
            for o in page]
    assert seen == sorted(seen) and len(seen) == 23
    assert seen == [o["key"] for o in OS._list_all_keys(store)]

    # a page boundary exactly at the end is not truncated
    pe = OS.list_objects(store, marker=seen[12], page_size=10)
    assert len(pe.contents) == 10 and not pe.is_truncated


def test_get_and_process_keys_flags(tmp_path):
    remote = str(tmp_path / "remote")
    local = str(tmp_path / "local")
    cache = str(tmp_path / "keycache.jsonl")
    _mk_store(remote, n=7)
    _mk_store(local, n=5)  # keys 0-4 identical content, 5-6 remote-only
    # diverge one local file (conflict: etags differ)
    with open(os.path.join(local, "k0002.parquet"), "wb") as f:
        f.write(b"different")

    n_local = OS.process_local_files(local, cache)
    assert n_local == 5
    n_remote = OS.get_and_process_keys(remote, cache, page_size=3)
    assert n_remote == 7

    recs = Manifest(cache).records
    # identical etags -> no transfer either way
    assert recs["k0001.parquet"]["do_download"] is False
    assert recs["k0001.parquet"]["do_upload"] is False
    # conflicting etags -> both flags (merge-then-reupload, reference rule)
    assert recs["k0002.parquet"]["do_download"] is True
    assert recs["k0002.parquet"]["do_upload"] is True
    # remote-only -> download only
    assert recs["k0006.parquet"]["do_download"] is True
    assert recs["k0006.parquet"]["do_upload"] is False
    # rerun is idempotent (flags recomputed to the same values)
    OS.get_and_process_keys(remote, cache, page_size=3)
    assert Manifest(cache).records["k0002.parquet"]["do_download"] is True


def test_local_only_key_flags_upload(tmp_path):
    local = str(tmp_path / "local")
    cache = str(tmp_path / "keycache.jsonl")
    _mk_store(local, n=2)
    OS.process_local_files(local, cache)
    rec = Manifest(cache).records["k0000.parquet"]
    assert rec["status"] == "local_only"
    assert rec["do_upload"] is True and rec["do_download"] is False


def test_remote_only_keys_survive_rerun(tmp_path):
    """Re-running get_and_process_keys without downloading must keep
    never-downloaded keys remote_only/download-pending — the None local
    etag used to flip do_upload=True and status to synced (r03 review)."""
    import json

    from security_log_analysis_rust_ray.sources.objstore import (
        get_and_process_keys)

    store = tmp_path / "store"
    store.mkdir()
    (store / "k1.parquet").write_bytes(b"payload-1")
    cache = str(tmp_path / "cache.jsonl")
    get_and_process_keys(str(store), cache)
    get_and_process_keys(str(store), cache)  # rerun, nothing downloaded
    recs = {}
    for ln in open(cache):
        r = json.loads(ln)
        recs[r.get("shard") or r.get("key")] = r
    rec = next(iter(recs.values()))
    assert rec["status"] == "remote_only"
    assert rec["do_download"] is True and rec["do_upload"] is False
