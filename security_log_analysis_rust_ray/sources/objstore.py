"""Paginated object-store listing source (S9).

The reference syncs against S3 by PAGING ``list_objects`` with a ``marker``
— each page's last key becomes the next request's marker until the listing
reports no truncation — and folds every page into ``KeyItemCache`` rows
whose ``do_download``/``do_upload`` flags come from the etag diff against
the local side (/root/reference/src/s3_sync.rs:118-171 over
src/models.rs:849-859).

Re-stated over ``pyarrow.fs`` so ONE code path serves ``file://`` (tests —
the sandbox is network-free) and ``s3://`` (pyarrow's S3FileSystem speaks
real paginated ListObjects under the hood; pass the bucket/prefix URI and
the same fold runs unchanged).  The provider hook is ``_list_all_keys``:
for a filesystem whose native listing is not already paginated server-side,
marker/page slicing is applied client-side with exact S3 ``ListObjects``
marker semantics (keys STRICTLY GREATER than the marker, lexicographic
order, at most ``page_size`` per page, ``truncated`` flag); a real
cloud-credentialed deployment can swap in a boto3-style continuation token
behind the same generator contract.

The fold streams pages into the key cache; objects themselves never load.
Over pyarrow.fs the lightweight key metadata is materialized once per fold
(the provider has no server-side marker API); a true S3 provider streams
continuation pages behind the same generator, holding one page at a time.
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass

from ..state.manifest import Manifest
from .sync import file_etag

DEFAULT_PAGE_SIZE = 1000  # S3 ListObjects MaxKeys default


def _fs_for(uri: str):
    """(filesystem, path) for a store URI; bare paths are local dirs."""
    from pyarrow import fs as pafs
    if "://" in uri:
        return pafs.FileSystem.from_uri(uri)
    return pafs.LocalFileSystem(), uri


def _list_all_keys(uri: str) -> list[dict]:
    """Provider hook: the store's full key listing as
    ``{key, size, mtime_ns}`` sorted by key.  pyarrow.fs S3 paginates
    server-side inside ``get_file_info``; client-side marker slicing on top
    keeps the public page contract identical across providers."""
    from pyarrow import fs as pafs
    f, path = _fs_for(uri)
    infos = f.get_file_info(pafs.FileSelector(path, recursive=True,
                                              allow_not_found=True))
    out = []
    for info in infos:
        if info.type != pafs.FileType.File:
            continue
        key = posixpath.relpath(info.path, path)
        mtime = info.mtime_ns if info.mtime_ns is not None else 0
        out.append({"key": key, "size": info.size, "mtime_ns": mtime})
    out.sort(key=lambda r: r["key"])
    return out


@dataclass
class ListPage:
    contents: list[dict]
    is_truncated: bool
    next_marker: str | None


def list_objects(uri: str, marker: str | None = None,
                 page_size: int = DEFAULT_PAGE_SIZE) -> ListPage:
    """One LIST page: keys strictly greater than ``marker``, at most
    ``page_size`` entries, plus the truncation flag — the exact
    request/response shape of the reference's ``list_keys``
    (src/s3_sync.rs:118-129)."""
    keys = _list_all_keys(uri)
    if marker is not None:
        keys = [r for r in keys if r["key"] > marker]
    page, rest = keys[:page_size], keys[page_size:]
    nxt = page[-1]["key"] if page and rest else None
    return ListPage(contents=page, is_truncated=bool(rest), next_marker=nxt)


def iter_object_pages(uri: str, page_size: int = DEFAULT_PAGE_SIZE):
    """Page loop (src/s3_sync.rs:131-141).  pyarrow.fs has no server-side
    marker API — its native listing already returns everything — so the
    provider listing is taken ONCE and the marker protocol is replayed
    over it by slicing (identical pages to repeated ``list_objects``
    calls, without re-listing the store per page: that was O(N^2 /
    page_size) — r03 review).  A real S3 deployment swaps true
    server-side continuation pages in behind this same generator; only
    the lightweight key metadata is held, objects themselves stream."""
    keys = _list_all_keys(uri)
    for i in range(0, len(keys), page_size):
        yield keys[i:i + page_size]


def _etag(uri: str, key: str) -> str:
    """Content etag for one object.  Local stores md5 the file (the
    reference's md5 helper, src/lib.rs:69-88); a real S3 listing carries
    the etag in the page, so this read never happens there."""
    f, path = _fs_for(uri)
    from pyarrow import fs as pafs
    if isinstance(f, pafs.LocalFileSystem):
        return file_etag(posixpath.join(path, key))
    import hashlib
    h = hashlib.md5()
    with f.open_input_stream(posixpath.join(path, key)) as s:
        while True:
            chunk = s.read(1 << 20)
            if not chunk:
                break
            h.update(chunk)
    return h.hexdigest()


def get_and_process_keys(uri: str, cache_path: str,
                         page_size: int = DEFAULT_PAGE_SIZE) -> int:
    """Fold the paged remote listing into the key cache — the reference's
    ``get_and_process_keys`` (src/s3_sync.rs:131-171): a key already cached
    gets its remote etag/size/timestamp refreshed and its flags recomputed
    (equal etags -> neither transfer; differing -> both, i.e. a conflict
    merge); an unknown key is inserted with ``do_download=True``.  Returns
    the number of keys processed.  The cache is the same fsync'd JSONL
    ``Manifest`` the ingest lineage uses (KeyItemCache analog)."""
    cache = Manifest(cache_path)
    nkeys = 0
    for page in iter_object_pages(uri, page_size=page_size):
        for obj in page:
            etag = _etag(uri, obj["key"])
            rec = cache.get(obj["key"])
            if rec is not None and rec.get("local_etag") is not None:
                same = rec.get("local_etag") == etag
                cache.record(obj["key"], status="synced",
                             local_etag=rec.get("local_etag"),
                             s3_etag=etag, s3_size=obj["size"],
                             s3_mtime_ns=obj["mtime_ns"],
                             do_download=not same, do_upload=not same)
            elif rec is not None:
                # cached but STILL no local copy: a rerun must stay
                # remote_only / download-pending — comparing None to the
                # etag used to flip do_upload=True for files that do not
                # exist locally (r03 review)
                cache.record(obj["key"], status="remote_only",
                             local_etag=None, s3_etag=etag,
                             s3_size=obj["size"],
                             s3_mtime_ns=obj["mtime_ns"],
                             do_download=True, do_upload=False)
            else:
                cache.record(obj["key"], status="remote_only",
                             local_etag=None, s3_etag=etag,
                             s3_size=obj["size"],
                             s3_mtime_ns=obj["mtime_ns"],
                             do_download=True, do_upload=False)
            nkeys += 1
    return nkeys


def process_local_files(local_dir: str, cache_path: str) -> int:
    """The local half of the flag computation (src/s3_sync.rs:179-231):
    scan the local store, refresh each key's local etag, and recompute the
    transfer flags against the cached remote etag."""
    from .sync import scan_store
    cache = Manifest(cache_path)
    n = 0
    for key, meta in scan_store(local_dir).items():
        rec = cache.get(key) or {}
        s3_etag = rec.get("s3_etag")
        same = s3_etag == meta["etag"]
        cache.record(key, status="synced" if s3_etag else "local_only",
                     local_etag=meta["etag"], s3_etag=s3_etag,
                     s3_size=rec.get("s3_size"),
                     s3_mtime_ns=rec.get("s3_mtime_ns"),
                     do_download=bool(s3_etag) and not same,
                     do_upload=not same)
        n += 1
    return n
