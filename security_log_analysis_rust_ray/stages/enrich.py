"""Host->country enrichment: stateful actor-pool stage with broadcast dims.

Reference semantics (/root/reference/src/host_country_metadata.rs):
- T1 (:22-70): both dimension tables bulk-loaded once into in-RAM maps ->
  here: dicts built once per actor in ``__init__`` (or fetched from a
  ``ray.put`` broadcast ref — never re-shipped per batch).
- J1/J2 (:src/polars_analysis.rs:96-107, src/reports.rs:16-31): fact x tiny
  dim joins -> broadcast hash lookup inside the batch, never a shuffle join.
- T2 (:74-175): cache-miss resolution (whois there) -> a deterministic pure
  resolver here (code derived from the host's embedded number, the synthetic
  analog of a geo lookup), with per-batch "discovered" rows emitted so a
  dim-update side output can be dedup'd downstream (write-through analog).

Lookups are vectorized via dictionary-encoding: the Python dict probe runs
only over the batch's *unique* hosts, then ``take`` scatters results back.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from .. import synth


def build_dims() -> tuple[dict[str, str], dict[str, str]]:
    """(host->code, code->country) — Python mirror of the SQL dim CTEs."""
    hosts, codes = synth.host_country_rows()
    host_to_code = dict(zip(hosts, codes))
    cc_codes, countries = synth.country_code_rows()
    code_to_country = dict(zip(cc_codes, countries))
    return host_to_code, code_to_country


_NUM_RE = re.compile(r"^h(\d+)\.example\.com$")
_IP_RE = re.compile(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")


def resolve_host(host: str) -> str | None:
    """Deterministic miss resolver (analog of the whois path,
    host_country_metadata.rs:95-175): IPv4 -> code from second octet;
    hN.example.com -> code from N; else unresolvable (None)."""
    m = _IP_RE.match(host)
    if m:
        k = int(m.group(2))
    else:
        m = _NUM_RE.match(host)
        if not m:
            return None
        k = int(m.group(1))
    return chr(65 + k % 26) + chr(65 + (k * 7) % 26)


# Process-level cache for the FUSED stateless enrich path: the dims here are
# tiny (~50 entries), so a task-level cache gives the same once-per-worker
# amortization as an actor pool while letting Ray FUSE parse->enrich->partial
# into one operator (no object-store hop between stages).  Use EnrichActor
# below when the state is big or expensive (model weights, large dim tables).
_FUSED: dict[bool, "EnrichActor"] = {}


def enrich_batch(b: pa.Table) -> pa.Table:
    """Fused stateless enrich (LEFT-join semantics, J1)."""
    if False not in _FUSED:
        _FUSED[False] = EnrichActor(resolve_misses=False)
    return _FUSED[False](b)


def enrich_batch_resolving(b: pa.Table) -> pa.Table:
    """Fused stateless enrich with miss resolution (T2)."""
    if True not in _FUSED:
        _FUSED[True] = EnrichActor(resolve_misses=True)
    return _FUSED[True](b)


class EnrichActor:
    """map_batches callable class — one dict build per actor, not per batch.

    ``resolve_misses=False`` reproduces the pure LEFT-join export path (J1);
    ``True`` adds the T2 miss-resolution write-through analog and an
    ``enrich_source`` column ('dim' | 'resolved' | null).
    """

    def __init__(self, resolve_misses: bool = False, dims_ref=None):
        if dims_ref is not None:
            import ray
            self.host_to_code, self.code_to_country = ray.get(dims_ref)
        else:
            self.host_to_code, self.code_to_country = build_dims()
        self.resolve_misses = resolve_misses

    def __call__(self, batch: pa.Table) -> pa.Table:
        host = batch["host"]
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()
        enc = host.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        codes, sources = [], []
        for h in uniq:
            c = self.host_to_code.get(h) if h is not None else None
            if c is not None:
                codes.append(c)
                sources.append("dim")
            elif self.resolve_misses and h is not None:
                r = resolve_host(h)
                codes.append(r)
                sources.append("resolved" if r is not None else None)
            else:
                codes.append(None)
                sources.append(None)
        code = pc.take(pa.array(codes, pa.string()), enc.indices)
        country = pc.take(
            pa.array([self.code_to_country.get(c) if c else None for c in codes],
                     pa.string()),
            enc.indices,
        )
        out = batch.append_column("code", code).append_column("country", country)
        if self.resolve_misses:
            src = pc.take(pa.array(sources, pa.string()), enc.indices)
            out = out.append_column("enrich_source", src)
        return out
