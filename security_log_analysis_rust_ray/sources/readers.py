"""Dataset sources (reference §2.1 S1-S9 collapse to Parquet reads here).

All readers return lazy ``ray.data.Dataset``s; column pruning happens at the
read (`read_parquet(columns=...)`) so only needed columns leave storage.
"""

from __future__ import annotations

import os

import ray.data as rd

from .. import synth

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read one driver testdata table (S7: lazy Parquet scan,
    /root/reference/src/polars_analysis.rs:147-149,177-181)."""
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def read_transcripts(sf_dir: str, columns: list[str] | None = None,
                     repeat: int = 1, blocks: int | None = None) -> rd.Dataset:
    """The primary input: the deterministic transcripts corpus for sf_dir
    (built once, cached under /tmp; see synth.ensure_transcripts).
    ``blocks`` overrides read parallelism (bench: ~num_cpus)."""
    path = synth.ensure_transcripts(sf_dir, repeat=repeat)
    if columns is None:
        import pyarrow.parquet as pq
        from .. import schemas
        schemas.validate(pq.read_schema(path), schemas.TRANSCRIPTS,
                         where=path)
    kw = {"override_num_blocks": blocks} if blocks else {}
    return rd.read_parquet(path, columns=columns, **kw)


def read_evolving(paths: list[str],
                  columns: list[str] | None = None) -> rd.Dataset:
    """Schema-evolution reader: union Parquet shards whose schemas DRIFTED
    (nightly-crawl reality — later shards add columns, early shards lack
    them).  Plain ``read_parquet`` over such a mix fails or silently
    drops; here the target schema is the FIELD-UNION of all footers
    (footer reads only — no data I/O at plan time), names sorted for
    determinism, first-seen type wins (a field that changed TYPE across
    shards raises — that is corruption, not evolution), and each shard
    maps through one vectorized cast that adds its missing columns as
    typed nulls.  Column pruning still pushes down: only requested
    columns are read from each shard that has them."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fields: dict[str, pa.DataType] = {}
    for p in paths:
        sch = pq.read_schema(p)
        for f in sch:
            seen = fields.get(f.name)
            if seen is None:
                fields[f.name] = f.type
            elif seen != f.type:
                raise ValueError(
                    f"field {f.name!r} changed type across shards:"
                    f" {seen} vs {f.type} in {p} — not schema evolution")
    names = sorted(fields)
    if columns is not None:
        missing = set(columns) - set(names)
        if missing:
            raise ValueError(f"columns {sorted(missing)} in no shard")
        names = [n for n in sorted(columns)]
    target = pa.schema([(n, fields[n]) for n in names])

    def conform(p: str) -> rd.Dataset:
        have = set(pq.read_schema(p).names)
        cols = [n for n in names if n in have]

        def widen(b: pa.Table) -> pa.Table:
            arrays = []
            for n in names:
                if n in b.schema.names:
                    arrays.append(b[n].cast(fields[n]))
                else:
                    arrays.append(pa.nulls(b.num_rows, fields[n]))
            return pa.table(dict(zip(names, arrays)))

        return rd.read_parquet(p, columns=cols or None).map_batches(
            widen, batch_format="pyarrow", batch_size=None)

    out = conform(paths[0])
    for p in paths[1:]:
        out = out.union(conform(p))
    return out
