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
