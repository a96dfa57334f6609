"""Resumable batch ingest: the reference `parse` + `db` export paths fused
into one Ray-Data-first job (SURVEY §3.1/§3.3).

Per input shard (one manifest row each, T4 lineage pattern):

  read shard -> route_parse (one vectorized pass) -> enrich (actor pool)
  -> write ONE routed sink partitioned by `sink` (fan-out as partitioning:
     a single streaming pass feeds all logical sinks; the reference instead
     does one Postgres insert path per table, src/parse_logs.rs:337-371)
  -> shard output dir renamed into place atomically, then manifest append.

After all shards: aggregates/ (per-country counts) recomputed from the
written routed data — so aggregate lineage is the manifest's shard set.

Scale notes (10^12 turns, 100 TB):
- a shard is an input file group; resume granularity = shard; within a shard
  the write is wholesale-replaced, so at-least-once reruns stay idempotent
  (the Ray-native restatement of `ON CONFLICT DO NOTHING`, K1);
- the only wide op is the final small aggregate; parse/enrich/write stream
  with backpressure and never materialize the corpus;
- row order inside output files follows block arrival order (parallel read),
  so resume guarantees are *content* equality per partition, not byte
  equality of files.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from .. import synth
from ..stages import aggregate as agg
from ..stages.enrich import EnrichActor
from ..stages.parse import route_parse
from ..state.manifest import Manifest, input_fingerprint

ROUTED_DIR = "routed"
AGG_DIR = "aggregates"


def _written_stats(shard_dir: str) -> tuple[int, str | None]:
    """(row_count, max_ts) from Parquet footers — no data scan."""
    rows, max_ts = 0, None
    for root, _dirs, files in os.walk(shard_dir):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(root, fn))
            rows += md.num_rows
            schema_names = md.schema.to_arrow_schema().names
            try:
                ts_idx = schema_names.index("ts")
            except ValueError:
                continue
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(ts_idx)
                if col.statistics and col.statistics.has_min_max:
                    m = col.statistics.max
                    if max_ts is None or m > max_ts:
                        max_ts = m
    return rows, (str(max_ts) if max_ts is not None else None)


def run_ingest(sf_dir: str, out_dir: str, shards: int = 8, repeat: int = 1,
               enrich: bool = True, stop_after_shard: int | None = None,
               in_dir: str | None = None) -> Manifest:
    """Run (or resume) the ingest job.  ``stop_after_shard`` simulates a kill
    after k shards for resume tests; ``in_dir`` overrides the input shard
    directory (e.g. a landing zone that grows new shards between runs —
    only new/changed shards are processed, per manifest fingerprints)."""
    if in_dir is None:
        in_dir = synth.ensure_transcripts_sharded(sf_dir, shards=shards,
                                                  repeat=repeat)
    manifest = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    routed_root = os.path.join(out_dir, ROUTED_DIR)
    os.makedirs(routed_root, exist_ok=True)

    parts = sorted(f for f in os.listdir(in_dir) if f.endswith(".parquet"))
    done = 0
    for fn in parts:
        src = os.path.join(in_dir, fn)
        # shard identity = input file name (stable when new shards land)
        shard_id = os.path.splitext(fn)[0]
        fp = input_fingerprint(src)
        if manifest.is_done(shard_id, fp):
            continue

        final_dir = os.path.join(routed_root, f"shard={shard_id}")
        # tmp lives OUTSIDE routed_root so readers never see partial output
        tmp_dir = os.path.join(out_dir, f"_tmp-{shard_id}")
        for d in (tmp_dir, final_dir):
            if os.path.exists(d):
                shutil.rmtree(d)

        ds = rd.read_parquet(src).map_batches(
            route_parse, batch_format="pyarrow", zero_copy_batch=True)
        if enrich:
            ds = ds.map_batches(
                EnrichActor, batch_format="pyarrow",
                concurrency=(1, 4), batch_size=32 * 1024)
        ds.write_parquet(tmp_dir, partition_cols=["sink"])
        os.replace(tmp_dir, final_dir)

        rows, watermark = _written_stats(final_dir)
        manifest.record(shard_id, status="done", input=fp, rows=rows,
                        watermark=watermark, sinks=["sink-partitioned routed"])
        done += 1
        if stop_after_shard is not None and done > stop_after_shard:
            return manifest

    # final small aggregate over the written routed data (lineage = manifest)
    routed = rd.read_parquet(routed_root)
    inner = routed.map_batches(
        lambda b: b.filter(pc.is_valid(b["country"] if "country" in b.schema.names
                                       else b["host"])),
        batch_format="pyarrow")
    counts = agg.grouped_count(inner, ["country"] if enrich else ["sink"])
    agg_tmp = os.path.join(out_dir, AGG_DIR + ".tmp")
    agg_final = os.path.join(out_dir, AGG_DIR)
    for d in (agg_tmp, agg_final):
        if os.path.exists(d):
            shutil.rmtree(d)
    counts.sort(["cnt"] + (["country"] if enrich else ["sink"]),
                descending=[True, False]).write_parquet(agg_tmp)
    os.replace(agg_tmp, agg_final)
    return manifest


def read_sink(out_dir: str, sink: str) -> rd.Dataset:
    """Read one logical sink back (sink in {'ssh','nginx','apache','message'})
    with partition pruning on the hive `sink=` directory."""
    import glob
    from ray.data.datasource.partitioning import Partitioning
    root = os.path.join(out_dir, ROUTED_DIR)
    # path-level pruning: only the requested sink's directories are listed,
    # other sinks never touch storage (partition-column filters can't be
    # pushed into Ray's fragment sampler in this release)
    paths = sorted(glob.glob(
        os.path.join(root, "shard=*", f"sink={sink}", "*.parquet")))
    if not paths:
        raise FileNotFoundError(f"no partitions for sink={sink} under {root}")
    return rd.read_parquet(paths, partitioning=Partitioning("hive", base_dir=root))
