"""Export/import sinks (reference §2.2 K2-K5, §2.1 S8).

K2 — month-partitioned, merge-on-write, idempotent Parquet export
(/root/reference/src/polars_analysis.rs:34-165): the reference enumerates
(year, month) partitions via a histogram, then per partition merges new rows
with the existing file (vstack + unique keep-first) and SKIPS the write when
the row count is unchanged.  Re-expressed Ray-first: one streaming pass
writes hive-partitioned year=/month= directories; merge-on-write = union
existing partition + new rows -> dedup keep-first -> atomic replace; a
partition whose merged row count equals the existing count is skipped
(byte-stable reruns).

K3 — pairwise merge (/root/reference/src/polars_analysis.rs:169-195).
K4 — JSON export, limit 1000 (/root/reference/src/parse_opts.rs:261-297).
S8 — JSON import (/root/reference/src/parse_opts.rs:232-260).
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..stages import aggregate as agg
from ..stages import dedup as dd


def _partition_rows(path: str) -> int:
    total = 0
    for root, _d, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total


def _partition_fingerprint(path: str) -> int:
    """Order-insensitive content fingerprint of a Parquet partition dir
    (sum of per-row hashes).  The reference skips the rewrite when the ROW
    COUNT is unchanged (/root/reference/src/polars_analysis.rs:156-158),
    which misses a same-key row replacement under keep-first order; content
    fingerprints close that hole (ADVICE r01)."""
    import pandas as pd
    total = 0
    for root, _d, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                df = pq.read_table(os.path.join(root, f)).to_pandas()
                df = df[sorted(df.columns)]
                total = (total + int(pd.util.hash_pandas_object(
                    df, index=False).sum())) & 0xFFFFFFFFFFFFFFFF
    return total


def export_month_partitioned(ds: rd.Dataset, out_dir: str,
                             keys: list[str] | None = None,
                             order: list[str] | None = None) -> dict[str, int]:
    """K2: write `ds` (must carry a `datetime` column) into
    ``out_dir/year=Y/month=M/`` with merge-on-write + dedup keep-first +
    skip-if-unchanged.  Returns {partition: rows_written_or_kept}.

    The (year, month) histogram is a tiny aggregate (A3) enumerating
    partitions, exactly as the reference does; per-partition merge unions the
    existing partition dir (if any) with the new rows and dedups on the
    natural key, so reruns are idempotent (ON CONFLICT DO NOTHING analog).
    """
    keys = keys or dd.NATURAL_KEY
    order = order or dd.ORDER_COLS
    # materialize ONCE: without this the whole upstream pipeline
    # (read+parse) re-executes for the histogram AND once per partition
    # (r03 review) — blocks pin in the (spillable) object store instead
    with_ym = ds.map_batches(agg.add_year_month, batch_format="pyarrow",
                             batch_size=None).materialize()
    hist = agg.grouped_count(with_ym, ["year", "month"]).to_pandas()

    results: dict[str, int] = {}
    for _, row in hist.sort_values(["year", "month"]).iterrows():
        # rows with a NULL datetime (possible via imported/spooled data;
        # the reference's column is NOT NULL) land in year=0/month=0
        # instead of crashing int(NaN) or silently vanishing
        isnull = pd.isna(row["year"])
        y, m = (0, 0) if isnull else (int(row["year"]), int(row["month"]))
        part = f"year={y}/month={m}"
        final = os.path.join(out_dir, part)
        if isnull:
            new_rows = with_ym.map_batches(
                lambda b: b.filter(pc.is_null(b["year"])),
                batch_format="pyarrow", batch_size=None)
        else:
            new_rows = with_ym.map_batches(
                lambda b, y=y, m=m: b.filter(
                    pc.and_(pc.equal(b["year"], y), pc.equal(b["month"], m))),
                batch_format="pyarrow", batch_size=None)
        merged = new_rows
        if os.path.isdir(final):
            def _with_ym(b: pa.Table, y=y, m=m) -> pa.Table:
                # the hive path may re-infer year/month on read; normalize
                for c in ("year", "month"):
                    if c in b.schema.names:
                        b = b.drop_columns([c])
                return b.append_column(
                    "year", pa.array([y] * len(b), pa.int32())).append_column(
                    "month", pa.array([m] * len(b), pa.int32()))
            existing = rd.read_parquet(final).map_batches(
                _with_ym, batch_format="pyarrow", batch_size=None)
            merged = new_rows.union(existing)
        merged = dd.dedup_keep_first(merged, keys=keys, order=order)

        tmp = os.path.join(out_dir, f"_tmp-{y}-{m}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        merged.drop_columns(["year", "month"]).write_parquet(tmp)
        n_merged = _partition_rows(tmp)
        if os.path.isdir(final) and _partition_rows(final) == n_merged \
                and _partition_fingerprint(final) == _partition_fingerprint(tmp):
            shutil.rmtree(tmp)  # skip-if-unchanged (K2 semantics, by content)
            results[part] = n_merged
            continue
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        os.replace(tmp, final)
        results[part] = n_merged
    return results


def merge_parquet_pair(a: str, b: str, out: str,
                       keys: list[str] | None = None,
                       order: list[str] | None = None) -> int:
    """K3: union two Parquet files/dirs, dedup keep-first, overwrite out."""
    merged = dd.dedup_keep_first(
        rd.read_parquet(a).union(rd.read_parquet(b)),
        keys=keys or dd.NATURAL_KEY, order=order or dd.ORDER_COLS)
    tmp = out + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)  # a zero-row merge writes no files
    merged.write_parquet(tmp)
    n = _partition_rows(tmp)
    if os.path.exists(out):
        shutil.rmtree(out)
    os.replace(tmp, out)
    return n


def export_json(ds: rd.Dataset, out_dir: str, limit: int = 1000) -> None:
    """K4: stream at most ``limit`` rows to JSON (reference caps at 1000,
    src/parse_opts.rs:266)."""
    ds.limit(limit).write_json(out_dir)


def import_json(path: str) -> rd.Dataset:
    """S8: JSON lines -> Dataset (feed into any sink)."""
    return rd.read_json(path)


# Geochart report scaffold with the reference's substitution contract: the
# marker is replaced by `["Country", N],...` rows fed to a geochart data
# table (templates/COUNTRY_TEMPLATE.html:10-14; substitution at
# src/parse_opts.rs:186-190).  The scaffold is this engine's own; the
# MARKER name and row format follow the reference so downstream consumers
# of the substituted field see identical data rows.
_GEO_MARKER = "PUTLISTOFCOUNTRIESANDATTEMPTSHERE"
_REPORT_TEMPLATE = """<html>
  <head>
    <script type="text/javascript" src="https://www.google.com/jsapi"></script>
    <script type="text/javascript">
      google.load("visualization", "1", {packages:["geochart"]});
      google.setOnLoadCallback(drawRegionsMap);
      function drawRegionsMap() {
        var data = google.visualization.arrayToDataTable([
          ['Country', 'Number'],
          PUTLISTOFCOUNTRIESANDATTEMPTSHERE
        ]);
        var chart = new google.visualization.GeoChart(
          document.getElementById('regions_div'));
        chart.draw(data, {});
      }
    </script>
  </head>
  <body>
    <div id="regions_div" style="width: 900px; height: 500px;"></div>
  </body>
</html>
"""


def geochart_rows(df) -> str:
    """The reference's row serialization: `["{country}", {count}]` joined
    with commas (src/parse_opts.rs:186-188)."""
    return ",".join(f'["{r.country}", {r.cnt}]' for r in df.itertuples())


def write_country_report(counts, out_path: str) -> str:
    """K5: HTML geochart report writer
    (/root/reference/src/parse_opts.rs:176-204 +
    templates/COUNTRY_TEMPLATE.html): driver-side template substitution over
    the TINY aggregate result.  ``counts`` is a Dataset/DataFrame with
    (country, cnt)."""
    df = counts.to_pandas() if hasattr(counts, "to_pandas") else counts
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write(_REPORT_TEMPLATE.replace(_GEO_MARKER, geochart_rows(df)))
    return out_path


def write_country_reports_per_sink(sf_dir: str, out_dir: str) -> list[str]:
    """The reference Plot command's full fan-out: one geochart report per
    (service x server) named `{service}_intrusion_attempts_{server}.html`
    (src/parse_opts.rs:181-199).  One distributed aggregate pass computes
    every (service, server, country) count; the per-file split is a
    driver-side partition of the tiny result."""
    from ..pipelines.reports import enriched
    from ..stages import aggregate as agg
    import pyarrow.compute as _pc
    enr = enriched(sf_dir).materialize()
    inner = enr.map_batches(
        lambda b: b.filter(_pc.is_valid(b["country"])),
        batch_format="pyarrow", batch_size=None)
    counts = agg.grouped_count(
        inner, ["service", "server", "country"]).to_pandas()
    # one report per ROUTED (service, server) combination, like the
    # reference's fixed service x server loop — combos whose hosts have no
    # country enrichment (e.g. raw-IP services) get an empty data table
    combos = agg.grouped_count(enr, ["service", "server"]).to_pandas()
    paths = []
    for r in combos.itertuples():
        g = counts[(counts["service"] == r.service)
                   & (counts["server"] == r.server)]
        g = g.sort_values(["cnt", "country"], ascending=[False, True])
        path = os.path.join(out_dir,
                            f"{r.service}_intrusion_attempts_{r.server}.html")
        paths.append(write_country_report(g, path))
    return paths
