"""Export sinks (K2-K5, S8), parser registry, and streaming-shaped ops."""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
import pyarrow as pa
import pytest

from security_log_analysis_rust_ray.pipelines import reports as R
from security_log_analysis_rust_ray.pipelines import streaming as STR
from security_log_analysis_rust_ray.sources import exports as X
from security_log_analysis_rust_ray.stages import registry
from .conftest import SF_SMOKE, canonicalize


@pytest.mark.usefixtures("ray_session")
def test_month_partitioned_merge_on_write(tmp_path):
    out = str(tmp_path / "monthly")
    ds = R.parsed(SF_SMOKE)
    r1 = X.export_month_partitioned(ds, out)
    assert r1, "must produce at least one (year, month) partition"
    assert all(p.startswith("year=") for p in r1)
    mtimes = {p: os.stat(os.path.join(out, p)).st_mtime_ns for p in r1}
    # rerun: merge finds identical content -> every partition skipped
    r2 = X.export_month_partitioned(R.parsed(SF_SMOKE), out)
    assert r2 == r1
    for p in r1:
        assert os.stat(os.path.join(out, p)).st_mtime_ns == mtimes[p], (
            f"{p} rewritten although unchanged")
    # merged content equals straight dedup of the input
    import ray.data as rd
    got = rd.read_parquet(out).to_pandas()
    got = canonicalize(got.drop(columns=[c for c in ("year", "month")
                                         if c in got.columns]))
    exp = canonicalize(R.parsed_dedup(SF_SMOKE).to_pandas())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_pairwise_merge_and_json_roundtrip(tmp_path):
    import ray.data as rd
    a, b, out = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "m")
    full = R.parsed(SF_SMOKE).to_pandas() \
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    rd.from_pandas(full.iloc[:100]).write_parquet(a)
    rd.from_pandas(full.iloc[:150]).write_parquet(b)  # 100-row overlap
    n = X.merge_parquet_pair(a, b, out)
    from security_log_analysis_rust_ray.stages.dedup import NATURAL_KEY
    expected = len(full.iloc[:150].drop_duplicates(NATURAL_KEY))
    assert n == expected

    jdir = str(tmp_path / "j")
    X.export_json(R.messages(SF_SMOKE), jdir, limit=50)
    files = glob.glob(os.path.join(jdir, "*.json"))
    assert files
    rows = [json.loads(line) for f in files for line in open(f) if line.strip()]
    assert len(rows) == 50
    back = X.import_json(jdir)
    assert back.count() == 50
    assert set(back.schema().names) >= {"conv_id", "log_level", "log_message"}


@pytest.mark.usefixtures("ray_session")
def test_country_report_writer(tmp_path):
    """Geochart parity (reference templates/COUNTRY_TEMPLATE.html:10-14 +
    src/parse_opts.rs:176-204): the marker is fully substituted with
    `["Country", N]` rows matching the aggregate."""
    counts = R.country_counts(SF_SMOKE)
    p = X.write_country_report(counts, str(tmp_path / "report.html"))
    html = open(p).read()
    assert "PUTLISTOFCOUNTRIES" not in html          # marker substituted
    assert "geochart" in html and "arrayToDataTable" in html
    df = counts.to_pandas()
    # every (country, cnt) row appears in the substituted field verbatim
    for r in df.itertuples():
        assert f'["{r.country}", {r.cnt}]' in html
    # per-(service, server) fan-out writes the reference's file names
    paths = X.write_country_reports_per_sink(SF_SMOKE, str(tmp_path / "rep"))
    assert paths
    names = {os.path.basename(p) for p in paths}
    assert all("_intrusion_attempts_" in n and n.endswith(".html")
               for n in names)
    services = {n.split("_")[0] for n in names}
    assert services == {"ssh", "apache", "nginx"}


@pytest.mark.usefixtures("ray_session")
def test_parser_registry_extension():
    import ray.data as rd

    def upper_parser(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"conv_id": b["conv_id"],
                         "shout": pc.utf8_upper(b["text"])})

    registry.register_parser("shout", upper_parser, replace=True)
    assert "routed" in registry.registered_parsers()
    ds = registry.parse_with(
        "shout",
        rd.read_parquet(
            __import__("security_log_analysis_rust_ray.synth", fromlist=["x"])
            .ensure_transcripts(SF_SMOKE)))
    row = ds.limit(1).to_pandas().iloc[0]
    assert row["shout"] == row["shout"].upper()
    with pytest.raises(ValueError):
        registry.register_parser("shout", upper_parser)


@pytest.mark.usefixtures("ray_session")
def test_alert_batches_invariants():
    df = STR.alert_batches(SF_SMOKE).to_pandas()
    assert len(df) > 0
    # every batch respects the byte bound (single messages may not exceed it)
    from security_log_analysis_rust_ray.config import get_config
    assert (df["total_bytes"] <= get_config().alert_buffer_size).all()
    # batches cover all at-or-above-threshold messages exactly once
    lvl_rows = R.messages(SF_SMOKE).to_pandas()
    n_eligible = (lvl_rows["log_level"].isin(["warn", "error"])).sum()
    assert df["n_messages"].sum() == n_eligible
    # flush manifests are time-ordered and non-overlapping WITHIN a stream
    # (the scan shards per server stream since r02)
    assert df["stream"].nunique() > 1
    for _s, g in df.groupby("stream"):
        g = g.sort_values("batch_id")
        assert (g["first_ts"] <= g["last_ts"]).all()
        assert (g["first_ts"].iloc[1:].to_numpy()
                >= g["last_ts"].iloc[:-1].to_numpy()).all()


def test_ses_email_stats_fold():
    """A6 (src/ses_client.rs:68-109): the EmailStats fold is consistent
    with the alert-batch universe, and a lower threshold admits rejects."""
    stats = STR.ses_email_stats(SF_SMOKE)
    assert len(stats) == 1
    row = stats.iloc[0]
    batches = STR.alert_batches(SF_SMOKE).to_pandas()
    # delivery_attempts == all alerted messages; counters partition them
    assert row["delivery_attempts"] == batches["n_messages"].sum()
    assert (row["bounces"] + row["complaints"] + row["rejects"]
            == row["delivery_attempts"])
    assert row["rejects"] == 0  # threshold=warn admits only warn/error
    # datapoint timestamps bracket the batch first_ts universe
    assert row["min_timestamp"] == batches["first_ts"].min()
    assert row["max_timestamp"] == batches["first_ts"].max()
    assert 0 < row["sent_last_24h"] <= row["delivery_attempts"]
    # threshold=info admits info-level messages as rejects
    lower = STR.ses_email_stats(SF_SMOKE, threshold="info").iloc[0]
    assert lower["rejects"] > 0
    assert lower["delivery_attempts"] > row["delivery_attempts"]


@pytest.mark.usefixtures("ray_session")
def test_alert_cycle_mark_processed(tmp_path):
    """The alert state machine: a rerun with no new messages re-alerts
    NOTHING (processed_time restart-safety,
    /root/reference/src/models.rs:713-720)."""
    state = str(tmp_path / "alert_state.jsonl")
    first = STR.run_alert_cycle(SF_SMOKE, state)
    assert len(first) > 0
    total = first["n_messages"].sum()
    again = STR.run_alert_cycle(SF_SMOKE, state)
    assert len(again) == 0, "rerun must not re-alert flushed messages"
    # full-batch parity: one cycle from clean state flushes exactly the
    # alert_batches universe
    assert total == STR.alert_batches(SF_SMOKE).to_pandas()["n_messages"].sum()


def test_cli_surface(tmp_path):
    """The reference's CLI subcommands (parse_opts.rs:34-87) re-expressed:
    drive `python -m security_log_analysis_rust_ray` end-to-end in a
    subprocess (owns its own Ray session)."""
    import json as _json
    import subprocess, sys
    out = subprocess.run(
        [sys.executable, "-m", "security_log_analysis_rust_ray",
         "cleanup", "--sf-dir", "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-500:]
    stats = _json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["rows"] - stats["after_dedup"] == stats["duplicates_removed"]
    assert stats["duplicates_removed"] > 0  # engineered dedup delta


@pytest.mark.usefixtures("ray_session")
def test_two_writer_sync_reconciliation(tmp_path):
    """S3-sync analog (reference src/s3_sync.rs:130-231,337-348): etag-diff
    flag computation + conflict merge; second sync is all-noop."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from security_log_analysis_rust_ray.sources import sync as SY

    def mk_rows(convs):
        n = len(convs)
        return pa.table({
            "service": pa.array(["ssh"] * n), "server": pa.array(["s0"] * n),
            "datetime": pa.array([1700000000000000] * n, pa.timestamp("us")),
            "host": pa.array([f"h{c}.example.com" for c in convs]),
            "username": pa.array(["u"] * n),
            "ts": pa.array([1700000000000000 + i for i in range(n)],
                           pa.timestamp("us")),
            "conv_id": pa.array(convs),
            "turn_idx": pa.array([0] * n, pa.int32()),
        })

    local, remote = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(local), os.makedirs(remote)
    pq.write_table(mk_rows(["a", "b"]), os.path.join(local, "only_local.parquet"))
    pq.write_table(mk_rows(["c"]), os.path.join(remote, "only_remote.parquet"))
    pq.write_table(mk_rows(["x", "y"]), os.path.join(local, "conflict.parquet"))
    pq.write_table(mk_rows(["x", "z"]), os.path.join(remote, "conflict.parquet"))

    plan = {i.key: i.action for i in SY.sync_plan(local, remote)}
    assert plan == {"only_local.parquet": "upload",
                    "only_remote.parquet": "download",
                    "conflict.parquet": "merge"}

    SY.run_sync(local, remote)
    # both sides converged byte-identically per key
    ls, rs = SY.scan_store(local), SY.scan_store(remote)
    assert set(ls) == set(rs) == {"only_local.parquet", "only_remote.parquet",
                                  "conflict.parquet"}
    assert all(ls[k]["etag"] == rs[k]["etag"] for k in ls)
    # merged conflict = keep-first union on the natural key
    merged = pq.read_table(os.path.join(local, "conflict.parquet")).to_pandas()
    assert sorted(merged["conv_id"]) == ["x", "y", "z"]
    # second pass: pure noop
    assert all(i.action == "noop" for i in SY.sync_plan(local, remote))


@pytest.mark.usefixtures("ray_session")
def test_sync_conflict_merge_of_empty_files(tmp_path):
    """ADVICE r02: two conflicting files that BOTH hold zero rows (but
    differ byte-wise, e.g. different writer metadata) crashed the merge
    with ArrowInvalid on an empty concat — it must converge to an empty
    file with the merged schema instead."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from security_log_analysis_rust_ray.sources import sync as SY

    schema = pa.schema([
        ("service", pa.string()), ("server", pa.string()),
        ("datetime", pa.timestamp("us")), ("host", pa.string()),
        ("username", pa.string()), ("ts", pa.timestamp("us")),
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ])
    local, remote = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(local), os.makedirs(remote)
    empty = schema.empty_table()
    pq.write_table(empty, os.path.join(local, "e.parquet"),
                   compression="snappy")
    pq.write_table(empty, os.path.join(remote, "e.parquet"),
                   compression="none")   # different bytes -> etag conflict

    plan = {i.key: i.action for i in SY.sync_plan(local, remote)}
    assert plan == {"e.parquet": "merge"}
    SY.run_sync(local, remote)
    t = pq.read_table(os.path.join(local, "e.parquet"))
    assert t.num_rows == 0 and set(t.schema.names) == set(schema.names)
    assert all(i.action == "noop" for i in SY.sync_plan(local, remote))


@pytest.mark.usefixtures("ray_session")
def test_alert_cycle_watermark_tie_not_lost(tmp_path):
    """A message sharing the stream watermark's exact microsecond that
    arrives AFTER the flush must still alert (r03 review: identity by
    timestamp alone silently dropped it).  Simulated by deleting one
    at_wm identity from the persisted state — the next cycle flushes
    exactly that message, and the cycle after that is empty again."""
    import json

    state = str(tmp_path / "alert_state.jsonl")
    first = STR.run_alert_cycle(SF_SMOKE, state)
    assert len(first) > 0

    lines = [json.loads(ln) for ln in open(state)]
    victim = next(ln for ln in lines if ln.get("watermark")
                  and ln.get("at_wm"))
    removed = victim["at_wm"].pop()
    with open(state, "w") as fh:
        for ln in lines:
            fh.write(json.dumps(ln) + "\n")

    again = STR.run_alert_cycle(SF_SMOKE, state)
    assert len(again) == 1 and int(again["n_messages"].sum()) == 1
    assert again["stream"].iloc[0] == victim["shard"] if "shard" in victim \
        else True
    # the re-flushed identity is recorded again: third cycle is a no-op
    third = STR.run_alert_cycle(SF_SMOKE, state)
    assert len(third) == 0


@pytest.mark.usefixtures("ray_session")
def test_alert_knobs_resolve_from_config_at_call_time():
    """config.override() must affect alert pipelines without re-import
    (r03 review: knobs were frozen at module import), and
    alert_log_level is actually consumed as the threshold default."""
    from security_log_analysis_rust_ray.config import override, set_config

    base = STR.alert_batches(SF_SMOKE).to_pandas()
    prev = override(alert_log_level="error", alert_buffer_size=500)
    try:
        strict = STR.alert_batches(SF_SMOKE).to_pandas()
    finally:
        set_config(prev)
    assert (strict["total_bytes"] <= 500).all()
    assert strict["n_messages"].sum() < base["n_messages"].sum()


def test_cli_datacard(tmp_path):
    """datacard subcommand: one JSON artifact composing the curation-health
    ops; internal consistency checks (dup rate, split total, weight sum)."""
    import json as _json
    import subprocess, sys
    card_path = str(tmp_path / "card.json")
    out = subprocess.run(
        [sys.executable, "-m", "security_log_analysis_rust_ray",
         "datacard", "--sf-dir", "/root/testdata/sf0.001",
         "--out", card_path],
        capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-500:]
    card = _json.load(open(card_path))
    assert card["n_base_docs"] == sum(card["splits"].values())
    assert card["n_docs"] >= card["n_base_docs"]
    assert 0 < card["n_unique_texts"] <= card["n_docs"]
    assert abs(card["exact_dup_rate"]
               - (1 - card["n_unique_texts"] / card["n_docs"])) < 1e-6
    assert abs(sum(card["mix_weights"].values()) - 1.0) < 1e-3
    assert len(card["sources"]) == len(card["mix_weights"])
    assert list(card["token_quantiles"]) == ["0.25", "0.5", "0.9", "0.99"]


def test_cli_curate(tmp_path):
    """curate subcommand: split-partitioned curated corpus on disk; the
    per-split report sums to the doc total and split dirs exist."""
    import json as _json
    import os
    import subprocess, sys
    out_dir = str(tmp_path / "corpus")
    out = subprocess.run(
        [sys.executable, "-m", "security_log_analysis_rust_ray",
         "curate", "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir],
        capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-500:]
    rep = _json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["docs_out"] == sum(rep["per_split"].values()) > 0
    dirs = {d for d in os.listdir(out_dir) if d.startswith("split=")}
    assert dirs == {f"split={k}" for k in rep["per_split"]}


def test_cli_shuffle(tmp_path):
    """shuffle subcommand: shard-partitioned epoch shuffle on disk —
    shards cover the corpus exactly once, per-shard files hold contiguous
    key ranges, and the same epoch reproduces identical bytes."""
    import json as _json
    import os
    import subprocess, sys
    import pyarrow.parquet as pq
    out_dir = str(tmp_path / "e0")
    cmd = [sys.executable, "-m", "security_log_analysis_rust_ray",
           "shuffle", "--sf-dir", "/root/testdata/sf0.001",
           "--out", out_dir, "--epoch", "3"]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-500:]
    rep = _json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["docs"] == sum(rep["per_shard"].values())
    dirs = sorted(d for d in os.listdir(out_dir) if d.startswith("shard="))
    assert len(dirs) == 8
    # shard key ranges must be disjoint and ordered (range partitioning)
    prev_max = -1
    for d in dirs:  # shard=0..7 sort lexically fine for single digits
        t = pq.read_table(os.path.join(out_dir, d),
                          columns=["shuffle_key"])
        keys = t["shuffle_key"].to_pylist()
        assert min(keys) > prev_max
        prev_max = max(keys)
    # same epoch -> identical content on a rerun into a fresh dir
    out_dir2 = str(tmp_path / "e0b")
    cmd2 = cmd[:-3] + [out_dir2, "--epoch", "3"]
    assert subprocess.run(cmd2, capture_output=True, text=True,
                          timeout=420).returncode == 0
    a = pq.read_table(out_dir).sort_by("doc_id")
    b = pq.read_table(out_dir2).sort_by("doc_id")
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_tumbling_window_late_multiblock_vs_reference(monkeypatch):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from security_log_analysis_rust_ray.pipelines import streaming as S

    rng = np.random.RandomState(3)
    n = 5000
    base = 1_700_000_000_000_000  # us epoch
    ts = base + np.sort(rng.randint(0, 3 * 24, n).astype(np.int64)) \
        * 3_600_000_000 // 2      # half-hour-ish steps over 3 days
    eid = np.arange(n, dtype=np.int64)
    tbl = pa.table({"event_id": eid,
                    "ts": pa.array(ts, pa.timestamp("us"))})
    monkeypatch.setattr(
        S, "read_table",
        lambda sf, name, columns=None: rd.from_arrow(tbl).repartition(9))
    got = S.events_tumbling_window_late("unused").to_pandas()

    # sequential reference
    et = ts - np.where(eid % S.LATE_EVERY == 0, S.LATE_DELAY_US, 0)
    wm = -(1 << 62)
    ref = {}
    for t in et:
        w = t - t % S.WINDOW_US
        late = (w + S.WINDOW_US) <= (wm - S.LATENESS_US)
        on, lt = ref.get(w, (0, 0))
        ref[w] = (on + (not late), lt + late)
        wm = max(wm, t)
    assert len(got) == len(ref)
    total_late = 0
    for _, row in got.iterrows():
        w = int(row["w_start"].value // 1000) * 1000 \
            if hasattr(row["w_start"], "value") else int(row["w_start"])
        w_us = int(pd.Timestamp(row["w_start"]).value // 1000)
        on, lt = ref[w_us]
        assert (row["cnt_on_time"], row["cnt_late_dropped"]) == (on, lt)
        total_late += row["cnt_late_dropped"]
    assert total_late > 0                      # late data genuinely occurs
    assert got["cnt_on_time"].sum() + total_late == n
