"""Streaming-shaped semantics (reference §2.10) on the batch engine.

Ray Data has no event-time windows; each window IS a groupby on a derived
window key, with per-window logic in a vectorized map_groups/map_batches
(see the Ray guide's 'Streaming-shaped workloads').  Ordering assumption:
rows of one key are processed together, sorted by ts inside the group.

- sessionize: gap-based session windows per user over the events table
  (the generic stream-sessionization op a transcript pipeline needs).
- alert_batches: the reference's alert loop (src/parse_logs.rs:447-506)
  buffers messages and flushes when the oldest buffered message is older
  than `alert_log_delay` seconds OR the buffer exceeds `alert_buffer_size`
  bytes.  Batch re-statement: within each (log_level >= threshold) stream,
  assign flush-batch ids by scanning the sorted messages and cutting a new
  batch when either bound would be exceeded.
- watermark_resume: incremental-load filter against a persisted watermark
  (A4; strictly-newer rows pass, late rows drop, src/parse_logs.rs:180-197).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..sources.readers import read_table
from . import reports

SESSION_GAP_S = 1800          # 30 min
ALERT_DELAY_S = 60            # reference default alert_log_delay
ALERT_BUFFER_BYTES = 10_000   # reference default alert_buffer_size
LEVEL_ORDER = {"debug": 0, "info": 1, "warn": 2, "error": 3}


def sessionize(sf_dir: str, gap_s: int = SESSION_GAP_S) -> rd.Dataset:
    """Session windows per user_id: a new session starts when the gap to the
    previous event exceeds ``gap_s``.  Output: one row per session with
    event count and span.  Oracle-checkable via SQL window functions."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy()
        # microsecond comparison on both engine and oracle sides (second
        # truncation at the boundary would diverge)
        gaps = np.diff(ts).astype("timedelta64[us]").astype(np.int64)
        new_session = np.concatenate([[True], gaps > gap_s * 1_000_000])
        sid = np.cumsum(new_session)
        out = g.assign(session=sid).groupby("session").agg(
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("event_id", "count"))
        out = out.reset_index(drop=True)
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def alert_batches(sf_dir: str, threshold: str = "warn",
                  delay_s: int = ALERT_DELAY_S,
                  buffer_bytes: int = ALERT_BUFFER_BYTES) -> rd.Dataset:
    """K6 analog: group at-or-above-threshold messages into flush batches.

    Per (log_level-filtered) message stream ordered by ts: start a new batch
    when adding the message would exceed ``buffer_bytes`` OR the batch's
    first message is more than ``delay_s`` older than this one.  Output one
    row per alert batch (flush manifest): batch_id, first/last ts, n
    messages, total bytes.  Sequential-scan semantics are inherently
    per-stream; the stream here is one group (server-shard analog would be
    the partition key at scale)."""
    lvl = LEVEL_ORDER[threshold]
    ds = reports.messages(sf_dir).map_batches(
        lambda b: b.filter(pc.is_in(
            b["log_level"],
            value_set=pa.array([k for k, v in LEVEL_ORDER.items() if v >= lvl]))),
        batch_format="pyarrow", batch_size=None)

    def batch_scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["log_timestamp", "conv_id", "turn_idx"])
        sizes = g["log_message"].str.len().to_numpy()
        ts = g["log_timestamp"].to_numpy()
        batch_ids = np.zeros(len(g), dtype=np.int64)
        cur, cur_bytes, cur_start = 0, 0, ts[0] if len(g) else None
        for i in range(len(g)):
            age = (ts[i] - cur_start).astype("timedelta64[s]").astype(int)
            if cur_bytes + sizes[i] > buffer_bytes or age > delay_s:
                cur += 1
                cur_bytes, cur_start = 0, ts[i]
            batch_ids[i] = cur
            cur_bytes += sizes[i]
        out = g.assign(batch_id=batch_ids, nbytes=sizes).groupby("batch_id").agg(
            first_ts=("log_timestamp", "min"), last_ts=("log_timestamp", "max"),
            n_messages=("log_level", "count"), total_bytes=("nbytes", "sum"))
        return out.reset_index()

    # single logical stream (add a key column for the grouped scan)
    keyed = ds.map_batches(
        lambda b: b.append_column("stream", pa.array(["all"] * len(b))),
        batch_format="pyarrow", batch_size=None)
    out = keyed.groupby("stream").map_groups(batch_scan, batch_format="pandas")
    return out


def watermark_filter(ds: rd.Dataset, watermark: str) -> rd.Dataset:
    """A4 consumption as a reusable stage: strictly-newer rows pass."""
    cutoff = pa.scalar(watermark).cast(pa.timestamp("us"))
    return ds.map_batches(
        lambda b: b.filter(pc.greater(b["datetime"], cutoff)),
        batch_format="pyarrow", batch_size=None)
