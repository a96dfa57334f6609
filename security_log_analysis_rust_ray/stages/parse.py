"""Route-and-parse stage: one vectorized map_batches pass over transcripts.

Mirrors the reference's daemon router (/root/reference/src/parse_logs.rs:337-371):

  1. negative filters drop the line outright (src/parse_logs.rs:339-345);
  2. contains "Invalid user"  -> ssh parse; parse failure drops the line
     (parse_sshd errors on no-match, src/parse_logs.rs:401-411);
  3. contains "nginx"         -> nginx parse; on failure FALL THROUGH
     (no `continue` on None, src/parse_logs.rs:354-363);
  4. [extension] CLF regex    -> apache parse (the reference handles apache
     via its separate batch file path, src/parse_logs.rs:208-232; our single
     transcript stream unifies both routers);
  5. level classifier -> message sink; level-less lines drop
     (src/models.rs:561-580 None => skipped, src/parse_logs.rs:364-371).

Output is a single routed table: intrusion rows (sink='ssh'|'nginx'|'apache')
carry (service, server, datetime, host, username); message rows
(sink='message') carry (log_level).  Downstream sinks are cheap Arrow filters
on `sink` — the expensive regex work happens exactly once per input row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import grok

PARSED_COLUMNS = [
    "conv_id", "turn_idx", "service", "server", "datetime",
    "host", "username", "ts", "text",
]
MESSAGE_COLUMNS = [
    "conv_id", "turn_idx", "log_level", "log_unit", "log_message", "log_timestamp",
]


def route_parse(batch: pa.Table) -> pa.Table:
    """The single-pass router+parser. Stateless; pyarrow in/out."""
    text = batch["text"]
    ts = batch["ts"]
    n = len(batch)

    keep = pc.invert(grok.negative_filter_mask(text))

    is_ssh_line = pc.and_(keep, pc.match_substring(text, "Invalid user"))
    ssh_host, ssh_user, ssh_dt, ssh_ok = grok.extract_ssh(text, pc.year(ts))
    ssh_ok = pc.and_(is_ssh_line, ssh_ok)

    not_ssh = pc.and_(keep, pc.invert(is_ssh_line))
    is_nginx_line = pc.and_(not_ssh, pc.match_substring(text, "nginx"))
    ng_ip, ng_ok = grok.extract_nginx(text)
    ng_ok = pc.and_(is_nginx_line, ng_ok)

    # nginx parse failures fall through (reference has no `continue` there)
    rest = pc.and_(not_ssh, pc.invert(ng_ok))
    ap_host, ap_dt, ap_ok = grok.extract_apache(text)
    ap_ok = pc.and_(rest, ap_ok)

    msg_path = pc.and_(rest, pc.invert(ap_ok))
    level = grok.classify_level(text)
    msg_ok = pc.and_(msg_path, pc.is_valid(level))

    intrusion = pc.or_(ssh_ok, pc.or_(ng_ok, ap_ok))

    null_s = pa.nulls(n, pa.string())
    sink = pc.if_else(ssh_ok, pa.scalar("ssh"),
           pc.if_else(ng_ok, pa.scalar("nginx"),
           pc.if_else(ap_ok, pa.scalar("apache"),
           pc.if_else(msg_ok, pa.scalar("message"), null_s))))

    ts_arr = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
    datetime = pc.if_else(ssh_ok, ssh_dt, pc.if_else(ap_ok, ap_dt, ts_arr))
    datetime = pc.if_else(intrusion, datetime, pa.nulls(n, pa.timestamp("us")))
    host = pc.if_else(ssh_ok, ssh_host,
           pc.if_else(ng_ok, ng_ip,
           pc.if_else(ap_ok, ap_host, null_s)))
    # username: ssh keeps the (possibly empty) extracted user; apache/nginx
    # rows store null (src/parse_logs.rs:228,426)
    username = pc.if_else(ssh_ok, ssh_user, null_s)
    server = pc.if_else(intrusion, grok.server_from_conv(batch["conv_id"]), null_s)
    log_level = pc.if_else(msg_ok, level, null_s)

    out = pa.table({
        "conv_id": batch["conv_id"],
        "turn_idx": batch["turn_idx"],
        "role": batch["role"],
        "tool": batch["tool"],
        "ts": batch["ts"],
        "text": batch["text"],
        "sink": sink,
        "service": pc.if_else(intrusion, sink, null_s),
        "server": server,
        "datetime": datetime,
        "host": host,
        "username": username,
        "log_level": log_level,
    })
    return out.filter(pc.is_valid(sink))


def intrusion_view(routed: pa.Table) -> pa.Table:
    """Project routed rows to the parsed/ sink schema (reference
    intrusion_log, src/models.rs:193-200 + carried turn identity)."""
    t = routed.filter(pc.invert(pc.equal(routed["sink"], "message")))
    return t.select(PARSED_COLUMNS)


def message_view(routed: pa.Table) -> pa.Table:
    """Project routed rows to the messages/ sink schema (reference
    systemd_log_messages, src/models.rs:658-665; log_unit <- tool)."""
    t = routed.filter(pc.equal(routed["sink"], "message"))
    return pa.table({
        "conv_id": t["conv_id"],
        "turn_idx": t["turn_idx"],
        "log_level": t["log_level"],
        "log_unit": t["tool"],
        "log_message": t["text"],
        "log_timestamp": t["ts"],
    })
