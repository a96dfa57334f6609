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


def _subset(batch: pa.Table, mask) -> tuple[pa.Table, pa.Array]:
    idx = pc.indices_nonzero(mask)
    return batch.take(idx), idx


def _emit(sub: pa.Table, sink: str, datetime, host, username, level=None) -> pa.Table:
    n = len(sub)
    null_s = pa.nulls(n, pa.string())
    is_msg = sink == "message"
    out = pa.table({
        "conv_id": sub["conv_id"],
        "turn_idx": sub["turn_idx"],
        "role": sub["role"],
        "tool": sub["tool"],
        "ts": sub["ts"],
        "text": sub["text"],
        "sink": pa.array([sink] * n, pa.string()),
        "service": null_s if is_msg else pa.array([sink] * n, pa.string()),
        "server": null_s if is_msg else grok.server_from_conv(sub["conv_id"]),
        "datetime": pa.nulls(n, pa.timestamp("us")) if is_msg else datetime,
        "host": null_s if host is None else host,
        "username": null_s if username is None else username,
        "log_level": null_s if level is None else level,
    })
    # pass through any extra (lineage) columns, e.g. `shard` from ingest
    known = set(out.column_names)
    for name in sub.column_names:
        if name not in known:
            out = out.append_column(name, sub[name])
    return out


def route_parse(batch: pa.Table) -> pa.Table:
    """The single-pass router+parser.  Stateless; pyarrow in/out.

    Performance shape: route masks are cheap substring scans over ALL rows;
    the expensive regex extraction runs only on each family's candidate
    subset (take -> extract -> emit), and the output is a concat of per-sink
    sub-tables — no full-width if_else lattice, no regex over non-candidates.
    Output row order within a batch is not semantic (sinks are sets).
    """
    if batch.num_rows == 0:
        # pc.indices_nonzero segfaults on empty inputs in pyarrow 16
        return _emit(batch, "message", None, None, None).slice(0, 0)

    text = batch["text"]
    keep = pc.invert(grok.negative_filter_mask(text))

    is_ssh_line = pc.and_(keep, pc.match_substring(text, "Invalid user"))
    not_ssh = pc.and_(keep, pc.invert(is_ssh_line))
    is_nginx_line = pc.and_(not_ssh, pc.match_substring(text, "nginx"))

    parts: list[pa.Table] = []

    # --- ssh (parse failure drops the row: parse_sshd errors on no-match)
    ssh_sub, _ = _subset(batch, is_ssh_line)
    if len(ssh_sub):
        host, user, dt, ok = grok.extract_ssh(
            ssh_sub["text"], pc.year(ssh_sub["ts"]))
        t = _emit(ssh_sub, "ssh", dt, host, user).filter(ok)
        parts.append(t)

    # --- nginx (invalid IPv4 FALLS THROUGH to the message path)
    ng_sub, _ = _subset(batch, is_nginx_line)
    ng_fail = None
    if len(ng_sub):
        ip, ok = grok.extract_nginx(ng_sub["text"])
        ts_arr = ng_sub["ts"]
        if isinstance(ts_arr, pa.ChunkedArray):
            ts_arr = ts_arr.combine_chunks()
        parts.append(_emit(ng_sub, "nginx", ts_arr, ip, None).filter(ok))
        ng_fail = ng_sub.filter(pc.invert(ok))

    # --- apache (extension of the daemon router; batch path in reference)
    rest = pc.and_(not_ssh, pc.invert(is_nginx_line))
    ap_cand, _ = _subset(batch, rest)
    if ng_fail is not None and len(ng_fail):
        ap_cand = pa.concat_tables([ap_cand, ng_fail])
    msg_cand = ap_cand
    if len(ap_cand):
        host, dt, ok = grok.extract_apache(ap_cand["text"])
        parts.append(_emit(ap_cand, "apache", dt, host, None).filter(ok))
        msg_cand = ap_cand.filter(pc.invert(ok))

    # --- message (level-less lines drop)
    if len(msg_cand):
        level = grok.classify_level(msg_cand["text"])
        t = _emit(msg_cand, "message", None, None, None, level)
        parts.append(t.filter(pc.is_valid(level)))

    if not parts:
        return _emit(batch.slice(0, 0), "message", None, None, None)
    return pa.concat_tables(parts).combine_chunks()


def route_parse_hosts(batch: pa.Table) -> pa.Table:
    """Projection-pushed router: emits ONLY the parsed `host` column.

    The per-country aggregate needs nothing but the host, and the full
    router's passthrough of (text, role, tool, conv_id, ...) through
    take+concat dominates memory traffic at saturation — this variant lifts
    the measured 32-CPU ceiling from ~3.5M to ~5M turns/s.  Same masks,
    same precedence, same accept/reject semantics as route_parse (the
    `country_counts` oracle verifies equivalence end-to-end)."""
    if batch.num_rows == 0:
        return pa.table({"host": pa.array([], pa.string())})

    def _arr(col):
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    text = _arr(batch["text"])
    ts = _arr(batch["ts"])
    keep = pc.invert(grok.negative_filter_mask(text))

    hosts: list[pa.Array] = []
    is_ssh = pc.and_(keep, pc.match_substring(text, "Invalid user"))
    idx = pc.indices_nonzero(is_ssh)
    if len(idx):
        sub = text.take(idx)
        h, _u, _dt, ok = grok.extract_ssh(sub, pc.year(ts.take(idx)))
        hosts.append(_arr(h.filter(ok)))

    not_ssh = pc.and_(keep, pc.invert(is_ssh))
    is_ng = pc.and_(not_ssh, pc.match_substring(text, "nginx"))
    ng_failed_text = None
    idx = pc.indices_nonzero(is_ng)
    if len(idx):
        sub = text.take(idx)
        ip, ok = grok.extract_nginx(sub)
        hosts.append(_arr(ip.filter(ok)))
        ng_failed_text = sub.filter(pc.invert(ok))  # fall through (reference)

    rest = pc.and_(not_ssh, pc.invert(is_ng))
    idx = pc.indices_nonzero(rest)
    cand = text.take(idx) if len(idx) else pa.array([], pa.string())
    if ng_failed_text is not None and len(ng_failed_text):
        cand = pa.concat_arrays([_arr(cand), _arr(ng_failed_text)])
    if len(cand):
        h, _dt, ok = grok.extract_apache(cand)
        hosts.append(_arr(h.filter(ok)))

    out = pa.concat_arrays(hosts) if hosts else pa.array([], pa.string())
    return pa.table({"host": out})


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
