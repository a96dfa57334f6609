"""Vectorized grok/regex extraction kernels (pyarrow.compute, zero-copy).

Re-expresses the reference's per-line Rust parsers as Arrow-vectorized batch
kernels.  Semantics mirrored (reference file:line cited per function):

- ssh  "Invalid user X from HOST port P"  -> /root/reference/src/parse_logs.rs:58-116
- apache CLF access line                  -> /root/reference/src/parse_logs.rs:208-232
- nginx journald (3rd token must be IPv4) -> /root/reference/src/parse_logs.rs:413-429
- level classifier err>warn>info>debug    -> /root/reference/src/models.rs:561-580
- router precedence filters>ssh>nginx>lvl -> /root/reference/src/parse_logs.rs:337-371

Every kernel is (pa.Array|ChunkedArray in) -> Arrow out; no Python row loops.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..synth import SERVER_MOD, SYSTEMD_LOG_FILTERS

# RE2 patterns (pyarrow.compute uses RE2 syntax).  The ssh pattern fuses the
# syslog-timestamp prefix and the grok body into ONE extract pass (the
# reference requires a parseable syslog prefix anyway and errors otherwise,
# src/parse_logs.rs:97-105 — prefix-less lines fail there too).
SSH_RE = (
    r"^(?P<mon>[A-Za-z]{3}) +(?P<day>\d{1,2}) (?P<hms>\d{2}:\d{2}:\d{2})"
    r".*Invalid user (?P<username>.*?) from (?P<host>\S+) port"
)
APACHE_RE = (
    r"^(?P<host>\S+) \S+ \S+ \[(?P<dts>\d{1,2}/[A-Za-z]{3}/\d{4}:\d{2}:\d{2}:\d{2})"
    r" (?P<sign>[+-])(?P<oh>\d{2})(?P<om>\d{2})\]"
)
NGINX_RE = r"^\S+ \S+ (?P<ip>\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})(?: |$)"
OCTETS_RE = r"^(?P<a>\d{1,3})\.(?P<b>\d{1,3})\.(?P<c>\d{1,3})\.(?P<d>\d{1,3})$"

USERNAME_MAX = 15  # src/parse_logs.rs:64-70
HOST_MAX = 60      # src/parse_logs.rs:78-83


def _field(struct_arr, name):
    return pc.struct_field(struct_arr, name)


_FILTERS_RE = "|".join(re.escape(p) for p in SYSTEMD_LOG_FILTERS)


def negative_filter_mask(text) -> pa.Array:
    """True where the line matches ANY systemd_log_filters pattern (drop it).

    Reference: src/parse_logs.rs:339-345 + defaults src/config.rs:38-45.
    One RE2 alternation pass over the column instead of one substring scan
    per pattern (memory-bandwidth matters at 32 cores).
    """
    return pc.match_substring_regex(text, _FILTERS_RE)


def extract_ssh(text, year):
    """(host, username, datetime, ok) for sshd 'Invalid user' lines.

    username truncated to 15, host truncated to 60 and must contain '.'
    (src/parse_logs.rs:58-84); syslog timestamp with caller-injected year,
    normalized UTC (src/parse_logs.rs:88-116 — year from file mtime there,
    from the turn's ts column here).
    """
    g = pc.extract_regex(text, SSH_RE)
    username = pc.utf8_slice_codeunits(_field(g, "username"), 0, USERNAME_MAX)
    host = pc.utf8_slice_codeunits(_field(g, "host"), 0, HOST_MAX)
    year_s = pc.cast(year, pa.string())
    ts_str = pc.binary_join_element_wise(
        _field(g, "mon"), _field(g, "day"), year_s, _field(g, "hms"), " "
    )
    dt = pc.strptime(ts_str, format="%b %d %Y %H:%M:%S", unit="us", error_is_null=True)
    ok = pc.and_kleene(
        pc.and_kleene(pc.is_valid(host), pc.match_substring(host, ".")),
        pc.is_valid(dt),
    )
    ok = pc.fill_null(ok, False)
    return host, username, dt, ok


def extract_apache(text):
    """(host, datetime_utc, ok) for CLF access-log lines.

    host = first token, >=1 '.', truncated to 60; timestamp from the bracket
    with explicit UTC-offset arithmetic (src/parse_logs.rs:208-232); username
    is always null (src/parse_logs.rs:228).
    """
    g = pc.extract_regex(text, APACHE_RE)
    host = pc.utf8_slice_codeunits(_field(g, "host"), 0, HOST_MAX)
    local = pc.strptime(
        _field(g, "dts"), format="%d/%b/%Y:%H:%M:%S", unit="us", error_is_null=True
    )
    oh = pc.cast(_field(g, "oh"), pa.int64())
    om = pc.cast(_field(g, "om"), pa.int64())
    minutes = pc.add(pc.multiply(oh, 60), om)
    neg = pc.equal(_field(g, "sign"), "-")
    signed_min = pc.if_else(neg, pc.negate(minutes), minutes)
    off_us = pc.cast(pc.multiply(signed_min, 60_000_000), pa.duration("us"))
    dt = pc.subtract(local, off_us)  # local = UTC + offset  =>  UTC = local - offset
    ok = pc.and_kleene(
        pc.and_kleene(pc.is_valid(host), pc.match_substring(host, ".")),
        pc.is_valid(dt),
    )
    return host, dt, pc.fill_null(ok, False)


def extract_nginx(text):
    """(ip_host, ok) — third whitespace token must parse as IPv4
    (src/parse_logs.rs:413-429); datetime comes from the row ts (journald,
    src/parse_logs.rs:392-399), supplied by the caller."""
    g = pc.extract_regex(text, NGINX_RE)
    ip = _field(g, "ip")
    o = pc.extract_regex(ip, OCTETS_RE)
    ok = pc.is_valid(ip)
    for name in ("a", "b", "c", "d"):
        ok = pc.and_kleene(
            ok, pc.less_equal(pc.cast(_field(o, name), pa.int64()), 255)
        )
    return ip, pc.fill_null(ok, False)


_LEVELS = (("err", "ERR", "error"), ("warn", "WARN", "warn"),
           ("info", "INFO", "info"), ("debug", "DEBUG", "debug"))


def classify_level(text) -> pa.Array:
    """Level string per line, null if no level substring matches (such lines
    are dropped — src/models.rs:561-580 returns None; src/parse_logs.rs:364).
    Precedence err > warn > info > debug."""
    out = pa.nulls(len(text), pa.string())
    for lo, up, name in reversed(_LEVELS):
        m = pc.or_(pc.match_substring(text, lo), pc.match_substring(text, up))
        out = pc.if_else(m, pa.scalar(name, pa.string()), out)
    return out


def server_from_conv(conv_id) -> pa.Array:
    """Stable server shard of conv_id: 'srv' + (conv number % SERVER_MOD).

    Analog of the reference's per-process `server` identity
    (/root/reference/src/lib.rs:98-160, config.server) — here a deterministic
    shard so the (service, server) watermark/aggregate keys exist.
    """
    g = pc.extract_regex(conv_id, r"^conv_(?P<n>\d+)")
    n = pc.fill_null(pc.cast(pc.struct_field(g, "n"), pa.int64()), 0)
    mod = np.mod(n.to_numpy(zero_copy_only=False), SERVER_MOD)
    return pc.binary_join_element_wise(
        "srv", pc.cast(pa.array(mod), pa.string()), ""
    )
