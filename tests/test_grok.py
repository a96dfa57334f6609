"""Golden single-line extraction cases mirroring the reference's inline tests
(/root/reference/src/parse_logs.rs:528-650).  Pure pyarrow — no Ray session.

Timezone note: the reference parses syslog times in the machine-local zone and
converts to UTC (src/parse_logs.rs:88-116; its ssh test is #[ignore]d and
assumes EDT).  This engine is UTC-throughout (no machine-local state on a
cluster), so ssh golden hours are the literal text hours; apache lines carry
an explicit offset which IS applied — those hours match the reference test
values exactly (22 and 1)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from security_log_analysis_rust_ray.functions import grok
from security_log_analysis_rust_ray.stages.parse import route_parse


def _ssh(lines, years):
    text = pa.array(lines)
    year = pa.array(years, pa.int64())
    return grok.extract_ssh(text, year)


def test_ssh_golden_lines():
    # src/parse_logs.rs:530-553
    lines = [
        "Jun 24 00:07:25 dilepton-tower sshd[15932]: Invalid user test from 36.110.50.217 port 28898",
        "Apr 19 07:40:45 dilepton-tower sshd[72399]: Invalid user admin1 from 196.189.241.98 port 40113",
        "May 17 03:10:32 ip-172-31-78-8 sshd[1205097]: Invalid user admin from 106.54.145.68 port 52542",
    ]
    host, user, dt, ok = _ssh(lines, [2019, 2021, 2020])
    assert ok.to_pylist() == [True, True, True]
    assert user.to_pylist() == ["test", "admin1", "admin"]
    assert host.to_pylist() == ["36.110.50.217", "196.189.241.98", "106.54.145.68"]
    hours = pc.hour(dt).to_pylist()
    assert hours == [0, 7, 3]  # literal text hours (UTC-throughout engine)
    years = pc.year(dt).to_pylist()
    assert years == [2019, 2021, 2020]


def test_ssh_truncation_and_rejection():
    lines = [
        # empty username is accepted as "" (src/parse_logs.rs:64-66)
        "Jan 02 03:04:05 n sshd[1]: Invalid user  from a.b.c port 1",
        # >15-char username truncated (src/parse_logs.rs:67-70)
        "Jan 02 03:04:05 n sshd[1]: Invalid user verylongusername42 from a.b.c port 1",
        # dot-less host rejected (src/parse_logs.rs:78-83)
        "Jan 02 03:04:05 n sshd[1]: Invalid user x from localhost port 22",
    ]
    host, user, dt, ok = _ssh(lines, [2024] * 3)
    assert ok.to_pylist() == [True, True, False]
    assert user.to_pylist()[0] == ""
    assert user.to_pylist()[1] == "verylongusernam"
    assert len(user.to_pylist()[1]) == 15


def test_apache_golden_lines_tz_conversion():
    # src/parse_logs.rs:556-573 — hour asserts match the reference exactly
    lines = [
        '82.73.86.33 - - [30/Jun/2019:18:02:14 -0400] "GET /db/db-admin/index.php?lang=en HTTP/1.1" 404 458 "-" "Mozilla/5.0"',
        '67.250.95.88 - - [17/May/2020:01:49:57 +0000] "GET /garmin/fitbit/heartrate_plots HTTP/1.1" 200 7457 "https://x" "Mozilla/5.0"',
    ]
    host, dt, ok = grok.extract_apache(pa.array(lines))
    assert ok.to_pylist() == [True, True]
    assert host.to_pylist() == ["82.73.86.33", "67.250.95.88"]
    assert pc.hour(dt).to_pylist() == [22, 1]
    assert pc.day(dt).to_pylist() == [30, 17]


def test_nginx_ipv4_validation():
    # src/parse_logs.rs:413-429: 3rd whitespace token must parse as IPv4
    lines = [
        "nginx from 10.1.2.3 denied",
        "nginx from badhost denied",
        "nginx from 999.1.2.3 denied",  # octet > 255 -> not an IPv4
    ]
    ip, ok = grok.extract_nginx(pa.array(lines))
    assert ok.to_pylist() == [True, False, False]
    assert ip.to_pylist()[0] == "10.1.2.3"


def test_level_classifier_precedence():
    # src/models.rs:561-580: err > warn > info > debug; no match -> null
    lines = ["an ERROR and warn", "warn only", "some info", "DEBUG x", "nothing"]
    lv = grok.classify_level(pa.array(lines))
    assert lv.to_pylist() == ["error", "warn", "info", "debug", None]


def test_router_precedence_and_fallthrough():
    batch = pa.table({
        "conv_id": pa.array(["conv_1"] * 5),
        "turn_idx": pa.array(range(5), pa.int32()),
        "role": pa.array(["user"] * 5),
        "tool": pa.array([None] * 5, pa.string()),
        "ts": pa.array([1700000000000000] * 5, pa.timestamp("us")),
        "text": pa.array([
            # negative filter wins over everything (src/parse_logs.rs:339-345)
            "Jan 02 03:04:05 n sshd[1]: Invalid user x from a.b.c port 1 Failed password for invalid user",
            # ssh parse failure drops the line (parse_sshd errors, :401-411)
            "Jan 02 03:04:05 n sshd[1]: Invalid user x from localhost port 1",
            # nginx failure falls through to level classify (:354-363)
            "nginx from badhost gave an ERROR today",
            # plain message
            "svc1 WARN: something",
            # level-less line drops (:364-371)
            "completely unremarkable line",
        ]),
    })
    out = route_parse(batch)
    sinks = dict(zip(out["turn_idx"].to_pylist(), out["sink"].to_pylist()))
    assert sinks == {2: "message", 3: "message"}
    levels = dict(zip(out["turn_idx"].to_pylist(), out["log_level"].to_pylist()))
    assert levels == {2: "error", 3: "warn"}
