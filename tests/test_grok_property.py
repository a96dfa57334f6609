"""Property-based grok tests (hypothesis): build lines from random
components, parse, and check the extraction inverts the construction under
the reference's truncation/validation rules."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from security_log_analysis_rust_ray.functions import grok

_user = st.text(alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
                min_size=0, max_size=30)
_hostpart = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
                    min_size=1, max_size=20)
_mon = st.sampled_from(["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                        "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])


@settings(max_examples=200, deadline=None, derandomize=True)
@given(user=_user, h1=_hostpart, h2=_hostpart, mon=_mon,
       day=st.integers(1, 28), hour=st.integers(0, 23),
       minute=st.integers(0, 59), sec=st.integers(0, 59),
       port=st.integers(1, 65535), year=st.integers(2000, 2030))
def test_ssh_roundtrip(user, h1, h2, mon, day, hour, minute, sec, port, year):
    host = f"{h1}.{h2}"
    line = (f"{mon} {day:02d} {hour:02d}:{minute:02d}:{sec:02d} node "
            f"sshd[1]: Invalid user {user} from {host} port {port}")
    got_host, got_user, dt, ok = grok.extract_ssh(
        pa.array([line]), pa.array([year], pa.int64()))
    assert ok.to_pylist() == [True]
    assert got_user.to_pylist()[0] == user[:15]
    assert got_host.to_pylist()[0] == host[:60]
    assert pc.hour(dt).to_pylist() == [hour]
    assert pc.year(dt).to_pylist() == [year]


@settings(max_examples=100, deadline=None, derandomize=True)
@given(a=st.integers(0, 300), b=st.integers(0, 300),
       c=st.integers(0, 300), d=st.integers(0, 300))
def test_nginx_octet_validation(a, b, c, d):
    line = f"nginx from {a}.{b}.{c}.{d} denied"
    _, ok = grok.extract_nginx(pa.array([line]))
    expect = all(x <= 255 for x in (a, b, c, d))
    assert ok.to_pylist() == [expect]


@settings(max_examples=100, deadline=None, derandomize=True)
@given(host=_hostpart, day=st.integers(1, 28), hour=st.integers(0, 23),
       off_h=st.integers(0, 12), sign=st.sampled_from(["+", "-"]))
def test_apache_offset_arithmetic(host, day, hour, off_h, sign):
    line = (f"{host}.example.com - - [{day:02d}/Jan/2020:{hour:02d}:00:00 "
            f"{sign}{off_h:02d}00] \"GET / HTTP/1.1\" 200 1")
    _, dt, ok = grok.extract_apache(pa.array([line]))
    assert ok.to_pylist() == [True]
    # UTC = local - offset
    expect = hour - off_h if sign == "+" else hour + off_h
    assert pc.hour(dt).to_pylist() == [expect % 24]


@settings(max_examples=60, deadline=None, derandomize=True)
@given(words=st.lists(st.sampled_from(
    ["alpha", "beta", "ERROR", "warn", "info", "DEBUG", "gamma"]),
    min_size=1, max_size=8))
def test_level_precedence_matches_reference(words):
    line = " ".join(words)
    lv = grok.classify_level(pa.array([line])).to_pylist()[0]
    low = line
    if "err" in low or "ERR" in low:
        expect = "error"
    elif "warn" in low or "WARN" in low:
        expect = "warn"
    elif "info" in low or "INFO" in low:
        expect = "info"
    elif "debug" in low or "DEBUG" in low:
        expect = "debug"
    else:
        expect = None
    assert lv == expect
