"""T5: auth-user cache + 60 s refresh loop
(reference src/security_log_http.rs:636-642)."""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request

import pyarrow as pa
import pyarrow.parquet as pq

from security_log_analysis_rust_ray.state.auth_cache import AuthUserCache

SF = "/root/testdata/sf0.001"


def _write_users(path, emails):
    pq.write_table(pa.table({
        "email": pa.array(emails, pa.string()),
        "created_at": pa.array(["2024-01-01T00:00:00Z"] * len(emails)),
    }), path)


def test_cache_fill_and_membership(tmp_path):
    p = str(tmp_path / "users.parquet")
    _write_users(p, ["a@x", "b@x"])
    c = AuthUserCache(p)
    assert c.fill_from_store() == 2
    assert c.is_authorized("a@x") and not c.is_authorized("z@x")
    assert c.get("b@x")["email"] == "b@x"
    assert not c.is_authorized(None)


def test_refresh_loop_picks_up_store_changes(tmp_path):
    p = str(tmp_path / "users.parquet")
    _write_users(p, ["a@x"])
    c = AuthUserCache(p)
    c.start_refresh(interval_s=0.05)
    assert c.is_authorized("a@x")  # filled synchronously at start
    _write_users(p, ["a@x", "new@x"])
    deadline = time.monotonic() + 5
    while not c.is_authorized("new@x") and time.monotonic() < deadline:
        time.sleep(0.02)
    assert c.is_authorized("new@x")
    n = c.refreshes
    c.stop()
    time.sleep(0.15)
    assert c.refreshes == n  # loop actually stopped


def test_missing_store_is_empty_not_fatal(tmp_path):
    c = AuthUserCache(str(tmp_path / "absent.parquet"))
    assert c.fill_from_store() == 0
    assert not c.is_authorized("a@x")


def test_user_route_checks_cache(tmp_path, ray_session):
    """End-to-end: /user with an auth store returns the cached principal
    for an authorized email and 401 otherwise; the refresh loop authorizes
    a newly added user without a restart."""
    from security_log_analysis_rust_ray.serve import make_server
    users = str(tmp_path / "users.parquet")
    _write_users(users, ["ops@x"])
    srv = make_server(SF, str(tmp_path / "state"), port=0,
                      users_path=users, auth_refresh_s=0.05)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        def user(email):
            req = urllib.request.Request(
                f"{base}/security_log/user",
                headers={"X-User-Email": email} if email else {})
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    return r.status, json.loads(r.read().decode())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read().decode())

        status, body = user("ops@x")
        assert status == 200 and body["email"] == "ops@x"
        assert user("intruder@x")[0] == 401
        assert user(None)[0] == 401

        _write_users(users, ["ops@x", "late@x"])
        deadline = time.monotonic() + 5
        while user("late@x")[0] != 200 and time.monotonic() < deadline:
            time.sleep(0.02)
        assert user("late@x")[0] == 200
    finally:
        srv.shutdown()
        srv.server_close()
