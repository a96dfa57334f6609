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


def test_user_route_bearer_token_paths(tmp_path, ray_session):
    """LoggedUser-analog token auth (logged_user.rs:26-115): 200 for a
    signed token + matching session-id of an authorized user; 401 for a
    tampered signature, an expired token, or a session mismatch
    (verify_session_id); 403 for a VALID token whose email is not in the
    refreshed cache."""
    from security_log_analysis_rust_ray.serve import make_server
    from security_log_analysis_rust_ray.state.token_auth import (
        load_or_create_secret, mint_token, verify_token)
    users = str(tmp_path / "users.parquet")
    _write_users(users, ["ops@x"])
    state_dir = str(tmp_path / "state")
    srv = make_server(SF, state_dir, port=0,
                      users_path=users, auth_refresh_s=30.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    secret = load_or_create_secret(state_dir)  # same persisted key

    def get(headers):
        req = urllib.request.Request(f"{base}/security_log/user",
                                     headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                return r.status, json.loads(r.read().decode())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read().decode())

    try:
        tok = mint_token("ops@x", "sess-1", secret)
        # happy path: Authorization header + X-Session-Id
        status, body = get({"Authorization": f"Bearer {tok}",
                            "X-Session-Id": "sess-1"})
        assert status == 200 and body["email"] == "ops@x" \
            and body["session"] == "sess-1"
        # cookie transport (the reference's jwt + session-id cookies)
        status, body = get({"Cookie": f"jwt={tok}; session-id=sess-1"})
        assert status == 200 and body["email"] == "ops@x"
        # tampered signature -> 401
        bad = tok[:-4] + ("0000" if tok[-4:] != "0000" else "1111")
        assert get({"Authorization": f"Bearer {bad}",
                    "X-Session-Id": "sess-1"})[0] == 401
        # expired -> 401 (and verify_token agrees)
        old = mint_token("ops@x", "sess-1", secret, ttl_s=-1)
        assert verify_token(old, secret) is None
        assert get({"Authorization": f"Bearer {old}",
                    "X-Session-Id": "sess-1"})[0] == 401
        # session mismatch -> 401 (verify_session_id analog)
        assert get({"Authorization": f"Bearer {tok}",
                    "X-Session-Id": "sess-2"})[0] == 401
        assert get({"Authorization": f"Bearer {tok}"})[0] == 401
        # valid token, email NOT in the auth cache -> 403
        outsider = mint_token("intruder@x", "sess-9", secret)
        assert get({"Authorization": f"Bearer {outsider}",
                    "X-Session-Id": "sess-9"})[0] == 403
    finally:
        srv.shutdown()
        srv.server_close()
