"""T5: authorized-user cache with a periodic refresh loop.

The reference spawns ``update_db`` at server start: every 60 s it calls
``fill_from_db`` to reload the authorized-users table into a process-global
cache, and every request's ``LoggedUser`` extraction checks membership
against that cache rather than hitting the DB
(/root/reference/src/security_log_http.rs:636-642 over authorized_users;
the 60 s interval is the reference's ``interval(Duration::from_secs(60))``).

Analog: users live in a small Parquet/JSON store (the "DB table"); the
cache holds ``email -> row`` in memory behind a lock; a daemon thread
refreshes it on a fixed interval (injectable for tests — a stop Event makes
shutdown deterministic, no dangling timers in pytest).  The store is
dim-scale (operators' emails), so a full reload per tick is exactly what
the reference does and costs nothing at any corpus scale.
"""

from __future__ import annotations

import json
import os
import threading

REFRESH_INTERVAL_S = 60.0  # reference parity


def load_users(path: str) -> dict[str, dict]:
    """One users store read: Parquet (columns at least ``email``) or a JSON
    list of rows — the ``fill_from_db`` query analog."""
    if not os.path.exists(path):
        return {}
    if path.endswith(".json"):
        with open(path) as f:
            rows = json.load(f)
    else:
        import pyarrow.parquet as pq
        rows = pq.read_table(path).to_pylist()
    return {r["email"]: r for r in rows if r.get("email")}


class AuthUserCache:
    def __init__(self, store_path: str):
        self.store_path = store_path
        self._users: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.refreshes = 0

    def fill_from_store(self) -> int:
        users = load_users(self.store_path)
        with self._lock:
            self._users = users
            self.refreshes += 1
        return len(users)

    def is_authorized(self, email: str | None) -> bool:
        if not email:
            return False
        with self._lock:
            return email in self._users

    def get(self, email: str) -> dict | None:
        with self._lock:
            row = self._users.get(email)
        return dict(row) if row is not None else None

    # ---- refresh loop ---------------------------------------------------

    def start_refresh(self, interval_s: float = REFRESH_INTERVAL_S) -> None:
        """Fill once NOW (requests must not race an empty cache at boot),
        then refresh every ``interval_s`` until ``stop()``."""
        self.fill_from_store()

        def loop():
            while not self._stop.wait(interval_s):
                try:
                    self.fill_from_store()
                except Exception:  # noqa: BLE001 — keep ticking, like the
                    pass           # reference's unwrap_or(())

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
