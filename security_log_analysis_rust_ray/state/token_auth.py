"""Signed bearer-token auth for the serving layer — the analog of the
reference's ``LoggedUser`` extraction (/root/reference/src/logged_user.rs:
26-115): a signed ``jwt`` token carrying (email, session, expiry) plus a
``session-id`` that must match the token's session
(``verify_session_id``, logged_user.rs:42-48).  The reference verifies an
external JWT with a shared secret; stdlib HMAC-SHA256 is the
dependency-free equivalent (same claims, same checks, same rejection
points).

Mapping of rejection points (the reference collapses all of them to
``Error::Unauthorized``; the analog splits the LAST one to 403 for
diagnosability, which the loopback tests pin):

- missing / undecodable / bad-signature / expired token ........ 401
- session-id absent or != the token's session .................. 401
- token VALID but email not in the refreshed auth cache ........ 403
  (logged_user.rs:93-103 ``TryFrom<Token>`` checking AUTHORIZED_USERS)
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import time


def load_or_create_secret(state_dir: str) -> bytes:
    """``get_random_key`` analog: one per-deployment signing secret,
    persisted so tokens survive a server restart.  Created atomically
    (tmp + rename; O_EXCL tmp name per pid) with 0600 permissions so a
    concurrent starter never reads a partial key and non-owners cannot
    read the signing secret; on a lost create race the winner's key is
    re-read so every process signs with the same secret."""
    path = os.path.join(state_dir, "secret.key")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return f.read()
    secret = os.urandom(32)
    os.makedirs(state_dir, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o600)
    try:
        os.write(fd, secret)
        os.fsync(fd)
    finally:
        os.close(fd)
    try:
        os.link(tmp, path)   # atomic first-writer-wins publish
    except FileExistsError:
        pass
    finally:
        os.unlink(tmp)
    with open(path, "rb") as f:
        return f.read()


def _b64e(raw: bytes) -> str:
    return base64.urlsafe_b64encode(raw).decode().rstrip("=")


def _b64d(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def mint_token(email: str, session: str, secret: bytes,
               ttl_s: float = 24 * 3600.0,
               now_s: float | None = None) -> str:
    """payload.signature — claims (email, session, exp) like the
    reference's Token, signed with HMAC-SHA256."""
    now = time.time() if now_s is None else now_s
    payload = _b64e(json.dumps(
        {"email": email, "session": session, "exp": now + ttl_s},
        separators=(",", ":")).encode())
    sig = hmac.new(secret, payload.encode(), hashlib.sha256).hexdigest()
    return f"{payload}.{sig}"


def verify_token(token: str | None, secret: bytes,
                 now_s: float | None = None) -> dict | None:
    """None unless the signature verifies AND the token is unexpired;
    otherwise the claims dict (email, session, exp)."""
    if not token or token.count(".") != 1:
        return None
    payload, sig = token.split(".")
    want = hmac.new(secret, payload.encode(), hashlib.sha256).hexdigest()
    if not hmac.compare_digest(sig, want):
        return None
    try:
        claims = json.loads(_b64d(payload))
    except (ValueError, UnicodeDecodeError):
        return None
    now = time.time() if now_s is None else now_s
    if not isinstance(claims, dict) or claims.get("exp", 0) < now:
        return None
    if not claims.get("email") or not claims.get("session"):
        return None
    return claims
