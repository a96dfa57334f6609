"""Deterministic synthetic `transcripts` corpus + enrichment dimensions.

The driver's ``BASELINE.json`` ``input_hint`` mandates an input Parquet table of
multi-turn conversation/agent transcripts with columns
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``.  The sandbox testdata has no such table, so we derive one
**deterministically** from the driver-generated ``events`` table via a single
canonical SQL definition (``TRANSCRIPTS_CTE``).  The same SQL text is used

  1. by :func:`ensure_transcripts` (DuckDB ``COPY ... TO parquet``) to
     materialize the input the Ray pipelines read, and
  2. as the preamble of every oracle query in ``__ray_entry__.oracle_sql()``,

so the engine and the oracle consume byte-identical inputs with zero drift,
with no external data (everything is a pure function of ``events`` rows).

Embedded ``text`` patterns mirror the reference's parse targets
(`/root/reference/src/parse_logs.rs:58-116` sshd "Invalid user X from HOST
port P", `:208-232` apache CLF, `:413-429` nginx journald) including the edge
cases its tests pin down: empty username, >15-char username truncation,
dot-less host rejection, invalid-IPv4 nginx rejection, negative-filter
substrings (`/root/reference/src/config.rs:38-45`) and natural-key duplicate
rows (the 20->18 dedup fixture pattern, `src/parse_logs.rs:583,602` —
reproduced here as same-hour collisions on (service,server,datetime,host)).

The oracle CTEs derive EXPECTED parse output from the *generator fields*
(``_feat``), never by re-running the engine's regexes — an independent check.
"""

from __future__ import annotations

import os
import tempfile

# ---------------------------------------------------------------------------
# Shared constants (engine side mirrors these; see functions/grok.py, enrich)
# ---------------------------------------------------------------------------

N_HOSTS = 50            # distinct ssh attacker hosts h{k}.example.com
HOST_MISSING_MOD = 7    # k % 7 == 0  ->  host absent from host_country dim
SERVER_MOD = 4          # server = 'srv' + (conv number % 4)

# Negative filter substrings (reference defaults, src/config.rs:38-45) and
# the cache root both come from the unified Config (config.py) — overridable
# via config.env / SLAR_SYSTEMD_LOG_FILTERS / SLAR_CACHE_DIR.  Resolved at
# import, like the reference's once-at-start Config::init_config.
from .config import get_config as _get_config

SYSTEMD_LOG_FILTERS = tuple(_get_config().systemd_log_filters)
CACHE_ROOT = _get_config().cache_dir

# ---------------------------------------------------------------------------
# Canonical SQL — the single source of truth for the synthetic corpus.
# ---------------------------------------------------------------------------
# `_feat` holds the raw generator fields; `_txt` adds the rendered turn text;
# `transcripts` is the public input-table shape from BASELINE.json input_hint.

_FEAT_SQL = """
_ev AS (
  SELECT event_id, ts, user_id, event_type,
         CAST(event_id % 10 AS INT) AS fam,
         date_trunc('hour', ts) AS hour_ts,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx
  FROM events
),
_feat AS (
  SELECT *,
    'conv_' || CAST(user_id AS VARCHAR) AS conv_id,
    CASE event_type WHEN 'purchase' THEN 'assistant'
                    WHEN 'signup' THEN 'system'
                    WHEN 'error' THEN 'tool'
                    ELSE 'user' END AS role,
    CASE WHEN event_type = 'error' THEN 'tool_' || CAST(event_id % 5 AS VARCHAR) END AS tool,
    'srv' || CAST(user_id % {server_mod} AS VARCHAR) AS server,
    CASE WHEN event_id % 97 = 0 THEN ''
         WHEN event_id % 13 = 0 THEN 'verylongusername' || CAST(user_id AS VARCHAR)
         ELSE 'user' || CAST(user_id AS VARCHAR) END AS gen_user,
    'h' || CAST(user_id % {n_hosts} AS VARCHAR) || '.example.com' AS gen_host,
    '10.' || CAST(user_id % 256 AS VARCHAR) || '.' || CAST(event_id % 256 AS VARCHAR)
        || '.' || CAST(1 + event_id % 254 AS VARCHAR) AS gen_ip,
    CAST(1024 + event_id % 60000 AS VARCHAR) AS gen_port,
    CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'DEBUG' WHEN 1 THEN 'INFO'
                                   WHEN 2 THEN 'WARN' ELSE 'ERROR' END AS gen_level
  FROM _ev
),
_txt AS (
  SELECT *,
    CASE
      WHEN fam <= 2 THEN
        strftime(hour_ts, '%b %d %H:%M:%S') || ' node' || CAST(user_id % 3 AS VARCHAR)
        || ' sshd[' || CAST(1000 + event_id % 9000 AS VARCHAR) || ']: Invalid user '
        || gen_user || ' from ' || gen_host || ' port ' || gen_port
      WHEN fam = 3 THEN
        strftime(hour_ts, '%b %d %H:%M:%S')
        || ' node0 sshd[999]: Invalid user baduser from localhost port 22'
      WHEN fam <= 5 THEN
        gen_ip || ' - - [' || strftime(hour_ts, '%d/%b/%Y:%H:%M:%S')
        || ' +0000] "GET /index.html HTTP/1.1" 200 ' || CAST(event_id % 5000 AS VARCHAR)
      WHEN fam = 6 THEN
        CASE WHEN event_id % 23 = 0 THEN 'nginx from badhost denied'
             ELSE 'nginx from ' || gen_ip || ' denied' END
      WHEN fam <= 8 THEN
        'svc' || CAST(user_id % 5 AS VARCHAR) || ' ' || gen_level
        || ': operation completed code=' || CAST(event_id % 100 AS VARCHAR)
      ELSE
        CASE WHEN event_id % 17 = 0
             THEN 'sshd noise: Disconnected from invalid user scanner preauth'
             ELSE 'lorem ipsum filler turn ' || CAST(event_id AS VARCHAR) END
    END AS text
  FROM _feat
),
transcripts AS (
  SELECT conv_id, turn_idx, role, text, tool, ts FROM _txt
)""".format(server_mod=SERVER_MOD, n_hosts=N_HOSTS)

# Enrichment dimensions (reference host_country / country_code tables,
# /root/reference/src/models.rs:23-46, migrations/V01,V02): pure functions of
# k in [0, N_HOSTS); k % HOST_MISSING_MOD == 0 hosts are deliberately absent
# from host_country (dangling-host anti-join case, src/models.rs:166-189).
_DIMS_SQL = """
host_country AS (
  SELECT 'h' || CAST(k AS VARCHAR) || '.example.com' AS host,
         chr(65 + CAST(k % 26 AS INT)) || chr(65 + CAST((k * 7) % 26 AS INT)) AS code
  FROM range({n_hosts}) t(k) WHERE k % {missing_mod} <> 0
),
country_code AS (
  SELECT DISTINCT
         chr(65 + CAST(k % 26 AS INT)) || chr(65 + CAST((k * 7) % 26 AS INT)) AS code,
         'Country ' || chr(65 + CAST(k % 26 AS INT)) || chr(65 + CAST((k * 7) % 26 AS INT)) AS country
  FROM range({n_hosts}) t(k)
)""".format(n_hosts=N_HOSTS, missing_mod=HOST_MISSING_MOD)

# Oracle CTE for the EXPECTED routed/parsed sink, derived from generator
# fields (independent of the engine's regex path).  Column semantics follow
# the reference IntrusionLog (/root/reference/src/models.rs:193-200): ssh
# datetime comes from the syslog text (hour-truncated by construction),
# apache from the CLF bracket (likewise), nginx from the journald row ts
# (src/parse_logs.rs:392-399).
_PARSED_SQL = """
parsed AS (
  SELECT conv_id, turn_idx,
         CASE WHEN fam <= 2 THEN 'ssh'
              WHEN fam IN (4, 5) THEN 'apache'
              ELSE 'nginx' END AS service,
         server,
         CASE WHEN fam = 6 THEN ts ELSE hour_ts END AS datetime,
         CASE WHEN fam <= 2 THEN gen_host ELSE gen_ip END AS host,
         CASE WHEN fam <= 2 THEN substr(gen_user, 1, 15) END AS username,
         ts, text
  FROM _txt
  WHERE fam <= 2 OR fam IN (4, 5) OR (fam = 6 AND event_id % 23 <> 0)
)"""

# Message sink (reference systemd_log_messages, src/models.rs:658-665):
# only level-classifiable lines survive (src/models.rs:561-580 returns None
# for level-less lines -> dropped; src/parse_logs.rs:364-371).  By
# construction those are exactly fam 7/8 rows.
_MESSAGES_SQL = """
messages AS (
  SELECT conv_id, turn_idx,
         CASE CAST(event_id % 4 AS INT) WHEN 0 THEN 'debug' WHEN 1 THEN 'info'
                                        WHEN 2 THEN 'warn' ELSE 'error' END AS log_level,
         tool AS log_unit, text AS log_message, ts AS log_timestamp
  FROM _txt WHERE fam IN (7, 8)
)"""

ORACLE_PREAMBLE = (
    "WITH " + _FEAT_SQL.strip().lstrip() + ",\n"
    + _DIMS_SQL.strip() + ",\n"
    + _PARSED_SQL.strip() + ",\n"
    + _MESSAGES_SQL.strip() + "\n"
)


def oracle_query(body: str) -> str:
    """Full oracle SQL: canonical CTE preamble + a SELECT body."""
    return ORACLE_PREAMBLE + body


# ---------------------------------------------------------------------------
# Materialization
# ---------------------------------------------------------------------------

def _cache_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return os.path.join(CACHE_ROOT, tag)


def transcripts_path(sf_dir: str) -> str:
    return os.path.join(_cache_dir(sf_dir), "transcripts.parquet")


def ensure_transcripts(sf_dir: str, repeat: int = 1) -> str:
    """Build (once) and return the path of the transcripts Parquet for sf_dir.

    ``repeat > 1`` tiles the corpus with distinct conv_id suffixes (bench-only
    scale-up; still fully deterministic).  Written atomically so concurrent
    callers are safe.
    """
    import duckdb

    path = (transcripts_path(sf_dir) if repeat == 1
            else os.path.join(_cache_dir(sf_dir), f"transcripts_x{repeat}.parquet"))
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    con = duckdb.connect()
    try:
        events = os.path.join(sf_dir, "events.parquet")
        con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{events}')")
        if repeat == 1:
            body = "SELECT * FROM transcripts"
        else:
            body = (
                "SELECT t.conv_id || '_r' || CAST(r.k AS VARCHAR) AS conv_id,"
                " t.turn_idx, t.role, t.text, t.tool, t.ts"
                f" FROM transcripts t CROSS JOIN range({repeat}) r(k)"
            )
        sql = oracle_query(body)
        fd, tmp = tempfile.mkstemp(suffix=".parquet", dir=os.path.dirname(path))
        os.close(fd)
        con.execute(f"COPY ({sql}) TO '{tmp}' (FORMAT PARQUET)")
        os.replace(tmp, path)
    finally:
        con.close()
    return path


def ensure_transcripts_sharded(sf_dir: str, shards: int = 8, repeat: int = 1) -> str:
    """Materialize the transcripts corpus as a DIRECTORY of per-shard Parquet
    files (shard = conv number % shards) and return the directory path.

    This is the shape a real 10^12-turn corpus arrives in — many input files
    — and what the resumable ingest pipeline keys its lineage manifest on
    (one manifest row per input shard; SURVEY §2.4 T4 pattern).
    """
    import duckdb

    tag = f"transcripts_s{shards}" + (f"_x{repeat}" if repeat > 1 else "")
    d = os.path.join(_cache_dir(sf_dir), tag)
    marker = os.path.join(d, "_SUCCESS")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    try:
        events = os.path.join(sf_dir, "events.parquet")
        con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{events}')")
        for k in range(shards):
            if repeat == 1:
                body = (
                    "SELECT * FROM transcripts "
                    f"WHERE CAST(replace(conv_id, 'conv_', '') AS INT) % {shards} = {k}"
                )
            else:
                body = (
                    "SELECT t.conv_id || '_r' || CAST(r.k AS VARCHAR) AS conv_id,"
                    " t.turn_idx, t.role, t.text, t.tool, t.ts"
                    f" FROM transcripts t CROSS JOIN range({repeat}) r(k)"
                    f" WHERE CAST(replace(t.conv_id, 'conv_', '') AS INT) % {shards} = {k}"
                )
            sql = oracle_query(body)
            part = os.path.join(d, f"part-{k:05d}.parquet")
            con.execute(f"COPY ({sql}) TO '{part}.tmp' (FORMAT PARQUET)")
            os.replace(f"{part}.tmp", part)
        with open(marker, "w") as f:
            f.write("ok")
    finally:
        con.close()
    return d


def host_country_rows() -> tuple[list[str], list[str]]:
    """(host, code) lists — Python mirror of the host_country dim CTE."""
    hosts, codes = [], []
    for k in range(N_HOSTS):
        if k % HOST_MISSING_MOD == 0:
            continue
        hosts.append(f"h{k}.example.com")
        codes.append(chr(65 + k % 26) + chr(65 + (k * 7) % 26))
    return hosts, codes


def country_code_rows() -> tuple[list[str], list[str]]:
    """(code, country) lists — Python mirror of the country_code dim CTE."""
    seen: dict[str, str] = {}
    for k in range(N_HOSTS):
        code = chr(65 + k % 26) + chr(65 + (k * 7) % 26)
        seen.setdefault(code, "Country " + code)
    return list(seen.keys()), list(seen.values())


def ensure_documents_bench(n_docs: int = 100_000, seed: int = 7,
                           shards: int = 32) -> str:
    """Deterministic LARGE documents corpus for benching the similarity
    tier (the sf tables' documents are ~5k rows — similarity pipelines are
    pure fixed-overhead at that size, so scaling numbers there are
    meaningless).  ~60 vocab tokens per doc drawn from a seeded RNG keyed
    only by (seed, n_docs); docs_aug_ds plants the exact/near duplicate
    rows on top of any documents table, so the planted-dup semantics carry
    over unchanged.  Returns a directory containing documents.parquet
    (read_table-compatible), written atomically, sharded row groups."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(CACHE_ROOT, f"docs_bench_{n_docs}_{seed}")
    path = os.path.join(d, "documents.parquet")  # a DIRECTORY of shards
    if os.path.exists(path):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(seed)
    toks = rng.randint(0, 50_000, size=(n_docs, 60))
    # vectorized join: 'w<id>' columns folded left-to-right with spaces
    parts = np.char.add("w", toks.astype("U6"))
    text = parts[:, 0]
    for j in range(1, parts.shape[1]):
        text = np.char.add(np.char.add(text, " "), parts[:, j])
    t = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "source": pa.array(np.char.add(
            "src", (np.arange(n_docs) % 4).astype("U1"))),
        "text": pa.array(text.tolist(), pa.string()),
    })
    # one FILE per shard (input files = read tasks, keeping read->map
    # fusion parallel — same rule the transcripts bench corpus follows)
    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    per = -(-n_docs // shards)
    for s in range(shards):
        sl = t.slice(s * per, per)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(tmp, f"part-{s:05d}.parquet"))
    os.replace(tmp, path)
    return d
