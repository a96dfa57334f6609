"""Explicit Arrow schema constants, validated at read/write boundaries
(SURVEY §1.2: the rebuild analog of the reference's dual Rust-struct + SQL
DDL schema declarations, /root/reference/src/models.rs + migrations/)."""

from __future__ import annotations

import pyarrow as pa

TS = pa.timestamp("us")

# BASELINE.json input_hint — the primary input table
TRANSCRIPTS = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),       # nullable
    ("ts", TS),
])

# parsed/ sink — reference IntrusionLog (src/models.rs:193-200) + carried
# turn identity for per-turn equality
PARSED = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("service", pa.string()),    # ssh | nginx | apache
    ("server", pa.string()),
    ("datetime", TS),
    ("host", pa.string()),
    ("username", pa.string()),   # nullable ('' allowed; null for non-ssh)
    ("ts", TS),
    ("text", pa.string()),
])

# messages/ sink — reference SystemdLogMessages (src/models.rs:658-665)
MESSAGES = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("log_level", pa.string()),  # debug | info | warn | error
    ("log_unit", pa.string()),   # nullable (tool analog)
    ("log_message", pa.string()),
    ("log_timestamp", TS),
])

# routed union table (ingest single-pass output; sink = partition column)
ROUTED = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("tool", pa.string()),
    ("ts", TS),
    ("text", pa.string()),
    ("sink", pa.string()),
    ("service", pa.string()),
    ("server", pa.string()),
    ("datetime", TS),
    ("host", pa.string()),
    ("username", pa.string()),
    ("log_level", pa.string()),
])

# enrichment dims — reference host_country / country_code
# (src/models.rs:23-46, migrations/V01,V02)
HOST_COUNTRY = pa.schema([("host", pa.string()), ("code", pa.string())])
COUNTRY_CODE = pa.schema([("code", pa.string()), ("country", pa.string())])

COUNTRY_COUNT = pa.schema([("country", pa.string()), ("cnt", pa.int64())])


class SchemaMismatch(ValueError):
    pass


def validate(table_or_schema, expected: pa.Schema, *, where: str = "") -> None:
    """Raise SchemaMismatch unless names+types match ``expected`` exactly
    (nullable flags intentionally not compared — Arrow writers vary them)."""
    schema = (table_or_schema.schema
              if hasattr(table_or_schema, "schema") else table_or_schema)
    if callable(schema):  # ray Dataset.schema()
        schema = table_or_schema.schema()
        schema = pa.schema(
            [pa.field(n, t) for n, t in zip(schema.names, schema.types)])
    got = [(f.name, f.type) for f in schema]
    want = [(f.name, f.type) for f in expected]
    if got != want:
        raise SchemaMismatch(
            f"schema mismatch{' at ' + where if where else ''}:\n"
            f"  got:  {got}\n  want: {want}")
