"""Driver-style parity: every queries() entry vs its oracle_sql() on sf0.001.

This mirrors exactly what the per-round CORRECTNESS gate does (row count +
schema + order-insensitive value equality), so a green run here predicts a
green driver run.
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE, assert_matches_oracle

import __ray_entry__ as entrymod


def _names():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    return sorted(set(qs) & set(os_))


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, ray_session, oracle_smoke):
    result = entrymod.queries()[name](SF_SMOKE)
    assert_matches_oracle(result, oracle_smoke, entrymod.oracle_sql()[name])


def test_every_query_has_callable():
    qs = entrymod.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) >= 0
