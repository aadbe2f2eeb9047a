"""The core correctness gate, run locally: every queries() entry with
an oracle must hash-match DuckDB at sf0.001 (the driver repeats this
at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR, compare_with_oracle

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    compare_with_oracle(df, ORACLES[name], SF_DIR)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_listed_has_callable():
    for name in ORACLES:
        assert name in QUERIES
