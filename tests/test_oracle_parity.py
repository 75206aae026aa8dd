"""Run every `queries()` entry against its `oracle_sql()` the way the
driver does (row count + columns + order-insensitive values), at
sf0.001 so the suite stays fast. This is the local pre-flight for
CORRECTNESS_r{N}.json."""

from __future__ import annotations

import importlib
import sys

import pytest

from tests.conftest import SF0001, assert_matches_oracle

entry_mod = importlib.import_module("__spark_entry__")


def _query_names():
    qs = entry_mod.queries()
    return sorted(qs.keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    df = qs[name](spark, SF0001)
    if name not in oracles:
        # rows-only check for non-SQL-expressible ops
        assert df.count() >= 0
        return
    assert_matches_oracle(df, oracles[name], SF0001)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None
