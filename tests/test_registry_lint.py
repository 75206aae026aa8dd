"""Registry lint: every oracle-backed `queries()` entry must produce a
NON-EMPTY result at the driver's verification SF (sf0.01) — a 0=0 hash
match verifies nothing (round-5 verdict: the vacuous ktruss /
source_overlap slots). Only the DuckDB oracle side runs here, so the
whole sweep is cheap; combined with test_oracle_parity (Spark ≡ oracle)
a non-empty oracle implies a non-empty, non-vacuous driver row.

Also lints the registry shape itself: every oracle key has a queries()
entry, and the rows-only tail entries stay behind every oracle-backed
entry so the driver's 50-slot window is spent on hash-verifiable
queries.
"""

from __future__ import annotations

import importlib
import os

import duckdb
import pytest

SF001 = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

entry_mod = importlib.import_module("__spark_entry__")


def _oracle_names():
    return sorted(entry_mod.oracle_sql().keys())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF001}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_nonempty_at_verification_sf(con, name):
    sql = entry_mod.oracle_sql()[name]
    n = len(con.execute(sql).fetchmany(1))
    assert n > 0, (
        f"{name}: oracle returns 0 rows at {SF001} — the driver hash "
        "check would be vacuous; change the fixture/parameters"
    )


def test_every_oracle_has_a_query():
    qs = entry_mod.queries()
    missing = [n for n in entry_mod.oracle_sql() if n not in qs]
    assert not missing, f"oracle_sql keys without queries(): {missing}"


def test_rows_only_entries_trail_the_registry():
    qs = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    first_rows_only = next(
        (i for i, n in enumerate(qs) if n not in oracles), len(qs)
    )
    stragglers = [n for n in qs[first_rows_only:] if n in oracles]
    assert not stragglers, (
        f"oracle-backed entries after a rows-only entry: {stragglers} — "
        "rows-only entries must sit at the tail"
    )
