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


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_output_types_not_wide_integer(con, name):
    """No oracle may SURFACE a scale-0 DECIMAL or HUGEINT output
    column: DuckDB hands those to pandas as float64, and the driver's
    value hash then sees "17764676.0" against Spark's DECIMAL(38,0)
    "17764676" — the exact serialization drift behind all 8 red r9
    rows (r9 verdict task 4). Cast final outputs to BIGINT (driver-SF
    values fit; internal CTE arithmetic may stay HUGEINT/DECIMAL —
    this checks RESULT types, so intermediates are exempt by
    construction)."""
    sql = entry_mod.oracle_sql()[name]
    rel = con.sql(sql)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) == "HUGEINT"
        or (str(t).startswith("DECIMAL(") and str(t).endswith(",0)"))
    ]
    assert not bad, (
        f"{name}: wide-integer output columns {bad} surface as float64 "
        "in pandas and break the driver value hash — CAST(... AS "
        "BIGINT) in the final SELECT (the 2f0a72b recipe)"
    )


def test_every_oracle_has_a_query():
    qs = entry_mod.queries()
    missing = [n for n in entry_mod.oracle_sql() if n not in qs]
    assert not missing, f"oracle_sql keys without queries(): {missing}"


def _last_driver_verified() -> dict[str, int]:
    """Per-query last driver-verified round, from the committed
    CORRECTNESS_r*.json history (round-7 verdict task 5 suggested a
    separate JSON updated by driver_sim; deriving from the committed
    driver records instead means the history can never drift from the
    evidence). Verified = hash-matched with >0 rows — a 0=0 hash match
    is vacuous (round-5 verdict), and a failed/errored row needs
    re-verification, so neither counts.
    """
    import glob
    import json
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1))
        with open(f) as fh:
            for name, row in json.load(fh).items():
                if (
                    isinstance(row, dict)
                    and row.get("hash_match")
                    and (row.get("spark_rows") or 0) > 0
                ):
                    last[name] = max(last.get(name, 0), rnd)
    return last


def test_window_rotation_policy():
    """The driver verifies only the FIRST 50 entries each round, so the
    oracle-backed registry must stay sorted by staleness: never-driver-
    verified queries first (they have no evidence beyond local parity
    until a driver row lands), then ascending last-verified round. This
    guarantees (a) every new query reaches the window before anything
    that already has a driver row, and (b) re-verification backfill
    always goes to the stalest block (round-7 verdict task 5).
    """
    qs = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    last = _last_driver_verified()
    latest = max(last.values(), default=0)
    # Entries verified in the LATEST round on disk are the just-landed
    # driver window: their head position was correct when the round was
    # snapshotted, and becomes "stale-looking" only because the driver's
    # own record landed afterwards. Exempting them keeps the suite green
    # both before and after a driver drop (round-8 verdict task 1: the
    # previous formulation self-invalidated the moment CORRECTNESS_r08
    # was committed). The never-verified-inside-window assertion below
    # is unaffected.
    nontail = [
        n for n in qs if n in oracles and last.get(n, 0) != latest
    ]
    rounds = [last.get(n, 0) for n in nontail]
    unsorted_at = [
        (nontail[i - 1], rounds[i - 1], nontail[i], rounds[i])
        for i in range(1, len(nontail))
        if rounds[i] < rounds[i - 1]
    ]
    assert not unsorted_at, (
        "registry not staleness-sorted (prev, prev_round, next, "
        f"next_round): {unsorted_at[:5]} — rotate the window: "
        "never-verified first, then ascending last-verified round"
    )
    never = [n for n in nontail if last.get(n, 0) == 0]
    outside = [n for n in never if qs.index(n) >= 50]
    assert not outside, (
        f"never-driver-verified oracle-backed queries outside the "
        f"50-slot window: {outside} — they would ship another round "
        "with no driver evidence; cap new-query growth at the free "
        "window budget or rotate"
    )


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
