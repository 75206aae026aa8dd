from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from big_data_graph_analysis_with_spark_spark import get_spark  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"
REF_INPUT = "/root/reference/input"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


def duckdb_oracle(sql: str, sf_dir: str):
    """Run oracle SQL the way the driver does: testdata parquet tables
    pre-registered as DuckDB views. Returns a pandas DataFrame."""
    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, float_cols=(), tol=0.0):
    """Mirror the driver's check: row count, sorted column names, and
    order-insensitive value equality."""
    import pandas as pd

    got = spark_df.toPandas()
    want = duckdb_oracle(sql, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        f"columns differ: {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row counts differ: {len(got)} vs {len(want)}"
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols, ignore_index=True)
    w = want[cols].sort_values(cols, ignore_index=True)
    for c in cols:
        # float path when EITHER side surfaces as float (mirrors
        # driver_sim: DuckDB returns HUGEINT columns as float64, so a
        # decimal-vs-hugeint pair must compare numerically, not as
        # strings) — though oracles should CAST outputs to BIGINT where
        # driver-SF values fit, keeping the exact string path
        if c in float_cols or g[c].dtype.kind == "f" or w[c].dtype.kind == "f":
            import numpy as np

            assert np.allclose(
                g[c].astype(float), w[c].astype(float), atol=tol, rtol=0, equal_nan=True
            ), f"column {c} values differ"
        else:
            pd.testing.assert_series_equal(
                g[c].astype(str), w[c].astype(str), check_names=False
            )
