"""Derive a deterministic original/perturbed graph pair from the TPC-H-ish
testdata tables (FIXTURES.md §4).

The reference consumes NetGameSim graph dumps; the driver's synthetic
testdata has no graph tables, so we derive one from foreign keys:

* vertices := nations ∪ suppliers ∪ customers (id-offset into disjoint
  ranges), with all 10 NodeObject attributes computed by pure arithmetic
  on the id — so the DuckDB oracle can derive the *identical* graph in
  plain SQL (the CTEs below are the single source of truth for the SQL
  side and are reused by every oracle query).
* edges := nation→supplier and nation→customer FK pairs, plus distinct
  supplier→customer pairs via lineitem⋈orders. Nations have no in-edges
  → 25 start nodes for G1.
* The perturbed graph applies the golden-YAML taxonomy
  (`input/Graph200.ngs.yaml`: nodes modified/removed/added) with modular
  rules: remove id%17==0, modify props where id%13==0, add one child
  node per nation.

Scale note: vertex derivation is a narrow map over each table; the only
shuffle is the DISTINCT on supplier→customer pairs, which is exactly the
dedup any FK-derived edge list needs. At 100 TB the lineitem scan prunes
to two columns (l_suppkey via orders join on l_orderkey) and AQE handles
the orderkey join skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import NetGraph

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: id-space offsets keeping the four vertex classes disjoint at EVERY
#: scale factor. The original values (100 / 10_000 / 20_000) were sized
#: for sf0.01 and silently COLLIDED at sf0.1: customer ids
#: (10_000 + c_custkey, max 24_999) overlapped the perturbed graph's
#: added-vertex range (20_000+), producing duplicate vertex ids whose
#: modified/added classification diverged between the Spark derivation
#: (kept BOTH rows) and the oracle CTE (classified by an `id <
#: ADDED_OFFSET` branch) — caught by the first full-oracle sweep at
#: sf0.1. 1e12 spacing keeps the classes disjoint while entity keys
#: stay below 1e12, i.e. up to roughly sf 6e6 (~exabyte scale), with
#: ids still far inside int64.
SUPPLIER_OFFSET = 1_000_000_000_000
CUSTOMER_OFFSET = 2_000_000_000_000
ADDED_OFFSET = 3_000_000_000_000

#: perturbation moduli (FIXTURES.md §1 taxonomy)
REMOVE_MOD = 17
MODIFY_MOD = 13


GRAPH_TABLES = ["nation", "supplier", "customer", "orders", "lineitem"]


def load_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read testdata parquet tables in `sf_dir` as DataFrames (only the
    requested subset — each read costs a schema/footer pass)."""
    return {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for t in (tables if tables is not None else TPCH_TABLES)
    }


def _vertex_attrs(df: DataFrame) -> DataFrame:
    """Attach the 9 non-id NodeObject attributes as arithmetic on id.

    Mirrors VERTEX_ATTR_SQL below exactly — both engines compute
    identical values, making every derived-graph query oracle-checkable.
    """
    i = F.col("id")
    return df.select(
        i.cast("long").alias("id"),
        (i % 8).cast("long").alias("children"),
        F.when(
            (i % MODIFY_MOD == 0) & F.col("_modified"), (i % 20) + 1
        ).otherwise(i % 20).cast("long").alias("props"),
        F.lit(1).cast("long").alias("current_depth"),
        (i % 100).cast("long").alias("prop_value_range"),
        (i % 5).cast("long").alias("max_depth"),
        (i % 7).cast("long").alias("max_branching_factor"),
        (i % 20).cast("long").alias("max_properties"),
        # modulus BEFORE the float division: with 1e12-spaced ids a raw
        # id/100.0 needs ~17 significant digits at 2 decimals — past
        # double precision, so decimal-cast mirrors drift in the last
        # ulp between engines. id % 1e5 keeps stored_value in [0, 1000)
        # where every 2-decimal value is far inside exact double range.
        ((i % 100_000) / F.lit(100.0)).alias("stored_value"),
        (i % 3 != 0).alias("valuable_data"),
    )


def _edge_payload(df: DataFrame) -> DataFrame:
    """Attach deterministic Action payload columns to (src, dst) pairs."""
    s, d = F.col("src"), F.col("dst")
    return df.select(
        s.cast("long").alias("src"),
        d.cast("long").alias("dst"),
        ((s + d) % 20).cast("long").alias("action_type"),
        s.cast("long").alias("from_field"),
        d.cast("long").alias("to_field"),
        F.when((s + d) % 5 == 0, F.lit(None)).otherwise((s + d) % 100)
        .cast("long").alias("resulting_value"),
        (((s * 7 + d) % 1000) / F.lit(1000.0)).alias("cost"),
    )


def derive_original(tables: dict[str, DataFrame]) -> NetGraph:
    nation, supplier, customer = tables["nation"], tables["supplier"], tables["customer"]
    lineitem, orders = tables["lineitem"], tables["orders"]

    ids = (
        nation.select(F.col("n_nationkey").cast("long").alias("id"))
        .unionAll(supplier.select((F.lit(SUPPLIER_OFFSET) + F.col("s_suppkey")).alias("id")))
        .unionAll(customer.select((F.lit(CUSTOMER_OFFSET) + F.col("c_custkey")).alias("id")))
        .withColumn("_modified", F.lit(False))
    )
    vertices = _vertex_attrs(ids)

    pairs = (
        supplier.select(
            F.col("s_nationkey").cast("long").alias("src"),
            (F.lit(SUPPLIER_OFFSET) + F.col("s_suppkey")).alias("dst"),
        )
        .unionAll(
            customer.select(
                F.col("c_nationkey").cast("long").alias("src"),
                (F.lit(CUSTOMER_OFFSET) + F.col("c_custkey")).alias("dst"),
            )
        )
        .unionAll(
            # distinct supplier→customer trade edges; the join key
            # (l_orderkey = o_orderkey) lets Catalyst pick SMJ/AQE, and the
            # scan prunes to the two FK columns each side.
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .select(
                (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("src"),
                (F.lit(CUSTOMER_OFFSET) + F.col("o_custkey")).alias("dst"),
            )
            .distinct()
        )
    )
    return NetGraph(vertices, _edge_payload(pairs), init_id=0)


def derive_perturbed(tables: dict[str, DataFrame], original: NetGraph) -> NetGraph:
    """Apply the deterministic perturbation to the original graph."""
    nation = tables["nation"]

    kept = (
        original.vertices.filter(F.col("id") % REMOVE_MOD != 0)
        .withColumn("_modified", F.lit(True))
        .select("id", "_modified")
    )
    added_ids = nation.select(
        (F.lit(ADDED_OFFSET) + F.col("n_nationkey")).cast("long").alias("id"),
        F.lit(False).alias("_modified"),
    )
    vertices = _vertex_attrs(kept.unionAll(added_ids))

    kept_edges = original.edges.filter(
        (F.col("src") % REMOVE_MOD != 0) & (F.col("dst") % REMOVE_MOD != 0)
    )
    added_edges = _edge_payload(
        nation.select(
            F.col("n_nationkey").cast("long").alias("src"),
            (F.lit(ADDED_OFFSET) + F.col("n_nationkey")).alias("dst"),
        )
    )
    return NetGraph(vertices, kept_edges.unionAll(added_edges), init_id=0)


def derive_graphs(spark: SparkSession, sf_dir: str) -> tuple[NetGraph, NetGraph]:
    """(original, perturbed) graph pair for a testdata scale-factor dir."""
    tables = load_tables(spark, sf_dir, GRAPH_TABLES)
    og = derive_original(tables)
    pg = derive_perturbed(tables, og)
    return og, pg


# --------------------------------------------------------------------------
# DuckDB-side derivation: CTE bodies matching the DataFrames above 1:1.
# Every oracle query in __spark_entry__ composes these.
# --------------------------------------------------------------------------

def _attr_sql(src: str, modified: bool) -> str:
    props = (
        f"CASE WHEN id % {MODIFY_MOD} = 0 THEN (id % 20) + 1 ELSE id % 20 END"
        if modified
        else "id % 20"
    )
    return f"""
    SELECT CAST(id AS BIGINT) AS id,
           CAST(id % 8 AS BIGINT) AS children,
           CAST({props} AS BIGINT) AS props,
           CAST(1 AS BIGINT) AS current_depth,
           CAST(id % 100 AS BIGINT) AS prop_value_range,
           CAST(id % 5 AS BIGINT) AS max_depth,
           CAST(id % 7 AS BIGINT) AS max_branching_factor,
           CAST(id % 20 AS BIGINT) AS max_properties,
           (id % 100000) / 100.0 AS stored_value,
           id % 3 <> 0 AS valuable_data
    FROM ({src})
    """


def _payload_sql(src: str) -> str:
    return f"""
    SELECT CAST(src AS BIGINT) AS src,
           CAST(dst AS BIGINT) AS dst,
           CAST((src + dst) % 20 AS BIGINT) AS action_type,
           CAST(src AS BIGINT) AS from_field,
           CAST(dst AS BIGINT) AS to_field,
           CAST(CASE WHEN (src + dst) % 5 = 0 THEN NULL
                     ELSE (src + dst) % 100 END AS BIGINT) AS resulting_value,
           ((src * 7 + dst) % 1000) / 1000.0 AS cost
    FROM ({src})
    """


_OG_IDS = f"""
    SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation
    UNION ALL SELECT {SUPPLIER_OFFSET} + s_suppkey FROM supplier
    UNION ALL SELECT {CUSTOMER_OFFSET} + c_custkey FROM customer
"""

_OG_PAIRS = f"""
    SELECT CAST(s_nationkey AS BIGINT) AS src,
           CAST({SUPPLIER_OFFSET} + s_suppkey AS BIGINT) AS dst FROM supplier
    UNION ALL
    SELECT CAST(c_nationkey AS BIGINT),
           CAST({CUSTOMER_OFFSET} + c_custkey AS BIGINT) FROM customer
    UNION ALL
    SELECT DISTINCT CAST({SUPPLIER_OFFSET} + l_suppkey AS BIGINT),
           CAST({CUSTOMER_OFFSET} + o_custkey AS BIGINT)
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""

_PG_IDS = f"""
    SELECT id FROM og_vertices WHERE id % {REMOVE_MOD} <> 0
    UNION ALL SELECT CAST({ADDED_OFFSET} + n_nationkey AS BIGINT) FROM nation
"""

_PG_PAIRS = f"""
    SELECT src, dst FROM og_edges
    WHERE src % {REMOVE_MOD} <> 0 AND dst % {REMOVE_MOD} <> 0
    UNION ALL
    SELECT CAST(n_nationkey AS BIGINT),
           CAST({ADDED_OFFSET} + n_nationkey AS BIGINT) FROM nation
"""

#: WITH-clause preamble defining og_vertices/og_edges/pg_vertices/pg_edges.
#: NB: pg "modified" props only differ on surviving original ids — added
#: ids (>= ADDED_OFFSET) are never % MODIFY_MOD == 0 ∧ original, but the
#: arithmetic rule applies uniformly, matching _vertex_attrs(_modified).
GRAPH_CTES = f"""
og_vertices AS ({_attr_sql(_OG_IDS, modified=False)}),
og_edges AS ({_payload_sql(_OG_PAIRS)}),
pg_vertex_ids AS ({_PG_IDS}),
pg_vertices AS (
  {_attr_sql("SELECT id FROM pg_vertex_ids WHERE id < " + str(ADDED_OFFSET), modified=True)}
  UNION ALL
  {_attr_sql("SELECT id FROM pg_vertex_ids WHERE id >= " + str(ADDED_OFFSET), modified=False)}
),
pg_edges AS ({_PG_PAIRS})
"""


def graph_sql(body: str) -> str:
    """Wrap an oracle query body with the shared graph CTE preamble."""
    return f"WITH {GRAPH_CTES} {body}"
