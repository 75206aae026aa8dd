"""DataFrame-native Bloom filter for join pruning.

Spark's internal bloom machinery (`BloomFilterAggregate`, runtime
row-group filters) is not exposed as a SQL-callable function, so this
builds the same capability from public primitives: the filter is ONE
ROW holding a map<int, long> of 64-bit words (bit i of word w set ⇒
some key hashed to position w·64+i), aggregated with bit_or — fully
JVM-side and broadcastable. The k hash functions are seeded native
xxhash64: the filter is engine-LOCAL (its correctness contract — no
false negatives — only needs build and probe to hash identically, and
the bloom_pruned_join oracle compares the UNPRUNED join), so it does
not pay the md5-string hash56 family's per-row cost.

Use case — semi-join pruning without a shuffle: build the filter over
the SMALL side's keys (one aggregation to a KB-scale row), broadcast
it, and filter the 100 TB side with `might_contain` as a plain
projection before the real join. False positives only cost wasted join
input (the join itself stays correct); false negatives cannot happen,
which is the property the tests and the `bloom_pruned_join` oracle pin
(the pruned join must equal the unpruned join exactly).

Sizing: FPR ≈ (1 − e^(−k·n/m))^k; the defaults (m = 2^17 bits,
k = 4) give < 1% at n = 10k keys. At larger n pass a larger m — the
filter row grows as m/64 longs and stays broadcast-cheap into the
hundreds of MB of keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 17
DEFAULT_K = 4


def _positions(col_expr: str, m_bits: int, k: int) -> list[str]:
    """k seeded bit positions per key — native xxhash64, NOT the md5
    hash56 family: the filter never crosses engines (the
    bloom_pruned_join oracle compares the UNPRUNED join, and the
    no-false-negative safety only needs build and probe to hash
    identically), while the md5 path cost a string concat + md5 + hex
    conv PER ROW PER HASH on the 100 TB probe side (and twice that in
    might_contain, whose word and bit tests each inline the position)."""
    return [
        f"pmod(xxhash64({j}L, ({col_expr})), {m_bits})" for j in range(k)
    ]


def build_bloom(
    df: DataFrame, col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> DataFrame:
    """One-row DataFrame (`bloom` map<int,long>) over df[col]'s values.

    Plan: k in-row hash positions → explode → word/bit split → bit_or
    per word (partial-aggregated: each map task emits ≤ m/64 words) →
    one map_from_entries row. No Python anywhere.
    """
    pos_arr = F.array(*[F.expr(p) for p in _positions(col, m_bits, k)])
    words = (
        df.select(F.explode(pos_arr).alias("pos"))
        .select(
            F.expr("cast(pos div 64 as int)").alias("i"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("w"),
        )
        .groupBy("i")
        .agg(F.bit_or("w").alias("w"))
    )
    return words.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("i", "w")))
        ).alias("bloom")
    )


def might_contain(
    col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K,
    bloom_col: str = "bloom",
) -> Column:
    """Boolean Column: every one of col's k hash bits is set in
    `bloom_col` (the map from build_bloom, usually broadcast-joined
    onto the probe side). Guaranteed true for every inserted value."""
    tests = []
    for p in _positions(col, m_bits, k):
        word = f"coalesce(element_at({bloom_col}, cast(({p}) div 64 as int)), 0L)"
        tests.append(
            f"((shiftright({word}, cast(({p}) % 64 as int)) & 1) = 1)"
        )
    return F.expr(" AND ".join(tests))


def bloom_prune(
    big: DataFrame,
    small: DataFrame,
    big_col: str,
    small_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """`big` filtered to rows whose `big_col` MIGHT appear in
    `small[small_col]` — the shuffle-free pre-join prune. Compose as
    ``bloom_prune(fact, dim_filtered, "k", "k").join(dim_filtered, ...)``:
    the subsequent join output is byte-identical to joining unpruned.

    The broadcast filter rides along under a collision-proof internal
    name, so a probe side that itself has a `bloom` column passes
    through untouched.
    """
    internal = "__bloom_filter__"
    bloom = build_bloom(small, small_col, m_bits, k).select(
        F.col("bloom").alias(internal)
    )
    return (
        big.crossJoin(F.broadcast(bloom))
        .filter(might_contain(big_col, m_bits, k, bloom_col=internal))
        .drop(internal)
    )
