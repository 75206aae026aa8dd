"""Z-order (Morton) interleaving for multi-dimensional data layout.

The lakehouse clustering trick (Delta OPTIMIZE ZORDER BY, Iceberg
sort orders): sorting files by the bit-interleaved code of two columns
gives parquet min/max zone maps selectivity on BOTH columns at once —
a range filter on either column prunes row groups, where a plain sort
only serves its leading column. The code itself is pure integer bit
algebra (shifts/masks/adds), so it is engine-exact and DuckDB-oracle
checkable like any other query, and it composes with the existing
write paths: ``df.repartitionByRange(N, code).sortWithinPartitions
(code).write.parquet(...)`` lays files out along the Z-curve.

Columns must be non-negative and fit in `bits` bits (the default 21×2
fills a 42-bit code, comfortably inside BIGINT); caller clamps or
offsets signed/larger domains first — the usual practice of Z-ordering
a bucketed/binned key rather than a raw value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton2(x: Column, y: Column, bits: int = 21) -> Column:
    """Bit-interleaved Z-order code of two non-negative integer
    columns: x's bit i lands at code bit 2i, y's at 2i+1. Built as one
    flat sum of shift/mask terms — whole-stage-codegen folds it into a
    single projection, no UDF."""
    xs = x.cast("long")
    ys = y.cast("long")
    code = F.lit(0).cast("long")
    for i in range(bits):
        code = code + F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i)
        code = code + F.shiftleft(
            F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return code


def morton2_sql(x: str, y: str, bits: int = 21) -> str:
    """DuckDB twin of :func:`morton2` over column names — kept in
    lockstep so Z-order layouts are oracle-checkable."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
