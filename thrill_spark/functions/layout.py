"""Space-filling-curve data layout (Z-order clustering).

No reference analogue (Thrill's surface stops at 1-D Sort,
reference/thrill/api/sort.hpp:64); this is the multi-dimensional
clustering a 100 TB lakehouse layout needs: rows whose (x, y) are close
land in the same file/partition, so min/max footer stats prune scans
for predicates on EITHER dimension — a 1-D sort can only serve one.

Everything is exact integer arithmetic (bit interleave via masked
multiplies), so a DuckDB oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of x (even positions) and y (odd
    positions) into a single Z-order key.

    Built as a sum of masked multiplies — one whole-stage-codegen
    expression, no UDF: ((x >> i) & 1) * 2^(2i) + ((y >> i) & 1) *
    2^(2i+1), i in [0, bits).
    """
    terms: list[Column] = []
    for i in range(bits):
        terms.append(
            (F.shiftright(x, i).bitwiseAND(F.lit(1))) * F.lit(1 << (2 * i))
        )
        terms.append(
            (F.shiftright(y, i).bitwiseAND(F.lit(1))) * F.lit(1 << (2 * i + 1))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def sql_zvalue(x: str, y: str, bits: int = 16) -> str:
    """DuckDB expression computing the identical Z-order key."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_partitions: int | None = None,
) -> DataFrame:
    """Cluster rows by Z-order of (x_col, y_col): range-partition +
    sort by the interleaved key. Write the result with
    ``write.parquet`` and every file carries tight min/max stats on
    BOTH dimensions.

    At 100 TB this is a single range shuffle (sampled boundaries), the
    same cost as a global sort — the standard price of a clustered
    rewrite.
    """
    mask = (1 << bits) - 1
    z = zvalue(
        F.col(x_col).cast("long").bitwiseAND(F.lit(mask)),
        F.col(y_col).cast("long").bitwiseAND(F.lit(mask)),
        bits,
    )
    out = df.withColumn("_zval", z)
    if n_partitions:
        out = out.repartitionByRange(n_partitions, "_zval")
    return out.sortWithinPartitions("_zval")
