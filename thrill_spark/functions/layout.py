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


# ---------------------------------------------------------------------------
# Hilbert-curve layout: better locality than Z-order (no long jumps at
# quadrant boundaries), the clustering modern lakehouses moved to.
# The per-level state transform is unrolled `bits` times as plain
# integer/conditional expressions, so Spark columns and DuckDB SQL are
# generated from the SAME level recipe and stay engine-identical.
# ---------------------------------------------------------------------------


def hvalue(x: Column, y: Column, bits: int = 8) -> Column:
    """Hilbert index d of (x, y) on a 2^bits x 2^bits grid (canonical
    xy2d: per level, quadrant digit (3*rx)^ry weighted s*s, then the
    reflect+swap rotation). Pure codegen expressions — one chained
    CASE/arith tree per level, no UDF."""
    n = 1 << bits
    d = F.lit(0).cast("long")
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = F.shiftright(x, k).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, k).bitwiseAND(F.lit(1))
        digit = (rx * 3).bitwiseXOR(ry)
        d = d + digit.cast("long") * F.lit(s * s)
        # rotation: when ry == 0 -> (reflect if rx == 1) then swap x/y
        refl_x = F.when(rx == 1, F.lit(n - 1) - x).otherwise(x)
        refl_y = F.when(rx == 1, F.lit(n - 1) - y).otherwise(y)
        nx = F.when(ry == 0, refl_y).otherwise(x)
        ny = F.when(ry == 0, refl_x).otherwise(y)
        x, y = nx, ny
    return d


def sql_hvalue(x: str, y: str, bits: int = 8) -> str:
    """DuckDB CTE chain computing the identical Hilbert index. Returns
    a WITH-fragment: `h0 AS (SELECT *, {x} AS _hx, {y} AS _hy,
    CAST(0 AS BIGINT) AS hval FROM {src}), h1 AS ...` is the caller's
    job — this emits the per-level SELECT bodies as a list."""
    n = 1 << bits
    levels = []
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        rx = f"((_hx >> {k}) & 1)"
        ry = f"((_hy >> {k}) & 1)"
        digit = f"xor({rx} * 3, {ry})"
        refl_x = f"(CASE WHEN {rx} = 1 THEN {n - 1} - _hx ELSE _hx END)"
        refl_y = f"(CASE WHEN {rx} = 1 THEN {n - 1} - _hy ELSE _hy END)"
        levels.append(
            f"SELECT * REPLACE (hval + CAST({digit} AS BIGINT) * {s * s} AS hval,"
            f" CASE WHEN {ry} = 0 THEN {refl_y} ELSE _hx END AS _hx,"
            f" CASE WHEN {ry} = 0 THEN {refl_x} ELSE _hy END AS _hy)"
        )
    return levels


def hilbert_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    n_partitions: int | None = None,
) -> DataFrame:
    """Cluster rows by Hilbert index of (x_col, y_col) — same single
    range-shuffle cost as zorder_layout, tighter per-file bounding
    boxes (Hilbert's unit-step property removes Z's quadrant jumps)."""
    mask = (1 << bits) - 1
    # chained projections, NOT the single hvalue() expression: nesting
    # re-expands x/y ~4x per level and analysis/codegen blows up
    # super-exponentially past ~6 bits (observed: an 8-bit single
    # expression hangs planning)
    out = with_hvalue(
        df,
        F.col(x_col).cast("long").bitwiseAND(F.lit(mask)),
        F.col(y_col).cast("long").bitwiseAND(F.lit(mask)),
        bits=bits,
        out="_hval",
    )
    if n_partitions:
        out = out.repartitionByRange(n_partitions, "_hval")
    return out.sortWithinPartitions("_hval")


def with_hvalue(
    df: DataFrame, x_col: Column, y_col: Column, bits: int = 8, out: str = "hval"
) -> DataFrame:
    """Hilbert index as CHAINED PROJECTIONS (one select per level):
    the naive single-expression form re-nests x/y ~4x per level
    (4^bits leaf blowup for codegen); projecting the (x, y, d) state
    between levels keeps the plan linear in `bits` — all levels still
    fuse into one whole-stage-codegen span."""
    n = 1 << bits
    base = [c for c in df.columns]
    cur = df.select(
        *base,
        x_col.cast("long").alias("_hx"),
        y_col.cast("long").alias("_hy"),
        F.lit(0).cast("long").alias(out),
    )
    for k in range(bits - 1, -1, -1):
        s = 1 << k
        x, y = F.col("_hx"), F.col("_hy")
        rx = F.shiftright(x, k).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, k).bitwiseAND(F.lit(1))
        digit = (rx * 3).bitwiseXOR(ry)
        refl_x = F.when(rx == 1, F.lit(n - 1) - x).otherwise(x)
        refl_y = F.when(rx == 1, F.lit(n - 1) - y).otherwise(y)
        cur = cur.select(
            *base,
            F.when(ry == 0, refl_y).otherwise(x).alias("_hx"),
            F.when(ry == 0, refl_x).otherwise(y).alias("_hy"),
            (F.col(out) + digit.cast("long") * F.lit(s * s)).alias(out),
        )
    return cur.drop("_hx", "_hy")
