"""Data profiling: per-column null / distinct / min / max report.

No reference analogue (Thrill has no catalog layer); this is the
ingest-time audit a 100 TB lake runs on every new dataset. One
aggregation pass over the table (Spark's expand handles the multiple
COUNT(DISTINCT)s map-side), then a stack() pivot to one row per
column — no per-column scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: (col_name, n_null, n_distinct, min_str,
    max_str). min/max are computed on the native type, then cast to
    string for the uniform report schema.

    Callers should pre-cast float columns (binary-to-decimal string
    formatting is engine-specific) and format timestamps explicitly.
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"_tot_{c}"),
            F.count(c).alias(f"_cnt_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _tot_{c} - _cnt_{c}, _nd_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) "
            "as (col_name, n_null, n_distinct, min_str, max_str)"
        )
    )


def key_skew_report(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Join/agg-key skew diagnostic: the top_n heaviest keys with their
    row counts and corpus share in basis points (exact-integer), plus
    each key's multiple of the mean key load (x1000, integer).

    This is the planning probe you run BEFORE a 100 TB join to decide
    between plain shuffle, broadcast, AQE skew-split, or salting
    (operators/skew.py): a key holding >5% of rows will stall a
    1000-executor shuffle join on one task. One groupBy pass + a
    scalar-broadcast share computation; the top-k cut is a single
    ORDER BY LIMIT on the key-count table (vocabulary-sized, not
    corpus-sized). Deterministic tie-break on key value.

    The key keeps its native type (an unconditional numeric cast would
    NULL out string keys under non-ANSI mode and collapse the whole
    table into one meaningless NULL-key row), so any key type groups
    correctly and ties break in the key's own ordering.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").cast("long").alias("_total"),
        F.count("*").cast("long").alias("_n_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            F.expr("n_rows * 10000 div _total").cast("long").alias("share_bp"),
            F.expr("n_rows * 1000 * _n_keys div _total").cast("long").alias(
                "x_mean_millis"
            ),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_n)
    )
