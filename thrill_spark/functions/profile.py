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
