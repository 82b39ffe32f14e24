"""Bucketed tables: the co-located-join scale path.

At 100 TB the dominant cost of a repeated fact-fact join is the
shuffle. Bucketing both tables by the join key at write time
(`bucketBy` + `sortBy`) lets every later join/groupBy on that key run
shuffle-free — Spark's durable answer to the reference's
location-detection machinery (core/location_detection.hpp), which
recomputes key homes per join instead of persisting them.

Local usage requires a warehouse (saveAsTable); tests point
spark.sql.warehouse.dir at a temp dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df bucketed (and per-bucket sorted) by bucket_cols.
    num_buckets should divide evenly into cluster cores; at 100 TB
    pick buckets so one bucket ~ one task's worth of data."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
