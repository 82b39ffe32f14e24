"""Event-time windows: tumbling / sliding / session — batch DataFrame
versions (usable on any table with a timestamp column) and Structured
Streaming variants with watermarks.

Batch and streaming share the same expressions (F.window /
F.session_window work in both modes); the batch forms are what the
DuckDB oracle checks, the streaming forms are covered by streaming
tests with the memory sink.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: tuple[str, ...] = (),
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Tumbling event-time window: one bucket per event."""
    aggs = aggs or {"n": F.count("*")}
    win = F.window(F.col(ts_col), duration)
    out = df.groupBy(win.alias("w"), *keys).agg(
        *[e.alias(n) for n, e in aggs.items()]
    )
    return out.select(
        F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *keys,
        *aggs.keys(),
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: tuple[str, ...] = (),
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Sliding event-time window: each event lands in duration/slide
    overlapping buckets."""
    aggs = aggs or {"n": F.count("*")}
    win = F.window(F.col(ts_col), duration, slide)
    out = df.groupBy(win.alias("w"), *keys).agg(
        *[e.alias(n) for n, e in aggs.items()]
    )
    return out.select(
        F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *keys,
        *aggs.keys(),
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap_minutes: float,
    keys: tuple[str, ...] = ("user_id",),
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Batch sessionization: gaps-and-islands — a new session starts
    when the gap to the previous event (per key) exceeds gap_minutes.

    Scalable: windows are partitioned by the session keys (user_id),
    never a global order. Returns one row per session.
    """
    from pyspark.sql import Window

    aggs = aggs or {"n_events": F.count("*")}
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    gap_sec = F.col(ts_col).cast("double") - F.lag(F.col(ts_col)).over(w).cast("double")
    marked = df.withColumn(
        "_new_session",
        F.when(gap_sec.isNull() | (gap_sec > gap_minutes * 60), 1).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_id",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy(*keys, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            *[e.alias(n) for n, e in aggs.items()],
        )
    )


# ---------------------------------------------------------------------------
# Structured Streaming variants
# ---------------------------------------------------------------------------

def stream_tumbling(
    stream: DataFrame,
    ts_col: str,
    duration: str,
    watermark: str,
    keys: tuple[str, ...] = (),
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Streaming tumbling window with a watermark for late data."""
    aggs = aggs or {"n": F.count("*")}
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys)
        .agg(*[e.alias(n) for n, e in aggs.items()])
        .select(F.col("w.start").alias("window_start"), *keys, *aggs.keys())
    )


def stream_session(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    watermark: str,
    keys: tuple[str, ...] = ("user_id",),
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Streaming session window (native session_window aggregation)."""
    aggs = aggs or {"n_events": F.count("*")}
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *keys)
        .agg(*[e.alias(n) for n, e in aggs.items()])
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *keys,
            *aggs.keys(),
        )
    )
