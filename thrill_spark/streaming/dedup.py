"""Streaming deduplication — the ingest-time half of the dedup family
(functions/dedup.py is the batch half). No reference analogue: Thrill
is strictly batch (SURVEY §2.9 note); this is engine-added capability.

Scale notes: state is hash-partitioned by the dedup key; the watermark
bounds state size (keys older than the horizon are evicted), so memory
is O(keys within watermark), not O(all keys ever). Without a watermark
streaming dedup state grows unboundedly — callers must pass one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def stream_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop rows whose (keys, event-time) was already seen. Exact dedup
    whenever duplicates arrive within the watermark horizon of each
    other; a duplicate arriving later than the horizon is admitted
    (state for its key was evicted) — the standard bounded-state
    trade-off."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates([*keys, ts_col])


def stream_dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Like stream_dedup but keyed on `keys` alone: collapses rows that
    share a key but differ in event time, as long as they arrive within
    the watermark delay (dropDuplicatesWithinWatermark)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
