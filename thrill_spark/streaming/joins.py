"""Stream-stream joins with event-time range conditions. No reference
analogue (Thrill is batch-only); engine-added capability mirroring the
batch as-of/range joins in operators/join.py.

Scale notes: both sides shuffle on the equi-join key; watermarks on
BOTH sides plus the time-range condition are what let Spark bound the
join state (rows outside [lower, upper] of the other side's watermark
are evicted). An unbounded stream-stream join without both is rejected
by Spark for exactly this reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "1 hour",
    max_lag: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events to left-side events with the same key
    where right_ts in [left_ts, left_ts + max_lag] (e.g. clicks joined
    to the impression they followed). Columns are prefixed l_/r_ to
    keep both sides' timestamps addressable."""
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, left_ts)],
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)],
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_lag}"))
    )
    return l.join(r, cond, how)
