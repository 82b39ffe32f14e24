"""Joins. Thrill has equi inner join only (thrill/api/inner_join.hpp:710);
Spark adds outer/semi/anti/cross natively, and we add as-of and range
joins (absent from both reference and vanilla Spark) as compositions.

Thrill's physical strategy (hash-partition both sides, key-sorted runs,
buffered multiway sort-merge, inner_join.hpp:200-236) is what Spark's
SortMergeJoinExec already is; small sides should broadcast instead
(inner_join's LocationDetectionFlag motivation is covered by AQE).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def inner_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | Column,
    broadcast_right: bool = False,
) -> DataFrame:
    """InnerJoin (thrill/api/inner_join.hpp:710,806). broadcast_right
    forces a broadcast-hash join for dimension-sized right sides."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how="inner")


def join_dfs(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Full join family (inner/left/right/full/semi/anti/cross) — the
    SQL surface Thrill lacks but a replacement engine must provide."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_time_left: str,
    on_time_right: str,
    by: Sequence[str] = (),
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right.time <= left.time (direction='backward'; 'forward' is >=).

    Not in the reference or vanilla Spark; composed as union + window
    last()/first() over event order — fully shuffle-based, no pandas,
    scales with the by-key partitioning.

    With by=() there is no partition key, so a plain
    Window.partitionBy() would be a single-partition global window (the
    package's never-single-partition rule). The unkeyed case instead
    range-partitions the union on time and runs the fill two-phase:
    partition-local window fill + an O(#partitions) driver carry of
    each partition's boundary right-row, broadcast-joined back — the
    same shape as ordering.prefix_sum.
    """
    from pyspark.sql import Window

    lcols = left.columns
    rcols = [c for c in right.columns if c not in by]
    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("_is_left"),
        F.col(on_time_left).alias("_t"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in rcols],
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by],
        *[F.col(c) for c in by],
        F.lit(0).alias("_is_left"),
        F.col(on_time_right).alias("_t"),
        *[F.col(c).alias(c + suffix) for c in rcols],
    ).select(*[c for c in l_tag.columns])
    both = l_tag.unionByName(r_tag)
    backward = direction == "backward"
    if not by:
        return _asof_fill_unkeyed(both, lcols, rcols, suffix, backward)
    if backward:
        w = Window.partitionBy(*by).orderBy(F.col("_t").asc(), F.col("_is_left").asc()).rowsBetween(
            Window.unboundedPreceding, 0
        )
        picker = F.last
    else:
        w = Window.partitionBy(*by).orderBy(F.col("_t").asc(), F.col("_is_left").desc()).rowsBetween(
            0, Window.unboundedFollowing
        )
        picker = F.first
    filled = both.select(
        "*", *[picker(F.col(c + suffix), ignorenulls=True).over(w).alias("_f_" + c) for c in rcols]
    )
    out = filled.filter(F.col("_is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col("_f_" + c).alias(c + suffix) for c in rcols],
    )
    return out


def _asof_fill_unkeyed(
    both: DataFrame, lcols: list[str], rcols: list[str], suffix: str, backward: bool
) -> DataFrame:
    """Two-phase unkeyed as-of fill: range-partition on (_t, _is_left),
    window-fill within each partition, and carry each partition's
    boundary right-row across partitions via a tiny broadcast-joined
    carry table (one row per partition).

    The carry itself is computed distributed — an exclusive scan over
    partition ids expressed as a broadcast theta-join on the bounds
    table (<= one row per partition, so O(#parts^2) comparisons on
    metadata-scale data) — rather than a driver collect+loop or a
    global single-partition window, either of which would reintroduce
    a driver/straggler path into a hot operator.
    """
    from pyspark.sql import Window

    from thrill_spark.ordering import _persist

    pid = "_asof_pid"
    # Range-partition on the FULL tie-broken order: at equal _t the fill
    # direction decides whether right rows sort before (backward) or
    # after (forward) left rows, and the partition boundaries must agree
    # with that order or boundary-tied right rows could land on the
    # wrong side of the carry.
    order = [F.col("_t").asc(), F.col("_is_left").asc() if backward else F.col("_is_left").desc()]
    part = _persist(
        both.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn(pid, F.spark_partition_id())
    )
    n_parts = part.rdd.getNumPartitions()
    scols = [c + suffix for c in rcols]
    # boundary right-row per partition: latest (backward) / earliest
    # (forward) right event in that partition
    pick = F.max_by if backward else F.min_by
    bounds = (
        part.filter(F.col("_is_left") == 0)
        .groupBy(F.col(pid).alias("_p"))
        .agg(*[pick(F.col(c), F.struct("_t")).alias(c) for c in scols])
    )
    # exclusive carry scan over partition ids: for partition p, the
    # boundary of the nearest preceding (backward) / following (forward)
    # partition that contains any right row. parts * bounds is at most
    # #parts^2 pairs; bounds is broadcast.
    spark = both.sparkSession
    parts = spark.range(n_parts).select(F.col("id").cast("int").alias(pid))
    pred = F.col("_p") < F.col(pid) if backward else F.col("_p") > F.col(pid)
    pick_part = F.max_by if backward else F.min_by
    carry = (
        parts.join(F.broadcast(bounds), pred, "left")
        .groupBy(pid)
        .agg(
            pick_part(F.struct(*[F.col(c) for c in scols]), F.col("_p")).alias("_b")
        )
        .select(pid, *[F.col("_b." + c).alias("_cr_" + c) for c in scols])
    )
    w = Window.partitionBy(pid).orderBy(*order)
    if backward:
        frame = w.rowsBetween(Window.unboundedPreceding, 0)
        local = {c: F.last(F.col(c), ignorenulls=True).over(frame) for c in scols}
    else:
        frame = w.rowsBetween(0, Window.unboundedFollowing)
        local = {c: F.first(F.col(c), ignorenulls=True).over(frame) for c in scols}
    filled = part.join(F.broadcast(carry), on=pid).select(
        "*", *[F.coalesce(local[c], F.col("_cr_" + c)).alias("_f_" + c) for c in scols]
    )
    return filled.filter(F.col("_is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col("_f_" + c + suffix).alias(c + suffix) for c in rcols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    by: Sequence[str] = (),
    bucket_width: float | None = None,
) -> DataFrame:
    """Range join: left.point in [right.lo, right.hi). Naive theta-join
    is O(n*m); with bucket_width set, both sides are bucketized and
    equi-joined on (by, bucket) before the range filter — the scalable
    path when intervals are bounded."""
    if bucket_width is None:
        cond = [F.col(left_point) >= F.col(right_lo), F.col(left_point) < F.col(right_hi)]
        for b in by:
            cond.append(left[b] == right[b])
        return left.join(right, on=cond)
    lb = left.withColumn("_bkt", F.floor(F.col(left_point) / F.lit(bucket_width)))
    rb = right.withColumn(
        "_bkts",
        F.sequence(
            F.floor(F.col(right_lo) / F.lit(bucket_width)),
            F.floor((F.col(right_hi) - F.lit(1e-12)) / F.lit(bucket_width)),
        ),
    ).withColumn("_bkt", F.explode("_bkts")).drop("_bkts")
    on = ["_bkt", *by]
    out = lb.join(rb, on=on).filter(
        (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) < F.col(right_hi))
    )
    return out.drop("_bkt")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_days: int = 30,
) -> DataFrame:
    """Interval-overlap join (both sides carry [start, end] timestamp
    intervals; emit pairs where they overlap) via time-bin explosion —
    the scale pattern for temporal joins Spark has no native operator
    for.

    Each interval explodes to the `bin_days`-sized epoch bins it
    touches; candidates equi-join on the bin id (a plain hash
    shuffle), then the true predicate filters. Duplicate elimination
    is FREE: a pair is kept only in the bin of max(l_start, r_start) —
    for genuinely overlapping intervals that bin is touched by both
    sides exactly once, so no distinct/shuffle is spent de-duping.

    Scale: work ∝ Σ interval_span/bin_days per row — bounded fan-out
    when bin_days is sized to the typical span (pick bin_days ≈
    median span; a 100 TB run tunes it per table). Skewed hot bins
    decompose further via operators/skew.py if needed. Thrill
    analogue: none (InnerJoin is equi-only, thrill/api/inner_join.hpp);
    this is the standard bin-join rewrite from temporal databases.
    """
    epoch = "1970-01-01"

    def bins(start: str, end: str):
        sb = F.expr(f"datediff({start}, '{epoch}') div {bin_days}")
        eb = F.expr(f"datediff({end}, '{epoch}') div {bin_days}")
        return F.explode(F.sequence(sb, eb)).alias("_bin")

    lb = left.select("*", bins(l_start, l_end), F.col(l_start).alias("_ls"))
    rb = right.select("*", bins(r_start, r_end), F.col(r_start).alias("_rs"))
    keep_bin = F.expr(
        f"greatest(datediff(_ls, '{epoch}'), datediff(_rs, '{epoch}')) div {bin_days}"
    )
    return (
        lb.join(rb, "_bin")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_bin") == keep_bin)
        )
        .drop("_bin", "_ls", "_rs")
    )
