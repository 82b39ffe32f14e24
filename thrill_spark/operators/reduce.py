"""Aggregations: ReduceByKey / ReducePair / GroupByKey / HyperLogLog.

Thrill implements these with spilling hash tables and partial
pre-aggregation before the shuffle (thrill/core/reduce_pre_phase.hpp:42-55,
reduce_probing_hash_table.hpp:77). Spark's HashAggregateExec does
partial/final aggregation with spill natively, so the mapping is
``groupBy().agg()``; GroupByKey's iterator-UDF surface
(thrill/api/group_by_iterator.hpp:39-55) maps to applyInPandas.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def reduce_by_key(
    df: DataFrame,
    keys: Sequence[str | Column],
    aggs: Mapping[str, Column],
) -> DataFrame:
    """ReduceByKey (thrill/api/dia.hpp:900-1172): group by key, combine
    with associative aggregates. Partial (map-side) aggregation + spill
    are Spark-native."""
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.groupBy(*key_cols).agg(*[expr.alias(name) for name, expr in aggs.items()])


def reduce_pair(df: DataFrame, key: str, value: str, combine: Column) -> DataFrame:
    """ReducePair (dia.hpp:1174-1304): ReduceByKey specialization for
    (key, value) pairs; combine is an aggregate over `value`."""
    return df.groupBy(key).agg(combine.alias(value))


def group_by_key(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable,
    schema: str,
) -> DataFrame:
    """GroupByKey (thrill/api/group_by_key.hpp:47): the user function
    sees ALL values of a key (GroupByIterator, group_by_iterator.hpp:39-55).

    Maps to grouped-map applyInPandas: fn(pandas.DataFrame) ->
    pandas.DataFrame per key. Prefer built-in aggregates whenever the
    semantics allow — this is the slow (but Arrow-batched) path, and a
    single giant group must fit in one python worker's memory (Thrill
    has the same constraint per-worker via external sort runs).
    """
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def group_collect(
    df: DataFrame,
    keys: Sequence[str],
    value: str | Column,
    out: str = "values",
    sort_key: str | Column | None = None,
) -> DataFrame:
    """GroupByKey when the user fn just needs the values materialized:
    collect_list (optionally deterministic order via sort_array over
    structs)."""
    val = F.col(value) if isinstance(value, str) else value
    if sort_key is not None:
        sk = F.col(sort_key) if isinstance(sort_key, str) else sort_key
        lst = F.transform(
            F.sort_array(F.collect_list(F.struct(sk.alias("k"), val.alias("v")))),
            lambda s: s["v"],
        )
    else:
        lst = F.collect_list(val)
    return df.groupBy(*keys).agg(lst.alias(out))


def median_by_key(df: DataFrame, keys: Sequence[str], value: str, out: str = "median") -> DataFrame:
    """Exact per-key median (reference workload:
    examples/percentiles/percentiles.cpp:60-75, GroupByKey median).
    Spark's percentile() is an exact aggregate (sort-based per group)."""
    return df.groupBy(*keys).agg(F.percentile(F.col(value), F.lit(0.5)).alias(out))


def hyperloglog(df: DataFrame, col: str, rsd: float = 0.02) -> DataFrame:
    """HyperLogLog approximate distinct count (thrill/api/hyperloglog.hpp:27,
    core/hyperloglog.hpp:27-39 — sparse/dense registers merged by
    AllReduce). Spark's approx_count_distinct is HLL++, same role."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def group_by_key_fold(
    df: DataFrame,
    keys: Sequence[str],
    init: Callable,
    fold: Callable,
    finish: Callable,
    schema,
    order_by: Sequence[str] = (),
) -> DataFrame:
    """GroupByKey for HUGE groups: the secondary-sort pattern the
    reference's implementation actually uses (group_by_key.hpp:205-216 —
    shuffle by key-hash, write key-sorted runs, multiway-merge so the
    user iterator streams each group instead of holding it in RAM).

    repartition(keys) + sortWithinPartitions(keys, order_by) makes each
    group contiguous inside its partition; mapInPandas then streams
    Arrow batches and feeds each group to the caller chunk by chunk:

      state = init(key_tuple)
      state = fold(state, chunk_pdf)   # chunks arrive in order_by order
      row_dict_or_pdf = finish(key_tuple, state)

    Peak memory is O(one Arrow batch + user state), not O(group) —
    applyInPandas (group_by_key above) materializes every group whole,
    which a zipf-hot key at 100 TB will not survive. Anything
    expressible as a bounded-state fold over an ordered group (running
    stats, gap analysis, top-k per key, sessionization) fits; a
    hold-everything fn (exact median) genuinely needs the materializing
    path, same as the reference's external-sorted runs."""
    import pandas as pd

    key_list = list(keys)

    def stream(batches):
        cur_key, state = None, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for kt, grp in pdf.groupby(key_list, sort=False):
                kt = kt if isinstance(kt, tuple) else (kt,)
                if kt != cur_key:
                    if cur_key is not None:
                        out = finish(cur_key, state)
                        if out is not None and len(out):
                            yield out if isinstance(out, pd.DataFrame) else pd.DataFrame([out])
                    cur_key, state = kt, init(kt)
                state = fold(state, grp)
        if cur_key is not None:
            out = finish(cur_key, state)
            if out is not None and len(out):
                yield out if isinstance(out, pd.DataFrame) else pd.DataFrame([out])

    arranged = df.repartition(*key_list).sortWithinPartitions(*key_list, *order_by)
    return arranged.mapInPandas(stream, schema=schema)



# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005) — the point-query
# frequency sketch beside HLL (cardinality) and KMV (distinct): depth
# independent hash rows x width counters, estimate = min over rows.
# Built as a DataFrame of counters (depth*width rows, NOT per-key
# state), so sketches of shards/days MERGE by adding counters — the
# mergeability that lets 1000 executors sketch 100 TB locally and
# combine O(depth*width) integers, never re-scanning.
# Hashes are md5-derived (engine-portable), everything integer-exact.
# ---------------------------------------------------------------------------
def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """(row, slot, cnt) counter table: row d hashes key with salt
    '{salt}|d|'. One explode(depth) + groupBy — linear, map-side
    combinable, output bounded by depth*width."""
    from thrill_spark.functions.text import md5_long

    k = F.col(key_col).cast("string")
    rows = F.array(*[F.lit(d) for d in range(depth)])
    return (
        df.select(F.explode(rows).alias("row"), k.alias("_k"))
        .select(
            "row",
            (
                md5_long(
                    F.concat(F.lit(salt + "|"), F.col("row").cast("string"), F.lit("|"), F.col("_k"))
                )
                % width
            ).alias("slot"),
        )
        .groupBy("row", "slot")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    salt: str = "cms",
) -> DataFrame:
    """Point-query estimates for each key in `keys`: min over the
    depth counters the key hashes to. The sketch is depth*width rows —
    broadcast it; the probe is a broadcast join, no shuffle of keys."""
    from thrill_spark.functions.text import md5_long

    k = F.col(key_col).cast("string")
    rows = F.array(*[F.lit(d) for d in range(depth)])
    probes = keys.select(
        F.col(key_col), F.explode(rows).alias("row"), k.alias("_k")
    ).select(
        key_col,
        "row",
        (
            md5_long(
                F.concat(F.lit(salt + "|"), F.col("row").cast("string"), F.lit("|"), F.col("_k"))
            )
            % width
        ).alias("slot"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "slot"], "left")
        .fillna({"cnt": 0})
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )
