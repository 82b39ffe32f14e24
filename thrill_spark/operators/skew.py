"""Skew mitigation for heavy-hitter keys.

The reference attacks skew with location detection (send each key's
rows to a computed home worker, core/location_detection.hpp) and
duplicate detection (skip shuffling single-worker keys,
core/duplicate_detection.hpp:38-61). On Spark, AQE's skew-join split
covers joins automatically; for *aggregations* over zipf-like keys the
standard remedy is salting, provided here as a first-class operator.

Semantics are identical to a plain groupBy-agg: salting only changes
the physical shuffle (two half-width shuffles instead of one skewed
one), so results stay oracle-checkable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) computes partials on
    ~salt_buckets-way split heavy keys, then groupBy(keys) merges.

    partial_aggs: name -> agg over input columns (e.g. sum, count).
    final_aggs:   name -> agg over the *partial* columns merging them
                  (sum of counts, sum of sums, min of mins, ...).

    The heaviest key now bounds a task at |key| / salt_buckets rows —
    the difference between a straggler and a balanced stage at 100 TB.
    Associative-only (the same contract as Thrill's ReduceByKey reduce
    function, thrill/api/dia.hpp:900-912); non-associative aggregates
    (exact median) need group_by_key instead.
    """
    salted = df.withColumn(SALT, (F.rand(seed=0) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, SALT).agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(*[c.alias(n) for n, c in final_aggs.items()])


def salted_count_sum(
    df: DataFrame, keys: Sequence[str], value: str, salt_buckets: int = 16
) -> DataFrame:
    """Common case: count + sum per key, salt-balanced."""
    return salted_agg(
        df,
        keys,
        partial_aggs={
            "_pc": F.count("*"),
            "_ps": F.sum(F.col(value)),
        },
        final_aggs={
            "n": F.sum("_pc").cast("long"),
            "total": F.sum("_ps"),
        },
        salt_buckets=salt_buckets,
    )


def top_heavy_keys(df: DataFrame, keys: Sequence[str], top: int = 10) -> DataFrame:
    """Diagnostic: the `top` heaviest keys and their row share — the
    input you'd use to pick salt_buckets (or to switch a join side to
    broadcast)."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .withColumn("share", F.col("n") / F.lit(float(total)))
        .orderBy(F.col("n").desc())
        .limit(top)
    )


def bounded_self_join(
    df: DataFrame,
    bucket_cols: Sequence[str],
    salt_on: str,
    left_cols: dict[str, str],
    right_cols: dict[str, str],
    cap: int = 10_000,
) -> DataFrame:
    """Bucket self-join with bounded per-task work: every ordered pair
    of rows sharing a bucket appears exactly once, but no single task
    ever materializes more than ~cap^2 pairs, no matter how degenerate
    the bucket distribution is.

    A plain self-equi-join on the bucket key sends an s-row bucket to
    ONE reducer that emits s^2 pairs — for web-corpus LSH dedup, where
    mass-duplicated boilerplate routinely lands 10^5+ docs in one band
    bucket, that single task is the job killer. Here each bucket is
    decomposed into g = ceil(s/cap) sub-groups by hashing `salt_on`;
    the left side is replicated once per target sub-group and the right
    side once per source sub-group, and the join key becomes
    (bucket, sub_left, sub_right) — g^2 tasks of <=cap^2 pairs each.
    Total pair count (the quadratic part) is unchanged — it is the
    candidate-set semantics — only its placement is load-balanced.

    Semantics: identical to
    df.alias(L).join(df.alias(R), bucket_cols) — each ordered pair
    exactly once — so callers' (id_a < id_b) / (a != b) filters and any
    oracle stay valid. With small buckets g == 1 and the plan degrades
    to the plain bucket join plus one count aggregation.

    left_cols / right_cols: output name -> input column carried for
    each side.
    """
    counts = df.groupBy(*bucket_cols).agg(F.count("*").alias("_bsz"))
    m = df.join(counts, on=list(bucket_cols)).withColumn(
        "_g", F.greatest(F.ceil(F.col("_bsz") / F.lit(cap)), F.lit(1)).cast("int")
    )
    sub = F.pmod(F.xxhash64(F.col(salt_on)), F.col("_g")).cast("int")
    seq = F.sequence(F.lit(0), F.col("_g") - 1)
    left = m.select(
        *bucket_cols,
        sub.alias("_sa"),
        F.explode(seq).alias("_sb"),
        *[F.col(src).alias(name) for name, src in left_cols.items()],
    )
    right = m.select(
        *bucket_cols,
        F.explode(seq).alias("_sa"),
        sub.alias("_sb"),
        *[F.col(src).alias(name) for name, src in right_cols.items()],
    )
    joined = left.join(right, on=[*bucket_cols, "_sa", "_sb"])
    return joined.select(*bucket_cols, *left_cols, *right_cols)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join when the FACT side has heavy-hitter keys and
    the other side is too large to broadcast outright: salt the fact
    rows into salt_buckets sub-keys and replicate each dim row once per
    bucket, joining on (key, salt). The heaviest fact key's rows now
    spread over salt_buckets tasks instead of one straggler; the cost
    is a salt_buckets× blow-up of the dim side's shuffle (choose
    buckets ≈ heaviest-key-share × parallelism, see top_heavy_keys).

    Semantics are identical to fact.join(dim, key): every fact row
    still meets every dim row of its key exactly once (dim replication
    is keyed, not sampled), so results stay oracle-checkable. AQE's
    skew-join split does this automatically for sort-merge joins when
    it can see the skew at runtime; the explicit operator covers plans
    AQE can't rewrite (e.g. under bucketed-table SMJ or when stats
    mislead) and mirrors the reference's location-detection motivation
    (inner_join.hpp:150-164).

    how: 'inner' or 'left' (left = keep unmatched fact rows; outer
    on the dim side would need unsalted semantics — not supported).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    salted_fact = fact.withColumn(SALT, (F.rand(seed=0) * salt_buckets).cast("int"))
    buckets = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias(SALT)
    replicated_dim = dim.select("*", buckets)
    joined = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact[SALT] == replicated_dim[SALT]),
        how,
    )
    return joined.drop(SALT)


def bounded_join(
    left_df: DataFrame,
    right_df: DataFrame,
    bucket_cols: Sequence[str],
    salt_left: str,
    salt_right: str,
    left_cols: dict[str, str],
    right_cols: dict[str, str],
    cap: int = 10_000,
) -> DataFrame:
    """Two-sided bucket equi-join with bounded per-task work — the
    cross-corpus analogue of bounded_self_join.

    Each side is decomposed into g = ceil(side_bucket_size / cap)
    sub-groups; left rows are replicated once per right sub-group and
    vice versa, so one degenerate bucket (hot LSH band shared by 10^5
    corpus docs AND 10^4 batch docs) becomes g_l * g_r tasks of
    <= cap^2 pairs instead of one quadratic straggler. Pair SET is
    identical to left.join(right, bucket_cols).
    """
    lc = left_df.groupBy(*bucket_cols).agg(F.count("*").alias("_lsz"))
    rc = right_df.groupBy(*bucket_cols).agg(F.count("*").alias("_rsz"))
    sizes = lc.join(rc, on=list(bucket_cols)).select(
        *bucket_cols,
        F.greatest(F.ceil(F.col("_lsz") / F.lit(cap)), F.lit(1))
        .cast("int")
        .alias("_gl"),
        F.greatest(F.ceil(F.col("_rsz") / F.lit(cap)), F.lit(1))
        .cast("int")
        .alias("_gr"),
    )
    l = left_df.join(sizes, on=list(bucket_cols)).select(
        *bucket_cols,
        F.pmod(F.xxhash64(F.col(salt_left)), F.col("_gl")).cast("int").alias("_sl"),
        F.explode(F.sequence(F.lit(0), F.col("_gr") - 1)).alias("_sr"),
        *[F.col(src).alias(name) for name, src in left_cols.items()],
    )
    r = right_df.join(sizes, on=list(bucket_cols)).select(
        *bucket_cols,
        F.explode(F.sequence(F.lit(0), F.col("_gl") - 1)).alias("_sl"),
        F.pmod(F.xxhash64(F.col(salt_right)), F.col("_gr")).cast("int").alias("_sr"),
        *[F.col(src).alias(name) for name, src in right_cols.items()],
    )
    joined = l.join(r, on=[*bucket_cols, "_sl", "_sr"])
    return joined.select(*bucket_cols, *left_cols, *right_cols)
