"""Local ops (LOps): Map / Filter / FlatMap / Union / BernoulliSample.

Thrill fuses these onto the function stack without creating DAG nodes
(thrill/api/dia.hpp:357-496); Catalyst's project/filter collapse +
whole-stage codegen is the exact analogue, so these are thin wrappers
that keep everything expression-based (JVM-side).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def map_rows(df: DataFrame, exprs: Mapping[str, Column]) -> DataFrame:
    """Map (dia.hpp:357-387): 1->1 type-changing transform, expressed as
    a projection of named expression columns."""
    return df.select(*[expr.alias(name) for name, expr in exprs.items()])


def with_columns(df: DataFrame, exprs: Mapping[str, Column]) -> DataFrame:
    """Map variant that appends/overwrites columns."""
    return df.withColumns(dict(exprs))


def filter_rows(df: DataFrame, predicate: Column) -> DataFrame:
    """Filter (dia.hpp:404-432)."""
    return df.filter(predicate)


def flat_map(
    df: DataFrame,
    explode_expr: Column,
    out_name: str,
    keep: Sequence[str] = (),
    keep_empty: bool = False,
) -> DataFrame:
    """FlatMap (dia.hpp:457-474): 1->0..n via an array expression +
    explode. keep_empty=True uses explode_outer (emits a null row for
    empty arrays, like a window fn that may emit nothing vs once)."""
    exploder = F.explode_outer if keep_empty else F.explode
    return df.select(*keep, exploder(explode_expr).alias(out_name))


def union_bag(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union (thrill/api/union.hpp:53): bag union, no dedup, no
    rebalance, arbitrary order — Spark unionByName without distinct."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def bernoulli_sample(df: DataFrame, p: float, seed: int | None = None) -> DataFrame:
    """BernoulliSample(p) (thrill/api/bernoulli_sample.hpp:27):
    independent coin flip per item."""
    return df.sample(fraction=p, seed=seed)


def systematic_sample(df: DataFrame, order_by: Sequence[str | Column], every_k: int) -> DataFrame:
    """Deterministic 1-in-k systematic sample over a total order —
    oracle-friendly stand-in for Sample(k) (thrill/api/sample.hpp:33-50)
    when exactness of membership matters more than randomness."""
    from thrill_spark.ordering import IDX, with_index

    return with_index(df, order_by).filter(F.col(IDX) % every_k == 0).drop(IDX)


def exact_sample(df: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """Sample(k): exactly k items uniformly without replacement
    (thrill/api/sample.hpp:33-50, Sanders et al. TOMS 2017). At scale the
    hypergeometric split avoids a global sort; orderBy(rand).limit(k) is
    acceptable because limit(k) only materializes k rows per partition
    then k overall (TakeOrderedAndProject)."""
    return df.orderBy(F.rand(seed)).limit(k)
