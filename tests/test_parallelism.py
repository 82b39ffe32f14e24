"""RunLocalTests analogue (SURVEY §5): the reference executes every API
test across several simulated cluster shapes
(thrill/api/context.cpp:291-374). Here: the ordered-array ops — the
partition-sensitive part of the engine — are re-run at several
shuffle-partition settings and checked against closed-form expectations.
A partition-dependence bug (e.g. an offset map built from the wrong
partitioning) shows up as a difference between these runs.
"""

import pytest
from pyspark.sql import functions as F

from thrill_spark import ordering as O

PARTITIONS = [1, 3, 17]
N = 101  # deliberately not a multiple of any partition count


@pytest.fixture()
def shuffle_partitions(spark, request):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(request.param))
    yield int(request.param)
    spark.conf.set("spark.sql.shuffle.partitions", old)


def _vals(spark, parts):
    # spread input over an unrelated partitioning to stress the reindex
    return spark.range(N).repartition(parts if parts > 1 else 2).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


@pytest.mark.parametrize("shuffle_partitions", PARTITIONS, indirect=True)
def test_with_index_dense_at_any_parallelism(spark, shuffle_partitions):
    df = _vals(spark, shuffle_partitions)
    out = O.with_index(df, ["k"]).orderBy("k").collect()
    assert [r[O.IDX] for r in out] == list(range(N))
    assert [r["k"] for r in out] == list(range(N))


@pytest.mark.parametrize("shuffle_partitions", PARTITIONS, indirect=True)
def test_prefix_sum_closed_form(spark, shuffle_partitions):
    df = _vals(spark, shuffle_partitions)
    out = O.prefix_sum(df, ["k"], F.col("v"), name="ps").orderBy("k").collect()
    # v = 2k -> inclusive prefix sum = k(k+1)
    assert [r["ps"] for r in out] == [k * (k + 1) for k in range(N)]


@pytest.mark.parametrize("shuffle_partitions", PARTITIONS, indirect=True)
def test_ex_prefix_sum_closed_form(spark, shuffle_partitions):
    df = _vals(spark, shuffle_partitions)
    out = (
        O.prefix_sum(df, ["k"], F.col("v"), name="eps", exclusive=True)
        .orderBy("k")
        .collect()
    )
    assert [r["eps"] for r in out] == [k * (k - 1) for k in range(N)]


@pytest.mark.parametrize("shuffle_partitions", PARTITIONS, indirect=True)
def test_sliding_window_sum_closed_form(spark, shuffle_partitions):
    df = _vals(spark, shuffle_partitions)
    out = O.sliding_window(df, ["k"], size=3, aggs={"s": F.sum("v")})
    got = {r["k"]: r["s"] for r in out.collect()}
    for k in range(2, N):  # full windows only
        assert got[k] == 2 * (k + (k - 1) + (k - 2)), k


@pytest.mark.parametrize("shuffle_partitions", PARTITIONS, indirect=True)
def test_disjoint_window_blocks(spark, shuffle_partitions):
    df = _vals(spark, shuffle_partitions)
    out = O.disjoint_window(df, ["k"], size=10, aggs={"n": F.count("*"), "mx": F.max("k")})
    got = sorted((r["window_id"], r["n"], r["mx"]) for r in out.collect())
    expect = [(b, min(10, N - b * 10), min(N - 1, b * 10 + 9)) for b in range((N + 9) // 10)]
    assert got == expect


@pytest.mark.parametrize("shuffle_partitions", PARTITIONS, indirect=True)
def test_zip_cut_and_pad_at_any_parallelism(spark, shuffle_partitions):
    a = spark.range(10).select(F.col("id").alias("x"))
    b = spark.range(7).select((F.col("id") * 10).alias("y"))
    cut = O.zip_dfs([a, b], [["x"], ["y"]], how="cut").orderBy("x").collect()
    assert len(cut) == 7 and all(r["y"] == 10 * r["x"] for r in cut)
    pad = O.zip_dfs([a, b], [["x"], ["y"]], how="pad").orderBy(O.IDX).collect()
    assert len(pad) == 10 and pad[9]["y"] is None
