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


def test_salted_join_equivalence_on_zipf(spark):
    """salted_join must produce exactly the rows of the plain join on a
    zipf-skewed fact table (hot key = ~half the rows), inner and left."""
    import random

    from thrill_spark.operators.skew import salted_join

    rnd = random.Random(7)
    # zipf-ish: key 0 huge, tail sparse; some fact keys missing from dim
    fact_rows = [(0 if rnd.random() < 0.5 else rnd.randint(1, 50), i) for i in range(20_000)]
    fact = spark.createDataFrame(fact_rows, ["k", "payload"])
    dim = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(0, 40)], ["dk", "attr"]
    )
    for how in ("inner", "left"):
        plain = sorted(
            (r["k"], r["payload"], r["attr"])
            for r in fact.join(dim, fact["k"] == dim["dk"], how).select(
                "k", "payload", "attr"
            ).collect()
        )
        salted = sorted(
            (r["k"], r["payload"], r["attr"])
            for r in salted_join(fact, dim, "k", "dk", salt_buckets=8, how=how)
            .select("k", "payload", "attr")
            .collect()
        )
        assert salted == plain, f"{how}: salted join diverges from plain join"
