"""Operator tests mirroring the reference's per-op suites
(tests/api/reduce_node_test.cpp, join_test.cpp etc. — computed
expectations, duplicate-key cross products, type mixes)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from thrill_spark.operators import actions as ACT
from thrill_spark.operators import basic as B
from thrill_spark.operators import join as J
from thrill_spark.operators import reduce as R


def test_reduce_by_key_closed_form(spark):
    # mirrors reduce_node_test.cpp: keys i % m, sum check via closed form
    n, m = 1000, 7
    df = spark.range(n).select((F.col("id") % m).alias("k"), F.col("id").alias("v"))
    out = {r["k"]: r["s"] for r in R.reduce_by_key(df, ["k"], {"s": F.sum("v")}).collect()}
    for k in range(m):
        assert out[k] == sum(i for i in range(n) if i % m == k)


def test_inner_join_duplicate_keys_cross_product(spark):
    # mirrors join_test.cpp same-key case: n x m matches per key
    a = spark.createDataFrame([(1, "a1"), (1, "a2"), (2, "a3")], ["k", "l"])
    b = spark.createDataFrame([(1, "b1"), (1, "b2"), (1, "b3"), (3, "b4")], ["k", "r"])
    out = J.inner_join(a, b, on=["k"]).collect()
    assert len(out) == 2 * 3  # key 1: 2x3, key 2/3: no match


def test_join_family(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    b = spark.createDataFrame([(2,), (3,), (4,)], ["k"])
    assert J.join_dfs(a, b, ["k"], "left_semi").count() == 2
    assert J.join_dfs(a, b, ["k"], "left_anti").count() == 1
    assert J.join_dfs(a, b, ["k"], "full_outer").count() == 4
    assert J.join_dfs(a, b, ["k"], "left").count() == 3


def test_asof_join_matches_pandas(spark):
    trades = [(1, 10.0), (1, 25.0), (2, 7.0), (2, 100.0)]
    quotes = [(1, 5.0, 100), (1, 20.0, 110), (2, 8.0, 200), (2, 50.0, 210)]
    left = spark.createDataFrame(trades, ["sym", "t"])
    right = spark.createDataFrame(quotes, ["sym", "t", "px"])
    out = J.asof_join(left, right, "t", "t", by=["sym"]).orderBy("sym", "t").collect()
    lp = pd.DataFrame(trades, columns=["sym", "t"]).sort_values("t")
    rp = pd.DataFrame(quotes, columns=["sym", "t", "px"]).sort_values("t")
    exp = pd.merge_asof(lp, rp, on="t", by="sym", direction="backward").sort_values(
        ["sym", "t"]
    )
    got = [(r["sym"], r["t"], r["px_r"]) for r in out]
    want = [
        (int(r.sym), float(r.t), None if pd.isna(r.px) else int(r.px))
        for r in exp.itertuples()
    ]
    assert got == want


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, 10.0)], ["sym", "t"])
    right = spark.createDataFrame([(1, 5.0, 1), (1, 12.0, 2), (1, 30.0, 3)], ["sym", "t", "px"])
    out = J.asof_join(left, right, "t", "t", by=["sym"], direction="forward").collect()
    assert out[0]["px_r"] == 2  # first quote at t>=10


def test_range_join_bucketized_equals_naive(spark):
    points = spark.createDataFrame([(float(i),) for i in range(50)], ["p"])
    ivals = spark.createDataFrame(
        [(0.0, 10.0, "a"), (5.0, 7.0, "b"), (40.0, 55.0, "c")], ["lo", "hi", "tag"]
    )
    naive = J.range_join(points, ivals, "p", "lo", "hi")
    bucket = J.range_join(points, ivals, "p", "lo", "hi", bucket_width=8.0)
    ns = sorted((r["p"], r["tag"]) for r in naive.collect())
    bs = sorted((r["p"], r["tag"]) for r in bucket.collect())
    assert ns == bs and len(ns) == 10 + 2 + 10


def test_union_bag_keeps_duplicates(spark):
    a = spark.createDataFrame([(1,), (1,)], ["v"])
    b = spark.createDataFrame([(1,)], ["v"])
    assert B.union_bag([a, b]).count() == 3


def test_flat_map_empty_arrays(spark):
    df = spark.createDataFrame([("a b",), ("",)], ["s"])
    words = B.flat_map(df, F.split(F.col("s"), " "), "w")
    assert words.filter(F.col("w") != "").count() == 2


def test_samples(spark):
    df = spark.range(10000)
    n = B.bernoulli_sample(df, 0.1, seed=1).count()
    assert 800 < n < 1200
    assert B.exact_sample(df, 17).count() == 17
    sys = B.systematic_sample(df.withColumnRenamed("id", "v"), ["v"], 100)
    assert sys.count() == 100


def test_actions(spark):
    df = spark.range(100).withColumnRenamed("id", "v")
    assert ACT.size(df) == 100
    assert ACT.sum_action(df, "v") == 4950
    assert ACT.min_action(df, "v") == 0
    assert ACT.max_action(df, "v") == 99
    assert ACT.all_reduce(df, F.sum(F.col("v") * 2)) == 9900
    g = ACT.gather(df.filter(F.col("v") < 3), order_by=["v"])
    assert [r["v"] for r in g] == [0, 1, 2]


def test_group_by_key_apply_in_pandas(spark):
    df = spark.createDataFrame([(1, 5.0), (1, 7.0), (2, 1.0)], ["k", "v"])

    def spread(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "spread": [pdf["v"].max() - pdf["v"].min()]})

    out = {r["k"]: r["spread"] for r in R.group_by_key(df, ["k"], spread, "k long, spread double").collect()}
    assert out == {1: 2.0, 2: 0.0}


def test_median_by_key(spark):
    df = spark.createDataFrame([(1, 1.0), (1, 2.0), (1, 10.0), (2, 4.0), (2, 6.0)], ["k", "v"])
    out = {r["k"]: r["median"] for r in R.median_by_key(df, ["k"], "v").collect()}
    assert out == {1: 2.0, 2: 5.0}


def test_hyperloglog_close(spark):
    df = spark.range(50000).select((F.col("id") % 10000).alias("v"))
    est = R.hyperloglog(df, "v", rsd=0.02).first()["approx_distinct"]
    assert abs(est - 10000) / 10000 < 0.1


def test_asof_join_backward(spark):
    from thrill_spark.operators.join import asof_join

    quotes = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c")], ["k", "t", "val"]
    )
    trades = spark.createDataFrame(
        [(1, 5), (1, 12), (1, 25), (2, 15), (2, 14)], ["k", "t"]
    )
    out = asof_join(trades, quotes, "t", "t", by=("k",)).collect()
    got = {(r["k"], r["t"]): r["val_r"] for r in out}
    assert got == {(1, 5): None, (1, 12): "a", (1, 25): "b", (2, 15): "c", (2, 14): None}


def test_range_join_bucketized_matches_naive(spark):
    from thrill_spark.operators.join import range_join

    pts = spark.createDataFrame([(i, float(i)) for i in range(20)], ["pid", "x"])
    ivs = spark.createDataFrame(
        [(0, 0.0, 5.0), (1, 3.0, 12.0), (2, 17.0, 100.0)], ["iid", "lo", "hi"]
    )
    naive = {(r["pid"], r["iid"]) for r in range_join(pts, ivs, "x", "lo", "hi").collect()}
    bucket = {
        (r["pid"], r["iid"])
        for r in range_join(pts, ivs, "x", "lo", "hi", bucket_width=4.0).collect()
    }
    assert naive == bucket
    assert (3, 0) in naive and (3, 1) in naive and (19, 2) in naive


def test_exact_sample_cardinality(spark):
    from thrill_spark.operators.basic import exact_sample

    df = spark.range(1000)
    out = exact_sample(df, k=37).collect()
    ids = {r["id"] for r in out}
    assert len(out) == 37 and len(ids) == 37
    assert ids <= set(range(1000))


def test_exact_sample_distributed(spark):
    from thrill_spark.operators.basic import exact_sample_distributed

    df = spark.range(0, 10_000, 1, 16).withColumn("v", F.col("id") * 2)
    out = exact_sample_distributed(df, 137, seed=7)
    rows = out.collect()
    assert len(rows) == 137
    ids = [r["id"] for r in rows]
    assert len(set(ids)) == 137                      # without replacement
    assert all(r["v"] == r["id"] * 2 for r in rows)  # row integrity
    # k >= n returns everything
    assert exact_sample_distributed(spark.range(5), 10).count() == 5
    # spread: a uniform 137-of-10k draw across 16 partitions of 625
    # should touch most partitions (each partition gets ~8.6 expected)
    touched = {i // 625 for i in ids}
    assert len(touched) >= 12


def test_group_by_key_fold_huge_group_chunked(spark):
    """A single hot key spanning many Arrow batches must fold chunk by
    chunk (bounded state), and chunks must arrive in order_by order."""
    from thrill_spark.operators.reduce import group_by_key_fold

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        df = spark.range(0, 1000).select(
            (F.col("id") % 3).alias("k"), F.col("id").alias("v")
        )

        def init(key):
            return {"n": 0, "s": 0, "chunks": 0, "last": -1, "ordered": True}

        def fold(st, chunk):
            st["n"] += len(chunk)
            st["s"] += int(chunk["v"].sum())
            st["chunks"] += 1
            if len(chunk):
                if int(chunk["v"].iloc[0]) < st["last"]:
                    st["ordered"] = False
                st["last"] = int(chunk["v"].iloc[-1])
            return st

        def finish(key, st):
            assert st["ordered"], "chunks arrived out of order"
            return {"k": key[0], "n": st["n"], "s": st["s"], "chunks": st["chunks"]}

        out = group_by_key_fold(
            df, ["k"], init, fold, finish,
            schema="k long, n long, s long, chunks long", order_by=["v"],
        ).collect()
        got = {r["k"]: (r["n"], r["s"]) for r in out}
        for k in range(3):
            vals = [i for i in range(1000) if i % 3 == k]
            assert got[k] == (len(vals), sum(vals))
        assert all(r["chunks"] > 1 for r in out)  # chunking actually happened
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_asof_join_unkeyed_matches_pandas(spark):
    """by=() routes through the two-phase range-partitioned fill (no
    single-partition window); results must equal pandas merge_asof in
    both directions, including boundary ties."""
    import random

    rng = random.Random(11)
    trades = sorted(rng.sample(range(200), 40))
    # unique quote times: with duplicates the pick among equal times is
    # implementation-arbitrary on both sides, so the differential would
    # be flaky by construction
    quotes = sorted((t, i) for i, t in enumerate(rng.sample(range(200), 30)))
    left = spark.createDataFrame([(float(t),) for t in trades], ["t"])
    right = spark.createDataFrame([(float(t), q) for t, q in quotes], ["t", "px"])
    lp = pd.DataFrame({"t": [float(t) for t in trades]})
    rp = pd.DataFrame({"t": [float(t) for t, _ in quotes], "px": [q for _, q in quotes]})
    for direction in ("backward", "forward"):
        out = (
            J.asof_join(left, right, "t", "t", direction=direction)
            .orderBy("t")
            .collect()
        )
        exp = pd.merge_asof(lp, rp.drop_duplicates("t", keep="last" if direction == "backward" else "first"),
                            on="t", direction=direction)
        got = [(r["t"], r["px_r"]) for r in out]
        want = [
            (float(r.t), None if pd.isna(r.px) else int(r.px)) for r in exp.itertuples()
        ]
        assert got == want, direction


def test_asof_join_unkeyed_no_single_partition_exchange(spark):
    left = spark.createDataFrame([(float(i),) for i in range(10)], ["t"])
    right = spark.createDataFrame([(float(i), i) for i in range(0, 10, 2)], ["t", "px"])
    plan = J.asof_join(left, right, "t", "t")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
