"""Property-based differential tests: random inputs, same computation
in the engine and in DuckDB (SURVEY §5 — the randomized-input analogue
of the reference's fixed-seed random tests, strengthened to
engine-vs-engine comparison).

Examples are deliberately few (Spark job per example) but each covers
an input class unit tests rarely construct: empty tables, all-equal
keys, single rows, adversarial duplicates.
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.oracle import rows_multiset
from thrill_spark import ordering as O

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.integers(min_value=-3, max_value=3)
vals = st.integers(min_value=-1000, max_value=1000)
words = st.text(alphabet="abcxyz", min_size=0, max_size=5)


def _duck(pdf: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", pdf)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _match(sdf, ddf, ctx: str):
    s = rows_multiset(list(sdf.columns), sdf.itertuples(index=False, name=None))
    d = rows_multiset(list(ddf.columns), ddf.itertuples(index=False, name=None))
    assert sorted(sdf.columns) == sorted(ddf.columns), ctx
    assert s == d, f"{ctx}: spark={s[:4]} duck={d[:4]}"


@given(rows=st.lists(st.tuples(keys, vals), max_size=40))
@settings(**SETTINGS)
def test_groupby_agg_differential(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v"]).astype("int64")
    sdf = (
        spark.createDataFrame(pdf, "k long, v long")
        .groupBy("k")
        .sum("v")
        .withColumnRenamed("sum(v)", "s")
        .toPandas()
        if rows
        else pd.DataFrame(columns=["k", "s"])
    )
    ddf = _duck(pdf, "SELECT k, CAST(SUM(v) AS BIGINT) AS s FROM t GROUP BY k")
    _match(sdf, ddf, "groupby-sum")


@given(
    left=st.lists(st.tuples(keys, vals), max_size=25),
    right=st.lists(st.tuples(keys, words), max_size=25),
)
@settings(**SETTINGS)
def test_join_differential(spark, left, right):
    lp = pd.DataFrame(left, columns=["k", "v"])
    rp = pd.DataFrame(right, columns=["k", "w"])
    if left and right:
        ldf = spark.createDataFrame(lp, "k long, v long")
        rdf = spark.createDataFrame(rp, "k long, w string")
        sdf = ldf.join(rdf, on="k", how="inner").toPandas()
    else:
        sdf = pd.DataFrame(columns=["k", "v", "w"])
    con = duckdb.connect()
    con.register("l", lp)
    con.register("r", rp)
    ddf = con.execute("SELECT l.k, v, w FROM l JOIN r ON l.k = r.k").df()
    con.close()
    _match(sdf, ddf, "inner-join")


@given(rows=st.lists(st.tuples(vals, vals), max_size=30, unique_by=lambda t: t[0]))
@settings(**SETTINGS)
def test_prefix_sum_differential(spark, rows):
    """The _idx two-phase prefix sum vs DuckDB's window function."""
    pdf = pd.DataFrame(rows, columns=["k", "v"]).astype("int64")
    if rows:
        df = spark.createDataFrame(pdf, "k long, v long")
        sdf = (
            O.prefix_sum(df, ["k"], "v", name="ps")
            .select("k", "ps")
            .toPandas()
        )
    else:
        sdf = pd.DataFrame(columns=["k", "ps"])
    ddf = _duck(
        pdf,
        "SELECT k, CAST(SUM(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) AS BIGINT) AS ps FROM t",
    )
    _match(sdf, ddf, "prefix-sum")


@given(rows=st.lists(st.tuples(vals, words), max_size=30, unique_by=lambda t: t[0]))
@settings(**SETTINGS)
def test_with_index_differential(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "w"])
    if rows:
        df = spark.createDataFrame(pdf, "k long, w string")
        sdf = O.with_index(df, ["k"]).select("k", O.IDX).toPandas()
    else:
        sdf = pd.DataFrame(columns=["k", O.IDX])
    ddf = _duck(
        pdf,
        f"SELECT k, CAST(ROW_NUMBER() OVER (ORDER BY k) - 1 AS BIGINT) AS {O.IDX} FROM t",
    )
    _match(sdf, ddf, "with-index")
