"""DuckDB-differential compare, replicating the driver's check:
row count + schema-insensitive column-name-sorted order-insensitive
value comparison. Used by tests to catch hash mismatches early."""

from __future__ import annotations

import datetime
import math

import duckdb

from thrill_spark.catalog import TABLES, table_path


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except ImportError:
        pass
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(repr(tuple(_norm(r[i]) for i in order)) for r in rows)


def assert_driver_safe_schema(spark_df, name: str = "query"):
    """The driver's pandas canonicalizer sorts every output column;
    list/dict-valued cells raise ``TypeError: unhashable type`` there
    even though the repo-local ``_norm`` tuples them (the round-3
    ``fn_collect_aggs``/``doc_fingerprint_winnow`` reds). Reject
    complex output types up front so local green predicts driver
    green — serialize with array_join/to_json instead."""
    from pyspark.sql import types as T

    for f in spark_df.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), (
            f"{name}: column '{f.name}' is {f.dataType.simpleString()} — "
            "driver canonicalizer cannot sort complex types; serialize "
            "with F.array_join/F.to_json (and array_to_string/to_json in "
            "the DuckDB oracle)"
        )


def compare(spark_df, con, sql: str, name: str = "query"):
    assert_driver_safe_schema(spark_df, name)
    sdf = spark_df.toPandas()
    ddf = con.execute(sql).df()
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} vs oracle {len(ddf)}"
    scols = sorted(sdf.columns)
    dcols = sorted(ddf.columns)
    assert scols == dcols, f"{name}: columns {scols} vs oracle {dcols}"
    srows = rows_multiset(list(sdf.columns), sdf.itertuples(index=False, name=None))
    drows = rows_multiset(list(ddf.columns), ddf.itertuples(index=False, name=None))
    if srows != drows:
        diff_s = [r for r in srows if r not in set(drows)][:5]
        diff_d = [r for r in drows if r not in set(srows)][:5]
        raise AssertionError(
            f"{name}: value mismatch.\n spark-only: {diff_s}\n oracle-only: {diff_d}"
        )
