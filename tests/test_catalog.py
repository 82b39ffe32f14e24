"""Schema drift guard for the fixture catalog.

Round-2 regression: the Spark runtime changed how it reads parquet
TIMESTAMP(NANOS) (legacy nanosAsLong conf became a no-op, ts now reads
natively as TIMESTAMP_NTZ) and every events-dependent query broke.
These tests load the real fixtures and pin the post-load schema so any
future runtime drift fails in pytest, not in the driver.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from thrill_spark.catalog import TABLES, load_table, table_path

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="fixtures absent")
class TestCatalogSchemas:
    def test_events_ts_is_microsecond_timestamp(self, spark):
        df = load_table(spark, SF_DIR, "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
        assert isinstance(df.schema["ts_ns"].dataType, T.LongType)

    def test_events_ts_values_consistent(self, spark):
        """ts_ns must be the nanosecond epoch of ts (micro precision)."""
        from pyspark.sql import functions as F

        df = load_table(spark, SF_DIR, "events")
        bad = df.filter(F.unix_micros("ts") * F.lit(1000) != F.col("ts_ns")).count()
        assert bad == 0
        # sanity: timestamps land in a plausible year range, so neither
        # read path silently mis-scaled by 1000x
        row = df.select(
            F.min(F.year("ts")).alias("lo"), F.max(F.year("ts")).alias("hi")
        ).first()
        assert 2000 <= row["lo"] <= row["hi"] <= 2100

    def test_events_matches_duckdb_read(self, spark):
        """The Spark events read must agree with the DuckDB oracle read."""
        import duckdb
        from pyspark.sql import functions as F

        df = load_table(spark, SF_DIR, "events")
        s_row = df.select(
            F.count("*").alias("n"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("lo"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("hi"),
        ).first()
        d_n, d_lo, d_hi = duckdb.sql(
            "SELECT count(*), strftime(min(ts), '%Y-%m-%d %H:%M:%S'), "
            "strftime(max(ts), '%Y-%m-%d %H:%M:%S') "
            f"FROM read_parquet('{table_path(SF_DIR, 'events')}')"
        ).fetchone()
        assert (s_row["n"], s_row["lo"], s_row["hi"]) == (d_n, d_lo, d_hi)

    def test_all_tables_load(self, spark):
        for t in TABLES:
            df = load_table(spark, SF_DIR, t)
            assert len(df.schema.fields) > 0
