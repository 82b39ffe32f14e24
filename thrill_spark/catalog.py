"""Table catalog over the driver-generated parquet fixtures.

Thrill reads raw files per worker byte-range (thrill/api/read_lines.hpp,
read_binary.hpp); here the scan layer is Spark's parquet source, which
gives predicate pushdown, column pruning, and split planning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def scratch_dir(spark: SparkSession, tag: str) -> str:
    """Session-scoped scratch path for write-then-read-back queries.

    The pre-r12 fixed paths (/tmp/thrill_spark_<tag>) collided across
    concurrent sessions: two processes running the same roundtrip
    query (e.g. a validation sweep next to the test suite) raced each
    other's overwrite, and with different sf_dirs one could read the
    other's output as a silent row-count MISMATCH. Scoping by
    applicationId makes each Spark session's scratch private while
    staying stable within the session (bench re-runs overwrite their
    own files). The whole scratch tree is removed at interpreter exit
    (atexit) so repeated sessions don't accumulate in the temp dir; a
    hard-killed process leaves its dir for the OS temp policy."""
    import tempfile

    app = spark.sparkContext.applicationId
    root = os.path.join(tempfile.gettempdir(), f"thrill_spark_scratch-{app}")
    if app not in _scratch_cleanup_registered:
        import atexit
        import shutil

        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _scratch_cleanup_registered.add(app)
    return os.path.join(root, tag)


_scratch_cleanup_registered: set[str] = set()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Depending on the Spark
        # runtime this reads either natively as TIMESTAMP_NTZ (truncated
        # to micros) or — under spark.sql.legacy.parquet.nanosAsLong —
        # as raw int64 nanos. Branch on the dtype actually read so both
        # runtimes yield the same schema: ts TIMESTAMP (micros, UTC),
        # ts_ns BIGINT (nanosecond epoch, matching DuckDB's ns read
        # modulo sub-microsecond truncation).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        # Timestamp(_NTZ) read path: session timezone is UTC, so the
        # NTZ->TIMESTAMP cast is value-preserving.
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType())).withColumn(
            "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
        )
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register all fixture tables as temp views (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
