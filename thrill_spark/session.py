"""SparkSession factory tuned for this engine.

Local mode is a stand-in for a real cluster: shuffle-partition count,
AQE, and Arrow settings are chosen so the same plans scale to a
many-executor deployment (partition counts are derived from
parallelism, not hard-coded to the test data size).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Thrill analogue: api::Run spawns hosts*workers_per_host workers
# (thrill/api/context.cpp:947). In Spark the parallelism knob is the
# master + shuffle partitions; everything else is the scheduler's job.


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def scratch_local_dir() -> str | None:
    """Fastest available scratch for Spark's local dirs (shuffle files,
    spills, broadcast blocks): SPARK_GRAFT_LOCAL_DIR if set, else a
    RAM-backed dir under /dev/shm when present — the local-mode
    analogue of pointing spark.local.dir at fast NVMe scratch on a real
    cluster (a plain config knob, guide-standard; shuffle temp data
    only, never inputs or results). Returns None to keep Spark's
    default when neither is available."""
    d = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if d:
        return d
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return os.path.join(shm, "thrill_spark_local")
    return None


def get_spark(app_name: str = "thrill_spark", parallelism: int | None = None) -> SparkSession:
    """Create (or reuse) a SparkSession with scale-appropriate defaults.

    - AQE on: runtime coalescing, skew-join splitting, dynamic join
      strategy switch — this is what replaces Thrill's hand-rolled
      location-detection / duplicate-detection shuffles at scale.
    - shuffle.partitions = parallelism locally; on a real cluster this
      would be executors*cores*2-3 or left to AQE's coalescing.
    - UTC session timezone so timestamp semantics match the DuckDB
      oracle and are deployment-independent.
    """
    p = parallelism or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{p}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(p))
        .config("spark.default.parallelism", str(p))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    local_dir = scratch_local_dir()
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
