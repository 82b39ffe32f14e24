"""foreachBatch upsert sink: continuous CDC ingestion into a keyed
parquet target.

The missing piece between Structured Streaming's append-only sinks and
a mutable serving table: each micro-batch MERGEs into the target
(operators/merge.py semantics) instead of appending. Resolution is
max_by(ordering columns) per key, which is ORDER-INDEPENDENT across
batches — replaying batches in any order (or twice, after a restart)
converges to the same final table, giving idempotent exactly-once
output on top of the file source's at-least-once delivery.

Thrill has no streaming surface (closest: consuming a DIA and
re-Distributing, reference/thrill/api/rebalance.hpp); this is the
Spark-native pattern for it.

Scale: per batch, one co-keyed shuffle of (current ∪ batch) — the
same cost as any incremental MERGE; the target is rewritten per batch
(parquet has no row-level update), which at 100 TB you'd shard by a
partition column so only touched partitions rewrite. Versioned
directories + final-pointer swap keep reads consistent (parquet can't
be overwritten in place while a lazy plan still references it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ForeachBatchUpsert:
    """Callable for ``writeStream.foreachBatch``: maintains a keyed
    parquet table at ``base_dir/v{n}``, upserting each micro-batch.

    key_cols: identity of a row. order_cols: recency — per key the row
    with the greatest (order_cols...) tuple wins, ties impossible when
    the tuple is unique per key (pass the event id last to guarantee
    it).
    """

    def __init__(self, base_dir: str, key_cols: list[str], order_cols: list[str]):
        self.base_dir = base_dir
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        os.makedirs(base_dir, exist_ok=True)
        # Recover the last committed version: on driver restart Spark
        # replays only uncommitted batches from the checkpoint, so a
        # fresh instance must resume from the existing v{n} table or
        # the first replayed batch would silently discard all
        # previously merged state. A v{n} dir counts as committed only
        # once parquet's _SUCCESS marker exists (a crash mid-write
        # leaves a partial dir that must not be resumed from).
        self.version = 0
        for name in os.listdir(base_dir):
            if name.startswith("v") and name[1:].isdigit():
                v = int(name[1:])
                if v > self.version and os.path.exists(
                    os.path.join(base_dir, name, "_SUCCESS")
                ):
                    self.version = v

    @property
    def current_path(self) -> str | None:
        return (
            os.path.join(self.base_dir, f"v{self.version}") if self.version else None
        )

    def _reduce_latest(self, df: DataFrame) -> DataFrame:
        ordered = F.struct(
            *[F.col(c) for c in self.order_cols],
            F.struct(*[F.col(c) for c in df.columns]).alias("_row"),
        )
        return (
            df.groupBy(*self.key_cols)
            .agg(F.max(ordered).alias("_m"))
            .select("_m._row.*")
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        merged = batch_df
        if self.current_path is not None:
            merged = spark.read.parquet(self.current_path).unionByName(batch_df)
        out = self._reduce_latest(merged)
        nxt = os.path.join(self.base_dir, f"v{self.version + 1}")
        out.write.mode("overwrite").parquet(nxt)
        self.version += 1

    def result(self, spark) -> DataFrame:
        if self.current_path is None:
            raise RuntimeError("no batch ever processed")
        return spark.read.parquet(self.current_path)
