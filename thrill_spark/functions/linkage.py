"""Entity resolution / record linkage (Fellegi-Sunter 1969 shape):
blocking -> per-field agreement weights -> threshold -> match pairs.

The pipeline every warehouse-scale MDM/dedup system runs, at the
record (multi-field) level rather than the document-text level
(functions/dedup.py): candidate pairs come from BLOCKING KEYS (an
equi-join — never an n² cross product), each candidate is scored by
integer agreement weights per field (string distance, exact equality,
numeric tolerance), and pairs at or above the threshold are matches.
A transitive-closure step (plans/algorithms.connected_components)
turns pairs into entities when needed.

Scale: candidate generation is |block|² per block — same degenerate-
block hazard as LSH buckets; route oversized blocks through
operators/skew.bounded_self_join exactly as the LSH path does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_candidates(
    records: DataFrame,
    block_cols: list[str | Column],
    id_col: str = "rid",
) -> DataFrame:
    """Candidate pairs via blocking-key equi-join: (a_rid, b_rid) with
    a_rid < b_rid, deduplicated across blocks. Linear in block sizes,
    not corpus size.

    Records with a NULL in any blocking column generate no candidates
    — SQL equi-join semantics, where NULL never matches. (concat_ws
    alone would silently map NULL to '' and block such records both
    with each other and with genuinely-empty keys.)"""
    cols = [c if isinstance(c, Column) else F.col(c) for c in block_cols]
    blocked = records
    for c in cols:
        blocked = blocked.filter(c.isNotNull())
    blocked = blocked.withColumn("_blk", F.concat_ws("\x01", *cols))
    a = blocked.select(
        F.col("_blk"), *[F.col(c).alias(f"a_{c}") for c in records.columns]
    )
    b = blocked.select(
        F.col("_blk"), *[F.col(c).alias(f"b_{c}") for c in records.columns]
    )
    return (
        a.join(b, "_blk")
        .filter(F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
        .drop("_blk")
        .dropDuplicates([f"a_{id_col}", f"b_{id_col}"])
    )


def score_pairs(
    pairs: DataFrame,
    field_weights: list[tuple[Column, int]],
) -> DataFrame:
    """Fellegi-Sunter-style additive agreement score: each (predicate,
    weight) contributes its integer weight when the predicate holds.
    Integer scores keep thresholds exact across engines."""
    score = None
    for pred, w in field_weights:
        term = F.when(pred, F.lit(int(w))).otherwise(F.lit(0))
        score = term if score is None else score + term
    return pairs.withColumn("score", score.cast("long"))


def resolve_entities(
    matches: DataFrame,
    a_col: str = "a_rid",
    b_col: str = "b_rid",
) -> DataFrame:
    """Match pairs -> entity ids: connected components (large-star /
    small-star, O(log² n) rounds), entity id = min member rid."""
    from thrill_spark.plans.algorithms import connected_components

    edges = matches.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    return connected_components(edges).select(
        F.col("node").alias("rid"), F.col("component").alias("entity_id")
    )
