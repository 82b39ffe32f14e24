"""Frequency-sketch operators: distributed heavy hitters.

Companion to the reference's HyperLogLog reducer (thrill
api/hyperloglog.hpp — distinct-count sketch); this adds the frequency
side: Misra-Gries summaries per partition, a candidate merge, and an
exact confirm restricted to candidates — the same
sketch-then-exact-confirm discipline as functions/dedup.py's bloom
prefilter.

Guarantee chain (what makes the result EXACT, not approximate):
a token with global count > n/k must exceed n_p/k in at least one
partition p (pigeonhole), and Misra-Gries with k counters never evicts
a token whose in-partition count exceeds n_p/k — so the union of
per-partition survivor sets is a SUPERSET of the true heavy hitters.
The exact count pass then computes real counts for candidates only and
applies the threshold exactly. Arrival order inside a partition can
change the candidate set, never the confirmed output.

Scale: per-partition state is k counters; the candidate union is
<= k * n_partitions rows (broadcast); the token stream is scanned
twice (sketch+total, then candidate-restricted exact count) and the
only aggregation keyed by token is over candidates — never the full
vocabulary.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thrill_spark.functions.text import tokens


def _mg_summarize(token_iter: Iterable[str], k: int) -> tuple[dict[str, int], int]:
    """Classic Misra-Gries: k counters, decrement-all when saturated.
    Returns (survivor counters, tokens seen)."""
    counters: dict[str, int] = {}
    n = 0
    for t in token_iter:
        n += 1
        if t in counters:
            counters[t] += 1
        elif len(counters) < k:
            counters[t] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters, n


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 64,
) -> DataFrame:
    """Tokens whose global count strictly exceeds n_total/k, with their
    EXACT counts. Returns (token, n) — deterministic despite the
    sketch, per the module-level guarantee chain."""
    toks = df.select(F.explode(tokens(text_col)).alias("_t"))

    def summarize(batches):
        """One pass per partition: MG survivors + the partition's token
        count (carried on a null-token row so total and candidates come
        out of the same scan)."""
        import pandas as pd

        def stream():
            for pdf in batches:
                yield from pdf["_t"]

        counters, n = _mg_summarize(stream(), k)
        yield pd.DataFrame(
            {"_t": [*counters.keys(), None], "_np": [*([None] * len(counters)), n]}
        )

    summary = toks.mapInPandas(summarize, "_t string, _np long")
    cands = summary.filter(F.col("_t").isNotNull()).select("_t").distinct()
    total = summary.agg(F.sum("_np").cast("long").alias("_n"))
    exact = (
        toks.join(F.broadcast(cands), "_t")
        .groupBy("_t")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n") * k > F.col("_n"))
        .select(F.col("_t").alias("token"), "n")
    )
