"""Sparse TF-IDF document similarity (integer-exact variant).

No reference analogue (Thrill stops at WordCount,
reference/thrill/examples/word_count/word_count.hpp:35); this is the
classic sparse all-pairs similarity a training-data pipeline runs to
find topically-duplicated documents that share little verbatim text.

Design for 100 TB:
- terms are word n-grams; a document-frequency cap (`max_df_frac`)
  drops stop-terms BEFORE the pairs join, which is what bounds the
  posting-list self-join (volume = sum over kept terms of df^2) — the
  standard prefix-filtering trick from Bayardo et al., WWW'07
  ("Scaling Up All Pairs Similarity Search").
- weights are exact integers (w = n_docs // df), so scores are
  BIGINTs, bit-reproducible by the DuckDB oracle — no FP sum order
  issues.
- the per-term join is an equi-join on the term; map-side partial
  aggregation folds pair contributions before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thrill_spark.functions.corpus import _positional_ngrams
from thrill_spark.functions.text import tokens


def term_frequencies(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """(doc, term, tf) posting triples over word n-gram terms.

    The tokenize+gram explode is the CPU-heavy map stage; _spread
    re-splits an under-partitioned scan (small file = one split) and
    is a no-op when the input already has enough splits (100 TB case).
    """
    from thrill_spark.functions.dedup import _spread

    # Bind the token array to a column FIRST: inlining tokens() into
    # the per-gram slice lambda re-evaluates the regex split once per
    # gram index (measured ~6x on this stage).
    toked = _spread(df, id_col).select(
        F.col(id_col), tokens(text_col).alias("_toks")
    )
    return (
        toked.select(
            F.col(id_col),
            F.explode(_positional_ngrams(F.col("_toks"), ngram)).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    max_df_div: int = 20,
    top_n: int = 100,
) -> DataFrame:
    """Top-N most TF-IDF-similar document pairs.

    Score(a, b) = sum over shared terms t of tf_a(t) * tf_b(t) * w(t)^2
    with w(t) = n_docs // df(t) — an un-normalized sparse dot product in
    integer-idf space. Terms appearing in more than n_docs//max_df_div
    documents are pruned (they carry ~no signal and all the join
    volume). Deterministic: ties at the cut broken by (id_a, id_b).
    """
    from pyspark.sql import Window

    from thrill_spark.ordering import _persist

    n_docs = df.count()  # scalar action; literal below keeps the plan static
    max_df = max(1, n_docs // max_df_div)
    tf = term_frequencies(df, text_col, id_col, ngram)
    # df(t) via a count window over term instead of agg + join-back:
    # one shuffle by term, and the downstream pair self-join reuses the
    # same hash clustering (persisted), so no re-exchange.
    # weight = n_docs // df_t, exact integer division.
    posts = _persist(
        tf.withColumn("df_t", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .filter(F.col("df_t") <= max_df)
        .withColumn("w", F.expr(f"CAST({int(n_docs)} DIV df_t AS BIGINT)"))
    )
    a = posts.select(
        "term", F.col(id_col).alias("id_a"), F.col("tf").alias("tf_a"), "w"
    )
    b = posts.select(
        "term", F.col(id_col).alias("id_b"), F.col("tf").alias("tf_b")
    )
    pairs = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                F.col("tf_a").cast("long")
                * F.col("tf_b").cast("long")
                * F.col("w")
                * F.col("w")
            ).alias("score")
        )
    )
    return pairs.orderBy(
        F.col("score").desc(), F.col("id_a"), F.col("id_b")
    ).limit(top_n)
