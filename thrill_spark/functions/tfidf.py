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
    """(doc, term, tf) posting triples over word n-gram terms."""
    grams = _positional_ngrams(tokens(text_col), ngram)
    return (
        df.select(F.col(id_col), F.explode(grams).alias("term"))
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
    n_docs = df.count()  # scalar action; literal below keeps the plan static
    max_df = max(1, n_docs // max_df_div)
    tf = term_frequencies(df, text_col, id_col, ngram)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    # weight = n_docs // df_t, exact integer division
    posts = (
        tf.join(dfreq.filter(F.col("df_t") <= max_df), "term")
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
