"""Queries batch 8: corpus-management operators — dataset splitting,
stratified sampling, repetition scoring, deterministic shuffle, and
sequence packing (functions/corpus.py). The dataset-assembly steps of a
training-data pipeline, each DuckDB-oracle-checked (the packing oracle
replays the sequential fold as a recursive CTE)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thrill_spark.catalog import load_table
from thrill_spark.functions import corpus as C
from thrill_spark.plans.queries import query
from thrill_spark.plans.queries_llm import SQL_TOKS

# DuckDB twin of text.md5_long(concat(salt, id)).
def _sql_md5_long(x: str) -> str:
    return f"CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@query(
    "corpus_split_assign",
    f"""
    SELECT doc_id, bucket,
           CASE WHEN bucket < 8000 THEN 'train'
                WHEN bucket < 9000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 {_sql_md5_long("'split' || CAST(doc_id AS VARCHAR)")} % {C.SPLIT_RESOLUTION}
                   AS bucket
          FROM documents)
    """,
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return C.assign_splits(docs, _SPLIT_WEIGHTS).select("doc_id", "bucket", "split")


@query(
    "corpus_stratified_sample",
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY {_sql_md5_long("'strat' || CAST(doc_id AS VARCHAR)")}, doc_id
             ) AS rk
      FROM documents)
    WHERE rk <= 20
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return C.stratified_sample_exact(docs, ["lang"], n_per_stratum=20)


@query(
    "text_repetition_scores",
    f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    g AS (SELECT doc_id,
                 list_transform(generate_series(0, greatest(len(toks)-1, 1)-1),
                                i -> array_to_string(toks[i+1:i+2], ' ')) AS g2,
                 list_transform(generate_series(0, greatest(len(toks)-2, 1)-1),
                                i -> array_to_string(toks[i+1:i+3], ' ')) AS g3
          FROM t)
    SELECT doc_id,
           CAST(len(g2) AS BIGINT) AS n_2grams,
           CASE WHEN len(g2) > 0
                THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
                ELSE 0.0 END AS dup_2gram_frac,
           CAST(len(g3) AS BIGINT) AS n_3grams,
           CASE WHEN len(g3) > 0
                THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
                ELSE 0.0 END AS dup_3gram_frac
    FROM g
    """,
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.repetition_scores(docs)


@query(
    "corpus_shuffle_index",
    f"""
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY {_sql_md5_long("'shuf0:' || CAST(doc_id AS VARCHAR)")}, doc_id
           ) - 1 AS BIGINT) AS shuffle_pos
    FROM documents
    """,
)
def q_shuffle_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return C.shuffle_index(docs).select("doc_id", "shuffle_pos")


_PACK_BUDGET = 512
_PACK_SHARDS = 16


# ---------------------------------------------------------------------------
# Flagship end-to-end near-dedup pipeline: minhash -> LSH bands ->
# candidate pairs -> exact-Jaccard verify (candidates only, linear) ->
# connected components -> survivor = the min-id doc of each duplicate
# cluster (docs with no verified duplicate survive trivially). This is
# the composition a 100 TB corpus actually runs; every stage is the
# oracle-checked operator it builds on.
# ---------------------------------------------------------------------------
_VERIFY_TAU = 0.5


def _sql_pipeline_survivors() -> str:
    from thrill_spark.plans.queries_llm import SQL_SHINGLES3, _sql_lsh_pairs

    inter = "len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x)))"
    return f"""
    WITH RECURSIVE cand AS ({_sql_lsh_pairs()}),
    sh AS (SELECT doc_id, shingles, len(shingles) AS n FROM (
             SELECT doc_id, {SQL_SHINGLES3} AS shingles FROM (
               SELECT doc_id, {SQL_TOKS} AS toks FROM documents))),
    ver AS (
      SELECT id_a, id_b FROM cand
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
      WHERE CAST({inter} AS DOUBLE) / (sa.n + sb.n - {inter}) >= {_VERIFY_TAU}),
    edges AS (SELECT id_a AS u, id_b AS v FROM ver
              UNION SELECT id_b AS u, id_a AS v FROM ver),
    reach(src, n) AS (
      SELECT u, u FROM edges
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.n = e.u),
    comp AS (SELECT src AS node, MIN(n) AS component FROM reach GROUP BY src)
    SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS cluster,
           coalesce(c.component, d.doc_id) = d.doc_id AS is_survivor
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """


@query("dedup_pipeline_survivors", _sql_pipeline_survivors())
def q_pipeline_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thrill_spark.functions import dedup as D
    from thrill_spark.plans import algorithms as ALG
    from thrill_spark.plans.queries_llm import _MH_BANDS, _MH_K

    docs = load_table(spark, sf_dir, "documents")
    edges = D.lsh_verified_pairs(
        docs, num_hashes=_MH_K, bands=_MH_BANDS, threshold=_VERIFY_TAU
    )
    comp = ALG.connected_components(edges, a="id_a", b="id_b")
    base = docs.select("doc_id")
    joined = base.join(comp, base["doc_id"] == comp["node"], "left")
    cluster = F.coalesce(F.col("component"), F.col("doc_id"))
    return joined.select(
        "doc_id",
        cluster.alias("cluster"),
        (cluster == F.col("doc_id")).alias("is_survivor"),
    )


@query(
    "corpus_pack_greedy",
    f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens,
             CAST({_sql_md5_long("CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS} AS INT)
               AS shard
      FROM documents),
    s AS (SELECT doc_id, n_tokens, shard,
                 row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
          FROM d),
    p AS (
      SELECT shard, doc_id, n_tokens, rn,
             CAST(0 AS BIGINT) AS bin, n_tokens AS fill
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.shard, s.doc_id, s.n_tokens, s.rn,
             CASE WHEN p.fill + s.n_tokens > {_PACK_BUDGET}
                  THEN p.bin + 1 ELSE p.bin END,
             CASE WHEN p.fill + s.n_tokens > {_PACK_BUDGET}
                  THEN s.n_tokens ELSE p.fill + s.n_tokens END
      FROM p JOIN s ON s.shard = p.shard AND s.rn = p.rn + 1)
    SELECT doc_id, n_tokens, shard, bin FROM p
    """,
)
def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thrill_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tok")
    )
    return C.pack_greedy(docs, "n_tok", budget=_PACK_BUDGET, n_shards=_PACK_SHARDS)
