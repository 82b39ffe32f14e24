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
    docs = load_table(spark, sf_dir, "documents", spread=True)
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
    edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM ver
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


def _pipeline_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster, is_survivor) for the minhash->LSH->verify->CC
    chain; shared by the standalone query and the e2e corpus build."""
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


@query("dedup_pipeline_survivors", _sql_pipeline_survivors())
def q_pipeline_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pipeline_survivors(spark, sf_dir)


@query(
    "corpus_pack_greedy",
    f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, CAST(len({SQL_TOKS}) AS BIGINT) AS n_tokens,
             CAST({_sql_md5_long("CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS} AS INT)
               AS shard
      FROM documents),
    s AS MATERIALIZED (SELECT doc_id, n_tokens, shard,
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


# ---------------------------------------------------------------------------
# PII scrubbing (C4/Dolma-style). The fixture text contains no PII, so
# the query plants deterministic email/IP/phone strings per doc, then
# counts and redacts them — the oracle replays the same regexes in
# DuckDB (patterns restricted to Java-regex/RE2-identical syntax).
# ---------------------------------------------------------------------------
_SQL_PII = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4": "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone": "\\b\\d{3}-\\d{3}-\\d{4}\\b",
}


@query(
    "text_pii_redact",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(t2, '{_SQL_PII["email"]}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t2, '{_SQL_PII["ipv4"]}')) AS INT) AS n_ipv4,
           CAST(len(regexp_extract_all(t2, '{_SQL_PII["phone"]}')) AS INT) AS n_phones,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(t2,
                  '{_SQL_PII["email"]}', '[PII]', 'g'),
                  '{_SQL_PII["ipv4"]}', '[PII]', 'g'),
                  '{_SQL_PII["phone"]}', '[PII]', 'g')) AS BIGINT) AS redacted_len,
           len(regexp_extract_all(regexp_replace(regexp_replace(regexp_replace(t2,
                  '{_SQL_PII["email"]}', '[PII]', 'g'),
                  '{_SQL_PII["ipv4"]}', '[PII]', 'g'),
                  '{_SQL_PII["phone"]}', '[PII]', 'g'),
                '{_SQL_PII["email"]}')) = 0 AS clean
    FROM (SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                      || ' call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   AS t2
          FROM documents)
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thrill_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    t2 = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" call 555-123-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    planted = docs.select("doc_id", t2.alias("t2"))
    counts = TX.pii_counts("t2")
    red = TX.redact_pii("t2")
    return planted.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phones"),
        F.length(red).cast("long").alias("redacted_len"),
        (F.regexp_count(red, F.lit(TX.PII_PATTERNS["email"])) == 0).alias("clean"),
    )


# ---------------------------------------------------------------------------
# End-to-end corpus build: language filter (keep docs with any marker
# hit) -> quality filter (>= 5 tokens) -> near-dedup survivors (the
# full minhash->LSH->verify->CC chain) -> train/val/test split ->
# (doc_id, split, n_tokens). The composition a training-data pipeline
# runs nightly; every stage is an already-oracle-checked operator, and
# the oracle replays the whole chain in one SQL statement.
# ---------------------------------------------------------------------------
def _sql_corpus_build() -> str:
    from thrill_spark.plans.queries_llm import _sql_lang_hits

    surv = _sql_pipeline_survivors()
    return f"""
    WITH surv AS ({surv}),
    feats AS (
      SELECT doc_id, len({SQL_TOKS}) AS n_tokens,
             greatest({_sql_lang_hits('en').replace('toks', SQL_TOKS)},
                      {_sql_lang_hits('de').replace('toks', SQL_TOKS)},
                      {_sql_lang_hits('fr').replace('toks', SQL_TOKS)},
                      {_sql_lang_hits('es').replace('toks', SQL_TOKS)}) AS m
      FROM documents)
    SELECT f.doc_id,
           CASE WHEN {_sql_md5_long("'split' || CAST(f.doc_id AS VARCHAR)")} % {C.SPLIT_RESOLUTION} < 8000 THEN 'train'
                WHEN {_sql_md5_long("'split' || CAST(f.doc_id AS VARCHAR)")} % {C.SPLIT_RESOLUTION} < 9000 THEN 'val'
                ELSE 'test' END AS split,
           CAST(f.n_tokens AS BIGINT) AS n_tokens
    FROM feats f JOIN surv s ON s.doc_id = f.doc_id
    WHERE s.is_survivor AND f.m > 0 AND f.n_tokens >= 5
    """


@query("corpus_build_e2e", _sql_corpus_build())
def q_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thrill_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.lang_id("text").alias("_lang"),
    )
    kept = feats.filter((F.col("_lang") != "und") & (F.col("n_tokens") >= 5))
    surv = _pipeline_survivors(spark, sf_dir).filter(F.col("is_survivor"))
    out = kept.join(surv.select("doc_id"), "doc_id")
    out = C.assign_splits(out, _SPLIT_WEIGHTS)
    return out.select("doc_id", "split", F.col("n_tokens").cast("long").alias("n_tokens"))


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag training documents sharing word
# 3-grams with a held-out benchmark set (here: the 20 lowest doc_ids
# stand in for the benchmark). The benchmark n-gram set is tiny ->
# broadcast; the scan side stays linear. This is the standard
# eval-contamination sweep a training pipeline runs before a data
# release.
# ---------------------------------------------------------------------------
_DECON_BENCH_N = 20


def _sql_decontaminate() -> str:
    from thrill_spark.plans.queries_llm import SQL_SHINGLES3

    return f"""
    WITH sh AS (SELECT doc_id, {SQL_SHINGLES3} AS shingles FROM (
                  SELECT doc_id, {SQL_TOKS} AS toks FROM documents)),
    bench AS (SELECT DISTINCT unnest(shingles) AS s FROM sh
              WHERE doc_id < {_DECON_BENCH_N}),
    hits AS (SELECT e.doc_id, COUNT(*) AS n_contaminated
             FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
                   WHERE doc_id >= {_DECON_BENCH_N}) e
             JOIN bench b ON b.s = e.s
             GROUP BY e.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           coalesce(h.n_contaminated, 0) > 0 AS flagged
    FROM (SELECT doc_id FROM documents WHERE doc_id >= {_DECON_BENCH_N}) d
    LEFT JOIN hits h ON h.doc_id = d.doc_id
    """


@query("corpus_decontaminate", _sql_decontaminate())
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thrill_spark.functions.text import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.array_distinct(word_ngrams("text", 3)).alias("_sh")
    )
    bench = (
        sh.filter(F.col("doc_id") < _DECON_BENCH_N)
        .select(F.explode("_sh").alias("s"))
        .distinct()
    )
    train = sh.filter(F.col("doc_id") >= _DECON_BENCH_N)
    hits = (
        train.select("doc_id", F.explode("_sh").alias("s"))
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("_n"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_contaminated"),
            (F.coalesce(F.col("_n"), F.lit(0)) > 0).alias("flagged"),
        )
    )


# ---------------------------------------------------------------------------
# Substring-level decontamination (Lee et al. 2022 shape): winnowing
# fingerprints (rolling-min over shingle hashes) intersected between
# the train split and the benchmark split — catches long verbatim
# spans that 3-gram COUNT overlap underweights. A train doc is
# contaminated when it shares >= _SUBDECON_MIN fingerprints with any
# benchmark doc. Fingerprint selection is deterministic (md5 shingle
# hashes), so the whole pipeline replays in SQL.
# ---------------------------------------------------------------------------
_SUBDECON_BENCH_N = 20
_SUBDECON_MIN = 3


def _sql_subdecon() -> str:
    from thrill_spark.plans.queries_llm import SQL_TOKS

    fp = f"""
      SELECT doc_id,
             unnest(list_distinct(list_transform(
                 generate_series(0, greatest(len(hs)-4, 0)),
                 i -> list_min(hs[i+1:i+4])))) AS fp
      FROM (SELECT doc_id,
                   list_transform(
                       list_transform(generate_series(0, greatest(len(toks)-2, 1)-1),
                                      i -> array_to_string(toks[i+1:i+3], ' ')),
                       g -> CAST('0x' || substr(md5(g),1,15) AS BIGINT)) AS hs
            FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM documents))
    """
    return f"""
    WITH fps AS ({fp}),
    bench AS (SELECT DISTINCT fp FROM fps WHERE doc_id < {_SUBDECON_BENCH_N}),
    train AS (SELECT doc_id, fp FROM fps WHERE doc_id >= {_SUBDECON_BENCH_N}),
    hits AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM (SELECT DISTINCT doc_id, fp FROM train) t
      SEMI JOIN bench USING (fp)
      GROUP BY doc_id)
    SELECT t.doc_id, coalesce(n_shared, 0) AS n_shared,
           coalesce(n_shared, 0) >= {_SUBDECON_MIN} AS contaminated
    FROM (SELECT DISTINCT doc_id FROM train) t
    LEFT JOIN hits USING (doc_id)
    """


@query("corpus_decontaminate_substring", _sql_subdecon())
def q_decontaminate_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thrill_spark.functions.dedup import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(
        docs, "text", "doc_id", shingle_words=3, window=4
    ).select("doc_id", F.explode("fp").alias("fp"))
    bench = (
        fps.filter(F.col("doc_id") < _SUBDECON_BENCH_N).select("fp").distinct()
    )
    train = fps.filter(F.col("doc_id") >= _SUBDECON_BENCH_N).distinct()
    hits = (
        train.join(bench, "fp", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    base = train.select("doc_id").distinct()
    return (
        base.join(hits, "doc_id", "left")
        .fillna({"n_shared": 0})
        .select(
            "doc_id",
            "n_shared",
            (F.col("n_shared") >= _SUBDECON_MIN).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) quota apportionment: turn a target
# sample size into EXACT integer per-domain quotas proportional to
# corpus shares — floor(share*N) for everyone plus one extra for the
# largest remainders until the total hits N exactly. The integer
# apportionment every mixing pipeline needs before quota_interleave;
# wholly SQL-replicable (window rank over remainders).
# ---------------------------------------------------------------------------
_APPORTION_N = 137  # deliberately awkward so remainders matter


@query(
    "corpus_quota_apportionment",
    f"""
    WITH cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM cnt),
    base AS (
      SELECT source, n_docs,
             CAST(n_docs * {_APPORTION_N} // total AS BIGINT) AS floor_q,
             CAST(n_docs * {_APPORTION_N} % total AS BIGINT) AS rem
      FROM cnt CROSS JOIN tot),
    short AS (SELECT CAST({_APPORTION_N} - SUM(floor_q) AS BIGINT) AS k FROM base),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
      FROM base)
    SELECT source, n_docs, floor_q,
           CAST(floor_q + CASE WHEN rk <= k THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM ranked CROSS JOIN short
    """,
)
def q_quota_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cnt = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    tot = cnt.agg(F.sum("n_docs").cast("long").alias("total"))
    base = cnt.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "total",
        F.expr(f"n_docs * {_APPORTION_N} div total").cast("long").alias("floor_q"),
        F.expr(f"n_docs * {_APPORTION_N} % total").cast("long").alias("rem"),
    )
    short = base.agg(
        (F.lit(_APPORTION_N) - F.sum("floor_q")).cast("long").alias("k")
    )
    # remainder rank via the distributed with_index discipline, not a
    # global Window.orderBy — the domain table is small HERE, but a
    # 100k-domain mix must not funnel through one partition
    from thrill_spark import ordering as O

    base = base.withColumn("_negrem", F.col("total") - F.col("rem"))
    ranked = O.with_index(base, ["_negrem", "source"], name="_rk0").withColumn(
        "rk", F.col("_rk0") + 1
    )
    return ranked.crossJoin(F.broadcast(short)).select(
        "source",
        "n_docs",
        "floor_q",
        (F.col("floor_q") + F.when(F.col("rk") <= F.col("k"), 1).otherwise(0))
        .cast("long")
        .alias("quota"),
    )
