"""LLM-data-pipeline queries, batch 3: text analysis, dedup families,
similarity search, event-time windows. No reference analogue (SURVEY
§2.13 ends at classic analytics); these are the training-data operators
the engine adds, each still DuckDB-oracle-checked where deterministic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thrill_spark.catalog import load_table, scratch_dir
from thrill_spark.functions import dedup as D
from thrill_spark.functions import similarity as S
from thrill_spark.functions import text as TX
from thrill_spark.plans.queries import _dbl, _dec, query
from thrill_spark.streaming import windows as EW

# Shared DuckDB fragments (must mirror thrill_spark.functions.text)
SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
SQL_SHINGLES3 = (
    "list_distinct(list_transform("
    "generate_series(0, greatest(len(toks)-2, 1)-1), "
    "i -> array_to_string(toks[i+1:i+3], ' ')))"
)
SQL_MD5LONG = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
@query(
    "text_token_stats",
    f"""
    SELECT doc_id, len(toks) AS n_tokens,
           md5(array_to_string(toks, ' ')) AS fp
    FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM documents)
    """,
)
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.fingerprint("text").alias("fp"),
    )


@query(
    "text_quality",
    f"""
    SELECT doc_id,
           n_chars, n_words,
           CASE WHEN n_words > 0 THEN (n_chars - n_spaces) / n_words ELSE 0.0 END AS avg_word_len,
           CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio
    FROM (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len({SQL_TOKS}) AS DOUBLE) AS n_words,
             CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
             CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) AS n_spaces
      FROM documents)
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    f = TX.quality_features("text")
    return docs.select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        f["n_words"].alias("n_words"),
        f["avg_word_len"].alias("avg_word_len"),
        f["punct_ratio"].alias("punct_ratio"),
    )


def _sql_lang_hits(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in TX.LANG_MARKERS[lang])
    return f"len(list_filter(toks, t -> list_contains([{markers}], t)))"


@query(
    "text_lang_id",
    f"""
    SELECT doc_id, lang AS lang_label,
           CASE WHEN m = 0 THEN 'und'
                WHEN h_fr = m THEN 'fr'
                WHEN h_es = m THEN 'es'
                WHEN h_en = m THEN 'en'
                ELSE 'de' END AS lang_pred
    FROM (
      SELECT doc_id, lang, h_en, h_de, h_fr, h_es,
             greatest(h_en, h_de, h_fr, h_es) AS m
      FROM (
        SELECT doc_id, lang,
               {_sql_lang_hits('en')} AS h_en,
               {_sql_lang_hits('de')} AS h_de,
               {_sql_lang_hits('fr')} AS h_fr,
               {_sql_lang_hits('es')} AS h_es
        FROM (SELECT doc_id, lang, {SQL_TOKS} AS toks FROM documents)))
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.col("lang").alias("lang_label"), TX.lang_id("text").alias("lang_pred")
    )


# ---------------------------------------------------------------------------
# Dedup: exact
# ---------------------------------------------------------------------------
@query(
    "dedup_exact",
    f"""
    SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM (SELECT doc_id, md5(array_to_string({SQL_TOKS}, ' ')) AS fp FROM documents)
    GROUP BY fp
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(docs).select("fp", "doc_id", "n_copies")


# ---------------------------------------------------------------------------
# Dedup: minhash signatures + LSH candidate pairs
# ---------------------------------------------------------------------------
_MH_K = 8
_MH_BANDS = 4


def _sql_minhash_sig() -> str:
    h = SQL_MD5LONG.format(x="sh")
    mins = ", ".join(
        f"MIN((h * {a} + {b}) % {D.MINHASH_P}) AS mh{i}"
        for i, (a, b) in enumerate(D.minhash_params(_MH_K))
    )
    return f"""
      SELECT doc_id, {mins} FROM (
        SELECT doc_id, {h} % {D.MINHASH_P} AS h FROM (
          SELECT doc_id, unnest(shingles) AS sh FROM (
            SELECT doc_id, {SQL_SHINGLES3} AS shingles FROM (
              SELECT doc_id, {SQL_TOKS} AS toks FROM documents))))
      GROUP BY doc_id
    """


@query("dedup_minhash_signatures", f"SELECT * FROM ({_sql_minhash_sig()})")
def q_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_signatures(docs, num_hashes=_MH_K)


def _sql_lsh_pairs() -> str:
    rows = _MH_K // _MH_BANDS
    bands = []
    for b in range(_MH_BANDS):
        cols = " || '_' || ".join(
            f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        bands.append(f"SELECT doc_id, {b} AS band, md5({cols}) AS bh FROM sig")
    banded = " UNION ALL ".join(bands)
    return f"""
    WITH sig AS ({_sql_minhash_sig()}),
    banded AS ({banded})
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh
    WHERE a.doc_id < b.doc_id
    """


@query("dedup_lsh_candidate_pairs", _sql_lsh_pairs())
def q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, num_hashes=_MH_K)
    return D.lsh_candidate_pairs(sig, num_hashes=_MH_K, bands=_MH_BANDS)


# ---------------------------------------------------------------------------
# Dedup: exact n-gram Jaccard pairs (LSH verify step / baseline)
# ---------------------------------------------------------------------------
@query(
    "dedup_jaccard_pairs",
    f"""
    WITH sh AS (
      SELECT doc_id, shingles, len(shingles) AS n_sh FROM (
        SELECT doc_id, {SQL_SHINGLES3} AS shingles FROM (
          SELECT doc_id, {SQL_TOKS} AS toks FROM documents))),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, n_common,
           CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM common
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.2
    """,
)
def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, threshold=0.2)


# ---------------------------------------------------------------------------
# Dedup: SimHash signatures
# ---------------------------------------------------------------------------
_SIMHASH_BITS = 16


def _sql_simhash() -> str:
    h = SQL_MD5LONG.format(x="t")
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(_SIMHASH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(_SIMHASH_BITS)
    )
    return f"""
    SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM (
      SELECT doc_id, {votes} FROM (
        SELECT doc_id, {h} AS h FROM (
          SELECT doc_id, unnest({SQL_TOKS}) AS t FROM documents))
      GROUP BY doc_id)
    """


@query("dedup_simhash", _sql_simhash())
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(docs, bits=_SIMHASH_BITS)


# ---------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k (exact baseline)
# ---------------------------------------------------------------------------
_QUERY_VEC = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]  # fixed probe vector


def _sql_cosine_topk(k: int = 10) -> str:
    qlit = "[" + ", ".join(repr(x) for x in _QUERY_VEC) + "]::DOUBLE[]"
    return f"""
    SELECT vec_id, cos_sim FROM (
      SELECT vec_id,
        list_reduce(list_transform(list_zip(embedding, {qlit}),
                    p -> CAST(p[1] AS DOUBLE) * p[2]), (a,b) -> a+b)
        / ( sqrt(list_reduce(list_transform(embedding,
                    x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (a,b) -> a+b))
          * sqrt(list_reduce(list_transform({qlit}, x -> x*x), (a,b) -> a+b)) )
        AS cos_sim
      FROM embeddings)
    ORDER BY cos_sim DESC, vec_id LIMIT {k}
    """


@query("similarity_cosine_topk", _sql_cosine_topk(10))
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk_for_query(emb, _QUERY_VEC, k=10)


# ANN via multi-table sign-LSH — recall<1 by construction, so the
# neighbor LISTS have no oracle; the CHECKED value is mean recall vs
# the in-plan brute-force top-k over a deterministic probe subset
# (vec_id % 25 == 0). planes=4/tables=16 measures 0.96 at sf0.01; the
# 0.7 floor catches any regression in planes/bucketing/ranking while
# tolerating fixture re-draws.
@query(
    "similarity_ann_lsh",
    "SELECT COUNT(*) AS queries_checked, TRUE AS recall_ok "
    "FROM embeddings WHERE vec_id % 25 = 0",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    k = 5
    ann = S.ann_lsh_topk(emb, dim=64, k=k, n_planes=4, n_tables=16).filter(
        F.col("query_id") % 25 == 0
    )
    probes = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    pool = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_nv"))
    scored = (
        pool.join(F.broadcast(probes), on=F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", S.cosine(F.col("_nv"), F.col("_qv")).alias("_cs"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_cs").desc(), F.col("neighbor_id").asc())
    brute = scored.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k)
    hits = ann.join(brute, on=["query_id", "neighbor_id"]).agg(
        F.count("*").alias("n_hits")
    )
    return (
        probes.agg(F.count("*").alias("queries_checked"))
        .crossJoin(hits)
        .select(
            "queries_checked",
            (F.col("n_hits") / (F.col("queries_checked") * k) >= F.lit(0.7)).alias("recall_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Event-time windows on the events table
# ---------------------------------------------------------------------------
@query(
    "events_tumbling_hourly",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = EW.tumbling(
        ev, "ts", "1 hour", keys=("event_type",),
        aggs={"n": F.count("*"), "total_value": F.sum(_dec("value", 18, 6))},
    )
    return out.select(
        "window_start", "event_type", "n", _dbl(F.col("total_value")).alias("total_value")
    )


@query(
    "events_sliding_1h_30m",
    """
    SELECT window_start, COUNT(*) AS n FROM (
      SELECT unnest([time_bucket(INTERVAL 30 minutes, ts),
                     time_bucket(INTERVAL 30 minutes, ts) - INTERVAL 30 minutes])
             AS window_start
      FROM events)
    GROUP BY window_start
    """,
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = EW.sliding(ev, "ts", "1 hour", "30 minutes", aggs={"n": F.count("*")})
    return out.select("window_start", "n")


@query(
    "events_sessionize",
    """
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
    FROM (
      SELECT user_id, ts,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM (
        SELECT user_id, ts,
               CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 30*60*1000000
                    THEN 1 ELSE 0 END AS new_s
        FROM (
          SELECT user_id, ts,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
          FROM events)))
    GROUP BY user_id, session_id
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts"))
    marked = ev.withColumn(
        "new_s",
        F.when(
            F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > 30 * 60 * 1_000_000), 1
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_id", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
    )


@query(
    "events_json_props",
    """
    SELECT event_type, CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k, COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Dedup: cluster assignment — the end-to-end near-dup pipeline step
# (minhash -> LSH bands -> candidate pairs -> connected components ->
# cluster id = MIN doc_id). Oracle: recursive-CTE reachability closure
# over the same pair graph.
# ---------------------------------------------------------------------------
from thrill_spark.plans import algorithms as ALG  # noqa: E402


@query(
    "dedup_cluster_assign",
    f"""
    WITH RECURSIVE pairs AS (SELECT * FROM ({_sql_lsh_pairs()})),
    edges AS MATERIALIZED (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs),
    reach(src, n) AS (
      SELECT u, u FROM edges
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.n = e.u)
    SELECT src AS node, MIN(n) AS component FROM reach GROUP BY src
    """,
)
def q_dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, num_hashes=_MH_K)
    pairs = D.lsh_candidate_pairs(sig, num_hashes=_MH_K, bands=_MH_BANDS)
    return ALG.connected_components(pairs, a="id_a", b="id_b")


# ---------------------------------------------------------------------------
# Event funnel: users progressing view -> later click -> later purchase.
# Each stage is an agg + self-join on (user, after-prior-stage) — all
# shuffles on user_id; stage counts combine via tiny broadcast
# cross-join (3 one-row aggregates).
# ---------------------------------------------------------------------------
@query(
    "events_funnel_view_click_purchase",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
          JOIN v ON e.user_id = v.user_id AND e.ts > v.t
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
          JOIN c ON e.user_id = c.user_id AND e.ts > c.t
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(prior: DataFrame, etype: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype).alias("e")
        pr = prior.alias("pr")
        return (
            e.join(pr, (F.col("e.user_id") == F.col("pr.user_id"))
                   & (F.col("e.ts") > F.col("pr.t")))
            .groupBy(F.col("e.user_id").alias("user_id"))
            .agg(F.min("e.ts").alias("t"))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    c = stage(v, "click")
    p = stage(c, "purchase")
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_view_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
    return nv.join(F.broadcast(nc)).join(F.broadcast(np_))


# ---------------------------------------------------------------------------
# Structured Streaming with a HARD oracle: the query runs an actual
# streaming job (file source -> watermark -> tumbling window -> memory
# sink, processAllAvailable) and returns the sink table, which the
# DuckDB oracle checks like any batch result. This is the
# stream-equals-batch guarantee as a driver-verified signal, not just
# a unit test.
# ---------------------------------------------------------------------------
@query(
    "events_stream_tumbling",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_events_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from thrill_spark.streaming.windows import stream_tumbling

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    src = scratch_dir(spark, "stream_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = stream_tumbling(stream, "ts", "1 hour", "10 minutes", keys=("event_type",))
    name = "stream_tumbling_sink"
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select("window_start", "event_type", "n")


# Custom stateful streaming operator (applyInPandasWithState) with a
# hard oracle: per-user running event counts maintained in the state
# store across micro-batches; the sink's final row per user must equal
# the batch groupBy. Counts only — the running float total's addition
# order is engine-internal, so the exact-hash oracle checks the
# deterministic column. max() over the sink keeps the check correct
# even if the file source splits input into several micro-batches
# (running counts are monotone).
@query(
    "events_stream_stateful_counts",
    "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id",
)
def q_events_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from thrill_spark.streaming.stateful import stream_running_totals

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    src = scratch_dir(spark, "stateful_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = stream_running_totals(stream, key="user_id")
    name = "stream_stateful_sink"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
