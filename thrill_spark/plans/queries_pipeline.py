"""Round-4 pipeline queries: corpus-trained scoring, segment-level
boilerplate dedup, containment near-dup, training-mix interleave, and
the URL/JSON function-family audit.

No reference analogue (Thrill's surface ends at classic analytics);
these are LLM-training-data operators, each DuckDB-oracle-checked with
exact-integer or md5-derived arithmetic so value hashes match
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thrill_spark.catalog import load_table, scratch_dir
from thrill_spark.functions import corpus as C
from thrill_spark.functions import dedup as D
from thrill_spark.functions import text as TX
from thrill_spark.plans.queries import query
from thrill_spark.plans.queries_llm import SQL_TOKS


def _sql_md5_long(x: str) -> str:
    return f"CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# Unigram rarity: train global token counts, score each doc with exact
# integer arithmetic (total div count summed over tokens).
# ---------------------------------------------------------------------------
@query(
    "text_unigram_rarity",
    f"""
    WITH toks AS (SELECT doc_id, unnest({SQL_TOKS}) AS _t FROM documents),
    cnt AS (SELECT _t, COUNT(*) AS _c FROM toks GROUP BY _t),
    tot AS (SELECT CAST(SUM(_c) AS BIGINT) AS _total FROM cnt)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(_total // _c) AS BIGINT) AS rarity
    FROM toks JOIN cnt USING (_t) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def q_unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.unigram_rarity(docs)


# ---------------------------------------------------------------------------
# Segment-level boilerplate removal (C4/RefinedWeb line-dedup analogue
# over disjoint 16-token blocks).
# ---------------------------------------------------------------------------
_SEG_WORDS = 16


@query(
    "dedup_paragraph_boilerplate",
    f"""
    WITH base AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    seg AS (
      SELECT doc_id, i,
             array_to_string(toks[i*{_SEG_WORDS}+1 : i*{_SEG_WORDS}+{_SEG_WORDS}], ' ') AS seg
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(0,
                 greatest(CAST(ceil(len(toks) / {_SEG_WORDS}.0) AS INT), 1) - 1)) AS i
        FROM base)),
    fps AS (SELECT doc_id, i, seg, md5(seg) AS fp FROM seg),
    cnt AS (SELECT fp, COUNT(DISTINCT doc_id) AS _nd FROM fps GROUP BY fp)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs,
           CAST(SUM(CASE WHEN _nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bp,
           md5(coalesce(string_agg(CASE WHEN _nd < 2 THEN seg END, ' ' ORDER BY i), ''))
             AS clean_fp
    FROM fps JOIN cnt USING (fp)
    GROUP BY doc_id
    """,
)
def q_paragraph_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return TX.segment_boilerplate(docs, seg_words=_SEG_WORDS, min_docs=2)


# ---------------------------------------------------------------------------
# Containment near-dup pairs (asymmetric Jaccard).
# ---------------------------------------------------------------------------
@query(
    "text_minhash_containment",
    f"""
    WITH sh AS (
      SELECT doc_id, shingles, len(shingles) AS n_sh FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                 generate_series(0, greatest(len(toks)-2, 1)-1),
                 i -> array_to_string(toks[i+1:i+3], ' '))) AS shingles
        FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM documents))),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT id_a, id_b, n_common,
           CAST(n_common AS DOUBLE) / sa.n_sh AS containment_a,
           CAST(n_common AS DOUBLE) / sb.n_sh AS containment_b
    FROM common
    JOIN sh sa ON sa.doc_id = id_a
    JOIN sh sb ON sb.doc_id = id_b
    WHERE greatest(CAST(n_common AS DOUBLE) / sa.n_sh,
                   CAST(n_common AS DOUBLE) / sb.n_sh) >= 0.5
    """,
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.containment_pairs(docs, threshold=0.5)


# ---------------------------------------------------------------------------
# Training-mix interleave: per-source quota + global round-robin order.
# ---------------------------------------------------------------------------
_QUOTA = 12


@query(
    "corpus_quota_interleave",
    f"""
    WITH ranked AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY {_sql_md5_long("'quota:' || CAST(doc_id AS VARCHAR)")}, doc_id
             ) AS INT) AS rank_in_source
      FROM documents),
    kept AS (SELECT * FROM ranked WHERE rank_in_source <= {_QUOTA})
    SELECT doc_id, source, rank_in_source,
           CAST(row_number() OVER (ORDER BY rank_in_source, source, doc_id) - 1
                AS BIGINT) AS position
    FROM kept
    """,
)
def q_quota_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = C.quota_interleave(docs, quota=_QUOTA)
    return out.select("doc_id", "source", "rank_in_source", "position")


# ---------------------------------------------------------------------------
# URL + JSON function-family audit: Spark-native parse_url /
# get_json_object vs an INDEPENDENT oracle computation (regexp / DuckDB
# JSON operators) over deterministically constructed URLs.
# ---------------------------------------------------------------------------
@query(
    "fn_url_json_ops",
    """
    SELECT event_id,
           's' || CAST(user_id % 5 AS VARCHAR) || '.example.com' AS host,
           '/p/' || CAST(event_id AS VARCHAR) AS path,
           CAST(user_id AS BIGINT) AS u_param,
           event_type AS t_param,
           CAST(props->>'k' AS BIGINT) AS prop_k
    FROM events
    """,
)
def q_url_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://s"),
        (F.col("user_id") % 5).cast("string"),
        F.lit(".example.com/p/"),
        F.col("event_id").cast("string"),
        F.lit("?u="),
        F.col("user_id").cast("string"),
        F.lit("&t="),
        F.col("event_type"),
    )
    ev = ev.withColumn("_url", url)
    return ev.select(
        "event_id",
        F.expr("parse_url(_url, 'HOST')").alias("host"),
        F.expr("parse_url(_url, 'PATH')").alias("path"),
        F.expr("parse_url(_url, 'QUERY', 'u')").cast("long").alias("u_param"),
        F.expr("parse_url(_url, 'QUERY', 't')").alias("t_param"),
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter duplicate detection (reference core/duplicate_detection
# .hpp:38 — the shuffle-avoidance pass, realized as a hot-bit-position
# aggregation + candidate-restricted exact confirm). The oracle is the
# plain exact duplicate grouping: the bloom pass must never change the
# answer.
# ---------------------------------------------------------------------------
@query(
    "dedup_bloom_prefilter",
    f"""
    SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM (SELECT doc_id, md5(array_to_string({SQL_TOKS}, ' ')) AS fp FROM documents)
    GROUP BY fp HAVING COUNT(*) >= 2
    """,
)
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.bloom_prefilter_dedup(docs).select("fp", "doc_id", "n_copies")


# ---------------------------------------------------------------------------
# Exact k-NN join: distributed block matmul with per-block top-k +
# sequential-fold rescore; oracle is DuckDB's brute-force fold over the
# same probe set.
# ---------------------------------------------------------------------------
_KNN_K = 5

_SQL_FOLD_COS = """
         list_reduce(list_transform(list_zip(e.embedding, p.qv),
                     pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE)), (a,b) -> a+b)
         / ( sqrt(list_reduce(list_transform(p.qv,
                     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (a,b) -> a+b))
           * sqrt(list_reduce(list_transform(e.embedding,
                     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (a,b) -> a+b)) )
"""


@query(
    "similarity_knn_join",
    f"""
    WITH probes AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 10 = 0),
    scored AS (
      SELECT p.query_id, e.vec_id AS neighbor_id,
             {_SQL_FOLD_COS} AS cos_sim
      FROM embeddings e, probes p WHERE e.vec_id <> p.query_id)
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
      FROM scored)
    WHERE rank <= {_KNN_K}
    """,
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thrill_spark.functions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 10 == 0)
    return S.knn_join(probes, emb, k=_KNN_K)


# ---------------------------------------------------------------------------
# Structured Streaming with hard oracles, round 4: stream-stream join
# and streaming dedup run as ACTUAL streaming jobs (file source ->
# memory sink, processAllAvailable) whose sink tables the DuckDB oracle
# checks like any batch result — the stream ≡ batch guarantee as a
# driver-verified signal (same pattern as events_stream_tumbling).
# ---------------------------------------------------------------------------
@query(
    "events_stream_join",
    """
    SELECT l.user_id, l.event_id AS l_event_id, r.event_id AS r_event_id,
           l.ts AS l_ts, r.ts AS r_ts
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE
    WHERE l.event_type = 'view' AND r.event_type = 'click'
    """,
)
def q_events_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from thrill_spark.streaming.joins import stream_stream_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type")
    views = ev.filter(F.col("event_type") == "view").drop("event_type")
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type")
    base = scratch_dir(spark, "ssj")
    vsrc, csrc = base + "_views", base + "_clicks"
    views.write.mode("overwrite").parquet(vsrc)
    clicks.write.mode("overwrite").parquet(csrc)
    vstream = spark.readStream.schema(views.schema).parquet(vsrc)
    cstream = spark.readStream.schema(clicks.schema).parquet(csrc)
    joined = stream_stream_join(
        vstream, cstream, key="user_id", watermark="1 hour", max_lag="30 minutes"
    )
    name = "stream_join_sink"
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.col("l_key").alias("user_id"),
        F.col("l_event_id"),
        F.col("r_event_id"),
        F.col("l_ts"),
        F.col("r_ts"),
    )


@query(
    "events_stream_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def q_events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from thrill_spark.streaming.dedup import stream_dedup_within_watermark

    ev = load_table(spark, sf_dir, "events").select("ts", "user_id", "event_type")
    src = scratch_dir(spark, "sdedup_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    # Which physical row survives per key is arrival-order-dependent;
    # the KEY SET is deterministic, so the sink projects keys only.
    out = stream_dedup_within_watermark(stream, ["user_id", "event_type"], watermark="1 hour")
    name = "stream_dedup_sink"
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select("user_id", "event_type")


# ---------------------------------------------------------------------------
# BPE tokenization: distributed word-frequency train -> driver merge
# table -> Arrow-batched distributed apply. BPE itself is not
# SQL-expressible, so the oracle checks the deterministic INVARIANTS
# computed JVM-side over the apply output (the recall-floor pattern):
# perfect detokenization roundtrip and token-count bounds
# n_words <= n_tokens <= n_nonspace_chars + n_words, which must hold
# for every document or the tokenizer is broken.
# ---------------------------------------------------------------------------
@query(
    "text_bpe_tokenize",
    """
    SELECT doc_id, TRUE AS ok_roundtrip, TRUE AS tokens_bounded
    FROM documents
    """,
)
def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thrill_spark.functions import bpe as BP

    docs = load_table(spark, sf_dir, "documents")
    merges = BP.train_bpe(docs, n_merges=30)
    toks = BP.bpe_tokenize(docs, merges)
    norm = docs.select(
        "doc_id",
        F.concat_ws(" ", TX.tokens("text")).alias("_norm"),
        TX.token_count("text").alias("_n_words"),
    )
    joined = toks.join(norm, "doc_id")
    detok = F.trim(F.replace(F.array_join("tokens", ""), F.lit(BP.END), F.lit(" ")))
    n_chars_nospace = F.length(F.replace(F.col("_norm"), F.lit(" "), F.lit("")))
    return joined.select(
        "doc_id",
        (detok == F.col("_norm")).alias("ok_roundtrip"),
        (
            (F.col("n_tokens") >= F.col("_n_words"))
            & (F.col("n_tokens") <= n_chars_nospace + F.col("_n_words"))
        ).alias("tokens_bounded"),
    )


# ---------------------------------------------------------------------------
# Heavy hitters: per-partition Misra-Gries sketch -> candidate merge ->
# exact confirm. The sketch bounds state and shuffle; the confirm makes
# the output exact, so the oracle is the plain exact threshold query.
# ---------------------------------------------------------------------------
_HH_K = 64


@query(
    "text_heavy_hitters",
    f"""
    WITH toks AS (SELECT unnest({SQL_TOKS}) AS t FROM documents),
    tot AS (SELECT COUNT(*) AS n_total FROM toks)
    SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS n
    FROM toks CROSS JOIN tot
    GROUP BY t, n_total
    HAVING COUNT(*) * {_HH_K} > n_total
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thrill_spark.functions.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    return heavy_hitters(docs, k=_HH_K)


# ---------------------------------------------------------------------------
# Multi-resolution event-time rollup (hypertable continuous-aggregate
# shape): day/hour hierarchy in ONE grouping-sets pass instead of two
# scans + a union; grain_id distinguishes the levels.
# ---------------------------------------------------------------------------
@query(
    "events_multires_rollup",
    """
    SELECT date_trunc('day', ts) AS day,
           date_trunc('hour', ts) AS hour,
           CAST(GROUPING(date_trunc('hour', ts)) AS INT) AS grain_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    HAVING GROUPING(date_trunc('day', ts)) = 0
    """,
)
def q_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thrill_spark.plans.queries import _dbl, _dec

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    hour = F.date_trunc("hour", F.col("ts"))
    out = (
        ev.select(day.alias("day"), hour.alias("hour"), F.col("value"))
        .rollup("day", "hour")
        .agg(
            F.grouping("hour").cast("int").alias("grain_id"),
            F.count("*").alias("n"),
            _dbl(F.sum(_dec("value", 18, 6))).alias("total_value"),
        )
    )
    # Drop the grand-total row: the day grain is the coarsest level this
    # rollup keeps (ts is never null, so null day == the rollup row —
    # same predicate the oracle's HAVING GROUPING(day)=0 expresses).
    return out.filter(F.col("day").isNotNull())


# ---------------------------------------------------------------------------
# IVF-PQ ANN (Jégou et al. 2011 §V): an IVF coarse quantizer
# (n_cells derived from N, ceil(sqrt(N/64))) restricts the candidate
# scan to each probe's top-nprobe cells; within them, M=4 subspace
# codebooks rank candidates by asymmetric distance over codes only,
# then the top rescore_factor*k are exactly rescored by cosine.
# Recall-floor oracle vs brute-force cosine: the fixture embeddings
# are near-uniform — the coarse-quantizer worst case — measured
# recall@5 ~0.39-0.48 across sf0.001/0.01/0.1 with nprobe=4,
# train_iters=6, rescore_factor=16; floor 0.25.
# ---------------------------------------------------------------------------
@query(
    "similarity_pq_ann",
    "SELECT COUNT(*) AS queries_checked, TRUE AS recall_ok "
    "FROM embeddings WHERE vec_id % 50 = 0",
)
def q_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from thrill_spark.functions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    k = 5
    dim = emb.select(F.size("embedding").alias("d")).first()["d"]
    ann = S.pq_ann_topk(emb, k=k, m=4, ksub=16, probe_mod=50)
    probes = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    pool = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_nv")
    )
    # Brute-force recall check — the verification harness, not the
    # operator (N×Q only at test scale); cosine_fixed keeps the scan
    # codegen'd and bit-identical to cosine().
    scored = pool.join(
        F.broadcast(probes), on=F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        S.cosine_fixed("_nv", "_qv", dim).alias("_cs"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cs").desc(), F.col("neighbor_id").asc()
    )
    brute = scored.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k)
    hits = ann.join(brute, on=["query_id", "neighbor_id"]).agg(
        F.count("*").alias("n_hits")
    )
    return (
        probes.agg(F.count("*").alias("queries_checked"))
        .crossJoin(hits)
        .select(
            "queries_checked",
            (F.col("n_hits") / (F.col("queries_checked") * k) >= F.lit(0.25)).alias(
                "recall_ok"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Content-defined chunking dedup (Rabin/Gear-CDC shape at word
# granularity): boundaries anchored on a rolling window hash, chunks
# hashed corpus-wide, per-doc duplicated-token share. The DuckDB
# oracle rebuilds boundary positions, chunk texts, and the cross-doc
# dup decision from the same integer formulas.
# ---------------------------------------------------------------------------
_CDC_W = 4
_CDC_D = 16


@query(
    "dedup_cdc_chunks",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents),
    h AS (
      SELECT doc_id, toks,
             list_transform(toks,
                 w -> CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)) AS hs,
             greatest(len(toks) - {_CDC_W - 1}, 1) AS m
      FROM t),
    sp AS (
      SELECT doc_id, toks,
             list_filter(generate_series(1, m),
                 i -> i = 1 OR (len(toks) >= {_CDC_W} AND
                      (hs[i] % 1048576 + (hs[i+1] % 1048576) * 3
                       + (hs[i+2] % 1048576) * 9
                       + (hs[i+3] % 1048576) * 27) % {_CDC_D} = 0)) AS sp
      FROM h),
    chunks AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(sp)),
                 k -> array_to_string(
                        toks[sp[k] : coalesce(sp[k+1], len(toks)+1) - 1],
                        ' '))) AS chunk
      FROM sp),
    ch AS (
      SELECT doc_id, md5(chunk) AS chunk_hash,
             len(list_filter(string_split(chunk, ' '), x -> x <> '')) AS n_tokens
      FROM chunks),
    multi AS (
      SELECT chunk_hash FROM ch GROUP BY chunk_hash
      HAVING COUNT(DISTINCT doc_id) > 1),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      FROM ch GROUP BY doc_id),
    dup AS (
      SELECT ch.doc_id, CAST(SUM(n_tokens) AS BIGINT) AS dup_tokens
      FROM ch SEMI JOIN multi USING (chunk_hash)
      GROUP BY ch.doc_id)
    SELECT p.doc_id, n_chunks, total_tokens,
           CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(coalesce(coalesce(dup_tokens, 0) * 10000
                         // nullif(total_tokens, 0), 0) AS BIGINT)
             AS dup_bp
    FROM per_doc p LEFT JOIN dup USING (doc_id)
    """,
)
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return D.cdc_dup_report(docs, window=_CDC_W, divisor=_CDC_D)


# ---------------------------------------------------------------------------
# LEFT OUTER stream-stream join: views left-joined to the clicks that
# followed within 30 minutes; views with NO such click are emitted
# with NULLs once the watermark passes their join window — the
# capability inner joins don't exercise (state expiry driving output).
# A far-future sentinel on both streams pushes the final watermark
# past every real row, so the final emitted set is exactly the batch
# LEFT JOIN regardless of micro-batch boundaries (every unmatched view
# expires before the query ends). Oracle: that batch LEFT JOIN,
# aggregated per view event.
# ---------------------------------------------------------------------------
@query(
    "events_stream_outer_join",
    """
    WITH v AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'view'),
         c AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'click')
    SELECT v.event_id AS view_id, v.user_id,
           CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks,
           COUNT(c.event_id) = 0 AS unmatched
    FROM v LEFT JOIN c
      ON c.user_id = v.user_id
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
    GROUP BY v.event_id, v.user_id
    """,
)
def q_events_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from thrill_spark.streaming.joins import stream_stream_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    views = ev.filter(F.col("event_type") == "view").drop("event_type")
    clicks = ev.filter(F.col("event_type") == "click").drop("event_type")
    # watermark-flush sentinel: one far-future row per stream
    flush = ev.agg(
        (F.max("ts") + F.expr("INTERVAL 12 HOURS")).alias("ts")
    ).select(F.lit(-1).cast("long").alias("event_id"), "ts",
             F.lit(-1).cast("long").alias("user_id"))
    views_s = views.unionByName(flush)
    clicks_s = clicks.unionByName(flush)
    base = scratch_dir(spark, "ssoj")
    vsrc, csrc = base + "_views", base + "_clicks"
    views_s.write.mode("overwrite").parquet(vsrc)
    clicks_s.write.mode("overwrite").parquet(csrc)
    vstream = spark.readStream.schema(views_s.schema).parquet(vsrc)
    cstream = spark.readStream.schema(clicks_s.schema).parquet(csrc)
    joined = stream_stream_join(
        vstream,
        cstream,
        key="user_id",
        watermark="1 hour",
        max_lag="30 minutes",
        how="left_outer",
    )
    name = "stream_outer_join_sink"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name).filter(F.col("l_event_id") != -1)
    return out.groupBy(
        F.col("l_event_id").alias("view_id"), F.col("l_key").alias("user_id")
    ).agg(
        F.count("r_event_id").cast("long").alias("n_clicks"),
        (F.count("r_event_id") == 0).alias("unmatched"),
    )


# ---------------------------------------------------------------------------
# DSIR-shape domain-targeted selection (Xie et al. 2023): integer
# fixed-point unigram likelihood-ratio affinity toward the src0
# domain, exact top-100. The selected set should (and does) skew
# heavily toward the target domain — the property that makes
# importance resampling work — but the oracle checks the full exact
# scores, not just the skew.
# ---------------------------------------------------------------------------
@query(
    "corpus_dsir_select",
    f"""
    WITH t AS (SELECT doc_id, source = 'src0' AS is_tgt, {SQL_TOKS} AS toks
               FROM documents),
    tok AS (SELECT doc_id, is_tgt, unnest(toks) AS tk FROM t),
    vocab AS (
      SELECT tk, CAST(COUNT(*) AS BIGINT) AS corpus_cnt,
             CAST(COUNT(*) FILTER (WHERE is_tgt) AS BIGINT) AS tgt_cnt
      FROM tok GROUP BY tk),
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(tgt_cnt * 100000 // corpus_cnt) AS BIGINT) AS wsum,
             CAST(COUNT(*) AS BIGINT) AS ntok
      FROM tok JOIN vocab USING (tk) GROUP BY doc_id)
    SELECT doc_id, CAST(wsum * 1000 // ntok AS BIGINT) AS affinity
    FROM per_doc ORDER BY affinity DESC, doc_id LIMIT 100
    """,
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.dsir_affinity_select(
        docs, F.col("source") == "src0", top_k=100
    )


# ---------------------------------------------------------------------------
# SFT pair construction: deterministic midpoint-sentence split into
# (prompt, completion), word floors both sides, prompt-hash dedup
# keeping the lowest doc_id. The oracle replays the split-point
# search (dot nearest the char midpoint) and the dedup exactly.
# ---------------------------------------------------------------------------
@query(
    "corpus_sft_pairs",
    """
    WITH d0 AS (
      SELECT doc_id, text, length(text) AS n,
             length(text) - length(text) % 2 AS mid,
             list_filter(list_transform(generate_series(1, length(text)),
                 i -> CASE WHEN substring(text, i, 1) = '.' THEN i ELSE 0 END),
                 p -> p > 0) AS dots
      FROM documents),
    sp AS (
      SELECT doc_id, text,
             CASE WHEN len(dots) = 0 THEN 0
                  ELSE list_reduce(dots, (acc, p) ->
                       CASE WHEN abs(p*2 - mid) < abs(acc*2 - mid)
                            THEN p ELSE acc END)
             END AS s
      FROM d0),
    pairs AS (
      SELECT doc_id,
             trim(substring(text, 1, s)) AS prompt,
             trim(substring(text, s + 1)) AS completion
      FROM sp WHERE s > 0),
    flt AS (
      SELECT doc_id, prompt, completion, md5(prompt) AS prompt_hash
      FROM pairs
      WHERE len(list_filter(string_split_regex(prompt, '\\s+'), t -> t <> '')) >= 8
        AND len(list_filter(string_split_regex(completion, '\\s+'), t -> t <> '')) >= 8)
    SELECT doc_id, prompt, completion, prompt_hash FROM flt
    QUALIFY ROW_NUMBER() OVER (PARTITION BY prompt_hash ORDER BY doc_id) = 1
    """,
)
def q_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return C.sft_pairs(docs)


# ---------------------------------------------------------------------------
# Decoder-loop artifact detection: longest period-p self-repeat run
# (p = 1, 2, 3) per document — the filter that catches 'the the the'
# and 'a b a b a b' generation loops. Run length via zero-position
# gaps; every intermediate list is a staged CTE column on the oracle
# side and a chained projection on the Spark side (inline nesting
# re-evaluates the chain per element — O(n^3)/row).
# ---------------------------------------------------------------------------
def _sql_loop_stage(p: int) -> str:
    return f"""
    f{p} AS (
      SELECT doc_id, toks,
             list_transform(generate_series(1, greatest(len(toks) - {p}, 0)),
                 i -> CASE WHEN toks[i + {p}] = toks[i] THEN 1 ELSE 0 END) AS fl
      FROM t),
    z{p} AS (
      SELECT doc_id,
             list_concat(list_concat([0],
                 list_filter(list_transform(generate_series(1, len(fl)),
                     i -> CASE WHEN fl[i] = 0 THEN i ELSE 0 END),
                     x -> x > 0)),
                 [len(fl) + 1]) AS zp
      FROM f{p}),
    g{p} AS (
      SELECT doc_id,
             coalesce(list_max(list_transform(generate_series(1, len(zp) - 1),
                 k -> zp[k + 1] - zp[k] - 1)), 0) AS mx
      FROM z{p}),
    r{p} AS (
      SELECT doc_id,
             CAST(CASE WHEN mx > 0 THEN mx + {p} ELSE 0 END AS BIGINT) AS run_p{p}
      FROM g{p})"""


@query(
    "text_loop_artifacts",
    f"""
    WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    {_sql_loop_stage(1)},
    {_sql_loop_stage(2)},
    {_sql_loop_stage(3)}
    SELECT r1.doc_id, run_p1, run_p2, run_p3,
           greatest(run_p1, run_p2, run_p3) >= 6 AS loop_flag
    FROM r1 JOIN r2 USING (doc_id) JOIN r3 USING (doc_id)
    """,
)
def q_loop_artifacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.loop_artifact_report(docs, "text", "doc_id", periods=(1, 2, 3))
