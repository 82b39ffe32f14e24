"""Text analysis for large-scale training-data pipelines.

All hot-path expressions are JVM-side built-ins (no Python UDFs):
tokenization via split/regexp, hashing via md5 (chosen because the
DuckDB oracle computes the identical digest), scoring via arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deliberately tiny + deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "a"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "y", "es", "los"),
}


def tokens(col: str | Column, lowercase: bool = True) -> Column:
    """Whitespace tokenization -> array<string> with empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def _let(value: Column, body) -> Column:
    """Lambda let-binding: evaluate `value` ONCE per row and feed it to
    `body` as a bound variable.

    Referencing a non-trivial expression (e.g. the regex-split token
    array) inside a higher-order-function lambda makes Catalyst
    re-evaluate it per element — O(n^2) per row for n-gram builders
    (same trap documented at dedup.py::winnow_fingerprints; measured
    ~6x on the tfidf explode stage). Wrapping the expression in a
    1-element array and going through transform() binds the evaluated
    value instead."""
    return F.transform(F.array(value), body)[0]


def char_ngrams(col: str | Column, n: int) -> Column:
    """Character n-gram shingles (distinct) of a lowercased string."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)

    def build(s: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1)))
        return F.array_distinct(F.transform(idx, lambda i: F.substring(s, i, n)))

    return _let(c, build)


def word_ngrams(col: str | Column, n: int) -> Column:
    """Word n-gram shingles (distinct), space-joined."""

    def build(toks: Column) -> Column:
        count = F.greatest(F.size(toks) - (n - 1), F.lit(1))
        idx = F.sequence(F.lit(0), count - 1)
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        )

    return _let(tokens(col), build)


def md5_long(col: Column, offset: int = 1) -> Column:
    """Stable 60-bit integer hash from md5 hex digits [offset, offset+15).

    md5 (not xxhash64/murmur) so the DuckDB oracle reproduces it:
    CAST('0x' || substr(md5(x), offset, 15) AS BIGINT).
    """
    return F.conv(F.substring(F.md5(col), offset, 15), 16, 10).cast("long")


def fingerprint(col: str | Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text — the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat_ws(" ", tokens(c)))


def quality_features(text_col: str = "text") -> dict[str, Column]:
    """Deterministic quality-scoring features (length / punctuation /
    word-shape ratios), all SQL-replicable arithmetic."""
    c = F.col(text_col)
    n_chars = F.length(c).cast("double")
    toks = tokens(c)
    n_words = F.size(toks).cast("double")
    n_punct = (F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))).cast("double")
    n_spaces = (F.length(c) - F.length(F.regexp_replace(c, r" ", ""))).cast("double")
    avg_word_len = F.when(n_words > 0, (n_chars - n_spaces) / n_words).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": avg_word_len,
        "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        "space_ratio": F.when(n_chars > 0, n_spaces / n_chars).otherwise(F.lit(0.0)),
    }


def quality_score(text_col: str = "text") -> Column:
    """Composite [0,1] quality score: rewards mid-length documents with
    word-like tokens; pure arithmetic so the oracle can reproduce it."""
    f = quality_features(text_col)
    length_term = F.least(f["n_words"] / F.lit(100.0), F.lit(1.0))
    shape_term = F.when(
        (f["avg_word_len"] >= 2.0) & (f["avg_word_len"] <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    punct_term = F.when(f["punct_ratio"] <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    return length_term * shape_term * punct_term


def stopword_hits(text_col: str | Column, lang: str) -> Column:
    """Count of tokens that are marker stopwords for `lang`."""
    toks = tokens(text_col)
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id(text_col: str | Column) -> Column:
    """Heuristic language ID: argmax of marker-stopword hit counts,
    'und' (undetermined) when no marker hits. Deterministic tie-break:
    alphabetically-last language code wins ties (fr > es > en > de).

    argmax is array_max over (hits, lang) structs — every hit count is
    evaluated exactly once. (A chained when(hits > best, ...) fold
    embeds earlier hit expressions twice per level, blowing the
    expression tree up 2^langs-fold; measured ~4x slower on 5k docs.)"""
    entries = F.array(
        *[
            F.struct(stopword_hits(text_col, lang).alias("hits"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_max(entries)
    return F.when(best["hits"] == 0, F.lit("und")).otherwise(best["lang"])


# ---------------------------------------------------------------------------
# PII scrubbing (C4/Dolma-style preprocessing). Patterns restricted to
# syntax with identical semantics in Java regex (Spark) and RE2
# (DuckDB) so the oracle can replay the redaction exactly.
# ---------------------------------------------------------------------------
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}

# Redaction order matters: emails first (they contain dots/digits that
# could partially match the ipv4 pattern), then IPs, then phones.
_PII_ORDER = ("email", "ipv4", "phone")


def unigram_rarity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained unigram rarity score per document.

    Trains the "model" (global token counts) and scores in one
    distributed pass each: explode tokens -> groupBy token counts ->
    join back -> per-doc aggregate. The per-token weight is
    total_tokens div count(token) (integer division), so a token seen
    everywhere weighs ~1 and a hapax weighs ~total — an exact-integer
    stand-in for -log p(token) that both engines reproduce bit-for-bit
    (float ln is not identically rounded across libm implementations,
    so it can't be value-hashed).

    Scale: the token->count join key is the vocabulary, orders of
    magnitude smaller than the corpus — AQE broadcasts it when small;
    the global total folds over the vocab table (not the token stream),
    so the exploded tokens are scanned once for counting and once for
    scoring. Returns (id_col, n_tokens, rarity).
    """
    from thrill_spark.ordering import _persist

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
    # Vocabulary-sized; feeds both the global total and the scoring
    # join — persist so the token-count aggregation runs once (drained
    # via ordering.release_persisted()).
    counts = _persist(toks.groupBy("_t").agg(F.count("*").alias("_c")))
    total = counts.agg(F.sum("_c").cast("long").alias("_total"))
    scored = toks.join(counts, "_t").crossJoin(F.broadcast(total))
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.expr("_total div _c")).cast("long").alias("rarity"),
    )


def segment_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_words: int = 16,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-wide boilerplate removal at segment granularity (the
    line/paragraph dedup pass of C4/RefinedWeb-style pipelines, mapped
    to disjoint `seg_words`-token blocks since the fixture corpus has
    no newlines).

    A segment whose md5 fingerprint appears in >= min_docs distinct
    documents is boilerplate. Returns per doc: n_segs, n_bp (flagged
    segment count) and clean_fp = md5 of the document with boilerplate
    segments removed (segments rejoined in order).

    Shape: one explode (linear), one hash agg over segment
    fingerprints, one join back on fingerprint (skew-safe: a massively
    repeated segment is still one row on the count side), one per-doc
    agg. No Python, no quadratic stage — this is the scalable
    alternative to pairwise near-dup for exact repeated passages.
    """
    toks = tokens(text_col)
    n_seg = F.greatest(F.ceil(F.size(toks) / F.lit(seg_words)).cast("int"), F.lit(1))
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.struct(
            i.alias("i"),
            F.concat_ws(" ", F.slice(toks, i * seg_words + 1, seg_words)).alias("seg"),
        ),
    )
    ex = (
        df.select(F.col(id_col), F.explode(segs).alias("_s"))
        .select(id_col, F.col("_s.i").alias("i"), F.col("_s.seg").alias("seg"))
        .withColumn("fp", F.md5("seg"))
    )
    # Join only the FLAGGED fingerprints back (left join + null test):
    # the build side shrinks from every distinct segment to just the
    # repeated ones — in a real corpus a small fraction — so AQE can
    # broadcast it; a left join against the full count table would
    # shuffle the entire segment set twice.
    hot = (
        ex.groupBy("fp")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("fp")
        .withColumn("_flag", F.lit(1))
    )
    flagged = ex.join(hot, "fp", "left").withColumn("is_bp", F.col("_flag").isNotNull())
    kept_seg = F.when(~F.col("is_bp"), F.struct(F.col("i"), F.col("seg")))
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_segs"),
        F.sum(F.when(F.col("is_bp"), 1).otherwise(0)).cast("long").alias("n_bp"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(F.array_sort(F.collect_list(kept_seg)), lambda s: s["seg"]),
            )
        ).alias("clean_fp"),
    )


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-category PII occurrence counts (JVM regexp_count)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.regexp_count(c, F.lit(PII_PATTERNS[kind]))
        for kind in _PII_ORDER
    }


def redact_pii(col: str | Column, token: str = "[PII]") -> Column:
    """Replace every PII match with `token` (chained regexp_replace,
    whole-stage codegen; order per _PII_ORDER)."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in _PII_ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[kind], token)
    return c


def chunk_token_windows(
    df: "DataFrame",
    chunk: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Split each document into overlapping token windows of `chunk`
    tokens advancing by `stride` (overlap = chunk - stride) — the
    context-window chunker a RAG / pretraining pipeline runs over every
    document.

    FlatMap-shaped but pure expression: sequence + explode + slice, no
    Python in the hot path; output volume is rows x ceil(n/stride), the
    semantics, not an artifact. Short docs (n <= chunk) yield exactly
    one chunk. Every output column is exact-integer / md5 so a DuckDB
    oracle replays it bit-for-bit.
    """
    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk and stride must be positive")
    if stride > chunk:
        raise ValueError("stride must be <= chunk (windows must cover the doc)")
    base = (
        df.select(F.col(id_col), tokens(text_col).alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .withColumn(
            "_nch",
            F.when(
                F.col("_n") > chunk,
                F.expr(f"CAST((_n - {chunk} + {stride} - 1) DIV {stride} AS INT) + 1"),
            ).otherwise(F.lit(1)),
        )
    )
    piece = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, chunk)
    return (
        base.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.col("_nch") - 1)).alias("chunk_id"),
            F.col("_toks"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_id"),
            F.size(piece).alias("n_toks"),
            F.md5(F.concat_ws(" ", piece)).alias("chunk_fp"),
        )
    )


def bigram_surprisal(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-trained add-one-smoothed bigram LM score per document.

    Extends unigram_rarity's exact-integer -log p stand-in one order
    up: for each in-document bigram (w1, w2), the weight is
    (c(w1·) + V) div (c(w1 w2) + 1) — the integer-truncated
    reciprocal of the Laplace-smoothed conditional
    p(w2|w1) = (c12 + 1) / (c1 + V). Frequent continuations weigh
    ~1, unseen-in-context continuations weigh ~(c1+V). The per-doc
    sum is an exact-integer perplexity surrogate both engines
    reproduce bit-for-bit (float ln is not identically rounded
    across libm implementations, so it can't be value-hashed).

    Scale: one explode pass builds the bigram stream; the model
    (bigram counts + context totals) is vocabulary²-bounded, orders
    of magnitude smaller than the corpus, so the scoring join is
    AQE-broadcastable; V folds over the vocab table, not the token
    stream. Docs with < 2 tokens have no bigrams and drop out.
    Returns (id_col, n_bigrams, surprisal).
    """
    from thrill_spark.ordering import _persist

    toks = df.select(F.col(id_col), tokens(text_col).alias("_toks")).filter(
        F.size("_toks") >= 2
    )
    bg = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(0, size(_toks) - 2),"
                " i -> struct(_toks[i] AS w1, _toks[i+1] AS w2))"
            )
        ).alias("_bg"),
    ).select(id_col, "_bg.w1", "_bg.w2")
    # Model tables: bigram counts, context (w1) totals, vocab size.
    # Persisted — each feeds both training reductions and the scoring
    # join (drained via ordering.release_persisted()).
    c12 = _persist(bg.groupBy("w1", "w2").agg(F.count("*").alias("_c12")))
    c1 = c12.groupBy("w1").agg(F.sum("_c12").alias("_c1"))
    vocab = bg.select(F.col("w1").alias("_t")).union(
        bg.select(F.col("w2").alias("_t"))
    )
    v_size = vocab.agg(F.count_distinct("_t").cast("long").alias("_v"))
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v_size))
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum(F.expr("(_c1 + _v) div (_c12 + 1)")).cast("long").alias("surprisal"),
    )


def lexical_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Type-token ratio and hapax fraction per document (lexical-
    diversity quality signals) in exact basis points: one explode +
    two keyed aggregations, no UDFs. Returns (id_col, n_tokens,
    n_types, ttr_bp, hapax_bp)."""
    tok_counts = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_t"))
        .groupBy(id_col, "_t")
        .agg(F.count("*").alias("_c"))
    )
    return (
        tok_counts.groupBy(id_col)
        .agg(
            F.sum("_c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).cast("long").alias("_hapax"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_types",
            F.expr("n_types * 10000 div n_tokens").cast("long").alias("ttr_bp"),
            F.expr("_hapax * 10000 div n_tokens").cast("long").alias("hapax_bp"),
        )
    )


def compression_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """zlib compression-ratio quality signal (RefinedWeb/Dolma use it:
    machine-generated or highly repetitive text compresses far better
    than natural prose). Not SQL-expressible, so the oracle checks
    INVARIANTS the implementation must satisfy for every document:
    0 < comp_len <= n_bytes + 64 (zlib stored-block overhead bound)
    and comp(text+text) < 2*comp(text) (self-repetition must help).

    Arrow-batched mapInPandas — the sanctioned Python path; work is
    per-row and pipelines with the scan at any scale."""
    import pandas as pd  # noqa: F401 (schema side)

    out_schema = (
        f"{id_col} long, n_bytes long, comp_len long, comp2_len long, "
        "bounds_ok boolean, doubling_ok boolean"
    )
    src = df.select(id_col, text_col)

    def batches(it):
        import zlib

        import pandas as pd

        for pdf in it:
            texts = pdf[text_col].astype(str)
            enc = [t.encode("utf-8") for t in texts]
            comp = [len(zlib.compress(b, 6)) for b in enc]
            comp2 = [len(zlib.compress(b + b, 6)) for b in enc]
            n = [len(b) for b in enc]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n,
                    "comp_len": comp,
                    "comp2_len": comp2,
                    "bounds_ok": [0 < c <= nb + 64 for c, nb in zip(comp, n)],
                    "doubling_ok": [c2 < 2 * c for c, c2 in zip(comp, comp2)],
                }
            )

    return src.mapInPandas(batches, schema=out_schema)


def loop_artifact_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    periods: tuple[int, ...] = (1, 2, 3),
    flag_at: int = 6,
) -> DataFrame:
    """Decoder-loop artifact detector: for each period p, the longest
    consecutive token run satisfying tok[i] == tok[i-p] — a generation
    loop of period p shows up as a long run ('the the the' at p=1,
    'a b a b a b' at p=2). Emits (id, run_p{p}..., loop_flag).

    Longest run computed without a struct fold (engine-portable): the
    match flags' ZERO positions (plus sentinels) bound the 1-runs, so
    the answer is the max gap between consecutive zero positions.
    Each intermediate array is a CHAINED PROJECTION column — inlining
    them makes Catalyst re-evaluate the whole chain per lambda element
    (the O(n^3)-per-row trap documented at _let)."""
    d = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    for p in periods:
        m = F.greatest(F.size("_toks") - p, F.lit(0))
        def _match_at(pp):
            # closure factory, NOT a default-arg lambda: a 2-parameter
            # lambda is interpreted as (element, index) by transform
            return lambda i: (
                F.element_at("_toks", i + F.lit(pp)) == F.element_at("_toks", i)
            ).cast("int")

        d = d.withColumn(f"_f{p}", F.transform(F.sequence(F.lit(1), m), _match_at(p)))
        d = d.withColumn(
            f"_z{p}",
            F.concat(
                F.array(F.lit(0)),
                F.filter(
                    F.transform(
                        F.col(f"_f{p}"),
                        lambda f, i: F.when(f == 0, i + 1).otherwise(0),
                    ),
                    lambda z: z > 0,
                ),
                F.array(F.size(f"_f{p}") + 1),
            ),
        )
        def _gap_at(zcol):
            return lambda k: (
                F.element_at(zcol, k + 1) - F.element_at(zcol, k) - 1
            )

        d = d.withColumn(
            f"_g{p}",
            F.transform(
                F.sequence(F.lit(1), F.size(f"_z{p}") - 1), _gap_at(f"_z{p}")
            ),
        )
        d = d.withColumn(
            f"run_p{p}",
            F.when(
                F.coalesce(F.array_max(f"_g{p}"), F.lit(0)) > 0,
                F.array_max(f"_g{p}") + p,
            )
            .otherwise(0)
            .cast("long"),
        )
    out = d.select(
        id_col,
        *[F.col(f"run_p{p}") for p in periods],
        (F.greatest(*[F.col(f"run_p{p}") for p in periods]) >= flag_at).alias(
            "loop_flag"
        ),
    )
    return out
