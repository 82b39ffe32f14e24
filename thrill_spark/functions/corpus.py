"""Corpus-management operators for training-data pipelines: dataset
splitting, stratified sampling, repetition-based quality scoring,
deterministic global shuffle, and sequence packing.

No reference analogue (SURVEY §2.13 ends at classic analytics) — these
are the dataset-assembly steps between "deduped corpus" and "training
batches". Everything is deterministic (md5-derived hashing, explicit
tie-breaks) so each operator stays DuckDB-oracle-checkable, and every
hot path is JVM-side except the inherently sequential per-shard packing
fold, which is Arrow-batched.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from thrill_spark.functions.text import md5_long

# Hash-space resolution for split thresholds: a doc lands in split s if
# its bucket (md5 mod RESOLUTION) falls in s's cumulative-weight range.
SPLIT_RESOLUTION = 10_000


def split_column(
    id_col: str | Column, weights: dict[str, float], salt: str = "split"
) -> Column:
    """Deterministic train/val/test assignment as a pure expression.

    bucket = md5(salt || id) mod SPLIT_RESOLUTION; the splits carve the
    bucket space by cumulative weight. Hash-based (not row_number-based)
    so the assignment is stable under corpus growth: adding documents
    never reassigns existing ones — the property that keeps eval sets
    uncontaminated across pipeline re-runs. Scales as a map-only column.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = F.pmod(md5_long(F.concat(F.lit(salt), c.cast("string"))), F.lit(SPLIT_RESOLUTION))
    total = sum(weights.values())
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        hi = int(round(acc * SPLIT_RESOLUTION))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr


def assign_splits(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """df + (bucket, split) columns; see split_column."""
    c = F.col(id_col)
    bucket = F.pmod(md5_long(F.concat(F.lit(salt), c.cast("string"))), F.lit(SPLIT_RESOLUTION))
    return df.withColumn("bucket", bucket).withColumn(
        "split", split_column(id_col, weights, salt)
    )


def stratified_sample_exact(
    df: DataFrame,
    strata: Sequence[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exactly n rows per stratum, chosen by deterministic hash order
    (md5(salt || id)) with id tie-break — a reproducible "random" sample
    that any engine can replay.

    One shuffle by strata keys; rank within stratum is a window over
    that partitioning (never a global sort). Strata with fewer than n
    rows return all their rows."""
    from pyspark.sql import Window

    h = md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def _positional_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams WITHOUT distinct-ing — repetition scoring needs the
    multiset (dedup's word_ngrams deliberately dedups for shingle sets)."""
    count = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), count - 1)
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repeated-n-gram quality signals (the C4/Gopher-style filters):
    for n in {2, 3}, the fraction of n-gram occurrences that are
    duplicates of an earlier one (1 - distinct/total). High values mark
    boilerplate/spam. Pure array expressions — map-only, no shuffle."""
    from thrill_spark.functions.text import tokens

    toks = tokens(text_col)
    out = df.select(F.col(id_col), toks.alias("_toks"))
    cols = [F.col(id_col)]
    for n in (2, 3):
        grams = _positional_ngrams(F.col("_toks"), n)
        total = F.size(grams).cast("double")
        distinct = F.size(F.array_distinct(grams)).cast("double")
        cols.append(total.cast("long").alias(f"n_{n}grams"))
        cols.append(
            F.when(total > 0, F.lit(1.0) - distinct / total).otherwise(F.lit(0.0)).alias(
                f"dup_{n}gram_frac"
            )
        )
    return out.select(*cols)


def shuffle_index(
    df: DataFrame, id_col: str = "doc_id", seed: int = 0, name: str = "shuffle_pos"
) -> DataFrame:
    """Deterministic global shuffle for training-example ordering: every
    row gets a permutation position by ranking on md5(seed || id).

    Routed through ordering.with_index (range-partitioned two-phase
    rank), so the 'global sort' is sampled range partitioning + local
    sorts — no single-partition funnel, same discipline as ZipWithIndex."""
    from thrill_spark import ordering as O

    h = md5_long(F.concat(F.lit(f"shuf{seed}:"), F.col(id_col).cast("string")))
    return O.with_index(df, [h, F.col(id_col)], name=name)


def quota_interleave(
    df: DataFrame,
    source_col: str = "source",
    quota: int = 12,
    id_col: str = "doc_id",
    salt: str = "quota",
    name: str = "position",
) -> DataFrame:
    """Training-mix assembly: cap each source at `quota` documents
    (chosen by deterministic hash order within the source) and emit a
    global round-robin reading order that interleaves sources — rank-1
    docs of every source first, then rank-2, ... — so no contiguous
    stretch of the epoch is dominated by one source.

    Shape: one window over the source partitioning (shuffle by source;
    heavy sources are bounded by the quota cut before anything global
    happens), then the global position comes from ordering.with_index's
    range-partitioned two-phase rank — no single-partition funnel.
    Returns (id, source, rank_in_source, `name`)."""
    from pyspark.sql import Window

    from thrill_spark import ordering as O

    h = md5_long(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    kept = (
        df.withColumn("rank_in_source", F.row_number().over(w))
        .filter(F.col("rank_in_source") <= quota)
    )
    return O.with_index(
        kept,
        [F.col("rank_in_source"), F.col(source_col), F.col(id_col)],
        name=name,
    )


def pack_greedy(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Sequence packing: greedy first-fit of documents into bins of at
    most `budget` tokens, processed in id order within each of n_shards
    hash shards. Returns (id, n_tokens, shard, bin).

    Packing is inherently sequential (bin boundaries depend on a
    running fill that RESETS — not a prefix sum), so the sequential part
    is confined to a shard: shard assignment is a hash column, packing
    is one Arrow-batched applyInPandas per shard, and shards are
    independent — parallelism = n_shards regardless of corpus size.
    Pick n_shards >> executors at scale; per-task state is one running
    integer. A document larger than `budget` gets a bin of its own
    (never split). Deterministic: the oracle replays the same fold as a
    recursive CTE."""
    import pandas as pd

    shard = F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_shards)).cast("int")
    tagged = df.select(
        F.col(id_col), F.col(token_col).cast("long").alias("n_tokens")
    ).withColumn("shard", shard)

    def pack(key, pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, fill, b, first = [], 0, 0, True
        for t in pdf["n_tokens"]:
            t = int(t)
            if first:
                fill, first = t, False
            elif fill + t > budget:
                b += 1
                fill = t
            else:
                fill += t
            bins.append(b)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "n_tokens": pdf["n_tokens"],
                "shard": key[0],
                "bin": bins,
            }
        )

    return tagged.groupBy("shard").applyInPandas(
        pack, f"{id_col} long, n_tokens long, shard int, bin long"
    )


def weighted_systematic_sample(
    df: DataFrame,
    weight_col: str,
    n_picks: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted systematic resampling: lay all documents
    on a line of cumulative integer weight, drop `n_picks` equally
    spaced grid points (offset stride//2), and give each doc one pick
    per grid point inside its weight interval — the importance-
    resampling step of a training-mix builder, with multiplicity
    proportional to weight, exactly n_picks total, and zero RNG.

    Integer-exact throughout (grid counting via floor division), so a
    DuckDB window-sum oracle replays it bit-for-bit. The cumulative
    weight comes from ordering.prefix_sum — the two-phase partition-
    offset scan, no single-partition exchange.
    """
    from thrill_spark import ordering as O

    total = df.agg(F.sum(F.col(weight_col)).cast("long")).collect()[0][0]
    if total is None or total < n_picks:
        raise ValueError(f"total weight {total} < n_picks {n_picks}")
    stride = total // n_picks
    off = stride // 2
    cum = O.prefix_sum(
        df.select(F.col(id_col), F.col(weight_col).cast("long").alias("_w")),
        [id_col],
        "_w",
        name="_cum0",
        exclusive=True,
    )
    # picks in [cum0, cum0+w) = g(end-1-off) - g(start-1-off) with
    # g(x) = (x + stride) DIV stride - 1  (= floor(x/stride), valid for
    # x >= -stride; integer DIV truncates toward zero only hits
    # non-negative operands here)
    g_end = f"CAST((_cum0 + _w - 1 - {off} + {stride}) DIV {stride} AS BIGINT) - 1"
    g_start = f"CAST((_cum0 - 1 - {off} + {stride}) DIV {stride} AS BIGINT) - 1"
    return cum.select(
        F.col(id_col),
        F.col("_w").alias("weight"),
        F.expr(f"({g_end}) - ({g_start})").alias("n_picks"),
    )


def temperature_mix_quotas(
    df: DataFrame,
    group_col: str = "source",
    budget: int = 100_000,
    alpha_sqrt: bool = True,
) -> DataFrame:
    """Temperature-scaled sampling quotas per corpus domain.

    The multilingual/multi-domain mixing rule (mBERT, XLM-R, T5 all
    use it): raw domain shares p_s = c_s / N are flattened to
    p_s^alpha / sum p^alpha so small domains are not drowned out.
    alpha = 0.5 here (sqrt — IEEE-exact-rounded, so both engines
    produce the identical double); quota_s = floor(budget * w_s / W).

    Determinism: W folds over the per-domain weights in domain-name
    order (sort_array of (group, w) structs + sequential left fold),
    the functions/similarity.py contract DuckDB's ordered-list
    list_reduce replays bit-for-bit. The domain table is tiny (it IS
    the distinct domain set), so the fold input is one scalar row and
    the quota assignment is a broadcast join — nothing here scales
    with corpus size except the one counting pass.

    Returns (group_col, n_docs, quota).
    """
    counts = df.groupBy(group_col).agg(F.count("*").cast("long").alias("n_docs"))
    w = F.sqrt(F.col("n_docs").cast("double")) if alpha_sqrt else F.col(
        "n_docs"
    ).cast("double")
    weighted = counts.select(F.col(group_col), F.col("n_docs"), w.alias("_w"))
    total = weighted.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col(group_col).alias("g"), F.col("_w").alias("w")))),
            F.lit(0.0),
            lambda acc, s: acc + s["w"],
        ).alias("_total")
    )
    return weighted.crossJoin(F.broadcast(total)).select(
        F.col(group_col),
        F.col("n_docs"),
        F.floor(F.lit(float(budget)) * F.col("_w") / F.col("_total"))
        .cast("long")
        .alias("quota"),
    )


def dsir_affinity_select(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 100,
    scale: int = 100_000,
) -> DataFrame:
    """Domain-targeted data selection (DSIR shape, Xie et al. 2023):
    score every document by how much its unigram distribution leans
    toward a TARGET subset of the corpus, keep the top_k.

    Integer-exact proxy for the importance weight: per token t,
    w(t) = count_target(t) * scale div count_corpus(t) (a likelihood
    ratio in fixed-point; 0 for tokens absent from the target), and
    doc score = mean token weight in fixed-point
    (sum(w) * 1000 div n_tokens). Deterministic top-k by
    (score desc, id).

    Scale: two vocabulary-sized aggregations + one broadcast-friendly
    term join against the token stream; the target table is a filter
    of the same scan, no second pass over raw text.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    tok_rows = df.select(
        F.col(id_col), target_pred.alias("_is_tgt"), F.explode(toks).alias("_t")
    )
    vocab = tok_rows.groupBy("_t").agg(
        F.count("*").cast("long").alias("_corpus_cnt"),
        F.count_if(F.col("_is_tgt")).cast("long").alias("_tgt_cnt"),
    )
    per_doc = (
        tok_rows.join(F.broadcast(vocab), "_t")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.expr(f"_tgt_cnt * {scale} div _corpus_cnt")
            ).cast("long").alias("_wsum"),
            F.count("*").cast("long").alias("_ntok"),
        )
        .select(
            id_col,
            F.expr("_wsum * 1000 div _ntok").cast("long").alias("affinity"),
        )
    )
    return per_doc.orderBy(F.desc("affinity"), F.asc(id_col)).limit(top_k)


def sft_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_prompt_words: int = 8,
    min_completion_words: int = 8,
) -> DataFrame:
    """Instruction-tuning pair construction: split each document at its
    middle sentence boundary into (prompt, completion), drop pairs
    where either side is under the word floor, and dedup by prompt
    hash (identical prompts with different completions are label
    noise — keep the lowest doc_id deterministically).

    The split rule is deterministic (the '.' closest to the character
    midpoint, found via array positions — no regex lookahead), so the
    whole derivation is SQL-replicable. One scan + one groupBy on the
    prompt hash: linear.
    """
    n = F.length(F.col(text_col))
    # candidate split points: positions of '.' (1-based) in the text
    dots = F.filter(
        F.transform(
            F.split(F.col(text_col), ""),
            lambda ch, i: F.when(ch == ".", i + 1).otherwise(F.lit(0)),
        ),
        lambda p: p > 0,
    )
    # the dot nearest the char midpoint; 0 when the doc has no dot
    mid = n - F.pmod(n, F.lit(2))
    best_dot = F.aggregate(
        dots,
        F.lit(0).cast("long"),
        lambda acc, p: F.when(
            (acc == 0)
            | (F.abs(p.cast("long") * 2 - mid) < F.abs(acc * 2 - mid)),
            p.cast("long"),
        ).otherwise(acc),
    )
    d = df.select(
        F.col(id_col),
        F.col(text_col).alias("_txt"),
        best_dot.alias("_sp"),
    ).filter(F.col("_sp") > 0)
    d = d.select(
        id_col,
        F.trim(F.expr("substring(_txt, 1, _sp)")).alias("prompt"),
        F.trim(F.expr("substring(_txt, _sp + 1)")).alias("completion"),
    )
    wc = lambda c: F.size(  # noqa: E731
        F.filter(F.split(F.col(c), r"\s+"), lambda t: t != "")
    )
    d = d.filter(
        (wc("prompt") >= min_prompt_words) & (wc("completion") >= min_completion_words)
    )
    d = d.withColumn("prompt_hash", F.md5("prompt"))
    from pyspark.sql import Window

    w = Window.partitionBy("prompt_hash").orderBy(id_col)
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "prompt", "completion", "prompt_hash")
    )
