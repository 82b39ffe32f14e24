"""Byte-pair-encoding tokenizer: distributed training statistics, a
driver-side merge table, and an Arrow-batched distributed apply.

No reference analogue (Thrill's surface ends at classic analytics);
this is the token-counting/tokenization step of an LLM training-data
pipeline as an engine operator.

Scale shape (the standard production split):
- TRAIN reads the corpus once: a distributed word-frequency aggregate,
  capped to the top `top_words` forms (orderBy+limit — a TakeOrdered,
  no full sort). Only the capped (word, count) table reaches the
  driver; merge learning is O(vocab * merges) pure Python on counts,
  never on the corpus.
- APPLY is the hot path and stays fully distributed: the merge table
  broadcasts (a few KB) and tokenization runs as an Arrow-batched
  mapInPandas with a per-task word->pieces memo, so cost is
  O(distinct words) per task, not O(tokens).

Determinism: ties in pair frequency break by lexicographic pair order;
training input is an exact aggregate — the same corpus always yields
the same merge table, which keeps the roundtrip/bounds oracle stable.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from thrill_spark.functions.text import tokens

END = "</w>"
_WS = re.compile(r"\s+")


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 30,
    top_words: int = 20_000,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus word frequencies."""
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    rows = words.orderBy(F.col("c").desc(), F.col("w")).limit(top_words).collect()
    freqs: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r["w"]) + (END,)
        freqs[sym] = freqs.get(sym, 0) + int(r["c"])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in freqs.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best_pair, best_count = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if best_count < 2:
            break
        merges.append(best_pair)
        a, b = best_pair
        new: dict[tuple[str, ...], int] = {}
        for sym, c in freqs.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new[t] = new.get(t, 0) + c
        freqs = new
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encoding of one word (the standard
    GPT-2-style apply loop)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, tokens array<string>) per document. Tokenization
    (lowercase, whitespace split) matches functions.text.tokens so the
    roundtrip invariant is checkable against the JVM-side normalized
    text."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast({p: i for i, p in enumerate(merges)})

    def gen(batches):
        import pandas as pd

        ranks = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, ns, toks_out = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in _WS.split(str(text).lower()) if w]
                toks: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = encode_word(w, ranks)
                        memo[w] = enc
                    toks.extend(enc)
                ids.append(did)
                ns.append(len(toks))
                toks_out.append(toks)
            yield pd.DataFrame({id_col: ids, "n_tokens": ns, "tokens": toks_out})

    return df.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} long, n_tokens long, tokens array<string>"
    )
