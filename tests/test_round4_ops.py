"""Round-4 operator tests with planted ground truth: bloom duplicate
detection, containment pairs, segment boilerplate, unigram rarity,
quota interleave, BPE tokenizer, and the exact k-NN join."""

import pytest
from pyspark.sql import functions as F

from thrill_spark.functions import bpe as BP
from thrill_spark.functions import corpus as C
from thrill_spark.functions import dedup as D
from thrill_spark.functions import similarity as S
from thrill_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = base.replace("today", "tonight")
    other = "completely different content about spark engines and distributed query processing"
    rows = [(0, base), (1, near), (2, other), (3, base), (4, other)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# --- bloom duplicate detection --------------------------------------------


def test_bloom_prefilter_equals_exact_dedup(docs):
    got = {
        (r["fp"], r["doc_id"], r["n_copies"])
        for r in D.bloom_prefilter_dedup(docs).collect()
    }
    want = {
        (r["fp"], r["doc_id"], r["n_copies"])
        for r in D.exact_dedup(docs).filter(F.col("n_copies") >= 2).collect()
    }
    assert got == want and len(want) == 2  # (0,3) and (2,4) groups


def test_bloom_candidates_superset_and_prune(spark):
    # 100 unique docs + 2 planted dup groups: candidates must contain
    # every true dup and, at this bits/corpus ratio, prune most uniques.
    rows = [(i, f"unique document number {i} with filler words {i * 7}") for i in range(100)]
    rows += [(100, "dup group alpha"), (101, "dup group alpha")]
    rows += [(102, "dup group beta"), (103, "dup group beta")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cand_ids = {r["doc_id"] for r in D.bloom_dup_candidates(df).collect()}
    assert {100, 101, 102, 103} <= cand_ids
    assert len(cand_ids) < 30  # pruning actually happened


# --- containment ----------------------------------------------------------


def test_containment_short_in_long(spark):
    short = "alpha beta gamma delta epsilon zeta"
    long_doc = short + " plus a very long tail of additional words " * 5
    rows = [(0, short), (1, long_doc), (2, "totally unrelated words here only")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["id_a"], r["id_b"]): r for r in D.containment_pairs(df, threshold=0.9).collect()}
    assert (0, 1) in out
    r = out[(0, 1)]
    assert r["containment_a"] == 1.0  # short fully contained in long
    assert r["containment_b"] < 0.5
    assert (0, 2) not in out and (1, 2) not in out


# --- segment boilerplate --------------------------------------------------


def test_segment_boilerplate_planted(spark):
    bp = " ".join(f"b{i}" for i in range(16))  # shared 16-token block
    u1 = " ".join(f"x{i}" for i in range(16))
    u2 = " ".join(f"y{i}" for i in range(16))
    rows = [(0, bp + " " + u1), (1, bp + " " + u2), (2, u2 + " extra tail")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in TX.segment_boilerplate(df, seg_words=16).collect()}
    # bp is shared by docs 0/1; u2 is shared by docs 1/2.
    assert out[0]["n_segs"] == 2 and out[0]["n_bp"] == 1
    assert out[1]["n_segs"] == 2 and out[1]["n_bp"] == 2  # both blocks repeated
    assert out[2]["n_segs"] == 2 and out[2]["n_bp"] == 1
    import hashlib

    assert out[0]["clean_fp"] == hashlib.md5(u1.encode()).hexdigest()
    assert out[1]["clean_fp"] == hashlib.md5(b"").hexdigest()  # fully boilerplate
    assert out[2]["clean_fp"] == hashlib.md5(b"extra tail").hexdigest()


# --- unigram rarity -------------------------------------------------------


def test_unigram_rarity_orders_docs(spark):
    rows = [(0, "common common common common"), (1, "common rareword")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in TX.unigram_rarity(df).collect()}
    # total=6 tokens; 'common' c=5 -> w=1, 'rareword' c=1 -> w=6
    assert out[0]["n_tokens"] == 4 and out[0]["rarity"] == 4
    assert out[1]["n_tokens"] == 2 and out[1]["rarity"] == 7


# --- quota interleave -----------------------------------------------------


def test_quota_interleave_round_robin(spark):
    rows = [(i, f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = C.quota_interleave(df, quota=4).orderBy("position").collect()
    assert len(out) == 12  # 3 sources x quota 4
    # positions are a dense 0..n-1 permutation, rank-major then source
    assert [r["position"] for r in out] == list(range(12))
    ranks = [r["rank_in_source"] for r in out]
    assert ranks == sorted(ranks)  # rank-1 block first, then rank-2, ...
    for blk in range(4):
        assert {r["source"] for r in out[blk * 3 : blk * 3 + 3]} == {"s0", "s1", "s2"}
    assert max(ranks) == 4


# --- BPE ------------------------------------------------------------------


def test_bpe_train_and_encode_roundtrip():
    ranks = {p: i for i, p in enumerate([("a", "b"), ("ab", "</w>")])}
    assert BP.encode_word("ab", ranks) == ["ab</w>"]
    assert BP.encode_word("ba", ranks) == ["b", "a", "</w>"]


def test_bpe_tokenize_distributed(docs):
    merges = BP.train_bpe(docs, n_merges=10)
    assert len(merges) > 0
    out = BP.bpe_tokenize(docs, merges).collect()
    norm = {
        r["doc_id"]: r["_n"]
        for r in docs.select("doc_id", F.concat_ws(" ", TX.tokens("text")).alias("_n")).collect()
    }
    for r in out:
        detok = "".join(r["tokens"]).replace(BP.END, " ").strip()
        assert detok == norm[r["doc_id"]]
        assert r["n_tokens"] == len(r["tokens"])


def test_bpe_merges_compress(docs):
    merges = BP.train_bpe(docs, n_merges=20)
    with_m = sum(r["n_tokens"] for r in BP.bpe_tokenize(docs, merges).collect())
    without = sum(r["n_tokens"] for r in BP.bpe_tokenize(docs, []).collect())
    assert with_m < without


# --- knn join -------------------------------------------------------------


def test_knn_join_matches_brute_force(spark):
    import math
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    probes = df.filter(F.col("vec_id") < 10)
    # force a multi-block grid to exercise the block-local top-k merge
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.knn_join(probes, df, k=3, block_rows=16).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    vecs = dict(rows)
    for q in range(10):
        scored = sorted(
            ((-cos(vecs[q], vecs[j]), j) for j in vecs if j != q),
        )
        for rk in range(3):
            assert got[(q, rk + 1)] == scored[rk][1]


# --- heavy hitters --------------------------------------------------------


def test_heavy_hitters_planted_skew(spark):
    from thrill_spark.functions.sketches import heavy_hitters

    # 'hot' = 40% of tokens; everything else unique -> only 'hot' heavy.
    rows = [(i, "hot " * 4 + f"u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["token"]: r["n"] for r in heavy_hitters(df, k=8).collect()}
    assert out == {"hot": 200}


def test_heavy_hitters_matches_exact_threshold(spark, sf_dir):
    from collections import Counter

    from thrill_spark.catalog import load_table
    from thrill_spark.functions import text as TX
    from thrill_spark.functions.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    got = {r["token"]: r["n"] for r in heavy_hitters(docs, k=64).collect()}
    toks = [
        t
        for r in docs.select(F.explode(TX.tokens("text")).alias("t")).collect()
        for t in [r["t"]]
    ]
    c = Counter(toks)
    want = {t: n for t, n in c.items() if n * 64 > len(toks)}
    assert got == want and len(want) > 0


def test_mg_summary_superset_property():
    from thrill_spark.functions.sketches import _mg_summarize

    stream = ["a"] * 30 + ["b"] * 10 + [f"x{i}" for i in range(60)]
    counters, n = _mg_summarize(iter(stream), k=8)
    assert n == 100
    assert "a" in counters  # 30 > 100/8 -> must survive any order


# ---------------------------------------------------------------------------
# round-4 additions: CDC chunking + PQ encode
# ---------------------------------------------------------------------------
def test_cdc_chunks_content_anchored(spark):
    """The CDC property: prepending text to a document shifts chunk
    POSITIONS but leaves the suffix chunk CONTENT (hashes) intact —
    fixed-size chunking would change every downstream chunk."""
    from thrill_spark.functions.dedup import cdc_chunks

    base = " ".join(f"w{i * 7919 % 997}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, base), (2, "zzz qqq xxx " + base)], ["doc_id", "text"]
    )
    ch = cdc_chunks(docs).collect()
    h1 = {r["chunk_hash"] for r in ch if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in ch if r["doc_id"] == 2}
    # all but the first boundary-straddling chunks of doc1 survive in doc2
    assert len(h1 & h2) >= len(h1) - 2
    assert len(h1) >= 5  # divisor 16 over 200 words: many chunks


def test_cdc_chunks_cover_document(spark):
    """Chunks partition the token stream: token counts sum to the doc
    total and chunk_no is dense from 1."""
    from thrill_spark.functions.dedup import cdc_chunks

    text = " ".join(f"t{i % 13}x{i % 7}" for i in range(150))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(cdc_chunks(docs).collect(), key=lambda r: r["chunk_no"])
    assert [r["chunk_no"] for r in rows] == list(range(1, len(rows) + 1))
    assert sum(r["n_tokens"] for r in rows) == 150


def test_cdc_short_doc_single_chunk(spark):
    from thrill_spark.functions.dedup import cdc_chunks

    docs = spark.createDataFrame([(1, "a b"), (2, "only")], ["doc_id", "text"])
    rows = cdc_chunks(docs).collect()
    assert sorted((r["doc_id"], r["chunk_no"]) for r in rows) == [(1, 1), (2, 1)]


def test_cdc_dup_report_empty_doc_zero_share(spark):
    """An empty/whitespace-only document yields one empty chunk with
    total_tokens=0; the report must give dup_bp=0 rather than raise
    DIVIDE_BY_ZERO under ANSI mode."""
    from thrill_spark.functions.dedup import cdc_dup_report

    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c a b c"), (3, "   "), (4, "")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in cdc_dup_report(docs).collect()}
    assert rows[3]["total_tokens"] == 0 and rows[3]["dup_bp"] == 0
    assert rows[4]["total_tokens"] == 0 and rows[4]["dup_bp"] == 0
    assert rows[1]["dup_bp"] == 10000  # fully duplicated across docs 1/2


def test_pq_encode_shapes_and_determinism(spark):
    from thrill_spark.functions.similarity import pq_encode, pq_train_codebooks

    rows = [(i, [float((i * j) % 7 - 3) for j in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = pq_train_codebooks(df, m=2, ksub=4, iters=1)
    assert len(books) == 2 and len(books[0]) == 4 and len(books[0][0]) == 4
    enc = pq_encode(df, books)
    assert enc.columns == ["vec_id", "code_0", "code_1"]
    got = {r["vec_id"]: (r["code_0"], r["code_1"]) for r in enc.collect()}
    again = {r["vec_id"]: (r["code_0"], r["code_1"]) for r in pq_encode(df, books).collect()}
    assert got == again
    assert all(0 <= c < 4 for v in got.values() for c in v)


def test_er_blocking_and_resolution(spark):
    """block_candidates never crosses blocks; score_pairs is additive;
    resolve_entities groups matched pairs into entities by min rid."""
    from pyspark.sql import functions as F

    from thrill_spark.functions import linkage as L

    recs = spark.createDataFrame(
        [
            (1, "alice smith", "NY"),
            (2, "alice smyth", "NY"),
            (3, "bob jones", "NY"),
            (4, "alice smith", "CA"),
        ],
        ["rid", "name", "state"],
    )
    cand = L.block_candidates(recs, ["state"], id_col="rid")
    pairs = {(r["a_rid"], r["b_rid"]) for r in cand.collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3)}  # CA block has one record
    scored = L.score_pairs(
        cand,
        [
            (F.levenshtein("a_name", "b_name") <= 2, 50),
            (F.col("a_state") == F.col("b_state"), 10),
        ],
    )
    got = {(r["a_rid"], r["b_rid"]): r["score"] for r in scored.collect()}
    assert got[(1, 2)] == 60 and got[(1, 3)] == 10
    ents = L.resolve_entities(
        scored.filter(F.col("score") >= 60).select("a_rid", "b_rid")
    )
    e = {r["rid"]: r["entity_id"] for r in ents.collect()}
    assert e == {1: 1, 2: 1}


def test_er_blocking_null_keys_never_match(spark):
    """SQL equi-join semantics: a NULL blocking key matches nothing —
    NULL-keyed records must not block with each other nor with
    genuinely-empty keys (concat_ws alone would map both to '')."""
    from thrill_spark.functions import linkage as L

    recs = spark.createDataFrame(
        [(1, None), (2, None), (3, ""), (4, ""), (5, "NY")],
        ["rid", "state"],
    )
    cand = L.block_candidates(recs, ["state"], id_col="rid")
    pairs = {(r["a_rid"], r["b_rid"]) for r in cand.collect()}
    assert pairs == {(3, 4)}  # only the genuinely-empty keys block together


def test_loop_artifacts_planted(spark):
    from thrill_spark.functions.text import loop_artifact_report

    docs = spark.createDataFrame(
        [
            (1, "normal text with no repeats at all here"),
            (2, "start the the the the the the end"),          # p1 run of 7
            (3, "x a b a b a b a b y"),                        # p2 run of 8
            (4, "q w e q w e q w e done"),                     # p3 run of 9
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in loop_artifact_report(docs).collect()}
    assert out[1]["run_p1"] == 0 and not out[1]["loop_flag"]
    assert out[2]["run_p1"] == 6  # 6 'the' tokens in a row
    assert out[2]["loop_flag"]
    assert out[3]["run_p2"] == 8 and out[3]["loop_flag"]
    assert out[4]["run_p3"] == 9 and out[4]["loop_flag"]
