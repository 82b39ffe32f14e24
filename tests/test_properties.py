"""Property-based tests (hypothesis) for the custom operators whose
semantics are easy to get subtly wrong: bounded bucket self-join
(pair-set equivalence vs the plain join under arbitrary bucket shapes
and caps) and greedy packing (exact equality with an independent
reference fold). Deterministic data profiles keep each example to one
small Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from thrill_spark.functions.corpus import pack_greedy
from thrill_spark.operators.skew import bounded_self_join

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    buckets=st.lists(
        st.integers(min_value=0, max_value=4), min_size=1, max_size=40
    ),
    cap=st.integers(min_value=1, max_value=10),
)
@_settings
def test_bounded_self_join_equals_plain_join(spark, buckets, cap):
    """Every ordered pair sharing a bucket appears exactly once, no
    matter how degenerate the bucket distribution or how small the cap."""
    rows = [(i, b) for i, b in enumerate(buckets)]
    df = spark.createDataFrame(rows, ["rid", "bucket"])
    got = {
        (r["l"], r["r"])
        for r in bounded_self_join(
            df, ["bucket"], salt_on="rid",
            left_cols={"l": "rid"}, right_cols={"r": "rid"}, cap=cap,
        ).collect()
    }
    expect = {
        (i, j)
        for i, bi in enumerate(buckets)
        for j, bj in enumerate(buckets)
        if bi == bj
    }
    assert got == expect


@given(
    tokens=st.lists(
        st.integers(min_value=0, max_value=150), min_size=1, max_size=60
    ),
    budget=st.integers(min_value=1, max_value=120),
)
@_settings
def test_pack_greedy_matches_reference_fold(spark, tokens, budget):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], ["doc_id", "n_tok"]
    )
    out = pack_greedy(df, "n_tok", budget=budget, n_shards=3)
    got = {(r["doc_id"]): (r["shard"], r["bin"]) for r in out.collect()}
    # reference fold per shard, same shard hash as the operator
    shards = {
        r["doc_id"]: r["shard"]
        for r in df.select(
            "doc_id",
            F.pmod(
                F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
                .cast("long"),
                F.lit(3),
            ).cast("int").alias("shard"),
        ).collect()
    }
    expect = {}
    for s in set(shards.values()):
        members = sorted(i for i in range(len(tokens)) if shards[i] == s)
        fill, b, first = 0, 0, True
        for i in members:
            t = tokens[i]
            if first:
                fill, first = t, False
            elif fill + t > budget:
                b, fill = b + 1, t
            else:
                fill += t
            expect[i] = (s, b)
    assert got == expect


@given(
    weights=st.lists(st.integers(min_value=1, max_value=500), min_size=2, max_size=30),
    m=st.integers(min_value=1, max_value=20),
)
@_settings
def test_weighted_sample_exact_total_and_proportionality(spark, weights, m):
    """Sum of picks == m exactly; each doc's picks within 1 of its
    ideal share w/stride (systematic sampling's defining bound)."""
    from thrill_spark.functions.corpus import weighted_systematic_sample

    total = sum(weights)
    if total < m:
        return
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = weighted_systematic_sample(df, "w", m).collect()
    stride = total // m
    assert sum(r["n_picks"] for r in out) >= m  # grid points all land
    picks = {r["doc_id"]: r["n_picks"] for r in out}
    for i, w in enumerate(weights):
        ideal = w / stride
        assert picks[i] <= ideal + 1
        assert picks[i] >= max(0, int(ideal) - 1)


@given(
    n_words=st.integers(min_value=0, max_value=60),
    chunk=st.integers(min_value=2, max_value=16),
    stride_off=st.integers(min_value=0, max_value=14),
)
@_settings
def test_chunk_windows_cover_every_token(spark, n_words, chunk, stride_off):
    """Every token position is inside >=1 chunk; consecutive chunks
    overlap by exactly chunk-stride while both are full."""
    from thrill_spark.functions.text import chunk_token_windows

    stride = min(chunk, 1 + stride_off)
    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = sorted(
        (r["chunk_id"], r["n_toks"]) for r in chunk_token_windows(df, chunk, stride).collect()
    )
    covered = set()
    for cid, ntoks in rows:
        covered.update(range(cid * stride, cid * stride + ntoks))
    assert covered == set(range(n_words)) or (n_words == 0 and rows == [(0, 0)])
    # chunk ids are dense from 0
    assert [cid for cid, _ in rows] == list(range(len(rows)))


@given(
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),  # left start day
            st.integers(min_value=0, max_value=20),  # left duration
        ),
        min_size=1,
        max_size=10,
    ),
    rspans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=10,
    ),
    bin_days=st.integers(min_value=1, max_value=14),
)
@_settings
def test_interval_overlap_join_equals_theta_join(spark, spans, rspans, bin_days):
    """The bin-explode rewrite must emit EXACTLY the overlapping pairs,
    each once, for any interval shapes and any bin width."""
    from datetime import datetime, timedelta

    from thrill_spark.operators.join import interval_overlap_join

    epoch = datetime(2020, 1, 1)

    def mk(rows):
        return [
            (i, epoch + timedelta(days=s), epoch + timedelta(days=s + d))
            for i, (s, d) in enumerate(rows)
        ]

    L = spark.createDataFrame(mk(spans), ["lid", "ls", "le"])
    R = spark.createDataFrame(mk(rspans), ["rid", "rs", "re"])
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            L, R, "ls", "le", "rs", "re", bin_days=bin_days
        ).collect()
    )
    expect = sorted(
        (i, j)
        for i, (s1, d1) in enumerate(spans)
        for j, (s2, d2) in enumerate(rspans)
        if s1 <= s2 + d2 and s2 <= s1 + d1
    )
    assert got == expect


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(min_value=2, max_value=4),
)
@_settings
def test_ngram_cover_equals_reference_fold(spark, docs, n):
    """duplicated_ngram_cover must mark exactly the positions covered by
    a corpus-duplicated n-gram, per an independent python reference."""
    from collections import Counter

    from thrill_spark.functions.dedup import duplicated_ngram_cover

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in duplicated_ngram_cover(df, n=n).collect()}
    # reference
    grams = Counter()
    for toks in docs:
        for i in range(len(toks) - n + 1):
            grams[tuple(toks[i : i + n])] += 1
    for doc_id, toks in enumerate(docs):
        if len(toks) < n:
            assert doc_id not in out
            continue
        covered = set()
        for i in range(len(toks) - n + 1):
            if grams[tuple(toks[i : i + n])] > 1:
                covered.update(range(i, i + n))
        r = out[doc_id]
        assert r.n_tokens == len(toks)
        assert r.n_dup_tokens == len(covered)
