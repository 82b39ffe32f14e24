"""FM-index backward search vs brute-force overlapping counts.

The DuckDB oracle for suffix_fm_count_doc0 is a replace-based scan
that is only exact for border-free patterns; this suite certifies the
index on the cases that oracle cannot express — bordered patterns with
OVERLAPPING occurrences ('ana' in 'banana', 'aa' in 'aaaaa') — plus
whole-string, single-char, absent, and longer-than-text patterns.
"""

from __future__ import annotations

import pytest

from thrill_spark.plans.queries_analytics import fm_backward_count


def _brute_overlapping(text: str, pat: str) -> int:
    return sum(
        1
        for i in range(len(text) - len(pat) + 1)
        if text[i : i + len(pat)] == pat
    )


@pytest.mark.parametrize(
    "text,patterns",
    [
        ("banana", ("ana", "na", "ban", "a", "banana", "xyz", "nab")),
        ("aaaaa", ("aa", "aaa", "a", "b")),
        ("abracadabra", ("abra", "ra", "cad", "abracadabra", "abracadabrax")),
    ],
)
def test_fm_matches_bruteforce(spark, text, patterns):
    df = spark.createDataFrame([(text,)], "_s string")
    got = dict(fm_backward_count(spark, df, patterns))
    want = {p: _brute_overlapping(text, p) for p in patterns}
    assert got == want


def test_border_guard_is_query_scoped(monkeypatch):
    """A bordered pattern in _FM_PATTERNS must fail q_fm_count alone —
    never the registry import (ADVICE r7: the guard used to raise at
    module import, where one bad pattern broke all 298 queries)."""
    import thrill_spark.plans.queries_analytics as QA

    assert all(not QA._has_border(p) for p in QA._FM_PATTERNS)
    assert QA._has_border("ana") and QA._has_border("aa")
    assert not QA._has_border("sort")

    monkeypatch.setattr(QA, "_FM_PATTERNS", ("sort", "ana"))
    with pytest.raises(ValueError, match="border"):
        QA.q_fm_count(None, "/nonexistent")


def test_fm_locate_matches_bruteforce(spark):
    """fm_backward_ranges + an SA range-join must emit exactly the
    brute-force occurrence positions — including OVERLAPPING matches
    of bordered patterns, which the count oracle cannot express."""
    from pyspark.sql import functions as F

    from thrill_spark.plans.algorithms import chunked_chars
    from thrill_spark.plans.queries_analytics import (
        _FM_SENTINEL,
        fm_backward_ranges,
    )

    text, patterns = "banana", ("ana", "na", "a", "xyz", "banana")
    df = spark.createDataFrame([(text + _FM_SENTINEL,)], "_s string")
    chars = chunked_chars(df, text_col="_s", chunk=4)
    ranges, ranked = fm_backward_ranges(spark, chars, len(text) + 1, patterns)
    rdf = spark.createDataFrame(
        [(p, lo, hi) for p, (lo, hi) in ranges.items() if hi > lo],
        "pattern string, _lo long, _hi long",
    )
    got = sorted(
        (r["pattern"], r["pos"])
        for r in ranked.join(
            F.broadcast(rdf),
            (F.col("rank") >= F.col("_lo")) & (F.col("rank") < F.col("_hi")),
        ).select("pattern", "pos").collect()
    )
    want = sorted(
        (p, i)
        for p in patterns
        for i in range(len(text) - len(p) + 1)
        if text[i : i + len(p)] == p
    )
    assert got == want


def test_fm_multiblock_rank_samples(spark):
    """Texts longer than _FM_RANK_BLOCK exercise the block-sampled
    rank probes (cum checkpoint + partial block scan) on blocks > 0 —
    doc0 in the fixtures is shorter than one block, so the oracle
    queries alone never leave block 0. Deterministic pseudo-random
    text, brute-force overlapping counts as truth."""
    import random

    from thrill_spark.plans.queries_analytics import _FM_RANK_BLOCK

    rng = random.Random(13)
    text = "".join(rng.choice("abcd ") for _ in range(3 * _FM_RANK_BLOCK + 137))
    patterns = ("ab", "cd", "a b", "dcba", "abcd", " ", "zzz")
    df = spark.createDataFrame([(text,)], "_s string")
    got = dict(fm_backward_count(spark, df, patterns))
    want = {p: _brute_overlapping(text, p) for p in patterns}
    assert got == want


def test_fm_build_index_memo_and_force(spark, tmp_path, monkeypatch):
    """fm_build_index memoizes per (sf_dir, step) scratch path —
    count/locate reuse the materialized parquet — while force=True
    always rebuilds (suffix_fm_build bears the full ladder cost)."""
    import os

    import thrill_spark.plans.queries_analytics as QA

    sf = "/root/testdata/sf0.001"
    QA._FM_INDEX_CACHE.clear()
    p1, n1, ctab, cum = QA.fm_build_index(spark, sf)
    assert os.path.exists(os.path.join(p1, "_SUCCESS"))
    mtime = os.path.getmtime(os.path.join(p1, "_SUCCESS"))
    # memo hit: no rebuild, same metadata objects
    p2, n2, ctab2, _ = QA.fm_build_index(spark, sf)
    assert p2 == p1 and n2 == n1 and ctab2 is ctab
    assert os.path.getmtime(os.path.join(p1, "_SUCCESS")) == mtime
    # force: rebuild in place (fresh _SUCCESS)
    p3, n3, _, _ = QA.fm_build_index(spark, sf, force=True)
    assert p3 == p1 and n3 == n1
    assert os.path.getmtime(os.path.join(p1, "_SUCCESS")) >= mtime
    # sanity: C-table intervals tile [1, n1) above the sentinel row
    nblocks = (n1 + QA._FM_RANK_BLOCK - 1) // QA._FM_RANK_BLOCK
    total = sum(cum[(ch, nblocks)] for ch in ctab)
    assert total == n1


def test_fm_frame_search_matches_driver_search(spark):
    """The set-scale DataFrame backward search must agree with the
    driver search on every pattern class: bordered/overlapping,
    absent with present prefixes, absent CHARS (insertion-point
    collapse mid-pattern), single char, whole string, longer than
    text, and mixed lengths in ONE probe set (the per-step inactive
    path)."""
    from pyspark.sql import functions as F

    from thrill_spark.plans.algorithms import chunked_chars
    from thrill_spark.plans.queries_analytics import (
        _FM_SENTINEL,
        _fm_backward_search_frame,
        _fm_cum_df,
        _fm_materialize,
        fm_backward_ranges,
    )
    from thrill_spark.catalog import scratch_dir

    text = "abracadabra banana abracadabra"
    patterns = (
        "abra", "ana", "a", "q", "zz", "bax", "cad", " b",
        text, text + "x", "ra a",
    )
    df = spark.createDataFrame([(text + _FM_SENTINEL,)], "_s string")
    n1 = len(text) + 1
    chars = chunked_chars(df, text_col="_s", chunk=7)
    want, _ = fm_backward_ranges(spark, chars, n1, patterns)

    base = scratch_dir(spark, "fm_frame_prop")
    chars2 = chunked_chars(df, text_col="_s", chunk=7)
    ctab, _cum = _fm_materialize(spark, base, chars2, n1, step=8)
    idx_df = spark.read.parquet(base + "/idx")
    probes = spark.createDataFrame([(p,) for p in patterns], "pat string")
    got_df = _fm_backward_search_frame(
        idx_df, _fm_cum_df(spark, base + "/idx"), ctab, n1, probes
    )
    got = {r["pat"]: (r["lo"], r["hi"]) for r in got_df.collect()}
    assert got == want

    # the hits helper agrees with a direct rank-range scan
    from thrill_spark.plans.queries_analytics import _fm_hits_blocks

    hits = sorted(
        (r["pat"], r["pos"])
        for r in _fm_hits_blocks(idx_df, got_df).collect()
    )
    brute = sorted(
        (p, i)
        for p in patterns
        for i in range(len(text) - len(p) + 1)
        if text[i : i + len(p)] == p
    )
    assert hits == brute


def test_fm_frame_search_fuzz_multiblock(spark):
    """Seeded fuzz over a multi-block text: 200 random patterns (many
    absent, some with absent CHARS, lengths 1-12, plus boundary-rank
    landings by volume) through the DataFrame backward search vs
    ground truth enumerated from the sorted suffix list. Exercises
    the batched checkpoint+partial probes at a probe count 3x the
    decontaminate sweep and on blocks > 0."""
    import random

    from thrill_spark.catalog import scratch_dir
    from thrill_spark.plans.algorithms import chunked_chars
    from thrill_spark.plans.queries_analytics import (
        _FM_RANK_BLOCK,
        _FM_SENTINEL,
        _fm_backward_search_frame,
        _fm_cum_df,
        _fm_materialize,
    )

    rng = random.Random(41)
    text = "".join(rng.choice("abc ") for _ in range(2 * _FM_RANK_BLOCK + 53))
    pats = set()
    while len(pats) < 200:
        k = rng.randint(1, 12)
        # half sampled from the text (present-ish), half random (with
        # chars outside the alphabet at ~10%)
        if rng.random() < 0.5 and k < len(text):
            i = rng.randrange(len(text) - k)
            pats.add(text[i : i + k])
        else:
            pats.add(
                "".join(rng.choice("abcdz ") for _ in range(k))
            )
    patterns = sorted(pats)

    n1 = len(text) + 1
    df = spark.createDataFrame([(text + _FM_SENTINEL,)], "_s string")
    base = scratch_dir(spark, "fm_frame_fuzz")
    ctab, _ = _fm_materialize(
        spark, base, chunked_chars(df, text_col="_s", chunk=257), n1, step=8
    )
    idx_df = spark.read.parquet(base + "/idx")
    probes = spark.createDataFrame([(p,) for p in patterns], "pat string")
    got = {
        r["pat"]: (r["lo"], r["hi"])
        for r in _fm_backward_search_frame(
            idx_df, _fm_cum_df(spark, base + "/idx"), ctab, n1, probes
        ).collect()
    }
    suffixes = sorted(text[i:] + _FM_SENTINEL for i in range(n1))
    for p in patterns:
        lo = sum(1 for s in suffixes if s < p)
        n = sum(1 for s in suffixes if s.startswith(p))
        assert got[p] == (lo, lo + n), (p, got[p], (lo, lo + n))


def test_fm_distributed_gate_no_driver_rollup(spark, monkeypatch):
    """Past the checkpoint gate (forced here) the builders must return
    cum=None and NEVER call the driver rollup — the cum parquet is the
    only checkpoint store — and the gated corpus query output must
    hash-match the driver-dict output (VERDICT r13 #3)."""
    import thrill_spark.plans.queries_analytics as QA

    sf = "/root/testdata/sf0.001"
    QA._FM_INDEX_CACHE.clear()
    _, _, _, cum_a = QA.fm_build_index(spark, sf)
    assert cum_a is not None  # sf0.001 fits the driver gate
    baseline = {
        tuple(sorted(r.asDict().items()))
        for r in QA.q_fm_corpus_build(spark, sf).collect()
    }

    QA._FM_INDEX_CACHE.clear()
    monkeypatch.setattr(QA, "_FM_FORCE_DISTRIBUTED", True)

    def _boom(spark, cum_path):
        raise AssertionError("driver cum rollup called on the gated path")

    monkeypatch.setattr(QA, "_fm_driver_cum_rollup", _boom)
    _, n1, ctab, cum = QA.fm_build_index(spark, sf)
    assert cum is None and ctab  # C-table stays (alphabet-bounded)
    gated = {
        tuple(sorted(r.asDict().items()))
        for r in QA.q_fm_corpus_build(spark, sf).collect()
    }
    assert gated == baseline
    QA._FM_INDEX_CACHE.clear()


def test_fm_empty_range_is_insertion_point(spark):
    """An absent pattern's [lo, hi) must collapse to its true SA
    INSERTION POINT (the count of suffixes sorting below it), not
    freeze at whatever rank the interval died at — L(c.q) = C[c] +
    rank(c, L(q)) holds for empty intervals too. sf0.1 regression:
    'the' never occurs in doc0 there, and the frozen value diverged
    from the build oracle's direct-suffix-scan count."""
    from thrill_spark.plans.algorithms import chunked_chars
    from thrill_spark.plans.queries_analytics import (
        _FM_SENTINEL,
        fm_backward_ranges,
    )

    text = "banana"
    # absent patterns with present prefixes/suffixes, and absent chars
    patterns = ("bax", "nb", "zz", "ana", "q", "banana")
    df = spark.createDataFrame([(text + _FM_SENTINEL,)], "_s string")
    chars = chunked_chars(df, text_col="_s", chunk=4)
    ranges, _ = fm_backward_ranges(spark, chars, len(text) + 1, patterns)
    suffixes = sorted(text[i:] + _FM_SENTINEL for i in range(len(text) + 1))
    for p, (lo, hi) in ranges.items():
        want_lo = sum(1 for s in suffixes if s < p)
        want_n = sum(1 for s in suffixes if s.startswith(p))
        assert (lo, hi) == (want_lo, want_lo + want_n), p
