#!/usr/bin/env python
"""Empirical scaling check: replicate the sf0.1 fixtures K× with
shifted keys (a poor man's sf0.8), run the headline queries at both
scales, and report the runtime ratio. A plan that survives 100 TB
should scale ~linearly here (ratio ≈ K on a fixed-core machine);
super-linear ratios flag a single-partition funnel, a driver
bottleneck, or a quadratic join.

Usage: python tools/scale_check.py [K] (default 8). Writes scratch
data under /tmp/thrill_spark_scale_<K>x.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from thrill_spark.plans.queries import QUERIES  # noqa: E402
from thrill_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
QUERY_SET = [
    "reduce_by_key_pricing",
    "inner_join_lineitem_orders",
    "zip_with_index_orders",
    "prefix_sum_totalprice",
    "window_sliding_sum",
    "group_by_key_median",
    "tpch_q1_pricing_summary",
    "tpch_q18_large_volume_customers",
    "flatmap_wordcount",
    "dedup_minhash_signatures",
    # linear-by-construction additions (near-dup ops are excluded: a
    # replicated corpus is all exact clones, so their candidate-pair
    # volume grows quadratically by SEMANTICS, not by plan defect)
    "text_chunk_overlap",
    "k_core_orders",
    "merge_upsert_orders",
    # curation-batch additions, linear by construction (bigram model
    # tables are vocabulary-bounded; span corruption is per-row; the
    # interval join's bin fan-out is span/bin_days; token budget is one
    # keyed window)
    "text_bigram_lm",
    "corpus_span_corruption",
    "interval_join_promotions",
    "corpus_token_budget",
    # r7 analytics batch, linear by construction (Benford is one 9-group
    # agg over orders; the classifier's vote table is vocabulary-bounded
    # and every other step is keyed by token or doc)
    "profile_benford_totalprice",
    "ml_token_vote_classifier",
    # r9 additions (VERDICT r8 item 6): A-Priori on K× replicated
    # baskets (same item space — L2 candidate generation must stay
    # downward-closure-pruned, never an unpruned 3-way explode) and
    # theta sketch set-ops on K× events with shifted user ids (sketch
    # size is fixed; only the scan scales)
    "basket_apriori_triples",
    "events_theta_setops",
]
KEY_SHIFT = 1_000_000_000


def build_scaled(spark, k: int, out: str) -> None:
    if os.path.exists(os.path.join(out, "_DONE")):
        return
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    # fact tables: replicate with shifted join keys so join fan-out and
    # group cardinality scale with the data (not just row count)
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    orders = spark.read.parquet(f"{BASE}/orders.parquet")
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    events = spark.read.parquet(f"{BASE}/events.parquet")
    li_k = None
    or_k = None
    dc_k = None
    ev_k = None
    for i in range(k):
        off = F.lit(i * KEY_SHIFT)
        li_i = li.withColumn("l_orderkey", F.col("l_orderkey") + off)
        or_i = orders.withColumn("o_orderkey", F.col("o_orderkey") + off)
        dc_i = docs.withColumn("doc_id", F.col("doc_id") + off)
        # events: shift event AND user ids so distinct-user cardinality
        # (what the theta sketch set-ops estimate) scales with the data
        ev_i = events.withColumn(
            "event_id", F.col("event_id") + off
        ).withColumn("user_id", F.col("user_id") + off)
        li_k = li_i if li_k is None else li_k.unionByName(li_i)
        or_k = or_i if or_k is None else or_k.unionByName(or_i)
        dc_k = dc_i if dc_k is None else dc_k.unionByName(dc_i)
        ev_k = ev_i if ev_k is None else ev_k.unionByName(ev_i)
    li_k.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    or_k.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    dc_k.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    ev_k.write.mode("overwrite").parquet(f"{out}/events.parquet")
    # dimension tables: unchanged (realistic — dims grow slower than facts)
    for t in ("customer", "supplier", "part", "nation", "region",
              "embeddings"):
        shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
    open(os.path.join(out, "_DONE"), "w").write("ok")


def run(spark, sf_dir: str, names) -> dict[str, float]:
    res = {}
    for n in names:
        t0 = time.perf_counter()
        QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
        res[n] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    return res


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out = f"/tmp/thrill_spark_scale_{k}x"
    spark = get_spark("scale_check")
    build_scaled(spark, k, out)
    # warmup both shapes
    run(spark, "/root/testdata/sf0.001", QUERY_SET)
    base = run(spark, BASE, QUERY_SET)
    scaled = run(spark, out, QUERY_SET)
    report = {
        n: {
            "sf0.1_s": base[n],
            f"{k}x_s": scaled[n],
            "ratio": round(scaled[n] / base[n], 2) if base[n] > 0 else None,
        }
        for n in QUERY_SET
    }
    # A-Priori with RELATIVE support: at K× baskets over the SAME item
    # space, a FIXED absolute threshold lets far more pairs become
    # frequent — L2 grows super-linearly by SEMANTICS (the row above
    # measures that). Real scale-ups keep support relative to basket
    # count; this row scales the threshold with K to isolate the plan.
    from thrill_spark.plans import queries_analytics as QA

    base_sup = QA._AP_PAIR_SUPPORT
    try:
        QA._AP_PAIR_SUPPORT = base_sup * k
        t0 = time.perf_counter()
        QUERIES["basket_apriori_triples"](spark, out).write.format(
            "noop"
        ).mode("overwrite").save()
        t_rel = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    finally:
        QA._AP_PAIR_SUPPORT = base_sup
    b = base["basket_apriori_triples"]
    report["basket_apriori_triples_rel_support"] = {
        "sf0.1_s": b,
        f"{k}x_s": t_rel,
        "ratio": round(t_rel / b, 2) if b > 0 else None,
        "support": f"{base_sup} -> {base_sup * k}",
    }
    print(json.dumps({"k": k, "queries": report}, indent=2))




# ---------------------------------------------------------------------------
# heavy mode: the two ops whose cost is NOT driven by the fact tables —
# suffix sorting (input = one long character sequence) and IVF-PQ ANN
# (input = the embeddings table). `python tools/scale_check.py heavy [K]`
# grows each op's OWN input K× and reports the runtime ratio; for n log n
# (DC7) and ~linear (IVF-PQ at fixed probe count + sqrt(N) cells) shapes
# the ratio should stay close to K on a fixed-core machine.
# ---------------------------------------------------------------------------


def _dc7_chars(spark, copies: int):
    """Character rows (pos, ch) for `copies` concatenations of the
    sf0.1 doc_id<20 text (the registered query's corpus). Repeated text
    is a worst case for suffix sorting — long shared prefixes push the
    recursion deep — so the ratio is conservative."""
    docs = spark.read.parquet(f"{BASE}/documents.parquet").filter(
        F.col("doc_id") < 20
    )
    lens = docs.select("doc_id", F.length("text").alias("_len"))
    from thrill_spark import ordering as O

    offs = O.prefix_sum(lens, ["doc_id"], "_len", name="_off", exclusive=True)
    from thrill_spark.plans import algorithms as A

    one = A.chunked_chars(
        docs.join(offs.select("doc_id", "_off"), "doc_id"), off_col="_off"
    )
    total = one.count()
    out = None
    for i in range(copies):
        c = one.select((F.col("pos") + F.lit(i * total)).alias("pos"), "ch")
        out = c if out is None else out.unionByName(c)
    return out, total * copies


def heavy(k: int, only: str | None = None) -> None:
    import time as _t

    from thrill_spark.functions import similarity as S
    from thrill_spark.plans import algorithms as A

    spark = get_spark("scale_check_heavy")
    report = {}

    if only in (None, "dc7"):
        _heavy_dc7(spark, k, report)
    if only in (None, "pq"):
        _heavy_pq(spark, k, report)
    if only in (None, "fm"):
        _heavy_fm(spark, k, report)
    if only in (None, "lcs"):
        _heavy_lcs(spark, k, report)
    if only in (None, "xs"):
        _heavy_xs(spark, k, report)
    print(json.dumps({"k": k, "heavy": report}, indent=2))


def _heavy_dc7(spark, k, report):
    import time as _t

    from thrill_spark.plans import algorithms as A

    # --- DC7 suffix sorting: 1x vs kx character input
    # untimed warmup (JVM/codegen) so the 1x number is steady-state
    w_chars, w_n = _dc7_chars(spark, 1)
    A.suffix_array_dc7(w_chars, w_n).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    times = {}
    for copies in (1, k):
        chars, n = _dc7_chars(spark, copies)
        t0 = _t.perf_counter()
        A.suffix_array_dc7(chars, n).write.format("noop").mode(
            "overwrite"
        ).save()
        times[copies] = round(_t.perf_counter() - t0, 2)
        spark.catalog.clearCache()
    report["suffix_array_dc7"] = {
        "t_1x_s": times[1],
        f"t_{k}x_s": times[k],
        "ratio": round(times[k] / times[1], 2),
    }


def _heavy_pq(spark, k, report):
    import time as _t

    from thrill_spark.functions import similarity as S

    # --- IVF-PQ: 1x vs kx embeddings, FIXED probe count (probe_mod
    # scales with the copies so query volume stays constant and the
    # ratio isolates index build + per-probe candidate scan growth)
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n0 = emb.count()
    # untimed warmup pass for the pq shape
    S.pq_ann_topk(emb, k=5, m=4, ksub=16, probe_mod=25).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.catalog.clearCache()
    times = {}
    for copies in (1, k):
        big = None
        for i in range(copies):
            c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
            big = c if big is None else big.unionByName(c)
        big = big.repartition(32).localCheckpoint()
        best = None
        for _ in range(2):  # min-of-2: drop one-time plan-compile cost
            t0 = _t.perf_counter()
            S.pq_ann_topk(
                big, k=5, m=4, ksub=16, probe_mod=25 * copies
            ).write.format("noop").mode("overwrite").save()
            dt = _t.perf_counter() - t0
            best = dt if best is None or dt < best else best
            spark.catalog.clearCache()
        times[copies] = round(best, 2)
    report["similarity_pq_ann"] = {
        "n_rows_1x": n0,
        "t_1x_s": times[1],
        f"t_{k}x_s": times[k],
        "ratio": round(times[k] / times[1], 2),
    }


def _heavy_fm(spark, k, report):
    import time as _t

    from thrill_spark.plans import queries_analytics as QA

    # --- FM-index backward search: 1x vs kx character input via the
    # pre-distributed chars entry point (a single text row would push
    # the whole sequence through one explode task). Cost = suffix sort
    # (n log n) + |pattern| rank-probe scans over the BWT (linear).
    def _chars_with_sentinel(copies: int):
        chars, n = _dc7_chars(spark, copies)
        sent = spark.createDataFrame([(n, QA._FM_SENTINEL)], "pos long, ch string")
        return chars.unionByName(sent), n + 1

    w_chars, w_n = _chars_with_sentinel(1)
    QA.fm_search_chars(spark, w_chars, w_n, QA._FM_PATTERNS)  # warmup
    spark.catalog.clearCache()
    times = {}
    for copies in (1, k):
        chars, n1 = _chars_with_sentinel(copies)
        t0 = _t.perf_counter()
        QA.fm_search_chars(spark, chars, n1, QA._FM_PATTERNS)
        times[copies] = round(_t.perf_counter() - t0, 2)
        spark.catalog.clearCache()
    report["suffix_fm_count"] = {
        "t_1x_s": times[1],
        f"t_{k}x_s": times[k],
        "ratio": round(times[k] / times[1], 2),
    }


def _heavy_lcs(spark, k, report):
    import time as _t

    from thrill_spark.plans import queries_algo as QG

    # --- Generalized-SA LCS: 1x vs kx document pair through the
    # chunked chars-level entry (suffix_lcs_core). The K-fold texts are
    # per-row JVM repeats — a worst case for the doubling sort (the
    # common substring grows with the repeat, pushing rank rounds
    # deeper), so the measured ratio is conservative vs n log n.
    docs = spark.read.parquet(f"{BASE}/documents.parquet")

    def _pair(copies: int):
        d0 = docs.filter(F.col("doc_id") == 0).select(
            F.expr(f"repeat(text, {copies})").alias("_t0")
        )
        d1 = docs.filter(F.col("doc_id") == 1).select(
            F.expr(f"repeat(text, {copies})").alias("_t1")
        )
        return d0, d1

    QG.suffix_lcs_core(*_pair(1)).write.format("noop").mode(
        "overwrite"
    ).save()  # warmup
    spark.catalog.clearCache()
    times = {}
    for copies in (1, k):
        d0, d1 = _pair(copies)
        t0 = _t.perf_counter()
        QG.suffix_lcs_core(d0, d1).write.format("noop").mode(
            "overwrite"
        ).save()
        times[copies] = round(_t.perf_counter() - t0, 2)
        spark.catalog.clearCache()
    report["suffix_lcs"] = {
        "t_1x_s": times[1],
        f"t_{k}x_s": times[k],
        "ratio": round(times[k] / times[1], 2),
    }


def _heavy_xs(spark, k, report):
    import time as _t

    from thrill_spark.plans import queries_algo as QG

    # --- ExactSubstr (generalized SA + LCP islands): 1x vs kx corpus.
    # The scaled corpus is K contiguous-id copies of the doc_id<_XS_DOCS
    # fixture; _XS_DOCS is scaled with K so the query sees all copies.
    # Replicated docs are exact clones, so EVERY island becomes
    # multi-doc — a duplication-saturated worst case for the island
    # aggregation (real corpora duplicate far less).
    base_docs = QG._XS_DOCS
    docs = spark.read.parquet(f"{BASE}/documents.parquet").filter(
        F.col("doc_id") < base_docs
    )

    def _dir(copies: int) -> str:
        # contiguous ids 0..copies*base_docs-1 so the scaled query's
        # doc_id < copies*base_docs filter sees every copy
        out = f"/tmp/thrill_spark_scale_xs_{copies}x"
        if not os.path.exists(os.path.join(out, "_DONE")):
            shutil.rmtree(out, ignore_errors=True)
            os.makedirs(out, exist_ok=True)
            big = None
            for i in range(copies):
                c = docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * base_docs)
                )
                big = c if big is None else big.unionByName(c)
            big.write.mode("overwrite").parquet(f"{out}/documents.parquet")
            open(os.path.join(out, "_DONE"), "w").write("ok")
        return out

    from thrill_spark import ordering as _O

    times = {}
    try:
        for copies in (1, 1, k):  # first 1x is the untimed warmup
            d = _dir(copies)
            QG._XS_DOCS = base_docs * copies
            t0 = _t.perf_counter()
            QUERIES["dedup_exact_substr_sa"](spark, d).write.format(
                "noop"
            ).mode("overwrite").save()
            times[copies] = round(_t.perf_counter() - t0, 2)
            _O.release_persisted()
            spark.catalog.clearCache()
    finally:
        QG._XS_DOCS = base_docs
    report["dedup_exact_substr_sa"] = {
        "t_1x_s": times[1],
        f"t_{k}x_s": times[k],
        "ratio": round(times[k] / times[1], 2),
    }


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "heavy":
        heavy(
            int(sys.argv[2]) if len(sys.argv) > 2 else 4,
            sys.argv[3] if len(sys.argv) > 3 else None,
        )
    else:
        main()
