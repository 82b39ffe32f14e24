"""Pinned v1-subset A/B: HEAD vs the r12 final-HEAD tree in ONE JVM.

Why (VERDICT r13 #2): raw driver v1 totals proved to be host weather —
r13 recorded 81.1 s vs r12's 54.9 s on v1 code paths that were
byte-identical, while same-week idle runs of identical code spanned
63.7-81.1 s. That noise floor means a real ~30% regression could hide
in the round-over-round v1 series. This harness restores regression
detection the same way tools/ratio_ab.py did for the heavy targets:
both arms run in ONE warm JVM, ALTERNATING A,B,A,B per pass so
transient phases (GC, codegen, host noise) hit both equally, and the
per-arm per-query MIN over N passes drops the slow phases. The
HEAD/r12 ratio of mins is the code-attributable movement; compare
THAT round-over-round, not raw driver v1 totals (BENCH_NOTES
"v1 A/B protocol").

Arms are two CODE TREES of the same package: the baseline is a git
worktree of the pinned r12 final HEAD, and each arm-switch purges
thrill_spark.* from sys.modules and re-imports from that arm's root —
the SparkSession (and its JVM) persists across swaps, so both arms
see the same executors, cache state machine, and codegen cache.
The 14 queries are the BENCH_r01-shared v1 subset (pure DataFrame
plans, no Python datasource state crosses arms).

Usage: python tools/v1_ab.py [passes] [baseline_rev]
       (defaults: passes=5, baseline_rev=03e2f39 = r12 final HEAD)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HEAD_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HEAD_ROOT)

R12_REV = "03e2f39"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The BENCH_r01-shared v1 subset (the series VERDICT r13 judged at
# 1.05x vs r1 under idle conditions).
V1_SUBSET = [
    "reduce_by_key_pricing",
    "inner_join_lineitem_orders",
    "flatmap_wordcount",
    "group_by_key_median",
    "sort_top_orders",
    "zip_with_index_orders",
    "prefix_sum_totalprice",
    "window_sliding_sum",
    "window_disjoint_blocks",
    "reduce_to_index_nation",
    "merge_sorted_halves",
    "left_join_customer_orders",
    "tpch_q1_pricing_summary",
    "tpch_q18_large_volume_customers",
]


def _worktree_for(rev: str) -> str:
    """Materialize (once) a read-only worktree of `rev` for the
    baseline arm; reused across runs."""
    out = subprocess.run(
        ["git", "-C", HEAD_ROOT, "rev-parse", rev],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    path = f"/tmp/thrill_spark_ab_{out[:12]}"
    if not os.path.isdir(os.path.join(path, "thrill_spark")):
        subprocess.run(
            ["git", "-C", HEAD_ROOT, "worktree", "add", "--detach", path, rev],
            check=True, capture_output=True, text=True,
        )
    return path


def _swap_to(root: str):
    """Point the interpreter's thrill_spark package at `root` and
    return (QUERIES, release_persisted) from that tree. The held
    SparkSession survives — only Python module objects are swapped."""
    for m in [m for m in list(sys.modules) if m.split(".")[0] == "thrill_spark"]:
        del sys.modules[m]
    for r in (HEAD_ROOT,):
        while r in sys.path:
            sys.path.remove(r)
    sys.path = [p for p in sys.path if not p.startswith("/tmp/thrill_spark_ab_")]
    sys.path.insert(0, root)
    from thrill_spark import ordering as _ordering  # noqa: PLC0415
    from thrill_spark.plans.queries import QUERIES  # noqa: PLC0415

    return QUERIES, _ordering.release_persisted


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rev = sys.argv[2] if len(sys.argv) > 2 else R12_REV
    base_root = _worktree_for(rev)

    from thrill_spark.session import get_spark  # HEAD tree

    spark = get_spark("v1_ab")
    arms = [("r12", base_root), ("head", HEAD_ROOT)]

    # untimed warmup: every query shape in both arms (codegen caches)
    for _, root in arms:
        qs, rel = _swap_to(root)
        for n in V1_SUBSET:
            _noop(qs[n](spark, SF_DIR))
            rel()
            spark.catalog.clearCache()

    best: dict[str, dict[str, float]] = {a: {} for a, _ in arms}
    for p in range(passes):
        # Alternate which arm runs first each pass: a fixed order would
        # hand the second arm any warm-up the first one paid for.
        for arm, root in (arms if p % 2 == 0 else arms[::-1]):
            qs, rel = _swap_to(root)
            for n in V1_SUBSET:
                t0 = time.perf_counter()
                _noop(qs[n](spark, SF_DIR))
                dt = time.perf_counter() - t0
                cur = best[arm].get(n)
                if cur is None or dt < cur:
                    best[arm][n] = dt
                rel()
                spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        print(f"pass {p + 1}/{passes} done", file=sys.stderr)

    per_q = {
        n: {
            "r12_s": round(best["r12"][n], 3),
            "head_s": round(best["head"][n], 3),
            "ratio": round(best["head"][n] / best["r12"][n], 2),
        }
        for n in V1_SUBSET
    }
    t_r12 = sum(best["r12"].values())
    t_head = sum(best["head"].values())
    print(
        json.dumps(
            {
                "baseline_rev": rev,
                "passes": passes,
                "sf_dir": SF_DIR,
                "total": {
                    "r12_s": round(t_r12, 2),
                    "head_s": round(t_head, 2),
                    "ratio": round(t_head / t_r12, 3),
                },
                "queries": per_q,
            }
        )
    )


if __name__ == "__main__":
    main()
