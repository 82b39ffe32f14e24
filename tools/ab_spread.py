#!/usr/bin/env python
"""One-JVM alternating A/B for the catalog scan-spread (r14).

Both arms run in ONE warm JVM; per pass the arm order alternates
(A,B then B,A) so transient phases hit both arms equally; the
per-arm per-query MIN over N passes is compared. This is the same
protocol as tools/v1_ab.py / ratio_ab.py — raw back-to-back bench
runs proved to move ±25% on identical code (BENCH_NOTES).

Arm A: catalog._SPREAD_ENABLED=True (spread on), arm B: off.

Usage: python tools/ab_spread.py [passes] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from thrill_spark import catalog  # noqa: E402
from thrill_spark import ordering as _ordering  # noqa: E402
from thrill_spark.plans.queries import QUERIES  # noqa: E402
from thrill_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = bench.BENCH_QUERIES + [
    "suffix_fm_decontaminate",
    "suffix_fm_corpus_build",
    "basket_apriori_triples",
]


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_spread")
    # warmup both arms at sf0.001
    for flag in (True, False):
        catalog._SPREAD_ENABLED = flag
        for n in names:
            bench.run_query(spark, n, "/root/testdata/sf0.001")
        _ordering.release_persisted()
        spark.catalog.clearCache()
    mins: dict[tuple[bool, str], float] = {}
    for p in range(passes):
        arms = (True, False) if p % 2 == 0 else (False, True)
        for flag in arms:
            catalog._SPREAD_ENABLED = flag
            for n in names:
                t0 = time.perf_counter()
                df = QUERIES[n](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                t = time.perf_counter() - t0
                k = (flag, n)
                if k not in mins or t < mins[k]:
                    mins[k] = t
                _ordering.release_persisted()
                spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    ta = tb = 0.0
    print(f"{'query':40s} {'on':>7} {'off':>7} {'ratio':>6}")
    for n in names:
        a, b = mins.get((True, n)), mins.get((False, n))
        if a is None or b is None:
            continue
        ta += a
        tb += b
        print(f"{n:40s} {a:7.3f} {b:7.3f} {a / b:6.2f}")
    print(f"{'TOTAL (on/off)':40s} {ta:7.3f} {tb:7.3f} {ta / tb:6.2f}")


if __name__ == "__main__":
    main()
