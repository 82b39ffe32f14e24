"""Pinned A/B: FM-family suffix-array step=4 (quadrupling) vs step=8
(octupling) — r11 VERDICT #3.

The v2 bench's same-HEAD spread (±1.7-2.5 s) swamped the r11 deltas,
so this harness measures both variants in ONE JVM with ALTERNATING
passes (A,B,A,B,...) and reports per-variant MIN — transient phases
(GC, codegen, host noise) hit both arms equally, and min-of-5 drops
them. Two surfaces:

- sf0.1: the driver-bench queries suffix_fm_count_doc0 +
  suffix_fm_locate_doc0 (step pinned via QA._FM_SA_STEP).
- heavy K=4: fm_search_chars on 1x vs 4x character input (the
  scale_check _heavy_fm corpus) — the ratio is the 100 TB lens.

Usage: python tools/fm_ab.py [passes]   (default 5)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thrill_spark.session import get_spark  # noqa: E402


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from bench import run_query
    from thrill_spark import ordering as _ordering
    from thrill_spark.plans import queries_analytics as QA
    from tools.scale_check import _dc7_chars

    spark = get_spark("fm_ab")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = ["suffix_fm_count_doc0", "suffix_fm_locate_doc0"]

    def _clear() -> None:
        _ordering.release_persisted()
        spark.catalog.clearCache()

    def _chars_with_sentinel(copies: int):
        chars, n = _dc7_chars(spark, copies)
        sent = spark.createDataFrame(
            [(n, QA._FM_SENTINEL)], "pos long, ch string"
        )
        return chars.unionByName(sent), n + 1

    # warm both arms (codegen for each step's plan shape)
    for step in (4, 8):
        QA._FM_SA_STEP = step
        for n in names:
            run_query(spark, n, "/root/testdata/sf0.001")
        w_chars, w_n = _chars_with_sentinel(1)
        QA.fm_search_chars(spark, w_chars, w_n, QA._FM_PATTERNS)
        _clear()

    sf_times: dict[int, dict[str, float]] = {4: {}, 8: {}}
    heavy_times: dict[int, dict[int, float]] = {4: {}, 8: {}}
    for p in range(passes):
        for step in (4, 8):
            QA._FM_SA_STEP = step
            for n in names:
                t0 = time.perf_counter()
                run_query(spark, n, sf_dir)
                t = time.perf_counter() - t0
                cur = sf_times[step].get(n)
                if cur is None or t < cur:
                    sf_times[step][n] = t
                _clear()
            for copies in (1, 4):
                chars, n1 = _chars_with_sentinel(copies)
                t0 = time.perf_counter()
                QA.fm_search_chars(spark, chars, n1, QA._FM_PATTERNS)
                t = time.perf_counter() - t0
                cur = heavy_times[step].get(copies)
                if cur is None or t < cur:
                    heavy_times[step][copies] = t
                _clear()
        spark.sparkContext._jvm.System.gc()
        print(f"pass {p + 1}/{passes} done", file=sys.stderr)

    print(f"# FM step A/B — min of {passes} alternating passes, one JVM")
    print(f"# sf_dir={sf_dir}")
    for step in (4, 8):
        row = {n: round(t, 2) for n, t in sf_times[step].items()}
        h1, h4 = heavy_times[step][1], heavy_times[step][4]
        print(
            f"step={step}: sf0.1 {row} | heavy K=4: "
            f"{round(h1, 2)}s -> {round(h4, 2)}s ratio {round(h4 / h1, 2)}"
        )


if __name__ == "__main__":
    main()
