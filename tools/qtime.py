#!/usr/bin/env python
"""Quick per-query timer for optimization iterations.

Usage: python tools/qtime.py [-p PASSES] name [name ...]
Times each named query with the bench methodology (warmup at sf0.001,
noop sink, per-query min over interleaved passes) and prints one line
per query plus job/stage/task counts. NOT the official bench — a dev
loop tool (bench.py stays the record)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from thrill_spark import ordering as _ordering  # noqa: E402
from thrill_spark.plans.queries import QUERIES  # noqa: E402
from thrill_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    passes = 3
    if args and args[0] == "-p":
        passes = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qtime")
    for name in names:
        bench.run_query(spark, name, "/root/testdata/sf0.001")
    _ordering.release_persisted()
    spark.catalog.clearCache()
    timings: dict[str, float] = {}
    stage_counts: dict[str, dict] = {}
    errors: dict[str, str] = {}
    bench._timed_passes(
        spark, list(names), sf_dir, errors, timings, stage_counts,
        passes=passes,
    )
    total = 0.0
    for name in names:
        if name in errors:
            print(f"{name:40s} ERROR {errors[name]}")
            continue
        m = stage_counts.get(name, {})
        total += timings[name]
        print(
            f"{name:40s} {timings[name]:7.3f}s jobs={m.get('jobs'):>4} "
            f"stages={m.get('stages'):>4} tasks={m.get('tasks'):>6}"
        )
    print(f"{'TOTAL':40s} {total:7.3f}s")


if __name__ == "__main__":
    main()
