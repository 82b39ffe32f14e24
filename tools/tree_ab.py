#!/usr/bin/env python
"""Generic pinned two-tree A/B: HEAD vs an arbitrary rev, arbitrary
query set, ONE warm JVM, alternating arm order, per-arm per-query min
over N passes — the only protocol on this host that attributes
per-query movement to code rather than ambient drift (BENCH_NOTES
"v1 A/B protocol"; same machinery as tools/v1_ab.py, which remains the
committed round-over-round v1 record).

Usage: python tools/tree_ab.py BASELINE_REV PASSES name [name ...]

Caveat for memoized build-once artifacts (the FM index family): each
arm swap purges thrill_spark.* from sys.modules, so session memos
(_FM_INDEX_CACHE) reset every swap and index-consuming queries re-pay
the build in BOTH arms each pass — ratios stay attributable, absolute
times are inflated vs bench.py.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HEAD_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HEAD_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _worktree_for(rev: str) -> str:
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
    rev = sys.argv[1]
    passes = int(sys.argv[2])
    names = sys.argv[3:]
    base_root = _worktree_for(rev)

    from thrill_spark.session import get_spark  # HEAD tree

    spark = get_spark("tree_ab")
    arms = [("base", base_root), ("head", HEAD_ROOT)]

    for _, root in arms:
        qs, rel = _swap_to(root)
        for n in names:
            _noop(qs[n](spark, "/root/testdata/sf0.001"))
            rel()
            spark.catalog.clearCache()

    best: dict[str, dict[str, float]] = {a: {} for a, _ in arms}
    for p in range(passes):
        for arm, root in (arms if p % 2 == 0 else arms[::-1]):
            qs, rel = _swap_to(root)
            for n in names:
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

    ta = tb = 0.0
    print(f"{'query':40s} {'base':>8} {'head':>8} {'ratio':>6}")
    for n in names:
        b, h = best["base"][n], best["head"][n]
        ta += h
        tb += b
        print(f"{n:40s} {b:8.3f} {h:8.3f} {h / b:6.2f}")
    print(f"{'TOTAL (head/base)':40s} {tb:8.3f} {ta:8.3f} {ta / tb:6.2f}")


if __name__ == "__main__":
    main()
