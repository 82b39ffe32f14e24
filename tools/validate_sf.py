"""Pre-validate every registered oracle query at an arbitrary scale
factor — the same comparison the driver runs at sf0.01 for
CORRECTNESS_r{N}.json. Run this before each round ends:

    python tools/validate_sf.py [sf_dir] [name_substring ...]

Prints one line per query (ok / MISMATCH / ERROR) and a summary;
exit code 1 if anything failed.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle import compare, duckdb_conn  # noqa: E402
from thrill_spark import ordering as _ordering  # noqa: E402
from thrill_spark.plans.queries import ORACLES, QUERIES  # noqa: E402
from thrill_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    spark = get_spark("validate_sf")
    con = duckdb_conn(sf_dir)
    names = sorted(ORACLES)
    if only:
        names = [n for n in names if any(s in n for s in only)]
    failed: list[str] = []
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            compare(df, con, ORACLES[name], name)
            status = "ok"
        except AssertionError as exc:
            status = f"MISMATCH: {exc}"
            failed.append(name)
        except Exception:
            status = "ERROR:\n" + traceback.format_exc(limit=5)
            failed.append(name)
        _ordering.release_persisted()
        spark.catalog.clearCache()
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({time.perf_counter() - t0:.1f}s)", flush=True)
    # rows-only queries: just confirm they run at this scale
    rows_only = [
        n for n in sorted(set(QUERIES) - set(ORACLES))
        if not only or any(s in n for s in only)
    ]
    rows_failed: list[str] = []
    for name in rows_only:
        t0 = time.perf_counter()
        try:
            n = QUERIES[name](spark, sf_dir).count()
            status = f"ok rows={n}"
        except Exception:
            status = "ERROR:\n" + traceback.format_exc(limit=5)
            rows_failed.append(name)
        _ordering.release_persisted()
        spark.catalog.clearCache()
        print(f"[rows-only] {name}: {status} ({time.perf_counter() - t0:.1f}s)", flush=True)
    print(
        f"\n{len(names)} oracle queries, {len(failed)} failed: {failed}; "
        f"{len(rows_only)} rows-only, {len(rows_failed)} failed: {rows_failed}"
    )
    return 1 if failed or rows_failed else 0


if __name__ == "__main__":
    sys.exit(main())
