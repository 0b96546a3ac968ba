"""Local mimic of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at a given
scale factor, then compares row count, sorted schema, and an
order-insensitive value hash — stricter than any plausible driver
implementation (exact value match after canonical string rendering), so
passing here should imply passing the driver's check.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.registry import all_queries
    from jcf_nb_migration_spark.testing import compare_frames, duckdb_with_views

    spark = get_spark("verify-local")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_with_views(sf_dir)

    qs = all_queries()
    failures = []
    n_run = 0
    for name, q in sorted(qs.items()):
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
            # many queries persist shared intermediates (two-phase
            # rank frames, fingerprint/shingle indexes); drop them so
            # a ~200-query sweep doesn't accumulate session-lifetime
            # cache (the bench.py discipline)
            spark.catalog.clearCache()
        except Exception:
            print(f"FAIL  {name}: spark raised")
            traceback.print_exc()
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if q.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) "
                  f"[spark {t_spark:.1f}s]")
            continue
        try:
            ddf = con.execute(q.oracle).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb raised")
            traceback.print_exc()
            failures.append(name)
            continue
        r = compare_frames(name, sdf, ddf)
        status = "PASS" if r.ok else "FAIL"
        print(f"{status}  {name}: rows {r.rows_spark}/{r.rows_duck} "
              f"cols={'ok' if r.cols_ok else 'MISMATCH'} "
              f"hash={'ok' if r.hash_ok else 'MISMATCH'} [spark {t_spark:.1f}s]")
        if not r.ok:
            failures.append(name)
            print("  " + r.detail[:500])

    print(f"\n{n_run - len(failures)}/{n_run} ok; failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
