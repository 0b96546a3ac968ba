"""Local mimic of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at a given
scale factor, then compares row count, sorted schema, and an
order-insensitive value hash — stricter than any plausible driver
implementation (exact value match after canonical string rendering), so
passing here should imply passing the driver's check.

Usage: python tools/verify_local.py [sf_dir] [query ...]
       python tools/verify_local.py --never-checked [sf_dir] [--json OUT]

``--never-checked`` (VERDICT r10 item 8) runs exactly the registry
subset that has NEVER appeared in a driver CORRECTNESS_r*.json
artifact, and with ``--json`` writes a CORRECTNESS-shaped JSON — the
committed-per-round evidence that the rotation backlog is shrinking
between driver windows.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def never_driver_checked(registry_names) -> set[str]:
    """Registry names absent from every CORRECTNESS_r*.json."""
    seen: set[str] = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        if re.search(r"CORRECTNESS_r\d+\.json$", f):
            with open(f) as fh:
                seen.update(json.load(fh))
    return {n for n in registry_names if n not in seen}


def main() -> int:
    argv = list(sys.argv[1:])
    never_mode = "--never-checked" in argv
    if never_mode:
        argv.remove("--never-checked")
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.registry import all_queries
    from jcf_nb_migration_spark.testing import compare_frames, duckdb_with_views

    spark = get_spark("verify-local")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_with_views(sf_dir)

    qs = all_queries()
    if never_mode:
        only = never_driver_checked(qs)
        print(f"--never-checked: {len(only)} queries never in a driver "
              "artifact", file=sys.stderr)
    failures = []
    results: dict[str, dict] = {}
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
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": "spark raised"}
            continue
        t_spark = time.time() - t0
        if q.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) "
                  f"[spark {t_spark:.1f}s]")
            results[name] = {"rows_match": True, "schema_match": None,
                             "hash_match": None,
                             "spark_rows": len(sdf), "oracle_rows": None,
                             "err": None, "note": "no oracle (rows-only)"}
            continue
        try:
            ddf = con.execute(q.oracle).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb raised")
            traceback.print_exc()
            failures.append(name)
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": "duckdb raised"}
            continue
        r = compare_frames(name, sdf, ddf)
        status = "PASS" if r.ok else "FAIL"
        print(f"{status}  {name}: rows {r.rows_spark}/{r.rows_duck} "
              f"cols={'ok' if r.cols_ok else 'MISMATCH'} "
              f"hash={'ok' if r.hash_ok else 'MISMATCH'} [spark {t_spark:.1f}s]")
        results[name] = {
            "rows_match": r.rows_spark == r.rows_duck,
            "schema_match": r.cols_ok, "hash_match": r.hash_ok,
            "spark_rows": r.rows_spark, "oracle_rows": r.rows_duck,
            "err": None}
        if not r.ok:
            failures.append(name)
            print("  " + r.detail[:500])

    print(f"\n{n_run - len(failures)}/{n_run} ok; failures: {failures}")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(dict(sorted(results.items())), fh, indent=2)
        print(f"wrote {json_out} ({len(results)} entries)",
              file=sys.stderr)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
