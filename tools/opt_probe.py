"""r13 optimization probe: time queries with the noop sink and capture
formatted plans.

Usage:
  PYTHONPATH=. python tools/opt_probe.py [--sf DIR] [--runs N]
      [--plans-dir plans/r13 --suffix before] [--json OUT] [name ...]

With no names: all driver-visible window queries plus bench headline
queries. Each query is timed with df.write.format("noop") (guide §1.4)
after one untimed warm-up of the session, with
spark.sparkContext.setJobDescription labeling (guide §1.5).
``--plans-dir``/``--suffix`` additionally write
<plans-dir>/<name>_<suffix>.txt with the .explain("formatted") output.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = list(sys.argv[1:])

    def opt(flag, default=None):
        if flag in argv:
            i = argv.index(flag)
            v = argv[i + 1]
            del argv[i:i + 2]
            return v
        return default

    sf_dir = opt("--sf", "/root/testdata/sf0.1")
    n_runs = int(opt("--runs", "2"))
    plans_dir = opt("--plans-dir")
    suffix = opt("--suffix", "before")
    json_out = opt("--json")
    names = argv

    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.registry import all_queries

    qs = all_queries()
    if not names:
        names = sorted(n for n, q in qs.items()
                       if q.driver_visible or q.headline)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # session warm-up (same discipline as bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    warm.selectExpr(
        "aggregate(transform(embedding, x -> cast(x as double)), 0D,"
        " (a, v) -> a + v) AS s").agg({"s": "sum"}).collect()

    if plans_dir:
        os.makedirs(os.path.join(REPO, plans_dir), exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")

    results: dict[str, dict] = {}
    for name in names:
        q = qs[name]
        if plans_dir:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
            with open(os.path.join(REPO, plans_dir,
                                   f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
            spark.catalog.clearCache()
        series = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            series.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        spark.sparkContext._jvm.System.gc()
        results[name] = {"min": min(series), "runs": series}
        print(f"{name:36s} min {min(series):7.3f}  runs {series}",
              flush=True)

    total = round(sum(r["min"] for r in results.values()), 3)
    print(f"\ntotal(min) {total}s over {len(results)} queries")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "total_min": total,
                       "queries": results}, fh, indent=1)
        print(f"wrote {json_out}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
