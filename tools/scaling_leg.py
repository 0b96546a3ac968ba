"""Driver-visible parallel-scaling leg (VERDICT r13 item 5).

The driver's own 8-vs-32-core comparison runs at sf0.1, where every
headline query is 0.3-1.6 s and scheduling/fixed-cost-bound — core
count barely moves the wall, so those ratios say nothing about whether
the operators parallelize. This tool produces the missing evidence: it
times the headline bench set at a DERIVED fixture (default the
30x-derived sf3_full, built by tools/scaling_probe.ensure_derived_sf3 —
at 10x the 32-core walls are still fixed-cost-bound and no ratio
clears 2x; measured) at two core counts and commits the per-query
walls + ratios as SCALING_r<round>.json.

Methodology matches bench.py's timed region: the query frame is built
and written to the noop sink (computes every column, no output cost),
best-of-N with spark.catalog.clearCache() + JVM GC between runs, jobs
labelled. Deliberately NOT bench.py itself: bench's artifact/history
machinery (bench_best.json steady medians, bench_last_full.json) is
keyed to sf0.1 and a derived-fixture run must never pollute it — and
the sf parse of ".../sf1_full" would misfile the run as sf0.1.

Usage:
  PYTHONPATH=. python tools/scaling_leg.py                # one leg,
      # honors SPARK_GRAFT_CPUS / SPARK_GRAFT_SCALE_DIR, prints JSON
  PYTHONPATH=. python tools/scaling_leg.py --both 14      # both legs
      # (32 then 8 cores) in fresh subprocesses (the master is fixed
      # at JVM start), writes SCALING_r14.json with ratios
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_DIR = os.path.join(REPO, ".probe_fixtures", "sf3_full")
CPUS_HIGH = 32
CPUS_LOW = 8
N_RUNS = 3


def run_leg() -> dict:
    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.registry import all_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SCALE_DIR", DEFAULT_DIR)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(CPUS_HIGH)))
    spark = get_spark("scaling-leg")
    spark.sparkContext.setLogLevel("ERROR")
    names = sorted(n for n, q in all_queries().items() if q.headline)
    out: dict = {"cpus": cpus, "sf_dir": sf_dir, "queries": {}}
    for n in names:
        q = all_queries()[n]
        best = None
        for i in range(N_RUNS):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"scaling-leg {n} #{i}")
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out["queries"][n] = round(best, 3)
        print(f"# cpus={cpus} {n}: {out['queries'][n]}s",
              file=sys.stderr, flush=True)
    out["loadavg_end"] = list(os.getloadavg())
    spark.stop()
    return out


def run_both(round_no: str) -> None:
    legs = {}
    for cpus in (CPUS_HIGH, CPUS_LOW):
        env = dict(os.environ,
                   SPARK_GRAFT_CPUS=str(cpus),
                   PYTHONPATH=REPO)
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True)
        legs[cpus] = json.loads(res.stdout.strip().splitlines()[-1])
        sys.stderr.write(res.stderr)
    qs = sorted(legs[CPUS_HIGH]["queries"])
    ratios = {
        n: round(legs[CPUS_LOW]["queries"][n]
                 / legs[CPUS_HIGH]["queries"][n], 2)
        for n in qs if legs[CPUS_HIGH]["queries"][n] > 0}
    doc = {
        "round": int(round_no),
        "sf_dir": legs[CPUS_HIGH]["sf_dir"],
        "cpus_high": CPUS_HIGH,
        "cpus_low": CPUS_LOW,
        "queries_high": legs[CPUS_HIGH]["queries"],
        "queries_low": legs[CPUS_LOW]["queries"],
        "ratio_low_over_high": ratios,
        "loadavg_end_high": legs[CPUS_HIGH]["loadavg_end"],
        "loadavg_end_low": legs[CPUS_LOW]["loadavg_end"],
    }
    path = os.path.join(REPO, f"SCALING_r{round_no}.json")
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"wrote {path}")


def main() -> None:
    if "--both" in sys.argv:
        run_both(sys.argv[sys.argv.index("--both") + 1])
    else:
        print(json.dumps(run_leg()))


if __name__ == "__main__":
    main()
