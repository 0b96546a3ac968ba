"""Migration pipeline at the reference's exact workload shape:
68,589 rows x 297 all-string columns (config.py:6-7), with a full STM
(scope filter, 24 tag rules, 40 two-source merges, multiple-choice
lists), the whole-row purge scan, cleaning, and a lookup remap.

The reference runs this single-threaded in pandas 0.23 with
self-described "takes a while ... constant looping through the entire
dataset" runtime (README.md:42). This script measures our engine on the
same shape end-to-end (including writing the output) — the direct
throughput-parity evidence.

Usage: PYTHONPATH=. python tools/scale_migration_bench.py [rows] [cols]
Prints one JSON line. "value" keeps its historical semantics (fresh
run_migration per CSV run — comparable across all rounds); r7 adds
"value_warm_plan" (analyzed plan reused across sink runs — the
long-lived-session shape) and "first_run_seconds" (the one-off
plan-analysis + codegen phase the r6 forensics identified).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time


def build_frame(spark, n_rows: int, n_cols: int):
    """Deterministic synthetic CRM extract: md5-derived string cells,
    ~10% blanks, a 'test' marker planted in ~0.5% of rows, an Email
    key, date and faith columns for the cleaning/lookup stages."""
    from pyspark.sql import functions as F

    base = spark.range(n_rows).repartition(
        spark.sparkContext.defaultParallelism)
    cols = [F.concat(F.lit("u"), F.col("id").cast("string"),
                     F.lit("@example.org")).alias("Email")]
    cols.append(F.concat(F.lit("20"),
                         F.lpad((F.col("id") % 22).cast("string"), 2, "0"),
                         F.lit("-"),
                         F.lpad((F.col("id") % 12 + 1).cast("string"), 2, "0"),
                         F.lit("-"),
                         F.lpad((F.col("id") % 28 + 1).cast("string"), 2, "0"))
                .alias("Join Date"))
    cols.append(F.when(F.col("id") % 7 == 0, "christian")
                .when(F.col("id") % 7 == 1, "muslim")
                .otherwise("").alias("Faith"))
    cols.append(F.when(F.col("id") % 211 == 0, F.lit("contains test marker"))
                .otherwise(F.lit("ordinary note")).alias("Notes"))
    for i in range(4, n_cols + 1):
        c = (F.when((F.col("id") + i) % 10 == 0, F.lit(""))
             .otherwise(F.substring(F.md5(
                 F.concat(F.col("id").cast("string"), F.lit(f":{i}"))),
                 1, 12)))
        cols.append(c.alias(f"Col {i:03d}"))
    return base.select(*cols)


def build_rules(n_cols: int):
    from jcf_nb_migration_spark.rules import ColumnRule, RuleSet

    rules = [
        ColumnRule("Email", target="email"),
        ColumnRule("Join Date", target="join_date"),
        ColumnRule("Faith", target="faith", multiple_choice=True),
        ColumnRule("Notes", target="notes"),
    ]
    generic = [f"Col {i:03d}" for i in range(4, n_cols + 1)]
    # 24 tag-only columns, 40 merge pairs, ~20 out of scope, the rest
    # straight renames — a realistic STM mix at the reference's width.
    for i, name in enumerate(generic):
        if i < 24:
            rules.append(ColumnRule(name, tag=f"Tag {i % 12}"))
        elif i < 104 and i % 2 == 0:
            rules.append(ColumnRule(name, target=f"merged_{i // 2}"))
        elif i < 104:
            rules.append(ColumnRule(name, target=f"merged_{(i - 1) // 2}"))
        elif i < 124:
            rules.append(ColumnRule(name, in_scope=False))
        else:
            rules.append(ColumnRule(name, target=f"field_{i}"))
    return RuleSet(rules)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 68_589
    n_cols = int(sys.argv[2]) if len(sys.argv) > 2 else 297

    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.io.writers import write_csv
    from jcf_nb_migration_spark.pipeline import MigrationConfig, run_migration

    # local mode = driver-only: give the one JVM real memory (the
    # 297-column projection + 40-merge fold needs codegen + exec room)
    import os

    # Pre-flight load gate + CPU calibrations, ported from bench.py
    # (VERDICT r12 item 3: MIGBENCH_r12 was captured at loadavg→15.7
    # and 1.29-1.34x inflation; the artifact should defend its own
    # measurement the way the query bench does). Same env knobs:
    # SPARK_GRAFT_LOAD_GATE / _CALIB_GATE / _LOAD_BACKOFF_SEC /
    # _LOAD_RETRIES.
    def _cpu_calib() -> float:
        t0 = time.time()
        acc = 0
        for i in range(3_000_000):
            acc += i * i
        return round(time.time() - t0, 4)

    def _parallel_calib(p: int = 8) -> float:
        import subprocess
        spin = "acc=0\nfor i in range(3000000):\n    acc += i*i\n"
        t0 = time.time()
        procs = [subprocess.Popen([sys.executable, "-c", spin])
                 for _ in range(p)]
        for pr in procs:
            pr.wait()
        return round(time.time() - t0, 4)

    gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.0"))
    calib_gate = float(os.environ.get("SPARK_GRAFT_CALIB_GATE", "0.35"))
    backoff_s = int(os.environ.get("SPARK_GRAFT_LOAD_BACKOFF_SEC", "60"))
    max_retries = int(os.environ.get("SPARK_GRAFT_LOAD_RETRIES", "5"))
    load_readings = [round(os.getloadavg()[0], 3)]
    calib_readings = [_cpu_calib()]
    backoffs = 0
    while ((load_readings[-1] > gate or calib_readings[-1] > calib_gate)
           and backoffs < max_retries):
        print(f"load gate: loadavg {load_readings[-1]} (gate {gate}) / "
              f"calib {calib_readings[-1]}s (gate {calib_gate}); "
              f"backoff {backoffs + 1}/{max_retries}: {backoff_s}s",
              file=sys.stderr)
        time.sleep(backoff_s)
        backoffs += 1
        load_readings.append(round(os.getloadavg()[0], 3))
        calib_readings.append(_cpu_calib())
    pcal_start = _parallel_calib()
    gate_doc = {
        "threshold": gate,
        "calib_threshold": calib_gate,
        "readings_1min": load_readings,
        "calib_readings": calib_readings,
        "backed_off_sec": backoffs * backoff_s,
        "ran_under_load": (load_readings[-1] > gate
                           or calib_readings[-1] > calib_gate),
    }
    load_start = os.getloadavg()  # before our own 32-core burn

    spark = get_spark("scale-migration-bench",
                      extra_conf={"spark.driver.memory": "48g"})
    spark.sparkContext.setLogLevel("ERROR")

    df = build_frame(spark, n_rows, n_cols)
    ruleset = build_rules(n_cols)
    religions = spark.createDataFrame(
        [("christian", "Christianity"), ("muslim", "Islam")],
        "`Values in Data` string, `Replacement Values` string")
    cfg = MigrationConfig(
        key_col="Email",
        date_cols=("Join Date",),
        value_lookups={"Faith": (religions, "Values in Data",
                                 "Replacement Values")},
    )

    # Materialize the input once (parquet) so the measured time is the
    # pipeline, not the synthetic generator.
    src = tempfile.mkdtemp(prefix="jcf_scale_src_")
    df.write.mode("overwrite").parquet(src)
    inp = spark.read.parquet(src)

    # FIRST RUN, timed separately (VERDICT r6 item 7): builds the
    # ~240-column logical plan, pays Catalyst analysis of the 40-merge
    # projection plus one-off whole-stage-codegen + JIT. The r6
    # forensics attributed the 11.6→20.4 s wall swing on byte-identical
    # code to exactly this driver-side phase (one-core /proc/stat
    # signature); reporting it as its own number turns that conclusion
    # into evidence instead of noise inside the steady-state figure.
    t0 = time.time()
    res = run_migration(inp, ruleset, cfg)
    res.output.write.format("noop").mode("overwrite").save()
    first_run = time.time() - t0

    # WARM-PLAN runs: reuse res.output — the DataFrame carries its
    # ANALYZED plan, so each further sink action skips re-analysis of
    # the 297-column tree (only physical planning + execution repeat).
    # This is the long-lived-session shape: a production deployment
    # builds the migration plan once per schema, then feeds batches
    # through it.
    # audit count once, outside any timed region (validation output,
    # not pipeline wall; it re-executes the purge subtree)
    n_removed = res.purge.removed.count()
    n_out = 0

    def csv_run(frame) -> float:
        nonlocal n_out
        t0 = time.time()
        out_dir = tempfile.mkdtemp(prefix="jcf_scale_out_")
        write_csv(frame, out_dir)            # full output sink
        n_out = spark.read.option("header", True).csv(out_dir).count()
        return time.time() - t0

    def pq_run(frame) -> float:
        t0 = time.time()
        pq_dir = tempfile.mkdtemp(prefix="jcf_scale_pq_")
        frame.write.mode("overwrite").parquet(pq_dir)
        assert spark.read.parquet(pq_dir).count() == n_out
        return time.time() - t0

    # the noop first run does NOT warm the CSV WRITER's codegen/JIT
    # (measured: the first two CSV writes pay 10-30 s of residual JIT,
    # steady state is ~5-7 s) — one untimed sink warm-up, then time
    csv_run(res.output)
    elapsed = min(csv_run(res.output), csv_run(res.output))
    elapsed_pq = min(pq_run(res.output), pq_run(res.output))

    # COLD-REPLAN runs: fresh run_migration per run — the semantics
    # every prior round's "value" used; kept for cross-round
    # comparability and as the replan-cost witness next to the warm
    # number.
    def csv_cold() -> float:
        t0 = time.time()
        r = run_migration(inp, ruleset, cfg)
        out_dir = tempfile.mkdtemp(prefix="jcf_scale_cold_")
        write_csv(r.output, out_dir)
        assert spark.read.option("header", True).csv(out_dir).count() \
            == n_out
        return time.time() - t0

    elapsed_cold = min(csv_cold(), csv_cold())

    doc = {
        "metric": "migration_pipeline_wall_seconds",
        "value": round(elapsed_cold, 2),       # historical semantics:
        #   fresh run_migration per CSV run (cross-round comparable)
        "unit": "sec",
        "value_warm_plan": round(elapsed, 2),  # analyzed plan reused
        #   across sink runs (long-lived-session steady state)
        "value_parquet_sink": round(elapsed_pq, 2),  # warm, parquet
        "first_run_seconds": round(first_run, 2),   # plan build +
        #   analysis + codegen/JIT, one-off per session/schema
        "rows_in": n_rows, "cols_in": n_cols,
        "rows_out": n_out, "rows_purged": n_removed,
        "cols_out": len(res.output.columns),
        # host-noise context (the bench.py r6 lesson): a run under
        # neighbor load self-documents instead of reading as a
        # regression; start is captured BEFORE our own 32-core burn
        "loadavg": {"start": list(load_start),
                    "end": list(os.getloadavg())},
        "load_gate": gate_doc,
        "parallel_calib_sec": {"start": pcal_start,
                               "end": _parallel_calib(), "procs": 8},
        "notes": (["ran under ambient load after backoff budget: treat "
                   "timings as upper bounds"]
                  if gate_doc["ran_under_load"] else []),
    }

    # best tracking (bench.py's bench_best.json pattern, VERDICT r11
    # item 5): record per-metric bests at the reference shape, and
    # self-adjudicate this run against them so an inflated-by-load run
    # reads as load, not regression. Only the default workload shape
    # participates (a custom rows/cols run is not comparable).
    if (n_rows, n_cols) == (68_589, 297):
        best_path = os.path.join(os.path.dirname(__file__), os.pardir,
                                 "migbench_best.json")
        best_path = os.path.abspath(best_path)
        try:
            with open(best_path) as fh:
                best = json.load(fh)
        except (OSError, ValueError):
            # a truncated/corrupt best file degrades to
            # no-best-tracking instead of aborting the run (ADVICE r12)
            best = {}
        doc["inflation_vs_best"] = {}
        for key in ("value", "value_warm_plan", "value_parquet_sink"):
            prev = best.get(key)
            cur = doc[key]
            if prev:
                doc["inflation_vs_best"][key] = round(cur / prev, 3)
            if prev is None or cur < prev:
                best[key] = cur
        with open(best_path, "w") as fh:
            json.dump(best, fh, indent=1, sort_keys=True)
            fh.write("\n")

    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
