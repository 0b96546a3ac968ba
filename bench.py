"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} plus self-documentation fields —
per-query raw run series ("runs"), host loadavg before/after
("loadavg"), fixed-loop CPU calibrations at start AND end
("cpu_calib_sec" — loadavg cannot see neighbor load on a shared host;
normalize totals by these before reading regressions, and a large
start/end gap flags contention arriving mid-run), and "notes" flagging any query measured >1.3x its
committed best (bench_best.json). The r4→r5 rounds each burned a
round-trip diagnosing driver-run inflation that turned out to be
background host load; with the raw series + loadavg in the artifact a
noisy run identifies itself. A pre-flight load gate ("load_gate" in
the artifact) additionally backs off once when the 1-min loadavg
exceeds $SPARK_GRAFT_LOAD_GATE (default 2.0) OR the calibration loop
exceeds $SPARK_GRAFT_CALIB_GATE (default 0.35 s — catches neighbor
contention loadavg can't see), and self-flags in "notes" when the run
proceeded under load anyway. r11 (VERDICT r10 item 3, after two
consecutive load-contaminated driver artifacts): the single backoff
became a BOUNDED RETRY LOOP (up to $SPARK_GRAFT_LOAD_RETRIES backoffs
of $SPARK_GRAFT_LOAD_BACKOFF_SEC, defaults 5 × 60 s — run as soon as a
reading clears the gate, else proceed after the budget), the artifact
self-adjudicates via "inflation_vs_best" (per-query min ÷ committed
best: UNIFORM inflation ⇒ ambient load, a single-query outlier ⇒
regression — the forensics r9/r10 did by hand), and the full JSON is
ALSO written to bench_last_full.json beside this file so a
tail-truncated driver capture loses nothing.

Each query is executed with the noop sink (full computation, no
collect/serialization overhead) after a session warm-up, best of
$SPARK_GRAFT_BENCH_RUNS in-process runs (default 3).

r12 additions (VERDICT r11 item 2 — the two persistent inflation
flags turned out to be CORE CONTENTION, which neither loadavg-at-start
nor the single-core calibration can see: wide parallel stages ran
1.5-2x while single-row-group-bound queries in the SAME run sat at
their bests):
- "parallel_calib_sec": wall time of 8 concurrent spin subprocesses at
  start/end — inflates with the share of cores neighbors hold; its
  best is auto-maintained in bench_best.json (it measures the host).
- per-query RETRY-ON-LOAD: a query whose min exceeds 1.25x its
  committed best waits out the load burst (bounded) and re-measures up
  to twice; every raw run stays in "runs".
- "queries_load_normalized": min x (parallel_calib_best / this run's),
  capped at 1 — the diagnostic view separating "engine got slower"
  from "host had fewer cores"; "queries" stays the raw wall.

r13 (VERDICT r12 item 2): the >1.3x notes and the retry trigger now
adjudicate against "steady_median" — the median of the last ≤9
committed driver-round mins per query (auto-appended "history" in
bench_best.json) — instead of the min-ever 'best'. A one-day
lower-tail outlier best (decontaminate_ngrams' 0.895 s vs its
1.3-1.4 s measured steady state) can no longer flag every later
ordinary day; a genuine plan regression still flags, because the
median follows the recent regime. "inflation_vs_best" (min-ever view)
stays in the artifact for cross-round forensics.

r13 cont: the >1.3x notes adjudicate against the LOAD-NORMALIZED min
(queries_load_normalized) rather than the raw wall whenever a
parallel-calibration reference exists. Rationale measured the same
day: at 1-min loadavg 0.13 the parallel calibration still read
0.70 s vs its 0.298 s best — the host had ~2.4x less parallel
throughput than the best recorded day with NOTHING visible in
loadavg, and every query inflated uniformly (median 1.6x). Dividing
the host calibration out is the discriminator the note exists for: a
plan regression inflates the query but not the calibration and still
flags; a degraded-host day inflates both and no longer spams a note
per query. Raw walls, inflation_vs_best, and inflation_vs_steady all
stay in the artifact.

r14 (VERDICT r13 items 1 and 6):
- The PRINTED line is now the bare contract (metric, value, unit,
  queries, sf, notes, full_artifact) — the r13 driver capture
  truncated the full artifact past parseability and cost the round its
  entire round-over-round table. Every diagnostic block (runs,
  inflation views, calibrations, loadavg, steady refs) lives ONLY in
  the sibling bench_last_full.json, pointed to by "full_artifact".
  Nothing was removed from the artifact, only from stdout; the timed
  region and the queries/value fields are unchanged.
- Steady-median drift guard: the steady median follows the recent
  regime by design, so consecutive degraded rounds could ratchet the
  >1.3x flag reference up and hide a sustained regression. The guard
  (adjudicate_drift) additionally flags any query whose
  LOAD-NORMALIZED min exceeds 1.5x its MIN-EVER best for 2+
  consecutive driver rounds; per-round normalized mins are kept in
  bench_best.json::history_norm (≤9, like history).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def adjudicate_drift(normalized: dict | None, best_known: dict,
                     hist_norm: dict, factor: float = 1.5) -> list[str]:
    """Steady-median drift guard (VERDICT r13 item 6).

    The >1.3x regression notes compare against the steady-state MEDIAN
    of recent driver-round mins, which follows the recent regime — a
    run of consecutively degraded rounds ratchets the median up and
    quietly weakens the flag. This guard is anchored to the immovable
    MIN-EVER best instead: flag any query whose load-normalized min
    exceeds ``factor``x its min-ever for 2+ CONSECUTIVE driver rounds
    (this run plus the previous round's entry in ``hist_norm``, the
    per-round normalized-min history — this run NOT yet appended).
    One degraded day stays silent (the load-normalized single-round
    machinery already adjudicates it); two in a row flags even when
    the median has followed the regression down.
    """
    notes: list[str] = []
    for n in sorted(normalized or {}):
        v = normalized[n]
        b = best_known.get(n)
        if not b or b <= 0:
            continue
        prev = hist_norm.get(n) or []
        if v > factor * b and prev and prev[-1] > factor * b:
            notes.append(
                f"{n}: load-normalized min {v}s exceeds {factor}x its "
                f"min-ever best {b}s for 2+ consecutive driver rounds "
                f"(previous round {prev[-1]}s) — drift guard: suspect a "
                "sustained regression the steady-median ratchet may be "
                "absorbing")
    return notes


def cap_notes(notes: list[str], limit: int = 8) -> list[str]:
    """Cap the PRINTED contract line's notes (r14): notes are the one
    contract field without a fixed size, so a globally bad round could
    flag every query and re-bloat the stdout line past the driver's
    capture — the exact failure the bare-contract line exists to
    prevent. The artifact (bench_last_full.json) keeps the full list."""
    if len(notes) <= limit:
        return notes
    return notes[:limit] + [
        f"(+{len(notes) - limit} more notes — see full_artifact)"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.1
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_best.json")) as fh:
            bb = json.load(fh)
        same_sf = abs(sf - bb.get("sf", -1)) < 1e-9
        best_known = bb["best"] if same_sf else {}
        steady = bb.get("steady_median", {}) if same_sf else {}
    except (OSError, ValueError, KeyError):
        bb = {}
        same_sf = False
        best_known = {}
        steady = {}
    # Adjudication reference (VERDICT r12 item 2): the >1.3x in-artifact
    # notes and the retry-on-load trigger compare against the STEADY-
    # STATE MEDIAN of the last committed driver-round mins, not the
    # min-ever — a one-day lower-tail outlier best (decontaminate's
    # r10 0.895 s vs its 1.3-1.4 s steady state) otherwise flags every
    # later ordinary day. 'best' remains the min-ever and still feeds
    # the inflation_vs_best diagnostic view.
    steady_ref = {n: steady.get(n, b) for n, b in best_known.items()}

    # Pre-flight load gate (VERDICT r7 item 4): two driver rounds
    # running, the committed artifact was captured under loadavg 4.5-5.3
    # and needed post-hoc forensics to exonerate. If the 1-min load is
    # already above the gate, back off once and re-check; record every
    # reading and the decision so the artifact is interpretable
    # standalone. The run proceeds either way — the gate defends the
    # measurement, it doesn't refuse to produce one.
    gate = float(os.environ.get("SPARK_GRAFT_LOAD_GATE", "2.0"))
    backoff_s = int(os.environ.get("SPARK_GRAFT_LOAD_BACKOFF_SEC", "60"))
    max_retries = int(os.environ.get("SPARK_GRAFT_LOAD_RETRIES", "5"))

    # CPU calibration fingerprint: loadavg cannot see NEIGHBOR load on
    # a shared host (same-day loadavg≈0 runs have measured 9.8 s vs
    # 12.6 s totals), so time a fixed pure-Python loop. Artifacts
    # become comparable — a run whose calib is 1.3x another's ran on a
    # 1.3x-slower effective CPU — and the gate below backs off on a
    # slow calibration exactly as it does on high loadavg.
    def _cpu_calib() -> float:
        t0 = time.time()
        acc = 0
        for i in range(3_000_000):
            acc += i * i
        return round(time.time() - t0, 4)

    calib_gate = float(os.environ.get("SPARK_GRAFT_CALIB_GATE", "0.35"))
    load_readings = [round(os.getloadavg()[0], 3)]
    calib_readings = [_cpu_calib()]
    backoffs = 0
    while ((load_readings[-1] > gate or calib_readings[-1] > calib_gate)
           and backoffs < max_retries):
        print(f"load gate: 1-min loadavg {load_readings[-1]} (gate "
              f"{gate}) / cpu calib {calib_readings[-1]}s (gate "
              f"{calib_gate}); backoff {backoffs + 1}/{max_retries}: "
              f"{backoff_s}s then re-check", file=sys.stderr)
        time.sleep(backoff_s)
        backoffs += 1
        load_readings.append(round(os.getloadavg()[0], 3))
        calib_readings.append(_cpu_calib())
    load_gate = {
        "threshold": gate,
        "calib_threshold": calib_gate,
        "readings_1min": load_readings,
        "calib_readings": calib_readings,
        "backed_off_sec": backoffs * backoff_s,
        "ran_under_load": (load_readings[-1] > gate
                           or calib_readings[-1] > calib_gate),
    }
    load_start = os.getloadavg()
    calib_sec = calib_readings[-1]

    # PARALLEL calibration (r12): the single-core loop above stays
    # flat while neighbors eat CORES — r11/r12 forensics found runs
    # where calib was its quiet-day 0.15 s yet the wide parallel
    # stages (decontaminate's explode, the e2e pipeline) ran 1.5-2x
    # while single-row-group-bound queries sat at their bests. That
    # signature is core contention, invisible to both loadavg-at-start
    # and single-core calib. Measure it directly: P concurrent spin
    # subprocesses, wall until all finish. Idle host ≈ the single-core
    # time; contended host inflates proportionally to the share of
    # cores the neighbors hold.
    def _parallel_calib(p: int = 8) -> float:
        import subprocess
        spin = ("acc=0\nfor i in range(3000000):\n    acc += i*i\n")
        t0 = time.time()
        procs = [subprocess.Popen([sys.executable, "-c", spin])
                 for _ in range(p)]
        for pr in procs:
            pr.wait()
        return round(time.time() - t0, 4)

    pcal_start = _parallel_calib()

    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.registry import all_queries

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up JVM/codegen/parquet-reader/fold paths once, outside any
    # measurement (otherwise the alphabetically-first query absorbs all
    # cold-start cost).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    warm.selectExpr(
        "aggregate(transform(embedding, x -> cast(x as double)), 0D,"
        " (a, v) -> a + v) AS s"
    ).agg({"s": "sum"}).collect()

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    notes: list[str] = []
    for name, q in sorted(all_queries().items()):
        if not q.headline:
            continue
        # best of N runs: the first may absorb one-off plan/codegen
        # compilation; the min reflects steady-state throughput, and
        # the raw series exposes run-to-run noise in the artifact
        series = []
        for _ in range(n_runs):
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            series.append(round(time.time() - t0, 3))
        # Retry-on-load (r12): the host's neighbor load is BURSTY
        # (1-min loadavg swings 1→9 inside a bench run), so a query
        # whose 3 runs landed in a burst reads inflated while its
        # neighbors in the same artifact sit at their bests. If the
        # min exceeds 1.25x the committed best, wait out the burst
        # (bounded) and re-measure up to twice — every raw run stays
        # in the series, so the artifact still shows the burst.
        retries = 0
        while (name in steady_ref and retries < 2
               and min(series) > 1.25 * steady_ref[name]):
            waited = 0
            while os.getloadavg()[0] > gate and waited < 60:
                time.sleep(10)
                waited += 10
            retries += 1
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            series.append(round(time.time() - t0, 3))
        runs[name] = series
        timings[name] = min(series)
        # Queries persist intermediates (shingle index, per-doc
        # signatures); drop them so later queries aren't measured
        # under accumulated cache memory pressure.
        spark.catalog.clearCache()
        # Heavy explode queries (decontaminate_ngrams) leave young-gen
        # garbage that taxes whichever query runs next; collect it now
        # so each measurement starts from a quiet heap. Measured r5:
        # without this, embedding_dedup_pairs reads +30% when it runs
        # after decontaminate_ngrams, and matches its r2 driver number
        # (0.63 s) with it.
        spark.sparkContext._jvm.System.gc()

    if load_gate["ran_under_load"]:
        # Name the gate that actually tripped — a loadavg-phrased note
        # on a calibration-only trip mislabels the self-diagnosis.
        tripped = []
        if load_readings[-1] > gate:
            tripped.append(
                f"1-min loadavg {load_readings[-1]} > gate {gate}")
        if calib_readings[-1] > calib_gate:
            tripped.append(
                f"cpu calibration {calib_readings[-1]}s > gate "
                f"{calib_gate}s")
        notes.append(
            "ran under ambient load (" + "; ".join(tripped) +
            " after backoff): treat timings as upper bounds; compare "
            "the per-query runs series against bench_best.json")
    # Per-query inflation vs committed best: the self-adjudication
    # field (uniform inflation across unrelated queries ⇒ ambient
    # load; a single-query outlier ⇒ plan regression). Median is the
    # one-number summary a reader checks first.
    inflation = {n: round(timings[n] / best_known[n], 2)
                 for n in timings if n in best_known and best_known[n] > 0}
    med_inflation = None
    if inflation:
        vals = sorted(inflation.values())
        med_inflation = vals[len(vals) // 2]
    inflation_steady = {
        n: round(timings[n] / steady_ref[n], 2)
        for n in timings if steady_ref.get(n, 0) > 0}
    pcal_end = _parallel_calib()
    # Load-normalized per-query seconds (DIAGNOSTIC, clearly labeled —
    # "queries" stays the raw wall): scale each min by the ratio of
    # the committed best parallel calibration to this run's, capped at
    # 1 so an idle run never reads faster than measured. A reader
    # comparing rounds uses this to separate "the engine got slower"
    # from "the host had fewer cores to give".
    pcal_best = None
    bb_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_best.json")
    try:
        pcal_best = bb.get("parallel_calib_best")
    except NameError:
        pass
    pcal_now = min(pcal_start, pcal_end)
    if pcal_now > 0 and (pcal_best is None or pcal_now < pcal_best):
        # the calib best is auto-maintained (it measures the HOST, not
        # the engine — query bests stay a manual, committed decision)
        try:
            with open(bb_path) as fh:
                bb_doc = json.load(fh)
            bb_doc["parallel_calib_best"] = pcal_now
            with open(bb_path, "w") as fh:
                json.dump(bb_doc, fh, indent=1)
            pcal_best = pcal_best or pcal_now
        except (OSError, ValueError):
            pass
    normalized = None
    if pcal_best and pcal_now > 0:
        factor = min(1.0, pcal_best / pcal_now)
        normalized = {n: round(v * factor, 3) for n, v in timings.items()}
    # Per-query >1.3x flags, adjudicated against the LOAD-NORMALIZED
    # min when a calibration reference exists (raw otherwise). The
    # calibration measures the HOST (8 parallel busy-loop procs), so
    # dividing it out is exactly the discriminator the note wants: a
    # slow ambient day inflates raw walls AND the calibration together
    # (normalized stays flat — no flag), while a plan regression
    # inflates only the query (normalized flags it). Raw walls and
    # both inflation views stay in the artifact either way.
    for name in timings:
        if name not in steady_ref or steady_ref[name] <= 0:
            continue
        adj = (normalized or timings)[name]
        if adj > 1.3 * steady_ref[name]:
            notes.append(
                f"{name}: load-normalized min {adj}s (raw "
                f"{timings[name]}s) is {adj / steady_ref[name]:.2f}x "
                f"its steady-state median {steady_ref[name]}s "
                f"(min-ever {best_known.get(name)}s) — suspect a plan "
                "regression (host throughput already divided out via "
                "parallel_calib)")
    # Append this run's mins to the per-query history and refresh the
    # steady-state medians (auto-maintained like parallel_calib_best:
    # the history is a RECORD of measured driver-round conditions, not
    # a claim about the engine — query 'best' entries stay a manual,
    # committed decision). Cap 9 so the median tracks the recent regime
    # and a months-old outlier ages out.
    if same_sf and timings:
        import statistics
        try:
            with open(bb_path) as fh:
                bb_doc = json.load(fh)
            # Drift guard (r14): adjudicated BEFORE this run is
            # appended, against the min-ever best — see adjudicate_drift.
            norm_now = normalized or timings
            notes.extend(adjudicate_drift(
                norm_now, bb_doc.get("best", {}),
                bb_doc.get("history_norm", {})))
            hist = bb_doc.setdefault("history", {})
            hist_norm = bb_doc.setdefault("history_norm", {})
            for n, v in timings.items():
                hist[n] = (hist.get(n, []) + [v])[-9:]
                hist_norm[n] = (hist_norm.get(n, []) + [norm_now[n]])[-9:]
            bb_doc["steady_median"] = {
                n: round(statistics.median(v), 3) for n, v in hist.items()}
            with open(bb_path, "w") as fh:
                json.dump(bb_doc, fh, indent=1)
                fh.write("\n")
        except (OSError, ValueError):
            pass
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs": runs,
        "inflation_vs_best": inflation,
        "median_inflation_vs_best": med_inflation,
        "inflation_vs_steady": inflation_steady,
        "steady_median_ref": {n: steady_ref[n] for n in timings
                              if n in steady_ref},
        "loadavg": {"start": list(load_start),
                    "end": list(os.getloadavg())},
        "load_gate": load_gate,
        "cpu_calib_sec": {"start": calib_sec, "end": _cpu_calib()},
        "parallel_calib_sec": {"start": pcal_start, "end": pcal_end,
                               "best": pcal_best, "procs": 8},
        "queries_load_normalized": normalized,
        "notes": notes,
    }
    # Sibling full-artifact file: the driver's tail capture truncated
    # the stdout JSON twice (r9/r10) — the complete artifact survives
    # here regardless of how much of the printed line is kept.
    # Non-default-SF smoke runs get their own file: a sf0.001 smoke
    # must never clobber the validated sf0.1 artifact (bit us in r13).
    contract_keys = ("metric", "value", "unit", "queries", "sf", "notes")
    line = {k: out[k] for k in contract_keys}
    line["notes"] = cap_notes(line["notes"])
    try:
        name = ("bench_last_full.json" if abs(sf - 0.1) < 1e-9
                else f"bench_last_full_sf{sf}.json")
        full = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            name)
        with open(full, "w") as fh:
            json.dump(out, fh, indent=1)
        line["full_artifact"] = name
    except OSError:
        pass
    # r14 (VERDICT r13 item 1): print ONLY the bare contract — the r12
    # full-diagnostics line grew past the driver's stdout capture and
    # was tail-truncated beyond parseability, zeroing the r13
    # round-over-round table. All diagnostic blocks (runs, inflation
    # views, calibrations, loadavg, steady refs) remain in the sibling
    # full_artifact file; nothing is dropped, only moved off stdout.
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
