"""Stopword heavy-hitter probe for the retrieval family's tok-keyed
shuffles (VERDICT r7 item 7).

The retrieval stack's only corpus-sized shuffles key on tokens, and
token frequency is Zipfian — so this probe builds a corpus with a
deliberately brutal hot key (one stopword present in 50% of documents,
multiple times each) at three sizes (N, 3N, 9N docs) and times the
three tok-keyed shapes the repo ships:

1. ``postings``  — the lexical build's tf shuffle, groupBy(tok,
   doc_id). doc_id rides in the key, so the hot token's rows spread
   over every partition: structurally skew-free, expected ~linear.
2. ``df_agg``    — per-token document frequency over the postings,
   groupBy(tok). A hot key with a COMMUTATIVE aggregate collapses in
   the map-side partial aggregation (each task emits one row per tok),
   so the reduce side sees ≤ tasks×vocab rows: expected ~linear.
3. ``topk_window`` — inverted_index_postings' per-token tf-ranked
   top-8, row_number over Window.partitionBy(tok). A window is NOT
   partially aggregable: every posting of the hot token must sort in
   ONE task. This is the genuinely skew-sensitive shape — the probe
   demonstrates the repo's guard: a two-phase SALTED top-k (per-salt
   top-8, then top-8-of-top-8s — exact for per-key top-k because a
   global top-8 member must be a top-8 member of its salt bucket)
   against the naive single-window baseline.

Verdict criterion: every 3x leg ≤ 2 for the shapes the engine actually
uses (1, 2, salted 3). The naive window is measured as the
counter-example, not a shipped plan.

Run: PYTHONPATH=. python tools/skew_probe.py [base_docs]
Prints one JSON line; paste the table into NOTES.md.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F


def corpus(spark, n_docs: int, toks_per_doc: int = 40):
    """Deterministic Zipf-ish corpus: doc i holds toks_per_doc tokens
    drawn from a power-law-ish vocab; every EVEN doc additionally
    carries the stopword 'the' 8 times (50% doc frequency, hot key)."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 2 == 0,
                   F.array_repeat(F.lit("the"), 8)
                   ).otherwise(F.array().cast("array<string>")),
            F.transform(
                F.sequence(F.lit(1), F.lit(toks_per_doc)),
                # power-law-ish: token id = j*j*doc variations mod vocab
                lambda j: F.concat(
                    F.lit("w"),
                    F.conv(F.hex((F.col("id") * j + j * j) % 997),
                           16, 10)),
            ),
        ).alias("w"))


def postings_frame(toks):
    occ = toks.select("doc_id", F.size("w").alias("dl"),
                      F.explode("w").alias("tok"))
    return (occ.groupBy("tok", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.first("dl").alias("dl")))


def run(spark, n_docs: int, reps: int = 2) -> dict[str, float]:
    """Best-of-`reps` wall per shape. The postings frame is
    materialized to parquet once per scale and every downstream shape
    re-reads it from disk — stable, repeatable input that decouples
    the per-tok shapes from the explode/groupBy upstream (a persisted
    in-memory copy skewed an earlier version of this probe through
    cache pressure far more than the hot key did)."""
    import shutil
    import tempfile

    toks = corpus(spark, n_docs)
    out: dict[str, float] = {}

    def best(name, df_fn):
        series = []
        for _ in range(reps):
            t0 = time.time()
            df_fn().write.format("noop").mode("overwrite").save()
            series.append(round(time.time() - t0, 2))
        out[name] = min(series)

    # shape 1: the build's tf shuffle (explode + groupBy(tok, doc_id))
    best("postings", lambda: postings_frame(toks))

    tmp = tempfile.mkdtemp(prefix="skew_probe_")
    try:
        postings_frame(toks).write.mode("overwrite").parquet(tmp)
        post = spark.read.parquet(tmp)

        best("df_agg", lambda: post.groupBy("tok")
             .agg(F.count(F.lit(1)).alias("df")))

        w = Window.partitionBy("tok").orderBy(F.desc("tf"), "doc_id")
        best("topk_window_naive",
             lambda: post.withColumn("rn", F.row_number().over(w))
             .where(F.col("rn") <= 8))

        ws = Window.partitionBy("tok", "salt") \
            .orderBy(F.desc("tf"), "doc_id")
        wg = Window.partitionBy("tok").orderBy(F.desc("tf"), "doc_id")
        best("topk_window_salted",
             lambda: post
             .withColumn("salt", (F.col("doc_id") % 16).cast("int"))
             .withColumn("rn", F.row_number().over(ws))
             .where(F.col("rn") <= 8)
             .drop("rn", "salt")
             .withColumn("rn", F.row_number().over(wg))
             .where(F.col("rn") <= 8))

        # the skew itself, deterministically: postings rows of the
        # hottest key (what a naive per-tok window sorts in ONE task).
        # Reported separately from the wall-clock shapes — it is a row
        # count whose 3x growth is the probe's premise, not a timing
        # leg to judge against the <=2 criterion.
        out["_hot_key_rows"] = post.groupBy("tok").count() \
            .agg(F.max("count")).head()[0]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    from jcf_nb_migration_spark import get_spark

    spark = get_spark("skew_probe",
                      extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    # full warm-up pass at a throwaway size: codegen, shuffle services,
    # window exec — so scale 1x doesn't absorb the one-off costs
    run(spark, max(base // 4, 1000))
    scales = [base, 3 * base, 9 * base]
    rows = {n: run(spark, n) for n in scales}
    hot = {n: rows[n].pop("_hot_key_rows") for n in scales}
    ratios = {
        shape: [round(rows[scales[i + 1]][shape]
                      / max(rows[scales[i]][shape], 1e-9), 2)
                for i in range(2)]
        for shape in rows[scales[0]]
    }
    print(json.dumps({"docs": scales, "timings": rows,
                      "ratios_3x": ratios, "hot_key_rows": hot}))
    spark.stop()


if __name__ == "__main__":
    main()
