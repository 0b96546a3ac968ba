"""Empirical scaling probe: time representative heavy operators at
sf0.01 and sf0.1 (10x the rows) in one session and report the
runtime ratio. A ~linear operator should land well under 10x wall
clock on local[32] (fixed overheads amortize; parallelism absorbs
data growth); a quadratic one would blow past it.

Third point (--third-point, VERDICT r5 item 4): the fixtures stop at
sf0.1, so a ~sf0.3 documents table is DERIVED — sf0.1 unioned three
times, replicas 2 and 3 with offset doc_ids and a deterministic vowel
permutation over the text. The permutation preserves document lengths,
token boundaries, and each replica's INTERNAL duplicate structure
while killing cross-replica shingle overlap, so a pair-producing
operator sees ~3x the true pairs, not ~9x replica cross-talk. A
three-point curve separates output-bound growth from superlinear
compute: for each probed query the output row count at every point is
recorded as evidence, and the second ratio should stay near the 3x
data factor as the first stays near 10x. Only documents-backed
queries can use the third point.

Usage: PYTHONPATH=. python tools/scaling_probe.py [--third-point] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

DEFAULT = ["minhash_lsh_dedup", "decontaminate_ngrams", "dedup_exact",
           "paragraph_dedup", "doc_containment_pairs",
           "trigram_backoff_score", "curation_pipeline_e2e",
           "simhash_near_pairs", "embedding_dedup_pairs",
           "knn_ann_label_propagation", "duplicate_spans",
           "linkgraph_pagerank", "bm25_top_docs", "sequence_packing"]

# documents-only queries eligible for the derived third point; default
# to the two whose 10x ratio exceeded 2 in the r5 table (NOTES.md)
THIRD_POINT_DEFAULT = ["doc_containment_pairs", "duplicate_spans"]

DERIVED_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".probe_fixtures", "sf0.3")
_ID_OFF = 10_000_000


def ensure_derived_sf03(spark) -> str:
    """Build (once) the derived ~sf0.3 documents table."""
    from pyspark.sql import functions as F

    out = os.path.join(DERIVED_DIR, "documents.parquet")
    if os.path.exists(out):
        return DERIVED_DIR
    src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = [src]
    for i, perm in ((1, "uoiea"), (2, "eioua")):
        reps.append(src.select(
            (F.col("doc_id") + i * _ID_OFF).alias("doc_id"),
            *[F.translate(F.col(c), "aeiou", perm).alias(c)
              if c == "text" else F.col(c)
              for c in src.columns if c != "doc_id"]))
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    df.write.mode("overwrite").parquet(out)
    return DERIVED_DIR


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--third-point"]
    third = "--third-point" in sys.argv[1:]
    names = args or (THIRD_POINT_DEFAULT if third else DEFAULT)
    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.registry import all_queries

    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    points = [("0.01", "/root/testdata/sf0.01"),
              ("0.1", "/root/testdata/sf0.1")]
    if third:
        points.append(("0.3d", ensure_derived_sf03(spark)))
    out = {}
    for name in names:
        row = {}
        for sf, sf_dir in points:
            best = float("inf")
            for _ in range(2):  # best-of-2: drop plan-compile cost
                t0 = time.time()
                qs[name].fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                best = min(best, time.time() - t0)
            if third:
                row[f"rows_{sf}"] = qs[name].fn(spark, sf_dir).count()
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            row[sf] = round(best, 3)
        row["ratio_10x_data"] = round(row["0.1"] / row["0.01"], 2)
        if third:
            row["ratio_3x_data"] = round(row["0.3d"] / row["0.1"], 2)
        out[name] = row
        print(json.dumps({name: row}))
    print(json.dumps({"summary": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
