"""Empirical scaling probe: time representative heavy operators at
sf0.01 and sf0.1 (10x the rows) in one session and report the
runtime ratio. A ~linear operator should land well under 10x wall
clock on local[32] (fixed overheads amortize; parallelism absorbs
data growth); a quadratic one would blow past it.

Usage: PYTHONPATH=. python tools/scaling_probe.py [query ...]
"""

from __future__ import annotations

import json
import sys
import time

DEFAULT = ["minhash_lsh_dedup", "decontaminate_ngrams", "dedup_exact",
           "paragraph_dedup", "doc_containment_pairs",
           "trigram_backoff_score", "curation_pipeline_e2e",
           "simhash_near_pairs", "embedding_dedup_pairs",
           "knn_ann_label_propagation", "duplicate_spans",
           "linkgraph_pagerank", "bm25_top_docs", "sequence_packing"]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.registry import all_queries

    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out = {}
    for name in names:
        row = {}
        for sf in ("0.01", "0.1"):
            sf_dir = f"/root/testdata/sf{sf}"
            best = float("inf")
            for _ in range(2):  # best-of-2: drop plan-compile cost
                t0 = time.time()
                qs[name].fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                best = min(best, time.time() - t0)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            row[sf] = round(best, 3)
        row["ratio_10x_data"] = round(row["0.1"] / row["0.01"], 2)
        out[name] = row
        print(json.dumps({name: row}))
    print(json.dumps({"summary": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
