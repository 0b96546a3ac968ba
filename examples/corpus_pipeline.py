"""End-to-end training-corpus curation pipeline: the LLM-data
operators composed the way a real 100 TB curation job chains them.

    documents
      → language filter (lang-id heuristic)
      → quality filter (length / stopword / diversity thresholds)
      → exact dedup (fingerprint, deterministic survivor)
      → near-dup clustering (MinHash-LSH pairs → connected components
        → keep min-id per cluster)
      → deterministic hash split (train/holdout)
      → token budget report (whitespace + BPE-ish subword counts)
      → JSONL shards (train) + parquet (holdout)

Every stage is a lazy DataFrame transformation; the only actions are
the final writes and the report aggregation. At 100 TB the same plan
holds: narrow filters run at scan bandwidth, the two dedup stages are
the only shuffles (fingerprint hash, LSH band join), and the split is
a hash-mod — no global ordering anywhere.

Usage: PYTHONPATH=. python examples/corpus_pipeline.py [sf_dir] [out_dir]
Prints one JSON line with per-stage row counts and the token budget.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile


def curate(spark, sf_dir: str, out_dir: str,
           min_tokens: int = 5, max_stopword_ratio: float = 0.9,
           min_distinct_ratio: float = 0.2,
           near_dup_threshold: float = 0.5,
           holdout_mod: int = 10) -> dict:
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions import dedup as D
    from jcf_nb_migration_spark.functions import text as T
    from jcf_nb_migration_spark.io.writers import write_jsonl
    from jcf_nb_migration_spark.registry import spread, t

    counts: dict[str, int] = {}
    docs = spread(t(spark, sf_dir, "documents"))
    counts["input"] = docs.count()

    # 1. language filter: keep documents whose predicted language
    #    matches the declared label (drops mislabeled docs).
    toks = T.tokens("text")
    docs = docs.where(T.lang_id(toks) == F.col("lang"))
    counts["after_lang_filter"] = docs.count()

    # 2. quality filter: enough tokens, not stopword-saturated, not
    #    degenerate repetition.
    n_toks = F.size(toks)
    docs = docs.where(
        (n_toks >= min_tokens)
        & ((T.stopword_hits(toks, "en").cast("double") / n_toks)
           <= max_stopword_ratio)
        & ((F.size(F.array_distinct(toks)).cast("double") / n_toks)
           >= min_distinct_ratio))
    counts["after_quality_filter"] = docs.count()

    # 3. exact dedup: one survivor (min doc_id) per normalized text.
    docs = D.exact_dedup(docs, "text", "doc_id")
    counts["after_exact_dedup"] = docs.count()

    # 4. near-dup removal: cluster the Jaccard>=threshold graph and
    #    keep the min-id representative of every cluster. Pair
    #    generation at scale = minhash_lsh_dedup; dup_clusters wraps
    #    the exact-pair variant (same output, verification scale).
    clusters = D.dup_clusters(docs, "doc_id", "text",
                              threshold=near_dup_threshold)
    docs = (docs.join(clusters, "doc_id")
            .where(F.col("doc_id") == F.col("cluster_id"))
            .drop("cluster_id"))
    counts["after_near_dedup"] = docs.count()

    # 5. deterministic split: content-stable hash-mod (reruns select
    #    the same rows; no RNG, no global sort).
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
               16, 10).cast("bigint")
    train = docs.where(h % holdout_mod != 0)
    holdout = docs.where(h % holdout_mod == 0)

    # 6. token budget: one aggregation pass over the train split.
    budget = train.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(T.tokens("text"))).alias("n_words"),
        F.sum(F.size(T.subword_tokens("text"))).alias("n_subwords"),
    ).collect()[0]

    # 7. sinks: JSONL shards for the trainer, parquet for the holdout.
    write_jsonl(train.select("doc_id", "text", "lang"),
                os.path.join(out_dir, "train_jsonl"), compression=None)
    holdout.select("doc_id", "text", "lang").write.mode("overwrite") \
        .parquet(os.path.join(out_dir, "holdout_parquet"))
    counts["train"] = train.count()
    counts["holdout"] = holdout.count()

    return {
        "metric": "corpus_curation_pipeline",
        "stages": counts,
        "train_words": int(budget["n_words"]),
        "train_subwords": int(budget["n_subwords"]),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = (sys.argv[2] if len(sys.argv) > 2
               else tempfile.mkdtemp(prefix="jcf_corpus_"))

    from jcf_nb_migration_spark import get_spark

    spark = get_spark("corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(curate(spark, sf_dir, out_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
