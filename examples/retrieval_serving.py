"""Retrieval serving lifecycle: the build-once / serve-many / maintain
loop a RAG stack runs against a 100 TB corpus, composed from the
persisted index layouts in io/lexical.py.

    documents
      → tokenize (codegen'd whitespace tokens)
      → BUILD: tok-bucketed postings table + additive corpus stats
               (+ the opt-in positional table for phrase queries,
               + the doc_id-bucketed docstore for content fetches)
      → SERVE: BM25 probes (bucket-pruned scan, ZERO Exchange on the
               tok-keyed df aggregate), phrase / proximity probes
               (bucket-pruned positional adjacency joins)
      → FETCH: ranked ids → bucket-pruned point lookup of the content
               (io/docstore.py — the rank→fetch loop)
      → INGEST: ledgered micro-batch appends (at-least-once delivery
               made effectively-once; shared batch-id contract)
      → MAINTAIN: fragmentation-gated compaction + deletion-debt
               vacuum
      → MUTATE: content corrections via bucket-COW MERGE
               (docstore_upsert) and GDPR purges (tombstoned out of
               ranking immediately, content COW-deleted, stats
               reconciled at vacuum) — no corpus pass between rebuilds

At 100 TB the build is the one corpus pass; every probe after it reads
a few buckets' worth of postings. The same functions back the
oracle-checked queries bm25_top_docs_served / phrase_match_served —
this example strings them into the operational loop.

Usage: PYTHONPATH=. python examples/retrieval_serving.py [sf_dir] [idx_dir]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F


def serve_demo(spark, sf_dir: str, idx_dir: str) -> dict:
    """Run the full lifecycle; returns a summary dict (tested by
    tests/test_e2e_demo.py)."""
    from jcf_nb_migration_spark.functions import text as T
    from jcf_nb_migration_spark.io.docstore import (
        docstore_append, docstore_build, docstore_fetch)
    from jcf_nb_migration_spark.io.lexical import (
        bm25_probe, lexical_index_append, lexical_index_build,
        lexical_index_maintain, phrase_probe, positional_index_build,
        proximity_probe)
    from jcf_nb_migration_spark.queries.retrieval_ops import (
        BM25_B, BM25_K1, BM25_TERMS, PHRASE, PROX_TERMS, PROX_WINDOW)
    from jcf_nb_migration_spark.registry import t

    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    base = toks.where(F.col("doc_id") % 10 != 0)
    batches = [toks.where(F.col("doc_id") % 10 == r) for r in (0,)]

    # BUILD once (the corpus pass): both index layouts + the docstore
    lexical_index_build(base, "demo_lex", os.path.join(idx_dir, "lex"))
    positional_index_build(toks, "demo_pos",
                           os.path.join(idx_dir, "pos"))
    docstore_build(docs.where(F.col("doc_id") % 10 != 0), "demo_ds",
                   os.path.join(idx_dir, "ds"))

    # INGEST: ledgered micro-batch append (replays are no-ops) —
    # index and docstore share the batch-id contract
    appended = [lexical_index_append(b, "demo_lex",
                                     os.path.join(idx_dir, "lex"),
                                     batch_id=i)
                for i, b in enumerate(batches)]
    docstore_append(docs.where(F.col("doc_id") % 10 == 0), "demo_ds",
                    os.path.join(idx_dir, "ds"), batch_id=0)

    # MAINTAIN: compact when fragmented (no-op on this tiny demo
    # unless the threshold is forced down)
    compacted = lexical_index_maintain(
        spark, "demo_lex", os.path.join(idx_dir, "lex"),
        max_files_per_bucket=1)

    # SERVE: the three probe families
    bm25 = bm25_probe(spark, "demo_lex", os.path.join(idx_dir, "lex"),
                      BM25_TERMS, BM25_K1, BM25_B, k=10).collect()
    phrase = phrase_probe(spark, "demo_pos",
                          os.path.join(idx_dir, "pos"), PHRASE,
                          k=10).collect()
    prox = proximity_probe(spark, "demo_pos",
                           os.path.join(idx_dir, "pos"), PROX_TERMS,
                           window=PROX_WINDOW, k=10).collect()
    # FETCH: the ranked ids become a bucket-pruned point lookup of the
    # content — the rank→fetch loop doc_fetch_served runs
    fetched = docstore_fetch(spark, "demo_ds",
                             os.path.join(idx_dir, "ds"),
                             [r["doc_id"] for r in bm25]).collect()

    # MUTATE (r10): the lifecycle between rebuilds — a content
    # correction (MERGE) and a GDPR purge, no corpus pass in either.
    from jcf_nb_migration_spark.io.docstore import (docstore_delete,
                                                    docstore_upsert)
    from jcf_nb_migration_spark.io.lexical import (
        lexical_index_delete, lexical_index_vacuum)

    fixed_id = bm25[1]["doc_id"]   # v2 of one stored document: COW —
    # only the buckets its id hashes into rewrite
    docstore_upsert(
        docs.where(F.col("doc_id") == fixed_id)
        .withColumn("text", F.concat(F.lit("v2: "), F.col("text"))),
        "demo_ds", os.path.join(idx_dir, "ds"), batch_id="fix-1")
    purged_id = bm25[0]["doc_id"]  # GDPR purge: tombstoned out of
    # ranking immediately (stats stay until vacuum — Lucene scoring),
    # content physically gone from the docstore on return
    lexical_index_delete(spark, "demo_lex",
                         os.path.join(idx_dir, "lex"), [purged_id])
    docstore_delete(spark, "demo_ds", os.path.join(idx_dir, "ds"),
                    [purged_id], batch_id="purge-1")
    bm25_after = bm25_probe(spark, "demo_lex",
                            os.path.join(idx_dir, "lex"),
                            BM25_TERMS, BM25_K1, BM25_B, k=10).collect()
    vacuum = lexical_index_vacuum(spark, "demo_lex",
                                  os.path.join(idx_dir, "lex"))
    return {
        "fixed_id": fixed_id,
        "fixed_text": docstore_fetch(
            spark, "demo_ds", os.path.join(idx_dir, "ds"),
            [fixed_id]).head()["text"],
        "purged_id": purged_id,
        "purged_still_ranked": any(r["doc_id"] == purged_id
                                   for r in bm25_after),
        "purged_content_rows": docstore_fetch(
            spark, "demo_ds", os.path.join(idx_dir, "ds"),
            [purged_id]).count(),
        "vacuum": vacuum,
        "appended": appended,
        "compacted": compacted,
        "fetched": [(r["doc_id"], r["source"]) for r in fetched],
        "bm25_top": [(r["doc_id"], r["bm25"]) for r in bm25],
        "phrase_hits": [(r["doc_id"], r["n_occurrences"])
                        for r in phrase],
        "proximity_hits": [(r["doc_id"], r["min_span"]) for r in prox],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    idx_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/retrieval_serving_demo"
    from jcf_nb_migration_spark import get_spark

    spark = get_spark("retrieval-serving-demo")
    spark.sparkContext.setLogLevel("ERROR")
    summary = serve_demo(spark, sf_dir, idx_dir)
    for k, v in summary.items():
        print(f"{k}: {v}")
    spark.stop()


if __name__ == "__main__":
    main()
