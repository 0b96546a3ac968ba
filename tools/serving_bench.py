"""Serving-path latency: probe-only vs ad-hoc recompute.

The *_served registry queries rebuild their index on every call so the
driver's oracle comparison stays deterministic and self-contained —
which means no committed artifact shows the number a deployment
actually cares about: the latency of a probe against an ALREADY-BUILT
index vs recomputing from the corpus. This tool builds each serving
layout once at the target SF, then times (best of N):

- BM25:    bm25_probe (bucket-pruned postings scan)   vs the ad-hoc
           corpus-pass scorer (bm25_top_docs's plan)
- phrase:  phrase_probe (positional index)            vs the ad-hoc
           posexplode scan (phrase_match_docs's plan)
- ANN:     ivf_index_probe (nprobe partition dirs)    vs the on-the-fly
           IVF probe that re-assigns the corpus per query
- fetch:   docstore_fetch (literal-IN bucket pruning) vs a full-scan
           filter over documents.parquet for the same ids

Prints one JSON line. Usage:
    PYTHONPATH=. python tools/serving_bench.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def _best_of(n, fn):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 4)


def _data_touched(df) -> dict:
    """Post-bucket-filter read set (files + bytes) via the shared
    FilePartition walker (jcf_nb_migration_spark.testing.files_touched
    — see its docstring for why the numFiles METRIC can't show bucket
    pruning)."""
    from jcf_nb_migration_spark.testing import files_touched

    out = files_touched(df)
    return {"files": out["files"], "bytes": out["bytes"]}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.functions import text as T
    from jcf_nb_migration_spark.io.docstore import (docstore_build,
                                                    docstore_fetch)
    from jcf_nb_migration_spark.io.layout import (ivf_index_probe,
                                                  ivf_index_write)
    from jcf_nb_migration_spark.io.lexical import (bm25_probe,
                                                   lexical_index_build,
                                                   phrase_probe,
                                                   positional_index_build)
    from jcf_nb_migration_spark.queries.retrieval_ops import (
        BM25_B, BM25_K1, BM25_TERMS, PHRASE, _bm25_frames, _bm25_perdoc,
        _positions)
    from jcf_nb_migration_spark.registry import t

    spark = get_spark("serving-bench")
    spark.sparkContext.setLogLevel("ERROR")

    base = os.path.join(tempfile.gettempdir(), "jcf_serving_bench",
                        spark.sparkContext.applicationId)
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", T.tokens("text").alias("w"))

    t0 = time.time()
    lexical_index_build(toks, "svb_lex", os.path.join(base, "lex"))
    positional_index_build(toks, "svb_pos", os.path.join(base, "pos"))
    docstore_build(docs, "svb_ds", os.path.join(base, "ds"))
    build_sec = round(time.time() - t0, 3)

    # the operational lifecycle compacts after the parallel build
    # (one file per bucket — a parallel write leaves one file per
    # task×bucket, and every probe pays a footer-open per file)
    from jcf_nb_migration_spark.io.docstore import docstore_compact
    from jcf_nb_migration_spark.io.lexical import (
        lexical_index_compact, positional_index_compact)
    t0 = time.time()
    lexical_index_compact(spark, "svb_lex", os.path.join(base, "lex"))
    positional_index_compact(spark, "svb_pos",
                             os.path.join(base, "pos"))
    docstore_compact(spark, "svb_ds", os.path.join(base, "ds"))
    compact_sec = round(time.time() - t0, 3)

    # --- BM25: probe vs ad-hoc corpus pass
    def bm25_served():
        bm25_probe(spark, "svb_lex", os.path.join(base, "lex"),
                   BM25_TERMS, BM25_K1, BM25_B, k=20).collect()

    def bm25_adhoc():
        _, bm = _bm25_frames(toks)
        (bm.orderBy(F.desc("bm25"), "doc_id").limit(20)).collect()

    # --- phrase: probe vs ad-hoc positional scan
    def phrase_served():
        phrase_probe(spark, "svb_pos", os.path.join(base, "pos"),
                     PHRASE, k=20).collect()

    def phrase_adhoc():
        occ = _positions(docs, PHRASE)
        a = occ.where(F.col("tok") == PHRASE[0]).alias("a")
        b = occ.where(F.col("tok") == PHRASE[1]).alias("b")
        (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                & (F.col("b.pos") == F.col("a.pos") + 1))
         .groupBy(F.col("a.doc_id"))
         .count().orderBy(F.desc("count"), "doc_id")
         .limit(20)).collect()

    # --- ANN: partition-pruned IVF index vs brute-force corpus scan
    emb = t(spark, sf_dir, "embeddings")
    centroids = S.kmeans_train(emb, k=8, iters=2)
    ivf_path = os.path.join(base, "ivf")
    t0 = time.time()
    ivf_index_write(emb, centroids, ivf_path)
    ivf_build_sec = round(time.time() - t0, 3)
    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])

    def ann_served():
        ivf_index_probe(spark, ivf_path, centroids, pvec,
                        k=10, nprobe=2, exclude_id=0).collect()

    def ann_adhoc():
        S.ivf_ann_probe(emb, centroids, 0, k=10, nprobe=2).collect()

    # --- fetch: docstore point lookup vs full-scan filter
    ids = [r["doc_id"] for r in bm25_probe(
        spark, "svb_lex", os.path.join(base, "lex"),
        BM25_TERMS, BM25_K1, BM25_B, k=10).collect()]

    def fetch_served():
        docstore_fetch(spark, "svb_ds", os.path.join(base, "ds"),
                       ids).collect()

    def fetch_adhoc():
        docs.where(F.col("doc_id").isin(ids)).collect()

    # --- mutate: COW upsert/delete vs the full rebuild it replaces.
    # A deployment-scale store has many buckets (so a keyed batch
    # touches a tiny fraction); build the mutation target at 64
    # buckets — with the 8-bucket store above, a 6-doc batch touches
    # most buckets and the demo shows only COW's fixed costs. The
    # scale-proportional signal is BYTES REWRITTEN vs store bytes
    # (wall clock at this SF is driver-round-trip-dominated; at 100 TB
    # the rebuild is corpus-sized and the COW stays batch-sized).
    from jcf_nb_migration_spark.io.docstore import (DOCS_SUBDIR,
                                                    _file_bucket_id,
                                                    _touched_buckets,
                                                    docstore_delete,
                                                    docstore_upsert)

    mut_path = os.path.join(base, "ds_mut")
    docstore_build(docs, "svb_dsmut", mut_path, num_buckets=64)
    batch = (docs.where(F.col("doc_id") % 997 == 0)
             .withColumn("text", F.concat(F.lit("v2:"), F.col("text"))))
    n_batch = batch.count()
    touched = _touched_buckets(batch.select("doc_id"), 64)
    victim = next(i for i in range(1, 10_000) if i not in ids)

    def upsert_cow():  # no batch_id: every run exercises the rewrite
        docstore_upsert(batch, "svb_dsmut", mut_path, num_buckets=64)

    def delete_cow():  # first run deletes, later runs no-op rewrite
        docstore_delete(spark, "svb_dsmut", mut_path, [victim],
                        num_buckets=64)

    def rebuild_full():
        docstore_build(docs, "svb_ds_rb", os.path.join(base, "ds_rb"),
                       num_buckets=64)

    mutate = {
        "batch_docs": int(n_batch),
        "num_buckets": 64,
        "touched_buckets": len(touched),
        "upsert_cow": _best_of(runs, upsert_cow),
        "delete_cow": _best_of(runs, delete_cow),
        "full_rebuild": _best_of(runs, rebuild_full),
    }
    mut_dir = os.path.join(mut_path, DOCS_SUBDIR)
    sizes = {f: os.path.getsize(os.path.join(mut_dir, f))
             for f in os.listdir(mut_dir) if f.endswith(".parquet")}
    mutate["store_bytes"] = sum(sizes.values())
    mutate["rewritten_bytes"] = sum(
        sz for f, sz in sizes.items() if _file_bucket_id(f) in touched)
    mutate["rewrite_fraction"] = round(
        mutate["rewritten_bytes"] / mutate["store_bytes"], 4)
    mutate["rebuild_over_upsert"] = (
        round(mutate["full_rebuild"] / mutate["upsert_cow"], 2)
        if mutate["upsert_cow"] else None)

    # --- Z-order: stats-pruned multi-column range scan vs the full
    # file-list filter scan over the same data (both get parquet
    # row-group pushdown; only the z-layout prunes the FILE LIST)
    from jcf_nb_migration_spark.io.zorder import (write_zordered,
                                                  zordered_file_count,
                                                  zordered_scan)
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice")
    zo_path = os.path.join(base, "zorder")
    t0 = time.time()
    write_zordered(li, zo_path, ["l_partkey", "l_suppkey"], n_files=32)
    zo_build_sec = round(time.time() - t0, 3)
    zo_ranges = {"l_partkey": (1, 50), "l_suppkey": (2, 6)}
    zo_pred = ("l_partkey BETWEEN 1 AND 50 AND "
               "l_suppkey BETWEEN 2 AND 6")

    def zo_agg(df):
        return df.agg(F.count(F.lit(1)).alias("n"),
                      F.sum("l_quantity").alias("q"))

    def zo_served():
        zo_agg(zordered_scan(spark, zo_path, zo_ranges)).collect()

    def zo_adhoc():
        zo_agg(li.where(zo_pred)).collect()

    zo_surv, zo_total = zordered_file_count(spark, zo_path, zo_ranges)

    # scale-proportional evidence: bytes/files the executed scans read
    probe_df = bm25_probe(spark, "svb_lex", os.path.join(base, "lex"),
                          BM25_TERMS, BM25_K1, BM25_B, k=20)
    # The ad-hoc scorer's read set must reflect the corpus pass it
    # performs from storage. Two steps, both required: run the bm25
    # timings FIRST, then clear the cached per-doc proxy they
    # registered and score from an UNPERSISTED proxy — cache
    # substitution is canonical-plan-keyed, so while the entry exists
    # even a frame built without .persist() plans as an
    # InMemoryTableScan (0 files) instead of the documents.parquet
    # FileScan the ad-hoc path fundamentally pays from storage.
    bm25_fam = {"served": _best_of(runs, bm25_served),
                "adhoc": _best_of(runs, bm25_adhoc),
                "served_touched": _data_touched(probe_df)}
    spark.catalog.clearCache()
    _, bm_adhoc = _bm25_frames(
        toks, perdoc=_bm25_perdoc(toks, persist=False))
    bm25_fam["adhoc_touched"] = _data_touched(
        bm_adhoc.orderBy(F.desc("bm25"), "doc_id").limit(20))
    fetch_df = docstore_fetch(spark, "svb_ds", os.path.join(base, "ds"),
                              ids)
    out = {
        "sf_dir": sf_dir, "runs": runs, "build_sec": build_sec,
        "compact_sec": compact_sec, "ivf_build_sec": ivf_build_sec,
        "ann": {"served": _best_of(runs, ann_served),
                "adhoc": _best_of(runs, ann_adhoc),
                "served_touched": _data_touched(
                    ivf_index_probe(spark, ivf_path, centroids, pvec,
                                    k=10, nprobe=2, exclude_id=0))},
        "bm25": bm25_fam,
        "phrase": {"served": _best_of(runs, phrase_served),
                   "adhoc": _best_of(runs, phrase_adhoc)},
        "fetch": {"served": _best_of(runs, fetch_served),
                  "adhoc": _best_of(runs, fetch_adhoc),
                  "served_touched": _data_touched(fetch_df),
                  "adhoc_touched": _data_touched(
                      docs.where(F.col("doc_id").isin(ids)))},
        "mutate": mutate,
        "zorder": {"served": _best_of(runs, zo_served),
                   "adhoc": _best_of(runs, zo_adhoc),
                   "build_sec": zo_build_sec,
                   "files_kept": zo_surv, "files_total": zo_total,
                   "served_touched": _data_touched(
                       zordered_scan(spark, zo_path, zo_ranges)),
                   "adhoc_touched": _data_touched(li.where(zo_pred))},
    }
    for fam in ("bm25", "phrase", "fetch", "ann", "zorder"):
        served, adhoc = out[fam]["served"], out[fam]["adhoc"]
        out[fam]["speedup"] = round(adhoc / served, 2) if served else None
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
