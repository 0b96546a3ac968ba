"""Lakehouse lifecycle on plain parquet: versioned mutations, time
travel, CDC, rollback, retention — plus a z-ordered analytical layout
— composed from io/docstore.py and io/zorder.py.

    documents
      → BUILD: doc_id-bucketed docstore (v0) + Z-ordered lineitem
               layout (Morton curve of (l_partkey, l_suppkey) with a
               per-file min/max parquet manifest)
      → MUTATE: MERGE upsert (v1), GDPR delete (v2) — bucket-COW;
               superseded files RETIRE to history, never deleted
      → AUDIT: docstore_history (the commit log),
               docstore_as_of (any version re-read exactly),
               docstore_version_diff (row-level change feed v0→v2)
      → DERIVE: docstore_incremental_view rolls a projection forward
               from the feed alone — O(changes), no re-projection
      → ROLLBACK: docstore_restore(v0) — rename-only, audited as a
               new version; mutations continue from the restored state
      → RETAIN: docstore_snapshot_vacuum(keep_last) reclaims history
               no retained manifest references
      → SCAN: zordered_scan prunes the file LIST via a DataFrame
               filter over the manifest table under a two-column range
               predicate before Spark opens anything
      → Z-LIFECYCLE: the z-layout shares the same snapshot semantics —
               ledgered append, gated re-layout, audited restore,
               AS-OF reads of every version (r11)
      → SERVE: the BM25 serving index runs the same commit-point
               contract (io/lexical.py snapshot section) — snapshot
               before the destructive delete+vacuum, restore after,
               probe scores bit-identical to the commit point (r11)

At 100 TB: manifests are one row per file (control plane), history
grows with the mutated fraction (not the corpus), AS-OF reads are
manifest-scoped scans, and the z-layout's serve-side bytes scale with
the predicate's selectivity on BOTH columns. The same functions back
the oracle-checked queries docstore_as_of_fetch / docstore_change_feed
/ lineitem_zorder_pruned — this example strings them into the
operational loop.

Usage: PYTHONPATH=. python examples/lakehouse_lifecycle.py [sf_dir] [work_dir]
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def lakehouse_demo(spark, sf_dir: str, work_dir: str) -> dict:
    from jcf_nb_migration_spark.io.docstore import (
        docstore_as_of,
        docstore_build,
        docstore_delete,
        docstore_fetch,
        docstore_history,
        docstore_incremental_view,
        docstore_restore,
        docstore_snapshot_vacuum,
        docstore_upsert,
        docstore_version,
        docstore_version_diff,
    )
    from jcf_nb_migration_spark.io.zorder import (
        write_zordered,
        zordered_file_count,
        zordered_scan,
    )
    from jcf_nb_migration_spark.registry import t

    out: dict = {}
    store = os.path.join(work_dir, "store")
    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "lang")

    # BUILD → v0
    docstore_build(docs, "lkh", store, num_buckets=8)

    # MUTATE: correction merge (v1), purge (v2)
    fixed = (docs.where(F.col("doc_id") % 11 == 3)
             .select("doc_id",
                     F.concat(F.lit("v2: "), F.col("text")).alias("text"),
                     "lang"))
    docstore_upsert(fixed, "lkh", store, num_buckets=8, batch_id="fix-1")
    purge_ids = [r["doc_id"] for r in
                 docs.where(F.col("doc_id") % 17 == 4)
                 .select("doc_id").collect()]
    docstore_delete(spark, "lkh", store, purge_ids, num_buckets=8,
                    batch_id="gdpr-1")
    out["versions"] = docstore_version(store)
    out["history"] = [(r["version"], r["op"]) for r in
                      docstore_history(spark, store)
                      .orderBy("version").collect()]

    # AUDIT: the purged doc is gone live, present AS OF v0
    victim = purge_ids[0]
    out["live_has_victim"] = docstore_fetch(
        spark, "lkh", store, [victim]).count() > 0
    out["v0_has_victim"] = (docstore_as_of(spark, "lkh", store, 0)
                            .where(F.col("doc_id") == victim)
                            .count() > 0)
    feed = docstore_version_diff(spark, "lkh", store, 0, 2)
    out["feed_counts"] = {r["change"]: r["n"] for r in
                          feed.groupBy("change")
                          .agg(F.count(F.lit(1)).alias("n")).collect()}

    # DERIVE: roll a projection v0 → v2 from the feed alone
    view0 = docstore_as_of(spark, "lkh", store, 0).select(
        "doc_id", "text")
    rolled = docstore_incremental_view(
        spark, "lkh", store, view0, 0, 2, ["doc_id", "text"])
    reproj = docstore_as_of(spark, "lkh", store, 2).select(
        "doc_id", "text")
    out["view_matches_reprojection"] = (
        rolled.exceptAll(reproj).isEmpty()
        and reproj.exceptAll(rolled).isEmpty())

    # ROLLBACK to v0, audited; the purge victim is live again
    restored_v = docstore_restore(spark, "lkh", store, 0, num_buckets=8)
    out["restored_version"] = restored_v
    out["victim_back"] = docstore_fetch(
        spark, "lkh", store, [victim]).count() == 1

    # RETAIN: keep the restore + one prior version
    out["vacuumed_files"] = docstore_snapshot_vacuum(store, keep_last=2)

    # SCAN: z-ordered two-column range pruning
    zpath = os.path.join(work_dir, "zorder")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=16)
    ranges = {"l_partkey": (1, 40), "l_suppkey": (1, 4)}
    surv, total = zordered_file_count(spark, zpath, ranges)
    out["z_files"] = (surv, total)
    out["z_rows"] = zordered_scan(spark, zpath, ranges).count()
    out["z_rows_expected"] = li.where(
        "l_partkey BETWEEN 1 AND 40 AND l_suppkey BETWEEN 1 AND 4"
    ).count()

    # Z-LAYOUT LIFECYCLE (r11): the z-ordered layout shares the
    # docstore's snapshot semantics — append (v1), fragmentation-gated
    # re-layout (v2), rollback to the pre-append state (v3), every
    # version readable AS OF its number.
    from jcf_nb_migration_spark.io.zorder import (
        append_zordered,
        zorder_history,
        zorder_maintain,
        zorder_restore,
        zordered_as_of,
    )

    batch = li.limit(2000).select(
        (F.col("l_orderkey") + 90_000_000).alias("l_orderkey"),
        "l_partkey", "l_suppkey", "l_extendedprice")
    append_zordered(batch, zpath, batch_id="day-1")            # v1
    out["z_maintained"] = zorder_maintain(                      # v2
        spark, zpath, max_appended_frac=0.05, n_files=16)
    zorder_restore(spark, zpath, 0)                             # v3
    out["z_v0_rows"] = zordered_as_of(spark, zpath, 0).count()
    out["z_v1_rows"] = zordered_as_of(spark, zpath, 1).count()
    out["z_live_equals_v0"] = (
        zordered_scan(spark, zpath, ranges).count() == out["z_rows"])
    out["z_history"] = [(r["version"], r["op"]) for r in
                        zorder_history(spark, zpath)
                        .orderBy("version").collect()]

    # ---- SERVE leg (r11): the same commit-point contract on the
    # serving index — snapshot before destructive maintenance,
    # restore after (Lucene's SnapshotDeletionPolicy shape)
    from jcf_nb_migration_spark.functions import text as T
    from jcf_nb_migration_spark.io.lexical import (
        bm25_probe,
        lexical_index_build,
        lexical_index_delete,
        lexical_index_restore,
        lexical_index_snapshot,
        lexical_index_snapshots,
        lexical_index_vacuum,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = docs.select("doc_id", T.tokens("text").alias("w"))
    lex = os.path.join(work_dir, "lexidx")
    lexical_index_build(toks, "lakedemo_lex", lex, num_buckets=4)
    terms = ("spark", "window", "merge")

    def probe():
        return [(r["doc_id"], r["bm25"]) for r in
                bm25_probe(spark, "lakedemo_lex", lex, terms,
                           1.2, 0.75, k=10).collect()]

    at_commit = probe()
    sid = lexical_index_snapshot(spark, "lakedemo_lex", lex,
                                 num_buckets=4, note="pre-maintenance")
    victims = [r["doc_id"] for r in
               docs.where(F.col("doc_id") % 5 == 0)
               .select("doc_id").collect()]
    lexical_index_delete(spark, "lakedemo_lex", lex, victims,
                         num_buckets=4)
    lexical_index_vacuum(spark, "lakedemo_lex", lex, num_buckets=4)
    out["lex_vacuum_changed_probe"] = probe() != at_commit
    lexical_index_restore(spark, "lakedemo_lex", lex, sid,
                          num_buckets=4)
    out["lex_restore_matches_commit_point"] = probe() == at_commit
    out["lex_snapshots"] = [
        (r["snapshot"], r["note"]) for r in
        lexical_index_snapshots(spark, lex).collect()]
    return out


def main() -> None:
    import sys

    from jcf_nb_migration_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/jcf_lakehouse_demo"
    spark = get_spark("lakehouse-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    out = lakehouse_demo(spark, sf_dir, work)
    for k, v in out.items():
        print(f"{k}: {v}")
    spark.stop()


if __name__ == "__main__":
    main()
