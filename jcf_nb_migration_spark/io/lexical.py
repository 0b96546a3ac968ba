"""Persisted lexical (BM25 / inverted-index) serving layout — the
build/serve split a 100 TB RAG stack actually runs (VERDICT r7 item 2).

The ad-hoc ``bm25_top_docs`` query recomputes corpus statistics on
every request: one full token explode + the corpus-sized tf groupBy
per query. A serving stack pays that ONCE at build time and answers
every query from the materialized index:

- ``<prefix>_postings`` — the inverted index as a BUCKETED catalog
  table ``(tok, doc_id, tf, dl)``, ``bucketBy(tok)`` + ``sortBy(tok)``
  (io/layout.write_bucketed's layout, external parquet under
  ``path/postings``). Document length is denormalized into the posting
  (the classic search-engine layout) so scoring never joins a
  corpus-sized doc-length table at serve time.
- ``path/stats`` — per-batch corpus scalars ``(batch_id, n_docs,
  sum_dl)``: integer-exact, so the serving scan folds any number of
  appended batches into the same (N, avgdl) the ad-hoc scorer computes.

Serve-time plan (``bm25_probe``): the term filter is a BUCKET-PRUNED
scan of the postings table (``SelectedBucketsCount: |terms'| buckets``
in the FileScan — non-matching buckets are never listed, let alone
read), per-term document frequency is a groupBy on the bucket key —
satisfied by the table's hash distribution, so the plan has ZERO
Exchange on the tok-keyed side (guarded in
tests/test_lexical_index.py::test_probe_plan_bucket_pruned_no_tok_exchange)
— and the only shuffle left is the per-doc score groupBy, bounded by
the matched postings, not the corpus. At 100 TB: the build is the one
corpus pass, every probe reads a few buckets' worth of postings.

Appends (``lexical_index_append``) mirror ``ivf_index_append``'s
contract: new document batches tokenize → per-(tok, doc) tf → appended
as additional bucket files (Spark bucketed tables accept appends; each
write adds files tagged with their bucket id, readers union them), a
stats row records the batch's (n_docs, sum_dl), and a committed-batch
ledger under ``path/_appended_batches/`` makes Structured Streaming's
at-least-once foreachBatch delivery effectively-once (the marker lands
AFTER the append; the crash window between them is the same
plain-parquet residual the IVF ledger documents — closing it needs a
transactional table format, environment-gated here). Probe parity —
probe(base ∪ batch) ≡ probe(rebuild(base ∪ batch)) — holds by
construction because BM25 is a function of (tf, dl, df, N, avgdl) and
every one of those is an exact integer sum over posting/stats rows,
insensitive to file layout; pinned in
tests/test_lexical_index.py::test_append_probe_matches_rebuild and
exercised from a real readStream in
tests/test_streaming_ingest.py::test_stream_ingest_appends_lexical_index.

Catalog note: bucketing metadata lives in the session catalog
(in-memory here, a Hive metastore on a real deployment), so
``lexical_index_attach`` re-registers an on-disk index into a fresh
session — the local stand-in for the metastore's persistence.
"""

from __future__ import annotations

from jcf_nb_migration_spark.io.locking import single_writer

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jcf_nb_migration_spark.localrel import local_df

STATS_SUBDIR = "stats"
POSTINGS_SUBDIR = "postings"
TOMBSTONES_SUBDIR = "tombstones"
LEDGER_SUBDIR = "_appended_batches"
META_FILE = "_index_meta.json"

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _checked_prefix(prefix: str) -> str:
    """``prefix`` lands inside SQL DDL as an identifier — validate it
    instead of interpolating caller input into a statement."""
    if not _IDENT.match(prefix):
        raise ValueError(f"index prefix must be a SQL identifier, "
                         f"got {prefix!r}")
    return prefix


def _sql_path(path: str) -> str:
    """Escape a filesystem path for a single-quoted SQL string literal
    (LOCATION clause) — a quote in the path must not break out."""
    return path.replace("'", "''")


def _describe_table(spark: SparkSession, table: str) \
        -> tuple[int | None, str | None]:
    """(num_buckets, location) of a catalog table from ONE DESCRIBE
    EXTENDED pass — the write-side preamble needs both, and a streamed
    ingest runs it per micro-batch, so one catalog round-trip, not
    two. Location is normalized to a plain filesystem path (file:
    scheme stripped, symlinks resolved)."""
    buckets, loc = None, None
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if row["col_name"] == "Num Buckets":
            buckets = int(row["data_type"])
        elif row["col_name"] == "Location":
            raw = row["data_type"]
            if raw.startswith("file:"):
                raw = raw[len("file:"):]
            loc = os.path.realpath(raw)
    return buckets, loc


def _table_num_buckets(spark: SparkSession, table: str) -> int | None:
    """Bucket count of a catalog table (None when the table isn't
    bucketed)."""
    return _describe_table(spark, table)[0]


def _table_location(spark: SparkSession, table: str) -> str | None:
    """Registered LOCATION of a catalog table, normalized."""
    return _describe_table(spark, table)[1]


def _write_meta(path: str, num_buckets: int,
                extra: dict | None = None) -> None:
    import json

    os.makedirs(path, exist_ok=True)
    meta = {"num_buckets": num_buckets, **(extra or {})}
    with open(os.path.join(path, META_FILE), "w") as fh:
        json.dump(meta, fh)


def _read_meta(path: str) -> dict | None:
    """Parsed on-disk meta record, or None for a pre-meta index."""
    import json

    meta_path = os.path.join(path, META_FILE)
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as fh:
        return json.load(fh)


def _require_bucketed_table(spark: SparkSession, table: str,
                            num_buckets: int, path: str,
                            build_fn: str, subdir: str) -> None:
    """Shared WRITE-side preamble (appends and compaction): the table
    must be registered (a bare saveAsTable append would CREATE a
    possibly-mismatched spec), its declared bucket count must match
    the caller's, the on-disk meta must agree (catches fresh-session
    wrong-count attaches), and the registration must point at THIS
    index's directory — a stale same-prefix registration from an
    earlier build elsewhere would otherwise append (or, worse,
    compact: a destructive rewrite) the WRONG index's rows into this
    path."""
    if not spark.catalog.tableExists(table):
        raise ValueError(
            f"{table} is not registered in this session's catalog — "
            f"run {build_fn} (or the matching attach) first")
    declared, registered = _describe_table(spark, table)
    if declared != num_buckets:
        raise ValueError(
            f"{table} is bucketed into {declared} buckets but the "
            f"caller asked for {num_buckets}; a mismatch would corrupt "
            "bucket pruning")
    _check_meta(path, num_buckets)
    expected = os.path.realpath(os.path.join(path, subdir))
    if registered != expected:
        raise ValueError(
            f"{table} is registered at {registered}, not {expected} — "
            "DROP the stale table and re-attach this index")


def _check_table_at(spark: SparkSession, table: str, path: str,
                    subdir: str) -> None:
    """Probe-side location validation: the registered table must point
    at THIS index's directory — a stale same-prefix registration from
    an earlier build elsewhere would otherwise serve the wrong index
    silently."""
    registered = _table_location(spark, table)
    expected = os.path.realpath(os.path.join(path, subdir))
    if registered != expected:
        raise ValueError(
            f"{table} is registered at {registered}, not {expected} — "
            "DROP the stale table and re-attach this index")


def _check_meta(path: str, num_buckets: int) -> None:
    """Validate the caller's bucket count against the count the index
    was BUILT with (recorded in the on-disk meta file) — the catalog
    can't catch a fresh-session attach that declares a wrong count,
    because CREATE TABLE would happily register the wrong spec over
    the existing files and mis-prune silently."""
    meta = _read_meta(path)
    if meta is None:
        return  # pre-meta index: catalog validation still applies
    built = meta["num_buckets"]
    if built != num_buckets:
        raise ValueError(
            f"index at {path} was built with {built} buckets, caller "
            f"asked for {num_buckets}; a mismatched declaration would "
            "make bucket pruning silently drop matching postings")


def _postings_frame(toks: DataFrame) -> DataFrame:
    """``toks(doc_id, w)`` → postings ``(tok, doc_id, tf, dl)``.

    One explode + one groupBy on (tok, doc_id) — the doc_id in the key
    spreads even a stopword present in every document across all
    partitions, so the build shuffle has no skewed reduce key (the
    skew probe in NOTES.md measures this). ``dl`` rides along via
    ``first`` (constant within the group)."""
    occ = toks.select(
        "doc_id", F.size("w").alias("dl"), F.explode("w").alias("tok"))
    return (occ.groupBy("tok", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"),
                 F.first("dl").alias("dl")))


def _stats_frame(toks: DataFrame, batch_id: str) -> DataFrame:
    """Corpus scalars for one batch: (batch_id, n_docs, sum_dl).
    Counts EVERY document — including empty-token ones, which have no
    postings but still belong in N and avgdl (exactly as the ad-hoc
    scorer's ``dl`` frame counts them)."""
    return (toks.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.coalesce(F.sum(F.size("w")), F.lit(0))
                      .cast("bigint").alias("sum_dl"))
            .select(F.lit(batch_id).alias("batch_id"), "n_docs", "sum_dl"))


def lexical_index_build(toks: DataFrame, prefix: str, path: str,
                        num_buckets: int = 8) -> None:
    """Build (or rebuild) the serving index from ``toks(doc_id, w)``:
    drop any prior table/ledger, write the bucketed postings table
    ``<prefix>_postings`` (external parquet at ``path/postings``) and
    the base stats batch. Idempotent — rebuilding an existing index
    replaces it wholesale.

    Local-FS assumption: the pre-build cleanup (``shutil.rmtree``) and
    the append ledger run driver-local filesystem calls, matching the
    IVF layout's documented stand-in; on HDFS/S3 route them through
    the Hadoop FileSystem API (or a transactional table format)
    instead."""
    import shutil

    spark = toks.sparkSession
    prefix = _checked_prefix(prefix)
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_postings")
    shutil.rmtree(path, ignore_errors=True)
    toks = toks.persist()
    try:
        (_postings_frame(toks).write.mode("overwrite")
         .bucketBy(num_buckets, "tok").sortBy("tok")
         .option("path", os.path.join(path, POSTINGS_SUBDIR))
         .format("parquet").saveAsTable(f"{prefix}_postings"))
        # 1-row frame: coalesce so the stats sidecar is one file per
        # batch, not one per shuffle partition (probe footer-opens)
        (_stats_frame(toks, "base").coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(path, STATS_SUBDIR)))
        _write_meta(path, num_buckets)
    finally:
        toks.unpersist()


def lexical_index_attach(spark: SparkSession, prefix: str, path: str,
                         num_buckets: int = 8) -> None:
    """Register an existing on-disk index into this session's catalog
    (the in-memory-catalog stand-in for a persistent metastore). The
    bucket spec must match the one the index was built with — a wrong
    count would silently mis-prune, so when the table is already
    registered the declared bucket count is validated and a mismatch
    raises instead of serving wrong results."""
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_postings"
    _check_meta(path, num_buckets)  # against the BUILD's recorded count
    spark.sql(f"""
        CREATE TABLE IF NOT EXISTS {table}
        (tok STRING, doc_id BIGINT, tf BIGINT, dl INT)
        USING parquet
        CLUSTERED BY (tok) SORTED BY (tok) INTO {num_buckets} BUCKETS
        LOCATION '{_sql_path(os.path.join(path, POSTINGS_SUBDIR))}'
    """)
    declared = _table_num_buckets(spark, table)
    if declared != num_buckets:
        raise ValueError(
            f"{table} is registered with {declared} buckets but the "
            f"caller expects {num_buckets}; bucket pruning would "
            "silently drop matching postings")
    registered = _table_location(spark, table)
    expected = os.path.realpath(os.path.join(path, POSTINGS_SUBDIR))
    if registered != expected:
        raise ValueError(
            f"{table} is already registered at {registered}, not "
            f"{expected} — the probe would read postings from the old "
            "index but stats from the new path (CREATE TABLE IF NOT "
            "EXISTS is a no-op; DROP the stale table first)")


@single_writer
def lexical_index_append(new_toks: DataFrame, prefix: str, path: str,
                         num_buckets: int = 8,
                         batch_id: int | str | None = None) -> bool:
    """Append a new document batch to the serving index: postings for
    the batch land as additional bucket files, the batch's corpus
    scalars land as one stats row. ``batch_id`` (foreachBatch's id)
    keyes the replay ledger — a batch that already landed is skipped
    (returns False), turning at-least-once delivery effectively-once.
    New docs must be NEW doc_ids; re-ingesting an existing document is
    an update, which (like the IVF layout) needs a transactional
    format — upstream dedup (streaming_dedup /
    dropDuplicatesWithinWatermark) owns that here.

    The target table must already exist in this session's catalog
    (via build or attach) with a matching bucket count — a bare
    ``saveAsTable(mode="append")`` in a fresh session would CREATE the
    table, and a bucket-count mismatch against the on-disk files would
    make bucket pruning silently drop matching postings. Both raise.

    Ledger note: the replay markers are driver-local filesystem calls
    (same stand-in as the IVF ledger); on HDFS/S3 use the Hadoop
    FileSystem API or a transactional format."""
    spark = new_toks.sparkSession
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_postings"
    _require_bucketed_table(spark, table, num_buckets, path,
                            "lexical_index_build", POSTINGS_SUBDIR)
    _recover_vacuum_plan(spark, prefix, path)
    from jcf_nb_migration_spark.io.layout import (_ledger_commit,
                                                  _ledger_skip)

    marker, skip = _ledger_skip(path, batch_id)
    if skip:
        return False  # replayed delivery: already appended
    new_toks = new_toks.persist()
    try:
        (_postings_frame(new_toks).write.mode("append")
         .bucketBy(num_buckets, "tok").sortBy("tok")
         .option("path", os.path.join(path, POSTINGS_SUBDIR))
         .format("parquet").saveAsTable(f"{prefix}_postings"))
        (_stats_frame(new_toks,
                      "unledgered" if batch_id is None
                      else str(batch_id)).coalesce(1)
         .write.mode("append")
         .parquet(os.path.join(path, STATS_SUBDIR)))
    finally:
        new_toks.unpersist()
    _ledger_commit(marker)
    return True


def tombstone_ids(spark: SparkSession, path: str) -> DataFrame | None:
    """Distinct tombstoned ``doc_id``s of the index at ``path``, or
    None when no deletion has ever landed. Tombstone batches are tiny
    (request-bounded delete lists), so the frame broadcasts by
    construction at every probe."""
    tomb_dir = os.path.join(path, TOMBSTONES_SUBDIR)
    if not os.path.isdir(tomb_dir):
        return None
    return spark.read.parquet(tomb_dir).select("doc_id").distinct()


def _without_tombstoned(per_doc: DataFrame, spark: SparkSession,
                        path: str) -> DataFrame:
    """Apply lazy-deletion semantics to a per-doc result frame:
    tombstoned documents never appear in results. A broadcast
    left-anti join — the tombstone side is delete-request-bounded,
    never corpus-sized."""
    tomb = tombstone_ids(spark, path)
    if tomb is None:
        return per_doc
    return per_doc.join(F.broadcast(tomb), "doc_id", "left_anti")


@single_writer
def lexical_index_delete(spark: SparkSession, prefix: str, path: str,
                         doc_ids, num_buckets: int = 8,
                         batch_id: int | str | None = None) -> bool:
    """Delete documents from the serving index LAZILY (Lucene's
    delete-then-merge model): the ids land in a tombstone sidecar and
    every probe excludes them from RESULTS immediately, while the
    corpus statistics (df, N, avgdl) keep counting the deleted
    documents until ``lexical_index_vacuum`` physically reclaims them
    — exactly the scoring Lucene serves between a delete and a segment
    merge. The alternative — eager physical deletion — would rewrite
    EVERY bucket on every delete batch, because postings are bucketed
    by ``tok`` and one document's postings spread across all buckets.

    ``doc_ids`` is a request-bounded list of integers (the same
    contract as docstore_fetch); ids absent from the index are
    harmless no-ops. Ledger-idempotent under ``del-<batch_id>``
    markers (the namespace is shared with appends, so a delete and an
    append must not reuse one batch id)."""
    import numbers

    prefix = _checked_prefix(prefix)
    _require_bucketed_table(spark, f"{prefix}_postings", num_buckets,
                            path, "lexical_index_build",
                            POSTINGS_SUBDIR)
    _recover_vacuum_plan(spark, prefix, path)
    bad = [i for i in doc_ids
           if isinstance(i, bool) or not isinstance(i, numbers.Integral)]
    if bad:
        raise TypeError(
            f"delete ids must be integers, got {bad[:3]!r}")
    ids = sorted({int(i) for i in doc_ids})
    if not ids:
        return False
    from jcf_nb_migration_spark.io.layout import (_ledger_commit,
                                                  _ledger_skip)

    marker, skip = _ledger_skip(
        path, None if batch_id is None else f"del-{batch_id}")
    if skip:
        return False
    (local_df(spark, [(i,) for i in ids], "doc_id bigint")
     .coalesce(1).write.mode("append")
     .parquet(os.path.join(path, TOMBSTONES_SUBDIR)))
    _ledger_commit(marker)
    return True


VACUUM_PLAN_FILE = "_vacuum_plan.json"


def _finalize_vacuum(spark: SparkSession, path: str,
                     n_docs: int, sum_dl: int) -> None:
    """The vacuum's finalization, shared verbatim by the normal path
    and the crash-recovery replay so the two can never drift: retire
    (under snapshots) and rewrite the consolidated stats row with the
    ABSOLUTE totals, clear the tombstones, drop the intent plan.
    Idempotent — absolute totals re-apply to the same state."""
    import shutil

    if _has_snapshots(path):
        _retire_surface_dir(path, os.path.join(path, STATS_SUBDIR),
                            STATS_SUBDIR)
    (local_df(
        spark, [("vacuum", int(n_docs), int(sum_dl))],
        "batch_id string, n_docs bigint, sum_dl bigint")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(path, STATS_SUBDIR)))
    if _has_snapshots(path):
        _retire_surface_dir(path, os.path.join(path, TOMBSTONES_SUBDIR),
                            TOMBSTONES_SUBDIR)
    else:
        shutil.rmtree(os.path.join(path, TOMBSTONES_SUBDIR),
                      ignore_errors=True)
    plan_path = os.path.join(path, VACUUM_PLAN_FILE)
    if os.path.isfile(plan_path):
        os.remove(plan_path)


def _recover_vacuum_plan(spark: SparkSession, prefix: str,
                         path: str) -> None:
    """Finish a crashed lexical_index_vacuum from its intent plan.

    The vacuum's stats reconciliation (n_dead, dl_dead) is computed
    from the PRE-swap postings — state the swap destroys. Without a
    plan, a crash around the stats rewrite either bricks the vacuum
    (stats dir retired but not yet rewritten: the rerun's totals read
    fails) or permanently drifts the corpus totals (postings swapped,
    stats not reconciled: the rerun finds no dead postings and
    cheerfully clears the tombstones, leaving n_docs/avgdl counting
    reclaimed documents forever). The vacuum therefore publishes the
    consolidated ABSOLUTE totals to ``_vacuum_plan.json`` before its
    first destructive step; this recovery — run from every mutating
    entry point, so no later mutation can interleave with stale
    totals — either discards the plan (crash before the swap landed:
    tombstoned ids still have postings; the rerun recomputes) or
    replays the finalization idempotently (absolute totals, so a
    re-crash mid-recovery re-applies the same numbers)."""
    plan_path = os.path.join(path, VACUUM_PLAN_FILE)
    if not os.path.isfile(plan_path):
        return
    import json

    try:
        with open(plan_path) as fh:
            plan = json.load(fh)
    except ValueError as exc:
        # published with flush+fsync+rename — a torn plan means
        # external interference; name it instead of bricking every
        # entry point with a bare JSONDecodeError
        raise RuntimeError(
            f"corrupt vacuum plan at {plan_path}: {exc}; inspect the "
            "postings/stats/tombstone surfaces, reconcile manually, "
            "then delete the plan file") from exc
    table = f"{prefix}_postings"
    _recover_swap_residue(spark, table, path, POSTINGS_SUBDIR,
                          _postings_retire(path))
    tomb = tombstone_ids(spark, path)
    if tomb is not None:
        still_live = (spark.table(table)
                      .join(F.broadcast(tomb), "doc_id", "left_semi")
                      .limit(1).count() > 0)
        if still_live:
            # the postings swap never landed: nothing was destroyed,
            # the plan's totals are void — the rerun recomputes
            os.remove(plan_path)
            return
    _finalize_vacuum(spark, path, plan["n_docs"], plan["sum_dl"])


@single_writer
def lexical_index_vacuum(spark: SparkSession, prefix: str, path: str,
                         num_buckets: int = 8,
                         parallelism: int = 1) -> dict:
    """Physically reclaim tombstoned documents: rewrite the postings
    table WITHOUT their rows (staged bucketed rebuild + swap, the
    compaction machinery), consolidate the stats sidecar with the
    reclaimed documents subtracted, and clear the tombstones. After a
    vacuum, probes score exactly as a fresh build over the surviving
    corpus.

    Stats reconciliation comes from the postings being dropped (each
    document's ``dl`` rides on its postings rows), so it is exact for
    every tombstoned document that HAS postings. A zero-token document
    has no postings to reconcile from; its +1 in n_docs survives until
    a full rebuild (its sum_dl contribution is 0 and it can never
    match a query, so only the avgdl denominator is off by the empty
    count — documented, not silent). Returns
    ``{"reclaimed_docs": n, "reclaimed_postings": m}``."""
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_postings"
    _require_bucketed_table(spark, table, num_buckets, path,
                            "lexical_index_build", POSTINGS_SUBDIR)
    _recover_vacuum_plan(spark, prefix, path)
    tomb = tombstone_ids(spark, path)
    if tomb is None:
        return {"reclaimed_docs": 0, "reclaimed_postings": 0}
    import json

    # Reconcile BEFORE the swap, from the live postings: per-doc dl
    # (constant within a doc's postings), counted once per doc. The
    # reclaimed-postings total rides the same per-doc partials, so the
    # reconciliation is ONE pass over the dead postings, not two.
    dead = (spark.table(table)
            .join(F.broadcast(tomb), "doc_id", "left_semi"))
    # max not first: dl is constant within a doc's postings by the
    # build invariant, so they are equal — but max is deterministic
    # even if a future writer violates it, and reclaimed_postings now
    # rides the same grouped pass (ADVICE r13: one nondeterministic
    # agg would corrupt two returned stats instead of one).
    dead_stats = (dead.groupBy("doc_id")
                  .agg(F.max("dl").alias("dl"),
                       F.count(F.lit(1)).alias("np"))
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.coalesce(F.sum("dl"), F.lit(0)).alias("s"),
                       F.coalesce(F.sum("np"), F.lit(0)).alias("p"))
                  .head())
    n_dead = int(dead_stats["n"])
    dl_dead = int(dead_stats["s"])
    n_postings = int(dead_stats["p"])
    old = (spark.read.parquet(os.path.join(path, STATS_SUBDIR))
           .agg(F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s"))
           .head())
    # Intent plan (absolute consolidated totals) BEFORE the first
    # destructive step — see _recover_vacuum_plan for the two crash
    # modes this closes.
    plan_path = os.path.join(path, VACUUM_PLAN_FILE)
    tmp = plan_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"n_docs": int(old["n"]) - n_dead,
                   "sum_dl": int(old["s"]) - dl_dead}, fh)
        fh.flush()
        os.fsync(fh.fileno())  # gates a destructive swap: a rename
        #   durable before its data would strand a torn plan
    os.replace(tmp, plan_path)
    live = (spark.table(table)
            .join(F.broadcast(tomb), "doc_id", "left_anti"))
    _compact_bucketed_table(
        spark, table, path, POSTINGS_SUBDIR, "tok", num_buckets,
        parallelism,
        lambda: lexical_index_attach(spark, prefix, path, num_buckets),
        frame=live, retire=_postings_retire(path))
    # Under snapshots the sidecars COW-retire like the postings: the
    # consolidated stats row and the tombstone clear are the shared
    # finalizer — identical to the crash-recovery replay by
    # construction (one code path, zero drift).
    _finalize_vacuum(spark, path, int(old["n"]) - n_dead,
                     int(old["s"]) - dl_dead)
    return {"reclaimed_docs": n_dead, "reclaimed_postings": n_postings}


def bm25_probe(spark: SparkSession, prefix: str, path: str,
               terms: tuple[str, ...], k1: float, b: float,
               k: int = 20,
               allowed: DataFrame | None = None) -> DataFrame:
    """Serve BM25 top-k from the materialized index — bit-identical to
    the ad-hoc scorer (queries.retrieval_ops._bm25_frames) because the
    double-precision expression tree is the same and every input
    (tf, dl, df, N, avgdl) is an exact integer (or one double division)
    in both paths.

    Plan shape: bucket-pruned postings scan (terms filter on the
    bucket column), df = groupBy on the bucket key — NO Exchange, the
    bucketed scan already satisfies the distribution — broadcast back,
    tiny stats scan crossJoined, one groupBy(doc_id) bounded by the
    matched postings. Columns: doc_id, n_terms_matched, bm25.

    ``allowed`` (a frame with a ``doc_id`` column) applies METADATA-
    FILTERED search — the standard serving semantics: scores come from
    the GLOBAL index statistics (df, N, avgdl are corpus facts, not
    filter-relative), the filter gates which documents may appear in
    the result, via a semi-join on the scored frame BEFORE the top-k
    cut (so the cut returns k allowed docs, not k-minus-filtered)."""
    # Split-brain guard (same as phrase/proximity/docstore probes):
    # postings come from the catalog but N/avgdl come from path/stats —
    # a stale same-prefix registration would silently mix indexes.
    _check_table_at(spark, f"{prefix}_postings", path, POSTINGS_SUBDIR)
    post = (spark.table(f"{prefix}_postings")
            .where(F.col("tok").isin(list(terms))))
    dfreq = post.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df"))
    stats = (spark.read.parquet(os.path.join(path, STATS_SUBDIR))
             .agg(F.sum("n_docs").alias("n_docs"),
                  F.sum("sum_dl").alias("sum_dl"))
             .select("n_docs",
                     (F.col("sum_dl").cast("double") / F.col("n_docs"))
                     .alias("avgdl")))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                 / F.col("avgdl")))
    scored = (post.join(F.broadcast(dfreq), "tok")
              .crossJoin(F.broadcast(stats))
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).alias("n_terms_matched"),
                   F.round(F.sum(idf * F.col("tf") * (k1 + 1.0) / denom),
                           9).alias("bm25")))
    if allowed is not None:
        scored = scored.join(allowed.select("doc_id"), "doc_id",
                             "left_semi")
    # Lazy-deletion gate (lexical_index_delete): tombstoned docs never
    # surface, while df/N/avgdl keep counting them until vacuum —
    # Lucene's delete-then-merge scoring, applied before the top-k cut
    # so k surviving docs come back.
    scored = _without_tombstoned(scored, spark, path)
    return (scored.orderBy(F.desc("bm25"), "doc_id")
            .limit(k))


def _recover_swap_residue(spark: SparkSession, table: str, path: str,
                          subdir: str, retire=None) -> None:
    """Fold crash residue from a prior staged-rewrite swap back into a
    consistent live state (the bucketed-table twin of io/layout.
    _recover_epoch_residue). The swap's crash states and their
    recoveries:

    - ``<dir>.old`` present, live dir present — crash after the second
      rename, before disposal: dispose the old dir (retire-or-delete
      per the caller's policy, so snapshot-referenced files land in
      ``_history``, never the void).
    - ``<dir>.old`` present, live dir MISSING, staging present — crash
      between the two renames: the staged write had fully completed
      (it precedes any rename), so COMPLETE the swap, then dispose old.
    - ``<dir>.old`` present, live dir MISSING, staging missing —
      manual meddling or partial cleanup: roll BACK to the old layout
      (the only complete copy).

    The catalog's cached file listing may be stale after any of these
    — refresh it."""
    import shutil

    data_dir = os.path.join(path, subdir)
    old = data_dir.rstrip("/") + ".old"
    staging = data_dir.rstrip("/") + ".compact"
    if not os.path.isdir(old):
        return
    if not os.path.isdir(data_dir):
        if os.path.isdir(staging):
            os.rename(staging, data_dir)   # complete the crashed swap
        else:
            os.rename(old, data_dir)       # roll back: only full copy
            spark.catalog.refreshTable(table)
            return
    if os.path.isdir(old):
        retire(old) if retire is not None else shutil.rmtree(old)
    spark.catalog.refreshTable(table)


def _compact_bucketed_table(spark: SparkSession, table: str, path: str,
                            subdir: str, bucket_col: str,
                            num_buckets: int, parallelism: int,
                            reattach, frame: DataFrame | None = None,
                            retire=None) -> int:
    """Staged-rewrite-and-swap core shared by the lexical and docstore
    compactors: rebuild the bucketed table FROM ITS OWN FILES into a
    staging dir (one file per bucket per task), swap via two directory
    renames, drop + re-register the catalog entry (``reattach``).
    ``frame`` substitutes the rows being rewritten (vacuum passes the
    table minus tombstoned docs); it must derive from the live table
    so the staged write completes before any rename. ``retire``, when
    given, disposes of the swapped-out directory instead of deletion
    (the docstore passes its history mover so older version manifests
    keep reading superseded files). Returns the compacted file count.
    Validation is the caller's job — this helper only reorganizes
    files."""
    import shutil

    _recover_swap_residue(spark, table, path, subdir, retire)
    data_dir = os.path.join(path, subdir)
    staging = data_dir.rstrip("/") + ".compact"
    # coalesce, not repartition: narrow (no shuffle), and the bucketed
    # writer splits each task's rows by bucket id itself.
    ((spark.table(table) if frame is None else frame)
     .coalesce(parallelism)
     .write.mode("overwrite")
     .bucketBy(num_buckets, bucket_col).sortBy(bucket_col)
     .option("path", staging)
     .format("parquet").saveAsTable(f"{table}_compact"))
    old = data_dir.rstrip("/") + ".old"
    os.rename(data_dir, old)
    os.rename(staging, data_dir)
    retire(old) if retire is not None else shutil.rmtree(old)
    spark.sql(f"DROP TABLE {table}_compact")
    spark.sql(f"DROP TABLE {table}")
    reattach()
    return sum(1 for f in os.listdir(data_dir)
               if f.endswith(".parquet"))


@single_writer
def lexical_index_compact(spark: SparkSession, prefix: str, path: str,
                          num_buckets: int = 8,
                          parallelism: int = 1) -> int:
    """Compact a streamed-into index: every append adds one file per
    touched bucket, so a long-running ingest accretes thousands of
    small bucket files and the probe pays a footer-open per file.
    Rebuild the bucketed table FROM ITS OWN POSTINGS — no re-tokenize,
    no source corpus needed: read the current postings, stage a fresh
    bucketed table (one file per bucket) beside it, then swap via two
    directory renames and re-register the catalog entry. A reader
    never sees MIXED files, but two renames aren't one atomic op:
    there is a brief window where the directory is absent (a retrying
    reader sees old data or new). A crash inside the window strands
    the data in ``<postings>.old``; the next compact clears it. Stats and the append ledger are untouched: compaction
    reorganizes files, it does not open a new epoch (probe results are
    invariant by the additivity of every BM25 input). Returns the
    compacted file count. Local-FS renames — the same stand-in as
    build's rmtree.

    ``parallelism`` bounds the rewrite tasks via a NARROW coalesce (no
    shuffle): each task writes one file per bucket it holds rows for,
    so the output is ≤ parallelism × num_buckets files. The default 1
    gives exactly one file per bucket; raise it when one task can't
    comfortably sort the whole index (the output stays a massive
    reduction from per-batch accretion either way).

    The staged write completes BEFORE any rename, so it reads the live
    files directly — no defensive materialization needed."""
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_postings"
    # full write-side preamble INCLUDING the location guard: compacting
    # under a stale same-prefix registration would destructively
    # overwrite this path with another index's rows
    _require_bucketed_table(spark, table, num_buckets, path,
                            "lexical_index_build", POSTINGS_SUBDIR)
    _recover_vacuum_plan(spark, prefix, path)
    return _compact_bucketed_table(
        spark, table, path, POSTINGS_SUBDIR, "tok", num_buckets,
        parallelism,
        lambda: lexical_index_attach(spark, prefix, path, num_buckets),
        retire=_postings_retire(path))


@single_writer
def lexical_index_maintain(spark: SparkSession, prefix: str, path: str,
                           num_buckets: int = 8,
                           max_files_per_bucket: int = 8,
                           max_deleted_fraction: float = 0.2,
                           parallelism: int = 1) -> bool:
    """Close the lexical append/delete→degradation→reorganize loop
    (the lexical twin of ivf_index_maintain's drift gate), with TWO
    independent triggers, each the cheapest check that can see its
    form of decay:

    - fragmentation: postings file count (driver-side directory
      listing, no data read) past ``max_files_per_bucket`` per bucket
      → ``lexical_index_compact``;
    - deletion debt: distinct tombstoned ids past
      ``max_deleted_fraction`` of the stats-recorded corpus (one tiny
      tombstone-sidecar count + the stats scalar — Lucene's
      merge-on-deletes policy) → ``lexical_index_vacuum``, which also
      compacts by construction (staged one-file-per-bucket rewrite).

    The scheduler-friendly idempotent call a streaming ingest runs
    after every N batches. Returns True when a reorganization ran."""
    _check_meta(path, num_buckets)
    post_dir = os.path.join(path, POSTINGS_SUBDIR)
    if not os.path.isdir(post_dir):
        raise ValueError(
            f"no postings directory at {post_dir} — build the index "
            "first (lexical_index_build)")
    tomb = tombstone_ids(spark, path)
    if tomb is not None:
        n_tomb = tomb.count()
        n_docs = (spark.read.parquet(os.path.join(path, STATS_SUBDIR))
                  .agg(F.sum("n_docs")).head()[0]) or 0
        if n_docs and n_tomb / n_docs > max_deleted_fraction:
            lexical_index_vacuum(spark, prefix, path, num_buckets,
                                 parallelism)
            return True
    n_files = sum(1 for f in os.listdir(post_dir)
                  if f.endswith(".parquet"))
    if n_files <= max_files_per_bucket * num_buckets:
        return False
    lexical_index_compact(spark, prefix, path, num_buckets, parallelism)
    return True


POSITIONS_SUBDIR = "positions"


def _occurrences_frame(toks: DataFrame) -> DataFrame:
    """``toks(doc_id, w)`` → ``(tok, doc_id, pos)`` with 1-based
    positions — the positional layout's row shape, single-sourced so
    build and append can never encode positions differently."""
    return (toks
            .select("doc_id",
                    F.posexplode("w").alias("pos0", "tok"))
            .select("tok", "doc_id",
                    (F.col("pos0") + 1).cast("bigint").alias("pos")))


def positional_index_build(toks: DataFrame, prefix: str, path: str,
                           num_buckets: int = 8) -> None:
    """Build (or rebuild) the POSITIONAL index: a ``<prefix>_positions``
    bucketed catalog table ``(tok, doc_id, pos)`` with one row per
    token OCCURRENCE (1-based position), the layout phrase/proximity
    queries serve from. A phrase probe becomes a bucket-pruned scan of
    its terms plus a position-adjacency equi-join — never a corpus
    scan. Roughly dl/|distinct| times larger than the frequency
    postings, which is why it is a separate opt-in layout rather than
    a postings column.

    The index OWNS ``path`` exclusively (like lexical_index_build's):
    a rebuild clears the prior files, meta, AND append ledger — stale
    batch markers would otherwise silently skip replayed batches after
    a rebuild. Do NOT point it at a lexical index's path: the two
    layouts each own their directory (separate meta and ledgers)."""
    import shutil

    spark = toks.sparkSession
    prefix = _checked_prefix(prefix)
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_positions")
    shutil.rmtree(path, ignore_errors=True)
    (_occurrences_frame(toks).write.mode("overwrite")
     .bucketBy(num_buckets, "tok").sortBy("tok")
     .option("path", os.path.join(path, POSITIONS_SUBDIR))
     .format("parquet").saveAsTable(f"{prefix}_positions"))
    _write_meta(path, num_buckets)


def positional_index_attach(spark: SparkSession, prefix: str,
                            path: str, num_buckets: int = 8) -> None:
    """Register an existing on-disk positional index into a fresh
    session's catalog — the positional counterpart of
    lexical_index_attach, with the same bucket-count (meta + declared)
    and LOCATION validation."""
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_positions"
    _check_meta(path, num_buckets)
    spark.sql(f"""
        CREATE TABLE IF NOT EXISTS {table}
        (tok STRING, doc_id BIGINT, pos BIGINT)
        USING parquet
        CLUSTERED BY (tok) SORTED BY (tok) INTO {num_buckets} BUCKETS
        LOCATION '{_sql_path(os.path.join(path, POSITIONS_SUBDIR))}'
    """)
    declared = _table_num_buckets(spark, table)
    if declared != num_buckets:
        raise ValueError(
            f"{table} is registered with {declared} buckets but the "
            f"caller expects {num_buckets}")
    _check_table_at(spark, table, path, POSITIONS_SUBDIR)


def phrase_probe(spark: SparkSession, prefix: str, path: str,
                 phrase: tuple[str, ...], k: int = 20,
                 allowed: DataFrame | None = None) -> DataFrame:
    """Serve an exact N-term phrase query from the positional index —
    for the two-term case row-identical to the ad-hoc scan
    (queries.retrieval_ops.phrase_match_docs) because both count the
    same integer adjacency hits. Plan: ONE bucket-pruned scan of the
    positions table (≤|distinct terms| of the buckets listed), split
    into per-term position sets, chained equi-joins on
    (doc_id, pos_i = pos_0 + i) — each join keyed on doc_id with the
    position offset riding the key, so the intermediate never widens
    beyond documents that still match the phrase prefix. Grouped per
    doc. Columns: doc_id, n_occurrences, first_pos.

    ``allowed`` applies metadata-filtered serving with the same
    semantics as bm25_probe's: occurrence counts are document facts
    (filter-invariant), the gate semi-joins the per-doc frame BEFORE
    the top-k cut so k allowed docs come back."""
    if len(phrase) < 2:
        raise ValueError("phrase_probe needs at least two terms")
    _check_table_at(spark, f"{prefix}_positions", path,
                    POSITIONS_SUBDIR)
    posi = (spark.table(f"{prefix}_positions")
            .where(F.col("tok").isin(list(set(phrase)))))
    hits = (posi.where(F.col("tok") == phrase[0])
            .select("doc_id", F.col("pos").alias("pos")))
    for i, term in enumerate(phrase[1:], start=1):
        nxt = (posi.where(F.col("tok") == term)
               .select(F.col("doc_id").alias("n_doc"),
                       F.col("pos").alias("n_pos")))
        hits = (hits.join(nxt, (F.col("doc_id") == F.col("n_doc"))
                          & (F.col("n_pos") == F.col("pos") + i))
                .select("doc_id", "pos"))
    per_doc = (hits.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_occurrences"),
                    F.min("pos").alias("first_pos")))
    if allowed is not None:
        per_doc = per_doc.join(allowed.select("doc_id"), "doc_id",
                               "left_semi")
    # positional layouts share the lexical tombstone sidecar semantics
    per_doc = _without_tombstoned(per_doc, spark, path)
    return (per_doc.orderBy(F.desc("n_occurrences"), "doc_id")
            .limit(k))

def proximity_probe(spark: SparkSession, prefix: str, path: str,
                    terms: tuple[str, str], window: int = 5,
                    k: int = 20,
                    allowed: DataFrame | None = None) -> DataFrame:
    """Serve an unordered proximity query (terms within ``window``
    tokens) from the positional index — the served twin of
    queries.retrieval_ops.proximity_ranked_docs' ad-hoc scan. Same
    bucket-pruned two-term read as phrase_probe; the band predicate
    |pos_a − pos_b| ≤ window rides the doc_id equi-join. Columns:
    doc_id, n_pairs, min_span. ``allowed`` gates the per-doc frame
    before the top-k cut (bm25_probe's filtered-serving semantics)."""
    _check_table_at(spark, f"{prefix}_positions", path,
                    POSITIONS_SUBDIR)
    posi = (spark.table(f"{prefix}_positions")
            .where(F.col("tok").isin(list(terms))))
    a = posi.where(F.col("tok") == terms[0]).alias("a")
    b = posi.where(F.col("tok") == terms[1]).alias("b")
    span = F.abs(F.col("a.pos") - F.col("b.pos"))
    pairs = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                    & (span <= window))
             .select(F.col("a.doc_id").alias("doc_id"),
                     span.alias("span")))
    per_doc = (pairs.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_pairs"),
                    F.min("span").alias("min_span")))
    if allowed is not None:
        per_doc = per_doc.join(allowed.select("doc_id"), "doc_id",
                               "left_semi")
    per_doc = _without_tombstoned(per_doc, spark, path)
    return (per_doc.orderBy("min_span", F.desc("n_pairs"), "doc_id")
            .limit(k))


@single_writer
def positional_index_append(new_toks: DataFrame, prefix: str,
                            path: str, num_buckets: int = 8,
                            batch_id: int | str | None = None) -> bool:
    """Append a new document batch to the positional index under the
    same contract as lexical_index_append: catalog + bucket-count
    validation, new bucket files only, batch-id replay ledger (shared
    helpers). Probe parity with a rebuild holds by construction —
    phrase/proximity hits are per-document position facts, and new
    docs are NEW doc_ids."""
    spark = new_toks.sparkSession
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_positions"
    _require_bucketed_table(spark, table, num_buckets, path,
                            "positional_index_build", POSITIONS_SUBDIR)
    from jcf_nb_migration_spark.io.layout import (_ledger_commit,
                                                  _ledger_skip)

    marker, skip = _ledger_skip(path, batch_id)
    if skip:
        return False
    (_occurrences_frame(new_toks).write.mode("append")
     .bucketBy(num_buckets, "tok").sortBy("tok")
     .option("path", os.path.join(path, POSITIONS_SUBDIR))
     .format("parquet").saveAsTable(table))
    _ledger_commit(marker)
    return True


@single_writer
def positional_index_compact(spark: SparkSession, prefix: str,
                             path: str, num_buckets: int = 8,
                             parallelism: int = 1) -> int:
    """Compact a streamed-into positional index — the positional twin
    of lexical_index_compact, via the same staged-rewrite helper (one
    file per bucket per task, directory swap, re-attach). Probe
    results are invariant (phrase/proximity hits are per-row position
    facts, insensitive to file layout); the append ledger is
    untouched. Returns the compacted file count."""
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_positions"
    _require_bucketed_table(spark, table, num_buckets, path,
                            "positional_index_build", POSITIONS_SUBDIR)
    return _compact_bucketed_table(
        spark, table, path, POSITIONS_SUBDIR, "tok", num_buckets,
        parallelism,
        lambda: positional_index_attach(spark, prefix, path,
                                        num_buckets),
        retire=_positions_retire(path))


@single_writer
def positional_index_maintain(spark: SparkSession, prefix: str,
                              path: str, num_buckets: int = 8,
                              max_files_per_bucket: int = 8,
                              parallelism: int = 1) -> bool:
    """Fragmentation-gated positional compaction (the positional twin
    of lexical_index_maintain). Returns True when a compaction ran."""
    _check_meta(path, num_buckets)
    pos_dir = os.path.join(path, POSITIONS_SUBDIR)
    if not os.path.isdir(pos_dir):
        raise ValueError(
            f"no positions directory at {pos_dir} — build the index "
            "first (positional_index_build)")
    n_files = sum(1 for f in os.listdir(pos_dir)
                  if f.endswith(".parquet"))
    if n_files <= max_files_per_bucket * num_buckets:
        return False
    positional_index_compact(spark, prefix, path, num_buckets,
                             parallelism)
    return True


@single_writer
def positional_index_delete(spark: SparkSession, prefix: str,
                            path: str, doc_ids, num_buckets: int = 8,
                            batch_id: int | str | None = None) -> bool:
    """Lazy deletion for the positional layout — same tombstone
    sidecar and probe-side exclusion as lexical_index_delete (the
    positions table is tok-bucketed too, so eager deletion would
    rewrite every bucket). phrase_probe/proximity_probe exclude
    tombstoned docs immediately; physical reclaim rides the next
    rebuild (positions carry no corpus stats, so there is nothing to
    reconcile — a compaction-time reclaim variant would mirror
    lexical_index_vacuum's frame filter)."""
    import numbers

    prefix = _checked_prefix(prefix)
    _require_bucketed_table(spark, f"{prefix}_positions", num_buckets,
                            path, "positional_index_build",
                            POSITIONS_SUBDIR)
    bad = [i for i in doc_ids
           if isinstance(i, bool) or not isinstance(i, numbers.Integral)]
    if bad:
        raise TypeError(f"delete ids must be integers, got {bad[:3]!r}")
    ids = sorted({int(i) for i in doc_ids})
    if not ids:
        return False
    from jcf_nb_migration_spark.io.layout import (_ledger_commit,
                                                  _ledger_skip)

    marker, skip = _ledger_skip(
        path, None if batch_id is None else f"del-{batch_id}")
    if skip:
        return False
    (local_df(spark, [(i,) for i in ids], "doc_id bigint")
     .coalesce(1).write.mode("append")
     .parquet(os.path.join(path, TOMBSTONES_SUBDIR)))
    _ledger_commit(marker)
    return True


@single_writer
def positional_index_vacuum(spark: SparkSession, prefix: str,
                            path: str, num_buckets: int = 8,
                            parallelism: int = 1) -> dict:
    """Physically reclaim tombstoned documents from the positional
    layout: staged bucketed rewrite without their rows, tombstones
    cleared. Simpler than lexical_index_vacuum because positions carry
    no corpus statistics — there is nothing to reconcile; probe parity
    with a rebuild-without-the-docs is exact for every tombstoned id
    (phrase/proximity hits are per-row position facts). Returns
    ``{"reclaimed_docs": n, "reclaimed_positions": m}``."""
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_positions"
    _require_bucketed_table(spark, table, num_buckets, path,
                            "positional_index_build", POSITIONS_SUBDIR)
    tomb = tombstone_ids(spark, path)
    if tomb is None:
        return {"reclaimed_docs": 0, "reclaimed_positions": 0}
    import shutil

    dead = (spark.table(table)
            .join(F.broadcast(tomb), "doc_id", "left_semi"))
    # one pass for both reclaimed totals (per-doc partials, then a
    # global rollup) instead of a distinct-count pass plus a count pass
    dead_stats = (dead.groupBy("doc_id")
                  .agg(F.count(F.lit(1)).alias("np"))
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.coalesce(F.sum("np"), F.lit(0)).alias("m"))
                  .head())
    n_docs = int(dead_stats["n"])
    n_rows = int(dead_stats["m"])
    live = (spark.table(table)
            .join(F.broadcast(tomb), "doc_id", "left_anti"))
    _compact_bucketed_table(
        spark, table, path, POSITIONS_SUBDIR, "tok", num_buckets,
        parallelism,
        lambda: positional_index_attach(spark, prefix, path,
                                        num_buckets),
        frame=live, retire=_positions_retire(path))
    if _has_snapshots(path):
        _retire_surface_dir(path, os.path.join(path, TOMBSTONES_SUBDIR),
                            TOMBSTONES_SUBDIR)
    else:
        shutil.rmtree(os.path.join(path, TOMBSTONES_SUBDIR),
                      ignore_errors=True)
    return {"reclaimed_docs": n_docs, "reclaimed_positions": n_rows}


def bm25_batch_probe(spark: SparkSession, prefix: str, path: str,
                     queries: DataFrame, k1: float, b: float,
                     k: int = 20) -> DataFrame:
    """Serve a BATCH of BM25 queries from ONE pass over the index —
    the offline-eval / high-QPS shape where per-query probes would
    re-open the same buckets N times. ``queries`` is the normalized
    request table ``(query_id, tok)`` (request-bounded by nature, so
    it broadcasts everywhere it appears).

    Plan: ONE bucket-pruned postings scan covering the batch's
    distinct terms (the union of the per-query bucket sets — each
    bucket opened once, however many queries share it), df per term
    computed once on the bucket key with ZERO Exchange (shared across
    queries — document frequency is a corpus fact, not a query fact),
    scores grouped by (query_id, doc_id), and the per-query top-k via
    a query_id-PARTITIONED rank window (hash-distributed across the
    cluster; no global sort). Single-query parity with ``bm25_probe``
    is exact: identical expression tree, identical inputs. Tombstoned
    docs are excluded per the lazy-deletion contract. Columns:
    query_id, doc_id, n_terms_matched, bm25."""
    from pyspark.sql import Window

    _check_table_at(spark, f"{prefix}_postings", path, POSTINGS_SUBDIR)
    terms = [r["tok"] for r in queries.select("tok").distinct().collect()]
    if not terms:
        raise ValueError("bm25_batch_probe needs at least one term")
    post = (spark.table(f"{prefix}_postings")
            .where(F.col("tok").isin(terms)))
    dfreq = post.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df"))
    stats = (spark.read.parquet(os.path.join(path, STATS_SUBDIR))
             .agg(F.sum("n_docs").alias("n_docs"),
                  F.sum("sum_dl").alias("sum_dl"))
             .select("n_docs",
                     (F.col("sum_dl").cast("double") / F.col("n_docs"))
                     .alias("avgdl")))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = (F.col("tf") + k1 * (1.0 - b + b * F.col("dl")
                                 / F.col("avgdl")))
    scored = (post
              .join(F.broadcast(queries.select("query_id", "tok")
                                .distinct()), "tok")
              .join(F.broadcast(dfreq), "tok")
              .crossJoin(F.broadcast(stats))
              .groupBy("query_id", "doc_id")
              .agg(F.count(F.lit(1)).alias("n_terms_matched"),
                   F.round(F.sum(idf * F.col("tf") * (k1 + 1.0)
                                 / denom), 9).alias("bm25")))
    scored = _without_tombstoned(scored, spark, path)
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"),
                                               "doc_id")
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k).drop("rn")
            .orderBy("query_id", F.desc("bm25"), "doc_id"))


# ---------------------------------------------------------------------------
# Commit points (snapshots) — Lucene's SnapshotDeletionPolicy for the
# serving index (the r11 unification of the lakehouse commit protocol:
# docstore manifests, z-order versions, and now the serving index all
# retire superseded files instead of deleting them once a reader holds
# a reference).
#
# A SNAPSHOT records the exact parquet file lists of the three index
# surfaces (postings / stats / tombstones) at a commit point. From
# then on, any operation that would DESTROY a referenced file —
# compact and vacuum rewrite postings wholesale; vacuum also replaces
# the stats sidecar and clears tombstones — RETIRES the superseded
# files into ``path/_history/<surface>/`` instead (file-level COW,
# the docstore's _retire_files model). Appends and deletes are already
# additive, so they never invalidate a snapshot.
#
# Spark part-file names embed a job UUID, so a basename lives in
# exactly one of the live dir or _history — resolution is a two-place
# lookup and files MOVE between the places, never copy.
#
# - ``lexical_index_snapshot``  — record a commit point (O(#files)
#   driver metadata; no data read — Lucene snapshots are file-list
#   captures, not copies).
# - ``lexical_index_restore``   — make a snapshot the live state:
#   displaced live files retire to history (later snapshots keep
#   resolving them), referenced files move back from history, the
#   catalog entry is re-registered. O(changed files) renames.
# - ``lexical_snapshot_vacuum`` — retention: drop unneeded snapshots
#   and physically reclaim history files no kept snapshot references.
#
# Scope: the BM25 index surfaces at ``path`` (postings/stats/
# tombstones). The positional index is a sibling layout with its own
# dirs; give it the same treatment if a deployment needs phrase-probe
# time travel. The append ledger is delivery bookkeeping, not state:
# a restore does NOT reopen replayed batch ids (same contract as
# docstore_restore — the mutation log is append-only history).
#
# Local-FS file moves, like the ledger and meta — on HDFS/S3 route
# through the FileSystem API or a transactional table format.
#
# Scale note: a snapshot is an ADMIN operation (taken per maintenance
# window, not per query), so its O(#files) JSON capture is off the
# serve path by construction — probes never read a snapshot. If an
# index ever accretes so many files that the capture itself hurts
# (10⁶+, i.e. compaction has been neglected), store the file list as
# a parquet manifest segment exactly like io/zorder.py's — the
# upgrade is mechanical because resolution is already relpath-keyed.
# ---------------------------------------------------------------------------

SNAPSHOTS_SUBDIR = "_snapshots"
HISTORY_SUBDIR = "_history"
_SNAP_SURFACES = (POSTINGS_SUBDIR, STATS_SUBDIR, TOMBSTONES_SUBDIR)


def _snap_dir(path: str) -> str:
    return os.path.join(path, SNAPSHOTS_SUBDIR)


def _snap_path(path: str, sid: int) -> str:
    return os.path.join(_snap_dir(path), f"s{sid:05d}.json")


def _list_snapshots(path: str) -> list[int]:
    d = _snap_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(int(f[1:6]) for f in os.listdir(d)
                  if re.fullmatch(r"s\d{5}\.json", f))


def _has_snapshots(path: str) -> bool:
    return bool(_list_snapshots(path))


def _live_parquet(path: str, surface: str) -> list[str]:
    d = os.path.join(path, surface)
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


def _history_dir(path: str, surface: str) -> str:
    return os.path.join(path, HISTORY_SUBDIR, surface)


def _retire_surface_dir(path: str, src_dir: str, surface: str) -> None:
    """Move every parquet file of ``src_dir`` into the surface's
    history store, then drop the dir (non-parquet residue like
    _SUCCESS markers carries no data). Passed as the ``retire`` hook
    to _compact_bucketed_table when snapshots exist."""
    import shutil

    hist = _history_dir(path, surface)
    os.makedirs(hist, exist_ok=True)
    if os.path.isdir(src_dir):
        for f in os.listdir(src_dir):
            if f.endswith(".parquet"):
                os.replace(os.path.join(src_dir, f),
                           os.path.join(hist, f))
        shutil.rmtree(src_dir, ignore_errors=True)


def _postings_retire(path: str):
    """The ``retire`` hook compact/vacuum pass to
    _compact_bucketed_table: COW-retirement once any snapshot holds a
    reference, plain deletion (the pre-snapshot behavior, no history
    accretion) otherwise."""
    if not _has_snapshots(path):
        return None
    return lambda old_dir: _retire_surface_dir(path, old_dir,
                                               POSTINGS_SUBDIR)


def _read_snapshot(path: str, sid: int) -> dict:
    import json

    sp = _snap_path(path, sid)
    if not os.path.exists(sp):
        raise ValueError(
            f"index at {path} has no snapshot {sid} "
            f"(available: {_list_snapshots(path)} — vacuumed or never "
            "taken)")
    with open(sp) as fh:
        return json.load(fh)


def _take_snapshot(path: str, surfaces, num_buckets: int,
                   note: str) -> int:
    """Shared commit-point writer (lexical + positional wrappers):
    the file lists of the given surfaces, the bucket count, a caller
    note. Atomic via tmp+rename, like every manifest writer here. The
    surfaces are RECORDED IN the manifest, so restore and retention
    are layout-agnostic — they iterate what the snapshot captured."""
    import json

    snaps = _list_snapshots(path)
    sid = (snaps[-1] + 1) if snaps else 0
    doc = {"snapshot": sid, "note": note, "num_buckets": num_buckets,
           "files": {s: _live_parquet(path, s) for s in surfaces}}
    os.makedirs(_snap_dir(path), exist_ok=True)
    tmp = _snap_path(path, sid) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, _snap_path(path, sid))
    return sid


@single_writer
def lexical_index_snapshot(spark: SparkSession, prefix: str, path: str,
                           num_buckets: int = 8, note: str = "") -> int:
    """Record a commit point over the live index state and return its
    snapshot id. Pure driver metadata: the file lists of the three
    surfaces, the bucket count (restore validates it — a snapshot is
    only meaningful against the layout it captured), and a caller
    note."""
    prefix = _checked_prefix(prefix)
    _require_bucketed_table(spark, f"{prefix}_postings", num_buckets,
                            path, "lexical_index_build",
                            POSTINGS_SUBDIR)
    _recover_vacuum_plan(spark, prefix, path)
    _recover_swap_residue(spark, f"{prefix}_postings", path,
                          POSTINGS_SUBDIR, _postings_retire(path))
    return _take_snapshot(path, _SNAP_SURFACES, num_buckets, note)


def lexical_index_snapshots(spark: SparkSession, path: str) -> DataFrame:
    """The index's commit-point log as a frame (the serving twin of
    docstore_history): one row per live snapshot with its per-surface
    file counts."""
    rows = []
    for sid in _list_snapshots(path):
        m = _read_snapshot(path, sid)
        rows.append((sid, m.get("note", ""),
                     len(m["files"][POSTINGS_SUBDIR]),
                     len(m["files"][STATS_SUBDIR]),
                     len(m["files"][TOMBSTONES_SUBDIR])))
    return local_df(
        spark, rows or [(None, None, None, None, None)],
        "snapshot int, note string, n_postings_files int, "
        "n_stats_files int, n_tombstone_files int"
    ).where(F.col("snapshot").isNotNull())


@single_writer
def lexical_index_restore(spark: SparkSession, prefix: str, path: str,
                          snapshot_id: int,
                          num_buckets: int = 8) -> dict:
    """Make ``snapshot_id`` the live index state, file-level COW:
    live files the snapshot doesn't reference retire to history
    (snapshots taken before OR after this one keep resolving them),
    referenced files move back from history, and the catalog entry is
    re-registered so the session's file listing can't serve the old
    set. O(changed files) driver renames — no data pass. Probes after
    a restore score exactly as they did at the commit point (pinned
    in tests/test_lexical_snapshot.py). Returns the per-surface move
    counts."""
    import shutil

    prefix = _checked_prefix(prefix)
    table = f"{prefix}_postings"
    _require_bucketed_table(spark, table, num_buckets, path,
                            "lexical_index_build", POSTINGS_SUBDIR)
    _recover_vacuum_plan(spark, prefix, path)
    _recover_swap_residue(spark, table, path, POSTINGS_SUBDIR,
                          _postings_retire(path))
    man = _read_snapshot(path, snapshot_id)
    if man["num_buckets"] != num_buckets:
        raise ValueError(
            f"snapshot {snapshot_id} captured a {man['num_buckets']}-"
            f"bucket layout but the caller expects {num_buckets}")
    moves = _restore_files(path, man, snapshot_id)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    lexical_index_attach(spark, prefix, path, num_buckets)
    return moves


def _restore_files(path: str, man: dict, snapshot_id: int) -> dict:
    """Shared restore file-mover: two-place COW moves per surface the
    manifest recorded (layout-agnostic — see _take_snapshot).

    Resolvability is validated across ALL surfaces BEFORE the first
    move: a snapshot file missing from both the live dir and history
    (reclaimed by lexical_snapshot_vacuum) must abort with the live
    state untouched — a mid-loop raise would strand a half-restored
    index (some surfaces swapped, some not) that re-running cannot
    repair, since the raise reproduces."""
    import shutil

    plan = {}
    for surface in man["files"]:
        want = set(man["files"][surface])
        live = set(_live_parquet(path, surface))
        hist = _history_dir(path, surface)
        for f in sorted(want - live):
            if not os.path.exists(os.path.join(hist, f)):
                raise ValueError(
                    f"snapshot {snapshot_id} references "
                    f"{surface}/{f} which is in neither the live dir "
                    "nor _history — reclaimed by "
                    "lexical_snapshot_vacuum?")
        plan[surface] = (want, live)
    moves = {}
    for surface, (want, live) in plan.items():
        live_dir = os.path.join(path, surface)
        hist = _history_dir(path, surface)
        os.makedirs(hist, exist_ok=True)
        for f in sorted(live - want):      # displaced by the restore
            os.replace(os.path.join(live_dir, f),
                       os.path.join(hist, f))
        missing = sorted(want - live)
        if missing:
            os.makedirs(live_dir, exist_ok=True)
        for f in missing:
            os.replace(os.path.join(hist, f),
                       os.path.join(live_dir, f))
        if not want and os.path.isdir(live_dir):
            # surface absent at the commit point (e.g. no tombstones
            # yet): an empty live dir would break the sidecar readers
            shutil.rmtree(live_dir, ignore_errors=True)
        moves[surface] = {"retired": len(live - want),
                          "restored": len(missing)}
    return moves


@single_writer
def lexical_snapshot_vacuum(spark: SparkSession, path: str,
                            keep: list[int]) -> dict:
    """Retention: drop every snapshot not in ``keep`` and physically
    reclaim history files no kept snapshot references. Live files are
    never touched — reclamation only ever shrinks ``_history``. The
    explicit keep-list (rather than an age cutoff) matches
    docstore_snapshot_vacuum: retention is a policy decision the
    caller owns."""
    have = _list_snapshots(path)
    keep_set = {int(k) for k in keep}
    missing = keep_set - set(have)
    if missing:
        raise ValueError(
            f"cannot keep nonexistent snapshots {sorted(missing)} "
            f"(available: {have})")
    # surfaces come from the manifests themselves (layout-agnostic:
    # the same retention serves lexical and positional index paths)
    referenced: dict[str, set] = {}
    for sid in sorted(keep_set):
        m = _read_snapshot(path, sid)
        for s, files in m["files"].items():
            referenced.setdefault(s, set()).update(files)
    dropped = [sid for sid in have if sid not in keep_set]
    for sid in dropped:
        os.remove(_snap_path(path, sid))
    hist_root = os.path.join(path, HISTORY_SUBDIR)
    reclaimed = 0
    if os.path.isdir(hist_root):
        for s in os.listdir(hist_root):
            hist = os.path.join(hist_root, s)
            if not os.path.isdir(hist):
                continue
            for f in os.listdir(hist):
                if (f.endswith(".parquet")
                        and f not in referenced.get(s, set())):
                    os.remove(os.path.join(hist, f))
                    reclaimed += 1
    return {"dropped_snapshots": len(dropped),
            "reclaimed_files": reclaimed}


_POS_SNAP_SURFACES = (POSITIONS_SUBDIR, TOMBSTONES_SUBDIR)


def _positions_retire(path: str):
    """Disposal policy for the positional layout's rewrites (compact/
    vacuum): COW-retire once a snapshot exists, plain delete
    otherwise — _postings_retire's twin."""
    if not _has_snapshots(path):
        return None
    return lambda old_dir: _retire_surface_dir(path, old_dir,
                                               POSITIONS_SUBDIR)


@single_writer
def positional_index_snapshot(spark: SparkSession, prefix: str,
                              path: str, num_buckets: int = 8,
                              note: str = "") -> int:
    """Commit point over the positional (phrase/proximity) layout —
    same contract as lexical_index_snapshot, two surfaces (positions +
    tombstones; the layout carries no corpus-stats sidecar)."""
    prefix = _checked_prefix(prefix)
    _require_bucketed_table(spark, f"{prefix}_positions", num_buckets,
                            path, "positional_index_build",
                            POSITIONS_SUBDIR)
    _recover_swap_residue(spark, f"{prefix}_positions", path,
                          POSITIONS_SUBDIR, _positions_retire(path))
    return _take_snapshot(path, _POS_SNAP_SURFACES, num_buckets, note)


@single_writer
def positional_index_restore(spark: SparkSession, prefix: str,
                             path: str, snapshot_id: int,
                             num_buckets: int = 8) -> dict:
    """Make ``snapshot_id`` the live positional layout (two-place COW
    moves + catalog re-register) — lexical_index_restore's twin.
    Retention is the shared ``lexical_snapshot_vacuum`` (it iterates
    the surfaces each manifest recorded, so it serves both layouts)."""
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_positions"
    _require_bucketed_table(spark, table, num_buckets, path,
                            "positional_index_build", POSITIONS_SUBDIR)
    _recover_swap_residue(spark, table, path, POSITIONS_SUBDIR,
                          _positions_retire(path))
    man = _read_snapshot(path, snapshot_id)
    if man["num_buckets"] != num_buckets:
        raise ValueError(
            f"snapshot {snapshot_id} captured a {man['num_buckets']}-"
            f"bucket layout but the caller expects {num_buckets}")
    moves = _restore_files(path, man, snapshot_id)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    positional_index_attach(spark, prefix, path, num_buckets)
    return moves
