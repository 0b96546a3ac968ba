"""Persisted document store — the fetch-by-id half of the serving
stack (reference scope: the content the reference's migration keeps per
row, main.py's full-frame CSV sinks, re-expressed as a point-lookup
layout for the 100 TB serving path).

The lexical/positional/vector indexes (io/lexical.py, io/layout.py)
answer "WHICH documents match" — they return doc_ids. A RAG serving
loop then needs the documents themselves, and joining k ids back
against a corpus-sized parquet scan would read every file for a
20-row fetch. The docstore is the layout that makes the fetch cheap:

- ``<prefix>_docs`` — the corpus as a BUCKETED catalog table, bucketed
  AND sorted by ``doc_id`` (external parquet under ``path/docs``). The
  build is the one corpus pass; after it, a fetch of k literal ids is
  a BUCKET-PRUNED scan (``SelectedBucketsCount ≤ k`` in the FileScan —
  non-matching buckets are never listed) and the ``sortBy(doc_id)``
  min/max stats prune row groups WITHIN each bucket file, so the bytes
  read scale with k, not the corpus.
- ``path/_appended_batches`` — the same committed-batch replay ledger
  the lexical/positional/IVF layouts share (io/layout._ledger_skip),
  so a Structured Streaming foreachBatch ingest is effectively-once.
- ``path/_index_meta.json`` — bucket count (validated on every attach
  and append, as in io/lexical) plus the table's column DDL, so a
  fresh session can re-register the table without the caller having to
  restate the schema.
- ``path/_versions`` + ``path/_history`` — per-mutation version
  manifests and the retired-file store behind them: Delta-style time
  travel (``docstore_as_of``), a row-level change feed between any two
  versions (``docstore_version_diff``), a commit log
  (``docstore_history``), and explicit retention
  (``docstore_snapshot_vacuum``). See the time-travel block below.

At 100 TB the fetch pattern is exactly a key-value point lookup
expressed in Spark's storage model: the id list arrives from a probe
(top-k) or a client request, lands as literal ``IN`` predicates, and
bucket pruning turns the "join" into opening a handful of files.
Fragmentation from streamed appends is handled by the shared
staged-rewrite compactor (io/lexical._compact_bucketed_table), gated
behind ``docstore_maintain``.

Local-FS assumption: build cleanup, the ledger, and the compactor's
directory swap are driver-local filesystem calls — the same documented
stand-in as the other layouts; on HDFS/S3 route them through the
Hadoop FileSystem API or a transactional table format.
"""

from __future__ import annotations

from jcf_nb_migration_spark.io.locking import single_writer

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jcf_nb_migration_spark.localrel import local_df

from jcf_nb_migration_spark.io.lexical import (
    _IDENT,
    _check_meta,
    _check_table_at,
    _checked_prefix,
    _compact_bucketed_table,
    _read_meta,
    _require_bucketed_table,
    _sql_path,
    _table_num_buckets,
    _write_meta,
)

DOCS_SUBDIR = "docs"
VERSIONS_SUBDIR = "_versions"   # one JSON manifest per table version
HISTORY_SUBDIR = "_history"     # superseded (COW-replaced) data files

# simpleString() output that is safe to interpolate into CREATE TABLE:
# type names, digits, nesting/precision punctuation, and the spaces
# legitimate types carry ("interval day to second"). Field NAMES at
# every nesting level are validated structurally (below) because a
# space-bearing nested name would pass this charset yet still break
# the attach statement.
_TYPE_DDL = re.compile(r"^[A-Za-z0-9_<>,:() ]+$")


def _check_nested_names(dtype, col: str) -> None:
    """Every field name at every nesting level must be a plain
    identifier — simpleString() embeds nested names verbatim, so a
    name with a space or quote would produce unparseable (or
    injectable) DDL at attach time. Validated structurally on the
    Catalyst type tree, not on the rendered string."""
    from pyspark.sql import types as sqltypes

    if isinstance(dtype, sqltypes.StructType):
        for f in dtype.fields:
            if not _IDENT.match(f.name):
                raise ValueError(
                    f"docstore column {col!r} has a nested field name "
                    f"that is not a SQL identifier: {f.name!r} — "
                    "rename it before storing")
            _check_nested_names(f.dataType, col)
    elif isinstance(dtype, sqltypes.ArrayType):
        _check_nested_names(dtype.elementType, col)
    elif isinstance(dtype, sqltypes.MapType):
        _check_nested_names(dtype.keyType, col)
        _check_nested_names(dtype.valueType, col)


def _schema_ddl(df: DataFrame) -> str:
    """Column DDL for the meta file / attach statement. Names are
    validated as identifiers at EVERY nesting level and types
    (Catalyst ``simpleString``) against a safe DDL charset — both land
    inside CREATE TABLE."""
    cols = []
    for fld in df.schema.fields:
        if not _IDENT.match(fld.name):
            raise ValueError(
                f"docstore column name must be a SQL identifier, "
                f"got {fld.name!r}")
        _check_nested_names(fld.dataType, fld.name)
        ts = fld.dataType.simpleString()
        if not _TYPE_DDL.match(ts):
            raise ValueError(
                f"docstore column {fld.name!r} has a type whose DDL "
                f"rendering contains unsafe characters ({ts!r})")
        cols.append(f"{fld.name} {ts}")
    return ", ".join(cols)


def _meta_columns(path: str) -> str:
    meta = _read_meta(path)
    if meta is None:
        raise ValueError(
            f"no docstore meta under {path} — attach needs the "
            "column DDL recorded by docstore_build")
    if "columns" not in meta:
        raise ValueError(
            f"meta under {path} records no column DDL — not a "
            "docstore index?")
    return meta["columns"]


# --------------------------------------------------------------------
# Time travel (version manifests + AS OF reads + retention vacuum)
#
# Delta-style snapshot semantics on plain parquet: every mutation
# (build/append/upsert/delete/compact/add_columns) commits a JSON
# manifest under path/_versions naming the table's LIVE data files at
# that version, and copy-on-write never destroys a superseded file —
# it MOVES it to path/_history (Spark part-file names embed a job
# UUID, so basenames are globally unique and a name resolves to
# exactly one of docs/ or _history/). An AS-OF read is then just
# "open the manifest's files with the manifest's schema" — no log
# replay, no reconstruction — and retention is explicit:
# docstore_snapshot_vacuum drops old manifests and deletes the
# history files only they referenced. Manifest commit is a
# write-tmp-then-rename on the driver-local FS — the same documented
# stand-in as the ledger and the compactor's swap (on HDFS/S3, route
# through the FileSystem API or a table format).
# --------------------------------------------------------------------


def _versions_dir(path: str) -> str:
    return os.path.join(path, VERSIONS_SUBDIR)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_versions_dir(path), f"v{version:05d}.json")


def _list_manifests(path: str) -> list[int]:
    vdir = _versions_dir(path)
    if not os.path.isdir(vdir):
        return []
    out = []
    for f in os.listdir(vdir):
        m = re.fullmatch(r"v(\d{5})\.json", f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _live_data_files(path: str) -> list[str]:
    data_dir = os.path.join(path, DOCS_SUBDIR)
    return sorted(f for f in os.listdir(data_dir)
                  if f.endswith(".parquet"))


def _commit_manifest(path: str, op: str,
                     batch_id: int | str | None = None) -> int:
    """Record the CURRENT live file set (and column DDL) as the next
    table version. Called by every mutating entry point AFTER its
    files are in place."""
    import json

    vdir = _versions_dir(path)
    os.makedirs(vdir, exist_ok=True)
    existing = _list_manifests(path)
    version = (existing[-1] + 1) if existing else 0
    meta = _read_meta(path) or {}
    manifest = {
        "version": version,
        "op": op,
        "batch_id": None if batch_id is None else str(batch_id),
        "columns": meta.get("columns"),
        "files": _live_data_files(path),
    }
    tmp = _manifest_path(path, version) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, _manifest_path(path, version))
    return version


def _read_manifest(path: str, version: int) -> dict:
    import json

    mp = _manifest_path(path, version)
    if not os.path.isfile(mp):
        have = _list_manifests(path)
        raise ValueError(
            f"docstore at {path} has no version {version} "
            f"(available: {have or 'none'} — vacuumed or never "
            "committed)")
    with open(mp) as fh:
        return json.load(fh)


def _retire_files(path: str, src_dir: str) -> None:
    """Move superseded data files into the history dir (keeping their
    globally-unique basenames) instead of deleting them, so older
    manifests stay readable until an explicit snapshot vacuum."""
    import shutil

    hist = os.path.join(path, HISTORY_SUBDIR)
    os.makedirs(hist, exist_ok=True)
    for f in os.listdir(src_dir):
        if not f.endswith(".parquet"):
            continue
        dst = os.path.join(hist, f)
        if os.path.exists(dst):
            raise RuntimeError(
                f"history collision for {f} — part-file basenames are "
                "expected to be globally unique (job-UUID named); "
                "refusing to overwrite retained snapshot data")
        os.rename(os.path.join(src_dir, f), dst)
    shutil.rmtree(src_dir)


def docstore_version(path: str) -> int:
    """Latest committed table version (0-based; build commits v0)."""
    versions = _list_manifests(path)
    if not versions:
        raise ValueError(
            f"no version manifests under {path} — not a docstore, or "
            "built before versioning? (docstore_build commits v0)")
    return versions[-1]


def docstore_history(spark: SparkSession, path: str) -> DataFrame:
    """The table's commit log as a frame: one row per retained
    version — (version, op, batch_id, n_files). Driver-side JSON
    reads over the (bounded) manifest list: control plane."""
    rows = [(m["version"], m["op"], m["batch_id"], len(m["files"]))
            for m in (_read_manifest(path, v)
                      for v in _list_manifests(path))]
    return local_df(
        spark, rows, "version bigint, op string, batch_id string, "
                     "n_files bigint")


def docstore_as_of(spark: SparkSession, prefix: str, path: str,
                   version: int) -> DataFrame:
    """Read the docstore AS OF a committed version: exactly the
    manifest's files, with the manifest's schema (so a snapshot taken
    before a docstore_add_columns reads with its own narrower DDL).
    Historical reads are plain parquet scans of an explicit file list
    — row-group min/max pruning on doc_id still applies (the files
    were written sortBy(doc_id)), but bucket pruning does not; serve
    hot point-lookups from the CURRENT version's bucketed table
    (docstore_fetch) and keep AS-OF for audits, replays, and diffs."""
    _checked_prefix(prefix)  # same identifier hygiene as the table API
    man = _read_manifest(path, version)
    if not man["files"]:
        return local_df(spark, [], man["columns"])
    data_dir = os.path.join(path, DOCS_SUBDIR)
    hist = os.path.join(path, HISTORY_SUBDIR)
    paths = []
    for f in man["files"]:
        live = os.path.join(data_dir, f)
        old = os.path.join(hist, f)
        if os.path.isfile(live):
            paths.append(live)
        elif os.path.isfile(old):
            paths.append(old)
        else:
            raise ValueError(
                f"version {version} references {f}, which is in "
                "neither the live table nor history — vacuumed past "
                "this snapshot (docstore_snapshot_vacuum retention)")
    return spark.read.schema(man["columns"]).parquet(*paths)


def docstore_version_diff(spark: SparkSession, prefix: str, path: str,
                          v_old: int, v_new: int) -> DataFrame:
    """Row-level change feed between two committed versions —
    ``(doc_id, change)`` with change ∈ insert/delete/update — the CDC
    read a downstream index maintainer consumes instead of re-scanning
    the corpus. Computed as ONE full-outer join of the two snapshots
    on doc_id (null-safe equality over the UNION of the two versions'
    payload columns — a column absent from the older snapshot reads as
    NULL, the same contract docstore_as_of gives pre-evolution files,
    so an upsert that only touches a newly added column IS an update);
    rows equal on every column are dropped. Both sides are
    manifest-scoped file scans, so the cost is the two snapshots'
    touched data, never the commit count."""
    a = docstore_as_of(spark, prefix, path, v_old)
    b = docstore_as_of(spark, prefix, path, v_new)
    cols = [c for c in dict.fromkeys(a.columns + b.columns)
            if c != "doc_id"]

    def side(df, tag):
        # a column the snapshot predates reads as NULL (ADVICE r10:
        # comparing only shared columns missed evolved-column updates)
        proj = [(F.col(c) if c in df.columns else F.lit(None))
                .alias(f"_{tag}_{c}") for c in cols]
        return df.select("doc_id", *proj,
                         F.lit(1).alias(f"_{tag}_present"))

    # explicit presence sentinels (robust to rows whose every payload
    # column is null — isNotNull on payload would misread those)
    an = side(a, "a")
    bn = side(b, "b")
    same = F.lit(True)
    for c in cols:
        same = same & F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
    j = an.join(bn, "doc_id", "full_outer")
    change = (F.when(F.col("_a_present").isNull(), F.lit("insert"))
              .when(F.col("_b_present").isNull(), F.lit("delete"))
              .when(same, F.lit(None))
              .otherwise(F.lit("update")))
    return (j.select("doc_id", change.alias("change"))
            .where(F.col("change").isNotNull()))


@single_writer
def docstore_restore(spark: SparkSession, prefix: str, path: str,
                     version: int, num_buckets: int = 8) -> int:
    """Roll the LIVE table back to a committed version (Delta's
    RESTORE): live files the target manifest doesn't reference retire
    to history, and the target's files move back from history — both
    are renames, preserving the invariant that a basename lives in
    exactly one of docs/ and _history/, so every other manifest keeps
    resolving. The restore itself commits a NEW version (an audit
    trail that the rollback happened; the rolled-back states remain
    readable AS OF their numbers). The table keeps its CURRENT
    declared schema — files from a pre-evolution version simply read
    NULL for later columns, the same contract as add_columns. The
    append ledger is untouched: a batch committed before the restore
    stays committed (replaying it after a rollback is an application
    decision, not an engine default). Returns the new version
    number."""
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_docs"
    _require_bucketed_table(spark, table, num_buckets, path,
                            "docstore_build", DOCS_SUBDIR)
    _recover_cow_residue(path, spark, table)  # restore's two-place
    #   moves assume every basename is in exactly one of docs/ and
    #   _history/
    man = _read_manifest(path, version)
    target = set(man["files"])
    data_dir = os.path.join(path, DOCS_SUBDIR)
    hist = os.path.join(path, HISTORY_SUBDIR)
    live = set(_live_data_files(path))
    missing = [f for f in target - live
               if not os.path.isfile(os.path.join(hist, f))]
    if missing:
        raise ValueError(
            f"cannot restore to version {version}: {len(missing)} of "
            f"its files are in neither the live table nor history "
            f"(vacuumed past this snapshot) — e.g. {missing[:3]}")
    os.makedirs(hist, exist_ok=True)
    for f in sorted(live - target):
        os.rename(os.path.join(data_dir, f), os.path.join(hist, f))
    for f in sorted(target - live):
        os.rename(os.path.join(hist, f), os.path.join(data_dir, f))
    spark.sql(f"REFRESH TABLE {table}")
    return _commit_manifest(path, "restore", batch_id=f"to-v{version}")


def docstore_incremental_view(spark: SparkSession, prefix: str,
                              path: str, view: DataFrame,
                              v_from: int, v_to: int,
                              cols: list[str]) -> DataFrame:
    """Roll a derived view forward using ONLY the change feed — the
    consumer half of docstore_version_diff. ``view`` is a projection
    (``cols``, which must include doc_id) of the store at ``v_from``;
    the result is that same projection at ``v_to``, computed as
    O(|changes|) work: changed/deleted rows are anti-joined out of the
    view, and the replacement rows come from the ``v_to`` snapshot
    restricted (semi-join — the id set pushes into the manifest-scoped
    scan) to inserted/updated ids. A downstream index maintainer runs
    this instead of re-projecting the corpus; parity with the full
    re-projection is pinned in tests/test_timetravel.py."""
    if "doc_id" not in cols:
        raise ValueError("cols must include doc_id (the join key)")
    diff = docstore_version_diff(spark, prefix, path, v_from, v_to)
    changed = diff.select("doc_id")
    kept = view.join(changed, "doc_id", "left_anti")
    snap = docstore_as_of(spark, prefix, path, v_to)
    replacements = (snap.join(
        diff.where(F.col("change") != "delete"), "doc_id", "left_semi")
        .select(*cols))
    return kept.unionByName(replacements)


@single_writer
def docstore_snapshot_vacuum(path: str, keep_last: int = 2) -> int:
    """Retention: keep the newest ``keep_last`` versions, drop older
    manifests, and physically delete the history files no retained
    manifest references. Live files are never candidates (the latest
    manifest always references them). Returns the number of data
    files deleted. The latest version is always retained
    (keep_last < 1 raises)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the live version "
                         "cannot be vacuumed)")
    versions = _list_manifests(path)
    if not versions:
        raise ValueError(f"no version manifests under {path}")
    keep = set(versions[-keep_last:])
    referenced: set[str] = set()
    for v in keep:
        referenced.update(_read_manifest(path, v)["files"])
    n_deleted = 0
    hist = os.path.join(path, HISTORY_SUBDIR)
    if os.path.isdir(hist):
        for f in os.listdir(hist):
            if f.endswith(".parquet") and f not in referenced:
                os.remove(os.path.join(hist, f))
                n_deleted += 1
    for v in versions:
        if v not in keep:
            os.remove(_manifest_path(path, v))
    return n_deleted


def docstore_build(docs: DataFrame, prefix: str, path: str,
                   num_buckets: int = 8) -> None:
    """Build (or rebuild) the document store from ``docs`` (any frame
    with a ``doc_id`` column; every column is stored). The index OWNS
    ``path`` exclusively — a rebuild clears prior files, meta, AND the
    append ledger (stale batch markers would silently skip replayed
    batches after a rebuild)."""
    import shutil

    if "doc_id" not in docs.columns:
        raise ValueError("docstore frame must have a doc_id column")
    id_type = docs.schema["doc_id"].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"docstore doc_id must be an integral type (fetch ids are "
            f"literal integers), got {id_type}")
    spark = docs.sparkSession
    prefix = _checked_prefix(prefix)
    ddl = _schema_ddl(docs)
    spark.sql(f"DROP TABLE IF EXISTS {prefix}_docs")
    shutil.rmtree(path, ignore_errors=True)
    (docs.write.mode("overwrite")
     .bucketBy(num_buckets, "doc_id").sortBy("doc_id")
     .option("path", os.path.join(path, DOCS_SUBDIR))
     .format("parquet").saveAsTable(f"{prefix}_docs"))
    _write_meta(path, num_buckets, extra={"columns": ddl})
    _commit_manifest(path, "build")  # version 0 (rebuild resets history)


def docstore_attach(spark: SparkSession, prefix: str, path: str,
                    num_buckets: int = 8) -> None:
    """Register an existing on-disk docstore into a fresh session's
    catalog (the in-memory-catalog stand-in for a metastore). The
    column DDL comes from the build's meta record; bucket count and
    LOCATION are validated exactly as in lexical_index_attach."""
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_docs"
    _check_meta(path, num_buckets)  # against the BUILD's recorded count
    columns = _meta_columns(path)
    spark.sql(f"""
        CREATE TABLE IF NOT EXISTS {table} ({columns})
        USING parquet
        CLUSTERED BY (doc_id) SORTED BY (doc_id)
        INTO {num_buckets} BUCKETS
        LOCATION '{_sql_path(os.path.join(path, DOCS_SUBDIR))}'
    """)
    declared = _table_num_buckets(spark, table)
    if declared != num_buckets:
        raise ValueError(
            f"{table} is registered with {declared} buckets but the "
            f"caller expects {num_buckets}; bucket pruning would "
            "silently fetch from the wrong buckets")
    _check_table_at(spark, table, path, DOCS_SUBDIR)


def _check_batch_schema(spark: SparkSession, table: str,
                        new_docs: DataFrame) -> None:
    """Structural type validation against the table schema:
    ``mode("append")`` (and the COW staging writer) happily write
    parquet files with a drifted physical type (e.g. doc_id as
    double), which breaks every later fetch/compact read — fail
    loudly before any file lands, the write-side twin of
    docstore_build's doc_id integrality check."""
    table_types = {f.name: f.dataType.simpleString()
                   for f in spark.table(table).schema.fields}
    missing = [c for c in table_types if c not in new_docs.columns]
    if missing:
        raise ValueError(
            f"append batch is missing docstore columns {missing}")
    drifted = [
        f"{f.name}: batch {f.dataType.simpleString()} != table "
        f"{table_types[f.name]}"
        for f in new_docs.schema.fields
        if f.name in table_types
        and f.dataType.simpleString() != table_types[f.name]]
    if drifted:
        raise ValueError(
            "append batch column types drifted from the docstore "
            "schema (a type-mismatched parquet append corrupts later "
            "reads): " + "; ".join(drifted))


@single_writer
def docstore_append(new_docs: DataFrame, prefix: str, path: str,
                    num_buckets: int = 8,
                    batch_id: int | str | None = None) -> bool:
    """Append a new document batch under the shared appendable-layout
    contract (io/lexical.lexical_index_append): registered-table +
    bucket-count validation, new bucket files only, batch-id replay
    ledger. New docs must be NEW doc_ids — an update needs a
    transactional format; upstream dedup owns that here."""
    spark = new_docs.sparkSession
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_docs"
    _require_bucketed_table(spark, table, num_buckets, path,
                            "docstore_build", DOCS_SUBDIR)
    from jcf_nb_migration_spark.io.layout import (_ledger_commit,
                                                  _ledger_skip)

    _check_batch_schema(spark, table, new_docs)
    marker, skip = _ledger_skip(path, batch_id)
    if skip:
        return False  # replayed delivery: already appended
    (new_docs.select(*spark.table(table).columns)
     .write.mode("append")
     .bucketBy(num_buckets, "doc_id").sortBy("doc_id")
     .option("path", os.path.join(path, DOCS_SUBDIR))
     .format("parquet").saveAsTable(table))
    _commit_manifest(path, "append", batch_id)
    _ledger_commit(marker)
    return True


def docstore_fetch(spark: SparkSession, prefix: str, path: str,
                   doc_ids) -> DataFrame:
    """Point-fetch documents by literal id list. The ids land as an
    ``IN`` predicate on the bucket column, so the plan is a
    bucket-pruned scan (``SelectedBucketsCount ≤ |ids|``) with row-group
    min/max pruning inside each bucket file — no join, no shuffle, no
    corpus scan. This is the serve-side call a probe's top-k feeds
    (the id list is request-bounded by construction).

    Plan note: with the default ``autoBucketedScan`` the planner marks
    the scan ``Bucketed: false`` (no join/agg needs the distribution),
    but the file-level bucket pruning still applies — the non-bucketed
    read path filters files through the same bucket set, it just
    doesn't print ``SelectedBucketsCount``. The plan test disables
    autoBucketedScan to make the pruning visible and countable."""
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_docs"
    _check_table_at(spark, table, path, DOCS_SUBDIR)
    import numbers

    bad = [i for i in doc_ids
           if isinstance(i, bool) or not isinstance(i, numbers.Integral)]
    if bad:
        raise TypeError(
            f"docstore ids must be integers (doc_id is integral by "
            f"the build contract; floats would silently truncate), "
            f"got {bad[:3]!r}")
    ids = [int(i) for i in doc_ids]  # numpy/pandas ints -> builtin
    return spark.table(table).where(F.col("doc_id").isin(ids))


@single_writer
def docstore_compact(spark: SparkSession, prefix: str, path: str,
                     num_buckets: int = 8,
                     parallelism: int = 1) -> int:
    """Merge streamed-in bucket files back to ~one file per bucket via
    the shared staged-rewrite compactor. Fetch results are invariant
    (file layout is invisible to a point lookup); the append ledger is
    untouched — compaction reorganizes files, it does not open a new
    epoch. Returns the compacted file count."""
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_docs"
    # full write-side preamble INCLUDING the location guard: compacting
    # under a stale same-prefix registration would destructively
    # overwrite this path with another store's rows
    _require_bucketed_table(spark, table, num_buckets, path,
                            "docstore_build", DOCS_SUBDIR)
    _recover_cow_residue(path, spark, table)  # a half-swapped COW must
    #   not feed the compactor a live dir with touched buckets aside
    n = _compact_bucketed_table(
        spark, table, path, DOCS_SUBDIR, "doc_id", num_buckets,
        parallelism,
        lambda: docstore_attach(spark, prefix, path, num_buckets),
        retire=lambda old_dir: _retire_files(path, old_dir))
    _commit_manifest(path, "compact")
    return n


@single_writer
def docstore_maintain(spark: SparkSession, prefix: str, path: str,
                      num_buckets: int = 8,
                      max_files_per_bucket: int = 8,
                      parallelism: int = 1) -> bool:
    """Fragmentation-gated compaction (the docstore twin of
    lexical_index_maintain): a driver-side file count, compact only
    past ``max_files_per_bucket`` files per bucket. Returns True when
    a compaction ran."""
    _check_meta(path, num_buckets)
    docs_dir = os.path.join(path, DOCS_SUBDIR)
    if not os.path.isdir(docs_dir):
        raise ValueError(
            f"no docs directory at {docs_dir} — build the docstore "
            "first (docstore_build)")
    n_files = sum(1 for f in os.listdir(docs_dir)
                  if f.endswith(".parquet"))
    if n_files <= max_files_per_bucket * num_buckets:
        return False
    docstore_compact(spark, prefix, path, num_buckets, parallelism)
    return True


_BUCKET_FILE_RE = re.compile(r"_(\d{5})\.")


def _file_bucket_id(name: str) -> int | None:
    """Bucket id from Spark's bucketed file naming
    (``..._NNNNN.c000...``), or None for non-bucketed artifacts."""
    m = _BUCKET_FILE_RE.search(name)
    return int(m.group(1)) if m else None


def _touched_buckets(ids_frame: DataFrame, num_buckets: int) -> set:
    """Bucket ids the batch's doc_ids hash into, computed with the
    SAME expression Spark's bucketizer uses (pmod(murmur3, n) — pinned
    by the docstore plan test) so the rewrite set can never miss a
    file. Bounded by num_buckets, so the collect is control plane."""
    rows = (ids_frame.select(
        F.pmod(F.hash("doc_id"), F.lit(num_buckets)).alias("b"))
        .distinct().collect())
    return {r["b"] for r in rows}


def _recover_cow_residue(path: str, spark: SparkSession | None = None,
                         table: str | None = None) -> None:
    """Fold crash residue from a prior file-level COW swap back into a
    consistent live table. The swap publishes an intent log
    (``docs.cowswap.json``) atomically before its first rename, so
    recovery is deterministic and idempotent:

    - plan present: finish the swap — remaining planned old files out
      of the live dir, remaining planned staged files in — then drop
      the staging dir, retire the displaced files, remove the plan.
      The interrupted mutation never committed (ledger + manifest
      land after the swap), so its replay is an idempotent re-merge
      over the completed state.
    - no plan, ``.cowold`` present: pre-intent-log residue or a crash
      after plan removal — the stranded files are committed snapshot
      data (some manifest references them): retire to history, never
      destroy.
    - no plan, ``.cowstage`` present: the crash predates the first
      rename — nothing moved; the caller discards the stage.

    When ``spark``/``table`` are given and a plan was replayed, the
    table's cached file listing is refreshed — the completion moved
    files the catalog may still reference at their old location."""
    import json
    import shutil

    data_dir = os.path.join(path, DOCS_SUBDIR)
    staging = data_dir.rstrip("/") + ".cowstage"
    old_dir = data_dir.rstrip("/") + ".cowold"
    plan_path = data_dir.rstrip("/") + ".cowswap.json"
    if os.path.isfile(plan_path):
        try:
            with open(plan_path) as fh:
                plan = json.load(fh)
        except ValueError as exc:
            # published with flush+fsync+rename, so a torn plan means
            # external interference — name the file instead of
            # bricking every entry point with a bare JSONDecodeError
            raise RuntimeError(
                f"corrupt COW swap plan at {plan_path}: {exc}; "
                "inspect docs/, docs.cowstage and docs.cowold, "
                "reconcile manually, then delete the plan file"
            ) from exc
        os.makedirs(old_dir, exist_ok=True)
        for f in plan["old"]:
            src = os.path.join(data_dir, f)
            if os.path.isfile(src):
                os.replace(src, os.path.join(old_dir, f))
        for f in plan["staged"]:
            src = os.path.join(staging, f)
            if os.path.isfile(src):
                os.replace(src, os.path.join(data_dir, f))
        shutil.rmtree(staging, ignore_errors=True)
        _retire_files(path, old_dir)
        os.remove(plan_path)
        if spark is not None and table is not None:
            spark.sql(f"REFRESH TABLE {table}")
    elif os.path.isdir(old_dir):
        _retire_files(path, old_dir)


def _rewrite_touched_buckets(spark: SparkSession, table: str,
                             path: str, num_buckets: int,
                             touched: set, transform) -> int:
    """Copy-on-write core shared by upsert and delete: rewrite ONLY
    the bucket files the batch touches. The store is bucketed by
    doc_id, so a keyed mutation maps to a bounded set of buckets —
    unlike the tok-bucketed lexical postings, where one document
    spreads across every bucket and deletion must be lazy
    (io/lexical.lexical_index_delete).

    Steps: read the current rows of the touched buckets (their files
    only — never a store scan), apply ``transform`` (anti-join out
    replaced/deleted ids, union new rows), stage the result as a
    bucketed write beside the data dir, then swap: old touched files
    move aside, staged files move in, REFRESH drops the cached file
    listing. Untouched bucket files are never opened, read, or
    renamed — byte-identical before and after (pinned in
    tests/test_docstore.py). Replaced files are RETIRED into
    ``_history`` (older version manifests keep reading them; see the
    time-travel block above) rather than deleted.

    Crash safety: the file-level swap is driven by an INTENT LOG
    (``docs.cowswap.json``, written atomically before the first
    rename, removed after disposal). A crash anywhere inside the swap
    is completed deterministically from the plan by the next writer —
    remaining old files out, remaining staged files in, old retired —
    after which replaying the (never-committed) batch is an
    idempotent re-merge. Without a plan, recovery cannot tell
    moved-in staged files from pre-existing ones; the previous
    plan-less recovery (retire ``.cowold``, DELETE staging) silently
    erased every co-bucketed row from the live table when the crash
    landed between the move phases — the replay then read EMPTY
    touched buckets and rewrote them with batch rows only. Returns
    the number of staged files moved in."""
    import json
    import shutil

    data_dir = os.path.join(path, DOCS_SUBDIR)
    staging = data_dir.rstrip("/") + ".cowstage"
    old_dir = data_dir.rstrip("/") + ".cowold"
    _recover_cow_residue(path, spark, table)
    shutil.rmtree(staging, ignore_errors=True)
    old_files = [f for f in os.listdir(data_dir)
                 if f.endswith(".parquet")
                 and _file_bucket_id(f) in touched]
    schema = spark.table(table).schema
    if old_files:
        cur = spark.read.schema(schema).parquet(
            *[os.path.join(data_dir, f) for f in old_files])
    else:
        cur = local_df(spark, [], schema)
    stage_table = f"{table}_cowstage"
    spark.sql(f"DROP TABLE IF EXISTS {stage_table}")
    # coalesce(1): one file per touched bucket; the staged volume is
    # the touched buckets' rows, a 1/num_buckets-scale slice per
    # bucket, not the corpus.
    (transform(cur).coalesce(1).write.mode("overwrite")
     .bucketBy(num_buckets, "doc_id").sortBy("doc_id")
     .option("path", staging)
     .format("parquet").saveAsTable(stage_table))
    spark.sql(f"DROP TABLE {stage_table}")  # external: files remain
    staged_files = sorted(f for f in os.listdir(staging)
                          if f.endswith(".parquet"))
    # intent log first (atomic publish): from here a crash at ANY
    # point is completed deterministically by _recover_cow_residue
    plan_path = data_dir.rstrip("/") + ".cowswap.json"
    tmp = plan_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"old": sorted(old_files), "staged": staged_files},
                  fh)
        fh.flush()
        os.fsync(fh.fileno())  # the plan gates a destructive swap: a
        #   rename durable before its data would strand a torn plan
    os.replace(tmp, plan_path)
    os.makedirs(old_dir, exist_ok=True)
    for f in old_files:
        os.rename(os.path.join(data_dir, f), os.path.join(old_dir, f))
    for f in staged_files:
        os.rename(os.path.join(staging, f),
                  os.path.join(data_dir, f))
    shutil.rmtree(staging, ignore_errors=True)
    # superseded bucket files stay readable to older manifests
    _retire_files(path, old_dir)
    os.remove(plan_path)
    spark.sql(f"REFRESH TABLE {table}")
    return len(staged_files)


@single_writer
def docstore_upsert(new_docs: DataFrame, prefix: str, path: str,
                    num_buckets: int = 8,
                    batch_id: int | str | None = None) -> bool:
    """MERGE a batch into the store: rows whose doc_id already exists
    REPLACE the stored row, new doc_ids insert — Delta's MERGE INTO
    semantics on plain parquet, via copy-on-write of only the touched
    buckets. Batch ids must be unique within the batch (two versions
    of one doc in a single merge is ambiguous — raise, don't pick).
    Ledger-idempotent under ``cow-<batch_id>``; the ledger namespace
    is shared with appends, so one batch id means one mutation."""
    spark = new_docs.sparkSession
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_docs"
    _require_bucketed_table(spark, table, num_buckets, path,
                            "docstore_build", DOCS_SUBDIR)
    _check_batch_schema(spark, table, new_docs)
    from jcf_nb_migration_spark.io.layout import (_ledger_commit,
                                                  _ledger_skip)

    marker, skip = _ledger_skip(
        path, None if batch_id is None else f"cow-{batch_id}")
    if skip:
        return False
    new_docs = new_docs.select(*spark.table(table).columns).persist()
    try:
        counts = new_docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("d")).head()
        if counts["n"] != counts["d"]:
            raise ValueError(
                f"upsert batch has {counts['n'] - counts['d']} "
                "duplicate doc_id(s) — two versions of one document "
                "in a single merge is ambiguous")
        if counts["n"] == 0:
            _ledger_commit(marker)
            return True
        ids = new_docs.select("doc_id")
        touched = _touched_buckets(ids, num_buckets)
        _rewrite_touched_buckets(
            spark, table, path, num_buckets, touched,
            lambda cur: (cur.join(F.broadcast(ids), "doc_id",
                                  "left_anti")
                         .unionByName(new_docs)))
        _commit_manifest(path, "upsert", batch_id)
    finally:
        new_docs.unpersist()
    _ledger_commit(marker)
    return True


@single_writer
def docstore_delete(spark: SparkSession, prefix: str, path: str,
                    doc_ids, num_buckets: int = 8,
                    batch_id: int | str | None = None) -> bool:
    """Physically delete documents by id — the GDPR-style purge the
    reference's test-row purge (main.py:258-329, T3) needs on the
    SERVING side: the doc_id-bucketed layout makes eager deletion a
    bounded copy-on-write (only the ids' buckets rewrite), so the
    content is gone from disk when the call returns — no tombstone
    window, unlike the tok-bucketed lexical index where deletion is
    lazy by necessity. Ids absent from the store are no-ops.
    Ledger-idempotent under ``cowdel-<batch_id>``."""
    import numbers

    prefix = _checked_prefix(prefix)
    table = f"{prefix}_docs"
    _require_bucketed_table(spark, table, num_buckets, path,
                            "docstore_build", DOCS_SUBDIR)
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
        path, None if batch_id is None else f"cowdel-{batch_id}")
    if skip:
        return False
    ids_frame = local_df(spark, [(i,) for i in ids], "doc_id bigint")
    touched = _touched_buckets(ids_frame, num_buckets)
    _rewrite_touched_buckets(
        spark, table, path, num_buckets, touched,
        lambda cur: cur.join(F.broadcast(ids_frame), "doc_id",
                             "left_anti"))
    _commit_manifest(path, "delete", batch_id)
    _ledger_commit(marker)
    return True


@single_writer
def docstore_add_columns(spark: SparkSession, prefix: str, path: str,
                         new_cols: dict, num_buckets: int = 8) -> None:
    """ADDITIVE schema evolution — the one evolution plain parquet
    supports soundly without rewriting data: declare new nullable
    columns on the table (and in the on-disk meta DDL, so fresh-
    session attaches see them). Existing files simply lack the
    columns and every read fills NULL (the parquet reader's
    missing-column contract); rows written after the evolution carry
    values, and the write-side schema check then REQUIRES the new
    columns on every batch — an append still running the old producer
    fails loudly instead of silently nulling the new field. Renames,
    drops and type changes stay out of scope: on immutable parquet
    they all require a rewrite (or a table format) — use
    docstore_build for those.

    ``new_cols`` maps column name → Catalyst ``simpleString`` type
    (e.g. ``{"quality": "double"}``); names and types are validated
    exactly as at build time (they land inside CREATE TABLE)."""
    prefix = _checked_prefix(prefix)
    table = f"{prefix}_docs"
    _require_bucketed_table(spark, table, num_buckets, path,
                            "docstore_build", DOCS_SUBDIR)
    if not new_cols:
        raise ValueError("docstore_add_columns needs at least one "
                         "column")
    existing = {f.name for f in spark.table(table).schema.fields}
    parts = []
    for name, ts in new_cols.items():
        if not _IDENT.match(name):
            raise ValueError(
                f"new column name must be a SQL identifier, got "
                f"{name!r}")
        if name in existing:
            raise ValueError(
                f"column {name!r} already exists on {table}")
        if not _TYPE_DDL.match(ts):
            raise ValueError(
                f"new column {name!r} has a type with unsafe DDL "
                f"characters ({ts!r})")
        parts.append(f"{name} {ts}")
    meta = _read_meta(path)
    columns = meta["columns"] + ", " + ", ".join(parts)
    _write_meta(path, num_buckets,
                extra={**{k: v for k, v in meta.items()
                          if k != "num_buckets"},
                       "columns": columns})
    # the catalog entry's schema is immutable for bucketed parquet
    # tables — drop and re-register from the evolved meta (files are
    # untouched; LOCATION/bucket validation re-applies on attach)
    spark.sql(f"DROP TABLE {table}")
    docstore_attach(spark, prefix, path, num_buckets)
    # schema evolution is a table version too: AS-OF reads BEFORE this
    # commit use the narrower pre-evolution DDL
    _commit_manifest(path, "add_columns")
