"""Z-ordered layout with distributed file-stats pruning + time travel.

Partitioning and bucketing prune on ONE key. A scan filtered on two
(or more) range predicates at once — "quantity in [5,15] AND price in
[20k,40k]" — gets nothing from a single-column sort: sorting by
quantity packs each file with the full price range, so a price
predicate overlaps every file. The lakehouse answer (Delta OPTIMIZE
ZORDER, Iceberg's sort orders) is a SPACE-FILLING CURVE: map each row
to the Morton/Z key of its quantile-scaled dimensions, range-partition
and sort by that key, and every written file then covers a small
HYPER-RECTANGLE of the combined space — so each file's per-column
min/max excludes it from most multi-column range queries.

Vanilla Spark applies parquet min/max only at the ROW-GROUP level
inside files it already opened; it keeps no file-level stats index.
This module supplies that missing piece the way Iceberg does — a
MANIFEST TABLE, not a driver-side JSON (the r10 sidecar was one JSON
parsed and pruned in a Python for-loop over every file: fine at tens
of files, minutes of driver time at the 10⁶–10⁷ files of a 100 TB
layout). Each commit writes a parquet MANIFEST SEGMENT (one row per
data file: basename + per-column min/max IN THE COLUMN'S NATIVE TYPE,
so bounds are exact — no float round-trip), and a tiny version JSON
names the segments composing that snapshot (Iceberg's
snapshot→manifest-list→manifest chain). A scan then:

1. reads the current version's segments AS A DATAFRAME (distributed,
   scales with file count across executors, never a driver loop),
2. prunes them with a DataFrame filter (a NULL min/max — an all-NULL
   z-column in some file — never prunes: unknown means keep),
3. collects only the SURVIVING paths (pruned-list-bounded, i.e.
   bounded by the query's selectivity, not the corpus),
4. opens exactly those files and re-applies the exact predicate.

Correctness never depends on the curve or the stats: the scan
re-applies the exact predicate after pruning, so a coarse key only
costs extra files read (pinned in tests/test_zorder.py by comparing
against the unpruned scan).

Data files are IMMUTABLE and never renamed: every mutation
(build/append/maintain/restore) adds files and commits a new version
manifest; liveness is defined by the manifest, not the directory, so
a crash at ANY point leaves every committed version readable (the r10
design's rename-swap window — where a crash left NO layout and the
next maintain destroyed the replay ledger — is gone structurally).
Old versions stay readable AS OF their number until an explicit
``zorder_vacuum`` retires them — the same retention contract as
``docstore_snapshot_vacuum`` (io/docstore.py).

The Z-key is built from pure Catalyst bit arithmetic (shift/AND/OR
folded over the bit positions — whole-stage-codegen'd, no UDF): each
column is affinely scaled to ``bits`` bits using its global min/max
(one control-plane agg), then the columns' bits are interleaved.

Local-FS version JSONs, like the docstore manifests — on HDFS/S3
route through the FileSystem API or a table format.
"""

from __future__ import annotations

from jcf_nb_migration_spark.io.locking import single_writer

import json
import os
import re
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jcf_nb_migration_spark.localrel import local_df

DATA_SUBDIR = "data"
MANIFESTS_SUBDIR = "_zmanifests"
VERSIONS_SUBDIR = "_zversions"


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton/Z key column interleaving ``bits`` bits of each col,
    min/max-scaled over ``df`` (one bounded agg — control plane). The
    total key must fit a signed 64-bit long. Rows NULL in a z-column
    scale to bucket 0 (they sort first; their file's stats for that
    column may be NULL, which the scan treats as unprunable)."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns (use a plain "
                         "sort for one)")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits = {bits * len(cols)} key "
            "bits > 63; lower bits")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    row = df.agg(*aggs).head()
    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        mn = row[f"_mn_{c}"]
        mx = row[f"_mx_{c}"]
        if mn is None:        # column entirely NULL: no scaling basis;
            continue          # its bits stay 0 and its stats stay NULL
        mn, mx = float(mn), float(mx)
        span = (mx - mn) or 1.0
        scaled = F.least(
            F.lit(top),
            F.greatest(F.lit(0), F.floor(
                (F.coalesce(F.col(c), F.lit(mn)).cast("double")
                 - F.lit(mn))
                / F.lit(span) * F.lit(float(top + 1))).cast("long")))
        # interleave: bit i of this column lands at position
        # i * n_cols + ci of the key
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(scaled, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + ci))
    return key


# --------------------------------------------------------------------
# version manifests (control plane)
# --------------------------------------------------------------------


def _versions_dir(path: str) -> str:
    return os.path.join(path, VERSIONS_SUBDIR)


def _version_path(path: str, version: int) -> str:
    return os.path.join(_versions_dir(path), f"v{version:05d}.json")


def _list_versions(path: str) -> list[int]:
    vdir = _versions_dir(path)
    if not os.path.isdir(vdir):
        return []
    out = []
    for f in os.listdir(vdir):
        m = re.fullmatch(r"v(\d{5})\.json", f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _read_version(path: str, version: int | None) -> dict:
    versions = _list_versions(path)
    if not versions:
        raise ValueError(
            f"no {VERSIONS_SUBDIR} under {path} — not a z-ordered "
            "layout (write_zordered commits v0)")
    v = versions[-1] if version is None else version
    vp = _version_path(path, v)
    if not os.path.isfile(vp):
        raise ValueError(
            f"z-ordered layout at {path} has no version {v} "
            f"(available: {versions} — vacuumed or never committed)")
    with open(vp) as fh:
        return json.load(fh)


def _commit_version(path: str, op: str, cols: list[str], ddl: str,
                    segments: list[dict],
                    batch_id=None, n_appended: int | None = None) -> int:
    """Write the next version JSON naming the manifest segments that
    compose the snapshot. Atomic tmp-then-rename; called AFTER the
    segment parquet (and its data files) are fully in place, so a
    crash before the rename leaves the previous version current and
    only unreferenced files behind (retired by zorder_vacuum).
    ``n_appended`` records the unsorted-file count the maintain gate
    reads; None derives it from the segment kinds (correct everywhere
    except after a manifest rewrite, which merges kinds and must carry
    the count explicitly)."""
    vdir = _versions_dir(path)
    os.makedirs(vdir, exist_ok=True)
    existing = _list_versions(path)
    version = (existing[-1] + 1) if existing else 0
    if n_appended is None:
        n_appended = sum(s["n_files"] for s in segments
                         if s["kind"] == "append")
    doc = {"version": version, "op": op,
           "batch_id": None if batch_id is None else str(batch_id),
           "cols": cols, "ddl": ddl, "segments": segments,
           "n_appended": n_appended}
    tmp = _version_path(path, version) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.rename(tmp, _version_path(path, version))
    return version


def _write_segment(df_files: DataFrame, path: str, kind: str,
                   n_files: int) -> dict:
    """Persist one manifest segment (a bounded stats frame: one row
    per data file) as parquet under _zmanifests/<uuid>. coalesce(1):
    the segment is batch-bounded control data; one file per segment
    keeps the manifest read's file count = segment count."""
    seg = f"seg-{uuid.uuid4().hex[:12]}"
    seg_dir = os.path.join(path, MANIFESTS_SUBDIR, seg)
    df_files.coalesce(1).write.mode("error").parquet(seg_dir)
    return {"dir": seg, "kind": kind, "n_files": n_files}


def _stats_frame(spark: SparkSession, files: list[str], ddl: str,
                 cols: list[str]) -> DataFrame:
    """Per-file min/max over ``files`` in each z-column's NATIVE type
    (exact bounds — no float round-trip), computed distributively."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    return (spark.read.schema(ddl).parquet(*files)
            .withColumn("file", F.element_at(
                F.split(F.input_file_name(), "/"), -1))
            .groupBy("file").agg(*aggs))


def _manifest_df(spark: SparkSession, path: str, man: dict) -> DataFrame:
    dirs = [os.path.join(path, MANIFESTS_SUBDIR, s["dir"])
            for s in man["segments"]]
    if not dirs:
        raise ValueError(
            f"version {man['version']} of {path} has no manifest "
            "segments — empty layout")
    return spark.read.parquet(*dirs)


def _check_ranges(ranges: dict, cols: list[str]) -> None:
    bad = [c for c in ranges if c not in cols]
    if bad:
        raise ValueError(
            f"no file stats for {bad}; z-ordered cols here are "
            f"{cols} — re-layout or filter after scan")


def _pruned_files(spark: SparkSession, path: str, ranges: dict,
                  version: int | None = None,
                  count_total: bool = False) -> tuple[list[str], int]:
    """(surviving basenames, total files) for a conjunctive range
    predicate, pruned DISTRIBUTIVELY: the manifest is a DataFrame, the
    keep-condition a Catalyst filter, and only survivors are collected
    (bounded by selectivity, never the corpus). NULL min/max — a file
    whose z-column is entirely NULL — never prunes (unknown ⇒ keep).
    ``count_total`` adds the denominator job the pruning-evidence API
    needs; the serve path skips it (one manifest job per scan, not
    two) and the version JSON's segment counts stand in."""
    man = _read_version(path, version)
    _check_ranges(ranges, man["cols"])
    mdf = _manifest_df(spark, path, man)
    total = (mdf.count() if count_total
             else sum(s["n_files"] for s in man["segments"]))
    keep = F.lit(True)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            keep = keep & (F.col(f"mx_{c}").isNull()
                           | (F.col(f"mx_{c}") >= F.lit(lo)))
        if hi is not None:
            keep = keep & (F.col(f"mn_{c}").isNull()
                           | (F.col(f"mn_{c}") <= F.lit(hi)))
    names = [r["file"] for r in
             mdf.where(keep).select("file").collect()]
    return sorted(names), total


# --------------------------------------------------------------------
# build / append / maintain (mutations — each commits a version)
# --------------------------------------------------------------------


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 32, bits: int = 16) -> int:
    """Build (or rebuild) the layout: write ``df`` as ``n_files``
    parquet files range-partitioned and sorted by the Z key of
    ``cols``, write their stats as the v0 manifest segment, and commit
    version 0. Two passes over the data (the write, then one stats
    aggregate over the written files — footer-equivalent, kept
    engine-side for portability); both are linear corpus work a
    deployment pays once per layout build. Returns the file count."""
    import shutil

    spark = df.sparkSession
    shutil.rmtree(path, ignore_errors=True)
    zk = zorder_key(df, cols, bits)
    data_dir = os.path.join(path, DATA_SUBDIR)
    (df.withColumn("_zkey", zk)
     .repartitionByRange(n_files, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("overwrite").parquet(data_dir))
    written = spark.read.parquet(data_dir)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in written.schema.fields)
    files = sorted(os.path.join(data_dir, f)
                   for f in os.listdir(data_dir)
                   if f.endswith(".parquet"))
    seg = _write_segment(_stats_frame(spark, files, ddl, cols),
                         path, "base", len(files))
    _commit_version(path, "build", cols, ddl, [seg])
    return len(files)


@single_writer
def append_zordered(df: DataFrame, path: str, batch_id=None) -> bool:
    """Append a batch WITHOUT re-sorting: the batch lands as new
    immutable files in data/, their stats become a new manifest
    segment, and version v+1 = previous segments + the new one — so
    scans stay exact (pruning is per-file stats, not order); an
    appended file merely prunes worse until the next re-layout.
    Ledger-idempotent under ``zo-<batch_id>`` (the shared replay
    ledger at io/layout.py:308); the crash window between data-file
    write and version commit leaves only unreferenced files
    (zorder_vacuum retires them) and an uncommitted ledger marker, so
    a redelivery is safe. Schema must match the layout's recorded DDL
    exactly — a drifted batch fails loudly before any file lands."""
    spark = df.sparkSession
    man = _read_version(path, None)
    batch_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    if batch_ddl != man["ddl"]:
        raise ValueError(
            f"append batch schema ({batch_ddl}) != layout schema "
            f"({man['ddl']}) — a drifted parquet append corrupts "
            "later scans")
    from jcf_nb_migration_spark.io.layout import (_ledger_commit,
                                                  _ledger_skip)

    marker, skip = _ledger_skip(
        path, None if batch_id is None else f"zo-{batch_id}")
    if skip:
        return False
    data_dir = os.path.join(path, DATA_SUBDIR)
    before = {f for f in os.listdir(data_dir) if f.endswith(".parquet")}
    df.write.mode("append").parquet(data_dir)
    new_files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".parquet") and f not in before)
    seg = _write_segment(
        _stats_frame(spark, new_files, man["ddl"], man["cols"]),
        path, "append", len(new_files))
    _commit_version(path, "append", man["cols"], man["ddl"],
                    man["segments"] + [seg], batch_id=batch_id)
    _ledger_commit(marker)
    return True


@single_writer
def zorder_maintain(spark: SparkSession, path: str,
                    max_appended_frac: float = 0.25,
                    n_files: int = 32, bits: int = 16) -> bool:
    """Fragmentation-gated re-layout: when appended (unsorted) files
    exceed ``max_appended_frac`` of the layout, rewrite the whole
    layout along the curve as NEW files and commit a version whose
    single base segment references only them. Nothing is renamed or
    deleted: the superseded files stay on disk, every older version
    stays readable AS OF its number, and a crash at any point leaves
    the previous version current (at worst with unreferenced new files
    for zorder_vacuum) — the r10 rename-swap's crash window and its
    ledger-destruction hazard are gone structurally. The append ledger
    is untouched: a batch committed before the re-layout stays
    committed. Returns True when a re-layout ran."""
    man = _read_version(path, None)
    n_app = man.get("n_appended",
                    sum(s["n_files"] for s in man["segments"]
                        if s["kind"] == "append"))
    total = sum(s["n_files"] for s in man["segments"])
    if total == 0 or n_app / total <= max_appended_frac:
        return False
    cols, ddl = man["cols"], man["ddl"]
    live = _resolve_files(path, man)
    current = spark.read.schema(ddl).parquet(*live)
    data_dir = os.path.join(path, DATA_SUBDIR)
    before = {f for f in os.listdir(data_dir) if f.endswith(".parquet")}
    zk = zorder_key(current, cols, bits)
    (current.withColumn("_zkey", zk)
     .repartitionByRange(n_files, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("append").parquet(data_dir))
    new_files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".parquet") and f not in before)
    seg = _write_segment(_stats_frame(spark, new_files, ddl, cols),
                         path, "base", len(new_files))
    _commit_version(path, "maintain", cols, ddl, [seg])
    return True


@single_writer
def zorder_restore(spark: SparkSession, path: str, version: int) -> int:
    """Roll the layout back to a committed version (Delta's RESTORE):
    commit a NEW version whose segments are the target's — an audit
    trail that the rollback happened; the rolled-back states remain
    readable AS OF their numbers. Raises if the target's files were
    vacuumed. Returns the new version number."""
    man = _read_version(path, version)
    missing = [f for f in _resolve_files(path, man)
               if not os.path.isfile(f)]
    if missing:
        raise ValueError(
            f"cannot restore to version {version}: "
            f"{len(missing)} of its files were vacuumed — e.g. "
            f"{[os.path.basename(m) for m in missing[:3]]}")
    return _commit_version(path, "restore", man["cols"], man["ddl"],
                           man["segments"], batch_id=f"to-v{version}",
                           n_appended=man.get("n_appended"))


@single_writer
def zorder_rewrite_manifests(spark: SparkSession, path: str) -> bool:
    """Manifest-only compaction (Iceberg's ``rewrite_manifests``): a
    long append chain leaves one manifest segment per batch, so every
    scan's manifest read opens one parquet file per append. This
    merges the CURRENT version's segments into ONE (data files
    untouched — the new segment lists the same file set) and commits
    it as a new version, restoring O(1)-file manifest reads without
    paying a re-layout. The maintain gate's appended-file count is
    carried explicitly (the merged segment can't express per-file
    kind), so fragmentation accounting survives the rewrite. No-op
    (returns False) when the current version is already
    single-segment."""
    man = _read_version(path, None)
    if len(man["segments"]) <= 1:
        return False
    mdf = _manifest_df(spark, path, man)
    seg = _write_segment(mdf, path, "merged",
                         sum(s["n_files"] for s in man["segments"]))
    _commit_version(path, "rewrite_manifests", man["cols"], man["ddl"],
                    [seg], n_appended=man.get("n_appended", 0))
    return True


def zorder_history(spark: SparkSession, path: str) -> DataFrame:
    """The layout's commit log as a frame: one row per retained
    version — (version, op, batch_id, n_files). Driver-side JSON reads
    over the (bounded) version list: control plane."""
    rows = []
    for v in _list_versions(path):
        man = _read_version(path, v)
        rows.append((man["version"], man["op"], man["batch_id"],
                     sum(s["n_files"] for s in man["segments"])))
    return local_df(
        spark, rows, "version bigint, op string, batch_id string, "
                     "n_files bigint")


@single_writer
def zorder_vacuum(spark: SparkSession, path: str,
                  keep_last: int = 2) -> int:
    """Retention: keep the newest ``keep_last`` versions, drop older
    version JSONs, and delete the data files and manifest segments no
    retained version references (including crash residue never
    referenced by any version). Returns the number of data files
    deleted. The latest version is always retained."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the live version "
                         "cannot be vacuumed)")
    versions = _list_versions(path)
    if not versions:
        raise ValueError(f"no version manifests under {path}")
    keep = versions[-keep_last:]
    ref_segs: set[str] = set()
    ref_files: set[str] = set()
    for v in keep:
        man = _read_version(path, v)
        for s in man["segments"]:
            ref_segs.add(s["dir"])
        ref_files.update(os.path.basename(f)
                         for f in _resolve_files(path, man))
    n_deleted = 0
    data_dir = os.path.join(path, DATA_SUBDIR)
    for f in os.listdir(data_dir):
        if f.endswith(".parquet") and f not in ref_files:
            os.remove(os.path.join(data_dir, f))
            n_deleted += 1
    seg_root = os.path.join(path, MANIFESTS_SUBDIR)
    for seg in os.listdir(seg_root):
        if seg not in ref_segs:
            shutil.rmtree(os.path.join(seg_root, seg))
    for v in versions:
        if v not in keep:
            os.remove(_version_path(path, v))
    return n_deleted


# --------------------------------------------------------------------
# reads
# --------------------------------------------------------------------


def _resolve_files(path: str, man: dict) -> list[str]:
    """All data-file paths a version references (reads its manifest
    segments driver-side via pyarrow — bounded: one row per file,
    used only by maintain/restore/vacuum control paths; scans prune
    through Spark in _pruned_files)."""
    import pyarrow.parquet as pq

    data_dir = os.path.join(path, DATA_SUBDIR)
    names: list[str] = []
    for s in man["segments"]:
        seg_dir = os.path.join(path, MANIFESTS_SUBDIR, s["dir"])
        for part in os.listdir(seg_dir):
            if part.endswith(".parquet"):
                t = pq.read_table(os.path.join(seg_dir, part),
                                  columns=["file"])
                names += t.column("file").to_pylist()
    return [os.path.join(data_dir, n) for n in sorted(names)]


def zordered_scan(spark: SparkSession, path: str,
                  ranges: dict[str, tuple],
                  version: int | None = None) -> DataFrame:
    """Read a z-ordered layout under conjunctive range predicates
    ``{col: (lo, hi)}`` (inclusive bounds; either side may be None),
    optionally AS OF a committed ``version``. Files whose manifest
    [min,max] interval misses any predicate are never opened — the
    file list Spark receives is already pruned, and the pruning itself
    is a DataFrame filter over the manifest table (distributed; the
    driver touches only the surviving list). The exact predicate is
    re-applied to the surviving rows, so results are independent of
    the pruning (pinned in tests/test_zorder.py against the unpruned
    scan). Predicates may only name z-ordered columns: a stats-less
    column cannot prune, and silently accepting it would hide a
    layout mistake."""
    man = _read_version(path, version)
    survivors, _ = _pruned_files(spark, path, ranges, version)
    data_dir = os.path.join(path, DATA_SUBDIR)
    if not survivors:
        df = local_df(spark, [], man["ddl"])
    else:
        df = spark.read.schema(man["ddl"]).parquet(
            *[os.path.join(data_dir, f) for f in survivors])
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.where(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.where(F.col(c) <= F.lit(hi))
    return df


def zordered_as_of(spark: SparkSession, path: str,
                   version: int) -> DataFrame:
    """Read the layout AS OF a committed version — exactly the files
    its manifest references (no pruning predicate; compose with
    ``zordered_scan(..., version=...)`` for a pruned historical
    read). Mirrors docstore_as_of (io/docstore.py:267)."""
    man = _read_version(path, version)
    return spark.read.schema(man["ddl"]).parquet(
        *_resolve_files(path, man))


def zordered_file_count(spark: SparkSession, path: str,
                        ranges: dict[str, tuple]) -> tuple:
    """(surviving, total) file counts for a predicate — the pruning
    evidence the tests and probes assert on, without reading data.
    Shares _pruned_files with the scan path, so the evidence and the
    behavior cannot drift (ADVICE r10: the old separate loop skipped
    the stats-less-column validation). count_total recomputes the
    denominator from the manifest table itself (evidence should not
    trust the version JSON's cached counts)."""
    survivors, total = _pruned_files(spark, path, ranges,
                                     count_total=True)
    return len(survivors), total
