"""Z-ordered layout with file-level stats pruning.

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
This module supplies that missing piece the same way the docstore
supplies manifests: a JSON SIDECAR (``_zstats.json``) recording each
written file's per-column min/max, and a scan entry point that prunes
the file LIST driver-side against the predicate before Spark ever
lists or opens a file. At 100 TB the sidecar is the only full-list
artifact (one row per file — control plane), the prune is O(#files)
driver work, and the data read scales with the query's selectivity on
EVERY z-ordered column, not just the leading sort key.

The Z-key is built from pure Catalyst bit arithmetic (shift/AND/OR
folded over the bit positions — whole-stage-codegen'd, no UDF): each
column is affinely scaled to ``bits`` bits using its global min/max
(one control-plane agg), then the columns' bits are interleaved.
Correctness never depends on the key: the scan re-applies the exact
predicate after pruning, so a coarse key only costs extra files read.

Local-FS sidecar, like the docstore manifests — on HDFS/S3 route
through the FileSystem API or a table format.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ZSTATS = "_zstats.json"


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton/Z key column interleaving ``bits`` bits of each col,
    min/max-scaled over ``df`` (one bounded agg — control plane). The
    total key must fit a signed 64-bit long."""
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
        mn = float(row[f"_mn_{c}"])
        mx = float(row[f"_mx_{c}"])
        span = (mx - mn) or 1.0
        scaled = F.least(
            F.lit(top),
            F.greatest(F.lit(0), F.floor(
                (F.col(c).cast("double") - F.lit(mn))
                / F.lit(span) * F.lit(float(top + 1))).cast("long")))
        # interleave: bit i of this column lands at position
        # i * n_cols + ci of the key
        for i in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(scaled, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + ci))
    return key


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 32, bits: int = 16) -> int:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the Z key of ``cols``, plus the per-file min/max stats
    sidecar. Two passes over the data (the write, then one aggregate
    over the written files to collect their stats — footer-equivalent,
    kept engine-side for portability); both are linear corpus work a
    deployment pays once per layout build. Returns the file count."""
    import shutil

    spark = df.sparkSession
    shutil.rmtree(path, ignore_errors=True)
    zk = zorder_key(df, cols, bits)
    (df.withColumn("_zkey", zk)
     .repartitionByRange(n_files, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("overwrite").parquet(path))
    written = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    stats_rows = (written
                  .withColumn("_f", F.element_at(
                      F.split(F.input_file_name(), "/"), -1))
                  .groupBy("_f").agg(*aggs).collect())
    stats = {r["_f"]: {c: [r[f"mn_{c}"], r[f"mx_{c}"]] for c in cols}
             for r in stats_rows}
    # floats in JSON round-trip exactly (repr); ints stay ints
    sidecar = {"cols": cols, "schema": written.schema.simpleString(),
               "ddl": ", ".join(
                   f"{f.name} {f.dataType.simpleString()}"
                   for f in written.schema.fields),
               "files": stats}
    tmp = os.path.join(path, ZSTATS + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(sidecar, fh, default=str)
    os.rename(tmp, os.path.join(path, ZSTATS))
    return len(stats)


def append_zordered(df: DataFrame, path: str,
                    batch_id=None) -> bool:
    """Append a batch to a z-ordered layout WITHOUT re-sorting: the
    batch lands as new files whose per-column min/max join the
    sidecar, so scans stay exact (pruning is per-file stats, not
    order) — an appended file merely prunes worse until the next
    re-layout (its range covers whatever the batch contained).
    Ledger-idempotent under ``zo-<batch_id>`` (the shared replay
    ledger); appended file names are tracked so ``zorder_maintain``
    can gate the re-layout on the appended fraction. Schema must
    match the layout's recorded DDL exactly — a drifted batch fails
    loudly before any file lands."""
    spark = df.sparkSession
    stats = _load_stats(path)
    batch_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in df.schema.fields)
    if batch_ddl != stats["ddl"]:
        raise ValueError(
            f"append batch schema ({batch_ddl}) != layout schema "
            f"({stats['ddl']}) — a drifted parquet append corrupts "
            "later scans")
    from jcf_nb_migration_spark.io.layout import (_ledger_commit,
                                                  _ledger_skip)

    marker, skip = _ledger_skip(
        path, None if batch_id is None else f"zo-{batch_id}")
    if skip:
        return False
    before = {f for f in os.listdir(path) if f.endswith(".parquet")}
    df.write.mode("append").parquet(path)
    new_files = sorted(
        f for f in os.listdir(path)
        if f.endswith(".parquet") and f not in before)
    cols = stats["cols"]
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    new_stats = (spark.read.schema(stats["ddl"])
                 .parquet(*[os.path.join(path, f) for f in new_files])
                 .withColumn("_f", F.element_at(
                     F.split(F.input_file_name(), "/"), -1))
                 .groupBy("_f").agg(*aggs).collect())
    for r in new_stats:
        stats["files"][r["_f"]] = {
            c: [r[f"mn_{c}"], r[f"mx_{c}"]] for c in cols}
    stats.setdefault("appended", [])
    stats["appended"] += new_files
    tmp = os.path.join(path, ZSTATS + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(stats, fh, default=str)
    os.rename(tmp, os.path.join(path, ZSTATS))
    _ledger_commit(marker)
    return True


def zorder_maintain(spark: SparkSession, path: str,
                    max_appended_frac: float = 0.25,
                    n_files: int = 32, bits: int = 16) -> bool:
    """Fragmentation-gated re-layout (the z-order twin of the other
    layouts' ``*_maintain``): when appended (unsorted) files exceed
    ``max_appended_frac`` of the layout, rebuild the whole layout
    along the curve — staged beside the live dir, then swapped, so a
    crash leaves either the old or the staged layout, never a mix.
    The append ledger is NOT part of the layout dir's data files and
    is preserved across the swap (re-layout reorganizes files, it
    does not open a new epoch). Returns True when a re-layout ran."""
    import shutil

    stats = _load_stats(path)
    n_app = len(stats.get("appended", []))
    total = len(stats["files"])
    if total == 0 or n_app / total <= max_appended_frac:
        return False
    cols = stats["cols"]
    current = spark.read.schema(stats["ddl"]).parquet(
        *[os.path.join(path, f) for f in stats["files"]])
    staging = path.rstrip("/") + ".zstage"
    write_zordered(current, staging, cols, n_files=n_files, bits=bits)
    # swap: data files + sidecar move together; the ledger (and any
    # other non-parquet artifacts) are carried over
    old = path.rstrip("/") + ".zold"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    for entry in os.listdir(old):
        src = os.path.join(old, entry)
        if entry.endswith(".parquet") or entry == ZSTATS or \
                entry.endswith(".tmp"):
            continue
        os.rename(src, os.path.join(path, entry))
    shutil.rmtree(old)
    return True


def _load_stats(path: str) -> dict:
    sp = os.path.join(path, ZSTATS)
    if not os.path.isfile(sp):
        raise ValueError(
            f"no {ZSTATS} under {path} — not a z-ordered layout "
            "(write_zordered builds the sidecar)")
    with open(sp) as fh:
        return json.load(fh)


def zordered_scan(spark: SparkSession, path: str,
                  ranges: dict[str, tuple]) -> DataFrame:
    """Read a z-ordered layout under conjunctive range predicates
    ``{col: (lo, hi)}`` (inclusive bounds; either side may be None).
    Files whose sidecar [min,max] interval misses any predicate are
    never opened — the file list Spark receives is already pruned.
    The exact predicate is re-applied to the surviving rows, so
    results are independent of the pruning (pinned in
    tests/test_zorder.py by comparing against the unpruned scan).
    Predicates may only name z-ordered columns: a stats-less column
    cannot prune, and silently accepting it would hide a layout
    mistake."""
    stats = _load_stats(path)
    bad = [c for c in ranges if c not in stats["cols"]]
    if bad:
        raise ValueError(
            f"no file stats for {bad}; z-ordered cols here are "
            f"{stats['cols']} — re-layout or filter after scan")
    survivors = []
    for fname, cstats in stats["files"].items():
        keep = True
        for c, (lo, hi) in ranges.items():
            mn, mx = cstats[c]
            # sidecar values may round-trip as strings (default=str
            # for exotic types) — coerce numerically when comparing
            mn, mx = float(mn), float(mx)
            if lo is not None and mx < lo:
                keep = False
            if hi is not None and mn > hi:
                keep = False
        if keep:
            survivors.append(os.path.join(path, fname))
    if not survivors:
        df = spark.createDataFrame([], stats["ddl"])
    else:
        df = spark.read.schema(stats["ddl"]).parquet(*survivors)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.where(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.where(F.col(c) <= F.lit(hi))
    return df


def zordered_file_count(path: str, ranges: dict[str, tuple]) -> tuple:
    """(surviving, total) file counts for a predicate — the pruning
    evidence the tests and probes assert on, without reading data."""
    stats = _load_stats(path)
    total = len(stats["files"])
    surv = 0
    for cstats in stats["files"].values():
        keep = True
        for c, (lo, hi) in ranges.items():
            mn, mx = float(cstats[c][0]), float(cstats[c][1])
            if (lo is not None and mx < lo) or (hi is not None
                                                and mn > hi):
                keep = False
        if keep:
            surv += 1
    return surv, total
