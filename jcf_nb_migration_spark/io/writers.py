"""Sinks (SURVEY.md §2.1 S4–S7, S9).

The reference writes: the final CSV + a 10k-row sample (main.py:631-647),
per-column distinct-value lists (main.py:458-473), audit CSVs for deleted
rows (main.py:293) and schema diffs (main.py:238-247). All become Spark
writes; single-file outputs coalesce(1) — acceptable because these sinks
are small by construction (samples, distinct lists, audits). The main
fact sink stays multi-file/partitioned for scale.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S4 main sink: multi-file CSV, one file per partition — the
    scale-safe default."""
    df.write.mode(mode).option("header", True).csv(path)


def write_partitioned_parquet(df: DataFrame, path: str,
                              partition_cols: list[str],
                              mode: str = "overwrite") -> None:
    """The engine's primary large-scale sink: parquet partitioned by
    low-cardinality keys so downstream scans partition-prune. At
    100 TB this (plus optional bucketBy on join keys) is where the
    reference's single-CSV output model has to go."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite",
                compression: str | None = "gzip") -> None:
    """JSONL corpus sink (one object per line, one file per partition,
    optionally gzipped). The interchange format LLM data pipelines
    exchange shards in; pair with read_jsonl."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_single_csv(df: DataFrame, path: str) -> str:
    """Write df as exactly one CSV file at ``path`` (a file, not a dir).

    Single-file output implies coalesce(1); use only for small outputs
    (samples S4b, distinct lists S5, audits S6/S7). Spark writes a
    directory; we move the part file out and remove the scaffold.
    """
    tmp = path + ".__spark_tmp__"
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if os.path.exists(path):
        os.remove(path)
    shutil.move(part, path)
    shutil.rmtree(tmp)
    return path


def write_sample_csv(df: DataFrame, path: str, n: int = 10_000) -> str:
    """S4 sample sink: first n rows (reference main.py:636-640)."""
    return write_single_csv(df.limit(n), path)


def write_distinct_value_lists(df: DataFrame, columns: list[str],
                               out_dir: str) -> dict[str, str]:
    """S5/S7: per column, distinct non-null non-blank values →
    ``out_dir/<col>.csv`` (reference main.py:458-473, 352-361).

    Each distinct() is a shuffle on one column only — column pruning
    means the scan reads a single column per list.
    """
    os.makedirs(out_dir, exist_ok=True)
    written: dict[str, str] = {}
    for c in columns:
        vals = (df.select(c)
                .where(F.col(c).isNotNull() & (F.col(c) != ""))
                .distinct()
                .orderBy(c))
        written[c] = write_single_csv(vals, os.path.join(out_dir, f"{c}.csv"))
    return written


def write_schema_diff_reports(data_cols: list[str], rule_cols: list[str],
                              out_dir: str) -> tuple[str, str]:
    """S9/T4: symmetric schema reconciliation reports
    (reference main.py:226-247). Pure driver-side — schema-level, not data."""
    os.makedirs(out_dir, exist_ok=True)
    data_missing = sorted(set(rule_cols) - set(data_cols))
    meta_missing = sorted(set(data_cols) - set(rule_cols))
    p1 = os.path.join(out_dir, "dataColsMissingFromMeta.csv")
    p2 = os.path.join(out_dir, "metaColsMissingFromData.csv")
    for p, rows in ((p1, meta_missing), (p2, data_missing)):
        with open(p, "w") as fh:
            fh.write("column\n")
            for r in rows:
                fh.write(f"{r}\n")
    return p1, p2
