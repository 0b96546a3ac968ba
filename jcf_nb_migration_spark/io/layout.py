"""Write-side data layout optimization: range-cluster + sort so
parquet min/max statistics actually prune.

At 100 TB the cheapest query is the one that never reads the bytes:
parquet stores per-column min/max per row group, and Spark's scan
skips row groups (and whole files) whose stats exclude the pushed
filter. Those stats only help if values are CLUSTERED — a randomly
laid-out table has every file spanning the whole value range, so
nothing skips. ``cluster_write`` produces the layout that makes
pushdown effective:

- ``repartitionByRange(cols)``: range-partitions rows so each output
  file owns a disjoint slice of the key space (global clustering).
- ``sortWithinPartitions(cols)``: orders rows inside each file so row
  groups within a file also get tight, disjoint stats.

This is the single-dimension (or lexicographic multi-column) analog
of Z-ordering; for genuinely multi-dimensional pruning, interleave a
computed z-value column and range-cluster on that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cluster_write(df: DataFrame, path: str, cluster_cols: list[str],
                  num_files: int | None = None,
                  mode: str = "overwrite") -> None:
    """Write ``df`` as parquet clustered on ``cluster_cols`` (range
    partitioning across files + sort within files) so filters on those
    columns skip files/row groups via min-max stats."""
    cols = [df[c] for c in cluster_cols]
    if num_files is not None:
        out = df.repartitionByRange(num_files, *cols)
    else:
        out = df.repartitionByRange(*cols)
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)
