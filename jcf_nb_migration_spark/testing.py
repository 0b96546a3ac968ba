"""Shared test/verification helpers: canonical result hashing and the
Spark-vs-DuckDB oracle comparison used by tests and tools/verify_local.py.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd


def _render(v) -> str:
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_render(x) for x in v) + "]"
    if v is None:
        return "<NULL>"
    try:
        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(df: pd.DataFrame) -> tuple[str, list[str]]:
    """Order-insensitive canonical hash: sort columns by name, render
    values to canonical strings (full float precision), sort rows."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(
        "\x1f".join(_render(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest(), cols


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int
    rows_duck: int
    cols_ok: bool
    hash_ok: bool
    detail: str = ""


def compare_frames(name: str, sdf: pd.DataFrame,
                   ddf: pd.DataFrame) -> CompareResult:
    sh, scols = canon(sdf)
    dh, dcols = canon(ddf)
    cols_ok = scols == dcols
    hash_ok = sh == dh
    ok = cols_ok and hash_ok and len(sdf) == len(ddf)
    detail = ""
    if not cols_ok:
        detail = f"cols {scols} vs {dcols}"
    elif not hash_ok:
        detail = (f"spark head {sdf.head(2).to_dict('records')} "
                  f"duck head {ddf.head(2).to_dict('records')}")
    return CompareResult(name, ok, len(sdf), len(ddf), cols_ok, hash_ok, detail)


def duckdb_with_views(sf_dir: str):
    """A DuckDB connection with the star-schema tables registered as
    views — same contract as the driver's oracle runner."""
    import duckdb

    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):
            # Spark-written table: a DIRECTORY of part files (the
            # derived probe fixtures) — glob the parts for DuckDB
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def files_touched(df) -> dict:
    """Files and bytes actually placed into every scan's
    FilePartitions after execution — the POST-bucket-filter read set.
    Spark's numFiles/filesSize scan METRICS count the pre-filter
    listing, so they cannot show bucket pruning; this walks the
    executed plan (through AQE wrapper and query-stage nodes) and
    counts the PartitionedFiles the tasks were actually given. Shared
    by tests/test_docstore.py and tools/serving_bench.py."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    out = {"files": 0, "bytes": 0, "names": []}

    def walk(node):
        name = node.nodeName()
        if "AdaptiveSparkPlan" in name:
            walk(node.executedPlan())
            return
        if "QueryStage" in name:
            walk(node.plan())
            return
        if "Scan" in name and "Row" not in name:
            try:
                for p in node.inputRDD().partitions():
                    for f in list(p.files()):
                        out["files"] += 1
                        out["bytes"] += f.length()
                        out["names"].append(
                            f.urlEncodedPath().split("/")[-1])
            except Exception:
                pass  # non-file scans (in-memory literal frames)
        ch = node.children().iterator()
        while ch.hasNext():
            walk(ch.next())

    walk(plan)
    return out
