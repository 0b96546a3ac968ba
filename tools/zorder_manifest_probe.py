"""Manifest-pruning scalability probe (VERDICT r10 item 1 evidence).

The r10 z-order design pruned a JSON sidecar in a driver Python loop
over EVERY file — O(#files) driver time per query, the classic
driver-side bottleneck at 10⁶–10⁷ files. The r11 design prunes a
parquet manifest TABLE with a DataFrame filter and collects only the
survivors. This probe builds the same data as layouts of growing file
count and times the PRUNE step (file-list production, no data read):
if the redesign holds, prune wall stays ~flat as file count grows 10×
while the survivor list stays selectivity-bounded.

Usage: PYTHONPATH=/root/repo python tools/zorder_manifest_probe.py
Prints one JSON line; paste the numbers into NOTES.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> int:
    from jcf_nb_migration_spark.io.zorder import (_pruned_files,
                                                  write_zordered)
    from jcf_nb_migration_spark.session import get_spark

    spark = get_spark("zorder-manifest-probe")
    n_rows = int(os.environ.get("ZPROBE_ROWS", "400000"))
    base = os.path.join(tempfile.gettempdir(), "jcf_zprobe",
                        spark.sparkContext.applicationId)
    df = spark.range(n_rows).selectExpr(
        "id", "cast(pmod(hash(id), 10000) as bigint) as a",
        "cast(pmod(hash(id * 7 + 3), 10000) as bigint) as b")
    ranges = {"a": (0, 999), "b": (0, 999)}
    out = {"probe": "zorder_manifest_prune", "n_rows": n_rows,
           "points": []}
    try:
        for n_files in (32, 320, 1024):
            path = os.path.join(base, f"f{n_files}")
            write_zordered(df, path, ["a", "b"], n_files=n_files)
            # warm (session/manifest caches), then best-of-3 prune
            _pruned_files(spark, path, ranges)
            best = min(
                _timed(_pruned_files, spark, path, ranges)
                for _ in range(3))
            surv, total = _pruned_files(spark, path, ranges)
            out["points"].append({
                "n_files": total, "survivors": len(surv),
                "prune_sec": round(best, 4)})
        p0, p1 = out["points"][0], out["points"][-1]
        out["file_growth"] = round(p1["n_files"] / p0["n_files"], 1)
        out["prune_wall_ratio"] = round(
            p1["prune_sec"] / p0["prune_sec"], 2)
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


def _timed(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.exit(main())
