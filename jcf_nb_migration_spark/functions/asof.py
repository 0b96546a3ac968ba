"""As-of and range joins — operators Spark lacks natively, composed
from unions/windows/bucketed equi-joins (preference order (a) of the
build brief: stock DataFrame ops, no UDFs).

**As-of join** (union + ordered window): tag left/right, union on the
key, sort by (time, side) within each key partition, and carry the
last-seen right-side payload forward with last_value(ignorenulls).
One shuffle on the key — same cost as a regular join — versus
per-group pandas merge_asof which would force Python execution.

**Range join** (bucketize + explode): map each left row to its
time-bucket neighborhood, equi-join on (key, bucket), then apply the
exact range predicate as a residual filter. Turns an O(N·M) non-equi
join into an equi-join proportional to true matches — the standard
interval-join strategy streaming engines use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              payload_cols: list[str],
              strict: bool = False) -> DataFrame:
    """For each left row, attach the latest right row with
    right.ts <= left.ts (or < when strict) and the same key.

    Returns the left rows plus ``asof_<payload>`` columns (NULL when no
    prior right row exists).
    """
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1))
    r = right.withColumn("__side", F.lit(0))
    # Align schemas: left payload slots are NULL on the left rows.
    for c in payload_cols:
        l = l.withColumn(f"__p_{c}", F.lit(None).cast(dict(right.dtypes)[c]))
        r = r.withColumn(f"__p_{c}", F.col(c))
    keep = [key, ts, "__side"] + [f"__p_{c}" for c in payload_cols]
    l_keep = l.select(*keep, *[c for c in lcols if c not in (key, ts)])
    r_keep = r.select(*keep, *[F.lit(None).cast(dict(l.dtypes)[c]).alias(c)
                               for c in lcols if c not in (key, ts)])
    u = l_keep.unionByName(r_keep)

    # Right rows at the same timestamp sort before (non-strict) or
    # after (strict) left rows, implementing <= vs <.
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (Window.partitionBy(key).orderBy(F.col(ts).asc(), side_order)
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in payload_cols:
        u = u.withColumn(
            f"asof_{c}", F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w))
    return (u.where(F.col("__side") == 1)
            .drop("__side", *[f"__p_{c}" for c in payload_cols]))


def range_join_buckets(left: DataFrame, right: DataFrame, key: str,
                       ts: str, max_gap_seconds: int,
                       left_id: str, right_id: str) -> DataFrame:
    """All (left, right) pairs with the same key whose timestamps are
    within ±max_gap_seconds, via bucketized equi-join.

    Columns: key, <left_id>, <right_id>, dt_sec (right - left).
    """
    gap_us = max_gap_seconds * 1_000_000
    l = left.select(
        F.col(key), F.col(left_id),
        F.unix_micros(F.col(ts)).alias("__l_us"),
    ).withColumn(
        "__bucket",
        # left rows probe their own bucket and both neighbors — any
        # pair within gap_us differs by at most one bucket
        F.explode(F.array(
            F.expr(f"__l_us div {gap_us} - 1"),
            F.expr(f"__l_us div {gap_us}"),
            F.expr(f"__l_us div {gap_us} + 1"),
        )),
    )
    r = right.select(
        F.col(key).alias("__rkey"), F.col(right_id),
        F.unix_micros(F.col(ts)).alias("__r_us"),
    ).withColumn("__bucket", F.expr(f"__r_us div {gap_us}"))
    return (
        l.join(r, (l[key] == r["__rkey"]) & (l["__bucket"] == r["__bucket"]))
        .where(F.abs(F.col("__r_us") - F.col("__l_us")) <= gap_us)
        .select(
            F.col(key), F.col(left_id), F.col(right_id),
            ((F.col("__r_us") - F.col("__l_us")) / 1_000_000.0)
                .alias("dt_sec"),
        )
        .distinct()
    )
