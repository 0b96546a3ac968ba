"""Upsert / CDC-style merge without a table format (SURVEY guide: no
Delta/Iceberg jars in v1, so MERGE INTO is emulated relationally):

    merged = updates ∪ (base ⟕anti updates on key)

New keys insert, existing keys take the update row. An SCD2 variant
keeps history by closing out the old row instead of dropping it.
At scale both are one shuffle on the key (or zero if base and updates
are both bucketed on it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Last-writer-wins merge by key: update rows replace base rows,
    unmatched base rows survive. Schemas must align by name."""
    survivors = base.join(updates.select(key), key, "left_anti")
    return survivors.unionByName(updates)


def scd2_merge(base: DataFrame, updates: DataFrame, key: str,
               effective_col: str, current_col: str = "is_current",
               new_effective: str | None = None) -> DataFrame:
    """SCD2: keep history. Matched base rows are closed out
    (is_current=false); update rows insert as current. ``base`` must
    carry ``current_col``; updates get ``new_effective`` (a literal
    timestamp string) as their effective date."""
    upd_keys = updates.select(key)
    closed = (
        base.join(F.broadcast(upd_keys), key, "left_semi")
        .withColumn(current_col, F.lit(False))
    )
    untouched = base.join(upd_keys, key, "left_anti")
    fresh = updates.withColumn(current_col, F.lit(True))
    if new_effective is not None:
        fresh = fresh.withColumn(effective_col, F.lit(new_effective))
    return untouched.unionByName(closed).unionByName(fresh)
