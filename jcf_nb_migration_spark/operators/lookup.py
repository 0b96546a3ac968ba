"""J2/J3 replacement lookup joins (SURVEY.md §2.4).

Reference semantics (main.py:426-444): left-join a small clean-value
table and REPLACE the column with the joined value — unmatched rows are
wiped to null (→ '' at the sink), NOT coalesced with the original.
Surprising but faithful; encoded here as explicit ``replace_via_lookup``
with correct key matching (the reference's pandas version had an
index-alignment defect that shifted values onto wrong rows after the
purge — SURVEY §2.4 note; we implement the intended key semantics).

Lookup tables are tiny (a religions map, per-column Email→value sheets)
→ always broadcast: the fact table never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(lookup: DataFrame, match_col: str,
                   replacement_col: str) -> DataFrame:
    """Keys in a lookup table with more than one distinct replacement
    value — the rows replace_via_lookup silently resolves with MIN.
    Returned as (key, n_values) so pipelines can surface how dirty a
    lookup sheet is instead of hiding the collapse. Lazy: callers
    count() or write it as part of their audit stage."""
    return (
        lookup.groupBy(F.col(match_col).alias("key"))
        .agg(F.countDistinct(F.col(replacement_col)).alias("n_values"))
        .where(F.col("n_values") > 1)
    )


def replace_via_lookup(df: DataFrame, col: str, lookup: DataFrame,
                       match_col: str, replacement_col: str,
                       key_col: str | None = None) -> DataFrame:
    """Replace ``col`` with the lookup's replacement value.

    - J2 form (value remap, reference main.py:426-433): join on the
      column's own value — ``key_col=None``, match ``df[col] ==
      lookup[match_col]``.
    - J3 form (keyed remap, main.py:436-444): join on an identity key
      (Email) — pass ``key_col``; match ``df[key_col] ==
      lookup[match_col]``.

    Unmatched rows get NULL (the reference's wipe semantics).
    Duplicate lookup keys are collapsed with MIN over the non-null
    replacements — a deterministic reducer (F.first depends on
    partition evaluation order, so a dirty lookup sheet with duplicate
    keys would flip values between runs), so the join can't fan out
    fact rows and resolves duplicates reproducibly.
    """
    left_key = F.col(key_col) if key_col else F.col(col)
    clean = (
        lookup.groupBy(F.col(match_col).alias("__match"))
        .agg(F.min(F.col(replacement_col)).alias("__replacement"))
    )
    return (
        df.join(F.broadcast(clean), left_key == F.col("__match"), "left")
        .withColumn(col, F.col("__replacement"))
        .drop("__match", "__replacement")
    )


def replace_many_via_keyed_lookups(df: DataFrame, key_col: str,
                                   lookups: dict[str, DataFrame],
                                   match_col: str = "Email") -> DataFrame:
    """J3: apply one keyed replacement per column (the reference's 11
    repeated-data columns, config.py:18-29) — successive broadcast
    joins; each is map-side, so the chain stays a single narrow stage
    per join with no fact-table shuffle."""
    for col, lk in lookups.items():
        df = replace_via_lookup(df, col, lk, match_col, col, key_col=key_col)
    return df
