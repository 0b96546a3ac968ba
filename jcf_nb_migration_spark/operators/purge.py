"""T3 test-row purge (SURVEY.md §2.8; reference deleteTestData,
main.py:273-297).

The reference does an O(rows×cols) Python ``apply(axis=1)`` substring
scan over all 297 columns, then an outer merge on ALL columns to delete
the matches (J1). Here the whole thing is one vectorized predicate:
``filter(p)`` writes the audit, ``filter(~p)`` keeps going — same scan,
no join, no Python. At 100 TB this is a single narrow pass.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jcf_nb_migration_spark.operators.cleaning import qcol


def any_column_contains(columns: Sequence[str], needle: str) -> Column:
    """F2: TRUE iff any listed column, cast to string, contains
    ``needle`` case-insensitively (reference main.py:281-285).

    Implemented as exists() over an array of the columns — one codegen
    stage, short-circuits per row, no row-wise Python. Column refs are
    exact-name (qcol): the scan runs over EVERY data column, so a
    hostile header ('a.b', 'a/b') must not crash the predicate."""
    arr = F.array(*[qcol(c).cast("string") for c in columns])
    return F.exists(
        arr, lambda x: F.lower(x).contains(needle.lower()) & x.isNotNull())


def purge_predicate(columns: Sequence[str], needle: str = "test",
                    exemptions: dict[str, str] | None = None) -> Column:
    """F2 + F3: substring match on any column, minus exemption
    equalities (reference main.py:285 protects the real constituency
    'Southampton, Test')."""
    p = any_column_contains(columns, needle)
    for col, value in (exemptions or {}).items():
        p = p & (F.coalesce(qcol(col), F.lit("")) != value)
    return p


@dataclass
class PurgeResult:
    kept: DataFrame
    removed: DataFrame  # audit view (S6: deleted_test_rows.csv)


def purge_test_rows(df: DataFrame, columns: Sequence[str] | None = None,
                    needle: str = "test",
                    exemptions: dict[str, str] | None = None) -> PurgeResult:
    """T3: split df into kept/removed by the purge predicate. Both
    sides share one predicate expression; if both are consumed, cache
    upstream or let the parquet scan run twice (cheaper than the
    reference's full outer merge either way)."""
    cols = columns if columns is not None else df.columns
    p = purge_predicate(cols, needle, exemptions)
    return PurgeResult(kept=df.filter(~p), removed=df.filter(p))
