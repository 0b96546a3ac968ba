"""T1 tag derivation (SURVEY.md §2.8; reference processTags,
main.py:476-511).

Reference semantics: STM rows with Tag?='T' define (column → tag name)
pairs; a row gets tag t iff any of t's trigger columns is
non-null/non-blank; tags are deduped, ordered by STM mapping order, and
serialized comma-joined. The reference iterates matching rows per tag
column in Python; here it's one array expression — O(1) passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jcf_nb_migration_spark.operators.cleaning import non_blank


def tags_array(mapping: list[tuple[str, str]]) -> Column:
    """Array of tags for a row: for each (column, tag) in STM order,
    emit the (trimmed — C8, main.py:502) tag when the column is
    non-blank; drop gaps; dedupe keeping first occurrence order."""
    slots = [
        F.when(non_blank(col), F.lit(tag.strip())).otherwise(F.lit(None))
        for col, tag in mapping
    ]
    return F.array_distinct(F.array_compact(F.array(*slots)))


def derive_tags(df: DataFrame, mapping: list[tuple[str, str]],
                out_col: str = "tags",
                as_string: bool = True) -> DataFrame:
    """Add the tags column (ArrayType internally; comma-joined string
    when ``as_string`` — the reference's serialized form,
    main.py:507)."""
    arr = tags_array(mapping)
    return df.withColumn(out_col, F.array_join(arr, ",") if as_string else arr)


def tag_counts(df: DataFrame, mapping: list[tuple[str, str]]) -> DataFrame:
    """A3: per-tag row counts (the reference logs rowCount per tag
    column, main.py:494-504) — one aggregate pass with conditional
    sums, not a filter+count per tag."""
    aggs = [
        F.sum(F.when(non_blank(col), 1).otherwise(0)).alias(tag.strip())
        for col, tag in mapping
    ]
    return df.agg(*aggs)
