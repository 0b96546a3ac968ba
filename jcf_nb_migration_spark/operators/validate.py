"""T4/T5 validations (SURVEY.md §2.8; reference main.py:213-247).

The reference's operational checks, as first-class engine functions:
- shape assertion (hard fail on unexpected row/column counts)
- schema reconciliation (symmetric diff of data columns vs rules,
  reported both directions, non-fatal)
- unmapped-column check (hard fail, main.py:532-534)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from jcf_nb_migration_spark.rules import RuleSet


class ShapeMismatchError(AssertionError):
    pass


class UnmappedColumnsError(ValueError):
    pass


def assert_shape(df: DataFrame, expected_rows: int,
                 expected_cols: int) -> None:
    """T5: hard fail unless shape matches config (main.py:213-219).
    Column width is metadata (free); the row count is one job."""
    n_cols = len(df.columns)
    if n_cols != expected_cols:
        raise ShapeMismatchError(
            f"expected {expected_cols} columns, got {n_cols}")
    n_rows = df.count()
    if n_rows != expected_rows:
        raise ShapeMismatchError(
            f"expected {expected_rows} rows, got {n_rows}")


@dataclass
class SchemaDiff:
    data_only: list[str]   # in data, missing from rules
    rules_only: list[str]  # in rules, missing from data

    @property
    def clean(self) -> bool:
        return not self.data_only and not self.rules_only


def reconcile_schema(df: DataFrame, ruleset: RuleSet) -> SchemaDiff:
    """T4: symmetric diff of data columns vs STM fullColName
    (main.py:226-247) — driver-side set ops; non-fatal, reported."""
    data_cols = set(df.columns)
    rule_cols = set(ruleset.sources())
    return SchemaDiff(
        data_only=sorted(data_cols - rule_cols),
        rules_only=sorted(rule_cols - data_cols),
    )


def assert_all_mapped(ruleset: RuleSet) -> None:
    """T2's guard: every in-scope non-tag column must have a target
    (main.py:532-534)."""
    unmapped = ruleset.unmapped_in_scope()
    if unmapped:
        raise UnmappedColumnsError(
            f"in-scope columns with no target mapping: {unmapped}")
