"""End-to-end migration pipeline (SURVEY.md §3): the reference's
run() (main.py:650-684) re-expressed as one lazy DataFrame chain.

Stage order matches the reference:
  load → scope filter (P1) → test-row purge (T3) → clean (C1-C12,
  J2/J3) → distinct-value lists (S5) → tags (T1) → rename/merge (T2)
  → sink (S4, blank-filled — C10 at the boundary only).

Everything before the actions is narrow (no shuffle except the
distinct-value lists and any audit collects), so the pipeline is
embarrassingly parallel over input splits at any scale — the
reference's self-identified slow stages (README:42) are exactly the
parts that become single codegen'd passes here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jcf_nb_migration_spark.operators import cleaning
from jcf_nb_migration_spark.operators.lookup import (
    replace_many_via_keyed_lookups,
    replace_via_lookup,
)
from jcf_nb_migration_spark.operators.merge import MergeReport, apply_merge_plan
from jcf_nb_migration_spark.operators.purge import PurgeResult, purge_test_rows
from jcf_nb_migration_spark.operators.tags import derive_tags
from jcf_nb_migration_spark.operators.validate import (
    SchemaDiff,
    assert_all_mapped,
    reconcile_schema,
)
from jcf_nb_migration_spark.rules import RuleSet


@dataclass
class MigrationConfig:
    """Driver-side knobs mirroring the reference's config.py + STM."""

    key_col: str = "Email"
    purge_needle: str = "test"
    purge_exemptions: dict[str, str] = field(default_factory=dict)
    date_cols: tuple[str, ...] = ()           # ISO → US rewrite (C5/C6)
    value_lookups: dict[str, Any] = field(default_factory=dict)   # J2: col → (lookup_df, match, repl)
    keyed_lookup_tables: dict[str, Any] = field(default_factory=dict)  # J3: col → lookup_df
    junk_values: dict[str, tuple[str, ...]] = field(default_factory=dict)  # F5 scrubs
    fix_entities_cols: tuple[str, ...] = ()   # C4 intended behavior
    tags_col: str = "tags"


@dataclass
class MigrationResult:
    output: DataFrame
    purge: PurgeResult
    schema_diff: SchemaDiff
    merge_report: MergeReport
    distinct_lists: dict[str, DataFrame]


def run_migration(df: DataFrame, ruleset: RuleSet,
                  config: MigrationConfig) -> MigrationResult:
    """The full pipeline. Lazy: callers trigger actions by writing the
    returned DataFrames (output, purge.removed audit, merge audit,
    distinct lists)."""
    # T4: schema reconciliation (non-fatal report) + T2 guard.
    schema_diff = reconcile_schema(df, ruleset)
    assert_all_mapped(ruleset)

    # P1: scope projection — early, so every later stage touches only
    # in-scope columns (the one manual pruning the reference did that
    # still matters for CSV sources; parquet prunes anyway).
    in_scope = [c for c in ruleset.in_scope_sources() if c in df.columns]
    df = df.select(*in_scope)

    # T3: test-row purge (predicate, not join).
    purge = purge_test_rows(df, needle=config.purge_needle,
                            exemptions=config.purge_exemptions)
    df = purge.kept

    # C1: scrub control characters everywhere.
    df = cleaning.scrub_control_chars(df)

    # C4 (intended semantics): HTML entity fix.
    for c in config.fix_entities_cols:
        if c in df.columns:
            df = cleaning.fix_html_entities(df, c)

    # F5/C11: junk-value scrubs (bad phones, 'None'/'Na' orgs, ...).
    for c, values in config.junk_values.items():
        if c in df.columns:
            df = cleaning.blank_out(df, c, list(values))

    # C5/C6: date rewrites.
    for c in config.date_cols:
        if c in df.columns:
            df = cleaning.rewrite_iso_date_to_us(df, c)

    # J2: value-remap lookups (religions map): replace, not coalesce.
    for c, (lk, match_col, repl_col) in config.value_lookups.items():
        if c in df.columns:
            df = replace_via_lookup(df, c, lk, match_col, repl_col)

    # J3: keyed remaps (repeated-data columns) — broadcast joins on Email.
    if config.keyed_lookup_tables:
        df = replace_many_via_keyed_lookups(
            df, config.key_col, config.keyed_lookup_tables)

    # S5: distinct-value lists for multiple-choice columns (pre-merge,
    # matching the reference's stage order).
    distinct_lists = {
        c: df.select(c).where(cleaning.non_blank(c)).distinct()
        for c in ruleset.multiple_choice_sources() if c in df.columns
    }

    # T1: tags.
    df = derive_tags(df, ruleset.tag_mapping(), out_col=config.tags_col)

    # T2: rename + ordered merges (with concat audit). Rules whose
    # source column is absent from the data are a soft condition —
    # already surfaced by the T4 schema diff — so the plan narrows to
    # present columns before the merge's hard validation.
    plan: dict[str, list[str]] = {}
    for tgt, srcs in ruleset.rename_and_merge_plan().items():
        present = [s for s in srcs if s in df.columns]
        if present:
            plan[tgt] = present
    merge_report = apply_merge_plan(df, plan, key_col=config.key_col)
    df = merge_report.df

    # Drop tag-only trigger columns that weren't merged into a target
    # (the reference drops consumed sources; tag triggers without a
    # target vanish from the output too).
    mapped = set()
    for tgt, srcs in ruleset.rename_and_merge_plan().items():
        mapped.add(tgt)
    keep = [c for c in df.columns
            if c in mapped or c == config.tags_col]
    df = df.select(*keep)

    # C10 at the sink boundary: NULL → ''.
    df = cleaning.blank_fill(df)

    return MigrationResult(
        output=df,
        purge=purge,
        schema_diff=schema_diff,
        merge_report=merge_report,
        distinct_lists=distinct_lists,
    )
