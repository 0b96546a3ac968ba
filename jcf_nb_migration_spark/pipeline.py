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

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from jcf_nb_migration_spark.operators import cleaning
from jcf_nb_migration_spark.operators.lookup import (
    duplicate_keys,
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
    """Driver-side knobs mirroring the reference's config.py + STM.

    Every clean shape in the reference's cleanData (main.py:364-455)
    has a hook here: C1 is always on; C2 via ``strip_char_cols``
    (Last Name comma strip, main.py:381-383); C3 via
    ``title_case_masks`` (conditional City title-case,
    main.py:390-391); C4 via ``fix_entities_cols``; equality
    value→value fixes via ``value_fixes`` (e.g. the email typo,
    main.py:400); F5 membership scrubs via ``junk_values``; C5/C6 via
    ``date_cols``; J2/J3 via the lookup fields. ``extra_cleans`` takes
    arbitrary DataFrame→DataFrame callables for one-off fixes that
    don't fit a declarative shape — applied last in the clean stage."""

    key_col: str = "Email"
    purge_needle: str = "test"
    purge_exemptions: dict[str, str] = field(default_factory=dict)
    date_cols: tuple[str, ...] = ()           # ISO → US rewrite (C5/C6)
    value_lookups: dict[str, Any] = field(default_factory=dict)   # J2: col → (lookup_df, match, repl)
    keyed_lookup_tables: dict[str, Any] = field(default_factory=dict)  # J3: col → lookup_df
    junk_values: dict[str, tuple[str, ...]] = field(default_factory=dict)  # F5 scrubs
    fix_entities_cols: tuple[str, ...] = ()   # C4 intended behavior
    strip_char_cols: dict[str, tuple[str, tuple[str, ...]]] = \
        field(default_factory=dict)           # C2: col → (chars, exemptions)
    title_case_masks: dict[str, str] = field(default_factory=dict)  # C3: col → rlike mask
    value_fixes: dict[str, dict[str, str]] = field(default_factory=dict)  # F6+C11: col → {bad: good}
    extra_cleans: tuple[Any, ...] = ()        # generic df→df clean hooks
    tags_col: str = "tags"


@dataclass
class MigrationResult:
    output: DataFrame
    purge: PurgeResult
    schema_diff: SchemaDiff
    merge_report: MergeReport
    distinct_lists: dict[str, DataFrame]
    # col → lazy (key, n_values) frame of lookup keys with >1 distinct
    # replacement (the ones the join resolves with MIN) — surfaced so a
    # dirty lookup sheet is visible in the audit instead of silent.
    lookup_dup_keys: dict[str, DataFrame] = field(default_factory=dict)
    # Observation attached to `output`: metrics (n_rows, n_untagged)
    # captured by the FIRST action the caller runs on it — no extra
    # scan. Read via `metrics.get` after writing.
    metrics: Observation | None = None


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
    df = df.select(*[cleaning.qcol(c) for c in in_scope])

    # T3: test-row purge (predicate, not join). Exemptions on columns
    # absent from this extract are vacuous — drop them rather than
    # failing analysis (configs carry the full production exemption
    # set; partial extracts are normal).
    purge = purge_test_rows(
        df, needle=config.purge_needle,
        exemptions={c: v for c, v in config.purge_exemptions.items()
                    if c in df.columns})
    df = purge.kept

    # C1: scrub control characters everywhere.
    df = cleaning.scrub_control_chars(df)

    # C2: character strips with literal exemptions (Last Name commas).
    for c, (chars, exempt) in config.strip_char_cols.items():
        if c in df.columns:
            df = cleaning.strip_chars(df, c, chars, exempt=list(exempt))

    # C3: conditional title-case (City rows matching the regex mask).
    for c, pattern in config.title_case_masks.items():
        if c in df.columns:
            df = cleaning.title_case_if(df, c, F.col(c).rlike(pattern))

    # C4 (intended semantics): HTML entity fix.
    for c in config.fix_entities_cols:
        if c in df.columns:
            df = cleaning.fix_html_entities(df, c)

    # F6+C11: equality value→value fixes (e.g. the email typo).
    for c, fixes in config.value_fixes.items():
        if c in df.columns:
            for bad, good in fixes.items():
                df = cleaning.masked_update(df, c, F.col(c) == bad, good)

    # F5/C11: junk-value scrubs (bad phones, 'None'/'Na' orgs, ...).
    for c, values in config.junk_values.items():
        if c in df.columns:
            df = cleaning.blank_out(df, c, list(values))

    # C5/C6: date rewrites.
    for c in config.date_cols:
        if c in df.columns:
            df = cleaning.rewrite_iso_date_to_us(df, c)

    # Escape hatch: arbitrary clean callables, applied in order.
    for fn in config.extra_cleans:
        df = fn(df)

    # J2: value-remap lookups (religions map): replace, not coalesce.
    lookup_dup_keys: dict[str, DataFrame] = {}
    for c, (lk, match_col, repl_col) in config.value_lookups.items():
        if c in df.columns:
            df = replace_via_lookup(df, c, lk, match_col, repl_col)
            lookup_dup_keys[c] = duplicate_keys(lk, match_col, repl_col)

    # J3: keyed remaps (repeated-data columns) — broadcast joins on Email.
    if config.keyed_lookup_tables:
        df = replace_many_via_keyed_lookups(
            df, config.key_col, config.keyed_lookup_tables)
        for c, lk in config.keyed_lookup_tables.items():
            lookup_dup_keys[c] = duplicate_keys(lk, "Email", c)

    # S5: distinct-value lists for multiple-choice columns (pre-merge,
    # matching the reference's stage order). qcol (exact-name) refs:
    # STM column names may contain '.'/'/' which Spark's attribute
    # parser rejects in string form.
    distinct_lists = {
        c: (df.select(cleaning.qcol(c))
            .where(cleaning.non_blank(cleaning.qcol(c))).distinct())
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

    # Output columns: merge targets, tag-only trigger columns, tags.
    # Tag-only sources pass through to the sink — the reference's
    # mapColumns skips Tag? rows (main.py:528-541), so they survive to
    # the final CSV; merged-away sources were already dropped by the
    # merge plan.
    mapped = set(ruleset.rename_and_merge_plan())
    passthrough = set(ruleset.tag_only_sources())
    keep = [c for c in df.columns
            if c in mapped or c in passthrough or c == config.tags_col]
    df = df.select(*[cleaning.qcol(c) for c in keep])

    # C10 at the sink boundary: NULL → ''.
    df = cleaning.blank_fill(df)

    # Observed audit metrics: piggyback on whatever action the caller
    # runs against the output (the sink write), so the shape/tag
    # counters the reference recomputed with extra passes
    # (/root/reference/main.py shape prints) cost ZERO additional
    # scans. Populated in result.metrics.get after the first action.
    # Deliberately narrow: a per-cell blank profile would add a
    # width-proportional conditional chain to every sink row (239
    # terms at the reference shape) — that profile is dq_expectations'
    # job, run as its own deliberate scan.
    obs = Observation("jcf_migration_metrics")
    df = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(config.tags_col) == "", 1).otherwise(0))
         .alias("n_untagged"),
    )

    return MigrationResult(
        output=df,
        purge=purge,
        schema_diff=schema_diff,
        merge_report=merge_report,
        distinct_lists=distinct_lists,
        lookup_dup_keys=lookup_dup_keys,
        metrics=obs,
    )
