"""T2 column merge (SURVEY.md §2.8; reference mapColumns,
main.py:514-628).

STM maps many source columns → one target. The first source renames to
the target; each later source folds in per-row with the four-branch
rule (main.py:581-612):

    equal or incoming blank  → keep target        ("no-op")
    target blank             → take incoming      ("simple merge")
    both present, different  → target + ', ' + incoming
                               ("concatenation merge", audited with the
                               row's key for manual review — README:43)

Merge order is STM row order and each step reads the *result* of the
previous step (SURVEY §7.5), so sources fold left-to-right into a
when/otherwise chain — never parallelized per-source. The reference
iterates all rows in Python per merged column; here each fold is one
expression, so N merges are N narrow projections fused by codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jcf_nb_migration_spark.operators.cleaning import qcol


def _b(c: Column) -> Column:
    """Blank-normalized view (NULL → '') for rule tests — matches the
    reference's pre-merge fillna (main.py:623)."""
    return F.coalesce(c, F.lit(""))


def merge_value_expr(target: Column, source: Column) -> Column:
    """One fold step as a pure expression: merge ``source`` into
    ``target`` per the four-branch rule. Composable, so a multi-source
    chain folds into ONE nested expression instead of one projection
    per step — at 40 merges that's the difference between a single
    Project node and 40 stacked ones (Catalyst analysis cost grows
    superlinearly with projection depth)."""
    t, s = _b(target), _b(source)
    merged = (
        F.when((s == t) | (s == ""), t)
         .when(t == "", s)
         .otherwise(F.concat(t, F.lit(", "), s))
    )
    # Preserve NULL when both sides are absent (internal null policy).
    return F.when(target.isNull() & source.isNull(),
                  F.lit(None)).otherwise(merged)


def merge_expr(target: str, source: str) -> Column:
    """Name-based convenience wrapper around merge_value_expr."""
    return merge_value_expr(qcol(target), qcol(source))


def concat_audit_expr(df: DataFrame, target_value: Column, target_name: str,
                      source: str, key_col: str) -> DataFrame:
    """Rows that will concatenation-merge (both present, different) —
    the manual-review report the reference prints per row
    (main.py:605-610), as a real DataFrame output. ``target_value`` is
    the (possibly already partially folded) target expression the step
    sees."""
    t, s = _b(target_value), _b(qcol(source))
    return (
        df.where((t != "") & (s != "") & (t != s))
        .select(
            qcol(key_col).alias("key"),
            F.lit(target_name).alias("target_col"),
            F.lit(source).alias("source_col"),
            target_value.alias("target_value"),
            qcol(source).alias("source_value"),
        )
    )


@dataclass
class MergeReport:
    df: DataFrame
    audits: list[DataFrame] = field(default_factory=list)
    renames: list[tuple[str, str]] = field(default_factory=list)
    merges: list[tuple[str, str]] = field(default_factory=list)

    def audit_df(self) -> DataFrame | None:
        if not self.audits:
            return None
        out = self.audits[0]
        for a in self.audits[1:]:
            out = out.unionAll(a)
        return out


def apply_merge_plan(df: DataFrame, plan: dict[str, list[str]],
                     key_col: str,
                     collect_audit: bool = True) -> MergeReport:
    """Execute the full rename+merge plan (target → ordered sources).

    For each target: rename the first source (P2), then fold the rest
    left-to-right with merge_expr, dropping each consumed source (P3).
    Audits are taken against the *intermediate* frame each step sees,
    matching the reference's step-at-a-time logging semantics.
    """
    missing = {s for sources in plan.values() for s in sources
               if s not in df.columns}
    if missing:
        raise ValueError(
            f"merge plan references columns absent from the frame: "
            f"{sorted(missing)}")
    report = MergeReport(df=df)

    # Build every target's final value as ONE nested expression (fold
    # left-to-right in rule order — SURVEY §7.5), then emit the whole
    # plan as a single select. Audits evaluate the partially-folded
    # expression each step would have seen, against the ORIGINAL frame,
    # which is exactly the intermediate value (the fold is the only
    # writer of the target between steps).
    final_exprs: dict[str, Column] = {}
    consumed: set[str] = set()
    for target, sources in plan.items():
        first, rest = sources[0], sources[1:]
        if first != target:
            report.renames.append((first, target))
        acc = qcol(first)
        consumed.add(first)
        for src in rest:
            if collect_audit:
                report.audits.append(
                    concat_audit_expr(df, acc, target, src, key_col))
            acc = merge_value_expr(acc, qcol(src))
            consumed.add(src)
            report.merges.append((src, target))
        final_exprs[target] = acc

    out_cols: list[Column] = []
    for c in df.columns:
        if c in final_exprs:
            out_cols.append(final_exprs.pop(c).alias(c))
        elif c not in consumed:
            out_cols.append(qcol(c))
        else:
            # first source of a renamed target: emit the folded value
            # at this position under the target name
            for tgt, srcs in plan.items():
                if srcs[0] == c and tgt in final_exprs:
                    out_cols.append(final_exprs.pop(tgt).alias(tgt))
                    break
    # targets whose first source was the target itself but absent from
    # df.columns can't happen (validated above); any remainder appends
    for tgt, expr in final_exprs.items():
        out_cols.append(expr.alias(tgt))
    report.df = df.select(*out_cols)
    return report
