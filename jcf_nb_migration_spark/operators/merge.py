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


def _b(c: str) -> Column:
    """Blank-normalized view of a column (NULL → '') for rule tests —
    matches the reference's pre-merge fillna (main.py:623)."""
    return F.coalesce(F.col(c), F.lit(""))


def merge_expr(target: str, source: str) -> Column:
    """One fold step: merge ``source`` into ``target`` per the
    four-branch rule. Returns the new target value."""
    t, s = _b(target), _b(source)
    merged = (
        F.when((s == t) | (s == ""), t)
         .when(t == "", s)
         .otherwise(F.concat(t, F.lit(", "), s))
    )
    # Preserve NULL when both sides are absent (internal null policy).
    return F.when(F.col(target).isNull() & F.col(source).isNull(),
                  F.lit(None)).otherwise(merged)


def concat_audit(df: DataFrame, target: str, source: str,
                 key_col: str) -> DataFrame:
    """Rows that will concatenation-merge (both present, different) —
    the manual-review report the reference prints per row
    (main.py:605-610), as a real DataFrame output."""
    t, s = _b(target), _b(source)
    return (
        df.where((t != "") & (s != "") & (t != s))
        .select(
            F.col(key_col).alias("key"),
            F.lit(target).alias("target_col"),
            F.lit(source).alias("source_col"),
            F.col(target).alias("target_value"),
            F.col(source).alias("source_value"),
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
    for target, sources in plan.items():
        first, rest = sources[0], sources[1:]
        if first != target:
            df = df.withColumnRenamed(first, target)
            report.renames.append((first, target))
        for src in rest:
            if collect_audit:
                report.audits.append(concat_audit(df, target, src, key_col))
            df = df.withColumn(target, merge_expr(target, src)).drop(src)
            report.merges.append((src, target))
    report.df = df
    return report
