"""ColumnRule: the declarative control plane of the migration engine.

The reference drives its pipeline from an external "Source To Target
Mapping" spreadsheet (STM): one row per source column with scope,
rename/merge target, tag, and multiple-choice flags (reference
main.py:133, 263, 481-483, 528-541). Here that becomes a driver-side
list of ``ColumnRule`` dataclasses compiled into lazy DataFrame
expressions — per-*column* metadata never touches the cluster as data;
it becomes literals in the expression tree that Catalyst folds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class ColumnRule:
    """One STM row: how a single source column flows to the target.

    Mirrors the reference's STM columns (SURVEY.md §2, FIXTURES.md §B):
    fullColName → ``source``, IN SCOPE → ``in_scope``, NB TARGET FIELD →
    ``target``, Tag?/Tag Name → ``tag``, Custom Field Type? →
    ``multiple_choice``.
    """

    source: str
    in_scope: bool = True
    target: str | None = None      # rename/merge destination (None = keep name)
    tag: str | None = None         # tag emitted when this column is non-blank
    multiple_choice: bool = False  # emit distinct-value list at the sink


@dataclass
class RuleSet:
    rules: list[ColumnRule] = field(default_factory=list)

    @classmethod
    def from_dataframe(cls, meta: DataFrame,
                       source_col: str = "fullColName",
                       in_scope_col: str = "IN SCOPE",
                       target_col: str = "NB TARGET FIELD",
                       tag_flag_col: str = "Tag?",
                       tag_name_col: str = "Tag Name",
                       mc_col: str = "Custom Field Type?") -> "RuleSet":
        """Compile an STM metadata table (small control DataFrame, e.g.
        read from the metadata CSV cache — S2) into driver-side rules.
        The collect() is intentional: the STM is per-column metadata,
        hundreds of rows at most."""
        rows = meta.collect()
        rules = []
        for r in rows:
            d = r.asDict()
            tag = (d.get(tag_name_col) or "").strip() or None
            if (d.get(tag_flag_col) or "") != "T":
                tag = None
            rules.append(ColumnRule(
                source=(d.get(source_col) or "").replace("\n", ""),
                in_scope=(d.get(in_scope_col) or "") == "T",
                target=(d.get(target_col) or "").strip() or None,
                tag=tag,
                multiple_choice=(d.get(mc_col) or "") == "Multiple Choice",
            ))
        return cls(rules)

    # ---- views over the rules (each mirrors a reference access path) ----

    def in_scope_sources(self) -> list[str]:
        """P1/F1: columns kept by the scope filter (main.py:263-264)."""
        return [r.source for r in self.rules if r.in_scope]

    def tag_mapping(self) -> list[tuple[str, str]]:
        """T1: (source column → tag name), in STM order — order defines
        tag output order (main.py:481-483)."""
        return [(r.source, r.tag) for r in self.rules
                if r.in_scope and r.tag is not None]

    def rename_and_merge_plan(self) -> dict[str, list[str]]:
        """T2/P2: target → ordered source list. First source is the
        rename; the rest merge in, left to right, in STM order
        (main.py:551-618 — merge order is load-bearing, SURVEY §7.5)."""
        plan: dict[str, list[str]] = {}
        for r in self.rules:
            if r.in_scope and r.target is not None:
                plan.setdefault(r.target, []).append(r.source)
        return plan

    def unmapped_in_scope(self) -> list[str]:
        """T2's hard error: in-scope, non-tag columns with no target
        (main.py:532-534)."""
        return [r.source for r in self.rules
                if r.in_scope and r.target is None and r.tag is None]

    def tag_only_sources(self) -> list[str]:
        """Columns that trigger a tag but have no merge target. The
        reference's mapColumns skips them (main.py:528-541 'continue'
        on Tag?=='T' rows), so they survive to the output CSV — they
        are passed through, not dropped."""
        return [r.source for r in self.rules
                if r.in_scope and r.tag is not None and r.target is None]

    def multiple_choice_sources(self) -> list[str]:
        """S5: columns that emit distinct-value lists (main.py:463-467)."""
        return [r.source for r in self.rules
                if r.in_scope and r.multiple_choice]

    def sources(self) -> list[str]:
        return [r.source for r in self.rules]
