"""Generate COVERAGE.md: every registered query with its operator
tags, oracle status, headline flag, and — for local-only queries —
which driver-visible query covers its physical plan pattern
(jcf_nb_migration_spark/coverage_map.py; VERDICT r4 item 8).

Usage: PYTHONPATH=. python tools/coverage_report.py [--stdout]
"""

from __future__ import annotations

import sys


def render() -> str:
    from jcf_nb_migration_spark.coverage_map import COVERED_BY
    from jcf_nb_migration_spark.registry import all_queries

    qs = all_queries()
    n_driver = sum(1 for q in qs.values() if q.driver_visible)
    lines = [
        "# COVERAGE — registered queries",
        "",
        f"{len(qs)} queries; "
        f"{sum(1 for q in qs.values() if q.oracle)} with DuckDB oracles "
        "(row-count + schema + order-insensitive value-hash), "
        f"{sum(1 for q in qs.values() if not q.oracle)} rows-only; "
        f"{sum(1 for q in qs.values() if q.headline)} in the bench "
        f"headline set. {n_driver} are exposed through the driver "
        "contract (__spark_entry__.py) so the driver's 50-query window "
        "hard-checks every one; the rest are baselines/intermediates "
        "of exposed queries, kept registered and oracle-tested locally "
        "(tests/test_query_oracles.py runs all of them). The `covered "
        "by` column names, per local-only query, the driver-visible "
        "query exercising the same physical plan pattern (coverage_map"
        ".py, CI-checked by tests/test_coverage_map.py); `pytest:` "
        "entries are surfaces with no possible visible twin, pinned by "
        "the named test instead.",
        "",
        "## Contract changes (driver-visible output semantics)",
        "",
        "- **r5** `simhash_near_pairs`: max Hamming radius 10 → 3 (the "
        "Manku/Jain/Sarma production parameterization; the radius-10 "
        "banding collapsed at scale — scaling-probe ratio 6.96×). Any "
        "consumer pinning pre-r5 driver-window outputs sees a smaller "
        "pair set; the oracle changed in lockstep, so correctness rows "
        "stayed green.",
        "- **r6** driver-window rotation: curation_pipeline_e2e and "
        "ivfadc_residual_probe rotated IN; supplier_nation_directory "
        "(pattern witnessed by lookup_replace_nation) and "
        "late_shipment_priority_count (witnessed by "
        "customer_scd2_history's semi/anti-join family) rotated OUT "
        "— see the coverage map.",
        "- **r7** driver-window rotation: retrieval_pipeline_e2e (new), "
        "linkgraph_cc_starcontraction, paragraph_dedup, bm25_top_docs, "
        "rrf_fusion, and bloom_incremental_dedup rotated IN; "
        "orderdate_us_format, customer_account_flags, part_merge_chain, "
        "salted_user_totals, pii_scrub_stats, and mktsegment_distinct "
        "(each green in 5-6 prior driver rounds) rotated OUT with "
        "pattern twins recorded in the coverage map.",
        "",
        "| query | tags | oracle | driver | covered by | bench | summary |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, q in sorted(qs.items()):
        doc = q.doc.split(".")[0].replace("\n", " ").replace("|", "/")
        cover = "—" if q.driver_visible else COVERED_BY.get(name, "??")
        lines.append(
            f"| {name} | {', '.join(q.tags)} | "
            f"{'exact' if q.oracle else 'rows-only'} | "
            f"{'yes' if q.driver_visible else 'local-only'} | "
            f"{cover} | "
            f"{'yes' if q.headline else ''} | {doc}. |")
    return "\n".join(lines) + "\n"


def main() -> int:
    text = render()
    if "--stdout" in sys.argv:
        sys.stdout.write(text)
        return 0
    with open("COVERAGE.md", "w") as fh:
        fh.write(text)
    print(f"wrote COVERAGE.md ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
