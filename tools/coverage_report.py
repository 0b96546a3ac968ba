"""Generate COVERAGE.md: every registered query with its operator
tags, oracle status, and headline flag — the machine-readable
complement to README's SURVEY §2 mapping.

Usage: PYTHONPATH=. python tools/coverage_report.py
"""

from __future__ import annotations


def main() -> int:
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
        "(tests/test_query_oracles.py runs all of them).",
        "",
        "| query | tags | oracle | driver | bench | summary |",
        "|---|---|---|---|---|---|",
    ]
    for name, q in sorted(qs.items()):
        doc = q.doc.split(".")[0].replace("\n", " ").replace("|", "/")
        lines.append(
            f"| {name} | {', '.join(q.tags)} | "
            f"{'exact' if q.oracle else 'rows-only'} | "
            f"{'yes' if q.driver_visible else 'local-only'} | "
            f"{'yes' if q.headline else ''} | {doc}. |")
    with open("COVERAGE.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote COVERAGE.md: {len(qs)} queries")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
