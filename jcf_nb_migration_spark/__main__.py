"""CLI entry point — parity with the reference's ``python main.py
[--setup|--meta]`` (reference main.py:16-39 processArgs, main.py:650-688
run): a thin argparse wrapper over setup_workspace → metadata load
(Sheets fetch or snapshot cache) → run_migration → sinks.

    python -m jcf_nb_migration_spark --setup --output-dir out
    python -m jcf_nb_migration_spark --meta ...   # refresh cache first
    python -m jcf_nb_migration_spark --data crm.csv --cache-dir meta \
        --output-dir out

The default path (no flags) mirrors reference entry point 1: load the
STM/RELIGIONS/repeated-data control tables from the CSV cache, run the
full pipeline on the main CSV, and write every sink the reference
writes (output + sample CSVs, per-column distinct-value lists, deleted
test rows audit, concat-merge audit, schema-diff reports).
"""

from __future__ import annotations

import argparse
import os
import sys

DEFAULT_FAITH_COL = "Are you a person of faith?"


def safe_filename(name: str) -> str:
    """STM column names become sink filenames (S5 distinct-value lists);
    a name containing a path separator or other filesystem-hostile
    character must not escape the sink directory. The replacement set is
    minimal — separators, NUL, control chars — so legal-but-odd names
    like the reference's 'Are you a person of faith?' keep their exact
    reference filename."""
    out = []
    for ch in name:
        if ch in "/\\\x00" or ord(ch) < 32:
            out.append("_")
        else:
            out.append(ch)
    cleaned = "".join(out).strip() or "_"
    # Guard relative-path tokens too ('..' would climb out of the dir).
    return "_" * len(cleaned) if set(cleaned) == {"."} else cleaned


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m jcf_nb_migration_spark",
        description="Rule-driven CSV→CSV migration pipeline (Spark).")
    p.add_argument("--setup", action="store_true",
                   help="bootstrap the workspace and exit "
                        "(reference --setup, main.py:656-657)")
    p.add_argument("--meta", action="store_true",
                   help="refresh the metadata cache from Google Sheets "
                        "before running (reference --meta, main.py:658)")
    p.add_argument("--data", default="data/main.csv",
                   help="main CSV extract (S1)")
    p.add_argument("--cache-dir", default="data/meta",
                   help="metadata snapshot cache directory (S2)")
    p.add_argument("--output-dir", default="data/out",
                   help="sink directory (output CSVs, audits, lists)")
    p.add_argument("--api-key", default="data/api_key.json",
                   help="Google service-account key file (S3, --meta only)")
    p.add_argument("--spreadsheet", default="STM",
                   help="Google spreadsheet name (S3, --meta only)")
    p.add_argument("--faith-col", default=DEFAULT_FAITH_COL,
                   help="column remapped via the RELIGIONS lookup (J2)")
    p.add_argument("--key-col", default="Email",
                   help="identity key for keyed remaps and audits (J3)")
    p.add_argument("--sample-size", type=int, default=10000,
                   help="rows in the sample output (reference "
                        "sampleSize, main.py:636)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from jcf_nb_migration_spark.io.gsheets import setup_workspace

    if args.setup:
        warnings = setup_workspace(
            args.output_dir,
            api_key_file=args.api_key if args.meta else None,
            cache_dir=args.cache_dir)
        for w in warnings:
            print(f"warning: {w}", file=sys.stderr)
        print(f"workspace ready: {args.output_dir}")
        return 0

    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.io.gsheets import (
        fetch_metadata_from_gsheet,
        load_metadata_from_cache,
    )
    from jcf_nb_migration_spark.io.readers import read_csv
    from jcf_nb_migration_spark.operators.cleaning import qcol
    from jcf_nb_migration_spark.io.writers import (
        write_sample_csv,
        write_schema_diff_reports,
        write_single_csv,
    )
    from jcf_nb_migration_spark.pipeline import MigrationConfig, run_migration
    from jcf_nb_migration_spark.rules import RuleSet

    spark = get_spark("jcf-nb-migration")
    spark.sparkContext.setLogLevel("ERROR")

    if args.meta:
        # Entry point 2: refresh the snapshot cache from Sheets, then
        # continue down the cache path exactly like the reference
        # (main.py:658-663 → README:41).
        try:
            fetch_metadata_from_gsheet(
                spark, args.api_key, args.spreadsheet, args.cache_dir,
                repdata_cols=[])
        except NotImplementedError as e:
            print(f"error: --meta unavailable: {e}", file=sys.stderr)
            return 3

    meta = load_metadata_from_cache(spark, args.cache_dir)
    if "STM" not in meta:
        print(f"error: no STM.csv in cache dir {args.cache_dir} "
              "(run --meta or place the snapshot)", file=sys.stderr)
        return 2

    ruleset = RuleSet.from_dataframe(meta["STM"])

    value_lookups = {}
    if "RELIGIONS" in meta:
        value_lookups[args.faith_col] = (
            meta["RELIGIONS"], "Values in Data", "Replacement Values")
    # Every other cached worksheet is a repeated-data column keyed on
    # the identity column (reference config COLS_WITH_REPEATED_DATA).
    keyed = {name: df for name, df in meta.items()
             if name not in ("STM", "RELIGIONS")}

    cfg = MigrationConfig(
        key_col=args.key_col,
        purge_exemptions={
            "Parliamentary Constituency (U.K.)": "Southampton, Test"},
        date_cols=("Join Date",),
        value_lookups=value_lookups,
        keyed_lookup_tables=keyed,
    )

    crm = read_csv(spark, args.data, all_string=True)
    res = run_migration(crm, ruleset, cfg)

    os.makedirs(args.output_dir, exist_ok=True)
    out = write_single_csv(
        res.output, os.path.join(args.output_dir, "output.csv"))
    write_sample_csv(res.output,
                     os.path.join(args.output_dir, "output_sample.csv"),
                     n=args.sample_size)
    write_single_csv(res.purge.removed,
                     os.path.join(args.output_dir, "deleted_test_rows.csv"))
    # S5: distinct-value lists (already computed post-clean, pre-merge).
    for c, vals in res.distinct_lists.items():
        write_single_csv(
            vals.orderBy(qcol(c)),
            os.path.join(args.output_dir, "customFieldValues",
                         f"{safe_filename(c)}.csv"))
    # Surface dirty lookup sheets (keys with >1 distinct replacement —
    # resolved with MIN by the join) instead of collapsing them silently.
    for c, dups in res.lookup_dup_keys.items():
        n_dirty = dups.count()
        if n_dirty:
            print(f"warning: lookup for {c!r}: {n_dirty} key(s) with "
                  "multiple replacement values (resolved with MIN)",
                  file=sys.stderr)
    audit = res.merge_report.audit_df()
    if audit is not None:
        write_single_csv(audit,
                         os.path.join(args.output_dir, "concat_audit.csv"))
    write_schema_diff_reports(crm.columns, ruleset.sources(),
                              args.output_dir)

    n = res.output.count()
    print(f"wrote {out} ({n} rows, {len(res.output.columns)} cols)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
