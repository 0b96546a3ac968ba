"""End-to-end migration demo: the reference's full CSV→CSV workflow
(SURVEY.md §3) on synthetic files — read (S1/S2) → rules → pipeline
(P/F/J/C/T operators) → sinks (S4-S7, S9).

Usage: PYTHONPATH=. python examples/migration_demo.py [workdir]
Writes output.csv, output_sample.csv, customFieldValues/<col>.csv,
deleted_test_rows.csv, concat_audit.csv, schema-diff reports.
"""

from __future__ import annotations

import os
import sys
import tempfile

CRM_CSV = """Email,First Name,Last Name,Join Date,Faith,Notes,Constituency,Vol Interest,Phone A,Phone B,Mystery
e1@x,Ann,Lee,2019-03-07,christian,fine,Northville,yes,111,111,m
e2@x,Bob,Roe,2020-01-02,jedi,this is a Test row,Northville,,1,2,m
e3@x,Cat,Poe,2021-12-31,unknown,ok,"Southampton, Test",,333,,m
e4@x,Dan,Sim,,christian,"a\tb",Eastham,y,,444,m
e5@x,Eve,Kim,2018-06-15,,,Westham,,555,556,m
"""

STM_CSV = """fullColName,IN SCOPE,NB TARGET FIELD,Tag?,Tag Name,Custom Field Type?
Email,T,email,,,
First Name,T,first_name,,,
Last Name,T,last_name,,,
Join Date,T,join_date,,,
Faith,T,faith,,,Multiple Choice
Notes,T,notes,,,
Constituency,T,constituency,,,
Vol Interest,T,,T,Volunteer,
Phone A,T,phone,,,
Phone B,T,phone,,,
"""

RELIGIONS_CSV = """Values in Data,Replacement Values
christian,Christianity
"""


def main(workdir: str | None = None) -> dict[str, str]:
    workdir = workdir or tempfile.mkdtemp(prefix="jcf_demo_")
    os.makedirs(workdir, exist_ok=True)
    for name, content in (("crm.csv", CRM_CSV), ("STM.csv", STM_CSV),
                          ("RELIGIONS.csv", RELIGIONS_CSV)):
        with open(os.path.join(workdir, name), "w") as fh:
            fh.write(content)

    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.io.readers import read_csv
    from jcf_nb_migration_spark.io.writers import (
        write_distinct_value_lists,
        write_sample_csv,
        write_schema_diff_reports,
        write_single_csv,
    )
    from jcf_nb_migration_spark.pipeline import MigrationConfig, run_migration
    from jcf_nb_migration_spark.rules import RuleSet

    spark = get_spark("migration-demo")
    spark.sparkContext.setLogLevel("ERROR")

    crm = read_csv(spark, os.path.join(workdir, "crm.csv"), all_string=True)
    stm = read_csv(spark, os.path.join(workdir, "STM.csv"), all_string=True)
    religions = read_csv(spark, os.path.join(workdir, "RELIGIONS.csv"),
                         all_string=True)

    ruleset = RuleSet.from_dataframe(stm)
    cfg = MigrationConfig(
        key_col="Email",
        purge_exemptions={"Constituency": "Southampton, Test"},
        date_cols=("Join Date",),
        value_lookups={"Faith": (religions, "Values in Data",
                                 "Replacement Values")},
    )
    res = run_migration(crm, ruleset, cfg)

    outputs: dict[str, str] = {}
    outputs["output"] = write_single_csv(
        res.output, os.path.join(workdir, "output.csv"))
    outputs["sample"] = write_sample_csv(
        res.output, os.path.join(workdir, "output_sample.csv"), n=3)
    outputs["deleted"] = write_single_csv(
        res.purge.removed, os.path.join(workdir, "deleted_test_rows.csv"))
    lists = write_distinct_value_lists(
        res.output.select(*[c for c in res.output.columns]),
        ["faith"], os.path.join(workdir, "customFieldValues"))
    outputs.update(lists)
    audit = res.merge_report.audit_df()
    if audit is not None:
        outputs["concat_audit"] = write_single_csv(
            audit, os.path.join(workdir, "concat_audit.csv"))
    p1, p2 = write_schema_diff_reports(
        crm.columns, ruleset.sources(), workdir)
    outputs["diff_data_missing"], outputs["diff_meta_missing"] = p1, p2

    print(f"workdir: {workdir}")
    for k, v in outputs.items():
        print(f"  {k}: {v}")
    return outputs


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
