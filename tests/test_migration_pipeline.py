"""E2E golden test (SURVEY.md §5 strategy #3): the FIXTURES.md §B
synthetic CRM extract + mini-STM through the full pipeline, asserting
the composite semantics (scope → purge → clean → lookups → tags →
merge → sink) including every edge case in one run."""

import pytest

from jcf_nb_migration_spark.pipeline import MigrationConfig, run_migration
from jcf_nb_migration_spark.rules import ColumnRule, RuleSet

CRM_SCHEMA = (
    "`Email` string, `First Name` string, `Last Name` string, "
    "`Join Date` string, `Faith` string, `Notes` string, "
    "`Constituency` string, `Vol Interest` string, `Donor Flag` string, "
    "`Phone A` string, `Phone B` string, `Out Of Scope` string, "
    "`Mystery` string"
)

CRM_ROWS = [
    # e1: plain row; phones equal → no merge effect
    ("e1@x", "Ann", "Lee", "2019-03-07", "christian", "fine",
     "Northville", "yes", "", "111", "111", "zz", "m"),
    # e2: contains 'Test' in Notes → purged
    ("e2@x", "Bob", "Roe", "2020-01-02", "jedi", "this is a Test row",
     "Northville", "", "", "1", "2", "zz", "m"),
    # e3: 'Southampton, Test' constituency → exempt from purge;
    # phone B blank → keep A
    ("e3@x", "Cat", "Poe", "2021-12-31", "unknownfaith", "ok",
     "Southampton, Test", "", "y", "333", "", "zz", "m"),
    # e4: phone A blank → take B; control chars in Notes
    ("e4@x", "Dan", "Sim", "", "christian", "a\tb\nc",
     "Eastham", "y", "y", "", "444", "zz", "m"),
    # e5: both phones, different → concatenation merge (audited)
    ("e5@x", "Eve", "Kim", "2018-06-15", None, None,
     "Westham", None, None, "555", "556", "zz", "m"),
]

RULES = RuleSet([
    ColumnRule("Email", target="email"),
    ColumnRule("First Name", target="first_name"),
    ColumnRule("Last Name", target="last_name"),
    ColumnRule("Join Date", target="join_date"),
    ColumnRule("Faith", target="faith", multiple_choice=True),
    ColumnRule("Notes", target="notes"),
    ColumnRule("Constituency", target="constituency"),
    ColumnRule("Vol Interest", tag="Volunteer"),
    ColumnRule("Donor Flag", tag=" Donor "),
    ColumnRule("Phone A", target="phone"),
    ColumnRule("Phone B", target="phone"),
    ColumnRule("Out Of Scope", in_scope=False),
    ColumnRule("Ghost Col", target="ghost"),  # in rules, not in data
])


@pytest.fixture(scope="module")
def result(spark):
    crm = spark.createDataFrame(CRM_ROWS, CRM_SCHEMA)
    religions = spark.createDataFrame(
        [("christian", "Christianity")],
        "`Values in Data` string, `Replacement Values` string")
    cfg = MigrationConfig(
        key_col="Email",
        purge_needle="test",
        purge_exemptions={"Constituency": "Southampton, Test"},
        date_cols=("Join Date",),
        value_lookups={"Faith": (religions, "Values in Data",
                                 "Replacement Values")},
    )
    return run_migration(crm, RULES, cfg)


def test_schema_diff_reported(result):
    assert result.schema_diff.data_only == ["Mystery"]
    assert result.schema_diff.rules_only == ["Ghost Col"]


def test_purge(result):
    removed = result.purge.removed.collect()
    assert [r["Email"] for r in removed] == ["e2@x"]


def test_output_golden(result):
    out = {r["email"]: r.asDict() for r in result.output.collect()}
    assert set(out) == {"e1@x", "e3@x", "e4@x", "e5@x"}

    e1 = out["e1@x"]
    assert e1["join_date"] == "03/07/2019"
    assert e1["faith"] == "Christianity"
    assert e1["phone"] == "111"            # equal merge
    assert e1["tags"] == "Volunteer"

    e3 = out["e3@x"]
    assert e3["constituency"] == "Southampton, Test"   # exemption held
    assert e3["faith"] == ""               # unmatched lookup wiped → ''
    assert e3["phone"] == "333"            # incoming blank
    assert e3["tags"] == "Donor"           # trimmed tag name

    e4 = out["e4@x"]
    assert e4["notes"] == "a, b, c"        # control chars scrubbed
    assert e4["join_date"] == ""           # blank date stays blank
    assert e4["phone"] == "444"            # target blank → incoming
    assert e4["tags"] == "Volunteer,Donor"

    e5 = out["e5@x"]
    assert e5["phone"] == "555, 556"       # concatenation merge
    assert e5["tags"] == ""                # null triggers → no tags
    assert e5["faith"] == "" and e5["notes"] == ""   # nulls blank-filled


def test_output_schema(result):
    # mapped targets + tag-only trigger columns (reference passthrough,
    # main.py:528-541) + tags; out-of-scope and unmapped columns gone
    assert set(result.output.columns) == {
        "email", "first_name", "last_name", "join_date", "faith",
        "notes", "constituency", "phone", "tags",
        "Vol Interest", "Donor Flag"}


def test_concat_audit(result):
    audit = result.merge_report.audit_df().collect()
    assert len(audit) == 1
    a = audit[0]
    assert (a["key"], a["target_value"], a["source_value"]) == \
        ("e5@x", "555", "556")


def test_clean_hooks_cover_remaining_reference_shapes(spark):
    """The cleanData steps not expressible as lookups/junk/dates:
    char strips with exemptions (main.py:381-383), conditional
    title-case (main.py:390-391), equality value fixes (main.py:400),
    and the generic escape hatch — all reachable via MigrationConfig."""
    from pyspark.sql import functions as F

    rows = [
        ("a@x", "Smith, Jr", "LONDON", "a..typo@x"),
        ("b@x", "F. Queen, Jr.", "paris", "ok@x"),
    ]
    schema = ("`Email` string, `Last Name` string, `City` string, "
              "`Alt Email` string")
    rules = RuleSet([
        ColumnRule("Email", target="email"),
        ColumnRule("Last Name", target="last_name"),
        ColumnRule("City", target="city"),
        ColumnRule("Alt Email", target="alt_email"),
    ])
    cfg = MigrationConfig(
        purge_needle="zzz-no-purge",
        strip_char_cols={"Last Name": (",", ("F. Queen, Jr.",))},
        title_case_masks={"City": "[A-Z]$"},
        value_fixes={"Alt Email": {"a..typo@x": "a.typo@x"}},
        extra_cleans=(
            lambda df: df.withColumn("City", F.rtrim(F.col("City"))),),
    )
    out = {r["email"]: r.asDict()
           for r in run_migration(spark.createDataFrame(rows, schema),
                                  rules, cfg).output.collect()}
    assert out["a@x"]["last_name"] == "Smith Jr"      # comma stripped
    assert out["b@x"]["last_name"] == "F. Queen, Jr." # exemption held
    assert out["a@x"]["city"] == "London"             # mask matched
    assert out["b@x"]["city"] == "paris"              # mask not matched
    assert out["a@x"]["alt_email"] == "a.typo@x"      # value fix
    assert out["b@x"]["alt_email"] == "ok@x"


def test_distinct_lists(result):
    assert set(result.distinct_lists) == {"Faith"}
    vals = {r["Faith"] for r in result.distinct_lists["Faith"].collect()}
    # computed post-cleaning: lookup already applied, e2 purged
    assert vals == {"Christianity"}


def test_pipeline_observe_metrics_single_action(spark):
    """Data-quality metrics ride the pipeline's OWN action via the
    Observation API — no second scan: row count, null keys, and value
    bounds arrive as a side effect of the one materializing pass. At
    100 TB this is the difference between free QA metrics and doubling
    the job."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    li = t(spark, SF_SMALL, "lineitem")
    obs = Observation("qa")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_orderkey").isNull().cast("int")).alias("null_keys"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"))
    # one action drives both the "pipeline" and the metrics
    out_rows = observed.where(F.col("l_quantity") > 25).count()
    m = obs.get
    assert m["n_rows"] == li.count()
    assert m["null_keys"] == 0
    assert 0 < m["min_qty"] <= 25 < m["max_qty"]
    assert 0 < out_rows < m["n_rows"]


def test_observed_metrics_piggyback_on_the_sink_action(result):
    """result.metrics is an Observation attached to the output frame:
    the counters materialize with the caller's OWN action (here a
    count(), in production the CSV write) — no second scan — and must
    equal independently recomputed aggregates."""
    out = result.output
    out.count()  # the caller's action; metrics capture alongside it
    got = result.metrics.get
    rows = out.collect()
    assert got["n_rows"] == len(rows)
    assert got["n_untagged"] == sum(1 for r in rows if r["tags"] == "")
