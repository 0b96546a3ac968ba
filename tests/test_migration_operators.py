"""Unit tests per migration operator (SURVEY.md §5 rebuild strategy #1):
tiny literal frames, exact expected output, null/blank edge cases."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from jcf_nb_migration_spark.operators import cleaning
from jcf_nb_migration_spark.operators.lookup import (
    duplicate_keys,
    replace_via_lookup,
)
from jcf_nb_migration_spark.operators.merge import apply_merge_plan, merge_expr
from jcf_nb_migration_spark.operators.purge import purge_test_rows
from jcf_nb_migration_spark.operators.tags import derive_tags, tag_counts
from jcf_nb_migration_spark.operators.validate import (
    ShapeMismatchError,
    UnmappedColumnsError,
    assert_all_mapped,
    assert_shape,
    reconcile_schema,
)
from jcf_nb_migration_spark.rules import ColumnRule, RuleSet


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ---- T2 merge: the four branches + null handling ----

class TestMerge:
    def test_four_branches(self, spark):
        df = _df(spark, [
            ("k1", "x", "x"),     # equal → keep
            ("k2", "x", ""),      # incoming blank → keep
            ("k3", "", "y"),      # target blank → take incoming
            ("k4", "x", "y"),     # both → concat
            ("k5", None, "y"),    # null target behaves as blank
            ("k6", "x", None),    # null incoming behaves as blank
            ("k7", None, None),   # both null → stays null
        ], "k string, t string, s string")
        out = df.withColumn("t", merge_expr("t", "s")).drop("s")
        got = {r["k"]: r["t"] for r in out.collect()}
        assert got == {"k1": "x", "k2": "x", "k3": "y", "k4": "x, y",
                       "k5": "y", "k6": "x", "k7": None}

    def test_plan_order_and_audit(self, spark):
        # target absorbs B then C, left to right; step 2 sees step 1's
        # result (SURVEY §7.5 ordered-fold requirement).
        df = _df(spark, [("e1", "", "b", "c")],
                 "Email string, T string, B string, C string")
        rep = apply_merge_plan(df, {"T": ["T", "B", "C"]}, key_col="Email")
        assert rep.df.columns == ["Email", "T"]
        assert rep.df.collect()[0]["T"] == "b, c"
        audit = rep.audit_df().collect()
        # first merge (B) was a simple merge — only C concatenated.
        assert len(audit) == 1
        assert audit[0]["source_col"] == "C"
        assert audit[0]["target_value"] == "b"

    def test_rename_first_source(self, spark):
        df = _df(spark, [("e", "v")], "Email string, Src string")
        rep = apply_merge_plan(df, {"Dst": ["Src"]}, key_col="Email")
        assert rep.df.columns == ["Email", "Dst"]
        assert rep.renames == [("Src", "Dst")]


# ---- T1 tags ----

class TestTags:
    MAPPING = [("vol", "Volunteer"), ("don", "Donor "), ("vol2", "Volunteer")]

    def test_tags_dedupe_order_trim(self, spark):
        df = _df(spark, [
            ("a", "x", "y", "z"),   # all triggers → both tags, deduped
            ("b", "", None, "z"),   # only vol2 → Volunteer
            ("c", None, "y", ""),   # only don → Donor (trimmed)
            ("d", "", "", None),    # none → empty string
        ], "id string, vol string, don string, vol2 string")
        out = derive_tags(df, self.MAPPING)
        got = {r["id"]: r["tags"] for r in out.collect()}
        assert got == {"a": "Volunteer,Donor", "b": "Volunteer",
                       "c": "Donor", "d": ""}

    def test_tag_counts(self, spark):
        df = _df(spark, [("x", "", "z"), ("x", "y", None)],
                 "vol string, don string, vol2 string")
        row = tag_counts(df, self.MAPPING).collect()[0]
        assert row["Volunteer"] == 2 and row["Donor"] == 1


# ---- T3 purge ----

class TestPurge:
    def test_predicate_and_exemption(self, spark):
        df = _df(spark, [
            ("r1", "hello", "Somewhere"),
            ("r2", "this is a TEST row", "Somewhere"),
            ("r3", "fine", "Southampton, Test"),       # exempt
            ("r4", None, None),
        ], "id string, notes string, constituency string")
        res = purge_test_rows(
            df, columns=["notes", "constituency"],
            exemptions={"constituency": "Southampton, Test"})
        assert {r["id"] for r in res.kept.collect()} == {"r1", "r3", "r4"}
        assert {r["id"] for r in res.removed.collect()} == {"r2"}


# ---- cleaning ----

class TestCleaning:
    def test_scrub_control_chars(self, spark):
        df = _df(spark, [("a\tb\nc\rd", 1)], "s string, n int")
        out = cleaning.scrub_control_chars(df)
        assert out.collect()[0]["s"] == "a, b, c, d"
        assert out.collect()[0]["n"] == 1  # non-string untouched

    def test_strip_chars_with_exemption(self, spark):
        df = _df(spark, [("Smith, Jr",), ("F. Queen, Jr.",), (None,)],
                 "last string")
        out = cleaning.strip_chars(df, "last", ",",
                                   exempt=["F. Queen, Jr."])
        vals = [r["last"] for r in out.collect()]
        assert vals == ["Smith Jr", "F. Queen, Jr.", None]

    def test_title_case_pandas_semantics(self, spark):
        # pandas str.title uppercases after ANY non-alpha — initcap
        # doesn't; our title_case must match pandas (SURVEY §7.4).
        df = _df(spark, [("o'neill town",), ("anne-marie CITY",)],
                 "city string")
        out = df.select(cleaning.title_case("city").alias("t"))
        assert [r["t"] for r in out.collect()] == [
            "O'Neill Town", "Anne-Marie City"]

    def test_title_case_unicode_boundaries(self, spark):
        # Accented letters are letters: they must stay inside their
        # word run (pandas 'café'.title() == 'Café', not 'CafÉ').
        df = _df(spark, [("café du nord",), ("ZÜRICH WEST",)],
                 "city string")
        out = df.select(cleaning.title_case("city").alias("t"))
        assert [r["t"] for r in out.collect()] == [
            "Café Du Nord", "Zürich West"]

    def test_title_case_if_mask(self, spark):
        df = _df(spark, [("LONDON",), ("Paris",)], "city string")
        out = cleaning.title_case_if(df, "city", F.col("city").rlike("[A-Z]$"))
        assert [r["city"] for r in out.collect()] == ["London", "Paris"]

    def test_fix_html_entities(self, spark):
        df = _df(spark, [("king&#039;s lynn",)], "city string")
        out = cleaning.fix_html_entities(df, "city")
        assert out.collect()[0]["city"] == "king's lynn"

    def test_blank_out(self, spark):
        df = _df(spark, [("999",), ("447",), (None,)], "phone string")
        out = cleaning.blank_out(df, "phone", ["999", "0"])
        assert [r["phone"] for r in out.collect()] == [None, "447", None]

    def test_date_rewrite(self, spark):
        df = _df(spark, [("2019-03-07",), ("2019-03-07T10:00",),
                         ("bad",), ("",), (None,)], "d string")
        out = cleaning.rewrite_iso_date_to_us(df, "d")
        vals = [r["d"] for r in out.collect()]
        # positional slicing, faithful to the reference: anything ≥10
        # chars is sliced; shorter → NULL
        assert vals[0] == "03/07/2019"
        assert vals[1] == "03/07/2019"
        assert vals[2] is None and vals[3] is None and vals[4] is None

    def test_blank_fill_only_strings(self, spark):
        df = _df(spark, [(None, None)], "s string, n int")
        out = cleaning.blank_fill(df)
        row = out.collect()[0]
        assert row["s"] == "" and row["n"] is None


# ---- J2/J3 lookups ----

class TestLookup:
    def test_value_remap_wipes_unmatched(self, spark):
        df = _df(spark, [("christian",), ("jedi",), (None,)],
                 "faith string")
        lk = _df(spark, [("christian", "Christianity")],
                 "`Values in Data` string, `Replacement Values` string")
        out = replace_via_lookup(df, "faith", lk,
                                 "Values in Data", "Replacement Values")
        vals = [r["faith"] for r in out.collect()]
        assert sorted(vals, key=lambda v: (v is None, v)) == \
            ["Christianity", None, None]

    def test_keyed_remap(self, spark):
        df = _df(spark, [("a@x", "old1"), ("b@x", "old2")],
                 "Email string, phone string")
        lk = _df(spark, [("a@x", "NEW")], "Email string, phone string")
        out = replace_via_lookup(df, "phone", lk, "Email", "phone",
                                 key_col="Email")
        got = {r["Email"]: r["phone"] for r in out.collect()}
        assert got == {"a@x": "NEW", "b@x": None}

    def test_duplicate_lookup_keys_no_fanout(self, spark):
        df = _df(spark, [("v",)], "c string")
        lk = _df(spark, [("v", "r1"), ("v", "r2")],
                 "m string, r string")
        out = replace_via_lookup(df, "c", lk, "m", "r")
        rows = out.collect()
        assert len(rows) == 1  # no row duplication
        # deterministic reducer: duplicate keys resolve to MIN, never
        # partition-order-dependent "first"
        assert rows[0]["c"] == "r1"

    def test_duplicate_keys_audit(self, spark):
        # Dirty lookup: 'v' maps to two values, 'w' repeats one value
        # (not dirty), 'x' is clean — exactly one key is surfaced.
        lk = _df(spark, [("v", "r1"), ("v", "r2"), ("w", "s"),
                         ("w", "s"), ("x", "t")], "m string, r string")
        dups = duplicate_keys(lk, "m", "r").collect()
        assert [(r["key"], r["n_values"]) for r in dups] == [("v", 2)]


# ---- T4/T5 validations ----

class TestValidate:
    def test_shape_assert(self, spark):
        df = _df(spark, [("a",)], "c string")
        assert_shape(df, 1, 1)
        with pytest.raises(ShapeMismatchError):
            assert_shape(df, 2, 1)
        with pytest.raises(ShapeMismatchError):
            assert_shape(df, 1, 5)

    def test_reconcile_and_unmapped(self, spark):
        df = _df(spark, [("a", "b")], "Known string, Mystery string")
        rs = RuleSet([
            ColumnRule("Known", target="known"),
            ColumnRule("Ghost", target="ghost"),
            ColumnRule("TagOnly", tag="T1"),
        ])
        diff = reconcile_schema(df, rs)
        assert diff.data_only == ["Mystery"]
        assert diff.rules_only == ["Ghost", "TagOnly"]
        assert_all_mapped(rs)  # tag-only is fine
        with pytest.raises(UnmappedColumnsError):
            assert_all_mapped(RuleSet([ColumnRule("Lost")]))

    def test_ruleset_from_dataframe(self, spark):
        meta = _df(spark, [
            ("Join\nDate", "T", "join_date", "", "", ""),
            ("Vol", "T", "", "T", " Volunteer ", ""),
            ("City", "T", "city", "", "", "Multiple Choice"),
            ("Old", "F", "", "", "", ""),
        ], "`fullColName` string, `IN SCOPE` string, `NB TARGET FIELD` string, "
           "`Tag?` string, `Tag Name` string, `Custom Field Type?` string")
        rs = RuleSet.from_dataframe(meta)
        assert rs.in_scope_sources() == ["JoinDate", "Vol", "City"]
        assert rs.tag_mapping() == [("Vol", "Volunteer")]
        assert rs.rename_and_merge_plan() == {
            "join_date": ["JoinDate"], "city": ["City"]}
        assert rs.multiple_choice_sources() == ["City"]


def test_merge_plan_missing_source_raises(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("e", "v")], "Email string, A string")
    with _pytest.raises(ValueError, match="absent from the frame"):
        apply_merge_plan(df, {"T": ["A", "Nope"]}, key_col="Email")
