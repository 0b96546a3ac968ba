from jcf_nb_migration_spark.functions.upsert import scd2_merge, upsert


def test_upsert_last_writer_wins(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, v string")
    updates = spark.createDataFrame(
        [(2, "B"), (3, "c")], "k int, v string")
    got = {r["k"]: r["v"] for r in upsert(base, updates, "k").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_scd2_merge_keeps_history(spark):
    base = spark.createDataFrame(
        [(1, "a", "2020-01-01", True), (2, "b", "2020-01-01", True)],
        "k int, v string, eff string, is_current boolean")
    updates = spark.createDataFrame(
        [(2, "B", None)], "k int, v string, eff string")
    out = scd2_merge(base, updates, "k", effective_col="eff",
                     new_effective="2024-06-01")
    rows = sorted([(r["k"], r["v"], r["eff"], r["is_current"])
                   for r in out.collect()])
    assert rows == [
        (1, "a", "2020-01-01", True),          # untouched
        (2, "B", "2024-06-01", True),          # new current
        (2, "b", "2020-01-01", False),         # closed out
    ]
