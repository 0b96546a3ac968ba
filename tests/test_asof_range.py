"""Unit tests for the as-of join and bucketized range join
(functions/asof.py) on tiny literal frames with known answers."""

from jcf_nb_migration_spark.functions.asof import asof_join, range_join_buckets


def _ts(s):
    return s


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100),
         (1, "2024-01-01 11:00:00", 101),
         (2, "2024-01-01 10:30:00", 200)],
        "user_id int, ts string, lid int",
    ).selectExpr("user_id", "cast(ts as timestamp) ts", "lid")
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:59:00", 900),   # before both left-1 rows
         (1, "2024-01-01 10:30:00", 901),   # before left 11:00 only
         (2, "2024-01-01 11:00:00", 902)],  # after left-2 → no match
        "user_id int, ts string, rid int",
    ).selectExpr("user_id", "cast(ts as timestamp) ts", "rid")
    out = asof_join(left, right, key="user_id", ts="ts",
                    payload_cols=["rid"])
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    assert got == {100: 900, 101: 901, 200: None}


def test_asof_join_tie_and_strict(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100)],
        "user_id int, ts string, lid int",
    ).selectExpr("user_id", "cast(ts as timestamp) ts", "lid")
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 900)],
        "user_id int, ts string, rid int",
    ).selectExpr("user_id", "cast(ts as timestamp) ts", "rid")
    le = asof_join(left, right, "user_id", "ts", ["rid"]).collect()[0]
    assert le["asof_rid"] == 900          # <= matches the tie
    lt = asof_join(left, right, "user_id", "ts", ["rid"],
                   strict=True).collect()[0]
    assert lt["asof_rid"] is None         # < excludes the tie


def test_range_join_buckets_boundaries(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1)],
        "k int, ts string, lid int",
    ).selectExpr("k", "cast(ts as timestamp) ts", "lid")
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:01:00", 10),    # +60s → in (inclusive)
         (1, "2024-01-01 09:59:30", 11),    # -30s → in
         (1, "2024-01-01 10:01:01", 12),    # +61s → out
         (2, "2024-01-01 10:00:00", 13)],   # wrong key → out
        "k int, ts string, rid int",
    ).selectExpr("k", "cast(ts as timestamp) ts", "rid")
    out = range_join_buckets(left, right, key="k", ts="ts",
                             max_gap_seconds=60,
                             left_id="lid", right_id="rid")
    got = {(r["lid"], r["rid"]): r["dt_sec"] for r in out.collect()}
    assert set(got) == {(1, 10), (1, 11)}
    assert got[(1, 10)] == 60.0 and got[(1, 11)] == -30.0


def test_salted_aggregate_matches_plain(spark):
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions.skew import (
        salted_aggregate,
        salted_join,
    )
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    ev = t(spark, SF_SMALL, "events")
    salted = salted_aggregate(ev, "user_id", "value", n_salts=8).toPandas()
    plain = (ev.groupBy("user_id")
             .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
                  .alias("sum_value"),
                  F.count(F.lit(1)).alias("n"))).toPandas()
    s = salted.sort_values("user_id").reset_index(drop=True)
    p = plain.sort_values("user_id").reset_index(drop=True)
    assert (s["sum_value"] == p["sum_value"]).all()
    assert (s["n"] == p["n"]).all()


def test_salted_join_matches_plain(spark):
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions.skew import salted_join
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    orders = t(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, SF_SMALL, "customer").select("c_custkey", "c_mktsegment") \
        .withColumnRenamed("c_custkey", "o_custkey")
    salted = salted_join(orders, cust, "o_custkey", n_salts=4)
    plain = orders.join(cust, "o_custkey")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
