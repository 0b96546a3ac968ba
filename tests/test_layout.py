

def test_bucketed_join_elides_both_exchanges(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    join with ZERO Exchange nodes — the write-once/shuffle-never
    contract that makes bucketing worth it at scale."""
    from jcf_nb_migration_spark.io.layout import write_bucketed
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    orders = t(spark, SF_SMALL, "orders")
    li = t(spark, SF_SMALL, "lineitem")
    old_wh = spark.conf.get("spark.sql.warehouse.dir", None)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])
    write_bucketed(li.select("l_orderkey", "l_quantity"),
                   "b_lineitem", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the join is still correct
        n = joined.count()
        expected = (orders.join(li, orders.o_orderkey == li.l_orderkey)
                    .count())
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
