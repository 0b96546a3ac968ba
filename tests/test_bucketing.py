"""Bucketed co-located join: write both sides bucketBy(join key), then
join with no shuffle exchange on either side — the storage-level answer
to repeated large-table joins at 100 TB (vs paying a shuffle per
query)."""

import os

import pytest
from pyspark.sql import functions as F

from jcf_nb_migration_spark.registry import t
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    orders = t(spark, SF_SMALL, "orders")
    cust = t(spark, SF_SMALL, "customer")
    (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
     .sortBy("o_custkey").option("path", os.path.join(wh, "orders_b"))
     .saveAsTable("orders_b"))
    (cust.write.mode("overwrite").bucketBy(8, "c_custkey")
     .sortBy("c_custkey").option("path", os.path.join(wh, "customer_b"))
     .saveAsTable("customer_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # disable broadcast so the join strategy must exploit bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("orders_b")
             .join(spark.table("customer_b"),
                   F.col("o_custkey") == F.col("c_custkey")))
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        assert "SortMergeJoin" in plan
        # co-located buckets: no shuffle exchange anywhere in the plan
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == t(spark, SF_SMALL, "orders").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
