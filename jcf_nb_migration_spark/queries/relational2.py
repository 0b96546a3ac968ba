"""More TPC-H-shaped relational queries: conditional-share aggregate
(Q14), correlated-average decorrelation (Q17), group-having join-back
(Q18), and a two-dimension multi-join volume report (Q7).

These widen the relational surface beyond the reference's migration
pipeline (SURVEY §2 is fully covered elsewhere); each is the standard
Spark-first formulation of a classic warehouse shape, with the scale
notes inline. All aggregates go through the registry's decimal-exact
helpers so the DuckDB oracle comparison is bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jcf_nb_migration_spark.registry import (
    dec, dsum, query, sql_dsum, t)


@query(
    "promo_revenue_share",
    oracle="""
    SELECT ROUND(100.0 * promo_revenue / total_revenue, 9) AS promo_pct,
           promo_revenue, total_revenue
    FROM (
        SELECT
            CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                AS promo_revenue,
            CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
    )
    """,
    tags=("tpch-shape", "conditional-agg", "join"),
    driver_visible=False,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share for a date window —
    a conditional aggregate over a fact⟕dim join. Scale notes: the
    shipdate predicate pushes to the lineitem scan (one quarter of the
    data read); part is SF-proportional so the join strategy is left
    to AQE (the same reasoning that removed forced broadcasts in r2);
    the CASE aggregate is map-side combinable so the join output never
    materializes. Share computed from decimal-exact numerator and
    denominator, one final rounded double division (cross-engine
    1-ulp guard, see verify SKILL gotchas)."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01"))
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(F.sum(F.when(F.col("p_type") == "PROMO", rev)
                   .otherwise(F.lit(0).cast("decimal(18,4)")))
             .cast("double").alias("promo_revenue"),
             F.sum(rev).cast("double").alias("total_revenue"))
    )
    return agg.select(
        F.round(100.0 * F.col("promo_revenue") / F.col("total_revenue"), 9)
         .alias("promo_pct"),
        "promo_revenue", "total_revenue")


@query(
    "small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           COUNT(*) AS n_small,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON part_avg.l_partkey = lineitem.l_partkey
    WHERE l_quantity < 0.2 * avg_qty
    GROUP BY p_brand ORDER BY p_brand
    """,
    tags=("tpch-shape", "correlated-subquery", "decorrelation"),
    driver_visible=False,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-average-quantity line items,
    per brand. The correlated scalar subquery (avg quantity of *this*
    part) is decorrelated the way Catalyst would: one partial-agg pass
    builds the per-part average, then an equi-join on l_partkey filters
    the fact table. Both sides shuffle on the same key, so at 100 TB
    this is one co-partitioned exchange each — no per-row subquery, no
    broadcast of an SF-proportional table. The 0.2·avg threshold is a
    double computed identically in both engines (decimal-exact sum /
    count, then one multiply), so the comparison is deterministic."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    part_avg = (li.groupBy("l_partkey")
                .agg((F.sum(dec("l_quantity")).cast("double")
                      / F.count(F.lit(1))).alias("avg_qty")))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(part_avg, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_small"),
             (F.sum(dec("l_extendedprice")).cast("double") / 7.0)
             .alias("avg_yearly"))
        .orderBy("p_brand")
    )


@query(
    "large_volume_customers",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300
    )
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice, sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("tpch-shape", "having", "join-back"),
    driver_visible=False,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose orders moved > 300 units. The
    HAVING aggregate runs first (map-side combinable, output is a tiny
    key set), then joins *back* to orders/customer — at scale the big→
    orders join is keys-vs-facts, so AQE turns it into a broadcast of
    the filtered key set rather than a full shuffle; customer joins on
    its own key. Deterministic top-20 via (price DESC, orderkey)
    composite sort; HAVING compares in exact decimal."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(dec("l_quantity")).alias("sq"))
           .where(F.col("sq") > 300)
           .select("l_orderkey", F.col("sq").cast("double").alias("sum_qty")))
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    tags=("tpch-shape", "multi-join", "broadcast"),
    driver_visible=False,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.
    Five-way join: the two nation legs are bounded dims (25 rows) and
    broadcast-hinted — the nation filter then prunes supplier/customer
    *before* they meet the facts, which is the whole trick: the
    expensive lineitem⋈orders join runs on pre-filtered sides. The
    supplier/customer joins stay AQE-decided (SF-proportional at
    100 TB). Shipdate range pushes to the lineitem scan."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = ("NATION_3", "NATION_8")
    supp_n = (supp.join(F.broadcast(nation.where(F.col("n_name").isin(*pair))),
                        supp.s_nationkey == nation.n_nationkey)
              .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    cust_n = (cust.join(F.broadcast(nation.where(F.col("n_name").isin(*pair))),
                        cust.c_nationkey == nation.n_nationkey)
              .select("c_custkey", F.col("n_name").alias("cust_nation")))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .join(cust_n, orders.o_custkey == cust_n.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy("supp_nation", "cust_nation",
                       F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "events_variant_extract",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k')
                AS BIGINT)) AS BIGINT) AS distinct_k
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    tags=("json", "variant", "semi-structured"),
    driver_visible=False,
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4): parse the
    JSON once into variant binary, then typed-path extraction with
    variant_get — the open-schema path for event payloads whose keys
    drift over time. Versus per-field get_json_object (the
    events_json_bucket formulation), the payload is parsed ONCE and
    every extraction is a binary path lookup, which is the difference
    that matters when real payloads carry dozens of fields. At scale
    the variant column is what you'd persist (shredded parquet), making
    re-parse cost zero for downstream readers."""
    from jcf_nb_migration_spark.registry import t as _t

    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "user_id",
        F.parse_json(F.col("props")).alias("pv"),
    ).select(
        "user_id",
        F.expr("variant_get(pv, '$.k', 'bigint')").alias("k"),
    )
    return (
        v.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("k").alias("sum_k"),
             F.countDistinct("k").alias("distinct_k"))
        .orderBy("user_id")
    )


@query(
    "nation_metrics_unpivot",
    oracle="""
    WITH wide AS (
        SELECT c_nationkey,
               CAST(COUNT(*) AS DOUBLE) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_bal,
               CAST(COUNT(*) FILTER (c_acctbal < 0) AS DOUBLE)
                   AS n_negative
        FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey, metric, value FROM (
        SELECT c_nationkey, 'n_customers' AS metric,
               n_customers AS value FROM wide
        UNION ALL
        SELECT c_nationkey, 'total_bal', total_bal FROM wide
        UNION ALL
        SELECT c_nationkey, 'n_negative', n_negative FROM wide
    ) ORDER BY c_nationkey, metric
    """,
    tags=("unpivot", "melt", "reshape"),
    driver_visible=False,
)
def nation_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape with the native unpivot (melt) operator: a
    per-nation metrics table unpivots to (nation, metric, value) — the
    shape metric stores and plotting layers want. unpivot is a
    zero-shuffle projection (each input row fans out to one row per
    measure column in place), unlike the UNION-of-selects formulation
    the oracle uses, which would re-plan the aggregate per arm without
    a subquery. order_status_pivot is the inverse surface."""
    cust = t(spark, sf_dir, "customer")
    wide = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).cast("double")
         .alias("n_negative"))
    return (wide.unpivot(
        "c_nationkey", ["n_customers", "total_bal", "n_negative"],
        "metric", "value")
        .orderBy("c_nationkey", "metric"))
