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
from pyspark.sql import Window as W
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
    # rotated IN r10 4th wave: the multiway broadcast-dim star-join
    # family's driver witness (local_supplier_volume rotated out)
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
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
    # rotated INTO the driver window r9 second wave (first-time name;
    # supersedes events_json_bucket as the JSON family's witness)
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
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
    # rotated IN r10 4th wave: the grouping-sets/reshape family's
    # driver witness (lineitem_cube rotated out after 9 green rounds)
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


@query(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch-shape", "outer-join", "double-agg", "tpch-q13"),
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by important_supplier_share (coverage_map.py)
    driver_visible=False,
    #                        returned_item_report; the stacked second
    #                        agg is a bounded-domain groupBy
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts —
    the one classic shape where the FILTER lives in the JOIN CONDITION
    of an outer join (customers with zero qualifying orders must
    survive with c_count = 0, so the predicate cannot be pushed below
    the join as a WHERE). Two stacked aggregations: the first shuffles
    on c_custkey (hash-uniform), the second groups the bounded
    c_count domain — the histogram reduction is broadcast-sized."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left")
    per_cust = joined.groupBy(cust.c_custkey).agg(
        F.count(orders.o_orderkey).alias("c_count"))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@query(
    "top_supplier_revenue",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               {sql_dsum("l_extendedprice * (1 - l_discount)",
                         "total_revenue")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    tags=("tpch-shape", "scalar-subquery", "view-max", "tpch-q15"),
    driver_visible=False,  # agg + broadcast-dim join covered by
    #                        local_supplier_volume; see plan note
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the maximum over all suppliers (the revenue "view" + scalar-max
    filter). An earlier formulation took the max as a window over the
    per-supplier rev frame — "dimension-sized", but supplier COUNT
    grows with the corpus (TPC-H scales supplier 10k×SF), so that one
    task's input grows too. Restructured: the max is a 1-row scalar
    aggregate broadcast back onto rev with an exact decimal equality
    join (the important_supplier_share idiom). rev is persisted —
    supplier-sized, bounded — so the max branch and the join branch
    read the SAME materialization and lineitem is scanned ONCE
    physically (plan-pinned in tests/test_plans.py; structural
    ReuseExchange can't collapse the branches because the join side
    pushes an extra IsNotNull into its scan). Revenue goes through
    decimal, so the equality join on the max is exact in both
    engines."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    rev = (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                  "total_revenue"))
        .persist())
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    best = rev.join(F.broadcast(mx),
                    F.col("total_revenue") == F.col("mx"))
    return (best.join(supp, best.l_suppkey == supp.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


@query(
    "nation_market_share",
    oracle=f"""
    WITH allrev AS (
        SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,4)) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_2'
                         THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 9) AS mkt_share
    FROM allrev GROUP BY o_year ORDER BY o_year
    """,
    tags=("tpch-shape", "multi-join", "conditional-share", "tpch-q8"),
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: nation_trade_volume
    driver_visible=False,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_2's share of ASIA's PROMO-part market by
    order year — the ratio-of-conditional-aggregates over a seven-table
    star join. All dimension sides (nation x2, region, part filter,
    supplier, customer) are bounded and broadcast-eligible; the only
    big shuffle is lineitem⋈orders on the orderkey. Numerator and
    denominator come from ONE aggregation pass (conditional sum), and
    both go through decimal before one final double division + round —
    exact cross-engine."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part")
    cn = nat.alias("cn")
    sn = nat.alias("sn")
    joined = (
        li.join(orders.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))),
            li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn.n_nationkey"))
        .join(F.broadcast(reg.where(F.col("r_name") == "ASIA")),
              F.col("cn.n_regionkey") == reg.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn.n_nationkey"))
        .join(F.broadcast(part.where(F.col("p_type") == "PROMO")),
              li.l_partkey == part.p_partkey))
    vol = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    yearly = (joined
              .select(F.year("o_orderdate").cast("long").alias("o_year"),
                      vol.alias("volume"),
                      F.col("sn.n_name").alias("supp_nation"))
              .groupBy("o_year")
              .agg(F.sum(F.when(F.col("supp_nation") == "NATION_2",
                                F.col("volume")).otherwise(
                   F.lit(0).cast("decimal(18,4)"))).cast("double")
                   .alias("num"),
                   F.sum("volume").cast("double").alias("den")))
    return (yearly.select(
        "o_year",
        F.round(F.col("num") / F.col("den"), 9).alias("mkt_share"))
        .orderBy("o_year"))
