"""Remaining classic warehouse shapes: multi-dim profit rollup with a
regex dimension filter (Q9), HAVING against a global-scalar fraction
(Q11), and COUNT(DISTINCT) with a NOT-IN dimension exclusion (Q16).

The fixture has no partsupp table, so each shape is adapted to the
available star schema (cost proxy = 10% of p_retailprice; supplier
exclusion = negative account balance) — the *optimizer pattern* each
query exists to exercise (join graph, scalar-subquery decorrelation,
distinct-aggregate expansion) is exactly the TPC-H one. All aggregates
go through the registry's decimal-exact helpers so the DuckDB oracle
comparison is bitwise.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jcf_nb_migration_spark.registry import dec, query, t


@query(
    "profit_by_nation_year",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - CAST(0.1 AS DOUBLE) * (p_retailprice * l_quantity)
                         AS DECIMAL(18,4))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
    tags=("tpch-shape", "multi-join", "regex-dim-filter", "tpch-q9"),
    # star join + broadcast dims is driver-visible via
    # local_supplier_volume; the regex dim filter via part_clean_chain
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) over a
    5-way join with a substring filter on the part dimension. The
    fixture has no partsupp, so cost is proxied as 10% of retail price
    — the join graph (fact ⋈ 3 dims ⋈ orders) and the name filter are
    Q9's. Scale notes: the `p_name LIKE '%gear%'` predicate prunes the
    part dim BEFORE the join (Catalyst pushes it to the scan), so the
    fact table is filtered by the join itself — at 100 TB the part
    side after the filter is a fraction of the dim and AQE broadcasts
    it; nation is broadcast; orders joins on the fact's own key
    (l_orderkey) so both sides co-shuffle once. Profit is summed in
    decimal (order-independent) from an arithmetic tree written
    identically in both engines."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(F.col("p_name").contains("gear"))
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                 - 0.1 * (F.col("p_retailprice") * F.col("l_quantity")))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "important_supplier_share",
    oracle="""
    WITH srev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))) AS rev_d
        FROM lineitem GROUP BY l_suppkey
    ), tot AS (
        SELECT CAST(SUM(rev_d) AS DOUBLE) AS total,
               COUNT(*) AS n_sup
        FROM srev
    )
    SELECT s_name,
           CAST(rev_d AS DOUBLE) AS supplier_revenue,
           ROUND(CAST(rev_d AS DOUBLE) / total, 9) AS revenue_share
    FROM srev JOIN supplier ON s_suppkey = l_suppkey, tot
    WHERE CAST(rev_d AS DOUBLE) > (total / n_sup) * CAST(1.05 AS DOUBLE)
    ORDER BY supplier_revenue DESC, s_name
    """,
    tags=("tpch-shape", "scalar-subquery", "having", "tpch-q11"),
    # scalar-aggregate-as-1-row-broadcast-join is driver-visible via
    # idle_rich_customers (avg_bal crossJoin); per-key agg via
    # top_revenue_customers
)
def important_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: suppliers whose revenue exceeds a scalar
    derived from the corpus-wide total — the HAVING-against-a-
    global-scalar pattern (Q11 filters partsupp value > 0.0001·total;
    here revenue > 1.05× the per-supplier mean, which is
    scale-invariant so the query is non-trivial at every SF — the
    fixture's revenue spread is only ±15% around the mean, so any
    fixed share empties at 10× supplier count).
    Scale notes: the per-supplier aggregate is one
    shuffle; the global total is then one more partial-agg over the
    (supplier-cardinality-sized) aggregate — NOT a second scan of the
    fact table — and joins back as a broadcast single-row frame, never
    a collected Python literal, so the whole query is one job. The
    threshold comparison and the reported share are double ops applied
    to decimal-exact sums, identical in both engines."""
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    srev = (li.groupBy("l_suppkey")
            .agg(F.sum(dec(F.col("l_extendedprice")
                           * (1 - F.col("l_discount")))).alias("rev_d")))
    tot = srev.agg(F.sum("rev_d").cast("double").alias("total"),
                   F.count(F.lit(1)).alias("n_sup"))
    return (
        srev.join(sup, srev.l_suppkey == sup.s_suppkey)
        .crossJoin(F.broadcast(tot))
        .where(F.col("rev_d").cast("double")
               > (F.col("total") / F.col("n_sup")) * 1.05)
        .select("s_name",
                F.col("rev_d").cast("double").alias("supplier_revenue"),
                F.round(F.col("rev_d").cast("double") / F.col("total"), 9)
                 .alias("revenue_share"))
        .orderBy(F.desc("supplier_revenue"), "s_name")
    )


@query(
    "part_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch-shape", "count-distinct", "not-in", "tpch-q16"),
    # distinct-aggregate two-phase expansion is driver-visible via
    # mktsegment_distinct; anti join via document_purge /
    # customers_without_orders twin chain
    driver_visible=False,
)
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many DISTINCT suppliers serve each (brand,
    type, size) bucket, excluding a NOT-IN dimension subset (Q16
    excludes complaint suppliers; the fixture's supplier has no
    comment column, so the exclusion is negative account balance).
    Scale notes: the NOT IN becomes a LEFT ANTI join against a
    filtered dimension — tiny, broadcast, and null-safe by
    construction (s_suppkey is a key, so the NOT-IN NULL trap is
    structurally absent and the anti join IS the correct plan);
    COUNT(DISTINCT) runs as Spark's two-phase distinct aggregate
    (partial distinct on (group, suppkey), then count) — no
    single-point funnel at any width."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (t(spark, sf_dir, "part")
            .where(F.col("p_brand") != "Brand#1")
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (t(spark, sf_dir, "supplier")
           .where(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey,
                "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "lateral_top_customers",
    oracle="""
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n,
    LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) c
    ORDER BY n.n_name, c.c_acctbal DESC, c.c_name
    """,
    tags=("lateral", "correlated-subquery", "topn"),
    # per-group ordered take — physical twin of latest_event_per_user
    # (window rank) and shipping_priority (ordered limit)
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by important_supplier_share (coverage_map.py)
    driver_visible=False,
)
def lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: per nation, the top-2 customers by
    account balance — the SQL:2016 lateral-join formulation of top-N-
    per-group, run through ``spark.sql`` to exercise the engine's
    lateral decorrelation (Catalyst rewrites the correlated ordered-
    limit into a DomainJoin + per-key ranking; DuckDB runs the same
    query natively, so the semantics are pinned cross-engine). At
    scale this plans like the window-function formulation: one shuffle
    on the correlation key, per-key ordered take — no per-outer-row
    re-execution."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    t(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    return spark.sql("""
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM lat_nation n,
        LATERAL (
            SELECT c_name, c_acctbal FROM lat_customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) c
        ORDER BY n.n_name, c.c_acctbal DESC, c.c_name
    """)


@query(
    "nullsafe_cohort_compare",
    oracle="""
    WITH keyed AS (
        SELECT event_id,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS INT)
                         % 7 = 0
                    THEN NULL
                    ELSE CAST(json_extract_string(props, '$.k') AS INT)
                         % 7 END AS category,
               event_id % 2 AS cohort
        FROM events
    ),
    a AS (SELECT category, COUNT(*) AS cnt_a FROM keyed
          WHERE cohort = 0 GROUP BY category),
    b AS (SELECT category, COUNT(*) AS cnt_b FROM keyed
          WHERE cohort = 1 GROUP BY category)
    SELECT COALESCE(a.category, b.category) AS category,
           COALESCE(cnt_a, 0) AS cnt_a,
           COALESCE(cnt_b, 0) AS cnt_b
    FROM a FULL OUTER JOIN b
      ON a.category IS NOT DISTINCT FROM b.category
    ORDER BY category NULLS FIRST
    """,
    tags=("join", "null-safe", "full-outer"),
    # full-outer equi-join with a nullable key — hash-join planned via
    # EqualNullSafe; outer-join twin = customer_order_distribution
    driver_visible=False,
)
def nullsafe_cohort_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe full-outer join: compare per-category event counts
    between two cohorts where the category key is NULLABLE (a sparse
    attribute — here category 0 is mapped to NULL to model 'missing'),
    and the missing-category buckets must MATCH each other rather than
    fall out of the join. Spark's ``eqNullSafe`` (`<=>`) compiles to
    EqualNullSafe, which stays a hash-joinable equi-key — the plan is
    a regular shuffled hash/sort-merge join, not a nested loop; DuckDB
    expresses the same with IS NOT DISTINCT FROM. The classic
    correctness trap this pins: a plain `=` join would silently drop
    both NULL groups."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int") % 7
    keyed = ev.select(
        F.when(k == 0, F.lit(None).cast("int")).otherwise(k)
         .alias("category"),
        (F.col("event_id") % 2).alias("cohort"))
    a = (keyed.where(F.col("cohort") == 0).groupBy("category")
         .agg(F.count(F.lit(1)).alias("cnt_a"))
         .withColumnRenamed("category", "cat_a"))
    b = (keyed.where(F.col("cohort") == 1).groupBy("category")
         .agg(F.count(F.lit(1)).alias("cnt_b"))
         .withColumnRenamed("category", "cat_b"))
    return (
        a.join(b, F.col("cat_a").eqNullSafe(F.col("cat_b")), "full_outer")
        .select(F.coalesce("cat_a", "cat_b").alias("category"),
                F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
                F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"))
        .orderBy(F.asc_nulls_first("category"))
    )


@query(
    "customer_set_ops",
    oracle="""
    WITH building AS (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    urgent AS (
        SELECT DISTINCT o_custkey AS c_custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
    )
    SELECT
        (SELECT COUNT(*) FROM (SELECT * FROM building
                               INTERSECT SELECT * FROM urgent))
            AS n_both,
        (SELECT COUNT(*) FROM (SELECT * FROM building
                               EXCEPT SELECT * FROM urgent))
            AS n_building_only,
        (SELECT COUNT(*) FROM (SELECT * FROM urgent
                               EXCEPT SELECT * FROM building))
            AS n_urgent_only,
        (SELECT COUNT(*) FROM (SELECT * FROM building
                               UNION SELECT * FROM urgent))
            AS n_either
    """,
    tags=("set-ops", "intersect", "except"),
    # INTERSECT/EXCEPT plan as left-semi/left-anti aggregates — the
    # same join kinds driver-visible via customers_without_orders /
    # customers_with_urgent_orders
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by top_revenue_customers (coverage_map.py)
    driver_visible=False,
)
def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI set operations as audit counts: BUILDING-segment customers
    vs customers with urgent orders — INTERSECT, both EXCEPT
    directions, and UNION (distinct). Catalyst plans INTERSECT as a
    left-semi join and EXCEPT as a left-anti join over distinct
    inputs, so each count is one co-partitioned shuffle — the
    set-operator surface reduces to the join machinery already proven
    at scale, and this query pins that equivalence cross-engine.

    The four counts are expressed as 1-row scalar aggregates composed
    with crossJoins into ONE lazy plan (the important_supplier_share
    idiom) — an earlier version ran four eager ``.count()`` actions
    and returned a driver-built literal row, which broke the
    registry's lazy-plan contract (plan assertions and bench timing
    saw only a local literal)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    building = (cust.where(F.col("c_mktsegment") == "BUILDING")
                .select("c_custkey"))
    urgent = (orders.where(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_custkey").alias("c_custkey")).distinct())
    one = F.count(F.lit(1))
    return (building.intersect(urgent).agg(one.alias("n_both"))
            .crossJoin(building.subtract(urgent)
                       .agg(one.alias("n_building_only")))
            .crossJoin(urgent.subtract(building)
                       .agg(one.alias("n_urgent_only")))
            .crossJoin(building.union(urgent).distinct()
                       .agg(one.alias("n_either"))))


@query(
    "volume_shipping_report",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(19,4))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    tags=("tpch-q7", "join", "multi-dim", "broadcast"),
    # Q5/Q8/Q9's broadcast-dim star-join family (driver-visible via
    # local_supplier_volume); the Q7 twist is the SAME dimension
    # joined twice under different roles
    driver_visible=False,
)
def volume_shipping_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year — the nation dimension participates TWICE (supplier's
    and customer's nation) with a disjunctive cross-pair predicate.
    Both nation sides broadcast (25 rows); the fact side makes one
    scan with the shipdate range pushed down; the pair filter runs
    after the two cheap dim joins. Revenue through DECIMAL(19,4):
    (18,4)x(18,4) overflows DuckDB, the (19,4) operand idiom from the
    cross-engine traps list."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    sn = nation.select(F.col("n_nationkey").alias("sn_key"),
                       F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("cn_key"),
                       F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where((F.col("l_shipdate")
                  >= F.lit("1996-01-01").cast("timestamp"))
                 & (F.col("l_shipdate")
                    < F.lit("1998-01-01").cast("timestamp")))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(rev.cast("decimal(19,4)")).cast("double")
             .alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year"))


Q18_QTY = 300  # large-volume order threshold


@query(
    "large_volume_customers",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > {Q18_QTY}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN big b ON b.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 20
    """,
    tags=("tpch-q18", "join", "having-subquery", "topk"),
    # rotated INTO the driver window r9 second wave (first-time name)
    # rotated OUT of the driver window r10 (green in 1 driver
    # round); pattern twin: returned_item_report
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers who placed orders totalling more
    than {Q18_QTY} units — the IN-(aggregated subquery) pattern.
    Catalyst decorrelates the HAVING subquery into a semi-join on the
    aggregated order keys; quantities re-aggregate on the surviving
    orders only. The big-order key set is tiny after the threshold, so
    AQE broadcasts it into the fact join; ordered take-20 distributes
    (TakeOrdered), never a global sort."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(dec("l_quantity")).alias("q"))
           .where(F.col("q") > Q18_QTY)
           .select("l_orderkey"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(big, li.l_orderkey == big.l_orderkey, "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(20))


@query(
    "regional_min_balance_supplier",
    oracle="""
    SELECT n.n_name AS nation, s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_acctbal = (
          SELECT MIN(s2.s_acctbal)
          FROM supplier s2
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
          WHERE r2.r_name = 'EUROPE'
            AND s2.s_nationkey = s.s_nationkey)
    ORDER BY nation, s.s_suppkey
    """,
    tags=("tpch-q2", "correlated-scalar-subquery", "decorrelation",
          "min-per-group"),
    # the correlated scalar-MIN decorrelation pattern; driver-visible
    # twins: large_volume_customers' agg-subquery semi-join family
    driver_visible=False,
)
def regional_min_balance_supplier(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for every nation in one region, the supplier(s)
    holding the MINIMUM account balance in that nation — the
    correlated scalar-MIN subquery (Q2's min-supplycost-per-part,
    adapted to nation/acctbal since the fixture has no partsupp). The
    oracle is written in the CORRELATED form; this side hand-applies
    the standard decorrelation Catalyst would produce: aggregate the
    inner ONCE into a min-per-group frame, then equi-join it back and
    filter equality — two scans of supplier total, never a per-outer-
    row rescan (no nested-loop anywhere; plan-guarded in
    tests/test_plans.py). The comparison is raw-double EQUALITY on an
    UNCOMPUTED parquet value (both engines read the same bits; no
    arithmetic), so cross-engine hashing is exact.

    At 100 TB: nation⋈region is a bounded broadcast; the min-per-group
    frame is |nations| rows → AQE broadcasts it into the join-back, so
    the whole query is one shuffle-free pass over supplier plus one
    nationkey-grouped partial agg."""
    natreg = (t(spark, sf_dir, "nation")
              .join(F.broadcast(t(spark, sf_dir, "region")
                                .where(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"))
              .select("n_nationkey", "n_name"))
    sup = (t(spark, sf_dir, "supplier")
           .join(F.broadcast(natreg),
                 F.col("s_nationkey") == F.col("n_nationkey")))
    min_bal = (sup.groupBy("s_nationkey")
               .agg(F.min("s_acctbal").alias("min_bal"))
               .withColumnRenamed("s_nationkey", "mb_nationkey"))
    return (sup.join(min_bal,
                     (F.col("s_nationkey") == F.col("mb_nationkey"))
                     & (F.col("s_acctbal") == F.col("min_bal")))
            .select(F.col("n_name").alias("nation"),
                    "s_suppkey", "s_name", "s_acctbal")
            .orderBy("nation", "s_suppkey"))


Q20_FRAC_NUM, Q20_FRAC_DEN = 3, 10  # share threshold 3/10, kept as an
#   integer ratio so the comparison is decimal-exact in BOTH engines
#   (sq*10 > tq*3) — a 0.3 double literal would compare differently
#   (DuckDB parses bare 0.3 as exact DECIMAL(1,1))


@query(
    "excess_share_suppliers",
    oracle=f"""
    WITH sp AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1999-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%bolt%')
        GROUP BY 1, 2
    ),
    ptot AS (SELECT l_partkey, SUM(sq) AS tq FROM sp GROUP BY 1),
    qual AS (
        SELECT DISTINCT sp.l_suppkey
        FROM sp JOIN ptot ON sp.l_partkey = ptot.l_partkey
        WHERE sp.sq * {Q20_FRAC_DEN} > ptot.tq * {Q20_FRAC_NUM}
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT l_suppkey FROM qual)
    ORDER BY s.s_suppkey
    """,
    tags=("tpch-q20", "nested-semi-join", "aggregated-threshold",
          "decorrelation"),
    # rotated INTO the driver window r9 (TPC-H Q20 decorrelation)
    # rotated OUT of the driver window r10 second wave (green in
    # 1 driver round); pattern twin: sole_failing_supplier
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def excess_share_suppliers(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one region who shipped MORE THAN
    {Q20_FRAC_NUM}/{Q20_FRAC_DEN} of some 'bolt' part's total 1998
    volume — the nested IN-chain (supplier IN (... lineitem agg IN
    (... part filter))) gated by an AGGREGATED threshold (Q20's
    availqty > ½·shipped, re-based on shipped-share since the fixture
    has no partsupp). Decorrelated by hand the way Catalyst rewrites
    the SQL: the part-name filter semi-joins INTO the fact scan (so
    the year+name predicates prune before any aggregation), then ONE
    (partkey, suppkey) aggregate carries both sides of the threshold —
    the per-part denominator is a PARTITIONED WINDOW SUM over that
    aggregated frame (an unmaterialized ptot-join would duplicate the
    subtree and rescan the fact; the window keeps the plan a single
    chain). The threshold compares decimal-scaled integers
    (sq·{Q20_FRAC_DEN} > tq·{Q20_FRAC_NUM}) so both engines decide
    identically (a bare 0.3 literal is exact DECIMAL(1,1) in DuckDB
    but a double in Spark).

    At 100 TB: lineitem is scanned ONCE (plan-guarded) with shipdate
    pushed down; the window re-shuffles only the AGGREGATED
    (partkey, suppkey) frame on partkey, each partition bounded by
    that part's supplier count; the qualifying-supplier key set is
    tiny → AQE broadcasts it into the supplier semi-join;
    nation/region broadcast. No growing state, no cartesian."""
    bolt = (t(spark, sf_dir, "part")
            .where(F.col("p_name").contains("bolt"))
            .select("p_partkey"))
    li = (t(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= "1998-01-01")
                 & (F.col("l_shipdate") < "1999-01-01"))
          .join(bolt, F.col("l_partkey") == F.col("p_partkey"),
                "left_semi"))
    sp = (li.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum(dec("l_quantity")).alias("sq")))
    tq = F.sum("sq").over(Window.partitionBy("l_partkey"))
    qual = (sp.withColumn("tq", tq)
            .where(F.col("sq") * Q20_FRAC_DEN
                   > F.col("tq") * Q20_FRAC_NUM)
            .select("l_suppkey").distinct())
    natreg = (t(spark, sf_dir, "nation")
              .join(F.broadcast(t(spark, sf_dir, "region")
                                .where(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"))
              .select("n_nationkey", "n_name"))
    return (t(spark, sf_dir, "supplier")
            .join(qual, F.col("s_suppkey") == F.col("l_suppkey"),
                  "left_semi")
            .join(F.broadcast(natreg),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name",
                    F.col("n_name").alias("nation"))
            .orderBy("s_suppkey"))


@query(
    "cobucketed_order_revenue",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4))))
                AS DOUBLE), 4) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
    tags=("join", "bucketed", "co-located", "zero-shuffle"),
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def cobucketed_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join answered from CO-BUCKETED layouts: orders and
    lineitem persisted bucketed (and sorted) on the order key with the
    same bucket count (io/layout.write_bucketed), so the planner
    proves both sides already share the required hash distribution and
    elides BOTH SortMergeJoin exchanges (and, with one file per
    bucket plus the legacy bucketedTableScan.outputOrdering conf, both
    sorts) — at 100 TB the
    biggest join in the schema becomes a zero-shuffle zip of bucket
    pairs, paid for once at write time (the layout a warehouse keeps
    for its hottest join key). Pinned in tests/test_plans.py::
    test_cobucketed_join_elides_exchanges_and_sorts; rebuilt per call
    (applicationId-keyed scratch) for determinism, like the *_served
    queries. The oracle is the plain join — results are layout-
    invariant, which is the point: bucketing buys the plan, not
    different answers."""
    import hashlib
    import os
    import tempfile

    from jcf_nb_migration_spark.io.layout import write_bucketed

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = os.path.join(tempfile.gettempdir(), "jcf_cobucket",
                        spark.sparkContext.applicationId, tag)
    ord_tbl, li_tbl = f"cobkt_ord_{tag}", f"cobkt_li_{tag}"
    for tbl, frame, key in (
            (ord_tbl,
             t(spark, sf_dir, "orders")
             .select("o_orderkey", "o_orderpriority"), "o_orderkey"),
            (li_tbl,
             t(spark, sf_dir, "lineitem")
             .select("l_orderkey", "l_extendedprice", "l_discount"),
             "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        # coalesce(1): ONE file per bucket, so the per-bucket sortBy
        # order is usable and the SMJ's sorts elide too (multi-file
        # buckets keep the distribution but lose provable sortedness)
        (frame.coalesce(1).write.mode("overwrite")
         .bucketBy(8, key).sortBy(key)
         .option("path", os.path.join(base, tbl))
         .format("parquet").saveAsTable(tbl))
    o = spark.table(ord_tbl)
    li = spark.table(li_tbl)
    rev = (dec("l_extendedprice")
           * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
    return (o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(F.countDistinct("o_orderkey").alias("n_orders"),
                 F.count(F.lit(1)).alias("n_items"),
                 # round(4): 4-decimal-exact sum; see pricing_summary
                 F.round(F.sum(rev).cast("double"), 4)
                  .alias("revenue"))
            .orderBy("priority"))


ZO_PART = (1, 50)   # l_partkey range — non-empty at every SF
ZO_SUPP = (2, 6)    # l_suppkey range


@query(
    "lineitem_zorder_pruned",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(l_orderkey) AS BIGINT) AS sum_okey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM lineitem
    WHERE l_partkey BETWEEN {ZO_PART[0]} AND {ZO_PART[1]}
      AND l_suppkey BETWEEN {ZO_SUPP[0]} AND {ZO_SUPP[1]}
    """,
    tags=("layout", "zorder", "multi-dim", "pruning", "serving"),
    # layout-build-then-pruned-serve pattern; the pruning mechanics
    # are pinned by tests/test_zorder.py (file-count evidence)
    driver_visible=False,  # rotated out r13 7th wave (green r11-r12, 2x)
)
def lineitem_zorder_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column range scan over a Z-ORDERED layout (io/zorder):
    lineitem rewritten along the Morton curve of (l_partkey,
    l_suppkey) with a per-file min/max PARQUET MANIFEST, then scanned
    under a conjunctive two-column range predicate — the manifest is
    pruned as a DataFrame filter (distributed; the driver collects
    only the surviving file list) before Spark opens anything, the
    mechanism a single-column sort cannot provide (a partkey sort
    packs every file with the full suppkey range). The layout build
    is the linear corpus write a deployment pays once; the serve-side
    read scales with the predicate's selectivity on BOTH columns
    (file-count evidence pinned in tests/test_zorder.py). The exact
    predicate is re-applied after pruning, so the oracle is the plain
    two-range aggregate over the base table — a pruning bug flips the
    hash."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.zorder import (write_zordered,
                                                  zordered_scan)

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), "jcf_zorder",
                        spark.sparkContext.applicationId, tag)
    write_zordered(li, path, ["l_partkey", "l_suppkey"], n_files=32)
    scan = zordered_scan(spark, path,
                         {"l_partkey": ZO_PART, "l_suppkey": ZO_SUPP})
    return scan.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").alias("sum_okey"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"))


ZO_AS_OF_MOD = 97   # deterministic append-batch selector


@query(
    "lineitem_zorder_asof",
    oracle=f"""
    WITH batch AS (
        SELECT l_orderkey + 1000000000000 AS l_orderkey,
               l_partkey, l_suppkey, l_quantity, l_extendedprice
        FROM lineitem WHERE l_orderkey % {ZO_AS_OF_MOD} = 1
    ),
    live AS (
        SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_partkey, l_suppkey FROM batch
    ),
    v0 AS (SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem)
    SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM v0
         WHERE l_partkey BETWEEN {ZO_PART[0]} AND {ZO_PART[1]}
           AND l_suppkey BETWEEN {ZO_SUPP[0]} AND {ZO_SUPP[1]})
            AS n_rows_v0,
        (SELECT CAST(COALESCE(SUM(l_orderkey), 0) AS BIGINT) FROM v0
         WHERE l_partkey BETWEEN {ZO_PART[0]} AND {ZO_PART[1]}
           AND l_suppkey BETWEEN {ZO_SUPP[0]} AND {ZO_SUPP[1]})
            AS sum_okey_v0,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM live
         WHERE l_partkey BETWEEN {ZO_PART[0]} AND {ZO_PART[1]}
           AND l_suppkey BETWEEN {ZO_SUPP[0]} AND {ZO_SUPP[1]})
            AS n_rows_live,
        (SELECT CAST(COALESCE(SUM(l_orderkey), 0) AS BIGINT) FROM live
         WHERE l_partkey BETWEEN {ZO_PART[0]} AND {ZO_PART[1]}
           AND l_suppkey BETWEEN {ZO_SUPP[0]} AND {ZO_SUPP[1]})
            AS sum_okey_live,
        CAST(2 AS BIGINT) AS n_versions
    """,
    tags=("layout", "zorder", "time-travel", "serving"),
    # build→append→as-of lifecycle; the snapshot machinery is pinned
    # by tests/test_zorder.py and the pruned-scan family stays
    # driver-visible via lineitem_zorder_pruned (same module)
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by docstore_as_of_fetch (coverage_map.py)
    driver_visible=False,
)
def lineitem_zorder_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the z-ordered layout (io/zorder versioning,
    r11): build the layout (v0), append a deterministic batch (v1,
    ledgered), then read BOTH versions under the same two-column range
    predicate — AS OF v0 must see exactly the pre-append rows while
    the live scan sees base ∪ batch, and the commit log must record
    exactly two versions. The oracle recomputes both snapshots from
    the base table and the same deterministic batch, so a manifest
    that leaks appended files into v0 (or loses them from v1) flips
    the hash — the cross-engine twin of tests/test_zorder.py's
    AS-OF pins. Mirrors docstore_as_of_fetch for the z-layout."""
    import hashlib
    import tempfile

    from jcf_nb_migration_spark.io.zorder import (append_zordered,
                                                  write_zordered,
                                                  zorder_history,
                                                  zordered_scan)

    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice"]
    li = t(spark, sf_dir, "lineitem").select(*cols)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), "jcf_zorder_asof",
                        spark.sparkContext.applicationId, tag)
    write_zordered(li, path, ["l_partkey", "l_suppkey"], n_files=16)
    batch = (li.where(F.col("l_orderkey") % ZO_AS_OF_MOD == 1)
             .withColumn("l_orderkey",
                         F.col("l_orderkey") + 1_000_000_000_000)
             .select(*cols))
    append_zordered(batch, path, batch_id="zo-asof-1")
    ranges = {"l_partkey": ZO_PART, "l_suppkey": ZO_SUPP}

    def agg(df, suffix):
        return df.agg(
            F.count(F.lit(1)).alias(f"n_rows_{suffix}"),
            F.coalesce(F.sum("l_orderkey"), F.lit(0).cast("bigint"))
            .alias(f"sum_okey_{suffix}"))

    v0 = agg(zordered_scan(spark, path, ranges, version=0), "v0")
    live = agg(zordered_scan(spark, path, ranges), "live")
    nv = zorder_history(spark, path).agg(
        F.count(F.lit(1)).alias("n_versions"))
    return v0.crossJoin(live).crossJoin(nv)
