"""Data-profiling, upsert, and ranking-window queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jcf_nb_migration_spark.functions.upsert import scd2_merge, upsert
from jcf_nb_migration_spark.localrel import local_df
from jcf_nb_migration_spark.queries.text_analysis import _SQL_TOKS
from jcf_nb_migration_spark.registry import query, spread, sql_dsum, t


@query(
    "customer_column_profile",
    oracle="""
    SELECT 'c_name' AS col, COUNT(*) AS n,
           COUNT(*) - COUNT(c_name) AS n_null,
           COUNT(DISTINCT c_name) AS n_distinct,
           CAST(MIN(length(c_name)) AS BIGINT) AS min_len,
           CAST(MAX(length(c_name)) AS BIGINT) AS max_len
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
           COUNT(DISTINCT c_mktsegment),
           CAST(MIN(length(c_mktsegment)) AS BIGINT),
           CAST(MAX(length(c_mktsegment)) AS BIGINT)
    FROM customer
    """,
    tags=("profiling", "quality"),
    # Demoted from the 50-name driver window in r4 to admit the
    # curation suite; profiling stays driver-visible via
    # approx_distinct_stats and doc_quality_score.
    driver_visible=False,
)
def customer_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (nulls, cardinality, length bounds) — the
    data-quality report a migration pipeline runs before trusting its
    input; one aggregate pass per column, unioned."""
    cust = t(spark, sf_dir, "customer")
    parts = []
    for c in ("c_name", "c_mktsegment"):
        parts.append(cust.agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(F.length(c)).cast("bigint").alias("min_len"),
            F.max(F.length(c)).cast("bigint").alias("max_len"),
        ).select(F.lit(c).alias("col"), "n", "n_null", "n_distinct",
                 "min_len", "max_len"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "orders_upsert",
    oracle=f"""
    WITH updates AS (
        SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
               o_totalprice * 2 AS o_totalprice
        FROM orders WHERE o_orderkey < 100
    ), merged AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        UNION ALL
        SELECT * FROM updates
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           {sql_dsum('o_totalprice', 'total')}
    FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("upsert", "cdc"),
    # r4: demoted in favor of customer_scd2_history — the harder shape
    # of the same CDC/merge pattern stays visible (curation criterion 3,
    # see __spark_entry__.queries); still oracle-run at every pytest.
    driver_visible=False,
)
def orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulated relationally (functions/upsert.py): a batch
    of order updates (status X, doubled price) replaces matching keys;
    result summarized by status. The v1 answer to CDC without a
    Delta/Iceberg table format."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    updates = (orders.where(F.col("o_orderkey") < 100)
               .withColumn("o_orderstatus", F.lit("X"))
               .withColumn("o_totalprice", F.col("o_totalprice") * 2))
    merged = upsert(orders, updates, "o_orderkey")
    return (merged.groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                  .cast("double").alias("total"))
            .orderBy("o_orderstatus"))


@query(
    "order_value_ranks",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice,
                 o_orderkey)
    """,
    tags=("window", "rank"),
    driver_visible=False,
)
def order_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window suite: ntile, percent_rank, cume_dist over a
    deterministic (value, key) ordering within priority groups."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey", "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "incremental_agg_merge",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice', 'total_price')},
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS avg_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("incremental", "materialized-view", "partial-agg"),
    driver_visible=False,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: a standing aggregate state table
    (two thirds of orders) is refreshed by MERGING the delta batch's
    partial aggregates — union of two partial-agg tables, one groupBy,
    re-deriving avg from the merged (count, sum) — never rescanning
    the base table. count/sum are the mergeable partials (avg is NOT
    mergeable and must be derived); sums ride DECIMAL(18,4) so the
    merge is exact and order-independent. The oracle is the full
    recompute over all orders: passing proves merged-partials ≡
    recompute, the invariant every incremental rollup pipeline rests
    on. At 100 TB the state table is key-sized, the delta is
    day-sized, and the shuffle keys on the group-by column only."""
    orders = t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,4)")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dec).alias("tot"))

    state = partial(orders.where(F.col("o_orderkey") % 3 != 0))
    delta = partial(orders.where(F.col("o_orderkey") % 3 == 0))
    merged = (state.unionByName(delta)
              .groupBy("o_orderpriority")
              .agg(F.sum("cnt").alias("n_orders"),
                   F.sum("tot").alias("tot")))
    return merged.select(
        "o_orderpriority", "n_orders",
        F.col("tot").cast("double").alias("total_price"),
        (F.col("tot").cast("double") / F.col("n_orders"))
        .alias("avg_price")).orderBy("o_orderpriority")


@query(
    "customer_scd2_history",
    oracle="""
    WITH upd AS (
        SELECT c_custkey, c_name, 0.0 AS c_acctbal
        FROM customer WHERE c_acctbal < 0
    )
    SELECT c_custkey, c_acctbal, eff_date, is_current FROM (
        SELECT c.c_custkey, c.c_acctbal, '2020-01-01' AS eff_date,
               (c.c_custkey NOT IN (SELECT c_custkey FROM upd))
                   AS is_current
        FROM customer c
        UNION ALL
        SELECT c_custkey, c_acctbal, '2024-01-01', TRUE FROM upd
    )
    """,
    tags=("scd2", "cdc", "upsert"),
    # driver-visible representative of the CDC/merge pattern (replaced
    # orders_upsert in r4: criterion 3, harder shape stays visible)
    # rotated OUT of the driver window r10 (green in 6 driver
    # rounds); pattern twin: orders_pit_customer_join
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def customer_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 (functions/upsert.scd2_merge):
    negative-balance customers get a corrected row; the old row is
    closed out (is_current=false), history kept. The update key set is
    bounded by the batch size, so the close-out semi/anti joins
    broadcast it — base never shuffles, which is what makes relational
    SCD2 viable on a 100 TB dimension without a lakehouse MERGE."""
    cust = (t(spark, sf_dir, "customer")
            .select("c_custkey", "c_name", "c_acctbal")
            .withColumn("eff_date", F.lit("2020-01-01"))
            .withColumn("is_current", F.lit(True)))
    updates = (cust.where(F.col("c_acctbal") < 0)
               .withColumn("c_acctbal", F.lit(0.0)))
    merged = scd2_merge(cust, updates, "c_custkey",
                        effective_col="eff_date",
                        new_effective="2024-01-01")
    return merged.select("c_custkey", "c_acctbal", "eff_date", "is_current")


@query(
    "hll_sketch_union",
    oracle="""
    SELECT source, CAST(COUNT(DISTINCT text) AS BIGINT) AS exact_distinct,
           TRUE AS est_in_bound
    FROM documents GROUP BY source
    UNION ALL
    SELECT '__ALL__', CAST(COUNT(DISTINCT text) AS BIGINT), TRUE
    FROM documents
    ORDER BY source
    """,
    tags=("approx", "hll", "sketch-merge"),
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting (Apache DataSketches HLL,
    Spark 4 hll_sketch_agg/hll_union_agg): one sketch per source, then
    the GLOBAL estimate comes from unioning the per-source sketches —
    never re-reading the data. That merge property is the entire
    at-scale story: partial sketches build map-side per partition, a
    daily job unions yesterday's sketches with today's, and a rollup
    across any grouping is a union, not a rescan. Like
    approx_distinct_stats, the oracle checks the ACCURACY claim: every
    estimate (per-source and merged-global) must land within ±5 % of
    the exact distinct count it approximates, and the exact values are
    compared bitwise."""
    from jcf_nb_migration_spark.registry import t as _t

    docs = _t(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.countDistinct("text").alias("exact_distinct"),
        F.hll_sketch_agg("text").alias("sk"))
    per_rows = per.select(
        "source", "exact_distinct",
        (F.abs(F.hll_sketch_estimate("sk") - F.col("exact_distinct"))
         <= 0.05 * F.col("exact_distinct")).alias("est_in_bound"))
    exact_all = docs.agg(
        F.countDistinct("text").alias("exact_distinct"))
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    total_row = (exact_all.crossJoin(merged).select(
        F.lit("__ALL__").alias("source"), "exact_distinct",
        (F.abs(F.col("est") - F.col("exact_distinct"))
         <= 0.05 * F.col("exact_distinct")).alias("est_in_bound")))
    return per_rows.unionAll(total_row).orderBy("source")


@query(
    "orders_pit_customer_join",
    oracle="""
    WITH hist AS (
        SELECT c_custkey, c_acctbal, TIMESTAMP '1995-01-01' AS eff_ts,
               1 AS version
        FROM customer
        UNION ALL
        SELECT c_custkey, c_acctbal + 1000, TIMESTAMP '1998-01-01', 2
        FROM customer WHERE c_custkey % 3 = 0
    ),
    ranked AS (
        SELECT o.o_orderkey, h.version, h.c_acctbal,
               row_number() OVER (
                   PARTITION BY o.o_orderkey
                   ORDER BY h.eff_ts DESC) AS rn
        FROM orders o JOIN hist h
          ON h.c_custkey = o.o_custkey AND h.eff_ts <= o.o_orderdate
    )
    SELECT CAST(version AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
               AS total_bal
    FROM ranked WHERE rn = 1
    GROUP BY version ORDER BY version
    """,
    tags=("scd2", "point-in-time", "temporal-join"),
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by promo_session_attribution (coverage_map.py)
    driver_visible=False,
)
def orders_pit_customer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each order picks the dimension VERSION that
    was effective at its order date (the temporal-correctness join
    every SCD2 warehouse runs; also exactly how a feature store serves
    training rows without leakage). Synthetic history: every customer
    has a 1995 version; every third customer gains a 1998 version.
    Implementation is the as-of pattern on the validity start: range
    join on eff_ts ≤ o_orderdate, latest version per order via one
    window — at scale the history table is versions-per-key small, so
    AQE broadcasts it; no interval explosion."""
    from pyspark.sql import Window

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    v1 = cust.select(
        "c_custkey", "c_acctbal",
        F.lit("1995-01-01").cast("timestamp").alias("eff_ts"),
        F.lit(1).alias("version"))
    v2 = (cust.where(F.col("c_custkey") % 3 == 0)
          .select("c_custkey", (F.col("c_acctbal") + 1000).alias("c_acctbal"),
                  F.lit("1998-01-01").cast("timestamp").alias("eff_ts"),
                  F.lit(2).alias("version")))
    hist = v1.unionByName(v2)
    joined = orders.join(
        hist, (hist.c_custkey == orders.o_custkey)
        & (hist.eff_ts <= orders.o_orderdate))
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("eff_ts"))
    pit = (joined.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == 1))
    return (pit.groupBy(F.col("version").cast("bigint").alias("version"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.col("c_acctbal").cast("decimal(18,4)"))
                 .cast("double").alias("total_bal"))
            .orderBy("version"))


@query(
    "orders_snapshot_diff",
    oracle="""
    WITH snap2 AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice * 1.1
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE o_orderkey % 10 <> 7
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 10 = 1
    )
    SELECT op, CAST(COUNT(*) AS BIGINT) AS n FROM (
        SELECT CASE
            WHEN b.o_orderkey IS NULL THEN 'I'
            WHEN s.o_orderkey IS NULL THEN 'D'
            ELSE 'U' END AS op
        FROM orders b FULL OUTER JOIN snap2 s USING (o_orderkey)
        WHERE b.o_orderkey IS NULL OR s.o_orderkey IS NULL
           OR b.o_totalprice <> s.o_totalprice
    ) GROUP BY op ORDER BY op
    """,
    tags=("cdc", "snapshot-diff", "full-outer"),
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data derivation by snapshot diff — how you bootstrap CDC
    when the source system has none: full outer join of yesterday's
    and today's snapshots on the key, classify each row
    insert/update/delete, drop unchanged. Synthetic today-snapshot:
    keys ≡7 (mod 10) deleted, ≡3 repriced ×1.1, ≡1 re-inserted under
    new keys. One co-partitioned shuffle on the key (or zero if both
    snapshots are bucketed — io/layout.write_bucketed); the unchanged
    majority is filtered before it ever leaves the join."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    snap2 = (
        orders.where(F.col("o_orderkey") % 10 != 7)
        .withColumn("o_totalprice",
                    F.when(F.col("o_orderkey") % 10 == 3,
                           F.col("o_totalprice") * 1.1)
                    .otherwise(F.col("o_totalprice")))
        .unionByName(
            orders.where(F.col("o_orderkey") % 10 == 1)
            .select((F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                    "o_custkey", "o_totalprice"))
    )
    b = orders.alias("b")
    s = snap2.alias("s")
    j = b.join(s, F.col("b.o_orderkey") == F.col("s.o_orderkey"),
               "full_outer")
    op = (F.when(F.col("b.o_orderkey").isNull(), "I")
          .when(F.col("s.o_orderkey").isNull(), "D")
          .otherwise("U"))
    changed = j.where(
        F.col("b.o_orderkey").isNull() | F.col("s.o_orderkey").isNull()
        | (F.col("b.o_totalprice") != F.col("s.o_totalprice")))
    return (changed.select(op.alias("op"))
            .groupBy("op").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("op"))


@query(
    "source_embedding_drift",
    oracle="""
    WITH j AS (
        SELECT d.source, e.embedding::DOUBLE[] AS v
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    ),
    ex AS (
        SELECT source,
               CAST(unnest(range(len(v))) AS INT) AS pos,
               unnest(v) AS val
        FROM j
    ),
    base AS (
        SELECT source, pos,
               SUM(CAST(val AS DECIMAL(28,12))) AS ssum,
               COUNT(*) AS cnt
        FROM ex GROUP BY source, pos
    ),
    enr AS (
        SELECT source, pos, cnt,
               CAST(ssum AS DOUBLE) / cnt AS ms,
               CAST(SUM(ssum) OVER (PARTITION BY pos) AS DOUBLE)
                   / SUM(cnt) OVER (PARTITION BY pos) AS mg
        FROM base
    ),
    dots AS (
        SELECT source,
               MAX(CASE WHEN pos = 0 THEN cnt END) AS n_vecs,
               CAST(SUM(CAST(ms * mg AS DECIMAL(28,16))) AS DOUBLE) AS sg,
               CAST(SUM(CAST(ms * ms AS DECIMAL(28,16))) AS DOUBLE) AS ss,
               CAST(SUM(CAST(mg * mg AS DECIMAL(28,16))) AS DOUBLE) AS gg
        FROM enr GROUP BY source
    )
    SELECT source, n_vecs,
           ROUND(sg / (sqrt(ss) * sqrt(gg)), 9) AS drift_cos
    FROM dots
    ORDER BY source
    """,
    tags=("profiling", "quality", "embedding"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def source_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source embedding drift: cosine of each source's centroid
    against the global corpus centroid — the distribution-shift monitor
    a training-data pipeline runs on every ingest batch (a source whose
    centroid swings away from the corpus signals a scrape change,
    language shift, or spam influx before any model sees it).

    Scale shape: ONE corpus pass — an id-equi-join (documents x
    embeddings, co-partition or bucket by id at 100 TB), one
    posexplode, then a single partial-agg shuffle keyed (source, dim)
    whose output is bounded by |sources| x dim rows — kilobytes,
    regardless of corpus size. The global centroid is derived from
    those per-source decimal sums with a window over dim (decimal
    addition is associative, so this equals the direct global sum
    bit-for-bit), NOT by re-aggregating the corpus: the naive
    three-branch formulation (source means, global means, counts as
    separate aggregates over the same join) triples the scan, and the
    plan audit showed exactly that before this restructure. Component
    sums go through DECIMAL so aggregation order can't perturb the
    means; the final cosine is rounded to 9 decimals (same
    cross-engine guard as ivfpq_ann_probe, NOTES.md r4 ADC entry)."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    j = emb.join(docs, emb.vec_id == docs.doc_id).select(
        "source", "embedding")
    ex = j.select(
        "source",
        F.posexplode(F.col("embedding").cast("array<double>"))
         .alias("pos", "val"))
    base = ex.groupBy("source", "pos").agg(
        F.sum(F.col("val").cast("decimal(28,12)")).alias("ssum"),
        F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("pos")
    enr = base.select(
        "source", "pos", "cnt",
        (F.col("ssum").cast("double") / F.col("cnt")).alias("ms"),
        (F.sum("ssum").over(w).cast("double")
         / F.sum("cnt").over(w)).alias("mg"))
    dots = enr.groupBy("source").agg(
        F.max(F.when(F.col("pos") == 0, F.col("cnt"))).alias("n_vecs"),
        F.sum((F.col("ms") * F.col("mg")).cast("decimal(28,16)"))
         .cast("double").alias("sg"),
        F.sum((F.col("ms") * F.col("ms")).cast("decimal(28,16)"))
         .cast("double").alias("ss"),
        F.sum((F.col("mg") * F.col("mg")).cast("decimal(28,16)"))
         .cast("double").alias("gg"))
    return (
        dots.select(
            "source", "n_vecs",
            F.round(F.col("sg") / (F.sqrt("ss") * F.sqrt("gg")), 9)
             .alias("drift_cos"))
        .orderBy("source"))


# --- count-min sketch ----------------------------------------------------
# The third classic mergeable sketch beside HLL (approx_distinct_stats,
# hll_sketch_union) and the quantile sketch (price_quantiles): a
# (depth x width) counter table answering point frequency queries with
# one-sided error (estimate >= truth, over by at most eps*N w.h.p.).
# As data it is a bounded groupBy result — shards build sub-sketches
# independently and union+sum merges them, the same mergeability
# argument as hll_sketch_union.
CMS_D = 4     # independent hash rows
CMS_W = 256   # counters per row
CMS_TOPK = 20


def _sql_cms_bucket(tok_expr: str, j: str) -> str:
    """DuckDB twin of text.token_hash48(tok, salt=f'cms{j}') % CMS_W."""
    return (f"('0x' || substr(md5('cms' || {j} || ':' || {tok_expr}),"
            f" 1, 12))::BIGINT % {CMS_W}")


@query(
    "cms_token_counts",
    oracle=f"""
    WITH toks AS (SELECT {_SQL_TOKS} AS w FROM documents),
    occ AS (SELECT unnest(w) AS tok FROM toks),
    tokc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
             FROM occ GROUP BY tok),
    hashes AS (SELECT unnest(range(0, {CMS_D})) AS j),
    entries AS (SELECT j, {_sql_cms_bucket('tok', 'j')} AS b, cnt
                FROM tokc CROSS JOIN hashes),
    sketch AS (SELECT j, b, CAST(SUM(cnt) AS BIGINT) AS c
               FROM entries GROUP BY j, b),
    probes AS (SELECT tok, cnt FROM tokc
               ORDER BY cnt DESC, tok LIMIT {CMS_TOPK}),
    pe AS (SELECT p.tok, p.cnt, j, {_sql_cms_bucket('p.tok', 'j')} AS b
           FROM probes p CROSS JOIN hashes)
    SELECT p.tok AS token, p.cnt AS exact_count,
           MIN(s.c) AS cms_estimate,
           MIN(s.c) - p.cnt AS overestimate
    FROM pe p JOIN sketch s ON s.j = p.j AND s.b = p.b
    GROUP BY p.tok, p.cnt
    ORDER BY exact_count DESC, token
    """,
    tags=("approx", "sketch", "count-min", "mergeable"),
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by pricing_summary (coverage_map.py)
    driver_visible=False,
)
def cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over corpus token frequencies, checked against
    exact counts: build a {CMS_D}x{CMS_W} counter table (ONE bounded
    groupBy — every shard could build its own and a union+sum would
    merge them, the mergeable-sketch contract), then answer the top-
    {CMS_TOPK} tokens' frequencies from the sketch alone. Output pins
    the CMS guarantee as data: overestimate = estimate - exact is
    always >= 0, and small for heavy hitters.

    Scale shape: token counting is the usual explode + one shuffle on
    the token; the sketch derives from the (distinct-token, count)
    table — {CMS_D} rows per DISTINCT token, not per occurrence — and
    collapses to {CMS_D}*{CMS_W} rows, broadcast-size by construction
    for the probe join (same geometry argument as the Bloom filter's
    word table). The exact top-k cut is a TakeOrdered, not a global
    window. The hash family is md5-salted (token_hash48), bit-equal in
    both engines, so the oracle replays the sketch exactly."""
    from jcf_nb_migration_spark.functions import text as T

    docs = spread(t(spark, sf_dir, "documents"))
    tokc = (docs.select(F.explode(T.tokens("text")).alias("tok"))
            .groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
            .persist())
    hashes = [(F.lit(j),
               (T.token_hash48(F.col("tok"), salt=f"cms{j}") % CMS_W))
              for j in range(CMS_D)]
    entries = tokc.select(
        "cnt",
        F.explode(F.array(*[
            F.struct(j.alias("j"), b.alias("b")) for j, b in hashes
        ])).alias("e")).select(F.col("e.j").alias("j"),
                               F.col("e.b").alias("b"), "cnt")
    sketch = entries.groupBy("j", "b").agg(F.sum("cnt").alias("c"))
    probes = (tokc.orderBy(F.desc("cnt"), "tok").limit(CMS_TOPK)
              .withColumnRenamed("tok", "ptok")
              .withColumnRenamed("cnt", "exact_count"))
    pe = probes.select(
        "ptok", "exact_count",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     (T.token_hash48(F.col("ptok"), salt=f"cms{j}")
                      % CMS_W).alias("b"))
            for j in range(CMS_D)])).alias("e")) \
        .select("ptok", "exact_count", "e.j", "e.b")
    est = (pe.join(F.broadcast(sketch), ["j", "b"])
           .groupBy("ptok", "exact_count")
           .agg(F.min("c").alias("cms_estimate")))
    return (est.select(F.col("ptok").alias("token"), "exact_count",
                       "cms_estimate",
                       (F.col("cms_estimate") - F.col("exact_count"))
                       .alias("overestimate"))
            .orderBy(F.desc("exact_count"), "token"))


# --- declarative data-quality expectations -------------------------------
# The dbt-test / Great-Expectations shape, done the way the reference
# port does its STM rules (SURVEY §1.1): the expectation suite is
# CONTROL PLANE — a bounded driver-side rule list compiled into ONE
# conditional-aggregate pass per table — and the report is data. Rules
# are (column, rule_name, violation predicate); registering a new rule
# adds a when/sum pair to the same single scan, never a second pass.
_DQ_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE",
                "HOUSEHOLD", "MACHINERY")


# table -> [(column, rule, violation predicate)] — the predicate is a
# plain SQL boolean, valid verbatim in BOTH Spark SQL (via F.expr) and
# DuckDB, so the suite is pure metadata with no session dependency at
# import time.
_DQ_RULES = {
    "customer": [
        ("c_name", "not_null", "c_name IS NULL"),
        ("c_acctbal", "non_negative", "c_acctbal < 0"),
        ("c_mktsegment", "in_allowed_set",
         "c_mktsegment NOT IN ('" + "','".join(_DQ_SEGMENTS) + "')"),
    ],
    "orders": [
        ("o_orderstatus", "in_allowed_set",
         "o_orderstatus NOT IN ('F','O','P')"),
        ("o_totalprice", "positive", "o_totalprice <= 0"),
    ],
    "lineitem": [
        ("l_discount", "max_discount_5pct", "l_discount > 0.05"),
        ("l_quantity", "positive", "l_quantity <= 0"),
    ],
}


def _dq_rules():
    return _DQ_RULES


def _sql_dq() -> str:
    parts = []
    for table, rules in _dq_rules().items():
        sums = ", ".join(
            f"CAST(SUM(CASE WHEN {sql} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS v{i}" for i, (_, _, sql) in enumerate(rules))
        rows = " UNION ALL ".join(
            f"SELECT '{table}' AS table_name, '{col}' AS column_name,"
            f" '{rule}' AS rule, n_rows, v{i} AS n_violations,"
            f" v{i} = 0 AS passed FROM {table}_agg"
            for i, (col, rule, _) in enumerate(rules))
        parts.append(
            f"{table}_agg AS (SELECT COUNT(*) AS n_rows, {sums}"
            f" FROM {table})")
        parts.append(f"{table}_rows AS ({rows})")
    ctes = ",\n    ".join(parts)
    union = " UNION ALL ".join(
        f"SELECT * FROM {tbl}_rows" for tbl in _dq_rules())
    return (f"WITH {ctes}\n    SELECT * FROM ({union})"
            " ORDER BY table_name, column_name, rule")


@query(
    "dq_expectations",
    oracle=_sql_dq(),
    tags=("data-quality", "expectations", "control-plane"),
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by gopher_quality_flags (coverage_map.py)
    driver_visible=False,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectation suite (the dbt-test /
    Great-Expectations shape) evaluated the way the reference's STM
    rules run (SURVEY §1.1 control plane vs data plane): the rule list
    is bounded driver-side metadata compiled into ONE conditional-
    aggregate scan per table — N expectations on a table cost the same
    single pass as one, and the suite's report (per-rule row counts,
    violation counts, pass flag) is itself data a pipeline can gate
    on. The fixture suite includes genuinely failing rules
    (c_acctbal non_negative, l_discount max 5%) so both report states
    are exercised."""
    out = None
    for table, rules in _dq_rules().items():
        df = t(spark, sf_dir, table)
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(F.when(F.expr(viol), 1).otherwise(0)).alias(f"v{i}")
            for i, (_, _, viol) in enumerate(rules)]
        agg = df.agg(*aggs)
        stack_args = ", ".join(
            f"'{col}', '{rule}', v{i}"
            for i, (col, rule, _) in enumerate(rules))
        rows = agg.select(
            F.lit(table).alias("table_name"), "n_rows",
            F.expr(f"stack({len(rules)}, {stack_args})"
                   " AS (column_name, rule, n_violations)"))
        out = rows if out is None else out.unionByName(rows)
    return (out.select("table_name", "column_name", "rule", "n_rows",
                       "n_violations",
                       (F.col("n_violations") == 0).alias("passed"))
            .orderBy("table_name", "column_name", "rule"))


@query(
    "retractable_agg_merge",
    oracle=f"""
    WITH cur AS (
        SELECT o_orderpriority,
               CASE WHEN o_orderkey % 5 = 0
                    THEN o_totalprice * CAST(0.9 AS DOUBLE)
                    ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('price', 'total_price')},
           CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS avg_price
    FROM cur GROUP BY o_orderpriority
    HAVING COUNT(*) > 0
    ORDER BY o_orderpriority
    """,
    tags=("incremental", "materialized-view", "retraction", "cdc"),
    driver_visible=False,
)
def retractable_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-capable materialized-view maintenance — the Flink
    retract-stream idea in batch form. The standing state holds
    partial aggregates over ALL orders; a CDC batch then UPDATES
    every 5th order (price ×0.9) and DELETES every 7th. Instead of
    rescanning the base table, the delta is expressed as SIGNED
    partials: each update/delete contributes a −1-weighted row with
    its OLD values, each update also a +1-weighted row with its NEW
    values; merging is one union + one groupBy over signed
    (count, sum) — groups whose merged count reaches 0 drop out.
    count/sum retract cleanly (min/max would not — they need the
    full-rescan path); avg is derived post-merge. Sums ride
    DECIMAL(18,4) so retraction is exact: state − old + new is
    algebraically identical to recomputing over the changed table,
    which is precisely what the oracle does. At 100 TB the state is
    key-sized, the delta is batch-sized, and the only shuffle keys on
    the group-by column."""
    orders = t(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    dec_old = F.col("o_totalprice").cast("decimal(18,4)")
    dec_new = (F.col("o_totalprice") * 0.9).cast("decimal(18,4)")

    state = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(dec_old).alias("tot"))
    changed = orders.where((key % 5 == 0) | (key % 7 == 0))
    retract = changed.select(
        "o_orderpriority", F.lit(-1).alias("w"),
        (-dec_old).alias("wtot"))
    insert = (orders.where((key % 5 == 0) & (key % 7 != 0))
              .select("o_orderpriority", F.lit(1).alias("w"),
                      dec_new.alias("wtot")))
    delta = (retract.unionByName(insert)
             .groupBy("o_orderpriority")
             .agg(F.sum("w").alias("cnt"), F.sum("wtot").alias("tot")))
    merged = (state.unionByName(delta)
              .groupBy("o_orderpriority")
              .agg(F.sum("cnt").alias("n_orders"),
                   F.sum("tot").alias("tot"))
              .where(F.col("n_orders") > 0))
    return merged.select(
        "o_orderpriority", "n_orders",
        F.col("tot").cast("double").alias("total_price"),
        (F.col("tot").cast("double") / F.col("n_orders"))
        .alias("avg_price")).orderBy("o_orderpriority")


K_ANON = 5  # suppression threshold: groups smaller than this leak


@query(
    "k_anonymity_audit",
    oracle=f"""
    WITH quasi AS (
        SELECT c_custkey,
               c_mktsegment,
               c_nationkey,
               CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band
        FROM customer
    ),
    groups AS (
        SELECT c_mktsegment, c_nationkey, bal_band,
               COUNT(*) AS group_size
        FROM quasi GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(COUNT(*) FILTER (group_size < {K_ANON}) AS BIGINT)
               AS n_small_groups,
           CAST(MIN(group_size) AS BIGINT) AS min_group_size,
           CAST(SUM(CASE WHEN group_size < {K_ANON}
                         THEN group_size ELSE 0 END) AS BIGINT)
               AS n_rows_to_suppress,
           CAST(SUM(group_size) AS BIGINT) AS n_rows
    FROM groups
    """,
    tags=("privacy", "k-anonymity", "audit"),
    # quasi-identifier groupBy + one-row rollup — the
    # customer_column_profile / table_counts physical family
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by gopher_quality_flags (coverage_map.py)
    driver_visible=False,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (segment,
    nation, $1000 balance band): how many equivalence classes exist,
    how many fall below k={K_ANON} (re-identifiable), and how many
    rows a suppression pass would have to drop — the check a privacy
    pipeline runs BEFORE releasing a training extract containing
    indirect identifiers (the PII scrub handles direct ones;
    pii_scrub_stats). One groupBy on the quasi tuple + a single-row
    rollup; the banding floor is integer-exact cross-engine."""
    cust = t(spark, sf_dir, "customer")
    quasi = cust.select(
        "c_mktsegment", "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint")
         .alias("bal_band"))
    groups = (quasi.groupBy("c_mktsegment", "c_nationkey", "bal_band")
              .agg(F.count(F.lit(1)).alias("group_size")))
    small = F.col("group_size") < K_ANON
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(small, 1).otherwise(0)).cast("bigint")
         .alias("n_small_groups"),
        F.min("group_size").alias("min_group_size"),
        F.sum(F.when(small, F.col("group_size")).otherwise(0))
         .cast("bigint").alias("n_rows_to_suppress"),
        F.sum("group_size").alias("n_rows"))


def _skew_profile_sql(col: str) -> str:
    return f"""
        SELECT '{col}' AS join_key,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(MAX(c) AS BIGINT) AS max_key_rows,
               ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 9) AS top_share,
               ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 9)
                   AS skew_factor
        FROM (SELECT {col}, COUNT(*) AS c FROM lineitem GROUP BY 1)"""


@query(
    "join_key_skew_profile",
    oracle=(" UNION ALL ".join(_skew_profile_sql(c) for c in
                               ("l_orderkey", "l_partkey", "l_suppkey"))
            + " ORDER BY join_key"),
    tags=("profiling", "skew", "diagnostics"),
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis — the profile that DECIDES between
    plain hash join, AQE skew handling, and manual salting
    (functions/skew.py): for each candidate lineitem join key, the
    distinct-key count, the hottest key's row count, its share of the
    table, and the skew factor (hot key as a multiple of the mean
    key). skew_factor ≈ 1 → uniform, shuffle freely;  ≫ 1 → the
    hottest partition is that many times the average and needs
    salting or AQE skew-split. One column-pruned scan + per-key
    count + single-row rollup per key, unioned — each branch is the
    map-side-combining two-phase aggregate, nothing key-unbounded is
    collected."""
    li = t(spark, sf_dir, "lineitem")
    outs = []
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        per_key = (li.select(col).groupBy(col)
                   .agg(F.count(F.lit(1)).alias("c")))
        outs.append(per_key.agg(
            F.lit(col).alias("join_key"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("max_key_rows"),
            F.round(F.max("c").cast("double") / F.sum("c"), 9)
             .alias("top_share"),
            F.round(F.max("c").cast("double") * F.count(F.lit(1))
                    / F.sum("c"), 9).alias("skew_factor")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("join_key")


@query(
    "daily_volume_anomalies",
    oracle="""
    WITH d AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS sn,
               CAST(SUM(n * n) AS BIGINT) AS snn
        FROM d
    )
    SELECT CAST(day AS VARCHAR) AS day, n,
           ROUND(n - CAST(sn AS DOUBLE) / k, 9) AS dev,
           ((n - CAST(sn AS DOUBLE) / k)
            * (n - CAST(sn AS DOUBLE) / k))
           > 4.0 * (CAST(snn AS DOUBLE) / k
                    - (CAST(sn AS DOUBLE) / k)
                      * (CAST(sn AS DOUBLE) / k)) AS is_anomaly
    FROM d, s ORDER BY day
    """,
    tags=("profiling", "anomaly", "dq", "observability"),
    # per-day count + 1-row moment rollup broadcast back — the
    # dq_expectations / table_counts physical family
)
def daily_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection over daily event counts — the
    freshness/volume monitor a data-quality layer runs on every
    ingest: flag days whose count deviates from the corpus mean by
    more than 2σ. All moments derive from INTEGER sums (Σn, Σn²
    over bigint day-counts — exact in any order), so μ and σ² are
    single deterministic double divisions and the 2σ test is written
    in squared form ((n−μ)² > 4σ²) — no sqrt, no library-dependent
    rounding, bit-identical across engines. One groupBy(day), one
    single-row moment rollup joined back as a broadcast scalar."""
    ev = t(spark, sf_dir, "events")
    d = (ev.select(F.to_date("ts").alias("day"))
         .groupBy("day").agg(F.count(F.lit(1)).alias("n")))
    s = d.agg(F.count(F.lit(1)).alias("k"),
              F.sum("n").alias("sn"),
              F.sum(F.col("n") * F.col("n")).alias("snn"))
    mu = F.col("sn").cast("double") / F.col("k")
    var = (F.col("snn").cast("double") / F.col("k")) - mu * mu
    return (d.crossJoin(F.broadcast(s))
            .select(F.col("day").cast("string").alias("day"), "n",
                    F.round(F.col("n") - mu, 9).alias("dev"),
                    (((F.col("n") - mu) * (F.col("n") - mu))
                     > 4.0 * var).alias("is_anomaly"))
            .orderBy("day"))


# Benford expected first-digit shares, log10(1 + 1/d) rounded to 9
# places and embedded as identical literals in BOTH engines (the
# log-free discipline: no runtime transcendental ever crosses the
# oracle boundary).
BENFORD = {1: 0.301029996, 2: 0.176091259, 3: 0.124938737,
           4: 0.096910013, 5: 0.079181246, 6: 0.06694679,
           7: 0.057991947, 8: 0.051152522, 9: 0.045757491}


@query(
    "benford_first_digit",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                           1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    exp AS (
        SELECT * FROM (VALUES
            {', '.join(f'({d}, CAST({p} AS DOUBLE))'
                       for d, p in BENFORD.items())}
        ) AS t(digit, expected_share)
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM digits),
    obs AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt FROM digits
        GROUP BY digit
    )
    SELECT e.digit,
           COALESCE(o.cnt, 0) AS cnt,
           ROUND(CAST(COALESCE(o.cnt, 0) AS DOUBLE) / tot.n, 9)
               AS observed_share,
           e.expected_share,
           ROUND(ABS(CAST(COALESCE(o.cnt, 0) AS DOUBLE) / tot.n
                     - e.expected_share), 9) AS abs_dev
    FROM exp e LEFT JOIN obs o ON o.digit = e.digit
    CROSS JOIN tot
    ORDER BY e.digit
    """,
    tags=("profiling", "benford", "dq"),
    # groupBy on a 9-value key + broadcast scalar — table_counts family
    driver_visible=False,
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals — the
    classic numeric-integrity check (fabricated or truncated amounts
    bend the leading-digit distribution). Expected shares
    log10(1+1/d) are PRECOMPUTED to 9 places and embedded as the same
    literals in both engines, so no runtime log exists anywhere;
    observed shares are integer counts over one 9-value groupBy with
    the total broadcast back. The first digit comes from the integer
    part's decimal rendering — identical string semantics in both
    engines for values ≥ 1."""
    exp = local_df(spark, sorted(BENFORD.items()),
                   "digit int, expected_share double")
    orders = t(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    # floor() explicitly before the BIGINT cast: DuckDB's
    # double::BIGINT ROUNDS while Spark's cast truncates (the
    # verify-trap list) — floor makes both engines truncate
    digits = orders.select(
        F.substring(F.floor(F.col("o_totalprice")).cast("bigint")
                     .cast("string"), 1, 1).cast("int").alias("digit"))
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("cnt"))
    tot = digits.agg(F.count(F.lit(1)).alias("n"))
    share = F.coalesce(F.col("cnt"), F.lit(0)).cast("double") / F.col("n")
    return (exp.join(obs, "digit", "left")
            .crossJoin(F.broadcast(tot))
            .select("digit",
                    F.coalesce("cnt", F.lit(0)).alias("cnt"),
                    F.round(share, 9).alias("observed_share"),
                    "expected_share",
                    F.round(F.abs(share - F.col("expected_share")), 9)
                     .alias("abs_dev"))
            .orderBy("digit"))


WINSOR_LO, WINSOR_HI = 5, 95  # percentile clamp bounds (ordinal, exact)


@query(
    "winsorized_order_values",
    oracle=f"""
    WITH v AS (
        SELECT c.c_mktsegment AS seg, o.o_totalprice AS val,
               o.o_orderkey AS k
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    r AS (
        SELECT seg, val,
               ROW_NUMBER() OVER (PARTITION BY seg
                                  ORDER BY val, k) AS rn,
               COUNT(*) OVER (PARTITION BY seg) AS n
        FROM v
    ),
    b AS (
        SELECT seg, MAX(n) AS n,
               MAX(CASE WHEN rn = ({WINSOR_LO} * n + 99) // 100
                        THEN val END) AS p05,
               MAX(CASE WHEN rn = ({WINSOR_HI} * n + 99) // 100
                        THEN val END) AS p95
        FROM r GROUP BY seg
    )
    SELECT v.seg AS c_mktsegment,
           CAST(MAX(b.n) AS BIGINT) AS n_orders,
           MAX(b.p05) AS p05, MAX(b.p95) AS p95,
           CAST(SUM(CASE WHEN v.val < b.p05 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_low,
           CAST(SUM(CASE WHEN v.val > b.p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_high,
           CAST(SUM(CAST(v.val AS DECIMAL(18,4))) AS DOUBLE) / MAX(b.n)
               AS mean_raw,
           CAST(SUM(CAST(LEAST(GREATEST(v.val, b.p05), b.p95)
                         AS DECIMAL(18,4))) AS DOUBLE) / MAX(b.n)
               AS mean_winsorized
    FROM v JOIN b ON b.seg = v.seg
    GROUP BY v.seg ORDER BY v.seg
    """,
    tags=("profiling", "winsorize", "robust-stats", "two-phase-rank"),
    # the grouped generalization of corpus_vocabulary's two-phase
    # rank; per-key agg + broadcast bounds are driver-visible via
    # price_quantiles / table_counts
    driver_visible=True,  # rotated INTO the driver window r11 (first-time name)
)
def winsorized_order_values(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Winsorization — the robust-stats prep every outlier-sensitive
    aggregate wants: clamp each segment's order values at the EXACT
    ordinal p{WINSOR_LO}/p{WINSOR_HI} elements (rank ceil(p·n/100) by
    integer arithmetic — no interpolation, hash-exact cross-engine)
    and report raw vs winsorized means with clamp counts.

    The scale trap is that "per-segment rank" over FEW segments is a
    handful of corpus-sized ordered windows — one task per segment.
    Ranked with the GROUPED two-phase pattern instead: one
    ``repartitionByRange(seg, val, key)`` (range buckets respect the
    per-segment value order), per-(seg, bucket) counts, per-segment
    bucket offsets through a window over ≤shuffle-partitions subtotal
    rows per segment, and in-bucket row_numbers partitioned by
    (seg, bucket) — every ordered window is bounded regardless of
    segment size. The ranked frame is persisted so rank and offset
    branches share one bucket assignment; the per-segment bounds
    frame is segment-sized and broadcasts back onto the values."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    v = (orders.join(cust, orders.o_custkey == cust.c_custkey)
         .select(F.col("c_mktsegment").alias("seg"),
                 F.col("o_totalprice").alias("val"),
                 F.col("o_orderkey").alias("k")))
    nb = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # r14 (guide §2.4): the in-bucket row_number was a Window
    # partitioned by (seg, pid) — Catalyst cannot see that pid IS the
    # physical partition, so it re-exchanged the full fact a second
    # time. Sort WITHIN the range partitions instead (no exchange) and
    # derive the in-bucket rank arithmetically: rows of one (seg, pid)
    # group are contiguous in the sorted partition, so
    # monotonically_increasing_id() minus the group's min id is the
    # 0-based row_number by (val, k) — identical ranks, zero-exchange.
    ranged = (v.repartitionByRange(nb, "seg", "val", "k")
              .sortWithinPartitions("seg", "val", "k")
              .withColumn("pid", F.spark_partition_id())
              .withColumn("mid", F.monotonically_increasing_id())
              .persist())
    counts = ranged.groupBy("seg", "pid").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min("mid").alias("m0"))
    # bounded-window: buckets:spark.sql.shuffle.partitions — ≤nb
    # subtotal rows per segment, constant in data size
    w_off = (Window.partitionBy("seg").orderBy("pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    off = counts.select(
        "seg", "pid", "m0",
        F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("p_off"))
    nseg = counts.groupBy("seg").agg(F.sum("cnt").alias("n"))
    # off is ≤ |segments|·nb rows — broadcast it explicitly (§3.1)
    # rather than letting the planner sort-merge the fact against it
    ranked = (ranged.join(F.broadcast(off), ["seg", "pid"])
              .join(F.broadcast(nseg), "seg")
              .select("seg", "val",
                      (F.col("p_off") + (F.col("mid") - F.col("m0"))
                       + F.lit(1)).alias("rn"),
                      "n"))
    lo_rn = F.expr(f"({WINSOR_LO} * n + 99) div 100")
    hi_rn = F.expr(f"({WINSOR_HI} * n + 99) div 100")
    b = (ranked.groupBy("seg").agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("rn") == lo_rn, F.col("val"))).alias("p05"),
        F.max(F.when(F.col("rn") == hi_rn, F.col("val"))).alias("p95")))
    clamped = F.least(F.greatest(F.col("val"), F.col("p05")),
                      F.col("p95"))
    return (ranged.join(F.broadcast(b), "seg")
            .groupBy("seg")
            .agg(F.max("n").cast("bigint").alias("n_orders"),
                 F.max("p05").alias("p05"), F.max("p95").alias("p95"),
                 F.sum(F.when(F.col("val") < F.col("p05"), 1)
                       .otherwise(0)).cast("bigint")
                  .alias("n_clamped_low"),
                 F.sum(F.when(F.col("val") > F.col("p95"), 1)
                       .otherwise(0)).cast("bigint")
                  .alias("n_clamped_high"),
                 (F.sum(F.col("val").cast("decimal(18,4)")).cast("double")
                  / F.max("n")).alias("mean_raw"),
                 (F.sum(clamped.cast("decimal(18,4)")).cast("double")
                  / F.max("n")).alias("mean_winsorized"))
            .select(F.col("seg").alias("c_mktsegment"), "n_orders",
                    "p05", "p95", "n_clamped_low", "n_clamped_high",
                    "mean_raw", "mean_winsorized")
            .orderBy("c_mktsegment"))


@query(
    "referential_integrity_audit",
    oracle="""
    SELECT rel, n_fk_rows, n_fk_keys, n_pk_keys, n_orphan_rows,
           n_orphan_keys, n_unreferenced_pk
    FROM (
        SELECT 'orders.o_custkey->customer' AS rel,
               (SELECT COUNT(*) FROM orders) AS n_fk_rows,
               (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_fk_keys,
               (SELECT COUNT(*) FROM customer) AS n_pk_keys,
               (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
                   (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey)) AS n_orphan_rows,
               (SELECT COUNT(DISTINCT o_custkey) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
                   AS n_orphan_keys,
               (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
                   (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey)) AS n_unreferenced_pk
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem),
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
                   (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = l.l_orderkey)),
               (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)),
               (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
                   (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey))
    ) ORDER BY rel
    """,
    tags=("profiling", "dq", "referential-integrity", "anti-join"),
    # anti/semi-join audit counts — the customers_without_orders /
    # document_purge join family, rolled into a fused report
    driver_visible=False,
)
def referential_integrity_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Foreign-key integrity report for the two fact→dim relations —
    the pre-join DQ check that decides whether an inner join silently
    drops rows: per relation, fact rows/keys, dim keys, ORPHAN fact
    rows/keys (fk value missing from the dim) and unreferenced dim
    rows. Each relation costs one distinct-agg scan plus two
    anti-joins on the key (AQE broadcasts the smaller side); the
    1-row-per-relation results union into the report. At 100 TB this
    is the query you run BEFORE switching a left join to inner."""

    def rel(name, fact, fk, dim, pk):
        fkc, pkc = F.col(fk), F.col(pk)
        orphans = fact.join(dim, fkc == pkc, "left_anti")
        unref = dim.join(fact, pkc == fkc, "left_anti")
        return (fact.agg(
            F.count(F.lit(1)).alias("n_fk_rows"),
            F.countDistinct(fk).alias("n_fk_keys"))
            .crossJoin(F.broadcast(
                dim.agg(F.count(F.lit(1)).alias("n_pk_keys"))))
            .crossJoin(F.broadcast(orphans.agg(
                F.count(F.lit(1)).alias("n_orphan_rows"),
                F.countDistinct(fk).alias("n_orphan_keys"))))
            .crossJoin(F.broadcast(unref.agg(
                F.count(F.lit(1)).alias("n_unreferenced_pk"))))
            .select(F.lit(name).alias("rel"), "n_fk_rows", "n_fk_keys",
                    "n_pk_keys", "n_orphan_rows", "n_orphan_keys",
                    "n_unreferenced_pk"))

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    li = t(spark, sf_dir, "lineitem")
    return (rel("orders.o_custkey->customer", orders, "o_custkey",
                cust, "c_custkey")
            .unionByName(rel("lineitem.l_orderkey->orders", li,
                             "l_orderkey", orders, "o_orderkey"))
            .orderBy("rel"))


NTILE_K = 10  # decile report


@query(
    "customer_balance_deciles",
    oracle=f"""
    WITH r AS (
        SELECT c_acctbal,
               NTILE({NTILE_K}) OVER (ORDER BY c_acctbal, c_custkey)
                   AS decile
        FROM customer
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS avg_bal
    FROM r GROUP BY decile ORDER BY decile
    """,
    tags=("profiling", "ntile", "deciles", "two-phase-rank"),
    # rotated INTO the driver window r9 (two-phase-rank witness after
    # price_quantiles rotated out); the oracle uses native NTILE, the
    # Spark side proves the rank-arithmetic equivalence at scale
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: winsorized_order_values
    driver_visible=False,
)
def customer_balance_deciles(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Account-balance decile report — NTILE({NTILE_K}) without the
    global-window funnel: the oracle uses DuckDB's native NTILE; the
    Spark side derives the IDENTICAL bucket from the two-phase
    range-partitioned global rank (corpus_vocabulary pattern) and the
    ANSI assignment rule in integer arithmetic — the first n mod k
    buckets take ceil(n/k) rows, the rest floor(n/k):
    rn ≤ m·(s+1) → bucket (rn−1) div (s+1) + 1, else
    m + (rn − m·(s+1) − 1) div s + 1, with s = n div k, m = n mod k.
    Exactness of that formula vs the native window IS the test. One
    range shuffle + bounded subtotal window + a {NTILE_K}-group
    rollup."""
    cust = t(spark, sf_dir, "customer")
    v = cust.select(F.col("c_acctbal").alias("val"),
                    F.col("c_custkey").alias("k"))
    nb = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (v.repartitionByRange(nb, "val", "k")
              .withColumn("pid", F.spark_partition_id())
              .persist())
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    # bounded-window: buckets:spark.sql.shuffle.partitions — one
    # subtotal row per range bucket
    w_off = (Window.orderBy("pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    off = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("p_off"))
    tot = counts.agg(F.sum("cnt").cast("bigint").alias("n"))
    w_in = Window.partitionBy("pid").orderBy("val", "k")
    ranked = (ranged.withColumn("r_in", F.row_number().over(w_in))
              .join(off, "pid")
              .crossJoin(F.broadcast(tot))
              .select("val", (F.col("p_off") + F.col("r_in")).alias("rn"),
                      "n"))
    k = NTILE_K
    decile = F.expr(
        f"CAST(IF(rn <= (n % {k}) * (n div {k} + 1), "
        f"(rn - 1) div (n div {k} + 1), "
        f"(n % {k}) + (rn - (n % {k}) * (n div {k} + 1) - 1) "
        f"div (n div {k})) + 1 AS INT)")
    return (ranked.withColumn("decile", decile)
            .groupBy("decile")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.min("val").alias("min_bal"),
                 F.max("val").alias("max_bal"),
                 (F.sum(F.col("val").cast("decimal(18,4)")).cast("double")
                  / F.count(F.lit(1))).alias("avg_bal"))
            .orderBy("decile"))


@query(
    "orders_price_drift_psi",
    oracle="""
    WITH b AS (SELECT unnest(generate_series(0, 9)) AS bin),
    counts AS (
        SELECT CAST(LEAST(FLOOR(o_totalprice / 50000), 9) AS INT) AS bin,
               SUM(CASE WHEN year(o_orderdate) < 1998
                        THEN 1 ELSE 0 END) AS ref_n,
               SUM(CASE WHEN year(o_orderdate) >= 1998
                        THEN 1 ELSE 0 END) AS cur_n
        FROM orders GROUP BY 1
    ),
    j AS (
        SELECT b.bin,
               CAST(COALESCE(ref_n, 0) AS BIGINT) AS ref_n,
               CAST(COALESCE(cur_n, 0) AS BIGINT) AS cur_n
        FROM b LEFT JOIN counts USING (bin)
    ),
    tot AS (SELECT SUM(ref_n) AS ref_tot, SUM(cur_n) AS cur_tot FROM j)
    SELECT bin, ref_n, cur_n,
           ROUND(CAST(ref_n + 1 AS DOUBLE)
                 / CAST(ref_tot + 10 AS DOUBLE), 9) AS ref_share,
           ROUND(CAST(cur_n + 1 AS DOUBLE)
                 / CAST(cur_tot + 10 AS DOUBLE), 9) AS cur_share,
           ROUND((CAST(cur_n + 1 AS DOUBLE)
                      / CAST(cur_tot + 10 AS DOUBLE)
                  - CAST(ref_n + 1 AS DOUBLE)
                      / CAST(ref_tot + 10 AS DOUBLE))
                 * ln((CAST(cur_n + 1 AS DOUBLE)
                           / CAST(cur_tot + 10 AS DOUBLE))
                      / (CAST(ref_n + 1 AS DOUBLE)
                             / CAST(ref_tot + 10 AS DOUBLE))), 9)
               AS psi_term
    FROM j CROSS JOIN tot
    ORDER BY bin
    """,
    tags=("profiling", "drift", "quality"),
    driver_visible=False,  # rotated out r13 7th wave (green r12)
)
def orders_price_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two corpus states — THE
    standard production drift monitor (scorecard/model monitoring
    literature; PSI < 0.1 stable, 0.1–0.25 shifting, > 0.25 drifted):
    bin a metric into fixed buckets, compare the reference period's
    share per bucket against the current period's, PSI = Σ (cur −
    ref) · ln(cur/ref). Here: o_totalprice in ten fixed 50k-wide
    buckets, reference = orders before 1998, current = 1998 onward.
    Laplace-smoothed shares ((n+1)/(N+bins)) keep every term finite
    on empty buckets — deterministic, no epsilon tuning. Fixed-width
    buckets rather than reference quantiles keep the operator ONE
    exact aggregation per side at any scale (quantile binning needs a
    corpus sort or an approx sketch; swap in approx_percentile bins
    when the metric's range is unknown). Plan: one scan, one groupBy
    on the bin key, a 10-row broadcast of totals — drift monitoring
    costs one aggregate pass however large the table. Total PSI is
    the sum of the ten per-bin terms (left to the consumer so every
    emitted value is an exact per-bin fact)."""
    o = t(spark, sf_dir, "orders")
    agg = (o.groupBy(F.least(F.floor(F.col("o_totalprice") / 50000),
                             F.lit(9)).cast("int").alias("bin"))
           .agg(F.sum(F.when(F.year("o_orderdate") < 1998, 1)
                      .otherwise(0)).alias("ref_n"),
                F.sum(F.when(F.year("o_orderdate") >= 1998, 1)
                      .otherwise(0)).alias("cur_n")))
    bins = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    # j is ≤ 10 rows but feeds BOTH the totals aggregate and the final
    # projection — persist it so the corpus scan behind it runs ONCE
    # (without this the plan reads orders twice; control-plane-sized
    # cache, the minhash per-doc pattern)
    j = (bins.join(agg, "bin", "left")
         .select("bin",
                 F.coalesce("ref_n", F.lit(0)).cast("bigint")
                  .alias("ref_n"),
                 F.coalesce("cur_n", F.lit(0)).cast("bigint")
                  .alias("cur_n"))
         .persist())
    tot = j.agg(F.sum("ref_n").alias("ref_tot"),
                F.sum("cur_n").alias("cur_tot"))
    ref_share = ((F.col("ref_n") + 1).cast("double")
                 / (F.col("ref_tot") + 10).cast("double"))
    cur_share = ((F.col("cur_n") + 1).cast("double")
                 / (F.col("cur_tot") + 10).cast("double"))
    return (j.crossJoin(F.broadcast(tot))
            .select("bin", "ref_n", "cur_n",
                    F.round(ref_share, 9).alias("ref_share"),
                    F.round(cur_share, 9).alias("cur_share"),
                    F.round((cur_share - ref_share)
                            * F.log(cur_share / ref_share), 9)
                     .alias("psi_term"))
            .orderBy("bin"))
