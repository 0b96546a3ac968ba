"""Second advanced batch: IVF coarse-quantization ANN, TF-IDF term
weighting, and the classic multi-way star join (TPC-H Q5 shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jcf_nb_migration_spark.functions import text as T
from jcf_nb_migration_spark.localrel import local_df
from jcf_nb_migration_spark.functions.similarity import (
    cosine, ivf_ann_probe, ivf_assign, ivf_probe_clusters, kmeans_train,
)
from jcf_nb_migration_spark.queries.similarity_search import (
    _SQL_IVF_ASSIGNED, _sql_cos, _sql_kmeans_cte)
from jcf_nb_migration_spark.queries.text_analysis import _SQL_TOKS
from jcf_nb_migration_spark.registry import query, spread, t

_SQL_REV = ("CAST(l_extendedprice AS DECIMAL(18,4))"
            " * (1 - CAST(l_discount AS DECIMAL(18,4)))")

# Deterministic-training memo: kmeans_train / pq_train are seeded and
# decimal-exact, so their output is a pure function of (fixture dir,
# hyperparams) — six registered queries retrain the same models per
# session otherwise (2 driver-side Lloyd collects each). Keyed by
# sf_dir: a regenerated fixture mid-session would need a new process,
# which is how the driver and pytest both run.
_TRAIN_CACHE: dict = {}


def cached_kmeans(emb, sf_dir: str, k: int = 8, iters: int = 2):
    key = ("kmeans", sf_dir, k, iters)
    if key not in _TRAIN_CACHE:
        _TRAIN_CACHE[key] = kmeans_train(emb, k=k, iters=iters)
    return _TRAIN_CACHE[key]


def cached_pq_books(emb, sf_dir: str, m: int, k: int, iters: int):
    from jcf_nb_migration_spark.functions.similarity import pq_train

    key = ("pq", sf_dir, m, k, iters)
    if key not in _TRAIN_CACHE:
        _TRAIN_CACHE[key] = pq_train(emb, m=m, k=k, iters=iters)
    return _TRAIN_CACHE[key]


# _sql_kmeans_cte / _SQL_IVF_ASSIGNED moved to
# queries.similarity_search (residual-PQ oracle composes them there);
# re-imported above for this module's oracles and curation_ops.


@query(
    "ivf_ann_probe",
    oracle=f"""
    WITH {_SQL_IVF_ASSIGNED},
    probe AS (
        SELECT embedding AS pvec, cluster AS pcluster
        FROM assigned WHERE vec_id = 0
    )
    SELECT a.vec_id AS neighbor_id, a.cluster,
           {_sql_cos('a.embedding', 'probe.pvec')} AS cos_sim
    FROM assigned a, probe
    WHERE a.cluster = probe.pcluster AND a.vec_id <> 0
    ORDER BY cos_sim DESC, neighbor_id
    LIMIT 10
    """,
    tags=("similarity", "ann", "ivf"),
    # single-probe baseline of the multiprobe variant (curation rule 3)
    driver_visible=False,
)
def ivf_ann_probe_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (nprobe=1) with TRAINED centroids: 2 deterministic
    Lloyd rounds from the 8 lowest-id seeds (decimal-exact means, so
    the oracle replays training bit-identically), then the probe ranks
    only its own cluster. Assignment is the narrow argmax pass — no
    crossJoin fan-out, no window shuffle; the cluster column is the
    partition key the corpus would be written by at scale."""
    emb = spread(t(spark, sf_dir, "embeddings"))
    centroids = cached_kmeans(emb, sf_dir)
    return ivf_ann_probe(emb, centroids, probe_id=0, k=10)


@query(
    "ivf_ann_multiprobe",
    oracle=f"""
    WITH {_SQL_IVF_ASSIGNED},
    pv AS (SELECT embedding AS pvec FROM embeddings WHERE vec_id = 0),
    pclusters AS (
        SELECT c_id AS cluster FROM (
            SELECT c.c_id, ROW_NUMBER() OVER (
                ORDER BY {_sql_cos('pv.pvec', 'c.c_vec')} DESC, c.c_id
            ) AS rn
            FROM pv, c2 c
        ) WHERE rn <= 2
    )
    SELECT a.vec_id AS neighbor_id, a.cluster,
           {_sql_cos('a.embedding', 'pv.pvec')} AS cos_sim
    FROM assigned a JOIN pclusters USING (cluster), pv
    WHERE a.vec_id <> 0
    ORDER BY cos_sim DESC, neighbor_id
    LIMIT 10
    """,
    tags=("similarity", "ann", "ivf", "multiprobe"),
    # Demoted from the 50-name driver window in r5: the nprobe=2
    # shortlist + cluster equi-join shape is now driver-visible via
    # the strictly harder compositions knn_ann_label_propagation and
    # hard_negative_mining_ann (whole probe BATCH through the same
    # index), plus ivfpq_ann_probe — curation rule 3.
    driver_visible=False,
)
def ivf_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN (nprobe=2, trained centroids): the probe
    ranks its TWO nearest clusters, recovering neighbors that fall
    just across the nearest cluster's boundary — the standard recall
    fix for coarse quantization. Candidates still come from an
    equi-join on cluster (partition-prunable), never a corpus scan."""
    emb = spread(t(spark, sf_dir, "embeddings"))
    centroids = cached_kmeans(emb, sf_dir)
    return ivf_ann_probe(emb, centroids, probe_id=0, k=10, nprobe=2)


_SQL_PROBE_CLUSTERS = f"""probes AS (
        SELECT vec_id AS probe_id, embedding AS pvec, label AS true_label
        FROM embeddings WHERE vec_id < 10
    ),
    pcl AS (
        SELECT probe_id, pvec, true_label, c_id AS cluster FROM (
            SELECT p.probe_id, p.pvec, p.true_label, c.c_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.probe_id
                       ORDER BY {_sql_cos('p.pvec', 'c.c_vec')} DESC,
                                c.c_id) AS rn
            FROM probes p, c2 c
        ) WHERE rn <= 2
    ),
    cand AS (
        SELECT pc.probe_id, pc.true_label, e.label, a.vec_id AS neighbor_id,
               {_sql_cos('a.embedding', 'pc.pvec')} AS cos_sim
        FROM assigned a
        JOIN pcl pc USING (cluster)
        JOIN embeddings e ON e.vec_id = a.vec_id
        WHERE a.vec_id >= 10
    )"""


def _ann_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared candidate generator for the ANN-composed queries below:
    IVF-assign the corpus, shortlist nprobe=2 clusters per seed probe
    (vec_id < 10), and take candidates from a broadcast equi-join on
    cluster — at 100 TB, with the corpus partitioned by cluster
    (io/layout.py), this reads only the probed clusters' files instead
    of scanning the corpus per probe batch. Columns: probe_id,
    true_label, label, neighbor_id, cos_sim."""
    emb = spread(t(spark, sf_dir, "embeddings"))
    centroids = cached_kmeans(emb, sf_dir)
    assigned = ivf_assign(emb, centroids, extra_cols=("label",))
    probes = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("pvec"),
        F.col("label").alias("true_label"))
    pcl = ivf_probe_clusters(probes, centroids, vec_col="pvec", nprobe=2)
    return (assigned.join(F.broadcast(pcl), "cluster")
            .where(F.col("vec_id") >= 10)
            .select("probe_id", "true_label", "label",
                    F.col("vec_id").alias("neighbor_id"),
                    cosine(F.col("embedding"), F.col("pvec"))
                    .alias("cos_sim")))


@query(
    "knn_ann_label_propagation",
    oracle=f"""
    WITH {_SQL_IVF_ASSIGNED},
    {_SQL_PROBE_CLUSTERS},
    topk AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY probe_id
                ORDER BY cos_sim DESC, neighbor_id) AS rn
            FROM cand
        ) WHERE rn <= 15
    ),
    vts AS (
        SELECT probe_id, true_label, label AS pred_label,
               COUNT(*) AS votes
        FROM topk GROUP BY probe_id, true_label, label
    )
    SELECT probe_id, true_label, pred_label, votes FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY probe_id
            ORDER BY votes DESC, pred_label) AS rk
        FROM vts
    ) WHERE rk = 1
    ORDER BY probe_id
    """,
    tags=("similarity", "knn", "ann", "composed"),
    # rotated OUT of the driver window r10 (green in 5 driver
    # rounds); pattern twin: hard_negative_mining_ann
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def knn_ann_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label propagation fed by the IVF ANN index instead of a
    corpus scan: candidates for ALL seed probes come from ONE equi-join
    between the cluster-assigned corpus and each probe's nprobe=2
    cluster shortlist, then the same 15-NN majority vote as
    knn_label_propagation (the exact-recall baseline this is tested
    against in tests/test_ann.py). This is the composition the exact
    query's docstring promises at 100 TB: probe batches touch only
    their clusters' partitions, never the whole corpus."""
    cand = _ann_candidates(spark, sf_dir)
    w_near = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), "neighbor_id")
    topk = (cand.withColumn("rn", F.row_number().over(w_near))
            .where(F.col("rn") <= 15))
    vts = topk.groupBy("probe_id", "true_label",
                       F.col("label").alias("pred_label")).agg(
        F.count(F.lit(1)).alias("votes"))
    w_vote = Window.partitionBy("probe_id").orderBy(
        F.desc("votes"), "pred_label")
    return (vts.withColumn("rk", F.row_number().over(w_vote))
            .where(F.col("rk") == 1)
            .select("probe_id", "true_label", "pred_label", "votes")
            .orderBy("probe_id"))


@query(
    "hard_negative_mining_ann",
    oracle=f"""
    WITH {_SQL_IVF_ASSIGNED},
    {_SQL_PROBE_CLUSTERS}
    SELECT probe_id, neighbor_id, neighbor_label, cos_sim,
           CAST(rn AS INT) AS rank
    FROM (
        SELECT probe_id, neighbor_id, label AS neighbor_label, cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY probe_id
                   ORDER BY cos_sim DESC, neighbor_id) AS rn
        FROM cand WHERE label <> true_label
    ) WHERE rn <= 5
    ORDER BY probe_id, rank
    """,
    tags=("similarity", "contrastive", "mining", "ann", "composed"),
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def hard_negative_mining_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining fed by the IVF ANN index: the 5 most
    similar WRONG-label candidates per probe, drawn from the probe's
    nprobe=2 clusters via one broadcast equi-join — the near-misses an
    ANN index surfaces are exactly the hard negatives contrastive
    training wants, so the index IS the miner at scale. Exact-scan
    twin: hard_negative_mining (similarity_search.py); overlap
    asserted in tests/test_ann.py."""
    cand = _ann_candidates(spark, sf_dir)
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), "neighbor_id")
    return (cand.where(F.col("label") != F.col("true_label"))
            .select("probe_id", "neighbor_id",
                    F.col("label").alias("neighbor_label"), "cos_sim")
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= 5)
            .orderBy("probe_id", "rank"))


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), dfreq AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf, df, score FROM (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df DESC,
                            tf.term) AS rn
        FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
    ) WHERE rn <= 3
    """,
    tags=("text", "tfidf", "topk-per-group"),
    # rotated OUT r9 (7x green); term-keyed rollup twin now
    # inverted_index_postings (rotated IN)
    driver_visible=False,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style term weighting (rarity weight N/df — log-free so
    the score is exactly reproducible across engines), top-3 terms per
    document. The document-frequency table is one row per DISTINCT
    term — heavy-tailed and unbounded at corpus scale (typos, ids,
    hashes), so it carries NO broadcast hint: AQE broadcasts it while
    it's small and falls back to a shuffle join when it isn't (a forced
    broadcast would hit the 8 GB hard limit at 100 TB). A real pipeline
    would also min_df-threshold the vocabulary before the join; the
    oracle keeps every term, so the threshold stays out of this query."""
    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id",
                       F.explode(T.tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = (
        tf.join(dfreq, "term")
        .withColumn("score",
                    (F.col("tf") * F.lit(n_docs)).cast("double")
                    / F.col("df"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


@query(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    headline=True,
    tags=("join", "multiway", "tpch-q5"),
    driver_visible=False,  # rotated out r10 4th wave (green r1-r9,
    #   still bench-measured); multiway broadcast-dim star join stays
    #   visible via nation_trade_volume
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table star join where customer and supplier
    nations must match. All dimensions broadcast; the fact table
    shuffles once for the orders join, and the nation-equality is a
    residual on the broadcast supplier join."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1).cast("decimal(18,4)")
              - F.col("l_discount").cast("decimal(18,4)")))
    # Only the bounded dims (nation: 25 rows, region: 5) carry explicit
    # broadcast hints. customer/supplier grow with scale factor — a
    # forced broadcast would hit the 8 GB hard limit at the 100 TB
    # target; AQE converts them to broadcast at runtime while they're
    # small and falls back to shuffle join when they aren't.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey)
              & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "EUROPE")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.desc("revenue"), "nation")
    )


@query(
    "shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 20
    """,
    headline=True,
    tags=("join", "topk", "tpch-q3"),
    # rotated OUT r9 (7x green); filtered-join + top-k twin:
    # returned_item_report (+ excess_share_suppliers' distributed take)
    driver_visible=False,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customer dimension broadcast
    into an orders⋈lineitem join with date predicates on both fact
    sides, top-20 unshipped orders by revenue."""
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1).cast("decimal(18,4)")
              - F.col("l_discount").cast("decimal(18,4)")))
    cust = (t(spark, sf_dir, "customer")
            .where(F.col("c_mktsegment") == "BUILDING"))
    orders = (t(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")))
    li = (t(spark, sf_dir, "lineitem")
          .where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(20)
    )


@query(
    "returned_item_report",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    headline=True,
    tags=("join", "topk", "tpch-q10"),
    driver_visible=False,  # rotated out r10 4th wave (green r1-r9,
    #   still bench-measured); join + agg + global top-k stays
    #   visible via top_revenue_customers
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned items in a quarter,
    ranked by lost revenue — four-table join, dims broadcast."""
    rev = (F.col("l_extendedprice").cast("decimal(18,4)")
           * (F.lit(1).cast("decimal(18,4)")
              - F.col("l_discount").cast("decimal(18,4)")))
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    orders = (t(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                     & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))))
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    # nation (25 rows) keeps its hint; customer is SF-proportional, so
    # its join strategy is left to AQE (broadcast while small, shuffle
    # at scale — never a forced multi-GB broadcast).
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def _sql_ivfpq_oracle() -> str:
    from jcf_nb_migration_spark.queries.similarity_search import (
        _PQ_SD, PQ_ITERS, PQ_M, _sql_kmeans_l2_cte, _sql_sqdist)

    chains, encs, dists, joins = [], [], [], []
    for s in range(PQ_M):
        pfx = f"s{s}_"
        lo = s * _PQ_SD + 1
        chains.append(_sql_kmeans_l2_cte(pfx, lo, _PQ_SD))
        encs.append(f"""{pfx}enc AS (
        SELECT vec_id, c_id AS code_{s} FROM (
            SELECT e.vec_id, c.c_id, ROW_NUMBER() OVER (
                PARTITION BY e.vec_id
                ORDER BY {_sql_sqdist('e.v', 'c.c_vec')}, c_id) AS rn
            FROM {pfx}sub e, {pfx}c{PQ_ITERS} c
        ) WHERE rn = 1
    )""")
        dists.append(f"""ds{s} AS (
        SELECT e.vec_id, {_sql_sqdist('p.v', 'c.c_vec')} AS d
        FROM {pfx}enc e
        JOIN {pfx}c{PQ_ITERS} c ON c.c_id = e.code_{s}
        CROSS JOIN (SELECT v FROM {pfx}sub WHERE vec_id = 0) p
    )""")
        joins.append(f"JOIN ds{s} USING (vec_id)")
    body = ",\n    ".join([_SQL_IVF_ASSIGNED] + chains + encs + dists)
    return f"""
    WITH {body},
    probe AS (
        SELECT embedding AS pvec, cluster AS pcluster
        FROM assigned WHERE vec_id = 0
    )
    SELECT a.vec_id AS neighbor_id, a.cluster,
           ROUND(((ds0.d + ds1.d) + ds2.d) + ds3.d, 9) AS adc,
           {_sql_cos('a.embedding', 'probe.pvec')} AS cos_exact
    FROM assigned a {' '.join(joins)} CROSS JOIN probe
    WHERE a.cluster = probe.pcluster AND a.vec_id <> 0
    ORDER BY adc, neighbor_id
    LIMIT 10
    """


@query(
    "ivfpq_ann_probe",
    oracle=_sql_ivfpq_oracle(),
    tags=("similarity", "ann", "ivf", "pq", "adc"),
    # driver-visible: the composed IVF-PQ read path (replaced
    # ann_lsh_multiprobe in r4 — harder shape, criterion 3)
    # rotated OUT of the driver window r10 (green in 6 driver
    # rounds); pattern twin: ivfadc_residual_multiprobe
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def ivfpq_ann_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ, the composed FAISS read path: trained coarse quantizer
    (cosine k-means, bit-exact oracle replay) routes the probe to one
    cluster; candidates in that cluster are scored by ASYMMETRIC
    DISTANCE — probe subvector vs the candidate's PQ codeword, an
    element_at into a per-subspace distance table — instead of their
    raw vectors; exact cosine rides along for re-ranking. At scale the
    cluster is a partition (pruned read), the code table is m
    bytes-ish per vector (the only thing the ADC scan touches), and
    the distance tables are m·k codegen'd literals. Every stage —
    coarse training, codebooks, encoding, ADC — is replayed
    bit-identically by the oracle."""
    from jcf_nb_migration_spark.functions.similarity import (
        ivfpq_ann_probe as _ivfpq)
    from jcf_nb_migration_spark.queries.similarity_search import (
        PQ_ITERS, PQ_K, PQ_M)

    emb = t(spark, sf_dir, "embeddings")
    centroids = cached_kmeans(emb, sf_dir)
    books = cached_pq_books(emb, sf_dir, PQ_M, PQ_K, PQ_ITERS)
    return _ivfpq(emb, centroids, books, probe_id=0, k=10)


@query(
    "triplet_mining_ann",
    oracle=f"""
    WITH {_SQL_IVF_ASSIGNED},
    {_SQL_PROBE_CLUSTERS},
    pos AS (
        SELECT probe_id, neighbor_id AS positive_id, cos_sim AS pos_cos
        FROM (
            SELECT probe_id, neighbor_id, cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY probe_id
                       ORDER BY cos_sim DESC, neighbor_id) AS rn
            FROM cand WHERE label = true_label
        ) WHERE rn = 1
    ),
    neg AS (
        SELECT probe_id, neighbor_id AS negative_id, cos_sim AS neg_cos
        FROM (
            SELECT probe_id, neighbor_id, cos_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY probe_id
                       ORDER BY cos_sim DESC, neighbor_id) AS rn
            FROM cand WHERE label <> true_label
        ) WHERE rn = 1
    )
    SELECT p.probe_id, p.positive_id, n.negative_id,
           p.pos_cos, n.neg_cos, p.pos_cos - n.neg_cos AS margin
    FROM pos p JOIN neg n USING (probe_id)
    ORDER BY p.probe_id
    """,
    tags=("similarity", "contrastive", "triplet", "ann", "composed"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def triplet_mining_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-triplet assembly from the ANN index: for each seed
    probe, its hardest POSITIVE (most similar same-label candidate)
    and hardest NEGATIVE (most similar wrong-label candidate) from
    the nprobe=2 cluster shortlist, plus the triplet margin
    (pos_cos − neg_cos) a contrastive loss would see. One broadcast
    equi-join produces candidates for the whole probe batch; both
    rankings are per-probe windows over that one candidate set — the
    miner never rescans the corpus. Probes whose shortlist lacks a
    same-label or wrong-label candidate drop out (inner join) —
    deterministic, and exactly what a margin-based sampler does with
    unusable anchors."""
    cand = _ann_candidates(spark, sf_dir)
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("cos_sim"), "neighbor_id")
    pos = (cand.where(F.col("label") == F.col("true_label"))
           .withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == 1)
           .select("probe_id",
                   F.col("neighbor_id").alias("positive_id"),
                   F.col("cos_sim").alias("pos_cos")))
    neg = (cand.where(F.col("label") != F.col("true_label"))
           .withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == 1)
           .select("probe_id",
                   F.col("neighbor_id").alias("negative_id"),
                   F.col("cos_sim").alias("neg_cos")))
    return (pos.join(neg, "probe_id")
            .select("probe_id", "positive_id", "negative_id",
                    "pos_cos", "neg_cos",
                    (F.col("pos_cos") - F.col("neg_cos")).alias("margin"))
            .orderBy("probe_id"))


ASSOC_MIN_SUPPORT = 5  # minimum co-occurrence count for a rule


@query(
    "association_rules_pairs",
    oracle=f"""
    WITH tx AS (
        SELECT DISTINCT l.l_orderkey AS o, p.p_type AS item
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    n AS (SELECT COUNT(DISTINCT o) AS n_tx FROM tx),
    ic AS (SELECT item, COUNT(*) AS cnt FROM tx GROUP BY item),
    pc AS (
        SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_cnt
        FROM tx a JOIN tx b ON b.o = a.o AND a.item < b.item
        GROUP BY 1, 2
        HAVING COUNT(*) >= {ASSOC_MIN_SUPPORT}
    )
    SELECT p.item_a, p.item_b,
           CAST(p.pair_cnt AS BIGINT) AS pair_cnt,
           ROUND(CAST(p.pair_cnt AS DOUBLE) / n.n_tx, 9) AS support,
           ROUND(CAST(p.pair_cnt AS DOUBLE) / ia.cnt, 9)
               AS confidence_a_to_b,
           ROUND(CAST(p.pair_cnt AS DOUBLE) * n.n_tx
                 / (ia.cnt * ib.cnt), 9) AS lift
    FROM pc p
    JOIN ic ia ON ia.item = p.item_a
    JOIN ic ib ON ib.item = p.item_b
    CROSS JOIN n
    ORDER BY lift DESC, item_a, item_b
    """,
    tags=("analytics", "market-basket", "association-rules", "lift"),
    # transaction self-equi-join on the basket key + broadcast item
    # stats — the linkgraph pair-derivation family over orders
    driver_visible=False,  # rotated out r13 7th wave (green r11-r12, 2x)
)
def association_rules_pairs(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Market-basket association rules, pair order (the Apriori k=2
    step): which part TYPES co-occur in the same order more than
    chance — support, directional confidence, and lift per pair over
    a {ASSOC_MIN_SUPPORT}-transaction support floor.

    Scale shape: the transaction table (order, item) self-equi-joins
    on the ORDER key, so candidate fan-out is Σ basket_size² —
    bounded by the basket, never the catalog (the rare-gram pair
    derivation's argument applied to orders; a runaway basket would
    be capped exactly like gram frequency). Item stats and the
    transaction count are tiny 1-row/|items|-row aggregates broadcast
    back; everything downstream of the pair counts is
    dimension-sized. All ratios are single double divisions of exact
    integer counts, rounded at 9 — bit-stable cross-engine."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    tx = (li.join(part, li.l_partkey == part.p_partkey)
          .select(F.col("l_orderkey").alias("o"),
                  F.col("p_type").alias("item"))
          .distinct()
          .persist())
    n = tx.agg(F.countDistinct("o").alias("n_tx"))
    ic = tx.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    a = tx.alias("a")
    b = tx.alias("b")
    pc = (a.join(b, (F.col("b.o") == F.col("a.o"))
                 & (F.col("a.item") < F.col("b.item")))
          .groupBy(F.col("a.item").alias("item_a"),
                   F.col("b.item").alias("item_b"))
          .agg(F.count(F.lit(1)).alias("pair_cnt"))
          .where(F.col("pair_cnt") >= ASSOC_MIN_SUPPORT))
    ia = ic.select(F.col("item").alias("item_a"),
                   F.col("cnt").alias("cnt_a"))
    ib = ic.select(F.col("item").alias("item_b"),
                   F.col("cnt").alias("cnt_b"))
    return (pc.join(F.broadcast(ia), "item_a")
            .join(F.broadcast(ib), "item_b")
            .crossJoin(F.broadcast(n))
            .select("item_a", "item_b",
                    F.col("pair_cnt").cast("bigint").alias("pair_cnt"),
                    F.round(F.col("pair_cnt").cast("double")
                            / F.col("n_tx"), 9).alias("support"),
                    F.round(F.col("pair_cnt").cast("double")
                            / F.col("cnt_a"), 9)
                     .alias("confidence_a_to_b"),
                    F.round(F.col("pair_cnt").cast("double")
                            * F.col("n_tx")
                            / (F.col("cnt_a") * F.col("cnt_b")), 9)
                     .alias("lift"))
            .orderBy(F.desc("lift"), "item_a", "item_b"))


_ANN_SNAP_PCLUSTERS = f"""pv AS (
        SELECT embedding AS pvec FROM embeddings WHERE vec_id = 0
    ),
    pclusters AS (
        SELECT c_id AS cluster FROM (
            SELECT c.c_id, ROW_NUMBER() OVER (
                ORDER BY {_sql_cos('pv.pvec', 'c.c_vec')} DESC, c.c_id
            ) AS rn
            FROM pv, c2 c
        ) WHERE rn <= 2
    )"""


@query(
    "ann_snapshot_probe",
    oracle=f"""
    SELECT * FROM (
        SELECT 'post_vacuum' AS state, neighbor_id, cluster, cos_sim
        FROM (
            WITH {_SQL_IVF_ASSIGNED},
            {_ANN_SNAP_PCLUSTERS}
            SELECT a.vec_id AS neighbor_id, a.cluster,
                   {_sql_cos('a.embedding', 'pv.pvec')} AS cos_sim
            FROM assigned a JOIN pclusters USING (cluster), pv
            WHERE a.vec_id <> 0 AND a.vec_id % 7 <> 3
            ORDER BY cos_sim DESC, neighbor_id LIMIT 10
        )
        UNION ALL
        SELECT 'restored' AS state, neighbor_id, cluster, cos_sim
        FROM (
            WITH {_SQL_IVF_ASSIGNED},
            {_ANN_SNAP_PCLUSTERS}
            SELECT a.vec_id AS neighbor_id, a.cluster,
                   {_sql_cos('a.embedding', 'pv.pvec')} AS cos_sim
            FROM assigned a JOIN pclusters USING (cluster), pv
            WHERE a.vec_id <> 0
            ORDER BY cos_sim DESC, neighbor_id LIMIT 10
        )
    )
    ORDER BY state, cos_sim DESC, neighbor_id
    """,
    tags=("similarity", "ann", "ivf", "serving", "snapshot",
          "time-travel", "tombstone"),
    driver_visible=False,  # rotated out r13 7th wave (green r12)
)
def ann_snapshot_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit points on the MATERIALIZED vector index (io/layout.py
    snapshot section — the lexical bm25_snapshot_served's twin on the
    IVF layout): build the cluster-partitioned index, snapshot it
    (capturing the centroids the commit point is probe-able with),
    run the destructive pair (delete every vec_id ≡ 3 mod 7, vacuum —
    a touched-cluster COW rewrite that retires superseded files to
    ``_history``), probe the post-vacuum state, RESTORE the commit
    point, and probe again. The restored probe must rank exactly the
    full corpus the snapshot saw. The oracle replays the
    bit-exact k-means (deterministic Lloyd in DECIMAL) and states both
    states' nprobe=2 shortlist probes from the base table. The first
    probe's rows are collected k-bounded by construction (the second
    probe must not lazily read files the restore displaces)."""
    import hashlib
    import os
    import tempfile

    from jcf_nb_migration_spark.io.layout import (
        ivf_index_delete, ivf_index_probe, ivf_index_restore,
        ivf_index_snapshot, ivf_index_vacuum, ivf_index_write)

    emb = spread(t(spark, sf_dir, "embeddings"))
    centroids = cached_kmeans(emb, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), "jcf_ivf_snap",
                        spark.sparkContext.applicationId, tag)
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    ivf_index_write(emb, centroids, path)
    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])
    sid = ivf_index_snapshot(spark, path, centroids=centroids,
                             note="pre-maintenance")
    del_ids = [r["vec_id"] for r in
               emb.where(F.col("vec_id") % 7 == 3)
               .select("vec_id").collect()]
    ivf_index_delete(spark, path, del_ids)
    ivf_index_vacuum(spark, path)
    live_rows = [(r["neighbor_id"], r["cluster"], r["cos_sim"])
                 for r in ivf_index_probe(spark, path, centroids, pvec,
                                          k=10, nprobe=2,
                                          exclude_id=0).collect()]
    live = (local_df(
        spark, live_rows, "neighbor_id bigint, cluster int, cos_sim double")
        .select(F.lit("post_vacuum").alias("state"), "*"))
    ivf_index_restore(spark, path, sid)
    restored = (ivf_index_probe(spark, path, centroids, pvec,
                                k=10, nprobe=2, exclude_id=0)
                .select(F.lit("restored").alias("state"), "neighbor_id",
                        "cluster", "cos_sim"))
    return (live.unionByName(restored)
            .orderBy("state", F.desc("cos_sim"), "neighbor_id"))
