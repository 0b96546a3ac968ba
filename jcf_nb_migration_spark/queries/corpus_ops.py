"""Corpus-pipeline utility queries: near-dup clustering (connected
components), deterministic stratified sampling, corpus vocabulary,
embedding normalization, and skew-safe salted aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jcf_nb_migration_spark.functions import dedup as D
from jcf_nb_migration_spark.functions import similarity as S
from jcf_nb_migration_spark.functions import text as T
from jcf_nb_migration_spark.functions.skew import salted_aggregate
from jcf_nb_migration_spark.queries.text_analysis import (
    _SQL_SH_CTE, _SQL_TOKS, _sql_bands_cte, _sql_minhash_sig_cte,
)
from jcf_nb_migration_spark.registry import query, spread, sql_dsum, t


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_SH_CTE},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    cm AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b FROM cm
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.5
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    walk(node, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, w.root FROM walk w JOIN edges e ON e.u = w.node
    )
    SELECT node AS doc_id, min(root) AS cluster_id
    FROM walk GROUP BY node
    """,
    tags=("dedup", "clustering", "iterative"),
    driver_visible=False,  # all-pairs baseline of dedup_clusters_lsh
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the Jaccard≥0.5 near-dup graph —
    iterative min-label propagation seeded from the EXACT all-pairs
    edge set (quadratic baseline; the scale path is
    dedup_clusters_lsh, which feeds the same propagation from LSH
    candidate pairs)."""
    docs = t(spark, sf_dir, "documents")
    return D.dup_clusters(docs, "doc_id", "text", threshold=0.5, n=3)


@query(
    "dedup_clusters_lsh",
    oracle=f"""
    WITH RECURSIVE {_sql_minhash_sig_cte(16)},
    {_sql_bands_cte(8, 2)},
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    verified AS (
        SELECT c.id_a, c.id_b, count(*) AS common
        FROM cands c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b FROM verified
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.5
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    walk(node, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, w.root FROM walk w JOIN edges e ON e.u = w.node
    )
    SELECT node AS doc_id, min(root) AS cluster_id
    FROM walk GROUP BY node
    """,
    tags=("dedup", "clustering", "iterative", "lsh"),
    # green r2-r8; rotated OUT in the r9 second wave — the certified
    # star-contraction CC engine stays visible via
    # linkgraph_cc_certified / linkgraph_cc_starcontraction
    driver_visible=False,
)
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end linear dedup: banded MinHash LSH candidates →
    exact-Jaccard verify → min-label-propagation components. The edge
    set is the minhash_lsh_dedup output, so no stage is quadratic in
    corpus size — this is the 100 TB clustering path (the oracle
    replays the identical LSH pipeline, then computes components with
    a recursive CTE)."""
    docs = t(spark, sf_dir, "documents")
    return D.dup_clusters_lsh(docs, "doc_id", "text",
                              threshold=0.5, k=16, bands=8, rows=2, n=3)


@query(
    "stratified_sample",
    oracle=r"""
    SELECT doc_id, lang FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
          % 10 = 0
    """,
    tags=("sampling", "deterministic"),
    # Demoted from the 50-name driver window in r4: superseded as the
    # visible sampling representative by corpus_mixture_sample, which
    # uses the same hash-mod mechanism inside a harder (budget-rate)
    # shape — curation rule 3.
    driver_visible=False,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sampling by content-stable hash — reruns and
    retries select the same rows (df.sample's RNG does not survive
    partition reshuffles; hash-mod does, which is what a reproducible
    training-data split needs)."""
    docs = t(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
               16, 10).cast("bigint")
    return docs.where(h % 10 == 0).select("doc_id", "lang")


@query(
    "corpus_vocabulary",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    )
    SELECT term, COUNT(*) AS total_tf,
           COUNT(DISTINCT doc_id) AS df,
           CAST(DENSE_RANK() OVER (ORDER BY COUNT(*) DESC, term)
                AS BIGINT) AS freq_rank
    FROM toks GROUP BY term
    """,
    tags=("text", "vocabulary"),
    driver_visible=False,
)
def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level vocabulary with frequencies and rank — the table a
    tokenizer build or frequency-cutoff filter starts from.

    The global frequency rank is the scale hazard: a single
    ``Window.orderBy`` would funnel the entire vocabulary (effectively
    unbounded at 100 TB — ids, hashes, typos) through one task. Ranked
    two-phase instead, the sequence_packing pattern applied to a sort
    rank: ``repartitionByRange`` on the sort key gives contiguous,
    sampled-balanced buckets; each bucket ranks internally (ordered
    window PARTITIONED by bucket), and a bucket's global offset is the
    cumsum of earlier buckets' counts — one tiny ordered window over
    ≤shuffle-partitions rows. The range-partitioned frame is persisted
    so the offset branch and the rank branch read the SAME bucket
    assignment (range boundaries come from sampling; two independent
    materializations could disagree). (total_tf, term) is unique per
    row, so dense_rank == row_number and bucket-local row_numbers +
    offsets compose exactly."""
    docs = spread(t(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(T.tokens("text")).alias("term"))
    agg = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("total_tf"),
        F.countDistinct("doc_id").alias("df"))
    nb = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (agg.repartitionByRange(nb, F.desc("total_tf"), F.asc("term"))
              .withColumn("pid", F.spark_partition_id())
              .persist())
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    # bounded-window: buckets:spark.sql.shuffle.partitions — one row
    # per range bucket, constant in corpus size
    w_off = (Window.orderBy("pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    off = counts.select(
        "pid", F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("p_off"))
    w_in = Window.partitionBy("pid").orderBy(F.desc("total_tf"), "term")
    return (ranged.withColumn("r_in", F.row_number().over(w_in))
            .join(off, "pid")
            .select("term", "total_tf", "df",
                    (F.col("p_off") + F.col("r_in")).cast("bigint")
                    .alias("freq_rank")))


@query(
    "embedding_normalize",
    oracle="""
    SELECT vec_id,
           CAST(unnest(range(len(u))) AS INT) AS dim_idx,
           unnest(u) AS component
    FROM (SELECT vec_id,
                 list_transform(embedding::DOUBLE[],
                     x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                    embedding::DOUBLE[])))
                     AS u
          FROM embeddings)
    """,
    tags=("similarity", "normalize", "array"),
    # Demoted from the 50-name driver window in r4 to admit the
    # curation suite; embedding-fold arithmetic stays driver-visible
    # via embedding_dedup_pairs and the ANN queries.
    driver_visible=False,
)
def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalize the embedding column (after which cosine is a
    plain dot product — normalize once at ingest, save a norm per
    comparison forever). Output is posexploded to one scalar row per
    (vec_id, dim_idx) so the result is canonicalizable by engines that
    sort rows on scalar columns (array cells aren't sortable keys);
    the array-shaped variant is ``F.transform(embedding, x -> x/norm)``
    — same expression, minus the posexplode."""
    emb = t(spark, sf_dir, "embeddings")
    nrm = S.norm(F.col("embedding"))
    unit = F.transform(F.col("embedding"), lambda x: x.cast("double") / nrm)
    return emb.select(
        "vec_id", F.posexplode(unit).alias("dim_idx", "component"))


@query(
    "salted_user_totals",
    oracle=f"""
    SELECT user_id, {sql_dsum('value', 'sum_value')}, COUNT(*) AS n
    FROM events GROUP BY user_id
    """,
    tags=("skew", "salted-agg"),
    # r7 rotation: OUT after 5-6 green rounds to widen the hard-checked union;
    # pattern twin in coverage_map.py
    driver_visible=False,
)
def salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (functions/skew.py): identical
    result to the plain groupBy — the oracle IS the plain groupBy —
    but a hot user's rows split across 16 reducers in phase 1."""
    ev = t(spark, sf_dir, "events")
    return salted_aggregate(ev, "user_id", "value", n_salts=16)

@query(
    "source_sampling_weights",
    oracle=f"""
    WITH per_source AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(CAST(sqrt(n_tokens) AS DECIMAL(28,12)))
                    AS DOUBLE) AS z,
               CAST(SUM(n_tokens) AS BIGINT) AS tok_total
        FROM per_source
    )
    SELECT source, n_docs, n_tokens,
           ROUND(sqrt(n_tokens) / z, 9) AS weight,
           ROUND((sqrt(n_tokens) / z)
                 / NULLIF(CAST(n_tokens AS DOUBLE) / tok_total, 0), 9)
               AS oversample_factor
    FROM per_source, tot
    ORDER BY source
    """,
    tags=("corpus", "sampling", "mixture"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def source_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square-root temperature sampling weights per source: the
    multilingual-training reweighting (weight_i proportional to
    sqrt(tokens_i)) that boosts small sources and damps the head, plus
    each source's oversample factor vs natural token share. Companion
    to corpus_mixture_sample, which draws rows given weights — this is
    where the weights come from.

    One corpus pass to (source, counts) — bounded at |sources| rows —
    then the totals come from a GLOBAL WINDOW over that bounded frame
    (the source_embedding_drift idiom: one lineage, so the single scan
    is structural, not dependent on exchange reuse — pinned in
    tests/test_plans.py). A source whose documents are all empty has
    n_tokens = 0; its natural token share is 0, so the oversample
    factor is NULL (guarded by NULLIF in both engines), not NaN —
    NaN propagation differs across engines and would break the oracle.
    sqrt is IEEE-correctly-rounded in both engines and the weight
    denominator goes through DECIMAL, so the oracle matches
    bit-for-bit before the 9-decimal display rounding."""
    docs = t(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(T.tokens("text"))).cast("bigint").alias("n_tokens"))
    # global window over |sources| rows — bounded; decimal addition is
    # exact/associative so the windowed total equals the direct agg
    w_all = Window.partitionBy()
    z = (F.sum(F.sqrt("n_tokens").cast("decimal(28,12)")).over(w_all)
         .cast("double"))
    tok_total = F.sum("n_tokens").over(w_all).cast("bigint")
    natural = F.col("n_tokens").cast("double") / tok_total
    return (
        per_source.select(
            "source", "n_docs", "n_tokens",
            F.round(F.sqrt("n_tokens") / z, 9).alias("weight"),
            F.round((F.sqrt("n_tokens") / z)
                    / F.nullif(natural, F.lit(0.0)), 9)
             .alias("oversample_factor"))
        .orderBy("source"))


# --- link-graph PageRank -------------------------------------------------
# Importance weighting over a document link graph (the CommonCrawl
# host-rank idea: rank sources/pages by link structure and use the
# rank as a curation quality prior). The fixture tables carry no
# hyperlinks, so the graph is derived deterministically from content:
# two documents are linked iff they share a "rare" 4-gram (shared by
# 2..PR_CAP docs). The frequency cap is the quadratic fuse — each kept
# gram yields at most PR_CAP*(PR_CAP-1) directed edges, so edge
# generation is an equi-join on the gram key, linear in corpus size
# (same fuse as duplicate_spans / doc_boilerplate_coverage).
PR_N = 4          # n-gram order for link derivation
PR_CAP = 4        # max docs sharing a gram for it to count as a link
PR_ITERS = 5      # fixed power iterations (unrolled in the oracle)
PR_SCALE = 1_000_000   # fixed-point rank scale
PR_BASE = 150_000      # 0.15 * PR_SCALE teleport mass


def _sql_pr_ngrams() -> str:
    # lazy import avoids ordering sensitivity in queries/__init__
    from jcf_nb_migration_spark.queries.curation_ops import _sql_ngrams
    return _sql_ngrams(PR_N, distinct=True)


def _sql_pg_pairs() -> str:
    """Shared CTE chain deriving the undirected rare-gram pair set
    (u < v) — used by linkgraph_pagerank and linkgraph_triangles."""
    return f"""toks AS (SELECT doc_id, {_SQL_TOKS} AS w FROM documents),
    gr AS (SELECT doc_id, unnest({_sql_pr_ngrams()}) AS g FROM toks),
    rare AS (SELECT g FROM gr GROUP BY g
             HAVING count(*) BETWEEN 2 AND {PR_CAP}),
    pg AS (SELECT gr.doc_id, gr.g FROM gr JOIN rare USING (g)),
    pairs AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
              FROM pg a JOIN pg b ON a.g = b.g AND a.doc_id < b.doc_id)"""


def _rare_gram_pairs(docs: DataFrame) -> DataFrame:
    """Spark twin of _sql_pg_pairs: distinct (u < v) doc pairs sharing
    a rare {PR_N}-gram (2..{PR_CAP} docs per gram — the quadratic
    fuse)."""
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(
            T.word_shingles(T.tokens("text"), PR_N))).alias("g"))
    rare = (grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
            .where((F.col("df") >= 2) & (F.col("df") <= PR_CAP))
            .select("g"))
    pg = grams.join(rare, "g", "left_semi")
    a, b = pg.alias("a"), pg.alias("b")
    return (a.join(b, (F.col("a.g") == F.col("b.g"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("u"),
                    F.col("b.doc_id").alias("v"))
            .distinct())


def _sql_pagerank_iters() -> str:
    """Unrolled r1..rK CTE bodies: each iteration is the same
    join-aggregate. SUM(BIGINT) is HUGEINT in DuckDB — cast back."""
    steps = []
    for k in range(1, PR_ITERS + 1):
        steps.append(
            f"r{k} AS (SELECT e.v AS node, {PR_BASE} + CAST(SUM("
            f"(r.pr * 85) // (100 * d.outdeg)) AS BIGINT) AS pr "
            f"FROM edges e JOIN r{k-1} r ON r.node = e.u "
            f"JOIN deg d ON d.u = e.u GROUP BY e.v)")
    return ",\n    ".join(steps)


@query(
    "linkgraph_pagerank",
    oracle=f"""
    WITH {_sql_pg_pairs()},
    edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
    deg AS (SELECT u, count(*) AS outdeg FROM edges GROUP BY u),
    r0 AS (SELECT u AS node, CAST({PR_SCALE} AS BIGINT) AS pr FROM deg),
    {_sql_pagerank_iters()}
    SELECT r.node AS doc_id, d.outdeg, r.pr AS rank_fp
    FROM r{PR_ITERS} r JOIN deg d ON d.u = r.node
    ORDER BY rank_fp DESC, doc_id LIMIT 20
    """,
    tags=("graph", "pagerank", "iterative"),
    # rotated INTO the driver window r9 (iterative join-agg witness)
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def linkgraph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the shared-rare-4-gram document link graph —
    link-structure importance as a curation prior (the host-level
    PageRank CommonCrawl-derived corpora use for quality weighting),
    with {PR_ITERS} power iterations in exact fixed-point arithmetic
    so the oracle's unrolled CTE chain replays every iteration
    bit-identically.

    Physical shape: edge derivation is explode → frequency-capped
    equi-join on the gram (the duplicate_spans fuse — never all-pairs);
    each iteration is one equi-join rank⋈edges plus one groupBy on the
    destination — the classic distributed PageRank step, linear in
    |edges| per iteration with shuffles only on doc_id keys. r11
    combiner restructure (VERDICT r10 item 7): the per-node SHARE
    (pr·85 div 100·outdeg — identical for every out-edge of u) is
    computed in a NODE-SIZED join with the persisted degree table
    BEFORE touching edges, so each iteration's edge join carries one
    narrow (u, share) row per node instead of (pr, outdeg) per EDGE —
    the per-iteration shuffle input drops from edge-width to
    node-sized, and the edge derivation is persisted once for all
    {PR_ITERS} iterations. (Pre-partitioning the cached edge table on
    u was measured a wash — AQE's cached-plan handling re-exchanges
    regardless, A/B'd at the 10x-derived point r11, 11.6 s vs 11.5 s —
    so the code keeps the simpler shape.) Ranks are BIGINT
    micro-units (scale {PR_SCALE}); integer floor division (`div` /
    `//`) is identical in both engines for the positive operands here,
    so cross-engine equality is exact — no float tolerance. At
    production scale the loop would localCheckpoint every few
    iterations to truncate lineage (the dup_clusters idiom);
    {PR_ITERS} unrolled joins need no truncation."""
    docs = spread(t(spark, sf_dir, "documents"))
    pairs = _rare_gram_pairs(docs)
    edges = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # edge derivation paid ONCE for all iterations
    ed = edges.persist()
    deg = (ed.groupBy("u").agg(F.count(F.lit(1)).alias("outdeg"))
           .persist())
    ranks = deg.select(F.col("u").alias("node"),
                       F.lit(PR_SCALE).cast("long").alias("pr"))
    for _ in range(PR_ITERS):
        # node-sized combiner: one share per SOURCE NODE, not per edge
        shares = (ranks.join(deg, ranks["node"] == deg["u"])
                  .select(F.col("node").alias("u"),
                          F.expr("(pr * 85) div (100 * outdeg)")
                          .alias("share")))
        ranks = (ed.join(shares, "u")
                 .groupBy("v").agg(F.sum("share").alias("s"))
                 .select(F.col("v").alias("node"),
                         (F.lit(PR_BASE) + F.col("s")).alias("pr")))
    return (ranks.join(deg, ranks["node"] == deg["u"])
            .select(F.col("node").alias("doc_id"), "outdeg",
                    F.col("pr").alias("rank_fp"))
            .orderBy(F.desc("rank_fp"), "doc_id").limit(20))


@query(
    "linkgraph_triangles",
    oracle=f"""
    WITH {_sql_pg_pairs()},
    deg AS (
        SELECT u, count(*) AS d FROM (
            SELECT u FROM pairs UNION ALL SELECT v FROM pairs
        ) GROUP BY u
    ),
    tri AS (
        SELECT count(*) AS n_triangles
        FROM pairs ab
        JOIN pairs bc ON bc.u = ab.v
        JOIN pairs ac ON ac.u = ab.u AND ac.v = bc.v
    )
    SELECT (SELECT count(*) FROM deg) AS n_nodes,
           (SELECT count(*) FROM pairs) AS n_edges,
           (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg)
               AS n_wedges,
           (SELECT n_triangles FROM tri) AS n_triangles,
           ROUND(3.0 * (SELECT n_triangles FROM tri)
                 / (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT)
                    FROM deg), 9) AS global_clustering
    """,
    tags=("graph", "triangles", "clustering-coefficient"),
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def linkgraph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the
    rare-gram link graph — the standard distributed-graph statistic
    (cohesion of the near-dup neighborhood; a corpus whose link graph
    closes many triangles has template/boilerplate families, not
    chance collisions). Physical shape: the classic two-equi-join
    triangle enumeration over ORDERED edges (u < v < w), so every
    triangle is counted exactly once and the join fan-out is bounded
    by the rare-gram degree cap; wedges come from the degree table
    (sum d*(d-1)/2), never an enumeration. One summary row; the only
    double is the final clustering ratio (round 9)."""
    docs = spread(t(spark, sf_dir, "documents"))
    pairs = _rare_gram_pairs(docs).persist()
    deg = (pairs.select("u").unionByName(
        pairs.select(F.col("v").alias("u")))
        .groupBy("u").agg(F.count(F.lit(1)).alias("d")))
    ab, bc, ac = pairs.alias("ab"), pairs.alias("bc"), pairs.alias("ac")
    tri = (ab.join(bc, F.col("bc.u") == F.col("ab.v"))
           .join(ac, (F.col("ac.u") == F.col("ab.u"))
                 & (F.col("ac.v") == F.col("bc.v")))
           .agg(F.count(F.lit(1)).alias("n_triangles")))
    summary = (deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"))
        .crossJoin(pairs.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(tri))
    return summary.select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles",
        F.round(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 9)
        .alias("global_clustering"))


BFS_DEPTH = 3  # recursion bound (levels); frontier-dedup'd per level


@query(
    "linkgraph_bfs_reachability",
    oracle=f"""
    WITH RECURSIVE {_sql_pg_pairs()},
    edges AS (
        SELECT u, v FROM pairs
        UNION ALL
        SELECT v AS u, u AS v FROM pairs
    ),
    reach(node, dist) AS (
        SELECT min(u) AS node, 0 AS dist FROM edges
        UNION ALL
        SELECT DISTINCT e.v AS node, r.dist + 1 AS dist
        FROM reach r JOIN edges e ON e.u = r.node
        WHERE r.dist < {BFS_DEPTH}
    ),
    best AS (
        SELECT node, min(dist) AS dist FROM reach GROUP BY node
    )
    SELECT dist, count(*) AS n_nodes,
           CAST(sum(node) AS BIGINT) AS sum_doc_id
    FROM best GROUP BY dist ORDER BY dist
    """,
    tags=("graph", "recursive-cte", "bfs"),
    driver_visible=True,  # rotated INTO the driver window r11 (first-time name)
    #                        dedup_clusters_lsh in the driver window
)
def linkgraph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first reachability from the lexicographically first
    linked document, expressed with Spark 4's native WITH RECURSIVE —
    the declarative twin of the hand-rolled iterative joins in
    dedup_clusters / linkgraph_pagerank. Each recursion level is one
    frontier⋈edges equi-join; ``SELECT DISTINCT`` inside the recursive
    member dedups the frontier per level (Spark's recursive CTE allows
    only UNION ALL — plain UNION raises UNION_NOT_SUPPORTED_IN_
    RECURSIVE_CTE — so without the DISTINCT a cyclic graph would
    multiply paths exponentially), and the depth bound {BFS_DEPTH}
    terminates cycles; min(dist) per node then collapses late
    rediscoveries. Rows are bounded by nodes x depth, never by path
    count. The DuckDB oracle runs the IDENTICAL recursive SQL over the
    same rare-gram edges. Per-level output: node count + exact sum of
    doc ids, so a single wrong frontier hop flips the hash.

    The edge frame is localCheckpoint'd before entering the recursion:
    Spark's recursive-CTE executor re-executes the static-side SUBTREE
    at every level and does NOT consult the persist cache (measured at
    the 10x-derived point r11: raw 38.7 s, persist() 44.2 s,
    localCheckpoint 4.5 s — the whole rare-gram derivation was being
    re-run per level), so an RDD-backed materialization, the same
    idiom the SSSP/CC loops use, is the only shape that makes each
    level cost frontier⋈edges."""
    docs = spread(t(spark, sf_dir, "documents"))
    pairs = _rare_gram_pairs(docs)
    edges = pairs.unionByName(
        pairs.select(F.col("v").alias("u"),
                     F.col("u").alias("v"))).localCheckpoint()
    return spark.sql(
        f"""
        WITH RECURSIVE reach(node, dist) AS (
            SELECT min(u) AS node, 0 AS dist FROM {{e}}
            UNION ALL
            SELECT DISTINCT e.v AS node, r.dist + 1 AS dist
            FROM reach r JOIN {{e}} e ON e.u = r.node
            WHERE r.dist < {BFS_DEPTH}
        ),
        best AS (
            SELECT node, min(dist) AS dist FROM reach GROUP BY node
        )
        SELECT dist, count(*) AS n_nodes,
               CAST(sum(node) AS BIGINT) AS sum_doc_id
        FROM best GROUP BY dist ORDER BY dist
        """,
        e=edges,
    )


SSSP_HOPS = 4  # pinned replay depth: min-cost path using ≤ 4 edges
#                (hop-bounded SSSP — well-defined at any scale; the
#                engine-default certified fixpoint is pinned against
#                brute force in tests/test_linkgraph.py)


def _sql_sssp_rounds() -> str:
    """Unrolled Bellman-Ford rounds d1..dK: each round is the same
    carry-forward ∪ relax → MIN(dist) aggregate the Spark loop runs —
    identical BIGINT arithmetic, so distances replay bit-exactly."""
    steps = []
    for k in range(1, SSSP_HOPS + 1):
        steps.append(
            f"""d{k} AS (SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{k-1}
        UNION ALL
        SELECT e.v AS node, d.dist + e.w AS dist
        FROM d{k-1} d JOIN edges e ON e.u = d.node
    ) GROUP BY node)""")
    return ",\n    ".join(steps)


@query(
    "linkgraph_khop_sssp",
    oracle=f"""
    WITH {_sql_pg_pairs()},
    edges AS (
        SELECT u, v, (u + v) % 7 + 1 AS w FROM pairs
        UNION ALL
        SELECT v, u, (u + v) % 7 + 1 FROM pairs
    ),
    d0 AS (SELECT (SELECT MIN(u) FROM edges) AS node,
                  CAST(0 AS BIGINT) AS dist),
    {_sql_sssp_rounds()}
    SELECT node AS doc_id, dist AS dist_w
    FROM d{SSSP_HOPS} ORDER BY dist_w, doc_id LIMIT 20
    """,
    tags=("graph", "sssp", "shortest-path", "weighted", "iterative"),
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: linkgraph_bfs_reachability
    driver_visible=False,
)
def linkgraph_khop_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (hop-bounded Bellman-Ford,
    functions/graph.sssp) over the rare-gram document link graph, from
    the lexicographically first linked document — link-distance as a
    crawl-frontier / contamination-radius prior, the weighted
    companion of linkgraph_bfs_reachability. Edge weights are the
    deterministic ``(u + v) % 7 + 1`` (symmetric, strictly positive,
    pure BIGINT), so Spark and the oracle's unrolled CTE chain compute
    bit-identical distances — no float tolerance.

    Physical shape: each of the {SSSP_HOPS} relaxation rounds is one
    dist⋈edges equi-join plus one MIN groupBy on the destination node
    — linear in |edges| per round, shuffles only on node ids; the edge
    frame (with weights) is persisted once and reused by every round.
    The hop bound makes the operator scale-stable (it answers
    "cheapest path within {SSSP_HOPS} links", not a diameter-dependent
    question); the engine-default ``max_hops=None`` runs to a
    CERTIFIED no-improvement fixpoint with localCheckpoint lineage
    truncation (pinned against brute-force enumeration in
    tests/test_linkgraph.py)."""
    from jcf_nb_migration_spark.functions.graph import sssp

    docs = spread(t(spark, sf_dir, "documents"))
    pairs = _rare_gram_pairs(docs)
    both = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
    edges = both.select(
        "u", "v",
        F.expr("(u + v) % 7 + 1").cast("long").alias("w")).persist()
    source = edges.agg(F.min("u").alias("node"))
    dist = sssp(edges, source, max_hops=SSSP_HOPS)
    return (dist.select(F.col("node").alias("doc_id"),
                        F.col("dist").alias("dist_w"))
            .orderBy("dist_w", "doc_id").limit(20))


from jcf_nb_migration_spark.functions.graph import CC_ROUNDS  # noqa: E402,F401


def _sql_star_rounds() -> str:
    """Unrolled large-star/small-star CTE chain: e0 is the canonical
    (a < b) pair set; each round k derives e{k} from e{k-1} via one
    large-star then one small-star phase — identical integer ops to
    the Spark loop, so the contraction replays bit-exactly."""
    steps = []
    prev = "e0"
    for k in range(1, CC_ROUNDS + 1):
        # AS MATERIALIZED: each CTE is referenced more than once per
        # round; left to inlining the scan tree grows exponentially in
        # CC_ROUNDS (the SQL twin of the lazy-plan blowup the Spark
        # side avoids with _symmetrize)
        steps.append(f"""adl{k} AS MATERIALIZED (
        SELECT a AS u, b AS v FROM {prev}
        UNION ALL SELECT b, a FROM {prev}),
    mnl{k} AS (SELECT u, LEAST(MIN(v), u) AS m FROM adl{k} GROUP BY u),
    ls{k} AS MATERIALIZED (SELECT DISTINCT mk.m AS a, t.v AS b
              FROM adl{k} t JOIN mnl{k} mk USING (u)
              WHERE t.v > t.u AND t.v <> mk.m),
    sm{k} AS MATERIALIZED (SELECT u, v FROM (
        SELECT a AS u, b AS v FROM ls{k}
        UNION ALL SELECT b, a FROM ls{k}) WHERE v < u),
    mns{k} AS (SELECT u, MIN(v) AS m FROM sm{k} GROUP BY u),
    e{k} AS MATERIALIZED (SELECT DISTINCT a, b FROM (
        SELECT mk.m AS a, s.v AS b
        FROM sm{k} s JOIN mns{k} mk USING (u) WHERE s.v <> mk.m
        UNION ALL SELECT m AS a, u AS b FROM mns{k}))""")
        prev = f"e{k}"
    return ",\n    ".join(steps)


# shared by the pinned-replay query AND the certified-default twin:
# the oracle unrolls exactly CC_ROUNDS rounds; the certified mode
# returns the identical labeling whenever that depth converges (pinned
# for the fixture in tests/test_linkgraph.py), so one oracle gates both
_SQL_CC_ORACLE = f"""
    WITH {_sql_pg_pairs()},
    e0 AS MATERIALIZED (SELECT u AS a, v AS b FROM pairs),
    {_sql_star_rounds()},
    adf AS (SELECT a AS u, b AS v FROM e{CC_ROUNDS}
            UNION ALL SELECT b, a FROM e{CC_ROUNDS}),
    comp AS (SELECT u AS doc_id, LEAST(MIN(v), u) AS component
             FROM adf GROUP BY u)
    SELECT c.component, CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(c.doc_id) AS BIGINT) AS sum_doc_id
    FROM comp c GROUP BY c.component
    ORDER BY n_members DESC, component LIMIT 20
    """


@query(
    "linkgraph_cc_starcontraction",
    oracle=_SQL_CC_ORACLE,
    tags=("graph", "connected-components", "star-contraction",
          "iterative"),
    # iterative equi-join+groupBy contraction — pattern driver-visible
    # via dedup_clusters_lsh; convergence vs union-find pinned in
    # tests/test_linkgraph.py
    # rotated OUT of the driver window r10 (green in 3 driver
    # rounds); pattern twin: linkgraph_cc_certified
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def linkgraph_cc_starcontraction(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond", SoCC 2014) over the shared-rare-gram link graph —
    the published web-scale CC algorithm, converging in O(log² n)
    rounds versus min-label propagation's O(diameter). Each round:
    large-star points every neighbor LARGER than u at u's
    neighborhood minimum (halving tree heights without losing
    connectivity), small-star then points the SMALLER neighbors and u
    itself at that minimum. {CC_ROUNDS} rounds are unrolled into the
    plan; every phase is an equi-join + groupBy-min on doc_id keys —
    no iteration-count data dependence, so the DuckDB oracle replays
    the identical contraction bit-exactly (pure integer min/distinct
    arithmetic). Convergence to true components (= union-find ground
    truth) is pinned separately in tests/test_linkgraph.py. Output:
    one row per component with member count and an id checksum.

    At 100 TB: per round the edge set SHRINKS (stars collapse), each
    phase is one shuffle on node id; the deg/edge frames are never
    globally sorted and the quadratic fuse (2..{PR_CAP} docs per gram)
    bounds candidate fan-out exactly as in linkgraph_pagerank. A
    production loop uses the engine default (rounds=None): certified
    fixpoint with localCheckpoint lineage truncation and a
    no-crossing-edge post-condition (functions/graph.py); the pinned
    {CC_ROUNDS} unrolled rounds here exist so the oracle replays
    bit-exactly, and their sufficiency on the fixture graph is pinned
    in tests/test_linkgraph.py."""
    docs = spread(t(spark, sf_dir, "documents"))
    # pinned rounds: the oracle unrolls exactly CC_ROUNDS; the engine
    # default (rounds=None) is the certified-fixpoint mode instead
    comp = _star_components(_rare_gram_pairs(docs), rounds=CC_ROUNDS)
    return (comp.groupBy("component")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.sum(F.col("u")).alias("sum_doc_id"))
            .orderBy(F.desc("n_members"), "component").limit(20))


@query(
    "linkgraph_cc_certified",
    oracle=_SQL_CC_ORACLE,
    tags=("graph", "connected-components", "star-contraction",
          "iterative", "certified-fixpoint"),
    # rotated INTO the driver window r9 — the ENGINE-DEFAULT certified
    # mode of the contraction, now driver-checked alongside
    # linkgraph_cc_starcontraction
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: linkgraph_bfs_reachability
    driver_visible=False,
)
def linkgraph_cc_certified(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """The CERTIFIED-FIXPOINT connected components path — identical
    rare-gram link graph, but run through the engine DEFAULT
    ``star_components(pairs)`` (rounds=None): batches of rounds with
    localCheckpoint lineage truncation and the no-crossing-edge
    post-condition probe, raising rather than returning a split
    labeling (functions/graph.py, VERDICT r6 item 1). The oracle is
    the SAME unrolled-CC_ROUNDS replay as
    linkgraph_cc_starcontraction: whenever the pinned depth converges
    (pinned for this fixture vs union-find in tests/test_linkgraph.py)
    the certified mode returns the identical labeling, so a hash
    match here proves the default path end-to-end against DuckDB —
    including that the certificate terminates without altering the
    result. Eager probe actions at build time are the legitimate
    iterative-driver-state pattern (k-means, BPE, logreg GD).

    At 100 TB this is the mode to run: the pinned-depth twin exists
    only for bit-exact oracle replay; this one cannot silently
    under-contract on a deeper-than-expected component."""
    docs = spread(t(spark, sf_dir, "documents"))
    pairs = _rare_gram_pairs(docs).persist()
    try:
        comp = _star_components(pairs)  # certified default
        return (comp.groupBy("component")
                .agg(F.count(F.lit(1)).alias("n_members"),
                     F.sum(F.col("u")).alias("sum_doc_id"))
                .orderBy(F.desc("n_members"), "component").limit(20))
    finally:
        pairs.unpersist()


# _symmetrize / _star_components moved to functions/graph.py (r6):
# the contraction is engine API now (record_linkage-style ER reuse),
# not a query-module private. Back-compat aliases below.
from jcf_nb_migration_spark.functions.graph import (  # noqa: E402
    star_components as _star_components,
    symmetrize as _symmetrize,
)

WSAMPLE_K = 100                    # fixed sample size
WSAMPLE_SCALE = 1_000_000_000  # fixed-point priority resolution
#   (32-bit hash x 1e9 stays under bigint; 48-bit x 1e12 overflows)


@query(
    "weighted_corpus_sample",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, len({_SQL_TOKS}) AS weight,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wsample'),
                               1, 8))::BIGINT AS h
        FROM documents
        WHERE len({_SQL_TOKS}) > 0
    )
    SELECT doc_id, CAST(weight AS BIGINT) AS weight,
           CAST(h * {WSAMPLE_SCALE} // weight AS BIGINT) AS priority
    FROM w
    ORDER BY priority, doc_id
    LIMIT {WSAMPLE_K}
    """,
    tags=("curation", "sampling", "weighted", "deterministic"),
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def weighted_corpus_sample(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """FIXED-SIZE weighted sampling without replacement — the
    deterministic integer analogue of Efraimidis–Spirakis A-ES
    reservoir sampling: each document draws a content-stable uniform
    (salted 32-bit md5 prefix of its id — 8 hex chars; 48 bits times
    the 1e9 fixed-point scale would overflow bigint) and competes with
    priority
    h·SCALE div weight; the {WSAMPLE_K} SMALLEST priorities win, so
    heavier (longer) documents win proportionally more often, any
    executor count produces the identical sample, and re-runs are
    byte-stable (the property an RNG-based reservoir loses on
    repartition). Complements the RATE-based samplers
    (corpus_mixture_sample / sqrt-temperature: keep-probability per
    row) with the fixed-BUDGET shape a curation pipeline needs when
    the output size is the contract.

    Scale: one scan computing (weight, hash, priority), then a
    distributed TakeOrdered over K — no global sort materializes; at
    a K too large for one driver result, the two-phase rank
    (corpus_vocabulary) takes over."""
    docs = spread(t(spark, sf_dir, "documents"))
    h = (F.conv(F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(":wsample"))), 1, 8), 16, 10)
         .cast("bigint"))
    w = (docs.select("doc_id",
                     F.size(T.tokens("text")).cast("bigint").alias("weight"),
                     h.alias("h"))
         .where(F.col("weight") > 0)
         .withColumn("priority",
                     F.expr(f"h * {WSAMPLE_SCALE} div weight")))
    return (w.select("doc_id", "weight", "priority")
            .orderBy("priority", "doc_id")
            .limit(WSAMPLE_K))


LPA_ITERS = 3   # fixed synchronous rounds, unrolled in the oracle


@query(
    "linkgraph_label_propagation",
    oracle=f"""
    WITH {_sql_pg_pairs()},
    e AS (SELECT u AS src, v AS dst FROM pairs
          UNION ALL SELECT v AS src, u AS dst FROM pairs),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
    l1 AS (SELECT node, label FROM (
        SELECT c.src AS node, c.label, ROW_NUMBER() OVER (
            PARTITION BY c.src ORDER BY c.n DESC, c.label ASC) AS rn
        FROM (SELECT e.src, l.label, COUNT(*) AS n
              FROM e JOIN l0 l ON e.dst = l.node
              GROUP BY e.src, l.label) c
    ) WHERE rn = 1),
    l2 AS (SELECT node, label FROM (
        SELECT c.src AS node, c.label, ROW_NUMBER() OVER (
            PARTITION BY c.src ORDER BY c.n DESC, c.label ASC) AS rn
        FROM (SELECT e.src, l.label, COUNT(*) AS n
              FROM e JOIN l1 l ON e.dst = l.node
              GROUP BY e.src, l.label) c
    ) WHERE rn = 1),
    l3 AS (SELECT node, label FROM (
        SELECT c.src AS node, c.label, ROW_NUMBER() OVER (
            PARTITION BY c.src ORDER BY c.n DESC, c.label ASC) AS rn
        FROM (SELECT e.src, l.label, COUNT(*) AS n
              FROM e JOIN l2 l ON e.dst = l.node
              GROUP BY e.src, l.label) c
    ) WHERE rn = 1)
    SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM l{LPA_ITERS} GROUP BY label ORDER BY community
    """,
    tags=("graph", "communities", "label-propagation", "iterative"),
    driver_visible=False,  # rotated out r13 7th wave (green r12)
)
def linkgraph_label_propagation(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Community detection over the rare-gram document link graph by
    fixed-round synchronous label propagation (functions/graph.
    label_propagation — Raghavan et al. 2007 with deterministic
    smallest-label ties, the GraphFrames-LPA shape): every doc starts
    as its own community, each of {LPA_ITERS} rounds adopts the
    neighbor-majority label, and the result reports community sizes.
    Complements the component/centrality/path families already in the
    graph suite: components answer "connected at all?", LPA answers
    "densely knit with whom?" — near-dup clusters inside a weakly
    joined component split into separate communities. The oracle
    unrolls the same {LPA_ITERS} rounds as windowed argmax CTEs —
    bit-exact parity because every step is integer counts with integer
    ties. Per round one node-keyed equi-join + two key-partitioned
    groupBys; no broadcast of node-sized state (the SSSP cost
    model)."""
    from jcf_nb_migration_spark.functions.graph import label_propagation

    docs = spread(t(spark, sf_dir, "documents"))
    pairs = _rare_gram_pairs(docs)
    labels = label_propagation(pairs, rounds=LPA_ITERS)
    return (labels.groupBy(F.col("label").alias("community"))
            .agg(F.count(F.lit(1)).alias("n_members"))
            .orderBy("community"))
