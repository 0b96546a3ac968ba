"""Fuzzy-matching / entity-resolution queries: approximate string
self-join by lossless deletion-neighborhood blocking.

The reference fixes typos with exact literal replacements
(/root/reference/main.py:175-233, one hand-written `replace` per bad
value); the general-purpose engine answer is an approximate join that
FINDS the near-matches. The classic scale trap is the O(N²) all-pairs
edit-distance comparison; the scalable formulation lives in
functions/fuzzy.py (SymSpell deletion blocking — lossless candidate
generation + exact Levenshtein verification, same pigeonhole style as
the SimHash banding in functions/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jcf_nb_migration_spark.functions.fuzzy import fuzzy_self_join_pairs
from jcf_nb_migration_spark.registry import query, t


@query(
    "fuzzy_name_matches",
    oracle="""
    WITH c AS (SELECT c_custkey, c_name FROM customer),
    keys AS (
        SELECT c_custkey, c_name,
               concat(substr(c_name, 1, i), substr(c_name, i + 2)) AS key
        FROM c, LATERAL (SELECT unnest(range(0, length(c_name))) AS i)
        UNION
        SELECT c_custkey, c_name, c_name FROM c
    ),
    cand AS (
        SELECT DISTINCT a.c_custkey AS id_a, a.c_name AS name_a,
                        b.c_custkey AS id_b, b.c_name AS name_b
        FROM keys a JOIN keys b
          ON a.key = b.key AND a.c_custkey < b.c_custkey
    ),
    hits AS (
        SELECT * FROM cand WHERE levenshtein(name_a, name_b) <= 1
    ),
    per_id AS (
        SELECT id AS c_custkey, count(*) AS n_fuzzy_matches
        FROM (SELECT id_a AS id FROM hits
              UNION ALL SELECT id_b AS id FROM hits)
        GROUP BY id
    )
    SELECT c.c_custkey, c.c_name,
           coalesce(n_fuzzy_matches, 0) AS n_fuzzy_matches
    FROM c LEFT JOIN per_id USING (c_custkey)
    ORDER BY c.c_custkey
    """,
    tags=("fuzzy-join", "entity-resolution", "blocking"),
    # green r5-r8; rotated OUT in the r9 second wave — superseded by
    # record_linkage_merge (two-table variant of the same deletion-
    # key blocking + edit-distance verify)
    driver_visible=False,
)
def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate self-join: for every customer, how many other
    customers' names are within Levenshtein distance 1 (typo
    detection / entity resolution over an id-like column).

    Plan (functions/fuzzy.py): explode each name into its deletion
    neighborhood (len+1 keys, all codegen'd `transform`/`substring` —
    no Python), equi-join the neighborhood with itself on the key,
    `distinct` the candidate pairs (two strings can share several
    keys), then verify the exact edit distance with the JVM
    `levenshtein` — computed only on candidates, never all pairs.
    Aggregated to a per-customer match count (bounded by table size)
    so the result hash pins every pair.

    Scale: linear — data volume ×(len+1) through one equi-join whose
    key buckets are tiny by construction (a bucket holds only strings
    within one edit of a common deletion; skewed popular keys would be
    split by AQE). At 100 TB the verify step uses the thresholded
    `levenshtein(a, b, 1)` early-exit form; the un-thresholded call
    here keeps the oracle expression identical. No O(N²) stage exists
    in the plan (tests/test_plans.py guards no CartesianProduct).
    max_ed=2 is available in functions/fuzzy.py (neighborhood
    O(len²), still linear in rows) with its losslessness
    property-tested against brute force."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    hits = fuzzy_self_join_pairs(c, "c_custkey", "c_name", max_ed=1)
    per_id = (
        hits.select(F.col("id_a").alias("c_custkey"))
        .unionAll(hits.select(F.col("id_b").alias("c_custkey")))
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_fuzzy_matches"))
    )
    return (
        c.join(per_id, "c_custkey", "left")
        .select("c_custkey", "c_name",
                F.coalesce("n_fuzzy_matches", F.lit(0).cast("long"))
                .alias("n_fuzzy_matches"))
        .orderBy("c_custkey")
    )


@query(
    "record_linkage_merge",
    oracle="""
    WITH m AS (
        SELECT c_custkey, c_name FROM customer
    ),
    inc AS (
        SELECT c_custkey + 10000000 AS inc_id,
               concat(substr(c_name, 1, length(c_name) - 1),
                      CASE WHEN substr(c_name, length(c_name), 1) = 'X'
                           THEN 'Y' ELSE 'X' END) AS dirty_name
        FROM m WHERE c_custkey % 10 = 0
    ),
    ikeys AS (
        SELECT inc_id, dirty_name,
               concat(substr(dirty_name, 1, i),
                      substr(dirty_name, i + 2)) AS key
        FROM inc,
             LATERAL (SELECT unnest(range(0, length(dirty_name))) AS i)
        UNION SELECT inc_id, dirty_name, dirty_name FROM inc
    ),
    mkeys AS (
        SELECT c_custkey, c_name,
               concat(substr(c_name, 1, i), substr(c_name, i + 2)) AS key
        FROM m, LATERAL (SELECT unnest(range(0, length(c_name))) AS i)
        UNION SELECT c_custkey, c_name, c_name FROM m
    ),
    cand AS (
        SELECT DISTINCT i.inc_id, i.dirty_name, k.c_custkey, k.c_name
        FROM ikeys i JOIN mkeys k ON k.key = i.key
    ),
    hits AS (
        SELECT *, levenshtein(dirty_name, c_name) AS edit_dist
        FROM cand WHERE levenshtein(dirty_name, c_name) <= 1
    ),
    best AS (
        SELECT inc_id, c_custkey, c_name, edit_dist,
               COUNT(*) OVER (PARTITION BY inc_id) AS n_candidates,
               ROW_NUMBER() OVER (PARTITION BY inc_id
                                  ORDER BY edit_dist, c_custkey) AS rk
        FROM hits
    )
    SELECT i.inc_id, i.dirty_name,
           b.c_custkey AS matched_custkey,
           b.c_name AS matched_name,
           b.edit_dist,
           CAST(COALESCE(b.n_candidates, 0) AS BIGINT) AS n_candidates,
           COALESCE(b.c_name, i.dirty_name) AS golden_name
    FROM inc i LEFT JOIN (SELECT * FROM best WHERE rk = 1) b
        ON b.inc_id = i.inc_id
    ORDER BY i.inc_id
    """,
    tags=("fuzzy-join", "entity-resolution", "record-linkage",
          "golden-record", "survivorship"),
    # rotated INTO the driver window r9 second wave (first-time name;
    # supersedes fuzzy_name_matches as the blocking family's witness)
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by lsh_incremental_dedup (coverage_map.py)
    driver_visible=False,
)
def record_linkage_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage with survivorship — the incoming-batch-vs-master
    half of entity resolution: a DIRTY batch (every 10th customer,
    one deterministic character substitution — the planted-typo
    fixture, because the synthetic sequential namespace is otherwise
    fully fuzzy-connected: at sf0.1 ALL 15 000 names fall in ONE
    edit-distance component, so self-join ER is degenerate by
    construction, while linkage is not) is matched against the master
    by the same lossless deletion-neighborhood blocking as
    fuzzy_name_matches, verified with exact Levenshtein, and resolved
    per incoming record: best match (lowest distance, ties to the
    lowest key), how many candidates competed (the ambiguity signal a
    clerical-review queue is built from), and the surviving golden
    name (master wins; unlinked records keep their own).

    Scale: the master-side neighborhood index is the REUSABLE
    artifact — build once, store, and every incoming batch equi-joins
    it (the lsh_incremental_dedup standing-index shape applied to
    strings). No self-join, no transitive closure: output is bounded
    by the batch."""
    from jcf_nb_migration_spark.functions.fuzzy import fuzzy_link_pairs
    from pyspark.sql import Window as W

    m = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    last = F.substring(F.col("c_name"), F.length("c_name"), 1)
    inc = (m.where(F.col("c_custkey") % 10 == 0)
           .select((F.col("c_custkey") + 10_000_000).alias("inc_id"),
                   F.concat(
                       F.substring(F.col("c_name"), F.lit(1),
                                   F.length("c_name") - 1),
                       F.when(last == "X", "Y").otherwise("X"))
                   .alias("dirty_name")))
    hits = fuzzy_link_pairs(inc, "inc_id", "dirty_name",
                            m, "c_custkey", "c_name", max_ed=1)
    w = W.partitionBy("inc_id")
    best = (hits
            .withColumn("n_candidates", F.count(F.lit(1)).over(w))
            .withColumn("rk", F.row_number().over(
                w.orderBy("edit_dist", "c_custkey")))
            .where(F.col("rk") == 1))
    return (inc.join(best.select("inc_id",
                                 F.col("c_custkey").alias("matched_custkey"),
                                 F.col("c_name").alias("matched_name"),
                                 "edit_dist", "n_candidates"),
                     "inc_id", "left")
            .select("inc_id", "dirty_name", "matched_custkey",
                    "matched_name", "edit_dist",
                    F.coalesce("n_candidates", F.lit(0)).cast("bigint")
                    .alias("n_candidates"),
                    F.coalesce("matched_name", "dirty_name")
                    .alias("golden_name"))
            .orderBy("inc_id"))
