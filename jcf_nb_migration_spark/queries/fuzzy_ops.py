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
    # driver-visible (rotated in r5, displacing doc_lang_id whose
    # narrow-scan pattern doc_quality_score still witnesses)
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
