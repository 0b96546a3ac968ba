"""Migration composite operators (SURVEY.md §2.8) exercised over the
star schema so the driver's oracle gate covers them: tag derivation
(T1), ordered column merge (T2), test-row purge (T3), replacement
lookup join (J2), and the cleaning chain (C2/C3/C11).

The fixtures have no CRM table, so each query first *derives* the
trigger/source columns the operator needs (e.g. nullable string columns
for the merge rule) — the operator logic under test is identical to
what the pipeline runs (same functions imported), only the inputs are
synthesized from customer/part/documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jcf_nb_migration_spark.operators import cleaning
from jcf_nb_migration_spark.operators.lookup import replace_via_lookup
from jcf_nb_migration_spark.operators.merge import merge_expr
from jcf_nb_migration_spark.operators.purge import purge_test_rows
from jcf_nb_migration_spark.operators.tags import derive_tags
from jcf_nb_migration_spark.registry import query, t


@query(
    "customer_tags",
    oracle="""
    SELECT c_custkey,
           concat_ws(',',
               CASE WHEN c_acctbal > 5000 OR c_acctbal > 9000
                    THEN 'HighValue' END,
               CASE WHEN c_mktsegment = 'BUILDING' THEN 'Builder' END,
               CASE WHEN c_nationkey < 5 THEN 'Nearby' END) AS tags
    FROM customer
    """,
    tags=("migration", "tags", "T1"),
    # rotated OUT of the driver window r10 (green in 9 driver
    # rounds); pattern twin: part_clean_chain
    # (coverage_map.py); still oracle-run at every pytest.
    driver_visible=False,
)
def customer_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 tag derivation: trigger columns → ordered, deduped,
    comma-joined tags (two triggers share the 'HighValue' tag to
    exercise dedupe; first-occurrence order is preserved)."""
    cust = t(spark, sf_dir, "customer")
    with_triggers = cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") > 5000, "x").alias("trig_high"),
        F.when(F.col("c_mktsegment") == "BUILDING", "x").alias("trig_bld"),
        F.when(F.col("c_nationkey") < 5, "x").alias("trig_near"),
        F.when(F.col("c_acctbal") > 9000, "x").alias("trig_vip"),
    )
    mapping = [("trig_high", "HighValue"), ("trig_bld", "Builder"),
               ("trig_near", "Nearby"), ("trig_vip", "HighValue")]
    return (derive_tags(with_triggers, mapping)
            .select("c_custkey", "tags"))


@query(
    "part_merge_chain",
    oracle="""
    SELECT p_partkey,
           CASE WHEN t IS NULL AND s IS NULL THEN NULL
                WHEN coalesce(s,'') = coalesce(t,'')
                     OR coalesce(s,'') = '' THEN coalesce(t,'')
                WHEN coalesce(t,'') = '' THEN coalesce(s,'')
                ELSE coalesce(t,'') || ', ' || coalesce(s,'')
           END AS merged
    FROM (SELECT p_partkey,
                 nullif(p_type, 'ECONOMY') AS t,
                 nullif(p_brand, 'Brand#1') AS s
          FROM part)
    """,
    tags=("migration", "merge", "T2"),
    # r7 rotation: OUT after 5-6 green rounds to widen the hard-checked union;
    # pattern twin in coverage_map.py
    driver_visible=False,
)
def part_merge_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 four-branch merge rule over synthesized nullable sources
    (nullif creates the blank/blank/equal/concat cases). Same
    merge_expr the pipeline folds with."""
    part = t(spark, sf_dir, "part")
    df = part.select(
        "p_partkey",
        F.nullif(F.col("p_type"), F.lit("ECONOMY")).alias("t"),
        F.nullif(F.col("p_brand"), F.lit("Brand#1")).alias("s"),
    )
    return (df.withColumn("merged", merge_expr("t", "s"))
            .select("p_partkey", "merged"))


@query(
    "document_purge",
    oracle="""
    SELECT doc_id FROM documents
    WHERE NOT (contains(lower(text), 'vector')
               AND coalesce(lang, '') <> 'zh')
    """,
    tags=("migration", "purge", "T3"),
    # rotated OUT r9 (8x green); semi/anti-join purge twin:
    # customer_scd2_history
    driver_visible=False,
)
def document_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 purge as predicate (not join): drop documents mentioning the
    needle unless exempted by the lang column — the reference's
    'Southampton, Test' pattern (F2+F3)."""
    docs = t(spark, sf_dir, "documents")
    res = purge_test_rows(docs, columns=["text"], needle="vector",
                          exemptions={"lang": "zh"})
    return res.kept.select("doc_id")


@query(
    "lookup_replace_nation",
    oracle="""
    SELECT c.c_custkey,
           coalesce(n.n_name, '') AS nation_name
    FROM customer c
    LEFT JOIN (SELECT n_nationkey, min(n_name) AS n_name FROM nation
               WHERE n_nationkey < 15 GROUP BY n_nationkey) n
      ON c.c_nationkey = n.n_nationkey
    """,
    tags=("migration", "lookup", "J2"),
    # rotated OUT r9 (8x green); broadcast-dim lookup twin:
    # local_supplier_volume
    driver_visible=False,
)
def lookup_replace_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 replacement join: the column is REPLACED by the broadcast
    lookup's value; unmatched keys are wiped to NULL (→ '' at the sink)
    — not coalesced with the original. Partial lookup (nationkey<15)
    exercises the wipe path."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").cast("string").alias("nation_name"))
    lookup = t(spark, sf_dir, "nation").where(F.col("n_nationkey") < 15).select(
        F.col("n_nationkey").cast("string").alias("key"),
        F.col("n_name").alias("clean"))
    out = replace_via_lookup(cust, "nation_name", lookup, "key", "clean",
                             key_col=None)
    return cleaning.blank_fill(out, ["nation_name"])


@query(
    "part_clean_chain",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_name, ' '),
               x -> upper(x[1]) || lower(x[2:])), ' ') AS name_title,
           CASE WHEN p_brand <> 'Brand#1'
                THEN replace(p_brand, '#', '') ELSE p_brand END AS brand_clean,
           CASE WHEN p_size < 10 THEN 'small'
                WHEN p_size < 30 THEN 'medium'
                ELSE 'large' END AS size_class
    FROM part
    """,
    tags=("migration", "cleaning", "C3", "C2", "C11"),
    driver_visible=False,  # rotated out r10 4th wave (green r1-r9);
    #   the codegen'd regex/when-otherwise projection chain stays
    #   visible via gopher_quality_flags
)
def part_clean_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaning chain: pandas-semantics title-case (C3), character
    strip with exemption (C2), and a masked conditional classification
    (C11 when/otherwise — the port's core translation rule)."""
    part = t(spark, sf_dir, "part")
    df = part.select("p_partkey", F.col("p_name").alias("name_title"),
                     F.col("p_brand").alias("brand_clean"), "p_size")
    df = df.withColumn("name_title", cleaning.title_case("name_title"))
    df = cleaning.strip_chars(df, "brand_clean", "#", exempt=["Brand#1"])
    df = df.withColumn(
        "size_class",
        F.when(F.col("p_size") < 10, "small")
         .when(F.col("p_size") < 30, "medium")
         .otherwise("large"))
    return df.select("p_partkey", "name_title", "brand_clean", "size_class")
