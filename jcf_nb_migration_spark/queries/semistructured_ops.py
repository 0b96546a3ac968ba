"""Semi-structured schema profiling over the events stream.

Completes the VARIANT surface started by events_variant_extract
(relational2.py: parse once, typed-path ``variant_get``) with the
generator side of the API: ``variant_explode`` fans a payload's
(key, value) pairs out of the binary variant in one pass — the
observability query a pipeline runs when producers drift. Oracle
expresses the same semantics with DuckDB's JSON functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jcf_nb_migration_spark.registry import query, t


@query(
    "events_schema_profile",
    oracle="""
    SELECT event_type, key,
           count(*) AS n_rows,
           count(DISTINCT val_type) AS n_types,
           min(val_type) AS min_type,
           max(val_type) AS max_type
    FROM (
        SELECT event_type, k.key,
               CASE json_type(props, '$.' || k.key)
                   WHEN 'UBIGINT' THEN 'BIGINT'
                   WHEN 'VARCHAR' THEN 'STRING'
                   WHEN 'NULL' THEN 'VOID'
                   ELSE json_type(props, '$.' || k.key)
               END AS val_type
        FROM events,
             LATERAL (SELECT unnest(json_keys(props)) AS key) k
    )
    GROUP BY event_type, key ORDER BY event_type, key
    """,
    tags=("semistructured", "json", "profiling"),
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by user_event_type_map (coverage_map.py)
    driver_visible=False,
)
def events_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Producer-drift observability: which keys appear in the payload
    per event_type, how often, and with how many distinct JSON value
    types. One ``parse_json`` then the ``variant_explode`` table
    generator emits (key, value) pairs from the binary variant — keys
    and values come out of a single parse, versus the json_object_keys
    + per-key re-extraction a string-JSON formulation needs. Per-row
    fan-out is the (tiny, bounded) payload key count; one shuffle on
    the bounded (event_type, key) grid.

    Type names from ``schema_of_variant`` are already the common
    vocabulary (BIGINT/STRING/DOUBLE/BOOLEAN/VOID); the oracle
    normalizes DuckDB's json_type spellings (UBIGINT, VARCHAR, NULL)
    to it."""
    ev = t(spark, sf_dir, "events").select("event_type", "props")
    keyed = spark.sql(
        """
        SELECT event_type, ve.key,
               schema_of_variant(ve.value) AS val_type
        FROM {ev}, LATERAL variant_explode(parse_json(props)) ve
        """,
        ev=ev,
    )
    return (
        keyed.groupBy("event_type", "key")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.countDistinct("val_type").alias("n_types"),
             F.min("val_type").alias("min_type"),
             F.max("val_type").alias("max_type"))
        .orderBy("event_type", "key")
    )


@query(
    "user_event_type_map",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS cnt,
               SUM(CAST(json_extract_string(props, '$.k') AS INT))
                   AS k_sum
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(k_sum) AS BIGINT) AS k_total,
           COALESCE(string_agg(
               CASE WHEN cnt >= 5
                    THEN event_type || ':' || CAST(cnt * 2 AS VARCHAR)
               END, ',' ORDER BY event_type), '') AS busy_map
    FROM c GROUP BY user_id ORDER BY user_id
    """,
    tags=("semistructured", "map-type", "from_json", "hof"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def user_event_type_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed column surface: per user, a map<event_type, count> is
    BUILT (map_from_entries over a sorted entry array), FILTERED
    (map_filter keeps busy event types, count ≥ 5), TRANSFORMED
    (transform_values doubles them) and RENDERED canonically
    (sorted map_entries joined k:v) — the full map higher-order
    function chain, all codegen'd, zero UDFs. The typed-JSON path
    rides along: props parses through from_json (a real schema, not
    string extraction) and its k field aggregates per user. Maps hash
    nondeterministically across engines, so the CONTRACT output is
    the canonical sorted rendering — the same discipline the array
    queries use for order-free structures."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    ev = t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"),
                    StructType([StructField("k", IntegerType())]))["k"]
    c = (ev.groupBy("user_id", "event_type")
         .agg(F.count(F.lit(1)).alias("cnt"),
              F.sum(k).alias("k_sum")))
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("event_type", "cnt"))))
    busy = F.map_filter(m, lambda _, v: v >= 5)
    doubled = F.transform_values(busy, lambda _, v: v * 2)
    rendered = F.array_join(
        F.transform(F.array_sort(F.map_entries(doubled)),
                    lambda e: F.concat_ws(":", e.key,
                                          e.value.cast("string"))),
        ",")
    return (c.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_types"),
                 F.sum("k_sum").alias("k_total"),
                 rendered.alias("busy_map"))
            .orderBy("user_id"))
