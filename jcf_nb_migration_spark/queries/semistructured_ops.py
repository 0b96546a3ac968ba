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
