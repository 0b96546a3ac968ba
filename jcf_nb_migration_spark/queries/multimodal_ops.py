"""Multimodal-column query: binary payload synthesis → Arrow-batched
mapInPandas decode (deterministic stub codec). The oracle replicates
the stub's header arithmetic from the source text (the corpus is ASCII,
so byte values equal character codes), proving the binary plumbing
delivers exactly the bytes the codec should see."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jcf_nb_migration_spark.functions.multimodal import (
    attach_payload,
    decode_media,
)
from jcf_nb_migration_spark.registry import query, t


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           'image/fake' AS mime,
           CAST(length(text) AS INT) AS n_bytes,
           CAST(ascii(substr(text, 1, 1)) + 64 AS INT) AS width,
           CAST((length(text) % 480) + 16 AS INT) AS height,
           CAST((ascii(substr(text, 2, 1)) % 30) + 1 AS INT) AS n_frames
    FROM documents
    """,
    tags=("multimodal", "binary", "pandas-udf"),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column → mapInPandas 'decode' → typed metadata.
    The decode itself is the documented stub (no codecs in env); the
    schema/partitioning/Arrow-batch path is the real operator."""
    docs = t(spark, sf_dir, "documents")
    return decode_media(attach_payload(docs), fake=True)
