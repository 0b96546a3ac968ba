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
    sample_frames,
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


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, (ascii(substr(text, 2, 1)) % 30) + 1, 2))
                AS INT) AS frame_idx,
           CAST(unnest(range(0, (ascii(substr(text, 2, 1)) % 30) + 1, 2))
                * 40 AS INT) AS frame_ts_ms
    FROM documents
    """,
    tags=("multimodal", "fan-out", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling with row fan-out: decode → demux every 2nd frame
    via mapInPandas batches that yield more rows than they receive.
    The oracle regenerates the stub's frame grid with range+unnest."""
    docs = t(spark, sf_dir, "documents")
    decoded = decode_media(attach_payload(docs), fake=True)
    return sample_frames(decoded, every_n=2, fake=True)
