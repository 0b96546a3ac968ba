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
    # rotated OUT r9 (8x green); Arrow-batched python surface twin:
    # multimodal_frame_sample
    driver_visible=False,
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
    driver_visible=False,  # rotated out r10 4th wave (green r1-r9);
    #   the Arrow-batched Python map surface stays visible via
    #   arrow_doc_stats (mapInArrow, same batch plumbing)
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling with row fan-out: decode → demux every 2nd frame
    via mapInPandas batches that yield more rows than they receive.
    The oracle regenerates the stub's frame grid with range+unnest."""
    docs = t(spark, sf_dir, "documents")
    decoded = decode_media(attach_payload(docs), fake=True)
    return sample_frames(decoded, every_n=2, fake=True)


AHASH_PIX = 48   # fingerprint width (bits == "pixels")
AHASH_R = 3      # Hamming radius for near-duplicate media


N_SEEDS = 3      # near-dup payloads seeded into the corpus (both
#   engines, identically) so the pair histogram is non-vacuous at
#   every SF — the sf0.01 fixture has no natural ≤3-Hamming pair, and
#   a 0-row oracle equality proves only that both engines found
#   nothing (VERDICT r10 item 4). Seeds: an exact payload copy
#   (Hamming 0 by construction) and a one-byte mutation of each of
#   the N_SEEDS smallest doc_ids. Seed offsets are 1e12/2e12 —
#   far above every fixture's id space INCLUDING the derived
#   replica fixtures (whose replicas offset ids by k*1e7; a 1e7 seed
#   offset collided with replica ids there, and duplicate doc_ids
#   make the banded path — which dedups candidate pairs by id — and
#   the all-pairs oracle count different pair multisets; caught by
#   the r11 derived-fixture sweep).

_SQL_SEEDED_CORPUS = f"""
    seeds AS (
        SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT {N_SEEDS}
    ),
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000000000, text FROM seeds
        UNION ALL
        SELECT doc_id + 2000000000000, 'Z' || substr(text, 2) FROM seeds
    )"""


def _sql_ahash() -> str:
    """DuckDB replay of the 48-'pixel' average-hash: pixel i sampled
    at STRIDED position (i*len)//48 across the whole payload (not the
    cycled prefix — adjacent bytes correlate, and correlated bits
    collapse band entropy: measured 3.2M candidate-pair mass at sf0.1
    from ~150 distinct values per 12-bit band); bit set iff
    pixel*48 >= byte-sum; bit i packs to position (i%4)*12 + i//4 so
    each contiguous 12-bit band holds every 4th bit — a fixed
    permutation (Hamming-preserving, pigeonhole only needs DISJOINT
    bands) that decorrelates within-band bits (5x less pair mass)."""
    pix = (f"list_transform(range(0, {AHASH_PIX}), i -> "
           f"ascii(substr(text, "
           f"CAST((i * length(text)) // {AHASH_PIX} AS INT) + 1, 1)))")
    return f"""{_SQL_SEEDED_CORPUS},
    px AS (
        SELECT doc_id, {pix} AS p FROM corpus WHERE length(text) > 0
    ),
    fp AS (
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, {AHASH_PIX}),
                   i -> CASE WHEN p[i + 1] * {AHASH_PIX} >=
                                  CAST(list_sum(p) AS BIGINT)
                             THEN 1 << ((i % 4) * 12 + i // 4)
                             ELSE 0 END))
                    AS BIGINT) AS simhash
        FROM px
    )"""


@query(
    "media_perceptual_dedup",
    oracle=f"""
    WITH {_sql_ahash()},
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {AHASH_R}
    )
    SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(id_a + id_b) AS BIGINT) AS id_checksum
    FROM pairs GROUP BY hamming ORDER BY hamming
    """,
    tags=("multimodal", "dedup", "perceptual-hash", "simhash",
          "composed"),
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by source_dedup_matrix (coverage_map.py)
    driver_visible=False,
)
def media_perceptual_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate detection for MEDIA columns — the
    image-dedup step of a multimodal pipeline: an AVERAGE-HASH
    fingerprint ({AHASH_PIX} "pixels": bit set iff the pixel exceeds
    the frame mean — pure integer comparisons, so the fingerprint is
    bit-reproducible) and banded-Hamming pair generation via the SAME
    pigeonhole machinery as text SimHash (functions/dedup.py:
    simhash_near_pairs, radius {AHASH_R} → {AHASH_R + 1} disjoint
    bands, lossless). Real pixel decode is environment-gated (no PIL,
    functions/multimodal.py); the payload byte stream stands in for
    the resampled grayscale frame, which exercises every real stage —
    fingerprint algebra, band explode, equi-join candidates, exact
    Hamming verify — on the real plumbing. Output is the pair
    histogram by Hamming distance with an id checksum (pair lists at
    corpus scale belong in a sink, not a report).

    At 100 TB: fingerprints are one narrow scan; candidates come from
    {AHASH_R + 1} band equi-joins (never all-pairs — the oracle IS
    the quadratic formulation, proven equal). The introduction-time
    scaling probe CAUGHT the naive design (cycled-prefix pixels,
    contiguous packing) at 9.17x on 10x data — correlated adjacent
    bits left ~150 distinct values per 12-bit band; strided sampling
    + interleaved packing (a Hamming-preserving bit permutation)
    restored band entropy, the same class of fix as r5's SimHash
    radius lesson.

    Non-vacuous at every SF: {N_SEEDS} deterministic near-dup payloads
    (exact copy + one-byte mutation of the smallest doc_ids) are
    seeded into BOTH engines' corpora, so the oracle equality always
    checks real pairs (the natural sf0.01 fixture has none within
    radius {AHASH_R})."""
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions import dedup as D

    base = t(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = base.orderBy("doc_id").limit(N_SEEDS)
    corpus = (base
              .unionByName(seeds.select(
                  (F.col("doc_id") + 1_000_000_000_000).alias("doc_id"),
                  "text"))
              .unionByName(seeds.select(
                  (F.col("doc_id") + 2_000_000_000_000).alias("doc_id"),
                  F.concat(F.lit("Z"), F.expr("substring(text, 2)"))
                  .alias("text"))))
    docs = corpus.where(F.length("text") > 0)
    pix = F.expr(
        f"transform(sequence(0, {AHASH_PIX - 1}), i -> "
        f"ascii(substring(text, "
        f"CAST((i * length(text)) div {AHASH_PIX} AS INT) + 1, 1)))")
    total = F.aggregate(F.col("p"), F.lit(0).cast("bigint"),
                        lambda a, v: a + v)
    pack = F.expr(
        f"aggregate(sequence(0, {AHASH_PIX - 1}), CAST(0 AS BIGINT), "
        f"(a, i) -> a + CASE WHEN element_at(p, i + 1) * {AHASH_PIX} "
        f">= tot "
        f"THEN shiftleft(CAST(1 AS BIGINT), (i % 4) * 12 + i div 4) "
        f"ELSE CAST(0 AS BIGINT) END)")
    # persisted: simhash_near_pairs references the fingerprint ~8×
    # (two join sides × band structs); left lazy, Catalyst inlines the
    # 48-term fold into every reference and the element_at calls
    # re-evaluate the pixel transform per term — measured 123 s at
    # sf0.1 vs ~2 s materialized. At scale the fingerprint table is
    # the reusable on-disk artifact anyway (the minhash per_doc shape)
    fps = (docs.select("doc_id", pix.alias("p"))
           .withColumn("tot", total)
           .select("doc_id", pack.alias("simhash"))
           .persist())
    pairs = D.simhash_near_pairs(fps, "doc_id", max_hamming=AHASH_R,
                                 bits=AHASH_PIX)
    return (pairs.groupBy("hamming")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum(F.col("id_a") + F.col("id_b")).alias("id_checksum"))
            .orderBy("hamming"))
