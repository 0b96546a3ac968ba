"""Embedding similarity: cosine expressions, brute-force ANN baseline,
and deterministic random-hyperplane LSH for the scale path.

The dot product / norm are fold expressions over ArrayType(Float) —
JVM-side, no Python. Both Spark's ``aggregate`` and DuckDB's
``list_dot_product`` fold left-to-right over doubles, so results are
bit-identical (verified empirically), making these oracle-checkable.

Scale notes: brute-force top-k against one probe is a single scan with
a k-row sort — fine at any scale for one probe, O(N·Q) for Q probes.
The LSH variant buckets vectors by sign patterns against fixed
hyperplanes so a probe only scans its bucket (recall traded for a
~2^planes fan-in reduction); at 100 TB you'd also write the table
bucketed on ``bucket`` so probes prune partitions.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i, folded left-to-right over doubles."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(vec: Column) -> Column:
    return F.sqrt(dot(vec, vec))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(emb: DataFrame, probe: DataFrame, k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of a single probe vector (broadcast
    the probe; one scan of the corpus; k-row ordered take).
    Columns: neighbor_id, cos_sim."""
    from jcf_nb_migration_spark.registry import spread

    p = F.broadcast(probe.select(F.col(vec_col).alias("__probe_vec")))
    return (
        spread(emb).crossJoin(p)
        .select(
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col(vec_col), F.col("__probe_vec")).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "neighbor_id")
        .limit(k)
    )


def brute_force_topk_pandas(emb: DataFrame, probe: DataFrame, k: int = 10,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Vectorized-Pandas-UDF variant of brute_force_topk: cosines
    computed per Arrow batch with one numpy matrix-vector product
    instead of a per-row fold expression.

    When to use which: the JVM fold is allocation-free and
    whole-stage-codegen'd — it wins on narrow vectors (≤~100 dims).
    A 1536-dim embedding column flips the economics: one BLAS
    matvec per ~10k-row Arrow batch beats 1536 codegen'd
    multiply-adds per row. Same single-scan plan either way; only the
    per-batch kernel differs. Results are numerically equal to ~1e-7
    (numpy pairwise-sums; the fold is strictly sequential), so this
    variant is ranking-tested against the exact fold, not
    hash-compared. Columns: neighbor_id, cos_sim."""
    import numpy as np
    import pandas as pd

    from jcf_nb_migration_spark.registry import spread

    pvec = np.asarray(
        probe.select(vec_col).head()[0], dtype=np.float64)
    pnorm = float(np.sqrt(pvec @ pvec))
    sess = emb.sparkSession
    bpvec = sess.sparkContext.broadcast(pvec)

    def score(batches):
        for pdf in batches:
            m = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            sims = (m @ bpvec.value) / (
                np.sqrt((m * m).sum(axis=1)) * pnorm)
            yield pd.DataFrame({"neighbor_id": pdf[id_col],
                                "cos_sim": sims})

    out = spread(emb.select(id_col, vec_col)).mapInPandas(
        score, schema="neighbor_id long, cos_sim double")
    return out.orderBy(F.desc("cos_sim"), "neighbor_id").limit(k)


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by cosine (broadcast the centroid table; one scan).
    Deterministic ties broken by centroid id. Adds ``cluster``.

    At 100 TB the output is what you partition/bucket the corpus by;
    probes then read only their cluster's files."""
    c = F.broadcast(centroids.select(
        F.col(id_col).alias("__c_id"), F.col(vec_col).alias("__c_vec")))
    scored = (
        emb.crossJoin(c)
        .withColumn("__sim", cosine(F.col(vec_col), F.col("__c_vec")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), F.col("__c_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col(id_col), F.col(vec_col),
                F.col("__c_id").alias("cluster"))
    )


def ivf_ann_probe(emb: DataFrame, centroids: DataFrame, probe_id: int,
                  k: int = 10, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """IVF probe: rank only the probe's cluster by exact cosine —
    the coarse-quantization ANN path (nprobe=1). Columns:
    neighbor_id, cluster, cos_sim."""
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    probe = F.broadcast(
        assigned.where(F.col(id_col) == probe_id)
        .select(F.col(vec_col).alias("__probe_vec"),
                F.col("cluster").alias("__probe_cluster"))
    )
    return (
        assigned.crossJoin(probe)
        .where((F.col("cluster") == F.col("__probe_cluster"))
               & (F.col(id_col) != probe_id))
        .select(F.col(id_col).alias("neighbor_id"), "cluster",
                cosine(F.col(vec_col), F.col("__probe_vec"))
                .alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "neighbor_id")
        .limit(k)
    )


def hyperplane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign of plane p, dim d = parity of
    the first byte of md5(f"{p}:{d}"). Engine-independent (the oracle
    re-derives the same planes), and fixed across runs so bucket
    assignments are stable — a requirement for a persisted ANN index."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).digest()[0]
            row.append(1 if h & 1 else -1)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Bucket id = Σ_p (dot(vec, plane_p) >= 0) · 2^p."""
    bucket = None
    for p, signs in enumerate(planes):
        plane = F.array(*[F.lit(float(s)) for s in signs])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def lsh_ann_same_bucket(emb: DataFrame, probe_id: int, n_planes: int = 6,
                        dim: int = 64, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Approximate NN: candidates = vectors sharing the probe's
    hyperplane-sign bucket, ranked by exact cosine. The bucket column
    is what you'd bucketBy/partition the table on at scale.
    Columns: neighbor_id, bucket, cos_sim."""
    planes = hyperplane_signs(n_planes, dim)
    with_bucket = emb.select(
        F.col(id_col), F.col(vec_col),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    probe = F.broadcast(
        with_bucket.where(F.col(id_col) == probe_id)
        .select(F.col(vec_col).alias("__probe_vec"),
                F.col("bucket").alias("__probe_bucket"))
    )
    return (
        with_bucket.crossJoin(probe)
        .where((F.col("bucket") == F.col("__probe_bucket"))
               & (F.col(id_col) != probe_id))
        .select(
            F.col(id_col).alias("neighbor_id"),
            "bucket",
            cosine(F.col(vec_col), F.col("__probe_vec")).alias("cos_sim"),
        )
    )
