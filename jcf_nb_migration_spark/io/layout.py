"""Write-side data layout optimization: range-cluster + sort so
parquet min/max statistics actually prune.

At 100 TB the cheapest query is the one that never reads the bytes:
parquet stores per-column min/max per row group, and Spark's scan
skips row groups (and whole files) whose stats exclude the pushed
filter. Those stats only help if values are CLUSTERED — a randomly
laid-out table has every file spanning the whole value range, so
nothing skips. ``cluster_write`` produces the layout that makes
pushdown effective:

- ``repartitionByRange(cols)``: range-partitions rows so each output
  file owns a disjoint slice of the key space (global clustering).
- ``sortWithinPartitions(cols)``: orders rows inside each file so row
  groups within a file also get tight, disjoint stats.

``cluster_write`` is single-dimension (or lexicographic multi-column)
clustering: perfect pruning on the leading column, none on the
trailing ones. ``zorder_write`` fixes the multi-dimensional case by
range-clustering on a bit-interleaved z-value, so EVERY participating
column gets partial pruning (each of N files spans roughly a
1/N^(1/d) slice of each of the d dimensions).
"""

from __future__ import annotations

from jcf_nb_migration_spark.io.locking import single_writer

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jcf_nb_migration_spark.localrel import local_df


def cluster_write(df: DataFrame, path: str, cluster_cols: list[str],
                  num_files: int | None = None,
                  mode: str = "overwrite") -> None:
    """Write ``df`` as parquet clustered on ``cluster_cols`` (range
    partitioning across files + sort within files) so filters on those
    columns skip files/row groups via min-max stats."""
    cols = [df[c] for c in cluster_cols]
    if num_files is not None:
        out = df.repartitionByRange(num_files, *cols)
    else:
        out = df.repartitionByRange(*cols)
    out.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def zorder_value(cols: list[Column], mins: list[int], maxs: list[int],
                 bits: int = 8) -> Column:
    """Morton (Z-curve) value of ``cols``: each column is min/max
    scaled to ``bits`` bits, then the bits are interleaved
    (col0 owns positions 0, d, 2d, ...; col1 owns 1, d+1, ...). Pure
    integer Column arithmetic — codegen'd, no UDF. Min/max scaling
    assumes roughly uniform keys; for skewed dimensions substitute
    sampled-quantile bucket ids before interleaving (the scaling, not
    the interleave, is the skew-sensitive part)."""
    nb = 1 << bits
    d = len(cols)
    z = F.lit(0).cast("bigint")
    for j, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        span = max(int(hi) - int(lo) + 1, 1)
        bucket = F.floor((c.cast("bigint") - int(lo)) * nb
                         / F.lit(span)).cast("bigint")
        bucket = F.least(F.greatest(bucket, F.lit(0)), F.lit(nb - 1))
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bucket, i).bitwiseAND(F.lit(1)),
                i * d + j)
    return z


def zorder_write(df: DataFrame, path: str, cluster_cols: list[str],
                 num_files: int, bits: int = 8,
                 mode: str = "overwrite") -> None:
    """Write ``df`` parquet Z-ORDERED on ``cluster_cols``: one agg pass
    collects per-column min/max (driver-side scalars, same control
    plane as broadcast join bounds), rows are range-partitioned and
    sorted on the interleaved z-value, and the helper column is
    dropped before the write (projection preserves sort order). With
    N files over d dimensions, a predicate on ANY clustered column
    skips ~(1 - N^(-1/d)) of the files via min/max stats — the layout
    Delta's OPTIMIZE ZORDER BY produces, built from stock DataFrame
    ops."""
    bounds = df.agg(*[f(c).alias(f"{n}_{c}")
                      for c in cluster_cols
                      for n, f in (("min", F.min), ("max", F.max))]) \
        .head()
    mins = [bounds[f"min_{c}"] for c in cluster_cols]
    maxs = [bounds[f"max_{c}"] for c in cluster_cols]
    z = zorder_value([df[c] for c in cluster_cols], mins, maxs, bits)
    (df.withColumn("__z", z)
       .repartitionByRange(num_files, F.col("__z"))
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode(mode).parquet(path))


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a BUCKETED catalog table: rows are hashed on
    ``bucket_cols`` into ``num_buckets`` files, optionally sorted
    within each bucket.

    This is the co-located-join layout: when two tables are bucketed
    on their join key with the same bucket count, Spark's planner
    proves both sides already share the required hash distribution and
    elides BOTH shuffle exchanges from the SortMergeJoin — at 100 TB
    that turns every fact⋈fact join on the bucket key into a zero-
    shuffle zip of bucket pairs, paid for once at write time. Same
    deal for aggregations grouped on the bucket key. Requires the
    catalog (``saveAsTable``): bucket metadata lives there, plain
    ``.parquet(path)`` writes lose it."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def compact(spark, src_path: str, dst_path: str,
            target_file_bytes: int = 128 * 1024 * 1024,
            cluster_cols: list[str] | None = None,
            mode: str = "overwrite") -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ~``target_file_bytes`` files, optionally re-clustering on
    ``cluster_cols`` while at it. Returns the output file count.

    The operational fix for streaming sinks and over-parallel writes —
    a 100 TB table accreted in 1 MB files spends more time opening
    footers than scanning data. File count = ceil(input_bytes /
    target); input size comes from the file system listing (driver-side
    metadata, no data read). Without cluster columns the rewrite is
    coalesce (narrow — no shuffle, existing order kept); with them it
    is the same repartitionByRange+sort as cluster_write, buying
    min/max pruning in the same pass."""
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))

    df = spark.read.parquet(src_path)
    if cluster_cols:
        out = (df.repartitionByRange(n_files, *[df[c] for c in cluster_cols])
                 .sortWithinPartitions(*cluster_cols))
    else:
        out = df.coalesce(n_files)
    out.write.mode(mode).parquet(dst_path)
    dst = jvm.org.apache.hadoop.fs.Path(dst_path)
    return sum(1 for f in fs.listStatus(dst)
               if f.getPath().getName().endswith(".parquet"))


def ivf_index_write(emb: DataFrame, centroids, path: str,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    extra_cols: tuple = (), mode: str = "overwrite") -> None:
    """Materialize the IVF ANN index as a CLUSTER-PARTITIONED parquet
    layout: assign every vector to its nearest centroid
    (functions.similarity.ivf_assign — narrow, codegen'd, no shuffle)
    and write with ``partitionBy("cluster")``, one hive-style directory
    per inverted list.

    This is the storage half of the IVF scale story: the probe-side
    cluster shortlist becomes a PARTITION filter, so a probe physically
    reads only its ``nprobe`` clusters' files — the other K−nprobe
    directories are never opened (pruned at file-listing time, proven
    in tests/test_layout.py). Rewrite the index when centroids are
    retrained; within a partition, files stay row-group-prunable on
    ``id_col`` if you pass it via sortWithinPartitions downstream."""
    from jcf_nb_migration_spark.functions.similarity import ivf_assign

    assigned = ivf_assign(emb, centroids, id_col, vec_col, extra_cols)
    assigned.write.mode(mode).partitionBy("cluster").parquet(path)


def ivfadc_index_write(coded: DataFrame, path: str,
                       mode: str = "overwrite") -> None:
    """Materialize the IVFADC RESIDUAL-PQ index (the full FAISS-on-disk
    shape, VERDICT r5 item 5): a frame of ``(vec_id, cluster, codes)``
    — residual PQ codes as produced by
    ``pq_encode(residual_frame, residual_books)`` — written with
    ``partitionBy("cluster")``, one hive-style directory per inverted
    list, CODES instead of raw vectors.

    Compared to ``ivf_index_write`` (raw vectors per cluster) this is
    the compressed index: at 100 TB the per-vector payload drops from
    d×4 bytes to m bytes, and the probe reads only its ``nprobe``
    directories of codes (partition-pruned, proven in
    tests/test_layout.py) then scores them by ADC table lookups —
    never touching a raw vector until the optional exact re-rank of
    the shortlist."""
    coded.write.mode(mode).partitionBy("cluster").parquet(path)


def ivfadc_index_probe(spark, path: str, centroids, books,
                       probe_vec: list[float], k: int = 10,
                       nprobe: int = 2, exclude_id: int | None = None,
                       rerank_emb: DataFrame | None = None,
                       id_col: str = "vec_id") -> DataFrame:
    """Probe a materialized IVFADC residual index (ivfadc_index_write
    layout) — the storage-composed twin of the
    ``ivfadc_residual_multiprobe`` query, bit-identical by
    construction: centroids rank driver-side (``_py_cosine`` is the
    same IEEE fold as the in-plan cosine), the probe's residual is
    computed PER PROBED CLUSTER (p − that cluster's centroid — the
    classic single-residual bug avoided), the scan carries
    ``cluster IN shortlist`` so partition pruning lists only the
    probed inverted lists, and ADC distance tables are literal arrays
    indexed by the stored codes. When ``rerank_emb`` (the raw vector
    table) is given, the shortlist joins back for an exact cosine —
    fetching raw vectors for candidates only, never the corpus.
    Columns: neighbor_id, cluster, adc[, cos_exact]."""
    from jcf_nb_migration_spark.functions import similarity as S

    rows = S._centroid_rows(centroids)
    pv = [float(x) for x in probe_vec]
    ranked = sorted(((-_py_cosine(pv, cvec), cid) for cid, cvec in rows))
    shortlist = [cid for _, cid in ranked[:nprobe]]
    cvec_by_id = dict(rows)
    pres = local_df(
        spark, [(cid, [a - b for a, b in zip(pv, cvec_by_id[cid])])
         for cid in shortlist],
        "cluster bigint, prvec array<double>")
    idx = spark.read.parquet(path).where(F.col("cluster").isin(shortlist))
    if exclude_id is not None:
        idx = idx.where(F.col(id_col) != exclude_id)
    idx = _without_vec_tombstoned(idx, spark, path, id_col)
    cand = idx.join(F.broadcast(pres), "cluster")
    sd = len(pv) // len(books)
    adc_terms = []
    for s, book in enumerate(books):
        # distance table indexed by RAW code id (books keep their
        # k-means seed ids, which need not be dense 0..k-1 — a corpus
        # whose leading ids are sparse trains sparse-id books):
        # element_at(dists, c_id+1) must hit c_id's codeword, so gaps
        # get an +inf sentinel no encoder ever emits.
        by_id = {int(cid): [float(x) for x in cvec] for cid, cvec in book}
        slots = [by_id.get(i) for i in range(max(by_id) + 1)]
        dists = F.array(*[
            S.sqdist(F.slice(F.col("prvec"), s * sd + 1, sd), F.lit(cvec))
            if cvec is not None else F.lit(float("inf"))
            for cvec in slots])
        adc_terms.append(
            F.element_at(dists, (F.col("codes")[s] + 1).cast("int")))
    adc = adc_terms[0]
    for term in adc_terms[1:]:
        adc = adc + term
    scored = cand.select(F.col(id_col).alias("neighbor_id"),
                         "cluster", F.round(adc, 9).alias("adc"))
    if rerank_emb is not None:
        plit = F.lit([float(x) for x in pv])
        scored = (scored
                  .join(rerank_emb.select(
                      F.col(id_col).alias("neighbor_id"), "embedding"),
                      "neighbor_id")
                  .select("neighbor_id", "cluster", "adc",
                          S.cosine(F.col("embedding"), plit)
                           .alias("cos_exact")))
    return scored.orderBy("adc", "neighbor_id").limit(k)


def _py_cosine(a: list[float], b: list[float]) -> float:
    """Left-to-right float64 cosine — the same IEEE operation order as
    the JVM aggregate fold (functions.similarity.cosine), so a
    driver-side centroid shortlist is bit-identical to the in-plan
    one."""
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
        na = na + x * x
        nb = nb + y * y
    return dot / (na ** 0.5 * nb ** 0.5)


def ivf_index_probe(spark, path: str, centroids, probe_vec: list[float],
                    k: int = 10, nprobe: int = 2,
                    exclude_id: int | None = None,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Probe a materialized IVF index (ivf_index_write layout): rank
    centroids driver-side (they are control-plane metadata, already on
    the driver), then read the index with ``cluster IN shortlist`` —
    partition pruning turns the filter into a directory listing of
    only the probed inverted lists. Exact cosine re-rank over those
    candidates, same tie-breaks as ivf_ann_probe (higher cosine, then
    lower id). Columns: neighbor_id, cluster, cos_sim."""
    from jcf_nb_migration_spark.functions import similarity as S

    rows = S._centroid_rows(centroids)
    pv = [float(x) for x in probe_vec]
    ranked = sorted(((-_py_cosine(pv, cvec), cid) for cid, cvec in rows))
    shortlist = [cid for _, cid in ranked[:nprobe]]
    idx = spark.read.parquet(path).where(F.col("cluster").isin(shortlist))
    if exclude_id is not None:
        idx = idx.where(F.col(id_col) != exclude_id)
    # lazy-deletion gate (ivf_index_delete): tombstoned vectors never
    # surface; reclaim rides vacuum or the next maintain rebuild
    idx = _without_vec_tombstoned(idx, spark, path, id_col)
    plit = F.lit([float(x) for x in pv])
    return (idx.select(F.col(id_col).alias("neighbor_id"), "cluster",
                       S.cosine(F.col(vec_col), plit).alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), "neighbor_id")
            .limit(k))


def _ledger_skip(path: str, batch_id) -> tuple[str | None, bool]:
    """Replay-ledger check shared by every appendable index layout
    (flat IVF, IVFADC, lexical): returns (marker, skip). A batch that
    already committed returns skip=True; otherwise the ledger dir is
    ensured and the caller commits via _ledger_commit AFTER its
    append (the crash window between them is the documented
    plain-parquet residual). Driver-local filesystem stand-in."""
    if batch_id is None:
        return None, False
    import os as _os

    ledger = _os.path.join(path, "_appended_batches")
    marker = _os.path.join(ledger, str(batch_id))
    if _os.path.exists(marker):
        return marker, True
    _os.makedirs(ledger, exist_ok=True)
    return marker, False


def _ledger_commit(marker: str | None) -> None:
    if marker is not None:
        open(marker, "w").close()


@single_writer
def ivf_index_append(new_emb: DataFrame, centroids, path: str,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     extra_cols: tuple = (),
                     batch_id: int | str | None = None) -> bool:
    """INCREMENTAL index maintenance (VERDICT r6 item 4): assign a new
    vector batch to the EXISTING centroids and append it to the
    materialized IVF index — dynamic partition overwrite is not needed
    because parquet append under ``partitionBy`` only ADDS files to the
    touched ``cluster=`` directories; every existing file (and every
    untouched inverted list) is left byte-identical, so a 100 TB index
    absorbs a daily embedding batch by writing batch-sized data, not
    index-sized.

    The append is exact-by-construction for probing: a probe reads
    whole cluster directories, and nearest-centroid assignment of the
    new batch uses the same ``ivf_assign`` arithmetic as the original
    build, so probe(base ∪ batch) ≡ probe(rebuild(base ∪ batch)) as
    long as centroids are UNCHANGED (pinned in tests/test_layout.py).
    What appends degrade is centroid QUALITY — new data drawn from a
    drifted distribution makes lists baggy (lower member-to-centroid
    cosine), hurting recall-per-nprobe, not correctness. Monitor with
    ``ivf_centroid_drift`` and rebuild via ``ivf_index_write`` +
    retrained centroids when it flags.

    ``batch_id`` (pass Structured Streaming's foreachBatch id) makes
    replayed deliveries idempotent: a committed-batch ledger under
    ``path/_appended_batches/`` skips a batch that already landed
    (returns False). The marker is written AFTER the append, so the
    residual window is a crash between append and marker — a replay
    then duplicates that one batch; closing it needs a transactional
    table format (Delta/Iceberg — environment-gated here). Plain
    parquet + ledger is the standard at-least-once-minus-replays
    shape, and it is what turns at-least-once foreachBatch delivery
    into effectively-once for this sink."""
    from jcf_nb_migration_spark.functions.similarity import ivf_assign

    _recover_epoch_residue(path)  # an append into a cluster dir that a
    #   crashed vacuum parked in _swap_old would recreate the live dir
    #   and make later recovery dispose the parked (only) copy
    marker, skip = _ledger_skip(path, batch_id)
    if skip:
        return False  # replayed delivery: already appended
    assigned = ivf_assign(new_emb, centroids, id_col, vec_col, extra_cols)
    assigned.write.mode("append").partitionBy("cluster").parquet(path)
    _ledger_commit(marker)
    return True


def ivf_centroid_drift(spark, path: str, centroids,
                       min_mean_cos: float = 0.5,
                       vec_col: str = "embedding") -> DataFrame:
    """Per-cluster drift report over a materialized IVF index — the
    retrain trigger for the append path (the cosine-vs-assigned-
    centroid machinery of the source_embedding_drift query applied to
    the on-disk inverted lists): member count, mean and minimum
    member-to-centroid cosine, and a ``retrain`` flag where the mean
    drops below ``min_mean_cos`` — or where a cluster present ON DISK
    has no centroid in the passed set at all (null mean/min): the
    orphaned-inverted-list state a retrain-before-rebuild window
    creates, which an inner join would silently drop from the report.
    One scan of the index, one bounded (≤K rows) aggregate; centroids
    broadcast as control-plane metadata. A flagged cluster means
    probes are routed by stale geometry — retrain/rebuild before
    recall quietly sags.
    Columns: cluster, n_vectors, mean_cos, min_cos, retrain."""
    from jcf_nb_migration_spark.functions import similarity as S

    rows = S._centroid_rows(centroids)
    cent = local_df(
        spark, [(int(cid), [float(x) for x in cvec]) for cid, cvec in rows],
        "cluster bigint, cvec array<double>")
    idx = (spark.read.parquet(path)
           .withColumn("cluster", F.col("cluster").cast("bigint")))
    cos = S.cosine(F.col(vec_col), F.col("cvec"))
    return (idx.join(F.broadcast(cent), "cluster", "left")
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 F.round(F.avg(cos), 9).alias("mean_cos"),
                 F.round(F.min(cos), 9).alias("min_cos"))
            .withColumn("retrain",
                        F.col("mean_cos").isNull()
                        | (F.col("mean_cos") < min_mean_cos))
            .orderBy("cluster"))


@single_writer
def ivf_index_maintain(spark, path: str, centroids,
                       min_mean_cos: float = 0.5, k: int = 8,
                       iters: int = 2, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       extra_cols: tuple = ()):
    """Close the append→drift→rebuild loop: run ``ivf_centroid_drift``
    and, if ANY cluster flags (baggy list or orphaned directory),
    retrain k-means over the index's CURRENT contents and rewrite the
    whole layout — the operation a scheduler runs nightly against an
    append-maintained index. Returns ``(rebuilt, centroids)`` where
    ``centroids`` are the retrained set when rebuilt, else the input.

    The rebuild stages into ``<path>.rebuild`` and swaps via two
    directory renames (the index is being READ as rebuild input — an
    in-place overwrite would pull the data out from under the lazy
    scan), so a probe sees either the old index or the new one, never
    a half-written mix; the append ledger resets with the swap (a new
    index epoch owes nothing to the old batch ids). Cost is one full
    read of the index — batch-sized appends amortize this to the
    retrain cadence, exactly like any compaction job."""
    import os
    import shutil

    _recover_epoch_residue(path)  # BEFORE any read: a cluster parked
    #   by a crashed vacuum is invisible to the scans below — a
    #   rebuild staged without it would drop the cluster from the new
    #   epoch entirely
    report = ivf_centroid_drift(spark, path, centroids,
                                min_mean_cos, vec_col).collect()
    if not any(r["retrain"] for r in report):
        return False, centroids
    from jcf_nb_migration_spark.functions.similarity import kmeans_train

    current = (spark.read.parquet(path)
               .select(id_col, vec_col, *extra_cols))
    # the rebuild is also the reclaim point: tombstoned vectors
    # (ivf_index_delete) drop out of the new epoch
    current = _without_vec_tombstoned(current, spark, path, id_col)
    new_centroids = kmeans_train(current, k=k, iters=iters,
                                 id_col=id_col, vec_col=vec_col)
    staging = path.rstrip("/") + ".rebuild"
    ivf_index_write(current, new_centroids, staging,
                    id_col=id_col, vec_col=vec_col,
                    extra_cols=extra_cols)
    # commit-point-aware swap: snapshots + history carry across the
    # epoch, old files retire instead of dying (snapshot section)
    _epoch_swap(path, staging)
    return True, new_centroids


# ---- IVFADC (residual-PQ) incremental maintenance (VERDICT r7 item 3)


QUANT_STATS_SUBDIR = "_quant_stats"


def _residuals_frame(emb: DataFrame, centroids,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(id, cluster, rvec): nearest-centroid assignment + residual
    against the ASSIGNED centroid — one broadcast join + one codegen'd
    zip_with, the same arithmetic as the oracle-verified
    similarity_search._residual_frame (kept expression-identical so an
    appended batch encodes exactly as a rebuild would)."""
    from jcf_nb_migration_spark.functions import similarity as S

    rows = S._centroid_rows(centroids)
    assigned = S.ivf_assign(emb, rows, id_col, vec_col)
    cent = local_df(
        emb.sparkSession, [(cid, [float(x) for x in cvec]) for cid, cvec in rows],
        "cluster bigint, c_vec array<double>")
    return (assigned.join(F.broadcast(cent), "cluster")
            .select(id_col, "cluster",
                    F.zip_with(S.as_double(F.col(vec_col)),
                               F.col("c_vec"),
                               lambda a, b: a - b).alias("rvec")))


def ivfadc_encode_batch(emb: DataFrame, centroids, books,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Encode vectors under FROZEN geometry (existing coarse centroids
    + existing residual codebooks) → ``(id, cluster, codes, qerr)``.

    ``codes`` uses pq_encode's exact argmin expression (array_min over
    struct(dist, c_id) — ties to the lowest code id, RAW seed-derived
    ids exactly as pq_encode writes them; the probe's ADC tables are
    id-indexed so sparse ids score correctly), so a batch encoded
    incrementally is bit-identical to the same batch encoded in a
    full rebuild — or by the legacy pq_encode path. ``qerr`` is the summed squared-L2 PQ
    reconstruction error of the residual — the residual-space drift
    signal: when new data pulls away from the distribution the books
    were trained on, qerr rises while codes stay valid (ADC recall
    sags, correctness doesn't). One narrow codegen'd projection."""
    from jcf_nb_migration_spark.functions import similarity as S

    res = _residuals_frame(emb, centroids, id_col, vec_col)
    sd = len(books[0][0][1])
    code_cols, err_cols = [], []
    for s, rows in enumerate(books):
        best = F.array_min(
            S._centroid_dists(F.slice(F.col("rvec"), s * sd + 1, sd),
                              rows))
        code_cols.append(best["c_id"])
        err_cols.append(best["dist"])
    qerr = err_cols[0]
    for term in err_cols[1:]:
        qerr = qerr + term
    return res.select(F.col(id_col), "cluster",
                      F.array(*code_cols).alias("codes"),
                      qerr.alias("qerr"))


def _write_quant_stats(enc: DataFrame, path: str, batch_id: str) -> None:
    """Per-cluster PQ reconstruction-error scalars for one batch:
    (batch_id, cluster, n_vectors, sum_qerr). Integer counts + one
    double sum — additive, so any span of batches folds exactly."""
    (enc.groupBy("cluster")
     .agg(F.count(F.lit(1)).alias("n_vectors"),
          F.sum("qerr").alias("sum_qerr"))
     .select(F.lit(batch_id).alias("batch_id"), "cluster",
             "n_vectors", "sum_qerr")
     .write.mode("append")
     .parquet(os.path.join(path, QUANT_STATS_SUBDIR)))


def ivfadc_index_build(emb: DataFrame, centroids, books, path: str,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> None:
    """Build (or rebuild) the maintained IVFADC layout: encode the
    corpus under the given geometry, write codes partitionBy(cluster)
    (ivfadc_index_write's layout — probe-compatible), and record the
    base quantization-error stats the drift monitor compares appended
    batches against. Clears any prior ledger/stats (local-FS stand-in,
    like the IVF ledger)."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    enc = ivfadc_encode_batch(emb, centroids, books, id_col, vec_col)
    enc = enc.persist()
    try:
        ivfadc_index_write(enc.drop("qerr"), path)
        _write_quant_stats(enc, path, "base")
    finally:
        enc.unpersist()


@single_writer
def ivfadc_index_append(new_emb: DataFrame, centroids, books, path: str,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        batch_id: int | str | None = None) -> bool:
    """INCREMENTAL IVFADC maintenance (VERDICT r7 item 3): encode a
    new vector batch with the EXISTING coarse centroids and residual
    codebooks and append it to the materialized index — batch-sized
    writes into only the touched ``cluster=`` directories, exactly
    like ``ivf_index_append`` (whose ledger contract this reuses:
    ``batch_id`` turns at-least-once foreachBatch delivery
    effectively-once; the crash window between append and marker is
    the documented plain-parquet residual).

    probe(base ∪ batch) ≡ probe(rebuild(base ∪ batch)) by
    construction — encoding is a pure function of (vector, centroids,
    books) and the probe reads whole cluster directories — pinned in
    tests/test_layout.py. What appends DEGRADE is codebook fit: a
    drifted batch encodes to larger reconstruction error (recorded in
    the quant-stats sidecar per batch), hurting ADC recall, never
    correctness. Monitor with ``ivfadc_quant_drift``; rebuild via
    ``ivfadc_index_maintain`` when it flags."""
    if str(batch_id) == "base":
        # 'base' is the drift monitor's reserved baseline epoch — an
        # append recorded under it would fold into mean_qerr_base and
        # silently de-sensitize the retrain trigger.
        raise ValueError("batch_id 'base' is reserved for the build's "
                         "baseline quant stats")
    _recover_epoch_residue(path)  # same parked-cluster hazard as
    #   ivf_index_append
    marker, skip = _ledger_skip(path, batch_id)
    if skip:
        return False  # replayed delivery: already appended
    enc = ivfadc_encode_batch(new_emb, centroids, books, id_col, vec_col)
    enc = enc.persist()
    try:
        (enc.drop("qerr").write.mode("append")
         .partitionBy("cluster").parquet(path))
        _write_quant_stats(enc, path,
                           "unledgered" if batch_id is None
                           else str(batch_id))
    finally:
        enc.unpersist()
    _ledger_commit(marker)
    return True


def ivfadc_quant_drift(spark, path: str,
                       rel_threshold: float = 2.0) -> DataFrame:
    """Residual-space drift report over a maintained IVFADC index —
    the PQ analogue of ``ivf_centroid_drift``, computed WITHOUT raw
    vectors (the index stores codes only): per cluster, the mean PQ
    reconstruction error of the base build vs everything appended
    since. ``retrain`` flags where appended error exceeds
    ``rel_threshold ×`` base error — the books no longer fit the data
    arriving — or where appends landed in a cluster the base never
    saw (null base mean, the orphan case). Reads only the bounded
    stats sidecar (≤ batches × K rows).
    Columns: cluster, n_base, mean_qerr_base, n_appended,
    mean_qerr_appended, retrain."""
    stats = spark.read.parquet(os.path.join(path, QUANT_STATS_SUBDIR))
    base = (stats.where(F.col("batch_id") == "base")
            .groupBy("cluster")
            .agg(F.sum("n_vectors").alias("n_base"),
                 (F.sum("sum_qerr") / F.sum("n_vectors"))
                 .alias("mean_qerr_base")))
    appended = (stats.where(F.col("batch_id") != "base")
                .groupBy("cluster")
                .agg(F.sum("n_vectors").alias("n_appended"),
                     (F.sum("sum_qerr") / F.sum("n_vectors"))
                     .alias("mean_qerr_appended")))
    return (base.join(appended, "cluster", "full_outer")
            .select("cluster",
                    F.coalesce("n_base", F.lit(0)).alias("n_base"),
                    F.round("mean_qerr_base", 9)
                    .alias("mean_qerr_base"),
                    F.coalesce("n_appended", F.lit(0))
                    .alias("n_appended"),
                    F.round("mean_qerr_appended", 9)
                    .alias("mean_qerr_appended"))
            .withColumn(
                "retrain",
                F.col("mean_qerr_appended").isNotNull()
                & (F.col("mean_qerr_base").isNull()
                   | (F.col("mean_qerr_appended")
                      > rel_threshold * F.col("mean_qerr_base"))))
            .orderBy("cluster"))


@single_writer
def ivfadc_index_maintain(spark, path: str, emb: DataFrame, centroids,
                          books, rel_threshold: float = 2.0,
                          iters: int = 2, id_col: str = "vec_id",
                          vec_col: str = "embedding"):
    """Close the IVFADC append→drift→rebuild loop (the residual-PQ
    twin of ``ivf_index_maintain``): run ``ivfadc_quant_drift`` and,
    if ANY cluster flags, retrain the residual codebooks on the
    CURRENT corpus residuals (``emb`` — the raw vector table the
    maintenance job owns; the index itself stores only codes) under
    the UNCHANGED coarse centroids, then stage a full re-encode and
    swap atomically (two renames — a concurrent probe sees old or new,
    never a mix). Coarse-geometry drift stays ``ivf_index_maintain``'s
    job; this layer owns codebook fit. The ledger and stats reset with
    the swap (a new epoch owes nothing to old batch ids). Returns
    ``(rebuilt, books)`` — the retrained books when rebuilt, else the
    input."""
    import shutil

    from jcf_nb_migration_spark.functions.similarity import pq_train

    _recover_epoch_residue(path)  # as in ivf_index_maintain: the
    #   rebuild below must see clusters a crashed vacuum parked
    report = ivfadc_quant_drift(spark, path, rel_threshold).collect()
    if not any(r["retrain"] for r in report):
        return False, books
    m, k = len(books), len(books[0])
    # rebuild = reclaim point for tombstoned vectors, as in
    # ivf_index_maintain (emb is the raw table; the index's deletes
    # must not re-enter the new epoch through it)
    emb = _without_vec_tombstoned(emb, spark, path, id_col)
    res = _residuals_frame(emb, centroids, id_col, vec_col).persist()
    try:
        new_books = pq_train(res, m=m, k=k, iters=iters,
                             id_col=id_col, vec_col="rvec")
        staging = path.rstrip("/") + ".rebuild"
        ivfadc_index_build(emb, centroids, new_books, staging,
                           id_col, vec_col)
    finally:
        res.unpersist()
    # commit-point-aware swap, as in ivf_index_maintain
    _epoch_swap(path, staging)
    return True, new_books


# ---- vector deletion (r10): tombstones + cluster-COW vacuum ---------

VEC_TOMBSTONES_SUBDIR = "_tombstones"  # underscore-prefixed: hidden
#   from spark.read.parquet(path)'s partition discovery, like the
#   ledger and quant-stats sidecars


def vec_tombstone_ids(spark, path: str):
    """Distinct tombstoned vec_ids of the vector index at ``path``
    (flat IVF and IVFADC share the sidecar), or None when no deletion
    has landed. Delete requests are id-bounded, so the frame
    broadcasts at every probe."""
    tomb_dir = os.path.join(path, VEC_TOMBSTONES_SUBDIR)
    if not os.path.isdir(tomb_dir):
        return None
    return spark.read.parquet(tomb_dir).select("vec_id").distinct()


@single_writer
def ivf_index_delete(spark, path: str, vec_ids,
                     batch_id=None) -> bool:
    """Delete vectors from a materialized IVF/IVFADC index LAZILY:
    ids land in a hidden tombstone sidecar and every probe excludes
    them immediately; physical reclaim is ``ivf_index_vacuum`` (a
    touched-cluster COW) or the next maintain rebuild. Lazy is the
    right default here for a different reason than the lexical index:
    a vector's cluster is only discoverable by scanning the inverted
    lists for its id (the index is the only place the assignment
    lives), so an eager delete would pay that scan on the hot path —
    vacuum batches it. Ids absent from the index are no-ops.
    Ledger-idempotent under ``vdel-<batch_id>``."""
    import numbers

    bad = [i for i in vec_ids
           if isinstance(i, bool) or not isinstance(i, numbers.Integral)]
    if bad:
        raise TypeError(f"delete ids must be integers, got {bad[:3]!r}")
    ids = sorted({int(i) for i in vec_ids})
    if not ids:
        return False
    _recover_epoch_residue(path)
    marker, skip = _ledger_skip(
        path, None if batch_id is None else f"vdel-{batch_id}")
    if skip:
        return False
    (local_df(spark, [(i,) for i in ids], "vec_id bigint")
     .coalesce(1).write.mode("append")
     .parquet(os.path.join(path, VEC_TOMBSTONES_SUBDIR)))
    _ledger_commit(marker)
    return True


def _without_vec_tombstoned(idx, spark, path: str, id_col: str):
    """Probe-side exclusion shared by ivf_index_probe and
    ivfadc_index_probe: one broadcast anti-join against the
    (request-bounded) tombstone set."""
    tomb = vec_tombstone_ids(spark, path)
    if tomb is None:
        return idx
    return idx.join(
        F.broadcast(tomb.withColumnRenamed("vec_id", id_col)),
        id_col, "left_anti")


@single_writer
def ivf_index_vacuum(spark, path: str, id_col: str = "vec_id") -> dict:
    """Physically reclaim tombstoned vectors: rewrite ONLY the cluster
    directories that contain them (discovered by one id-column scan —
    column-pruned, and the cost vacuum exists to batch), stage the
    filtered rows beside the index, swap each touched ``cluster=K``
    directory, clear the tombstones. Works unchanged for the flat IVF
    layout (raw vectors) and the IVFADC layout (codes) — the rewrite
    filters on the id column and never interprets the payload.
    Returns ``{"reclaimed_ids": n, "touched_clusters": m}``."""
    import shutil

    _recover_epoch_residue(path)  # a crashed maintain must not hide state
    tomb = vec_tombstone_ids(spark, path)
    if tomb is None:
        return {"reclaimed_ids": 0, "touched_clusters": 0}
    tomb = tomb.withColumnRenamed("vec_id", id_col)
    idx = spark.read.parquet(path)
    dead = idx.join(F.broadcast(tomb), id_col, "left_semi")
    # one pass over the dead set for both the touched-cluster list and
    # the reclaimed-id count (cluster set is k-bounded by the layout).
    # collect_set silently DROPS null clusters (unlike the pre-r13
    # distinct().collect()); a dead row living only under a null
    # cluster would otherwise clear tombstones without rewriting
    # anything, resurrecting deleted vectors. The engine's writers
    # never produce a null cluster, so count-and-raise (ADVICE r13).
    dead_row = dead.agg(
        F.collect_set("cluster").alias("cs"),
        F.countDistinct(id_col).alias("n"),
        F.count(F.when(F.col("cluster").isNull(), 1)).alias("nulls")).head()
    if int(dead_row["nulls"]):
        raise ValueError(
            f"ivf_index_vacuum: {int(dead_row['nulls'])} tombstoned "
            f"row(s) under a NULL cluster in {path!r} — the index was "
            "not written by this engine's writers; refusing to vacuum "
            "(the null-cluster dir cannot be staged and its tombstones "
            "must not be cleared)")
    touched = sorted(dead_row["cs"])
    n_ids = int(dead_row["n"])
    if not touched:
        _vec_dispose(path, os.path.join(path, VEC_TOMBSTONES_SUBDIR),
                     VEC_TOMBSTONES_SUBDIR)
        return {"reclaimed_ids": 0, "touched_clusters": 0}
    staging = path.rstrip("/") + ".vacuum"
    shutil.rmtree(staging, ignore_errors=True)
    (idx.where(F.col("cluster").isin(touched))
     .join(F.broadcast(tomb), id_col, "left_anti")
     .write.mode("overwrite").partitionBy("cluster").parquet(staging))
    # Superseded cluster dirs retire to _history once any commit point
    # exists — see the snapshot section below. The displaced dir parks
    # under path/_swap_old/cluster=K, NEVER at path/cluster=K.old: an
    # underscore-prefixed dir is invisible to Spark's partition
    # discovery, while a `cluster=K.old` sibling is parsed as a
    # partition VALUE — it flips the cluster column to STRING for
    # every reader and fails probes' `cluster IN (...)` bigint casts
    # (measured: NumberFormatException on the isin filter), turning a
    # crash window into an index-wide read outage.
    for cid in touched:
        live_dir = os.path.join(path, f"cluster={cid}")
        staged_dir = os.path.join(staging, f"cluster={cid}")
        old = os.path.join(path, VEC_SWAP_OLD_SUBDIR, f"cluster={cid}")
        _vec_dispose(path, old, f"cluster={cid}")
        os.makedirs(os.path.dirname(old), exist_ok=True)
        os.rename(live_dir, old)
        if os.path.isdir(staged_dir):  # absent = cluster fully deleted
            os.rename(staged_dir, live_dir)
        _vec_dispose(path, old, f"cluster={cid}")
    _rmdir_if_empty(os.path.join(path, VEC_SWAP_OLD_SUBDIR))
    shutil.rmtree(staging, ignore_errors=True)
    _vec_dispose(path, os.path.join(path, VEC_TOMBSTONES_SUBDIR),
                 VEC_TOMBSTONES_SUBDIR)
    return {"reclaimed_ids": int(n_ids),
            "touched_clusters": len(touched)}


# ---- commit points (snapshots) on the vector index (r11) -------------
#
# The lexical index's snapshot section (io/lexical.py) applied the
# unified commit protocol — record file lists, COW-retire superseded
# files to _history, restore by two-place moves — to the BM25 layout.
# This is the same protocol on the IVF/IVFADC vector layouts, with two
# vector-specific twists:
#
# - Files are keyed by RELATIVE PATH (``cluster=3/part-….parquet``,
#   ``_tombstones/part-….parquet``, ``_quant_stats/…``), because the
#   index is a hive-partitioned tree, not three flat dirs. History
#   mirrors the tree under ``path/_history/``.
# - A snapshot may embed the caller's CENTROIDS (and the restore
#   returns them): the coarse quantizer lives with the caller, not in
#   the files, and a commit point that spans ``ivf_index_maintain``'s
#   retrain is only probe-able with the geometry it was taken under.
#   This is exactly why the maintain epoch swap retires the old
#   epoch's files instead of deleting them once any snapshot exists.
#
# Append/delete are additive and never invalidate a commit point;
# vacuum's touched-cluster swaps and both maintains' whole-dir epoch
# swaps retire-instead-of-delete once a snapshot exists (plain
# deletion — the pre-snapshot behavior, zero history accretion —
# otherwise). The append ledger is delivery bookkeeping, not state: a
# restore does not reopen replayed batch ids (docstore_restore's
# contract). Local-FS moves, same stand-in as the ledger. Snapshots
# are ADMIN operations (off the probe path); at pathological file
# counts the JSON file list upgrades mechanically to a parquet
# manifest segment (io/zorder.py's shape) — resolution is already
# relpath-keyed.

VEC_SNAPSHOTS_SUBDIR = "_snapshots"
VEC_HISTORY_SUBDIR = "_history"
VEC_SWAP_OLD_SUBDIR = "_swap_old"  # vacuum's displaced-cluster parking
#   lot: underscore-prefixed so Spark's partition discovery never sees
#   it (a `cluster=K.old` SIBLING would be parsed as a partition value
#   and flip the cluster column to string for every reader)
_VEC_CONTROL_DIRS = (VEC_SNAPSHOTS_SUBDIR, VEC_HISTORY_SUBDIR)


def _vec_snap_dir(path: str) -> str:
    return os.path.join(path, VEC_SNAPSHOTS_SUBDIR)


def _vec_snap_path(path: str, sid: int) -> str:
    return os.path.join(_vec_snap_dir(path), f"s{sid:05d}.json")


def _vec_list_snapshots(path: str) -> list[int]:
    import re

    d = _vec_snap_dir(path)
    if not os.path.isdir(d):
        return []
    return sorted(int(f[1:6]) for f in os.listdir(d)
                  if re.fullmatch(r"s\d{5}\.json", f))


def _vec_has_snapshots(path: str) -> bool:
    return bool(_vec_list_snapshots(path))


def _vec_rel_parquet(path: str) -> list[str]:
    """Relative paths of every data/sidecar parquet file under the
    index tree, skipping the snapshot/history control dirs and any
    ``*.old`` swap residue (transient, never part of a commit
    point)."""
    out = []
    for root, dirs, files in os.walk(path):
        rel = os.path.relpath(root, path)
        top = rel.split(os.sep)[0]
        if (top in _VEC_CONTROL_DIRS or top == VEC_SWAP_OLD_SUBDIR
                or top.endswith(".old")):
            dirs[:] = []
            continue
        for f in files:
            if f.endswith(".parquet"):
                out.append(f if rel == "." else os.path.join(rel, f))
    return sorted(out)


def _vec_retire_file(path: str, abs_file: str, rel: str) -> None:
    hist = os.path.join(path, VEC_HISTORY_SUBDIR, rel)
    os.makedirs(os.path.dirname(hist), exist_ok=True)
    os.replace(abs_file, hist)


def _vec_retire_dir(path: str, src_dir: str, rel_prefix: str) -> None:
    """Move every parquet under ``src_dir`` (recursively) into
    ``path/_history/<rel_prefix>/…`` preserving structure, then drop
    the dir (non-parquet residue carries no data)."""
    import shutil

    if os.path.isdir(src_dir):
        for root, _dirs, files in os.walk(src_dir):
            rel_root = os.path.relpath(root, src_dir)
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                rel = (os.path.join(rel_prefix, f) if rel_root == "."
                       else os.path.join(rel_prefix, rel_root, f))
                _vec_retire_file(path, os.path.join(root, f), rel)
        shutil.rmtree(src_dir, ignore_errors=True)


def _vec_dispose(path: str, src_dir: str, rel_prefix: str) -> None:
    """Retire when any commit point exists, plain-delete otherwise —
    the disposal policy every destructive vector-index op routes
    through."""
    import shutil

    if _vec_has_snapshots(path):
        _vec_retire_dir(path, src_dir, rel_prefix)
    else:
        shutil.rmtree(src_dir, ignore_errors=True)


def _absorb_old_epoch(path: str, old: str) -> None:
    """Fold a superseded epoch dir into the live index: control dirs
    (snapshots + history) move across — file-by-file, never
    overwriting, so a crashed prior absorb is re-runnable — and every
    data/sidecar parquet retires into the live ``_history``."""
    import shutil

    for sub in _VEC_CONTROL_DIRS:
        src = os.path.join(old, sub)
        if not os.path.isdir(src):
            continue
        for root, _dirs, files in os.walk(src):
            rel_root = os.path.relpath(root, src)
            for f in files:
                dst = (os.path.join(path, sub, f) if rel_root == "."
                       else os.path.join(path, sub, rel_root, f))
                if not os.path.exists(dst):
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.replace(os.path.join(root, f), dst)
        shutil.rmtree(src, ignore_errors=True)
    _vec_retire_dir(path, old, "")


def _rmdir_if_empty(d: str) -> None:
    try:
        os.rmdir(d)
    except OSError:
        pass  # absent, or still holds residue a recovery will handle


def _recover_vacuum_residue(path: str) -> None:
    """Fold crash residue from ``ivf_index_vacuum``'s per-cluster
    swaps back into a consistent index. The vacuum parks each
    displaced cluster dir at ``_swap_old/cluster=K`` (and pre-fix
    crashes may have left a legacy ``cluster=K.old`` sibling — which
    additionally breaks every reader by flipping the partition column
    to string, so it must not survive recovery). Per residue dir:

    - live ``cluster=K`` present — crash after the swap-in, before
      disposal: dispose the residue (retire-or-delete).
    - live missing, staging ``<path>.vacuum`` COMPLETE (Spark's
      ``_SUCCESS`` marker): the staged rewrite finished before the
      crash — complete the swap (staged dir in; absent staged dir
      means the cluster was fully deleted), then dispose the residue.
    - live missing, staging incomplete/missing: roll back — the
      parked dir is the only live copy of the cluster."""
    import re
    import shutil as _sh

    staging = path.rstrip("/") + ".vacuum"
    staged_ok = os.path.exists(os.path.join(staging, "_SUCCESS"))
    residues: list[tuple[str, str]] = []  # (residue_dir, cluster=K)
    swap_root = os.path.join(path, VEC_SWAP_OLD_SUBDIR)
    if os.path.isdir(swap_root):
        residues += [(os.path.join(swap_root, e), e)
                     for e in os.listdir(swap_root)
                     if e.startswith("cluster=")]
    if os.path.isdir(path):
        residues += [(os.path.join(path, e), e[:-len(".old")])
                     for e in os.listdir(path)
                     if re.fullmatch(r"cluster=[^/]+\.old", e)]
    for res_dir, part in residues:
        live_dir = os.path.join(path, part)
        if os.path.isdir(live_dir):
            _vec_dispose(path, res_dir, part)
        elif staged_ok:
            staged_dir = os.path.join(staging, part)
            if os.path.isdir(staged_dir):
                os.rename(staged_dir, live_dir)
            _vec_dispose(path, res_dir, part)
        else:
            os.rename(res_dir, live_dir)  # only full copy: roll back
    _rmdir_if_empty(swap_root)
    if residues:
        _sh.rmtree(staging, ignore_errors=True)


def _recover_epoch_residue(path: str) -> None:
    """Fold crash residue from a prior epoch swap (a leftover
    ``<path>.old``) back into the live index — RECOVERED, not blindly
    deleted, when either side holds commit points (the zorder_maintain
    r11 lesson: the .old dir may be the only copy of snapshot state,
    because the swap moves control dirs across only AFTER the
    renames). Called at the start of every snapshot-aware entry point
    so a crashed maintain can't silently strand commit points until
    the next maintain.

    Crash states (the io/lexical.py _recover_swap_residue trio):

    - ``.old`` present, live dir present — crash after the second
      rename, before disposal: absorb-or-delete the old epoch.
    - ``.old`` present, live dir MISSING, ``.rebuild`` staging present
      — crash BETWEEN _epoch_swap's two renames: the staged rebuild
      had fully completed (ivf/ivfadc maintain write it before any
      rename), so COMPLETE the swap, then absorb/dispose old.
    - ``.old`` present, live dir MISSING, staging missing — roll BACK
      to the old epoch: it is the only complete copy of the index."""
    import shutil

    old = path.rstrip("/") + ".old"
    if not os.path.isdir(old):
        _recover_vacuum_residue(path)  # per-cluster swap residue
        return
    if not os.path.isdir(path):
        staging = path.rstrip("/") + ".rebuild"
        if os.path.isdir(staging):
            os.rename(staging, path)  # complete the crashed swap
        else:
            os.rename(old, path)      # roll back: only full copy
            _recover_vacuum_residue(path)
            return
    if _vec_has_snapshots(old) or _vec_has_snapshots(path):
        _absorb_old_epoch(path, old)
    else:
        shutil.rmtree(old)
    _recover_vacuum_residue(path)


def _epoch_swap(path: str, staging: str) -> None:
    """Swap a staged full rebuild into place (both maintains),
    carrying snapshots + history across the epoch boundary."""
    import shutil

    _recover_epoch_residue(path)  # a crashed prior swap
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    os.rename(staging, path)
    if _vec_has_snapshots(old):
        _absorb_old_epoch(path, old)
    else:
        shutil.rmtree(old)


def _vec_read_snapshot(path: str, sid: int) -> dict:
    import json

    sp = _vec_snap_path(path, sid)
    if not os.path.exists(sp):
        raise ValueError(
            f"vector index at {path} has no snapshot {sid} "
            f"(available: {_vec_list_snapshots(path)} — vacuumed or "
            "never taken)")
    with open(sp) as fh:
        return json.load(fh)


@single_writer
def ivf_index_snapshot(spark, path: str, centroids=None,
                       note: str = "") -> int:
    """Record a commit point over the live vector index and return
    its id. Pure driver metadata (file list + optional centroid
    capture) — no data read or copied, the Lucene snapshot model.
    Pass the centroids the index is currently probed with so a
    restore that crosses a retrain can hand back the matching
    geometry."""
    import json

    if not os.path.isdir(path):
        raise ValueError(f"no vector index at {path}")
    _recover_epoch_residue(path)  # a crashed maintain must not hide state
    files = _vec_rel_parquet(path)
    if not files:
        raise ValueError(f"vector index at {path} has no data files")
    snaps = _vec_list_snapshots(path)
    sid = (snaps[-1] + 1) if snaps else 0
    cents = None
    if centroids is not None:
        cents = [[int(c), [float(x) for x in v]] for c, v in centroids]
    doc = {"snapshot": sid, "note": note, "files": files,
           "centroids": cents}
    os.makedirs(_vec_snap_dir(path), exist_ok=True)
    tmp = _vec_snap_path(path, sid) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, _vec_snap_path(path, sid))
    return sid


def ivf_index_snapshots(spark, path: str):
    """The vector index's commit-point log as a frame: one row per
    live snapshot (id, note, file count, whether centroids were
    captured).

    This lister is not a writer, so recovery (which MOVES files) runs
    only if the writer lock is free — recovering while a live vacuum
    is mid-swap would rmtree its staging and turn the rest of its
    touched-cluster loop into disposals. With a live writer, skip:
    that writer already ran recovery at its own entry."""
    from jcf_nb_migration_spark.io.locking import (ConcurrentWriterError,
                                                   writer_lock)

    try:
        with writer_lock(path, "snapshots_list_recovery"):
            _recover_epoch_residue(path)
    except ConcurrentWriterError:
        pass
    rows = []
    for sid in _vec_list_snapshots(path):
        m = _vec_read_snapshot(path, sid)
        rows.append((sid, m.get("note", ""), len(m["files"]),
                     m.get("centroids") is not None))
    return local_df(
        spark, rows or [(None, None, None, None)],
        "snapshot int, note string, n_files int, has_centroids boolean"
    ).where(F.col("snapshot").isNotNull())


@single_writer
def ivf_index_restore(spark, path: str, snapshot_id: int):
    """Make ``snapshot_id`` the live index state (file-level COW:
    displaced live files retire to history, referenced files move
    back) and return the snapshot's captured centroids (or None) so
    the caller probes with the geometry the commit point was taken
    under. O(changed files) driver renames — no data pass. Cluster
    dirs and sidecars left parquet-less by the restore are removed
    (an empty sidecar dir would break its reader)."""
    import shutil

    _recover_epoch_residue(path)  # a crashed maintain must not hide state
    man = _vec_read_snapshot(path, snapshot_id)
    want = set(man["files"])
    live = set(_vec_rel_parquet(path))
    # Resolvability first, moves second: a snapshot file in neither
    # the live tree nor history must abort BEFORE any file moves — a
    # mid-loop raise (after the retire loop) would strand the index
    # with its displaced files retired and nothing restored, and
    # re-running reproduces the raise instead of repairing it.
    for rel in sorted(want - live):
        if not os.path.exists(os.path.join(path, VEC_HISTORY_SUBDIR,
                                           rel)):
            raise ValueError(
                f"snapshot {snapshot_id} references {rel} which is in "
                "neither the live tree nor _history — reclaimed by "
                "ivf_snapshot_vacuum?")
    for rel in sorted(live - want):       # displaced by the restore
        _vec_retire_file(path, os.path.join(path, rel), rel)
    for rel in sorted(want - live):
        src = os.path.join(path, VEC_HISTORY_SUBDIR, rel)
        dst = os.path.join(path, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(src, dst)
    for entry in os.listdir(path):
        p = os.path.join(path, entry)
        if not os.path.isdir(p):
            continue
        if not (entry.startswith("cluster=")
                or entry in (VEC_TOMBSTONES_SUBDIR, QUANT_STATS_SUBDIR)):
            continue
        has_parquet = any(f.endswith(".parquet")
                          for _, _, fs in os.walk(p) for f in fs)
        if not has_parquet:
            shutil.rmtree(p, ignore_errors=True)
    cents = man.get("centroids")
    return ([(int(c), list(v)) for c, v in cents]
            if cents is not None else None)


@single_writer
def ivf_snapshot_vacuum(spark, path: str, keep: list[int]) -> dict:
    """Retention: drop every snapshot not in ``keep`` and physically
    reclaim history files no kept snapshot references. Live files are
    never touched."""
    _recover_epoch_residue(path)  # commit points stranded in <path>.old
    #   by a crashed maintain must be visible to keep-list validation
    have = _vec_list_snapshots(path)
    keep_set = {int(k) for k in keep}
    missing = keep_set - set(have)
    if missing:
        raise ValueError(
            f"cannot keep nonexistent snapshots {sorted(missing)} "
            f"(available: {have})")
    referenced: set[str] = set()
    for sid in sorted(keep_set):
        referenced.update(_vec_read_snapshot(path, sid)["files"])
    dropped = [sid for sid in have if sid not in keep_set]
    for sid in dropped:
        os.remove(_vec_snap_path(path, sid))
    hist_root = os.path.join(path, VEC_HISTORY_SUBDIR)
    reclaimed = 0
    if os.path.isdir(hist_root):
        for root, _dirs, files in os.walk(hist_root):
            rel_root = os.path.relpath(root, hist_root)
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                rel = f if rel_root == "." else os.path.join(rel_root, f)
                if rel not in referenced:
                    os.remove(os.path.join(root, f))
                    reclaimed += 1
    return {"dropped_snapshots": len(dropped),
            "reclaimed_files": reclaimed}
