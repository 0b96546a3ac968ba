

def test_bucketed_join_elides_both_exchanges(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    join with ZERO Exchange nodes — the write-once/shuffle-never
    contract that makes bucketing worth it at scale."""
    from jcf_nb_migration_spark.io.layout import write_bucketed
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    orders = t(spark, SF_SMALL, "orders")
    li = t(spark, SF_SMALL, "lineitem")
    old_wh = spark.conf.get("spark.sql.warehouse.dir", None)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8,
                   sort_cols=["o_orderkey"])
    write_bucketed(li.select("l_orderkey", "l_quantity"),
                   "b_lineitem", ["l_orderkey"], 8,
                   sort_cols=["l_orderkey"])
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the join is still correct
        n = joined.count()
        expected = (orders.join(li, orders.o_orderkey == li.l_orderkey)
                    .count())
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_small_files(spark, tmp_path):
    """200 tiny files compact to a handful, content-identical; the
    clustered variant also yields disjoint per-file key ranges."""
    from jcf_nb_migration_spark.io.layout import compact
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    li = t(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity")
    src = str(tmp_path / "small")
    li.repartition(200).write.parquet(src)
    import glob
    assert len(glob.glob(src + "/*.parquet")) == 200

    dst = str(tmp_path / "compacted")
    n = compact(spark, src, dst, target_file_bytes=1 * 1024 * 1024)
    got = len(glob.glob(dst + "/*.parquet"))
    assert got == n and n < 20
    assert (spark.read.parquet(dst).count() == li.count())
    # clustered compaction: per-file l_orderkey ranges must be disjoint
    dst2 = str(tmp_path / "clustered")
    compact(spark, src, dst2, target_file_bytes=256 * 1024,
            cluster_cols=["l_orderkey"])
    import pyarrow.parquet as pq
    ranges = []
    for f in sorted(glob.glob(dst2 + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            los.append(col.statistics.min)
            his.append(col.statistics.max)
        ranges.append((min(los), max(his)))
    ranges.sort()
    for (alo, ahi), (blo, bhi) in zip(ranges, ranges[1:]):
        assert ahi <= blo


def test_bucketed_aggregation_elides_exchange(spark):
    """groupBy on the bucket key of a bucketed table needs no shuffle:
    the hash distribution required by the aggregate is already proven
    by the bucket layout."""
    from jcf_nb_migration_spark.io.layout import write_bucketed
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    li = t(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS b_li_agg")
    write_bucketed(li, "b_li_agg", ["l_orderkey"], 8)
    try:
        agg = (spark.table("b_li_agg").groupBy("l_orderkey")
               .agg({"l_quantity": "sum"}))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li_agg")


def test_dynamic_partition_pruning(spark, tmp_path):
    """A partitioned fact joined to a selectively-filtered dim gets a
    dynamicpruningexpression in its PartitionFilters: the fact scan
    reads only the partitions the dim's filter survives — at 100 TB,
    the difference between scanning one event_type directory and all
    of them. (Requires a Filter on the dim side; an unfiltered literal
    dim does not trigger DPP's selectivity heuristic.)"""
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    d = str(tmp_path / "part_ev")
    ev = t(spark, SF_SMALL, "events")
    ev.write.partitionBy("event_type").parquet(d)
    fact = spark.read.parquet(d)
    dim = spark.createDataFrame(
        [("error", 2), ("click", 1), ("view", 3), ("purchase", 4)],
        "event_type string, w int").where(F.col("w") == 2)
    j = fact.join(dim, "event_type").agg(F.sum("value").alias("s"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, plan
    # and the result is the filtered-partition aggregate
    expected = (ev.where(F.col("event_type") == "error")
                .agg(F.sum("value")).head()[0])
    assert abs(j.head()["s"] - expected) < 1e-6


def test_ivf_index_partition_prunes_to_probed_clusters(spark, tmp_path):
    """The materialized IVF index (ivf_index_write: one hive directory
    per cluster) must turn a probe's cluster shortlist into a
    PARTITION filter — the scan's partition count equals nprobe, the
    other K−nprobe inverted lists are never listed or opened. This is
    the storage-layer proof of the similarity.py scale claim: probes
    read buckets, never the corpus."""
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.io.layout import (
        ivf_index_probe, ivf_index_write,
    )
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    emb = t(spark, SF_SMALL, "embeddings")
    centroids = S.kmeans_train(emb, k=8, iters=2)
    path = str(tmp_path / "ivf_index")
    ivf_index_write(emb, centroids, path, extra_cols=("label",))

    # layout: one hive-style directory per non-empty inverted list
    dirs = {p.name for p in (tmp_path / "ivf_index").iterdir()
            if p.name.startswith("cluster=")}
    assert 1 < len(dirs) <= 8

    pvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    res = ivf_index_probe(spark, path, centroids, list(pvec),
                          k=10, nprobe=2, exclude_id=0)
    # parity first (this also executes the plan, populating metrics):
    # same candidates as the on-the-fly IVF probe — identical shortlist
    # by bit-identical driver-side cosine, identical re-rank
    expect = [(r["neighbor_id"], r["cos_sim"]) for r in
              S.ivf_ann_probe(emb, centroids, 0, k=10, nprobe=2).collect()]
    got = [(r["neighbor_id"], r["cos_sim"]) for r in res.collect()]
    assert got == expect

    plan = res._jdf.queryExecution().executedPlan()
    # the shortlist must land in PartitionFilters (pruned at listing
    # time), not PushedFilters/post-scan Filter
    txt = plan.toString()
    pf = [ln for ln in txt.splitlines() if "PartitionFilters" in ln]
    assert pf and "cluster" in pf[0], txt

    # executed scan metrics: exactly nprobe partition directories (and
    # their files) were read — the other K−nprobe lists never opened
    def scan_metrics(node, out):
        if "Scan" in node.nodeName():
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                out[kv._1()] = kv._2().value()
        ch = node.children().iterator()
        while ch.hasNext():
            scan_metrics(ch.next(), out)
        return out

    m = scan_metrics(plan, {})
    assert m["numPartitions"] == 2, m
    assert m["numFiles"] == 2, m


def test_ivfadc_residual_index_prunes_and_matches_query(spark, tmp_path):
    """The composed FAISS-on-disk shape (VERDICT r5 item 5): residual
    PQ CODES written partitionBy(cluster) (ivfadc_index_write), probed
    via ADC over only the probed clusters' files. Two claims pinned:

    1. Bit-exact parity with the oracle-verified
       ivfadc_residual_multiprobe query — same shortlist, same
       per-cluster probe residuals, same ADC tables, same exact-cosine
       re-rank of the shortlist.
    2. Partition pruning at the storage layer: the executed scan reads
       exactly nprobe partition directories; the other inverted lists
       are never listed or opened.
    """
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.io.layout import (
        ivfadc_index_probe, ivfadc_index_write,
    )
    from jcf_nb_migration_spark.queries import similarity_search as Q
    from jcf_nb_migration_spark.queries.advanced2 import cached_kmeans
    from jcf_nb_migration_spark.registry import all_queries, t
    from tests.conftest import SF_SMALL

    emb = t(spark, SF_SMALL, "embeddings")
    res = Q._cached_residual(spark, SF_SMALL)
    key = ("pq_res", SF_SMALL, Q.PQ_M, Q.PQ_K, Q.PQ_ITERS)
    if key not in Q._RES_BOOKS_CACHE:
        Q._RES_BOOKS_CACHE[key] = S.pq_train(
            res, m=Q.PQ_M, k=Q.PQ_K, iters=Q.PQ_ITERS, vec_col="rvec")
    books = Q._RES_BOOKS_CACHE[key]
    coded = (res.select("vec_id", "cluster")
             .join(S.pq_encode(res, books, vec_col="rvec")
                   .select("vec_id", "codes"), "vec_id"))
    path = str(tmp_path / "ivfadc_index")
    ivfadc_index_write(coded, path)

    # layout: hive directories of codes, no raw vectors on disk
    dirs = {p.name for p in (tmp_path / "ivfadc_index").iterdir()
            if p.name.startswith("cluster=")}
    assert 1 < len(dirs) <= 8
    cols = spark.read.parquet(path).columns
    assert "codes" in cols and "embedding" not in cols and "rvec" not in cols

    centroids = cached_kmeans(emb, SF_SMALL, 8, 2)
    pvec = emb.where(F.col("vec_id") == 0).head()["embedding"]
    got_df = ivfadc_index_probe(spark, path, centroids, books, list(pvec),
                                k=10, nprobe=2, exclude_id=0,
                                rerank_emb=emb)
    got = [(r["neighbor_id"], int(r["cluster"]), r["adc"], r["cos_exact"])
           for r in got_df.collect()]
    expect = [(r["neighbor_id"], int(r["cluster"]), r["adc"], r["cos_exact"])
              for r in all_queries()["ivfadc_residual_multiprobe"]
              .fn(spark, SF_SMALL).collect()]
    assert got == expect

    plan = got_df._jdf.queryExecution().executedPlan()
    txt = plan.toString()
    pf = [ln for ln in txt.splitlines() if "PartitionFilters" in ln]
    assert pf and "cluster" in pf[0], txt

    def scan_metrics(node, out):
        # AQE roots hide the executed tree from .children(); descend
        # through finalPhysicalPlan (and reused/broadcast stages keep
        # their own subtrees)
        if node.nodeName() == "AdaptiveSparkPlan":
            return scan_metrics(node.finalPhysicalPlan(), out)
        if "Scan" in node.nodeName() and "parquet" in node.toString()[:200]:
            d = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                d[kv._1()] = kv._2().value()
            out.append((node.nodeName(), d))
        ch = node.children().iterator()
        while ch.hasNext():
            scan_metrics(ch.next(), out)
        return out

    scans = scan_metrics(plan, [])
    parts = [d["numPartitions"] for _n, d in scans if "numPartitions" in d]
    assert parts and all(p == 2 for p in parts), scans


def test_sorted_export_writes_disjoint_ordered_range_files(spark, tmp_path):
    """The writer half of corpus_sorted_export: materializing the
    global sort with an explicit range bucket count emits one sorted
    file per bucket, and the buckets' key ranges are DISJOINT and
    globally ordered — a consumer can binary-search the file manifest,
    and file count scales with the bucket parameter, not the corpus
    (a SinglePartition regression would produce exactly one file)."""
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    docs = t(spark, SF_SMALL, "documents").select("doc_id", "n_chars")
    nb = 8
    path = str(tmp_path / "sorted_export")
    (docs.repartitionByRange(nb, F.desc("n_chars"), "doc_id")
     .sortWithinPartitions(F.desc("n_chars"), "doc_id")
     .write.parquet(path))

    files = sorted((tmp_path / "sorted_export").glob("part-*.parquet"))
    assert len(files) == nb, [f.name for f in files]

    import pyarrow.parquet as pq
    ranges = []
    for f in files:
        tb = pq.read_table(str(f)).to_pydict()
        keys = list(zip([-c for c in tb["n_chars"]], tb["doc_id"]))
        assert keys == sorted(keys), f"file {f.name} not sorted"
        ranges.append((keys[0], keys[-1]))
    # part-file ordinal == range bucket ordinal: ranges are disjoint
    # and ascending across the file sequence
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, ranges


def test_orc_roundtrip_with_predicate_pushdown(spark, tmp_path):
    """ORC is the second columnar format Spark ships natively (the
    jars are in the distro; Avro's connector jar is not — NOTES r5).
    The engine's scan discipline must carry over: a filtered read of
    an ORC table pushes the predicate into the scan and prunes unread
    columns, exactly like the parquet paths PLANS.md documents."""
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    docs = t(spark, SF_SMALL, "documents")
    path = str(tmp_path / "docs_orc")
    docs.write.orc(path)

    back = spark.read.orc(path)
    q = back.where(back.n_chars > 200).select("doc_id", "source")
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "Scan orc" in plan
    assert "GreaterThan(n_chars,200)" in plan          # pushed filter
    assert "text" not in plan                          # column pruned
    # round-trip equality on the filtered projection
    exp = sorted((r.doc_id, r.source) for r in
                 docs.where(docs.n_chars > 200)
                     .select("doc_id", "source").collect())
    got = sorted((r.doc_id, r.source) for r in q.collect())
    assert got == exp and len(got) > 0


def test_ivf_index_append_probe_equals_full_rebuild(spark, tmp_path):
    """VERDICT r6 item 4: appending a new vector batch (assigned to the
    EXISTING centroids) must leave every base file byte-identical —
    parquet append under partitionBy only adds files — and a probe of
    the appended index must equal a probe of a from-scratch rebuild
    over the full vector set."""
    import pathlib

    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.io.layout import (
        ivf_index_append, ivf_index_probe, ivf_index_write,
    )
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    emb = t(spark, SF_SMALL, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    batch = emb.where(F.col("vec_id") % 5 == 0)
    # centroids trained on the BASE only — the append never retrains
    centroids = S.kmeans_train(base, k=8, iters=2)

    inc = str(tmp_path / "ivf_inc")
    ivf_index_write(base, centroids, inc, extra_cols=("label",))
    before = {p: p.stat().st_mtime_ns
              for p in pathlib.Path(inc).rglob("*.parquet")}
    ivf_index_append(batch, centroids, inc, extra_cols=("label",))
    after = {p: p.stat().st_mtime_ns
             for p in pathlib.Path(inc).rglob("*.parquet")}
    # every base file still present and untouched; new files added
    assert set(before) <= set(after)
    assert all(after[p] == ts for p, ts in before.items())
    assert len(after) > len(before)

    full = str(tmp_path / "ivf_full")
    ivf_index_write(emb, centroids, full, extra_cols=("label",))

    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])
    got = [(r["neighbor_id"], r["cos_sim"]) for r in
           ivf_index_probe(spark, inc, centroids, pvec,
                           k=10, nprobe=2, exclude_id=0).collect()]
    expect = [(r["neighbor_id"], r["cos_sim"]) for r in
              ivf_index_probe(spark, full, centroids, pvec,
                              k=10, nprobe=2, exclude_id=0).collect()]
    assert got == expect and len(got) == 10


def test_ivf_centroid_drift_flags_drifted_cluster(spark, tmp_path):
    """The drift report must stay quiet on in-distribution appends and
    flag a cluster whose appended members no longer resemble its
    centroid (here: negated vectors — cosine ≈ −1 to everything the
    centroid routes)."""
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.io.layout import (
        ivf_centroid_drift, ivf_index_append, ivf_index_write,
    )
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    emb = t(spark, SF_SMALL, "embeddings")
    centroids = S.kmeans_train(emb, k=8, iters=2)
    path = str(tmp_path / "ivf_drift")
    ivf_index_write(emb, centroids, path)

    healthy = ivf_centroid_drift(spark, path, centroids,
                                 min_mean_cos=0.0).collect()
    assert healthy and not any(r["retrain"] for r in healthy)
    assert all(-1.0 <= r["min_cos"] <= r["mean_cos"] <= 1.0
               for r in healthy)
    total = sum(r["n_vectors"] for r in healthy)
    assert total == emb.count()

    # adversarial batch: a direction Gram-Schmidt-orthogonalized
    # against ALL centroids — cosine ≈ 0 to every centroid, so
    # wherever assignment routes the copies, that cluster's mean
    # collapses toward zero (a batch merely rotated/negated can still
    # find a correlated centroid among 8; orthogonal cannot)
    import numpy as np

    rows = S._centroid_rows(centroids)
    C = np.array([cvec for _cid, cvec in rows], dtype=np.float64)
    v0 = np.array([1.0 if i % 7 == 0 else 0.1 for i in range(64)])
    coef, *_ = np.linalg.lstsq(C.T, v0, rcond=None)
    v = v0 - C.T @ coef  # residual ⊥ span{centroids}
    assert float(np.abs(C @ v).max()) < 1e-9
    assert float(np.linalg.norm(v)) > 1e-6
    n_bad = 200
    bad = spark.createDataFrame(
        [(10_000 + i, [float(x) for x in v], 0) for i in range(n_bad)],
        "vec_id bigint, embedding array<float>, label int")
    ivf_index_append(bad, centroids, path)
    # threshold just under the healthiest baseline: the flooded
    # cluster must flag, untouched clusters must not
    floor = min(r["mean_cos"] for r in healthy) - 0.05
    drifted = ivf_centroid_drift(spark, path, centroids,
                                 min_mean_cos=floor).collect()
    assert any(r["retrain"] for r in drifted), (floor, drifted)
    assert sum(r["n_vectors"] for r in drifted) == total + n_bad


def test_ivf_centroid_drift_flags_orphaned_clusters(spark, tmp_path):
    """A cluster present ON DISK but absent from the passed centroid
    set (the retrain-before-rebuild window) must appear in the report
    with retrain=True — an inner join would silently drop it and the
    monitor would read healthy while probes route by stale geometry."""
    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.io.layout import (
        ivf_centroid_drift, ivf_index_write,
    )
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    emb = t(spark, SF_SMALL, "embeddings")
    centroids = S.kmeans_train(emb, k=8, iters=2)
    path = str(tmp_path / "ivf_orphan")
    ivf_index_write(emb, centroids, path)

    rows = S._centroid_rows(centroids)
    survivors = {cid for cid, _ in rows[:4]}
    report = ivf_centroid_drift(spark, path, rows[:4],
                                min_mean_cos=-1.0).collect()
    orphans = [r for r in report if r["cluster"] not in survivors]
    assert orphans, "orphaned on-disk clusters must stay in the report"
    assert all(r["retrain"] and r["mean_cos"] is None for r in orphans)
    assert not any(r["retrain"] for r in report
                   if r["cluster"] in survivors)
    assert sum(r["n_vectors"] for r in report) == emb.count()


def test_ivf_index_append_empty_batch_is_noop(spark, tmp_path):
    """Streaming delivers empty micro-batches routinely — appending
    one must not error, must add no data files, and must leave probes
    unchanged."""
    import pathlib

    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.io.layout import (
        ivf_index_append, ivf_index_probe, ivf_index_write,
    )
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    emb = t(spark, SF_SMALL, "embeddings")
    centroids = S.kmeans_train(emb, k=8, iters=2)
    path = str(tmp_path / "ivf_empty")
    ivf_index_write(emb, centroids, path)
    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])
    before = [(r["neighbor_id"], r["cos_sim"]) for r in
              ivf_index_probe(spark, path, centroids, pvec,
                              k=10, nprobe=2, exclude_id=0).collect()]
    files_before = sorted(str(p) for p in
                          pathlib.Path(path).rglob("*.parquet"))

    empty = emb.where(F.lit(False)).select("vec_id", "embedding")
    assert ivf_index_append(empty, centroids, path, batch_id=99) is True
    files_after = sorted(str(p) for p in
                         pathlib.Path(path).rglob("*.parquet"))
    assert files_after == files_before
    after = [(r["neighbor_id"], r["cos_sim"]) for r in
             ivf_index_probe(spark, path, centroids, pvec,
                             k=10, nprobe=2, exclude_id=0).collect()]
    assert after == before


def test_ivf_index_maintain_rebuilds_only_when_drifted(spark, tmp_path):
    """The append→drift→rebuild loop: healthy index → no-op; after an
    out-of-distribution flood the maintain call must retrain, swap the
    layout atomically (stage + rename), reset the append ledger epoch,
    and leave a probeable index whose drift report is quiet under the
    same threshold."""
    import numpy as np
    import pathlib

    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.io.layout import (
        ivf_centroid_drift, ivf_index_append, ivf_index_maintain,
        ivf_index_probe, ivf_index_write,
    )
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    emb = t(spark, SF_SMALL, "embeddings")
    centroids = S.kmeans_train(emb, k=8, iters=2)
    path = str(tmp_path / "ivf_maint")
    ivf_index_write(emb, centroids, path)
    floor = min(r["mean_cos"] for r in
                ivf_centroid_drift(spark, path, centroids,
                                   min_mean_cos=-1.0).collect()) - 0.05

    # healthy: no rebuild, same centroids returned
    rebuilt, got = ivf_index_maintain(spark, path, centroids,
                                      min_mean_cos=floor)
    assert rebuilt is False and got is centroids

    # flood one cluster with a centroid-orthogonal direction
    rows = S._centroid_rows(centroids)
    C = np.array([c for _cid, c in rows])
    v0 = np.array([1.0 if i % 7 == 0 else 0.1 for i in range(64)])
    coef, *_ = np.linalg.lstsq(C.T, v0, rcond=None)
    v = v0 - C.T @ coef
    bad = spark.createDataFrame(
        [(10_000 + i, [float(x) for x in v], 0) for i in range(200)],
        "vec_id bigint, embedding array<float>, label int")
    ivf_index_append(bad.select("vec_id", "embedding"), centroids,
                     path, batch_id=1)
    assert (tmp_path / "ivf_maint" / "_appended_batches" / "1").exists()

    rebuilt, new_cent = ivf_index_maintain(spark, path, centroids,
                                           min_mean_cos=floor)
    assert rebuilt is True and new_cent is not centroids
    # ledger reset with the new epoch; staging gone
    assert not (tmp_path / "ivf_maint" / "_appended_batches").exists()
    assert not (tmp_path / "ivf_maint.rebuild").exists()
    # all vectors survived the rebuild and the index probes
    n = spark.read.parquet(path).count()
    assert n == emb.count() + 200
    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])
    res = ivf_index_probe(spark, path, new_cent, pvec,
                          k=10, nprobe=2, exclude_id=0).collect()
    assert len(res) == 10
    # retrained geometry absorbs the flood: report quiet at the same
    # threshold (the flooded direction now owns its own centroid)
    post = ivf_centroid_drift(spark, path, new_cent,
                              min_mean_cos=floor).collect()
    assert not any(r["retrain"] for r in post), post


def _ivfadc_fixture(spark):
    """Shared geometry for the IVFADC maintenance tests: coarse
    centroids + residual books trained on the BASE slice only, so
    appends exercise frozen-geometry encoding."""
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.io.layout import _residuals_frame
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    emb = t(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    base = emb.where(F.col("vec_id") % 5 != 0)
    batch = emb.where(F.col("vec_id") % 5 == 0)
    centroids = S.kmeans_train(base, k=8, iters=2)
    res = _residuals_frame(base, centroids).persist()
    books = S.pq_train(res, m=4, k=8, iters=2, vec_col="rvec")
    res.unpersist()
    return emb, base, batch, centroids, books


def test_ivfadc_index_append_probe_equals_full_rebuild(spark, tmp_path):
    """VERDICT r7 item 3: a new batch encoded with the EXISTING coarse
    centroids + residual codebooks and appended must (a) leave every
    base file byte-identical, (b) probe exactly like a from-scratch
    rebuild over the full set, and (c) be replay-idempotent under the
    batch-id ledger."""
    import pathlib

    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.io.layout import (
        ivfadc_index_append, ivfadc_index_build, ivfadc_index_probe,
    )

    emb, base, batch, centroids, books = _ivfadc_fixture(spark)

    inc = str(tmp_path / "adc_inc")
    ivfadc_index_build(base, centroids, books, inc)
    before = {p: p.stat().st_mtime_ns
              for p in pathlib.Path(inc).rglob("cluster=*/*.parquet")}
    assert ivfadc_index_append(batch, centroids, books, inc,
                               batch_id=0) is True
    after = {p: p.stat().st_mtime_ns
             for p in pathlib.Path(inc).rglob("cluster=*/*.parquet")}
    assert set(before) <= set(after)
    assert all(after[p] == ts for p, ts in before.items())
    assert len(after) > len(before)

    full = str(tmp_path / "adc_full")
    ivfadc_index_build(emb, centroids, books, full)

    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])

    def probe(path):
        return [(r["neighbor_id"], int(r["cluster"]), r["adc"])
                for r in ivfadc_index_probe(
                    spark, path, centroids, books, pvec,
                    k=10, nprobe=2, exclude_id=0).collect()]

    got = probe(inc)
    assert got == probe(full) and len(got) == 10

    # replayed delivery (same batch_id): ledger skips, index unchanged
    assert ivfadc_index_append(batch, centroids, books, inc,
                               batch_id=0) is False
    assert probe(inc) == got


def test_ivfadc_quant_drift_flags_and_maintain_rebuilds(spark, tmp_path):
    """Residual-space drift: an out-of-distribution batch (vectors
    scaled 5x — residual magnitude explodes under the frozen books)
    must push per-cluster PQ reconstruction error past the relative
    threshold and flag retrain; ivfadc_index_maintain must then
    retrain the books, rebuild atomically, reset the stats epoch, and
    leave an index that probes exactly like a fresh build under the
    new books."""
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.io.layout import (
        ivfadc_index_append, ivfadc_index_build, ivfadc_index_maintain,
        ivfadc_index_probe, ivfadc_quant_drift,
    )

    emb, base, _batch, centroids, books = _ivfadc_fixture(spark)

    idx = str(tmp_path / "adc_drift")
    ivfadc_index_build(base, centroids, books, idx)

    # in-distribution append first: drift must stay QUIET
    indist = emb.where(F.col("vec_id") % 5 == 0)
    ivfadc_index_append(indist, centroids, books, idx, batch_id=0)
    quiet = ivfadc_quant_drift(spark, idx, rel_threshold=2.0).collect()
    assert not any(r["retrain"] for r in quiet), quiet
    rebuilt, same_books = ivfadc_index_maintain(
        spark, idx, emb, centroids, books, rel_threshold=2.0)
    assert rebuilt is False and same_books is books

    # drifted append: scaled vectors, fresh ids
    drifted = indist.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding",
                    lambda x: x * F.lit(5.0)).alias("embedding"))
    ivfadc_index_append(drifted, centroids, books, idx, batch_id=1)
    report = ivfadc_quant_drift(spark, idx, rel_threshold=2.0).collect()
    assert any(r["retrain"] for r in report), report

    current = emb.unionByName(drifted)
    rebuilt, new_books = ivfadc_index_maintain(
        spark, idx, current, centroids, books, rel_threshold=2.0)
    assert rebuilt is True and new_books != books

    # post-rebuild: stats epoch reset -> drift quiet again
    post = ivfadc_quant_drift(spark, idx, rel_threshold=2.0).collect()
    assert not any(r["retrain"] for r in post), post

    # and the swapped index probes exactly like a fresh build under
    # the retrained books
    fresh = str(tmp_path / "adc_fresh")
    ivfadc_index_build(current, centroids, new_books, fresh)
    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])

    def probe(path):
        return [(r["neighbor_id"], int(r["cluster"]), r["adc"])
                for r in ivfadc_index_probe(
                    spark, path, centroids, new_books, pvec,
                    k=10, nprobe=2, exclude_id=0).collect()]

    assert probe(idx) == probe(fresh)


def test_ivf_delete_excludes_then_vacuum_reclaims(spark, tmp_path):
    """Vector deletion lifecycle (r10): tombstoned ids vanish from
    probes immediately (files untouched — lazy), ivf_index_vacuum
    rewrites ONLY the clusters that contained them (other cluster
    dirs byte-untouched) and clears the sidecar, after which the
    probe equals a from-scratch build without the deleted vectors.
    Ledger replay of a delete batch is a no-op."""
    import pathlib

    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.io.layout import (
        VEC_TOMBSTONES_SUBDIR, ivf_index_delete, ivf_index_probe,
        ivf_index_vacuum, ivf_index_write)
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    emb = t(spark, SF_SMALL, "embeddings")
    centroids = S.kmeans_train(emb, k=8, iters=2)
    path = str(tmp_path / "ivf_del")
    ivf_index_write(emb, centroids, path, extra_cols=("label",))
    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])

    def probe(p):
        return [(r["neighbor_id"], r["cos_sim"]) for r in
                ivf_index_probe(spark, p, centroids, pvec,
                                k=8, nprobe=2, exclude_id=0).collect()]

    before = probe(path)
    victims = [before[0][0], before[3][0]]
    files_pre = {p: p.stat().st_mtime_ns
                 for p in pathlib.Path(path).rglob("cluster=*/*.parquet")}
    assert ivf_index_delete(spark, path, victims, batch_id=1) is True
    assert ivf_index_delete(spark, path, victims, batch_id=1) is False
    after = probe(path)
    survivors = [r for r in before if r[0] not in victims]
    assert after[:len(survivors)] == survivors  # k back-fills from below
    assert not set(victims) & {r[0] for r in after}
    files_lazy = {p: p.stat().st_mtime_ns
                  for p in pathlib.Path(path).rglob("cluster=*/*.parquet")}
    assert files_lazy == files_pre  # lazy: no data rewrite yet
    import pytest

    with pytest.raises(TypeError, match="integers"):
        ivf_index_delete(spark, path, [1.5])
    assert ivf_index_delete(spark, path, []) is False

    out = ivf_index_vacuum(spark, path)
    assert out["reclaimed_ids"] == len(set(victims))
    assert 0 < out["touched_clusters"] <= 2
    assert not (pathlib.Path(path) / VEC_TOMBSTONES_SUBDIR).is_dir()
    # untouched cluster dirs byte-identical (same files, same mtimes)
    import re as _re

    touched_dirs = set()
    for p, ts in files_pre.items():
        if p.exists() and p.stat().st_mtime_ns == ts:
            continue
        touched_dirs.add(p.parent.name)
    assert len(touched_dirs) == out["touched_clusters"]
    # post-vacuum probe == fresh build without the victims
    rb = str(tmp_path / "ivf_del_rb")
    ivf_index_write(emb.where(~F.col("vec_id").isin(victims)),
                    centroids, rb, extra_cols=("label",))
    assert probe(path) == probe(rb)
    # vacuum with no tombstones is a no-op
    assert ivf_index_vacuum(spark, path) == {
        "reclaimed_ids": 0, "touched_clusters": 0}


def test_ivfadc_probe_excludes_tombstoned(spark, tmp_path):
    """The compressed (IVFADC) layout shares the tombstone sidecar:
    deleted ids vanish from ADC probes immediately."""
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.io.layout import (
        ivfadc_index_build, ivfadc_index_probe, ivf_index_delete)
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    emb, _base, _batch, centroids, books = _ivfadc_fixture(spark)
    path = str(tmp_path / "adc_del")
    ivfadc_index_build(emb, centroids, books, path)
    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])
    before = [r["neighbor_id"] for r in
              ivfadc_index_probe(spark, path, centroids, books, pvec,
                                 k=8, nprobe=2, exclude_id=0).collect()]
    victims = before[:2]
    ivf_index_delete(spark, path, victims)
    after = [r["neighbor_id"] for r in
             ivfadc_index_probe(spark, path, centroids, books, pvec,
                                k=8, nprobe=2, exclude_id=0).collect()]
    assert not set(victims) & set(after)
    surv = [i for i in before if i not in victims]
    assert after[:len(surv)] == surv  # k back-fills from below


def test_ivfadc_vacuum_matches_rebuild(spark, tmp_path):
    """ivf_index_vacuum is layout-agnostic (filters on the id column,
    never interprets the payload): on the IVFADC codes layout, vacuum
    + probe equals an index rebuilt without the deleted vectors."""
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.io.layout import (
        VEC_TOMBSTONES_SUBDIR, ivfadc_index_build, ivfadc_index_probe,
        ivf_index_delete, ivf_index_vacuum)

    import pathlib

    emb, _base, _batch, centroids, books = _ivfadc_fixture(spark)
    path = str(tmp_path / "adc_vac")
    ivfadc_index_build(emb, centroids, books, path)
    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])

    def probe(p):
        return [(r["neighbor_id"], r["adc"]) for r in
                ivfadc_index_probe(spark, p, centroids, books, pvec,
                                   k=8, nprobe=2,
                                   exclude_id=0).collect()]

    victims = [i for i, _ in probe(path)[:2]]
    ivf_index_delete(spark, path, victims)
    out = ivf_index_vacuum(spark, path)
    assert out["reclaimed_ids"] == len(victims)
    assert not (pathlib.Path(path) / VEC_TOMBSTONES_SUBDIR).is_dir()
    rb = str(tmp_path / "adc_vac_rb")
    ivfadc_index_build(emb.where(~F.col("vec_id").isin(victims)),
                       centroids, books, rb)
    assert probe(path) == probe(rb) and len(probe(path)) == 8
