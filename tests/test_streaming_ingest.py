"""Production ingest composition: a document stream deduplicated
micro-batch by micro-batch against a STANDING near-dup index via
foreachBatch — the shape a 100 TB corpus actually ingests with
(nothing re-dedups the whole corpus per delivery; each batch probes
the standing band table, survivors append to it). Composes the
streaming surface with functions.dedup.incremental_lsh_dedup, which
the batch query lsh_incremental_dedup oracle-gates."""

import os

from pyspark.sql import functions as F


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _distinct_text(i):
    # shingle-disjoint texts: every token carries the doc number
    return " ".join(f"w{i}t{j}" for j in range(12))


def test_stream_ingest_dedups_against_standing_index(spark, tmp_path):
    from jcf_nb_migration_spark.functions.dedup import (
        incremental_lsh_dedup)

    src = str(tmp_path / "incoming")
    standing_dir = str(tmp_path / "standing")
    os.makedirs(src, exist_ok=True)

    # standing store bootstrap: empty parquet with the docs schema
    _mk_docs(spark, []).write.parquet(standing_dir)

    decisions = []

    def ingest(batch_df, batch_id):
        standing = spark.read.parquet(standing_dir)
        report = incremental_lsh_dedup(
            standing, batch_df, "doc_id", "text",
            threshold=0.5, k=16, bands=8, rows=2, n=3)
        dup_ids = [r.doc_id for r in
                   report.where(F.col("is_dup")).collect()]
        decisions.append((batch_id, sorted(dup_ids)))
        survivors = batch_df.join(
            spark.createDataFrame([(i,) for i in dup_ids],
                                  "doc_id bigint"),
            "doc_id", "left_anti")
        survivors.write.mode("append").parquet(standing_dir)

    schema = "doc_id bigint, text string"
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream.writeStream.foreachBatch(ingest).start()
    try:
        # micro-batch 1: ten distinct docs — all survive
        _mk_docs(spark, [(i, _distinct_text(i)) for i in range(10)]) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        # micro-batch 2: three fresh docs + three exact near-dups of
        # batch-1 docs — the dups must be caught by the STANDING index
        rows = ([(10 + i, _distinct_text(10 + i)) for i in range(3)]
                + [(20 + i, _distinct_text(i)) for i in range(3)])
        _mk_docs(spark, rows).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    assert decisions[0][1] == []            # batch 1: nothing standing
    assert decisions[1][1] == [20, 21, 22]  # batch 2: copies flagged
    final = {r.doc_id for r in spark.read.parquet(standing_dir).collect()}
    assert final == set(range(10)) | {10, 11, 12}


def test_stream_ingest_appends_ivf_index(spark, tmp_path):
    """r7 composition: an EMBEDDING stream maintains the materialized
    IVF ANN index micro-batch by micro-batch (foreachBatch →
    ivf_index_append under fixed centroids) — the streaming twin of
    the batch append test. After two deliveries the streamed index
    must probe identically to a one-shot build over all vectors, and
    the drift report must account for every streamed member."""
    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.io.layout import (
        ivf_centroid_drift, ivf_index_append, ivf_index_probe,
        ivf_index_write,
    )
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    emb = t(spark, SF_SMALL, "embeddings")
    base = emb.where(F.col("vec_id") % 3 == 0)
    # centroids fixed at bootstrap; streamed batches only append
    centroids = S.kmeans_train(base, k=8, iters=2)
    idx = str(tmp_path / "ivf_stream_idx")
    ivf_index_write(base, centroids, idx, extra_cols=("label",))

    src = str(tmp_path / "vec_incoming")
    os.makedirs(src, exist_ok=True)

    def ingest(batch_df, batch_id):
        # batch_id ledger: an at-least-once replay of a committed
        # micro-batch must be a no-op, not a duplicate append
        ivf_index_append(batch_df, centroids, idx,
                         extra_cols=("label",), batch_id=batch_id)

    schema = "vec_id bigint, embedding array<float>, label int"
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream.writeStream.foreachBatch(ingest).start()
    try:
        for rem in (1, 2):  # two micro-batches cover the non-base rest
            emb.where(F.col("vec_id") % 3 == rem) \
                .select("vec_id", "embedding", "label") \
                .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()

    full = str(tmp_path / "ivf_oneshot")
    ivf_index_write(emb, centroids, full, extra_cols=("label",))
    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])
    got = [(r["neighbor_id"], r["cos_sim"]) for r in
           ivf_index_probe(spark, idx, centroids, pvec,
                           k=10, nprobe=2, exclude_id=0).collect()]
    expect = [(r["neighbor_id"], r["cos_sim"]) for r in
              ivf_index_probe(spark, full, centroids, pvec,
                              k=10, nprobe=2, exclude_id=0).collect()]
    assert got == expect and len(got) == 10

    report = ivf_centroid_drift(spark, idx, centroids).collect()
    assert sum(r["n_vectors"] for r in report) == emb.count()

    # replayed delivery (same batch_id): ledger skips, index unchanged
    replay = emb.where(F.col("vec_id") % 3 == 1) \
        .select("vec_id", "embedding", "label")
    assert ivf_index_append(replay, centroids, idx,
                            extra_cols=("label",), batch_id=0) is False
    after = [(r["neighbor_id"], r["cos_sim"]) for r in
             ivf_index_probe(spark, idx, centroids, pvec,
                             k=10, nprobe=2, exclude_id=0).collect()]
    assert after == got


def test_stream_ingest_appends_lexical_index(spark, tmp_path):
    """r9 composition: a DOCUMENT stream maintains the persisted
    lexical (BM25) serving index micro-batch by micro-batch
    (foreachBatch → lexical_index_append under the batch-id ledger) —
    the lexical twin of the IVF streaming test above. After two
    deliveries the streamed index must probe identically to a one-shot
    build over all documents, and a replayed delivery must be a
    ledger-skipped no-op."""
    from jcf_nb_migration_spark.io.lexical import (
        bm25_probe, lexical_index_append, lexical_index_build)
    from jcf_nb_migration_spark.queries.retrieval_ops import (
        BM25_B, BM25_K1, BM25_TERMS)

    def text(i):
        return " ".join(["spark"] * (1 + i % 3) + ["window"] * (i % 2)
                        + [f"filler{i}"] * (1 + i % 4))

    def toks_of(df):
        return df.select(
            "doc_id",
            F.filter(F.split("text", r"\s+"),
                     lambda x: x != "").alias("w"))

    all_docs = _mk_docs(spark, [(i, text(i)) for i in range(30)])
    base = all_docs.where(F.col("doc_id") < 10)
    idx = str(tmp_path / "lex_stream_idx")
    lexical_index_build(toks_of(base), "lexti_stream", idx,
                        num_buckets=8)

    src = str(tmp_path / "doc_incoming")
    os.makedirs(src, exist_ok=True)

    def ingest(batch_df, batch_id):
        lexical_index_append(toks_of(batch_df), "lexti_stream", idx,
                             num_buckets=8, batch_id=batch_id)

    stream = spark.readStream.schema("doc_id bigint, text string") \
        .parquet(src)
    q = stream.writeStream.foreachBatch(ingest).start()
    try:
        for lo, hi in ((10, 20), (20, 30)):
            all_docs.where((F.col("doc_id") >= lo)
                           & (F.col("doc_id") < hi)) \
                .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()

    rb = str(tmp_path / "lex_oneshot")
    lexical_index_build(toks_of(all_docs), "lexti_oneshot", rb,
                        num_buckets=8)

    def probe(prefix, path):
        return [(r["doc_id"], r["n_terms_matched"], r["bm25"]) for r in
                bm25_probe(spark, prefix, path, BM25_TERMS,
                           BM25_K1, BM25_B, k=40).collect()]

    got = probe("lexti_stream", idx)
    assert got == probe("lexti_oneshot", rb) and len(got) > 0

    # replayed delivery (batch_id 0 already committed): ledger no-op
    replay = toks_of(all_docs.where((F.col("doc_id") >= 10)
                                    & (F.col("doc_id") < 20)))
    assert lexical_index_append(replay, "lexti_stream", idx,
                                num_buckets=8, batch_id=0) is False
    assert probe("lexti_stream", idx) == got


def test_stream_ingest_appends_positional_index(spark, tmp_path):
    """The positional layout joins the streaming-maintained family:
    foreachBatch appends under the ledger, streamed index phrase-probes
    identically to a one-shot build, replays are no-ops."""
    from jcf_nb_migration_spark.io.lexical import (
        phrase_probe, positional_index_append, positional_index_build)

    def text(i):
        core = "alpha beta " * (1 + i % 3)
        return core + f"fill{i} alpha end{i} beta"

    def toks_of(df):
        return df.select(
            "doc_id",
            F.filter(F.split("text", r"\s+"),
                     lambda x: x != "").alias("w"))

    all_docs = _mk_docs(spark, [(i, text(i)) for i in range(24)])
    base = all_docs.where(F.col("doc_id") < 8)
    idx = str(tmp_path / "pos_stream_idx")
    positional_index_build(toks_of(base), "positi_stream", idx,
                           num_buckets=8)

    src = str(tmp_path / "pos_incoming")
    os.makedirs(src, exist_ok=True)

    def ingest(batch_df, batch_id):
        positional_index_append(toks_of(batch_df), "positi_stream",
                                idx, num_buckets=8, batch_id=batch_id)

    q = (spark.readStream.schema("doc_id bigint, text string")
         .parquet(src).writeStream.foreachBatch(ingest).start())
    try:
        for lo, hi in ((8, 16), (16, 24)):
            all_docs.where((F.col("doc_id") >= lo)
                           & (F.col("doc_id") < hi)) \
                .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()

    rb = str(tmp_path / "pos_oneshot")
    positional_index_build(toks_of(all_docs), "positi_oneshot", rb,
                           num_buckets=8)

    def probe(prefix, path):
        return [(r["doc_id"], r["n_occurrences"], r["first_pos"])
                for r in phrase_probe(spark, prefix, path,
                                      ("alpha", "beta"), k=50)
                .collect()]

    got = probe("positi_stream", idx)
    assert got == probe("positi_oneshot", rb) and len(got) == 24

    replay = toks_of(all_docs.where((F.col("doc_id") >= 8)
                                    & (F.col("doc_id") < 16)))
    assert positional_index_append(replay, "positi_stream", idx,
                                   num_buckets=8, batch_id=0) is False
    assert probe("positi_stream", idx) == got


def test_stream_ingest_appends_ivfadc_index(spark, tmp_path):
    """r9: the IVFADC (residual-PQ) index joins the streaming-
    maintained family — foreachBatch encodes each embedding micro-batch
    under FROZEN geometry and appends via the ledger; the streamed
    index must ADC-probe identically to a one-shot build, and a
    replayed batch must be a no-op."""
    from jcf_nb_migration_spark.functions import similarity as S
    from jcf_nb_migration_spark.io.layout import (
        _residuals_frame, ivfadc_index_append, ivfadc_index_build,
        ivfadc_index_probe)
    from jcf_nb_migration_spark.registry import t
    from tests.conftest import SF_SMALL

    emb = t(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    base = emb.where(F.col("vec_id") % 3 == 0)
    centroids = S.kmeans_train(base, k=8, iters=2)
    res = _residuals_frame(base, centroids).persist()
    books = S.pq_train(res, m=4, k=8, iters=2, vec_col="rvec")
    res.unpersist()

    idx = str(tmp_path / "adc_stream_idx")
    ivfadc_index_build(base, centroids, books, idx)

    src = str(tmp_path / "adc_incoming")
    os.makedirs(src, exist_ok=True)

    def ingest(batch_df, batch_id):
        ivfadc_index_append(batch_df, centroids, books, idx,
                            batch_id=batch_id)

    stream = spark.readStream \
        .schema("vec_id bigint, embedding array<float>").parquet(src)
    q = stream.writeStream.foreachBatch(ingest).start()
    try:
        for rem in (1, 2):
            emb.where(F.col("vec_id") % 3 == rem) \
                .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()

    full = str(tmp_path / "adc_oneshot")
    ivfadc_index_build(emb, centroids, books, full)
    pvec = list(emb.where(F.col("vec_id") == 0).head()["embedding"])

    def probe(path):
        return [(r["neighbor_id"], int(r["cluster"]), r["adc"]) for r in
                ivfadc_index_probe(spark, path, centroids, books, pvec,
                                   k=10, nprobe=2,
                                   exclude_id=0).collect()]

    got = probe(idx)
    assert got == probe(full) and len(got) == 10

    replay = emb.where(F.col("vec_id") % 3 == 1)
    assert ivfadc_index_append(replay, centroids, books, idx,
                               batch_id=0) is False
    assert probe(idx) == got


def test_stream_ingest_appends_docstore(spark, tmp_path):
    """The docstore joins the appendable-layout streaming contract
    (r9): a document stream lands content batches via foreachBatch →
    docstore_append under the shared batch-id ledger. After two
    deliveries, point fetches against the streamed store must match a
    one-shot build over all documents, and a replayed delivery must be
    a ledger-skipped no-op."""
    from jcf_nb_migration_spark.io.docstore import (
        docstore_append, docstore_build, docstore_fetch)

    all_docs = _mk_docs(spark, [(i, f"content {i}") for i in range(30)])
    base = all_docs.where(F.col("doc_id") < 10)
    idx = str(tmp_path / "ds_stream_idx")
    docstore_build(base, "dst_stream", idx, num_buckets=8)

    src = str(tmp_path / "ds_incoming")
    os.makedirs(src, exist_ok=True)

    def ingest(batch_df, batch_id):
        docstore_append(batch_df, "dst_stream", idx,
                        num_buckets=8, batch_id=batch_id)

    stream = spark.readStream.schema("doc_id bigint, text string") \
        .parquet(src)
    q = stream.writeStream.foreachBatch(ingest).start()
    try:
        for lo, hi in ((10, 20), (20, 30)):
            all_docs.where((F.col("doc_id") >= lo)
                           & (F.col("doc_id") < hi)) \
                .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()

    rb = str(tmp_path / "ds_oneshot")
    docstore_build(all_docs, "dst_oneshot", rb, num_buckets=8)

    ids = [0, 5, 12, 19, 23, 29]

    def fetch(prefix, path):
        return sorted((r["doc_id"], r["text"]) for r in
                      docstore_fetch(spark, prefix, path, ids).collect())

    got = fetch("dst_stream", idx)
    assert got == fetch("dst_oneshot", rb) and len(got) == len(ids)
    # replayed delivery: the ledger skips, the store is unchanged
    assert docstore_append(
        all_docs.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)),
        "dst_stream", idx, num_buckets=8, batch_id=0) is False
    assert fetch("dst_stream", idx) == got


def test_stream_cdc_upserts_docstore(spark, tmp_path):
    """A CDC stream drives MERGE semantics (r10): each micro-batch is
    a mix of updates and inserts landed via foreachBatch →
    docstore_upsert under the shared ledger. After two deliveries the
    streamed store must fetch-match a one-shot build over the FINAL
    state (latest version per doc_id), and a replayed delivery is a
    ledger-skipped no-op — at-least-once delivery cannot double-apply
    a merge."""
    from jcf_nb_migration_spark.io.docstore import (
        docstore_build, docstore_fetch, docstore_upsert)

    base = _mk_docs(spark, [(i, f"v1 of {i}") for i in range(12)])
    idx = str(tmp_path / "ds_cdc_idx")
    docstore_build(base, "dst_cdc", idx, num_buckets=8)

    src = str(tmp_path / "ds_cdc_incoming")
    os.makedirs(src, exist_ok=True)

    def ingest(batch_df, batch_id):
        docstore_upsert(batch_df, "dst_cdc", idx,
                        num_buckets=8, batch_id=batch_id)

    stream = spark.readStream.schema("doc_id bigint, text string") \
        .parquet(src)
    q = stream.writeStream.foreachBatch(ingest).start()
    b1 = [(3, "v2 of 3"), (7, "v2 of 7"), (20, "v1 of 20")]
    b2 = [(3, "v3 of 3"), (21, "v1 of 21")]
    try:
        for rows in (b1, b2):
            _mk_docs(spark, rows).coalesce(1) \
                .write.mode("append").parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()

    final = {i: f"v1 of {i}" for i in range(12)}
    final.update({3: "v3 of 3", 7: "v2 of 7",
                  20: "v1 of 20", 21: "v1 of 21"})
    rb = str(tmp_path / "ds_cdc_oneshot")
    docstore_build(_mk_docs(spark, sorted(final.items())),
                   "dst_cdc_oneshot", rb, num_buckets=8)

    ids = [0, 3, 7, 11, 20, 21]

    def fetch(prefix, path):
        return sorted((r["doc_id"], r["text"]) for r in
                      docstore_fetch(spark, prefix, path, ids).collect())

    got = fetch("dst_cdc", idx)
    assert got == fetch("dst_cdc_oneshot", rb) and len(got) == len(ids)
    # replay of micro-batch 0 (the b1 content) is skipped by the ledger
    assert docstore_upsert(_mk_docs(spark, b1), "dst_cdc", idx,
                           num_buckets=8, batch_id=0) is False
    assert fetch("dst_cdc", idx) == got
