"""Streaming + multimodal surface tests (real streaming queries driven
to completion; Arrow-batch decode plumbing; stub gating)."""

import pytest
from pyspark.sql import functions as F

from jcf_nb_migration_spark.functions.multimodal import (
    attach_payload,
    decode_media,
    resize_images,
)
from jcf_nb_migration_spark.registry import t
from jcf_nb_migration_spark.streaming import events as SE
from tests.conftest import SF_SMALL


def test_hourly_stream_equals_batch(spark):
    out = SE.hourly_counts_stream(spark, SF_SMALL)
    batch = (
        t(spark, SF_SMALL, "events")
        .groupBy(F.date_format(F.date_trunc("hour", "ts"),
                               "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
                 "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
              .alias("total_value"))
    )
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0


def test_stateful_running_totals(spark):
    out = SE.running_user_totals_stateful(spark, SF_SMALL).toPandas()
    batch = (t(spark, SF_SMALL, "events").groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events"))).toPandas()
    got = dict(zip(out.user_id, out.n_events))
    want = dict(zip(batch.user_id, batch.n_events))
    assert got == want


def test_multimodal_decode_fake(spark):
    docs = t(spark, SF_SMALL, "documents")
    dec = decode_media(attach_payload(docs), fake=True).toPandas()
    src = docs.select("doc_id", "text").toPandas()
    joined = dec.merge(src, on="doc_id")
    assert len(joined) == len(src)
    # stub arithmetic holds against the source text
    sample = joined.head(20)
    for _, r in sample.iterrows():
        assert r["width"] == ord(r["text"][0]) + 64
        assert r["height"] == (len(r["text"]) % 480) + 16
        assert r["n_bytes"] == len(r["text"])


def test_multimodal_real_decode_gated(spark):
    docs = t(spark, SF_SMALL, "documents")
    with pytest.raises(NotImplementedError):
        decode_media(attach_payload(docs), fake=False)
    with pytest.raises(NotImplementedError):
        resize_images(attach_payload(docs), 64, 64)


def test_stream_stream_interval_join_equals_batch(spark):
    from jcf_nb_migration_spark.functions.asof import range_join_buckets

    out = SE.interval_join_stream(spark, SF_SMALL, gap_seconds=120)
    ev = t(spark, SF_SMALL, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("error_id"))
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"))
    batch = range_join_buckets(errors, clicks, key="user_id", ts="ts",
                               max_gap_seconds=120,
                               left_id="error_id", right_id="click_id")
    got = {(r["error_id"], r["click_id"]) for r in out.collect()}
    want = {(r["error_id"], r["click_id"]) for r in batch.collect()}
    assert got == want


def test_stream_stream_asof_join_equals_batch(spark):
    """The composed streaming as-of (bounded interval join + max_by
    aggregation, chained stateful ops) must equal the batch
    formulation: per error, the latest click at-or-before it within
    the lookback, deterministic id tiebreak."""
    lookback = 3600
    out = SE.asof_join_stream(spark, SF_SMALL, lookback_seconds=lookback)

    ev = t(spark, SF_SMALL, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("e_ts"),
        F.col("event_id").alias("error_id"))
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"))
    batch = (
        errors.join(
            clicks,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("c_ts") <= F.col("e_ts"))
            & (F.col("c_ts") >= F.col("e_ts")
               - F.expr(f"INTERVAL {lookback} SECONDS")))
        .groupBy("error_id")
        .agg(F.max(F.struct(F.col("c_ts"), F.col("click_id"))).alias("m"))
        .select("error_id", F.col("m.click_id").alias("click_id"),
                F.col("m.c_ts").alias("click_ts")))
    # Append-mode emission: an error's group finalizes when the
    # watermark (max e_ts - 1 h) passes its hour window's end. Errors
    # newer than that remain in state — restrict the batch expectation
    # to finalized windows.
    max_e = errors.agg(F.max("e_ts")).collect()[0][0]
    batch = batch.join(
        errors.select("error_id", "e_ts"), "error_id").where(
        F.date_trunc("hour", F.col("e_ts")) + F.expr("INTERVAL 1 HOUR")
        <= F.lit(max_e) - F.expr("INTERVAL 1 HOUR"))
    got = {(r["error_id"], r["click_id"], r["click_ts"])
           for r in out.collect()}
    want = {(r["error_id"], r["click_id"], r["click_ts"])
            for r in batch.collect()}
    assert want and got == want


def test_foreach_batch_idempotent_sink(spark, tmp_path):
    """foreachBatch exactly-once pattern: write each micro-batch to a
    batch-id-named path — a retry of the same epoch overwrites instead
    of duplicating."""
    import os

    out_dir = str(tmp_path / "sink")
    seen = []

    def sink(batch_df, epoch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={epoch_id}"))
        seen.append(epoch_id)

    st = SE.events_stream_source(spark, SF_SMALL)
    q = (st.select("event_id", "user_id")
         .writeStream.foreachBatch(sink)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert seen, "no micro-batch processed"
    back = spark.read.parquet(os.path.join(out_dir, f"epoch={seen[0]}"))
    assert back.count() == t(spark, SF_SMALL, "events").count()


def test_foreach_batch_sink_package_api(spark, tmp_path):
    """The package-level foreachBatch sink (streaming/events.py):
    writes land under batch_id=N dirs, and replaying a batch (the
    restart contract) overwrites rather than duplicates."""
    import os

    out_dir = str(tmp_path / "fb_sink")
    seen = SE.foreach_batch_parquet_sink(spark, SF_SMALL, out_dir)
    assert seen, "no micro-batch processed"
    n_events = t(spark, SF_SMALL, "events").count()
    first = os.path.join(out_dir, f"batch_id={seen[0]}")
    assert spark.read.parquet(first).count() == n_events
    # simulate a restart replaying the same batch id: same dir, same
    # rows — overwrite semantics keep the output exactly-once
    again = SE.foreach_batch_parquet_sink(spark, SF_SMALL, out_dir)
    assert spark.read.parquet(
        os.path.join(out_dir, f"batch_id={again[0]}")).count() == n_events
    total = spark.read.option("basePath", out_dir).parquet(
        out_dir + "/batch_id=*").select("event_id").distinct().count()
    assert total == n_events


def test_multimodal_frame_sample_fanout(spark):
    from jcf_nb_migration_spark.functions.multimodal import sample_frames

    decoded = decode_media(attach_payload(t(spark, SF_SMALL, "documents")),
                           fake=True)
    frames = sample_frames(decoded, every_n=2, fake=True).toPandas()
    meta = decoded.toPandas()
    # fan-out: one row per sampled frame, ceil(n_frames/2) per doc
    want = int(((meta["n_frames"] + 1) // 2).sum())
    assert len(frames) == want
    assert (frames["frame_ts_ms"] == frames["frame_idx"] * 40).all()


def test_multimodal_feature_extract(spark):
    from jcf_nb_migration_spark.functions.multimodal import extract_features
    from jcf_nb_migration_spark.functions import similarity as S

    docs = t(spark, SF_SMALL, "documents")
    feats = extract_features(attach_payload(docs), dim=16, fake=True)
    rows = feats.limit(5).collect()
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows for v in r["features"])
    # deterministic: same payload -> same vector across runs
    again = {r["doc_id"]: r["features"] for r in
             extract_features(attach_payload(docs), dim=16, fake=True)
             .limit(5).collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["features"]
    # the extracted features feed the similarity operators unchanged
    emb_like = feats.withColumnRenamed("doc_id", "vec_id") \
                    .withColumnRenamed("features", "embedding")
    probe = emb_like.limit(1)
    top = S.brute_force_topk(emb_like, probe, k=3).collect()
    assert len(top) == 3 and abs(top[0]["cos_sim"] - 1.0) < 1e-9

    with pytest.raises(NotImplementedError):
        extract_features(attach_payload(docs), fake=False)


def test_transform_with_state_gated_or_equals_batch(spark):
    """transformWithStateInPandas (Spark 4 StatefulProcessor + MapState)
    needs the protobuf python package for its state-server protocol;
    absent here, the operator must raise the honest guard. Where
    protobuf IS available the same test drives the stream and compares
    to the batch groupBy truth."""
    from jcf_nb_migration_spark.streaming import events as SE

    if not SE._tws_protobuf_available():
        with pytest.raises(NotImplementedError):
            SE.type_counts_tws(spark, SF_SMALL)
        return
    got = SE.type_counts_tws(spark, SF_SMALL).toPandas()
    ev = t(spark, SF_SMALL, "events").toPandas()
    per = (ev.groupby(["user_id", "event_type"]).size()
           .reset_index(name="n"))
    for _, row in got.iterrows():
        sub = per[per.user_id == row.user_id]
        assert row.n_event_types == len(sub)
        assert row.n_events == sub.n.sum()
        best = sub.sort_values(["n", "event_type"],
                               ascending=False).iloc[0]
        assert row.top_type == best.event_type


def test_statestore_reader_inspects_checkpoint_offline(spark, tmp_path):
    """Operational surface: the statestore / state-metadata batch
    readers open a streaming checkpoint OFFLINE and expose the
    operator's keyed state as DataFrames — how you audit or debug
    streaming state without replaying the stream. The per-user counts
    recovered from the checkpoint must equal the batch groupBy truth,
    and state-metadata must describe the agg operator."""
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.streaming.events import (
        events_stream_source)

    cp = str(tmp_path / "ckpt")
    st = events_stream_source(spark, SF_SMALL)
    agg = st.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    q = (agg.writeStream.outputMode("update").format("memory")
         .queryName("jcf_state_inspect")
         .option("checkpointLocation", cp).start())
    q.processAllAvailable()
    q.stop()

    # the state value struct carries the aggregate buffer under its
    # function name ("count"), not the output alias
    state = (spark.read.format("statestore").load(cp)
             .select(F.col("key.user_id").alias("user_id"),
                     F.col("value.count").alias("n")).toPandas())
    truth = (t(spark, SF_SMALL, "events").groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n")).toPandas())
    got = dict(zip(state.user_id, state.n))
    want = dict(zip(truth.user_id, truth.n))
    assert got == want

    md = spark.read.format("state-metadata").load(cp).toPandas()
    assert len(md) == 1
    assert md.operatorName[0] == "stateStoreSave"
