"""Planted-truth tests for source_embedding_drift and
knn_label_propagation: cross-engine oracle parity (test_query_oracles)
can't catch a bug mirrored into both implementations, so these pin the
results on fixtures where the right answer is known by construction."""

from __future__ import annotations

import os

import pytest

from jcf_nb_migration_spark.registry import all_queries


def _write(df, d, name):
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet"))


def test_drift_planted_outlier_source(spark, tmp_path):
    """Three sources: two aligned on [1,0], one orthogonal on [0,1].
    Global centroid is [0.8, 0.2], so the aligned sources' drift
    cosine is 0.8/sqrt(0.68) and the outlier's is 0.2/sqrt(0.68) —
    closed-form, checked to the query's 9-decimal rounding."""
    d = str(tmp_path / "sf")
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [1.0, 0.0], 0),
         (2, [1.0, 0.0], 0), (3, [1.0, 0.0], 0),
         (4, [0.0, 1.0], 1)],
        "vec_id long, embedding array<float>, label int")
    docs = spark.createDataFrame(
        [(0, "a", "en", "srcA", 1), (1, "b", "en", "srcA", 1),
         (2, "c", "en", "srcB", 1), (3, "d", "en", "srcB", 1),
         (4, "e", "en", "srcC", 1)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    _write(emb, d, "embeddings")
    _write(docs, d, "documents")

    rows = {r.source: r for r in
            all_queries()["source_embedding_drift"].fn(spark, d).collect()}
    assert set(rows) == {"srcA", "srcB", "srcC"}
    assert rows["srcA"].n_vecs == 2
    assert rows["srcB"].n_vecs == 2
    assert rows["srcC"].n_vecs == 1
    aligned = 0.8 / (0.68 ** 0.5)   # cos([1,0], [0.8,0.2])
    outlier = 0.2 / (0.68 ** 0.5)   # cos([0,1], [0.8,0.2])
    assert rows["srcA"].drift_cos == pytest.approx(aligned, abs=1e-9)
    assert rows["srcB"].drift_cos == rows["srcA"].drift_cos
    assert rows["srcC"].drift_cos == pytest.approx(outlier, abs=1e-9)
    assert rows["srcC"].drift_cos < rows["srcA"].drift_cos


def test_knn_planted_clusters(spark, tmp_path):
    """Two probes aimed at two disjoint direction clusters: every one
    of the 15 nearest neighbors of each probe carries that cluster's
    label, so the vote is unanimous regardless of the probes' own
    (deliberately wrong) true labels."""
    d = str(tmp_path / "sf")
    rows = [(0, [1.0, 0.0, 0.0], 99),   # probe 0 -> cluster A
            (1, [0.0, 1.0, 0.0], 98)]   # probe 1 -> cluster B
    # cluster A: ids 10..29, label 7, along [1,0,0] with a tiny
    # off-axis component so cosines are distinct but stay > any
    # cross-cluster cosine; cluster B: ids 30..49, label 3.
    for i in range(20):
        rows.append((10 + i, [1.0, 0.001 * i, 0.0], 7))
        rows.append((30 + i, [0.0, 1.0, 0.001 * i], 3))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    _write(emb, d, "embeddings")

    out = {r.probe_id: r for r in
           all_queries()["knn_label_propagation"].fn(spark, d).collect()}
    assert set(out) == {0, 1}
    assert (out[0].pred_label, out[0].votes) == (7, 15)
    assert (out[1].pred_label, out[1].votes) == (3, 15)
    # true_label passes through untouched — it plays no role in the vote
    assert out[0].true_label == 99
    assert out[1].true_label == 98


def test_hard_negatives_skip_own_label_cluster(spark, tmp_path):
    """A probe labeled like its own nearest cluster must mine ALL its
    hard negatives from the other cluster — the label filter, not
    plain similarity, decides."""
    d = str(tmp_path / "sf")
    rows = [(0, [1.0, 0.0, 0.0], 7)]    # probe shares cluster A's label
    for i in range(20):
        rows.append((10 + i, [1.0, 0.001 * i, 0.0], 7))   # same label
        rows.append((30 + i, [0.5, 1.0, 0.001 * i], 3))   # negatives
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    _write(emb, d, "embeddings")

    out = all_queries()["hard_negative_mining"].fn(spark, d).collect()
    assert len(out) == 5
    assert all(r.neighbor_label == 3 for r in out)
    assert all(30 <= r.neighbor_id < 50 for r in out)
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    # the 0.001*i tilt only adds off-axis magnitude, so cosine to the
    # probe falls as i grows: rank 1 is the untilted vector, id 30
    assert out[0].neighbor_id == 30
