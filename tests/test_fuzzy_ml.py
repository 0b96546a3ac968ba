"""Semantic tests (beyond oracle parity) for the r5 fuzzy-join and
training-loop operators: planted ground truth for the deletion-
neighborhood blocking, and optimizer sanity for the GD loop."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _fuzzy_counts(spark, rows):
    """Run fuzzy_name_matches' pipeline on a synthetic customer frame
    by monkey-free substitution: same code path via a temp view is
    overkill — rebuild the tiny pipeline inline from the module's
    building blocks instead."""
    from jcf_nb_migration_spark.queries.fuzzy_ops import _DELETES

    c = spark.createDataFrame(rows, "c_custkey bigint, c_name string")
    keys = c.select(
        "c_custkey", "c_name",
        F.explode(F.array_union(F.array(F.col("c_name")),
                                F.expr(_DELETES))).alias("key"))
    a, b = keys.alias("a"), keys.alias("b")
    cand = (a.join(b, (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.c_custkey") < F.col("b.c_custkey")))
            .select(F.col("a.c_custkey").alias("id_a"),
                    F.col("a.c_name").alias("name_a"),
                    F.col("b.c_custkey").alias("id_b"),
                    F.col("b.c_name").alias("name_b"))
            .distinct())
    hits = cand.where(F.levenshtein("name_a", "name_b") <= 1)
    return {(r.id_a, r.id_b) for r in hits.collect()}


def test_deletion_neighborhood_blocking_is_lossless_ed1(spark):
    """Every planted ed<=1 pair must surface (substitution, insertion,
    deletion); the ed=2 pairs must not."""
    rows = [
        (1, "smith"), (2, "smyth"),      # substitution -> ed 1
        (3, "jonson"), (4, "johnson"),   # insertion    -> ed 1
        (5, "lee"), (6, "le"),           # deletion     -> ed 1
        (7, "abc"), (8, "cba"),          # ed 2: must NOT match
        (9, "totallydifferent"),
    ]
    got = _fuzzy_counts(spark, rows)
    assert got == {(1, 2), (3, 4), (5, 6)}


def test_fuzzy_name_matches_counts_are_symmetric(spark):
    """On the real fixture: sum of per-customer counts is even (every
    pair contributes to both endpoints) and at least one customer has
    a nonzero count (TPC-H names differ by single digits)."""
    from jcf_nb_migration_spark.registry import get

    pdf = get("fuzzy_name_matches").fn(spark, SF_SMALL).toPandas()
    total = int(pdf.n_fuzzy_matches.sum())
    assert total % 2 == 0
    assert total > 0


def test_logreg_training_loss_is_monotone_decreasing(spark):
    """The committed (lr, iters) must actually optimize: the quantized
    SSE strictly decreases across iterations on the fixture (lr=0.5
    oscillated — that regression stays caught here)."""
    from jcf_nb_migration_spark.registry import get

    pdf = (get("logreg_gd_training").fn(spark, SF_SMALL)
           .toPandas().sort_values("iter"))
    sses = pdf.sse9.tolist()
    assert all(b < a for a, b in zip(sses, sses[1:])), sses
    # and the final weights are finite, non-degenerate
    assert pdf[["w0", "w1", "w2", "w3"]].notna().all().all()
