"""Semantic tests (beyond oracle parity) for the r5 fuzzy-join and
training-loop operators: planted ground truth for the deletion-
neighborhood blocking, and optimizer sanity for the GD loop."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _fuzzy_counts(spark, rows, max_ed=1):
    from jcf_nb_migration_spark.functions.fuzzy import (
        fuzzy_self_join_pairs)

    c = spark.createDataFrame(rows, "c_custkey bigint, c_name string")
    hits = fuzzy_self_join_pairs(c, "c_custkey", "c_name", max_ed)
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


def test_deletion_blocking_lossless_vs_brute_force_k2(spark):
    """Property check of the SymSpell claim at k=2: over a vocabulary
    dense in near-misses, the deletion-blocked join returns EXACTLY
    the brute-force all-pairs result for levenshtein <= 2."""
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    base = ["abcde", "abde", "abxde", "xbcde", "abcdx", "aXcYe",
            "vwxyz", "vwxy", "zyxwv", "abc", "ab", "a", "qqqqq",
            "abfde", "fbcde", "abcfe"]
    rows = list(enumerate(base))
    want = {(i, j) for (i, sa), (j, sb)
            in itertools.combinations(rows, 2) if lev(sa, sb) <= 2}
    got = _fuzzy_counts(spark, rows, max_ed=2)
    assert got == want
