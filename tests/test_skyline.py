"""Skyline (Pareto frontier) operator pins.

The registered query's oracle covers the 2-D case positionally
(running-max sweep); the GENERAL d-dimensional operator is pinned here
against brute-force dominance on seeded random data, across
partitionings (the two-phase algorithm must be partitioning-invariant)
and including the tie/duplicate semantics the kernel documents."""

import random


def _brute_skyline(rows, dims):
    """O(n²) ground truth: r survives iff no s is ≥ on all dims and >
    on at least one."""
    out = []
    for r in rows:
        dominated = any(
            all(s[d] >= r[d] for d in dims)
            and any(s[d] > r[d] for d in dims)
            for s in rows)
        if not dominated:
            out.append(r)
    return out


def _ids(rows):
    return sorted(r["id"] for r in rows)


def test_skyline_matches_brute_force_3d(spark):
    from jcf_nb_migration_spark.functions.skyline import skyline

    rng = random.Random(7)
    rows = [{"id": i, "x": rng.randint(0, 12), "y": rng.randint(0, 12),
             "z": rng.randint(0, 12)} for i in range(300)]
    truth = _ids(_brute_skyline(rows, ("x", "y", "z")))
    df = spark.createDataFrame(
        [(r["id"], r["x"], r["y"], r["z"]) for r in rows],
        "id bigint, x bigint, y bigint, z bigint")
    for parts in (1, 7, 32):
        got = sorted(
            r["id"] for r in
            skyline(df.repartition(parts), ["x", "y", "z"]).collect())
        assert got == truth, f"partitioning {parts} changed the set"


def test_skyline_ties_and_duplicates(spark):
    """Duplicates of a frontier point all survive (dominance needs a
    STRICT improvement somewhere); a point merely tied on one dim but
    beaten on the other is dominated."""
    from jcf_nb_migration_spark.functions.skyline import skyline

    rows = [(1, 5, 5), (2, 5, 5),    # duplicate frontier points
            (3, 5, 4),               # dominated by (5,5)
            (4, 6, 1), (5, 1, 6)]    # corner frontier points
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
    got = sorted(r["id"] for r in skyline(df, ["x", "y"]).collect())
    assert got == [1, 2, 4, 5]


def test_skyline_one_dim_and_empty(spark):
    from jcf_nb_migration_spark.functions.skyline import skyline

    df = spark.createDataFrame(
        [(1, 3), (2, 9), (3, 9), (4, 0)], "id bigint, x bigint")
    got = sorted(r["id"] for r in skyline(df, ["x"]).collect())
    assert got == [2, 3]  # every max-value row, nothing else
    empty = df.where("x < -1")
    assert skyline(empty, ["x"]).count() == 0


def test_skyline_cross_batch_dominance(spark):
    """ADVICE r10 (high): with more candidates than one Arrow batch,
    the global pass must fold batches into ONE frontier — a point
    dominated only by a point in ANOTHER batch must not survive. Forces
    tiny Arrow batches so the global partition arrives in many."""
    from jcf_nb_migration_spark.functions.skyline import skyline

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "50")
    try:
        # (i, 0) for i<5000 are all dominated by the single (6000, 1)
        # point; per-batch reduction would keep each batch's max-i row.
        rows = [(i, i, 0) for i in range(5000)] + [(5000, 6000, 1)]
        df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
        got = sorted(r["id"]
                     for r in skyline(df.repartition(8),
                                      ["x", "y"]).collect())
        assert got == [5000], f"superset skyline survived: {got[:10]}"
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_skyline_float_dims_and_validation(spark):
    import pytest

    from jcf_nb_migration_spark.functions.skyline import skyline

    rng = random.Random(3)
    rows = [(i, rng.random(), rng.random()) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, x double, y double")
    truth = _ids(_brute_skyline(
        [{"id": i, "x": x, "y": y} for i, x, y in rows], ("x", "y")))
    got = sorted(r["id"]
                 for r in skyline(df.repartition(5), ["x", "y"]).collect())
    assert got == truth
    with pytest.raises(ValueError, match="not in frame"):
        skyline(df, ["x", "nope"])
    with pytest.raises(ValueError, match="at least one"):
        skyline(df, [])
