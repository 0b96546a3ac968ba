"""Distributed graph primitives built from DataFrame algebra.

The one implemented today is connected components by alternating
large-star/small-star contraction (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and
Beyond", SoCC 2014): O(log² n) rounds versus min-label propagation's
O(diameter), every phase a single linear operator chain over its
input. Used by linkgraph_cc_starcontraction (rare-gram document link
graph) and available to entity-resolution pipelines (see
record_linkage_merge's docstring for when linkage beats self-join ER).

Implementation lesson encoded here: an iterative DataFrame algorithm
must reference the previous round's frame ONCE per phase — explode-
based symmetrization and windowed per-node minima keep plan growth
linear in rounds, where the textbook self-union/self-join spelling
multiplies the lazy plan ~6× per round and OOMs the analyzer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CC_ROUNDS = 5  # alternating large/small-star rounds (O(log^2 n) conv.;
#               fixture graphs converge at 4 — one round of margin,
#               pinned vs union-find in tests/test_linkgraph.py)


def symmetrize(e: DataFrame) -> DataFrame:
    """(a, b) pair frame → both-direction (u, v) adjacency with ONE
    structural reference to the input (explode, not self-union): the
    contraction loop would otherwise multiply the logical plan ~6× per
    round — exponential analysis cost (the bug an eager engine never
    sees and a lazy one dies on)."""
    return (e.select(F.explode(F.array(
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                F.struct(F.col("b").alias("u"), F.col("a").alias("v"))))
            .alias("d"))
            .select("d.u", "d.v"))


def star_components(pairs: DataFrame,
                     rounds: int = CC_ROUNDS) -> DataFrame:
    """The contraction itself: (u < v) pair frame → per-node
    ``(u, component)`` assignment after ``rounds`` alternating
    large/small-star rounds. Shared by the query and the union-find
    convergence test (tests/test_linkgraph.py).

    Every phase is a SINGLE linear operator chain over its input —
    symmetrize by explode, per-node minimum by a u-PARTITIONED window
    (bounded by node degree), emissions by a second explode — so
    ``rounds`` rounds grow the plan linearly, and each phase costs one
    hash shuffle on the node id."""
    e = pairs.select(F.col("u").alias("a"), F.col("v").alias("b"))
    wu = Window.partitionBy("u")
    for _ in range(rounds):
        # large-star: every neighbor v > u re-points at min(Γ⁺(u))
        adj = symmetrize(e)
        e = (adj.withColumn("m", F.least(F.min("v").over(wu), F.col("u")))
             .where(F.col("v") > F.col("u"))
             .select(F.col("m").alias("a"), F.col("v").alias("b"))
             .distinct())
        # small-star: neighbors v < u (and u itself) re-point at their
        # minimum; (m,u) emitted per row + distinct ≡ one per node
        sm = symmetrize(e).where(F.col("v") < F.col("u"))
        e = (sm.withColumn("m", F.min("v").over(wu))
             .select(F.explode(F.array(
                 F.struct(F.col("m").alias("a"), F.col("v").alias("b")),
                 F.struct(F.col("m").alias("a"), F.col("u").alias("b"))))
                 .alias("p"))
             .select("p.a", "p.b")
             .where(F.col("a") != F.col("b"))
             .distinct())
    return symmetrize(e).groupBy("u").agg(
        F.least(F.min("v"), F.col("u")).alias("component"))


