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

Convergence contract (VERDICT r6 item 1): a fixed round count is a
silent-wrongness hazard — a deeper-than-expected component would
under-contract and emit a SPLIT labeling with no error. The engine
default (``rounds=None``) therefore runs to a CERTIFIED fixpoint: it
contracts in batches (localCheckpoint between batches truncates
lineage) and after each batch verifies the post-condition that NO
ORIGINAL EDGE CROSSES TWO LABELS. That certificate is sound and
complete for split detection: labels only ever merge along edges (no
over-merge is constructible), and if a true component were split, its
connectivity guarantees some original edge bridges the two label
groups. The pinned-``rounds`` mode exists solely for the
oracle-replayed query, whose DuckDB twin unrolls the same round count
bit-exactly; its convergence on the fixture graph is separately pinned
against union-find in tests/test_linkgraph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CC_ROUNDS = 5  # pinned replay depth for the oracle-unrolled query
#               (fixture graphs converge at 4 — one round of margin,
#               pinned vs union-find in tests/test_linkgraph.py);
#               engine default rounds=None runs to a certified fixpoint
CC_PROBE_EVERY = 2   # extra rounds between certificate probes
CC_MAX_ROUNDS = 64   # loud-failure backstop: O(log² n) needs far fewer
#                      rounds than this for any physical graph; hitting
#                      it means the input violates assumptions — raise,
#                      never return an uncertified labeling


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


def _contract(e: DataFrame, rounds: int) -> DataFrame:
    """``rounds`` alternating large-star/small-star rounds over an
    (a, b) edge frame → contracted (a, b) edge frame.

    Every phase is a SINGLE linear operator chain over its input —
    symmetrize by explode, per-node minimum by a u-PARTITIONED window
    (bounded by node degree), emissions by a second explode — so
    ``rounds`` rounds grow the plan linearly, and each phase costs one
    hash shuffle on the node id."""
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
    return e


def _labels(e: DataFrame) -> DataFrame:
    """Edge frame → per-node (u, component) assignment."""
    return symmetrize(e).groupBy("u").agg(
        F.least(F.min("v"), F.col("u")).alias("component"))


def crossing_edges(pairs: DataFrame, labels: DataFrame) -> int:
    """Number of ORIGINAL edges whose endpoints carry different labels
    (0 ⇒ the labeling is a certified union of true components). LEFT
    joins + null-safe inequality so a node missing from ``labels``
    counts as a violation instead of silently dropping. One row is
    enough to refute — limit(1) short-circuits the scan."""
    lu = labels.select(F.col("u").alias("_lu"),
                       F.col("component").alias("_cu"))
    lv = labels.select(F.col("u").alias("_lv"),
                       F.col("component").alias("_cv"))
    # explicit null arms: eqNullSafe(null, null) is TRUE, which would
    # certify an edge BOTH of whose endpoints are unlabeled
    bad = (F.col("_cu").isNull() | F.col("_cv").isNull()
           | (F.col("_cu") != F.col("_cv")))
    return (pairs.join(lu, pairs["u"] == F.col("_lu"), "left")
            .join(lv, pairs["v"] == F.col("_lv"), "left")
            .where(bad)
            .limit(1).count())


SSSP_MAX_ROUNDS = 256  # Bellman-Ford needs ≤ |V|-1 rounds; a physical
#                        link graph converges in O(weighted diameter).
#                        Hitting the cap means the input violates
#                        assumptions (or has astronomically long thin
#                        paths) — raise, never return unconverged dists.


def sssp(edges: DataFrame, source: DataFrame,
         max_hops: int | None = None) -> DataFrame:
    """Single-source shortest paths over a weighted, directed
    ``(u, v, w)`` edge frame (symmetrize upstream for undirected
    graphs; weights must be non-negative — Bellman-Ford's monotone
    convergence argument needs it and nothing here detects negative
    cycles). ``source`` is a one-row ``(node)`` frame so the seed can
    come straight out of an aggregation without a driver collect.

    Returns ``(node, dist)`` with ``dist`` in the weight's type.

    Physical shape: each relaxation round is ONE equi-join of the
    current distance frame against the edges on the source endpoint
    plus ONE min-aggregate on the destination — the textbook
    distributed Bellman-Ford step, linear in |edges| per round, with
    shuffles only on node ids. The distance frame is referenced once
    per round (union of carry-forward and relaxed candidates), so the
    lazy plan grows linearly in rounds.

    ``max_hops=k``: exactly k relaxation rounds, fully lazy — computes
    the min-cost path USING AT MOST k EDGES (hop-bounded SSSP, a
    well-defined operator at any scale; the oracle-replayed query
    unrolls the identical k rounds in SQL).

    ``max_hops=None`` (engine default): run to a CERTIFIED fixpoint —
    batches of rounds with ``localCheckpoint`` between them (the
    star_components lineage-truncation idiom) and an eager
    changed-distance probe; a round that improves no distance is the
    Bellman-Ford termination certificate (sound: distances only ever
    decrease; complete: any shorter path has a first relaxable edge).
    Raises after SSSP_MAX_ROUNDS rather than returning unconverged
    distances."""
    for c in ("u", "v", "w"):
        if c not in edges.columns:
            raise ValueError(f"sssp edges need (u, v, w); missing {c!r}")
    dist = source.select(F.col(source.columns[0]).alias("node"),
                         F.lit(0).cast(
                             edges.schema["w"].dataType).alias("dist"))

    def relax(d: DataFrame) -> DataFrame:
        cand = (d.join(edges, d["node"] == edges["u"])
                .select(F.col("v").alias("node"),
                        (F.col("dist") + F.col("w")).alias("dist")))
        return (d.unionByName(cand)
                .groupBy("node").agg(F.min("dist").alias("dist")))

    if max_hops is not None:
        for _ in range(max_hops):
            dist = relax(dist)
        return dist

    BATCH = 8
    done = 0
    dist = dist.localCheckpoint(eager=True)
    while done < SSSP_MAX_ROUNDS:
        nxt = relax(dist)
        for _ in range(BATCH - 1):
            nxt = relax(nxt)
        nxt = nxt.localCheckpoint(eager=True)
        done += BATCH
        # convergence probe: any node whose dist still improves?
        # (new nodes can only appear WITH an improvement, and dists
        # never increase, so an anti/changed check on the new frame
        # against the old is sound)
        old = dist.select(F.col("node").alias("_n"),
                          F.col("dist").alias("_d"))
        changed = (nxt.join(old, nxt["node"] == F.col("_n"), "left")
                   .where(F.col("_d").isNull()
                          | (F.col("dist") < F.col("_d")))
                   .limit(1).count())
        dist = nxt
        if changed == 0:
            return dist
    raise RuntimeError(
        f"sssp: no fixpoint after {SSSP_MAX_ROUNDS} rounds; refusing "
        "to return possibly-unconverged distances")


def star_components(pairs: DataFrame,
                    rounds: int | None = None) -> DataFrame:
    """(u < v) pair frame → per-node ``(u, component)`` assignment.

    ``rounds=None`` (the engine default): contract to a CERTIFIED
    fixpoint — run CC_ROUNDS rounds, localCheckpoint the shrunken edge
    frame (truncating lineage so extra rounds never grow the plan past
    one batch), and probe the no-crossing-edge certificate; repeat in
    CC_PROBE_EVERY-round batches until it holds, raising after
    CC_MAX_ROUNDS rather than returning an uncertified labeling. The
    probe is eager (legitimate iterative-driver state, like the
    ``changed == 0`` probe in functions/dedup.py) and costs two
    node-keyed equi-joins against the ORIGINAL pairs — callers looping
    at scale should persist ``pairs``.

    ``rounds=k``: pinned replay, fully lazy, no probe — only for the
    oracle-unrolled query (linkgraph_cc_starcontraction), whose DuckDB
    twin materializes the identical k rounds."""
    e = pairs.select(F.col("u").alias("a"), F.col("v").alias("b"))
    if rounds is not None:
        return _labels(_contract(e, rounds))
    done = 0
    while True:
        step = CC_ROUNDS if done == 0 else CC_PROBE_EVERY
        if done + step > CC_MAX_ROUNDS:  # cap is a hard ceiling
            raise RuntimeError(
                f"star_components: no certified fixpoint after {done} "
                f"rounds (cap {CC_MAX_ROUNDS}); refusing to return a "
                "possibly-split labeling")
        e = _contract(e, step).localCheckpoint(eager=True)
        done += step
        lab = _labels(e)
        if crossing_edges(pairs, lab) == 0:
            return lab


def label_propagation(pairs: DataFrame, rounds: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over an undirected ``(u, v)`` pair frame (the
    star_components contract — NOT symmetrize's internal ``(a, b)``
    shape), run a FIXED
    number of rounds with a deterministic tie-break: every node starts
    as its own label; each round a node adopts the label most frequent
    among its NEIGHBORS (ties → smallest label). Fixed-round +
    deterministic ties makes the result a pure function of the edge
    set — reproducible across partitionings AND replayable in SQL (the
    oracle unrolls the same rounds), unlike the randomized-order LPA
    of the paper. Synchronous LPA can oscillate on bipartite
    structures; a fixed round budget is the standard remedy (and what
    GraphFrames' LPA does). Columns: ``node, label``.

    Per round: one equi-join (edges ⋈ labels on dst — shuffle on node
    id) + one (node, label) count + one max-struct argmax groupBy —
    all key-partitioned, no broadcast of anything node-sized, the SSSP
    cost model. ``localCheckpoint`` truncates lineage per round so the
    plan stays round-sized (the graph-loop lesson pinned in
    tests/test_linkgraph.py)."""
    e = (symmetrize(pairs.select(F.col("u").alias("a"),
                                 F.col("v").alias("b")))
         .select(F.col("u").alias("src"), F.col("v").alias("dst")))
    e = e.localCheckpoint(eager=True)
    labels = (e.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    for _ in range(rounds):
        msgs = (e.join(labels.withColumnRenamed("node", "dst"), "dst")
                .select("src", "label"))
        counts = (msgs.groupBy("src", "label")
                  .agg(F.count(F.lit(1)).alias("n")))
        picked = (counts.groupBy("src")
                  .agg(F.max(F.struct(
                      F.col("n"),
                      (-F.col("label")).alias("neg_label"))).alias("m"))
                  .select(F.col("src").alias("node"),
                          (-F.col("m.neg_label")).alias("label")))
        labels = picked.localCheckpoint(eager=True)
    return labels
