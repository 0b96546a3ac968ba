"""Link-graph algorithm ground-truth pins.

The star-contraction CC query's oracle proves Spark and DuckDB run the
IDENTICAL contraction — it cannot prove the contraction CONVERGED to
true connected components within CC_ROUNDS. That claim is pinned here
against a driver-side union-find over the same edge set (fixture-sized;
the ground truth is exact)."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # path-compress to the set MINIMUM (star contraction's root choice)
    return {n: find(n) for n in parent}


def test_star_contraction_converges_to_union_find(spark):
    """After CC_ROUNDS alternating large/small-star rounds every node
    must point at its component's minimum id — byte-for-byte the
    union-find assignment. A failure here means CC_ROUNDS is too small
    for the fixture graph (raise it), not an engine bug."""
    from jcf_nb_migration_spark.queries.corpus_ops import (
        _rare_gram_pairs, _star_components,
    )
    from jcf_nb_migration_spark.registry import spread, t

    docs = spread(t(spark, SF_SMALL, "documents"))
    pairs = _rare_gram_pairs(docs).persist()
    edges = [(r["u"], r["v"]) for r in pairs.collect()]
    assert edges, "fixture produced no rare-gram edges"
    truth = _union_find_components(edges)

    got = {r["u"]: r["component"]
           for r in _star_components(pairs).collect()}
    assert got == truth
    pairs.unpersist()


def test_star_contraction_edge_cases(spark):
    """Hand graphs where one-shot min-propagation would be wrong:
    a path (diameter > rounds per naive propagation), a star rooted
    at the MAX id, and two disjoint components."""
    from jcf_nb_migration_spark.queries.corpus_ops import _star_components

    edges = ([(i, i + 1) for i in range(10, 18)]          # path 10..18
             + [(99, x) for x in (50, 60, 70)]            # max-root star
             + [(200, 201), (201, 202)])                  # separate comp
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "u bigint, v bigint")
    got = {r["u"]: r["component"]
           for r in _star_components(pairs).collect()}
    truth = _union_find_components(edges)
    assert got == truth
    assert got[18] == 10 and got[99] == 50 and got[202] == 200


def test_star_contraction_random_graphs(spark):
    """Property check on random graphs: star contraction must equal
    union-find for any edge set, not just the fixture's. Hypothesis
    drives the edge lists; examples are capped (each runs a Spark
    job). Deadline disabled: JVM job latency is not the property
    under test."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from jcf_nb_migration_spark.queries.corpus_ops import _star_components

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40))
        .filter(lambda e: e[0] != e[1]),
        min_size=1, max_size=60))
    def run(edges):
        canon = [(min(u, v), max(u, v)) for u, v in edges]
        pairs = spark.createDataFrame(canon, "u bigint, v bigint")
        got = {r["u"]: r["component"]
               for r in _star_components(pairs).collect()}
        assert got == _union_find_components(canon)

    run()
