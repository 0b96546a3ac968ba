"""The derived sf0.3 / sf1 probe fixtures' replica semantics are
load-bearing for every three/four-point scaling claim in NOTES.md — pin
them on tiny in-memory frames so a probe edit can't silently break
the 'replicas are disjoint but structurally identical' contract."""

import math
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "tools")


def _replica(*args):
    from scaling_probe import _replica as r
    return r(*args)


def test_embedding_replica_signs_preserve_structure(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0], 7), (2, [4.0, 3.0, 2.0, 1.0], 7)],
        "vec_id bigint, embedding array<float>, label int")
    r1 = {r["vec_id"]: r for r in
          _replica(emb, "embeddings", 1, "uoiea").collect()}
    # keys and blocking label offset together
    assert set(r1) == {10_000_001, 10_000_002}
    assert all(r["label"] == 10_000_007 for r in r1.values())
    v = r1[10_000_001]["embedding"]
    # period-2 sign pattern, norm preserved
    assert v == [1.0, -2.0, 3.0, -4.0]
    assert math.isclose(sum(x * x for x in v), 1 + 4 + 9 + 16)
    # within-replica cosine == original cosine (cos(vs, us) = cos(v,u))
    u = r1[10_000_002]["embedding"]
    orig = (1 * 4 + 2 * 3 + 3 * 2 + 4 * 1)
    assert math.isclose(sum(a * b for a, b in zip(v, u)), orig)
    # replica 2: period-4 pattern
    r2 = {r["vec_id"]: r["embedding"] for r in
          _replica(emb, "embeddings", 2, "eioua").collect()}
    assert r2[20_000_001] == [1.0, 2.0, -3.0, -4.0]


def test_document_replica_permutes_text_preserving_shape(spark):
    docs = spark.createDataFrame(
        [(5, "alpha beta", "en", "s0", 10), (6, "xyz", "de", "s1", 3)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint")
    got = {r["doc_id"]: r for r in
           _replica(docs, "documents", 1, "uoiea").collect()}
    assert set(got) == {10_000_005, 10_000_006}
    t = got[10_000_005]["text"]
    # vowel permutation a->u e->o i->i o->e u->a: lengths + token
    # boundaries preserved, content changed
    assert t == "ulphu botu"
    assert len(t) == len("alpha beta")
    # vowel-free text is the documented byte-identical residual
    assert got[10_000_006]["text"] == "xyz"
    # non-key metadata passes through
    assert got[10_000_005]["lang"] == "en"


def test_perm_table_supports_ten_pairwise_distinct_replicas():
    # the ~sf1 fourth point takes 9 offset replicas: every perm must
    # be a true permutation of the vowels, none the identity, and all
    # pairwise distinct (so EVERY replica pair decorrelates, not just
    # each replica vs the original)
    from scaling_probe import _PERMS
    assert len(_PERMS) == 9
    assert all(sorted(p) == list("aeiou") for p in _PERMS)
    assert "aeiou" not in _PERMS
    assert len(set(_PERMS)) == 9


def test_high_replica_sign_pattern_distinct_and_norm_preserving(spark):
    # replica 9 (the last fourth-point replica): period-18 square
    # wave — still ±1 (norm-preserving) and distinct from replica 1's
    emb = spark.createDataFrame(
        [(1, [float(i) for i in range(1, 21)], 7)],
        "vec_id bigint, embedding array<float>, label int")
    v9 = _replica(emb, "embeddings", 9, "uieao").head()["embedding"]
    v1 = _replica(emb, "embeddings", 1, "uoiea").head()["embedding"]
    orig = [float(i) for i in range(1, 21)]
    assert [abs(x) for x in v9] == orig
    assert v9[:9] == orig[:9] and v9[9] == -orig[9]  # flips at j=9
    assert v9 != v1 and v9 != orig


def test_lineitem_replica_moves_referential_keys_together(spark):
    li = spark.createDataFrame(
        [(100, 7, 3, 1, 5.0)],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double")
    r = _replica(li, "lineitem", 2, "eioua").head()
    assert (r["l_orderkey"], r["l_partkey"], r["l_suppkey"]) == (
        20_000_100, 20_000_007, 20_000_003)
    assert r["l_linenumber"] == 1 and r["l_quantity"] == 5.0
