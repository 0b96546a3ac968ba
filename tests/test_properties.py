"""Property-based checks (SURVEY.md §5 strategy #4) for the composite
operators' algebraic invariants, against pure-Python reference
implementations. Batched: hypothesis generates row sets, one Spark job
evaluates them all."""

from hypothesis import HealthCheck, given, settings, strategies as st

from jcf_nb_migration_spark.operators.merge import merge_expr
from jcf_nb_migration_spark.operators.tags import derive_tags

VALUES = st.one_of(st.none(), st.text(
    alphabet="ab ,", min_size=0, max_size=5))

SETTINGS = dict(max_examples=25, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def merge_reference(t, s):
    """The reference's four-branch rule (main.py:581-612) in plain
    Python, null policy included."""
    if t is None and s is None:
        return None
    tb = t or ""
    sb = s or ""
    if sb == tb or sb == "":
        return tb
    if tb == "":
        return sb
    return f"{tb}, {sb}"


@given(st.lists(st.tuples(VALUES, VALUES), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_merge_matches_reference(spark, pairs):
    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(pairs)],
        "i int, t string, s string")
    got = {r["i"]: r["t"] for r in
           df.withColumn("t", merge_expr("t", "s")).collect()}
    for i, (t, s) in enumerate(pairs):
        assert got[i] == merge_reference(t, s), (t, s)


def tags_reference(row, mapping):
    out = []
    for col, tag in mapping:
        v = row.get(col)
        if v is not None and v != "" and tag.strip() not in out:
            out.append(tag.strip())
    return ",".join(out)


@given(st.lists(st.tuples(VALUES, VALUES, VALUES), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_tags_match_reference(spark, rows):
    mapping = [("a", "T1"), ("b", " T2 "), ("c", "T1")]  # dup + trim
    df = spark.createDataFrame(
        [(i, a, b, c) for i, (a, b, c) in enumerate(rows)],
        "i int, a string, b string, c string")
    got = {r["i"]: r["tags"] for r in derive_tags(df, mapping).collect()}
    for i, (a, b, c) in enumerate(rows):
        want = tags_reference({"a": a, "b": b, "c": c}, mapping)
        assert got[i] == want, (a, b, c)


@given(st.lists(st.tuples(VALUES, VALUES), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_merge_algebraic_invariants(spark, pairs):
    """Idempotence on equal values; blank absorption both ways."""
    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(pairs)],
        "i int, t string, s string")
    # equal-merge is identity on the blank-normalized value
    eq = {r["i"]: r["m"] for r in df.select(
        "i", merge_expr("t", "t").alias("m")).collect()}
    for i, (t, _) in enumerate(pairs):
        want = None if t is None else (t or "")
        assert eq[i] == want


@given(st.lists(st.integers(min_value=0, max_value=(1 << 48) - 1),
                min_size=2, max_size=40, unique=True),
       st.integers(min_value=0, max_value=12))
@settings(**SETTINGS)
def test_simhash_banding_lossless(spark, fps, max_hamming):
    """Pigeonhole banding must find EXACTLY the pairs the all-pairs
    formulation finds (the bands partition all 48 bits, so ≤r differing
    bits leave ≥1 band identical — recall 1.0; the verify step keeps
    precision 1.0)."""
    from jcf_nb_migration_spark.functions.dedup import simhash_near_pairs

    df = spark.createDataFrame(
        [(i, f) for i, f in enumerate(fps)], "id int, simhash long")
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in simhash_near_pairs(df, "id", max_hamming).collect()}
    want = set()
    for i, a in enumerate(fps):
        for j in range(i + 1, len(fps)):
            h = bin(a ^ fps[j]).count("1")
            if h <= max_hamming:
                want.add((i, j, h))
    assert got == want
