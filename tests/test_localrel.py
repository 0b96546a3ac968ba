"""local_df (jcf_nb_migration_spark/localrel.py): control-plane literal
frames must be JVM LocalRelations, not Python-RDD-backed LogicalRDDs —
the r13 optimization that removed a measured 4-8 s Python-worker
round-trip from every tiny index/docstore sidecar write (guide §4)."""

import pytest

from jcf_nb_migration_spark.localrel import local_df

CASES = [
    ([(1,), (2,), (3,)], "doc_id bigint"),
    ([("vacuum", 123, 456)], "batch_id string, n_docs bigint, sum_dl bigint"),
    ([(None, None, None, None)],
     "snapshot int, note string, n_files int, has_centroids boolean"),
    ([(1, [0.5, -1.25]), (2, [3.0, 4.0])],
     "cluster bigint, prvec array<double>"),
    ([], "neighbor_id long, cos_sim double"),
    ([(5, 0.123456789), (6, None)], "doc_id bigint, bm25 double"),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_local_df_is_local_relation(spark, rows, schema):
    df = local_df(spark, rows, schema)
    kind = df._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()
    assert kind == "LocalRelation", f"expected LocalRelation, got {kind}"
    # and no Python evaluation anywhere in the physical plan
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys


@pytest.mark.parametrize("rows,schema", CASES)
def test_local_df_matches_classic_path(spark, rows, schema):
    df = local_df(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema)
    assert df.schema == ref.schema
    assert sorted(map(tuple, df.collect())) == \
        sorted(map(tuple, ref.collect()))
