"""Every registered query with an oracle must hash-match DuckDB at
sf0.001 (the driver runs the same comparison at sf0.01)."""

import pytest

from jcf_nb_migration_spark.registry import all_queries
from jcf_nb_migration_spark.testing import compare_frames
from tests.conftest import SF_SMALL

QUERIES = sorted(all_queries().items())


@pytest.mark.parametrize("name", [n for n, _ in QUERIES])
def test_query_matches_oracle(spark, duck_small, name):
    q = all_queries()[name]
    sdf = q.fn(spark, SF_SMALL).toPandas()
    if q.oracle is None:
        # rows-only contract: must run and return a stable schema
        assert sdf is not None
        return
    ddf = duck_small.execute(q.oracle).fetchdf()
    r = compare_frames(name, sdf, ddf)
    assert r.ok, f"{name}: {r.detail[:1000]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
