"""Driver-local literal frames as JVM LocalRelations.

``spark.createDataFrame(list_of_rows, schema)`` compiles to a
``LogicalRDD`` backed by a *Python* RDD: every action that touches it
(including each tiny control-plane parquet write of the index/docstore
layouts) launches a Python worker to re-pickle the rows — measured at
4-8 s of fixed cost per write on the bench host, for frames of a few
hundred rows. Routing the same rows through one Arrow record batch
yields a pure-JVM ``LocalRelation`` with identical schema and values:
no Python evaluation at action time, ~0.2 s for the same write
(optimization guide §4 — eliminate the JVM↔Python boundary).

``local_df`` is the drop-in replacement used by every hot-path literal
frame in the engine. It falls back to the classic path for anything
Arrow cannot represent (never expected for the engine's control-plane
schemas: ints/strings/doubles/booleans/arrays).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _struct(schema: StructType | str) -> StructType:
    if isinstance(schema, StructType):
        return schema
    from pyspark.sql.types import _parse_datatype_string
    return _parse_datatype_string(schema)


def local_df(spark: SparkSession, rows: Iterable[tuple],
             schema: StructType | str) -> DataFrame:
    """Small literal DataFrame as a JVM LocalRelation (see module doc).

    ``rows`` is a list of tuples positionally matching ``schema``
    (the same contract as ``spark.createDataFrame``). Values must be
    plain Python scalars/lists — exactly what the control-plane call
    sites pass."""
    rows = list(rows)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        st = _struct(schema)
        names = st.fieldNames()
        tbl = pa.Table.from_pylist(
            [dict(zip(names, r)) for r in rows],
            schema=to_arrow_schema(st))
        return spark.createDataFrame(tbl)
    except Exception:
        # fallback: the classic (Python-RDD) path — correct, just slow
        return spark.createDataFrame(rows, schema)
