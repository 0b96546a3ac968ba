"""Grouped Pandas-UDF surface: per-group model fitting via
applyInPandas (the pattern for group-local algorithms that aren't
SQL-expressible — sklearn-style fits, per-entity calibration).

The demo fits OLS (price ~ quantity) per returnflag group. To stay
oracle-checkable, the UDF accumulates moments as EXACT integers
(values are 4-dp fixed-point → scaled int64/bigint Python ints), then
applies the same closed-form float expression the DuckDB oracle uses
over decimal moment sums — the quantity_price_correlation playbook,
extended into Python. Final doubles rounded to 9 dp (1-ulp cross-
engine conversion noise, NOTES.md).

Registered driver_visible=False: the driver contract is capped at 50
queries; this is covered by the local oracle test instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from jcf_nb_migration_spark.registry import query, t

_SQL_MOMENTS = """
        SELECT l_returnflag, COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(19,4))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(19,4))
                   * CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
               SUM(CAST(l_quantity AS DECIMAL(19,4))
                   * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy
        FROM lineitem GROUP BY l_returnflag
"""

_SQL_SLOPE = ("(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)"
              " * CAST(sy AS DOUBLE))"
              " / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)"
              " * CAST(sx AS DOUBLE))")


@query(
    "grouped_price_model",
    oracle=f"""
    SELECT l_returnflag, n,
           round({_SQL_SLOPE}, 9) AS slope,
           round((CAST(sy AS DOUBLE) - {_SQL_SLOPE}
                  * CAST(sx AS DOUBLE)) / n, 9) AS intercept
    FROM ({_SQL_MOMENTS})
    ORDER BY l_returnflag
    """,
    tags=("pandas-udf", "applyInPandas", "model-fit"),
    driver_visible=False,
)
def grouped_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS fit via applyInPandas (Arrow-batched; one task per
    group). Group count here is tiny (3 returnflags) so each task sees
    a large frame — the shape applyInPandas is built for when the
    per-group computation needs real Python. For SQL-expressible fits
    at 100 TB prefer the moment-sum aggregation
    (quantity_price_correlation): it's one shuffle and no Python."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice")

    def fit(pdf):
        import pandas as pd

        # exact integer moments: 4-dp fixed-point -> scaled ints;
        # products as Python ints (sxy exceeds int64 at sf>=0.1)
        x = (pdf["l_quantity"] * 10000).round().astype("int64")
        y = (pdf["l_extendedprice"] * 10000).round().astype("int64")
        n = len(pdf)
        sx = int(x.sum())
        sy = int(y.sum())
        sxx = int((x.astype(object) * x.astype(object)).sum())
        sxy = int((x.astype(object) * y.astype(object)).sum())
        fsx, fsy = sx / 1e4, sy / 1e4
        fsxx, fsxy = sxx / 1e8, sxy / 1e8
        slope = (n * fsxy - fsx * fsy) / (n * fsxx - fsx * fsx)
        intercept = (fsy - slope * fsx) / n
        return pd.DataFrame({
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "n": [n],
            "slope": [round(slope, 9)],
            "intercept": [round(intercept, 9)],
        })

    return (li.groupBy("l_returnflag")
            .applyInPandas(fit, "l_returnflag string, n bigint, "
                                "slope double, intercept double")
            .orderBy("l_returnflag"))
