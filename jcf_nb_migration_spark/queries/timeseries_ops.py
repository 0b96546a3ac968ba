"""Time-series operators: regular-grid resampling with forward fill,
histogram binning, and order-independent correlation from decimal
moment sums."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jcf_nb_migration_spark.registry import query, t


@query(
    "user_hourly_resample",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               epoch_us(min(ts)) // 3600000000 AS h_min,
               epoch_us(max(ts)) // 3600000000 AS h_max
        FROM events GROUP BY user_id
    ), grid AS (
        SELECT user_id, unnest(range(h_min, h_max + 1)) AS hour_idx
        FROM bounds
    ), hourly AS (
        SELECT user_id, epoch_us(ts) // 3600000000 AS hour_idx,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT g.user_id,
           strftime(make_timestamp(g.hour_idx * 3600000000),
                    '%Y-%m-%d %H:%M:%S') AS hour_ts,
           LAST_VALUE(h.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hour_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_ffill,
           CASE WHEN h.v IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM grid g LEFT JOIN hourly h
      ON h.user_id = g.user_id AND h.hour_idx = g.hour_idx
    """,
    tags=("timeseries", "resample", "gap-fill"),
)
def user_hourly_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling: per user, a dense hourly grid spanning
    their activity, hourly sums forward-filled across gaps. Grid
    generation is sequence+explode (no driver loop); the fill is one
    last_value window — the standard sensor/metrics densification."""
    ev = t(spark, sf_dir, "events")
    hour_idx = F.expr("unix_micros(ts) div 3600000000")
    bounds = (ev.groupBy("user_id")
              .agg(F.min(hour_idx).alias("h_min"),
                   F.max(hour_idx).alias("h_max")))
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence(F.col("h_min"), F.col("h_max")))
         .alias("hour_idx"))
    hourly = (ev.groupBy("user_id", hour_idx.alias("hour_idx"))
              .agg(F.sum(F.col("value").cast("decimal(18,4)"))
                   .cast("double").alias("v")))
    w = (Window.partitionBy("user_id").orderBy("hour_idx")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        grid.join(hourly, ["user_id", "hour_idx"], "left")
        .select(
            "user_id",
            F.date_format(F.timestamp_micros(
                F.col("hour_idx") * 3_600_000_000), "yyyy-MM-dd HH:mm:ss")
             .alias("hour_ts"),
            F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
            F.when(F.col("v").isNull(), 1).otherwise(0).alias("is_gap"),
        )
    )


@query(
    "price_histogram",
    oracle="""
    SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    tags=("histogram", "binning"),
    driver_visible=False,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram by integer binning — the one-pass
    map-side-combinable way to get a distribution at any scale."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.floor(F.col("l_extendedprice") / 10000)
                   .cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.min("l_extendedprice").alias("lo"),
             F.max("l_extendedprice").alias("hi"))
        .orderBy("bucket")
    )


_SQL_MOMENTS = """
        SELECT l_returnflag AS flag, COUNT(*) AS n,
               SUM(CAST(l_quantity AS DECIMAL(19,4))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(19,4))
                   * CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
               SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                   * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy,
               SUM(CAST(l_quantity AS DECIMAL(19,4))
                   * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy
        FROM lineitem GROUP BY l_returnflag
"""


@query(
    "quantity_price_correlation",
    oracle=f"""
    SELECT flag,
           round(
               (n * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(n * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(n * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
               9) AS corr_qty_price
    FROM ({_SQL_MOMENTS})
    ORDER BY flag
    """,
    tags=("statistics", "correlation"),
    driver_visible=False,
)
def quantity_price_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation computed from decimal moment sums — unlike
    the built-in corr() (a floating accumulator whose result depends on
    partial-aggregation order), the moments are exact, so the final
    few FP ops are deterministic; the result is rounded to 9 decimals
    because decimal(38,8)-to-double conversion differs by one ulp
    between engines on 20-digit values."""
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(19,4)")
    y = F.col("l_extendedprice").cast("decimal(19,4)")
    m = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"), F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n = F.col("n")
    corr = (
        (n * F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (F.sqrt(n * F.col("sxx").cast("double")
                  - F.col("sx").cast("double") * F.col("sx").cast("double"))
           * F.sqrt(n * F.col("syy").cast("double")
                    - F.col("sy").cast("double") * F.col("sy").cast("double")))
    )
    return m.select("flag",
                    F.round(corr, 9).alias("corr_qty_price")).orderBy("flag")
