"""Distributed model training as a DataFrame program: full-batch
gradient-descent logistic-style classifier with an exactly replayable
training loop.

The scale shape matters more than the model: every iteration is ONE
map-side-combinable aggregation over the (cached) feature frame — the
gradient — and the weight update is driver-side arithmetic on that
bounded vector, the same control-plane pattern as the k-means/IVF
centroids and the BPE merge loop. At 100 TB each iteration is a single
scan with a 5-number result; nothing corpus-sized ever reaches the
driver.

Cross-engine exactness (so DuckDB replays training bit-identically):

- the squashing function is RATIONAL — p = 0.5·(1 + h/(1+|h|)),
  h = z/2 (no exp/log; transcendentals differ by ulps across engines,
  +-*-/ and abs do not),
- per-row gradient contributions are quantized to integers with
  FLOOR(c · 1e9) before summation (the fixed-point trick the bigram-LM
  fluency score uses), so the shuffle-order-independent SUM is exact
  integer math and the weight update divides identical doubles,
- the learning rate enters the oracle as CAST({LR} AS DOUBLE): a bare
  0.1 literal is DECIMAL(1,1) in DuckDB and would multiply the
  gradient exactly where Python multiplies by the double 0.1 (found
  live: 0.5 masked this, being binary-exact in both paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jcf_nb_migration_spark.functions.text import tokens
from jcf_nb_migration_spark.localrel import local_df
from jcf_nb_migration_spark.registry import query, t

N_ITER = 4
LR = 0.1  # lr 0.5 diverges on these unstandardized features (verified:
#           SSE oscillates); 0.1 gives a monotone loss curve at all SFs

_SQL_TOKS_D = r"list_filter(string_split_regex(text, '\s+'), x -> x != '')"

# One training iteration as a DuckDB CTE pair: s{k} aggregates the
# quantized gradient + pre-update metrics under weights w{k-1}; w{k}
# applies the update. Expression text mirrors the Spark column tree
# token for token (left-associative, same literals).
_P_EXPR = ("0.5 * (1.0 + (({z}) * 0.5) / (1.0 + abs(({z}) * 0.5)))"
           .format(z="w0 + x1 * w1 + x2 * w2 + x3 * w3"))


def _sql_iter(k: int) -> str:
    return f"""
    s{k} AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(FLOOR((p - y) * 1e9) AS BIGINT))
                    AS BIGINT) AS q0,
               CAST(sum(CAST(FLOOR((p - y) * x1 * 1e9) AS BIGINT))
                    AS BIGINT) AS q1,
               CAST(sum(CAST(FLOOR((p - y) * x2 * 1e9) AS BIGINT))
                    AS BIGINT) AS q2,
               CAST(sum(CAST(FLOOR((p - y) * x3 * 1e9) AS BIGINT))
                    AS BIGINT) AS q3,
               CAST(sum(CAST(FLOOR((p - y) * (p - y) * 1e9) AS BIGINT))
                    AS BIGINT) AS sse9,
               CAST(sum(CASE WHEN (p >= 0.5) = (y = 1.0)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        FROM (SELECT y, x1, x2, x3, {_P_EXPR} AS p
              FROM feat CROSS JOIN w{k - 1})
    ),
    w{k} AS (
        SELECT w0 - CAST({LR} AS DOUBLE) * q0 / 1e9 / n AS w0,
               w1 - CAST({LR} AS DOUBLE) * q1 / 1e9 / n AS w1,
               w2 - CAST({LR} AS DOUBLE) * q2 / 1e9 / n AS w2,
               w3 - CAST({LR} AS DOUBLE) * q3 / 1e9 / n AS w3
        FROM s{k} CROSS JOIN w{k - 1}
    )"""


_SQL_ITERS = ",".join(_sql_iter(k) for k in range(1, N_ITER + 1))
_SQL_ROWS = " UNION ALL ".join(
    f"SELECT {k} AS iter, n_correct, sse9, w0, w1, w2, w3 "
    f"FROM s{k} CROSS JOIN w{k}" for k in range(1, N_ITER + 1))


@query(
    "logreg_gd_training",
    oracle=f"""
    WITH feat AS (
        SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               n_chars / 1000.0 AS x1,
               len(toks) / 100.0 AS x2,
               n_chars / (len(toks) + 1.0) AS x3
        FROM (SELECT lang, n_chars, {_SQL_TOKS_D} AS toks
              FROM documents)
    ),
    w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
    {_SQL_ITERS}
    SELECT * FROM ({_SQL_ROWS}) ORDER BY iter
    """,
    tags=("ml", "training", "iterative", "gradient-descent"),
    # green r5-r8; rotated OUT in the r9 second wave — the iterative
    # fixed-point-aggregate family stays visible via linkgraph_pagerank
    driver_visible=False,
)
def logreg_gd_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a linear classifier (is this document English?) on three
    document features with {N_ITER} full-batch gradient iterations, and
    return the per-iteration training curve: pre-update accuracy count
    and quantized squared error, plus the post-update weights.

    Each iteration runs one aggregation over the cached feature frame:
    SUM of per-row FLOOR(residual · feature · 1e9) — integer-exact and
    partial-aggregable, so the oracle replays every weight bit-for-bit
    through {N_ITER} unrolled CTEs (see module docstring for why no
    exp/log and why fixed-point). The 1e9 quantization bounds the
    int64 sum to |r|·|x|·1e9·N ≈ 5e14 per term at sf0.1 — far inside
    int64; a 100 TB corpus would drop to 1e6 units (same mechanism,
    looser grid) or sum in decimal."""
    rows = _cached_training(spark, sf_dir)[1]
    return local_df(
        spark, rows, "iter int, n_correct bigint, sse9 bigint, "
                     "w0 double, w1 double, w2 double, w3 double"
    ).orderBy("iter")


def _features(spark: SparkSession, sf_dir: str,
              extra_cols: tuple = ()) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        *extra_cols,
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        (F.col("n_chars") / 1000.0).alias("x1"),
        (F.size(tokens("text")) / 100.0).alias("x2"),
        (F.col("n_chars") / (F.size(tokens("text")) + 1.0)).alias("x3"),
    )


def _p_of(w) -> "F.Column":
    """The rational-squash probability column under weights w —
    expression tree mirrored token-for-token by the oracle."""
    z = (F.lit(w[0]) + F.col("x1") * F.lit(w[1])
         + F.col("x2") * F.lit(w[2]) + F.col("x3") * F.lit(w[3]))
    h = z * F.lit(0.5)
    return F.lit(0.5) * (F.lit(1.0) + h / (F.lit(1.0) + F.abs(h)))


# (weights, iteration rows) per sf_dir — the cached_kmeans idiom, so
# the serving query does not retrain.
_TRAIN_CACHE: dict = {}


def _cached_training(spark: SparkSession, sf_dir: str):
    if sf_dir in _TRAIN_CACHE:
        return _TRAIN_CACHE[sf_dir]
    feat = _features(spark, sf_dir).persist()
    try:
        w = [0.0, 0.0, 0.0, 0.0]
        rows = []
        for it in range(1, N_ITER + 1):
            p = _p_of(w)
            r = p - F.col("y")

            def q9(c):
                return F.sum(F.floor(c * F.lit(1.0e9)).cast("bigint"))

            agg = feat.agg(
                F.count(F.lit(1)).alias("n"),
                q9(r).alias("q0"),
                q9(r * F.col("x1")).alias("q1"),
                q9(r * F.col("x2")).alias("q2"),
                q9(r * F.col("x3")).alias("q3"),
                q9(r * r).alias("sse9"),
                F.sum(F.when((p >= 0.5) == (F.col("y") == 1.0), 1)
                      .otherwise(0)).cast("bigint").alias("n_correct"),
            ).collect()[0]
            n = agg["n"]
            w = [w[j] - LR * agg[f"q{j}"] / 1e9 / n for j in range(4)]
            rows.append((it, agg["n_correct"], agg["sse9"],
                         w[0], w[1], w[2], w[3]))
    finally:
        feat.unpersist()
    _TRAIN_CACHE[sf_dir] = (w, rows)
    return _TRAIN_CACHE[sf_dir]


@query(
    "logreg_calibration",
    oracle=f"""
    WITH feat AS (
        SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               n_chars / 1000.0 AS x1,
               len(toks) / 100.0 AS x2,
               n_chars / (len(toks) + 1.0) AS x3
        FROM (SELECT lang, n_chars, {{TOKS}} AS toks
              FROM documents)
    ),
    w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
    {{ITERS}},
    scored AS (
        SELECT y, {{P}} AS p
        FROM feat CROSS JOIN w{N_ITER}
    )
    SELECT CAST(FLOOR(p * 10) AS INT) AS bucket,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_positive
    FROM scored GROUP BY bucket ORDER BY bucket
    """.replace("{TOKS}", _SQL_TOKS_D)
       .replace("{ITERS}", _SQL_ITERS)
       .replace("{P}", _P_EXPR),
    tags=("ml", "serving", "calibration"),
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by bm25_batch_served (coverage_map.py)
    driver_visible=False,
)
def logreg_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-serve: score every document with the FINAL trained
    weights (memoized — the training loop runs once per sf_dir across
    both queries) and report the calibration histogram: per predicted-
    probability decile, how many documents and how many true
    positives. Serving is one codegen'd scan — the weights enter as
    literals, exactly how a broadcast model applies at 100 TB; the
    decile edge is FLOOR(p·10), integer-exact in both engines, and the
    oracle re-derives the same weights through the unrolled training
    CTEs before scoring."""
    w = _cached_training(spark, sf_dir)[0]
    feat = _features(spark, sf_dir)
    scored = feat.select("y", _p_of(w).alias("p"))
    return (scored
            .groupBy(F.floor(F.col("p") * 10).cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0))
                  .cast("bigint").alias("n_positive"))
            .orderBy("bucket"))
