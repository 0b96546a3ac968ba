"""Skew mitigation: salting for hot keys (the brief's named strategy
alongside AQE skew-join, which session.py enables globally).

Two tools:
- ``salted_aggregate``: two-phase aggregation — pre-aggregate on
  (key, salt) so a hot key's rows split across ``n_salts`` reducers,
  then combine partials. Works for any algebraic aggregate; exposed
  here for sum/count (enough to rebuild avg).
- ``salted_join``: replicate the small side n_salts times and salt the
  big side's key so one hot key fans across n_salts reducers. Only
  needed when the small side is too big to broadcast but the key is
  skewed; with AQE skew-join on, prefer letting AQE split first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, n_salts: int,
              salt_col: str = "__salt") -> DataFrame:
    """Deterministic salt derived from a stable row hash — not rand():
    reruns and retried tasks must salt identically or aggregates
    double-count on task retry."""
    cols = [F.col(c) for c in df.columns]
    return df.withColumn(salt_col, F.pmod(F.xxhash64(*cols), n_salts))


def salted_aggregate(df: DataFrame, key: str, value: str,
                     n_salts: int = 16) -> DataFrame:
    """SUM/COUNT of ``value`` per ``key`` in two shuffles, immune to a
    hot key: phase 1 groups on (key, salt) — at most n_salts partials
    per key — phase 2 combines partials. Sums run in decimal so the
    result is independent of how rows split across salts (and equals
    the unsalted aggregate exactly). Returns key, sum_<value>, n."""
    salted = with_salt(df, key, n_salts)
    partial = (salted.groupBy(key, "__salt")
               .agg(F.sum(F.col(value).cast("decimal(18,4)"))
                    .alias("__psum"),
                    F.count(F.lit(1)).alias("__pn")))
    return (partial.groupBy(key)
            .agg(F.sum("__psum").cast("double").alias(f"sum_{value}"),
                 F.sum("__pn").alias("n")))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16) -> DataFrame:
    """Equi-join where ``big``'s key is skewed and ``small`` can't
    broadcast: salt the big side, explode the small side across all
    salts, join on (key, salt). Each hot key's rows spread over
    n_salts reducers at the cost of replicating ``small`` n_salts×."""
    big_s = with_salt(big, key, n_salts)
    small_r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = big_s.join(small_r, [key, "__salt"])
    return out.drop("__salt")
