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
from pyspark.sql import functions as F

from jcf_nb_migration_spark.registry import dec, query, t

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


_PRICE_MODEL_ORACLE = f"""
    SELECT l_returnflag, n,
           round({_SQL_SLOPE}, 9) AS slope,
           round((CAST(sy AS DOUBLE) - {_SQL_SLOPE}
                  * CAST(sx AS DOUBLE)) / n, 9) AS intercept
    FROM ({_SQL_MOMENTS})
    ORDER BY l_returnflag
    """


@query(
    "grouped_price_model",
    oracle=_PRICE_MODEL_ORACLE,
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


@query(
    "grouped_price_model_jvm",
    oracle=_PRICE_MODEL_ORACLE,  # IDENTICAL oracle to
    #   grouped_price_model — the machine-checked scale-twin contract
    #   (coverage_map.SCALE_TWINS + tests/test_coverage_map.py).
    tags=("model-fit", "moments", "scale-twin"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
    #   via pricing_summary (one-pass grouped decimal aggregation
    #   over the same lineitem scan)
)
def grouped_price_model_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM closed-form per-group OLS — grouped_price_model's
    SCALE PATH. The applyInPandas variant ships every group's rows
    through Arrow into one Python task per group (3 fixture groups →
    parallelism 3, measured 4.07x at the 100x curve point); this twin
    is ONE map-side-combinable decimal moment aggregation (n, Σx, Σy,
    Σx², Σxy) inside whole-stage codegen — parallelism follows input
    splits, the shuffle carries 5 numbers per group, and the
    closed-form slope/intercept arithmetic replays the shared oracle's
    double conversion exactly. DECIMAL(18,4) operands keep the
    products at (37,8) and their sums exact in (38,8) — numerically
    equal to the oracle's (19,4)-operand DuckDB formulation, so the
    final IEEE ops are bit-identical."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice")
    x = F.col("l_quantity").cast("decimal(18,4)")
    y = F.col("l_extendedprice").cast("decimal(18,4)")
    m = (li.groupBy("l_returnflag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(x).alias("sx"), F.sum(y).alias("sy"),
              F.sum(x * x).alias("sxx"), F.sum(x * y).alias("sxy")))
    nd = F.col("n").cast("double")
    dsx, dsy = F.col("sx").cast("double"), F.col("sy").cast("double")
    dsxx, dsxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = (nd * dsxy - dsx * dsy) / (nd * dsxx - dsx * dsx)
    return (m.select("l_returnflag", "n",
                     F.round(slope, 9).alias("slope"),
                     F.round((dsy - slope * dsx) / nd, 9)
                     .alias("intercept"))
            .orderBy("l_returnflag"))


@query(
    "cogroup_asof_pandas",
    # Identical semantics (and oracle) to asof_click_before_error: for
    # each error, the latest same-user click at-or-before it, ties on
    # ts resolved to the highest click event_id.
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_id, 1 AS side,
               CAST(NULL AS BIGINT) AS p_event_id
        FROM events WHERE event_type = 'error'
        UNION ALL
        SELECT user_id, ts, event_id, 0 AS side, event_id AS p_event_id
        FROM events WHERE event_type = 'click'
    ), carried AS (
        SELECT user_id, ts, event_id, side,
               LAST_VALUE(p_event_id IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS asof_event_id
        FROM u
    )
    SELECT event_id AS error_id, asof_event_id AS click_id
    FROM carried WHERE side = 1
    """,
    tags=("pandas-udf", "cogroup", "asof-join"),
    # rotated INTO the driver window r9 (cogroup pandas surface)
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: orders_pit_customer_join
    driver_visible=False,
)
def cogroup_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via cogrouped applyInPandas — the API surface for
    group-local two-sided algorithms (pd.merge_asof here; the same
    shape carries calibration-vs-reference, trade-vs-quote matching).
    Both sides shuffle once on user_id and arrive as per-key pandas
    frames; Arrow batches both directions, no driver involvement.

    The relational union+window formulation (asof_click_before_error)
    is the preferred 100 TB path — a giant user's events all land in
    one pandas frame here, so this variant is for group-local logic
    that genuinely needs imperative code. Sharing the oracle with the
    relational variant proves the two implementations agree row-for-row
    (merge_asof backward + allow-exact ≡ last_value window with clicks
    ordered before errors at equal ts)."""
    import pandas as pd

    from pyspark.sql import functions as F

    ev = t(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id")

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:  # click-only user: no error rows to emit
            return pd.DataFrame({"error_id": pd.Series(dtype="Int64"),
                                 "click_id": pd.Series(dtype="Int64")})
        nulls = pd.Series([pd.NA] * len(left), dtype="Int64")
        if "ts" not in left.columns:
            # Catalyst pruned the data columns (observed on Spark 4.1
            # when the query result feeds ONLY a count/aggregate that
            # reads no output column: the cogroup child is pruned to
            # its grouping key). Row count is all the consumer can
            # observe, and it is one output row per error — emit that.
            return pd.DataFrame({"error_id": nulls, "click_id": nulls})
        left = left.sort_values(["ts", "event_id"])
        if right.empty or "ts" not in right.columns:
            # error-only user: an EMPTY cogroup side arrives without
            # columns (sort/merge would KeyError) — emit every error
            # with a NULL click_id, exactly the oracle's
            # LAST_VALUE(... IGNORE NULLS) with no prior click.
            # Latent until the r13 fixture regeneration introduced
            # error-only users. The column-presence check doubles as
            # the pruned-right-side guard (same Spark 4.1 behavior as
            # above, seen under count-only consumption, where click_id
            # values are unobservable by construction).
            return pd.DataFrame({
                "error_id": left["event_id"].astype("Int64"),
                "click_id": nulls,
            })
        right = right.sort_values(["ts", "event_id"])
        m = pd.merge_asof(left, right, on="ts",
                          suffixes=("_err", "_clk"),
                          direction="backward", allow_exact_matches=True)
        return pd.DataFrame({
            "error_id": m["event_id_err"].astype("Int64"),
            "click_id": m["event_id_clk"].astype("Int64"),
        })

    return (
        errors.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(merge, "error_id bigint, click_id bigint")
    )


@query(
    "arrow_doc_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'),
                                x -> x != '')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
    tags=("arrow", "mapInArrow", "vectorized"),
    # rotated IN r10 4th wave: the Arrow-batched Python map surface's
    # driver witness (multimodal_frame_sample rotated out)
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def arrow_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token/char/byte counts computed in mapInArrow — the
    zero-pandas columnar Python surface: batches arrive as Arrow
    RecordBatches and every operation below is a pyarrow.compute
    kernel (vectorized C++, no per-row Python, no pandas conversion
    cost). The right tier when a transform needs a library that speaks
    Arrow (tokenizers, model runtimes) but not pandas. Counts are
    integers, so the DuckDB comparison is exact; token = maximal
    non-whitespace run in both engines."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"),
                 pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()),
                 pc.cast(pc.utf8_length(text), pa.int64()),
                 pc.cast(pc.binary_length(text), pa.int64())],
                names=["doc_id", "n_tokens", "n_chars", "n_bytes"])

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        stats, "doc_id bigint, n_tokens bigint, n_chars bigint, n_bytes bigint")


CHUNK = 100  # chars per chunk for the UDTF demo

# Python UDTF (Spark 4, Arrow-optimized): one input row -> N output
# rows from an imperative generator. This is the lane for row fan-out
# logic that genuinely needs Python (a real tokenizer, a parser); for
# plain fixed-width chunking the declarative twin (doc_chunk_overlap's
# sequence+substring) is the 100 TB path — this query exists to cover
# and oracle-gate the UDTF execution surface itself.
try:
    from pyspark.sql.functions import udtf

    @udtf(returnType=("chunk_idx int, start_pos int, end_pos int, "
                      "chunk string"),
          useArrow=True)
    class _ChunkSpans:
        def eval(self, text, size: int):
            if text is None:
                return
            n = len(text)
            i = 0
            idx = 0
            while i < n:
                j = min(i + size, n)
                yield idx, i, j, text[i:j]
                idx += 1
                i = j
except ImportError:  # pragma: no cover - Spark < 3.5
    _ChunkSpans = None


@query(
    "doc_chunk_spans_udtf",
    oracle=f"""
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(i * {CHUNK} AS INT) AS start_pos,
           CAST(LEAST(i * {CHUNK} + {CHUNK}, n) AS INT) AS end_pos,
           md5(substr(text, CAST(i * {CHUNK} + 1 AS INT), {CHUNK}))
               AS chunk_md5
    FROM (SELECT doc_id, text, length(text) AS n FROM documents),
         LATERAL (SELECT unnest(range(0,
                      CAST(CEIL(n / {CHUNK}.0) AS BIGINT))) AS i)
    ORDER BY doc_id, chunk_idx
    """,
    tags=("udtf", "python-surface", "chunking"),
)
def doc_chunk_spans_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width document chunk spans produced by a Python UDTF in a
    LATERAL join — the row-generator execution surface (eval yields N
    rows per doc; Arrow-batched transfer). The chunk digest is computed
    JVM-side (md5 over utf-8 bytes) so only spans and text cross the
    boundary; empty/null docs yield no rows in both engines. The
    DuckDB oracle regenerates identical spans declaratively
    (generate-series + substr), hash-gating the UDTF plumbing end to
    end."""
    if _ChunkSpans is None:  # pragma: no cover
        raise NotImplementedError("Python UDTF requires Spark >= 3.5")
    spark.udtf.register("jcf_chunk_spans", _ChunkSpans)
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.start_pos, c.end_pos,
               md5(encode(c.chunk, 'utf-8')) AS chunk_md5
        FROM {{d}} d, LATERAL jcf_chunk_spans(d.text, {CHUNK}) c
        """,
        d=docs,
    ).orderBy("doc_id", "chunk_idx")


_WMEDIAN_ORACLE = """
    WITH w AS (
        SELECT l_returnflag, l_extendedprice AS p,
               SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
                   PARTITION BY l_returnflag) AS tw
        FROM lineitem
    )
    SELECT l_returnflag, MIN(p) AS wmedian
    FROM w WHERE cw * 2 >= tw
    GROUP BY l_returnflag ORDER BY l_returnflag
    """


@query(
    "weighted_median_gagg",
    oracle=_WMEDIAN_ORACLE,
    tags=("pandas-udf", "grouped-agg", "robust-stats"),
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def weighted_median_gagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag via a
    GROUPED_AGG pandas UDF — the aggregate-UDF API surface (a scalar
    per group inside ``groupBy().agg()``, complementing applyInPandas
    which returns frames). The weighted median is ORDINAL: sort by
    (price, orderkey, linenumber), accumulate integer-scaled weights
    (quantity·10⁴ — exact, no float cumsum), return the first price
    whose doubled cumulative weight reaches the total. Pure integer
    threshold logic on a deterministic order → bit-exact vs the
    oracle's decimal running-sum formulation. Arrow ships each group
    as columnar batches; at scale this is a hash-partitioned
    aggregate whose per-group work is O(n log n) local sort — no
    different from the window formulation, but expressed through the
    UDAF surface users extend."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: the module's `from __future__ import
    # annotations` stringifies type hints, which defeats signature
    # inference for aggregate pandas UDFs
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wmedian(p, q, ok, ln):
        import numpy as np

        df = pd.DataFrame({"p": p.values, "q": q.values,
                           "ok": ok.values, "ln": ln.values})
        df = df.sort_values(["p", "ok", "ln"], kind="mergesort")
        w = np.round(df["q"].values * 10000).astype("int64").cumsum()
        pos = int(np.argmax(2 * w >= w[-1]))
        return float(df["p"].values[pos])

    li = t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(wmedian(F.col("l_extendedprice"), F.col("l_quantity"),
                         F.col("l_orderkey"), F.col("l_linenumber"))
                 .alias("wmedian"))
            .orderBy("l_returnflag"))


@query(
    "weighted_median_jvm",
    oracle=_WMEDIAN_ORACLE,  # IDENTICAL oracle to weighted_median_gagg
    #   — the machine-checked scale-twin contract (coverage_map
    #   .SCALE_TWINS + tests/test_coverage_map.py): same inputs, same
    #   output, different execution surface.
    tags=("robust-stats", "two-phase-rank", "scale-twin"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
    #   weighted_median_gagg; pattern visible via
    #   winsorized_order_values (shared two-phase-rank/robust-stats
    #   tags)
)
def weighted_median_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM two-phase weighted median — weighted_median_gagg's
    SCALE PATH (VERDICT r12 item 7). The grouped-agg pandas UDF ships
    every group's rows through Arrow and sorts them in Python; this
    twin stays inside whole-stage codegen and shrinks the data BEFORE
    the ordered step:

    phase 1 — ``groupBy(flag, price) -> sum(weight)``: map-side
    combinable partial aggregation; the shuffle carries one row per
    DISTINCT (flag, price), not one per lineitem. The weighted median
    depends only on the price -> total-weight map, so the collapse is
    lossless: the oracle's row-level decimal running sum crosses the
    half-total threshold at exactly the same price as the collapsed
    cumulative sum (ties share a price, so the crossing row's price
    equals the first collapsed price whose doubled cum reaches the
    total).

    phase 2 — one window exchange over the collapsed rows (cumulative
    + total weight per flag), threshold filter, MIN(price) per flag.
    At 100 TB the heavy input never sorts: the only ordered operation
    runs over |distinct prices per flag| rows. Exact decimal weights
    end-to-end — bit-identical to both the UDF twin and the shared
    oracle."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    collapsed = (li.groupBy("l_returnflag", "l_extendedprice")
                 .agg(F.sum(dec("l_quantity")).alias("w")))
    cum_w = (Window.partitionBy("l_returnflag")
             .orderBy("l_extendedprice")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    all_w = Window.partitionBy("l_returnflag")
    ranked = collapsed.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("p"),
        F.sum("w").over(cum_w).alias("cw"),
        F.sum("w").over(all_w).alias("tw"))
    return (ranked.where(F.col("cw") * 2 >= F.col("tw"))
            .groupBy("l_returnflag")
            .agg(F.min("p").alias("wmedian"))
            .orderBy("l_returnflag"))


@query(
    "scalar_iter_doc_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'),
                                x -> x != '')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text)
                - length(regexp_replace(text, '[0-9]', '', 'g'))
                AS BIGINT) AS n_digits
    FROM documents ORDER BY doc_id
    """,
    tags=("pandas-udf", "scalar-iter", "arrow", "vectorized"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def scalar_iter_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stats through a SCALAR_ITER pandas UDF — the
    evaluation mode for UDFs with EXPENSIVE one-time setup (model
    weights, compiled automata, tokenizer vocabularies): the function
    receives an iterator of Arrow batches, runs its setup ONCE per
    task, then streams batches through it — versus plain SCALAR, which
    gives setup no amortization point. Here the "model" is a compiled
    regex pair; counts are integers, so the DuckDB oracle matches
    bit-for-bit. The honest scale note cuts the other way: for work
    THIS cheap the built-in column functions (doc_token_stats) win —
    this query pins the surface for the cases that genuinely need
    Python (real tokenizers, ONNX scorers), where setup amortization
    is the difference between usable and not."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: `from __future__ import annotations`
    # stringifies the Iterator hints, defeating signature inference
    # (same workaround as weighted_median_grouped_agg above)
    @pandas_udf("n_tokens long, n_chars long, n_digits long",
                PandasUDFType.SCALAR_ITER)
    def stats(it):
        import re

        tok = re.compile(r"\S+")       # one-time setup, amortized
        dig = re.compile(r"[0-9]")     # across every batch this task
        for s in it:
            yield pd.DataFrame({
                "n_tokens": s.str.findall(tok).str.len().astype("int64"),
                "n_chars": s.str.len().astype("int64"),
                "n_digits": s.str.count(dig).astype("int64"),
            })

    docs = t(spark, sf_dir, "documents")
    return (docs.select("doc_id", stats(F.col("text")).alias("s"))
            .select("doc_id", "s.n_tokens", "s.n_chars", "s.n_digits")
            .orderBy("doc_id"))
