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
    # rotated OUT r9 (7x green); keyed-window twin:
    # latest_event_per_user
    driver_visible=False,
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


@query(
    "user_rolling_7d",
    oracle="""
    WITH daily AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day_idx,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4))
                   AS v
        FROM events GROUP BY user_id, day_idx
    )
    SELECT user_id, day_idx,
           CAST(v AS DOUBLE) AS daily_value,
           CAST(SUM(v) OVER w AS DOUBLE) AS rolling_7d_sum,
           COUNT(*) OVER w AS n_days_in_window
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day_idx
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, day_idx
    """,
    tags=("timeseries", "range-window", "rolling"),
    # rotated IN r10 4th wave: the per-user event-time window family's
    # driver witness (latest_event_per_user rotated out); RANGE frame
    # also pinned in pytest
    driver_visible=False,  # rotated OUT r12 6th wave (visible
    #   same-pattern twin recorded in coverage_map.py)
)
def user_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling sum per user via a RANGE-frame window — the frame
    is defined by the ORDER-BY VALUE (day_idx within 6), not by row
    count, so gaps in activity shrink the window honestly (a rows-
    frame would silently reach back weeks for sparse users —
    n_days_in_window exposes exactly that difference). Daily totals go
    through decimal, and the window SUM accumulates decimal, so the
    rolling values are bit-equal cross-engine. One shuffle on
    (user_id, day) for the pre-aggregation, then a user-partitioned
    window — parallel across users."""
    ev = t(spark, sf_dir, "events")
    day_idx = F.expr("unix_micros(ts) div 86400000000")
    daily = (ev.groupBy("user_id", day_idx.alias("day_idx"))
             .agg(F.sum(F.col("value").cast("decimal(18,4)"))
                  .cast("decimal(18,4)").alias("v")))
    w = (Window.partitionBy("user_id").orderBy("day_idx")
         .rangeBetween(-6, 0))
    return (daily.select(
        "user_id", "day_idx",
        F.col("v").cast("double").alias("daily_value"),
        F.sum("v").over(w).cast("double").alias("rolling_7d_sum"),
        F.count(F.lit(1)).over(w).alias("n_days_in_window"))
        .orderBy("user_id", "day_idx"))


@query(
    "event_funnel_conversion",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS tv FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS tc FROM events e
          JOIN v ON v.user_id = e.user_id AND e.ts > v.tv
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS tp FROM events e
          JOIN c ON c.user_id = e.user_id AND e.ts > c.tc
          WHERE e.event_type = 'purchase' GROUP BY e.user_id),
    s AS (SELECT (SELECT count(*) FROM v) AS nv,
                 (SELECT count(*) FROM c) AS nc,
                 (SELECT count(*) FROM p) AS np)
    SELECT stage, n_users, ROUND(1.0 * n_users / prev, 9) AS conv_from_prev
    FROM (
        SELECT '1_view' AS stage, nv AS n_users, nv AS prev FROM s
        UNION ALL
        SELECT '2_view_click', nc, nv FROM s
        UNION ALL
        SELECT '3_view_click_purchase', np, nc FROM s
    ) ORDER BY stage
    """,
    tags=("funnel", "sequential-pattern", "conversion"),
    # rotated INTO the driver window r9 (as-of family witness after
    # asof_click_before_error rotated out)
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: session_window_counts
    driver_visible=False,
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view -> later click -> later
    purchase): each stage keeps users whose first qualifying event
    strictly follows their previous stage's first event — the product-
    analytics sequential pattern. Physical shape: three user-keyed
    min-aggregations chained by equi-joins on user_id (hash-uniform;
    each stage's frame only shrinks), then three scalar counts stacked
    into the funnel report. No window over the full event stream."""
    ev = t(spark, sf_dir, "events")
    v = (ev.where(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("tv")))
    c = (ev.where(F.col("event_type") == "click").alias("e")
         .join(v, "user_id").where(F.col("e.ts") > F.col("tv"))
         .groupBy("user_id").agg(F.min("ts").alias("tc")))
    p = (ev.where(F.col("event_type") == "purchase").alias("e")
         .join(c, "user_id").where(F.col("e.ts") > F.col("tc"))
         .groupBy("user_id").agg(F.min("ts").alias("tp")))
    s = (v.agg(F.count(F.lit(1)).alias("nv"))
         .crossJoin(c.agg(F.count(F.lit(1)).alias("nc")))
         .crossJoin(p.agg(F.count(F.lit(1)).alias("np"))))
    stacked = s.select(F.expr(
        "stack(3, '1_view', nv, nv,"
        " '2_view_click', nc, nv,"
        " '3_view_click_purchase', np, nc)"
        " AS (stage, n_users, prev)"))
    return (stacked.select(
        "stage", "n_users",
        F.round(F.lit(1.0) * F.col("n_users") / F.col("prev"), 9)
        .alias("conv_from_prev"))
        .orderBy("stage"))


@query(
    "user_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               epoch_us(min(ts)) // 86400000000 // 7 AS cohort_week
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // 86400000000 // 7 AS week_idx
        FROM events
    ),
    cohort_sizes AS (
        SELECT cohort_week, count(*) AS cohort_size
        FROM firsts GROUP BY cohort_week
    ),
    ret AS (
        SELECT f.cohort_week, a.week_idx - f.cohort_week AS week_offset,
               count(*) AS n_users
        FROM active a JOIN firsts f ON f.user_id = a.user_id
        GROUP BY 1, 2
    )
    SELECT r.cohort_week, r.week_offset, r.n_users,
           ROUND(1.0 * r.n_users / cs.cohort_size, 9) AS retention_pct
    FROM ret r JOIN cohort_sizes cs ON cs.cohort_week = r.cohort_week
    ORDER BY r.cohort_week, r.week_offset
    """,
    tags=("cohort", "retention", "double-agg"),
    # rotated OUT r11 5th wave (multi-green in driver
    # artifacts); same-pattern visible twin: user_rolling_7d
    driver_visible=False,
)
def user_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucket into the absolute week of
    their first event, and each later active week counts them at
    offset = week - cohort_week; retention is the share of the cohort
    still active. The classic growth-analytics triangle. Physical
    shape (restructured r13 — was 2.53x at the 100x curve point on
    THREE wide exchanges: user-groupBy for first events, a
    (user, week) distinct, and a user-keyed join): ONE exchange on
    user_id computes min-week and the distinct active-week set in the
    same partial-aggregated pass (collect_set combines map-side, so
    the shuffle carries per-user deduped week sets, not events);
    exploding the set yields the bounded (cohort, offset) grid
    directly. Cohort sizes need no second aggregation: every user is
    active in their own cohort week, so the offset-0 count IS the
    cohort size — read back with a window over the tiny grid. The
    per-user set is bounded by the number of calendar weeks the
    product has existed, so collect_set is safe at any corpus size."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    week_idx = F.expr("unix_micros(ts) div 86400000000 div 7")
    per_user = (ev.select("user_id", week_idx.alias("week_idx"))
                .groupBy("user_id")
                .agg(F.min("week_idx").alias("cohort_week"),
                     F.collect_set("week_idx").alias("weeks")))
    ret = (per_user
           .select("cohort_week", F.explode("weeks").alias("week_idx"))
           .groupBy("cohort_week",
                    (F.col("week_idx") - F.col("cohort_week"))
                    .alias("week_offset"))
           .agg(F.count(F.lit(1)).alias("n_users")))
    cohort = Window.partitionBy("cohort_week")
    return (ret.withColumn(
                "cohort_size",
                F.max(F.when(F.col("week_offset") == 0,
                             F.col("n_users"))).over(cohort))
            .select("cohort_week", "week_offset", "n_users",
                    F.round(F.lit(1.0) * F.col("n_users")
                            / F.col("cohort_size"), 9)
                    .alias("retention_pct"))
            .orderBy("cohort_week", "week_offset"))


FUNNEL_PATTERN = "view.*click.*purchase"  # MATCH_RECOGNIZE-lite regex


@query(
    "event_sequence_pattern",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           string_agg(event_type, '>' ORDER BY ts) AS seq,
           regexp_matches(string_agg(event_type, '>' ORDER BY ts),
                          '{FUNNEL_PATTERN}') AS matched
    FROM events
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("timeseries", "pattern-match", "sequence"),
    # ordered per-key collect + codegen'd regex — the sessionization /
    # funnel family's physical shape (event_sessionization visible)
    driver_visible=False,
)
def event_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (MATCH_RECOGNIZE-lite): each
    user's event types are assembled into one ordered sequence string
    and matched against the funnel regex '{FUNNEL_PATTERN}' — the
    declarative way to ask "did a view eventually lead to a click and
    then a purchase, in that order, with anything in between". One
    shuffle on user_id; the per-user ordered assembly is a grouped
    collect (bounded by per-user event counts — at 100 TB you'd
    window it per session first, which event_sessionization provides);
    the regex runs codegen'd per user, not per event. (user_id, ts)
    is unique in the fixture, so the assembled order — and therefore
    the match — is deterministic in both engines."""
    ev = t(spark, sf_dir, "events")
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_type"))),
            lambda x: x.event_type),
        ">")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), seq.alias("seq"))
        .select("user_id", "n_events", "seq",
                F.col("seq").rlike(FUNNEL_PATTERN).alias("matched"))
        .orderBy("user_id")
    )


@query(
    "user_active_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
        SELECT user_id, day,
               day - CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INT)
                   AS grp
        FROM days
    ),
    streaks AS (
        SELECT user_id, grp, COUNT(*) AS len,
               MIN(day) AS streak_start
        FROM isl GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MIN(streak_start) AS VARCHAR) AS first_active_day
    FROM streaks GROUP BY user_id ORDER BY user_id
    """,
    tags=("timeseries", "gaps-and-islands", "streak"),
    # per-key window + double groupBy — latest_event_per_user /
    # sessionization physical family
)
def user_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, runs of CONSECUTIVE active days
    (longest streak, streak count, total active days) via the
    day − row_number() island key — the canonical SQL formulation,
    identical in both engines. Sessionization (event_sessionization)
    splits on time gaps within a day; this is its calendar-grain
    sibling. One shuffle on user_id (window + both groupBys share the
    key, so Catalyst reuses the partitioning); dates render as
    strings for cross-engine hash parity."""
    ev = t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id", "day",
        F.date_sub("day", F.row_number().over(w)).alias("grp"))
    streaks = (isl.groupBy("user_id", "grp")
               .agg(F.count(F.lit(1)).alias("len"),
                    F.min("day").alias("streak_start")))
    return (streaks.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_streaks"),
                 F.max("len").alias("longest_streak"),
                 F.sum("len").alias("n_active_days"),
                 F.min("streak_start").cast("string")
                  .alias("first_active_day"))
            .orderBy("user_id"))


@query(
    "daily_new_users",
    oracle="""
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT day, COUNT(*) AS new_users FROM firsts GROUP BY day
    ),
    alldays AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
    SELECT CAST(d.day AS VARCHAR) AS day,
           COALESCE(n.new_users, 0) AS new_users,
           CAST(SUM(COALESCE(n.new_users, 0))
                    OVER (ORDER BY d.day) AS BIGINT) AS cum_users
    FROM alldays d LEFT JOIN daily n ON n.day = d.day
    ORDER BY day
    """,
    tags=("timeseries", "cumulative-distinct", "growth"),
    # first-occurrence flag + running sum = the standard rewrite of
    # COUNT(DISTINCT) OVER (which Spark correctly refuses); window
    # twin latest_event_per_user
    driver_visible=False,
)
def daily_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-curve query.
    COUNT(DISTINCT) OVER a growing window is not directly executable
    (Spark rejects it; engines that accept it pay quadratic state);
    the scalable rewrite is first-occurrence attribution: each user
    counts once on their first active day, and the cumulative curve
    is a running SUM over the per-day new-user counts. Two
    key-partitioned shuffles (user_id, then day); the final running
    sum is an unpartitioned window over CALENDAR DAYS — bounded by
    the date range, not the data (the same bounded-window argument
    as user_hourly_resample's grid)."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    firsts = (ev.select("user_id", F.to_date("ts").alias("day"))
              .groupBy("user_id").agg(F.min("day").alias("day")))
    daily = firsts.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    alldays = ev.select(F.to_date("ts").alias("day")).distinct()
    # bounded-window: grid:day — cardinality is the calendar span of
    # the corpus, independent of row count (100× data in the same
    # period adds zero rows)
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return (alldays.join(daily, "day", "left")
            .select("day",
                    F.coalesce("new_users", F.lit(0)).alias("new_users"))
            .select(F.col("day").cast("string").alias("day"), "new_users",
                    F.sum("new_users").over(w).alias("cum_users"))
            .orderBy("day"))


@query(
    "event_type_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    ),
    row_tot AS (
        SELECT prev_type, CAST(SUM(cnt) AS BIGINT) AS row_n
        FROM trans GROUP BY prev_type
    )
    SELECT t.prev_type, t.next_type, t.cnt,
           ROUND(CAST(t.cnt AS DOUBLE) / r.row_n, 9) AS p_next
    FROM trans t JOIN row_tot r ON r.prev_type = t.prev_type
    ORDER BY t.prev_type, t.next_type
    """,
    tags=("timeseries", "markov", "transition"),
    # per-key lag window + double count rollup — the sessionization /
    # funnel family (event_sessionization driver-visible)
)
def event_type_transition_matrix(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: counts and row-normalized probabilities of event_type →
    next event_type — the behavioral model behind funnel diagnosis
    ('what actually follows an error?') and synthetic-session
    generation. One lag window per user (ts is unique per user in the
    fixture, so the order — and the matrix — is deterministic), one
    pair-count aggregate, one row-total join-back on the bounded
    event-type key. Probabilities are single integer-ratio divisions,
    exact cross-engine."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    seq = ev.select("user_id", "event_type",
                    F.lag("event_type").over(w).alias("prev_type"))
    trans = (seq.where(F.col("prev_type").isNotNull())
             .groupBy("prev_type",
                      F.col("event_type").alias("next_type"))
             .agg(F.count(F.lit(1)).alias("cnt")))
    row_tot = trans.groupBy("prev_type").agg(F.sum("cnt").alias("row_n"))
    return (trans.join(row_tot, "prev_type")
            .select("prev_type", "next_type", "cnt",
                    F.round(F.col("cnt").cast("double")
                            / F.col("row_n"), 9).alias("p_next"))
            .orderBy("prev_type", "next_type"))


@query(
    "signup_to_purchase_latency",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup'
                        THEN epoch_us(ts) END) AS su,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(ts) END) AS pu
        FROM events GROUP BY user_id
    ),
    lat AS (
        SELECT user_id, (pu - su) AS d_us FROM firsts
        WHERE su IS NOT NULL AND pu IS NOT NULL AND pu >= su
    ),
    ranked AS (
        SELECT d_us,
               ROW_NUMBER() OVER (ORDER BY d_us, user_id) AS rn,
               COUNT(*) OVER () AS n
        FROM lat
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN 2 * rn >= n + 1 AND 2 * (rn - 1) < n + 1
                         THEN d_us END) AS BIGINT) AS median_us,
           CAST(SUM(CAST(d_us AS DECIMAL(18,0))) AS DOUBLE)
               / MAX(n) / 1000000.0 AS mean_sec
    FROM ranked
    """,
    tags=("timeseries", "latency", "ordinal-median", "funnel"),
    # conditional-min per key + one bounded ranking window —
    # latest_event_per_user / price_quantiles family
    driver_visible=False,
)
def signup_to_purchase_latency(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Time-to-conversion: for every user with both events, the gap
    between FIRST signup and FIRST subsequent purchase — user count,
    ORDINAL median (the UPPER of the two central elements for even n:
    ``2*rn >= n+1`` picks rank 3 of 4 — exact, no interpolation, the
    cross-engine-safe median idiom), and decimal-exact mean seconds.

    The global rank is the scale hazard a single ``Window.orderBy``
    would create: every converting user funneled through ONE task, a
    bound that GROWS with the corpus. Ranked two-phase instead (the
    corpus_vocabulary pattern, corpus_ops.py): ``repartitionByRange``
    on (d_us, user_id) gives contiguous sampled-balanced buckets; each
    bucket ranks internally (window PARTITIONED by bucket) and adds
    the cumsum of earlier buckets' counts — the only ordered global
    window runs over ≤shuffle-partitions subtotal rows. The range
    frame is persisted so the offset branch and the rank branch see
    the SAME sampled bucket boundaries. The total count reaches every
    row as a broadcast 1-row aggregate (the important_supplier_share
    idiom), not a global lit-1-partitioned window; epoch math stays
    integer until the final display division."""
    ev = t(spark, sf_dir, "events")
    firsts = (ev.groupBy("user_id")
              .agg(F.min(F.when(F.col("event_type") == "signup",
                                F.unix_micros("ts"))).alias("su"),
                   F.min(F.when(F.col("event_type") == "purchase",
                                F.unix_micros("ts"))).alias("pu")))
    lat = (firsts.where(F.col("su").isNotNull()
                        & F.col("pu").isNotNull()
                        & (F.col("pu") >= F.col("su")))
           .select("user_id", (F.col("pu") - F.col("su")).alias("d_us")))
    nb = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (lat.repartitionByRange(nb, "d_us", "user_id")
              .withColumn("pid", F.spark_partition_id())
              .persist())
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    # bounded-window: buckets:spark.sql.shuffle.partitions — one
    # subtotal row per range bucket, constant in corpus size
    w_off = (Window.orderBy("pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    off = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("p_off"))
    w_in = Window.partitionBy("pid").orderBy("d_us", "user_id")
    tot = counts.agg(F.sum("cnt").cast("bigint").alias("n"))
    ranked = (ranged.withColumn("r_in", F.row_number().over(w_in))
              .join(off, "pid")
              .select("d_us", (F.col("p_off") + F.col("r_in")).alias("rn"))
              .crossJoin(F.broadcast(tot)))
    med = F.when((2 * F.col("rn") >= F.col("n") + 1)
                 & (2 * (F.col("rn") - 1) < F.col("n") + 1),
                 F.col("d_us"))
    return ranked.agg(
        F.max("n").alias("n_users"),
        F.sum(med).alias("median_us"),
        (F.sum(F.col("d_us").cast("decimal(18,0)")).cast("double")
         / F.max("n") / 1_000_000.0).alias("mean_sec"))


@query(
    "session_conversion_funnel",
    oracle="""
    WITH gaps AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    ),
    marked AS (
        SELECT *, CASE WHEN gap_us IS NULL
                            OR gap_us > 1800 * 1000000
                       THEN 1 ELSE 0 END AS is_new
        FROM gaps
    ),
    sess AS (
        SELECT user_id, event_id, event_type, tus,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY tus, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    ),
    s1 AS (
        SELECT user_id, session_id,
               MIN(CASE WHEN event_type = 'view' THEN tus END) AS v
        FROM sess GROUP BY 1, 2
    ),
    s2 AS (
        SELECT s.user_id, s.session_id, s1.v,
               MIN(CASE WHEN s.event_type = 'click'
                        AND s.tus >= s1.v THEN s.tus END) AS c
        FROM sess s JOIN s1 ON s1.user_id = s.user_id
                           AND s1.session_id = s.session_id
        GROUP BY 1, 2, s1.v
    ),
    s3 AS (
        SELECT s.user_id, s.session_id, s2.v, s2.c,
               MIN(CASE WHEN s.event_type = 'purchase'
                        AND s.tus >= s2.c THEN s.tus END) AS p
        FROM sess s JOIN s2 ON s2.user_id = s.user_id
                            AND s2.session_id = s.session_id
        GROUP BY 1, 2, s2.v, s2.c
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_viewed,
           CAST(SUM(CASE WHEN c IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clicked_after_view,
           CAST(SUM(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchased_after_click,
           CAST(SUM(CASE WHEN p IS NOT NULL AND v IS NOT NULL
                         THEN p - v END) AS BIGINT) AS total_v2p_us
    FROM s3
    """,
    tags=("timeseries", "sessionization", "funnel", "composed"),
    # sessionization (event_sessionization pattern) feeding the staged
    # conditional-min funnel (signup_to_purchase_latency family); both
    # component shapes driver-visible via event_sessionization /
    # latest_event_per_user
)
def session_conversion_funnel(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """WITHIN-SESSION ordered conversion — the product-analytics
    funnel scoped to 30-minute sessions instead of user lifetimes:
    per session, the first view, the first click AT OR AFTER that
    view, and the first purchase AT OR AFTER that click (each stage's
    anchor depends on the previous stage's result, so the funnel is
    staged conditional-min aggregations — one per stage — joined back
    on the session key; a single-pass agg cannot express the ordering
    dependency). Reports session counts per stage and the summed
    view→purchase latency in exact integer microseconds.

    Scale shape: sessionization is the per-user lag/cumsum window
    (partitioned, parallel across users); each funnel stage is one
    hash aggregate on (user, session) plus an equi-join back — three
    bounded passes over the sessionized frame, which is persisted so
    the stages share one window materialization."""
    # r14 (guide §2.4): both window passes (the lag gap and the
    # running session counter) order by the SAME key — tus, the
    # microsecond image of ts, is order-isomorphic to it (µs-precision
    # timestamps convert injectively), so the two Window operators
    # share ONE exchange AND one sort instead of sorting the events
    # twice (the lag window used to order by the raw ts).
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts")).alias("tus"))
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    gap = F.col("tus") - F.lag("tus").over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = (ev.withColumn("is_new", is_new)
            .withColumn("session_id", F.sum("is_new").over(wc))
            .drop("is_new")
            .persist())
    key = ["user_id", "session_id"]
    s1 = sess.groupBy(*key).agg(
        F.min(F.when(F.col("event_type") == "view", F.col("tus")))
        .alias("v"))
    s2 = (sess.join(s1, key)
          .groupBy(*key, "v")
          .agg(F.min(F.when((F.col("event_type") == "click")
                            & (F.col("tus") >= F.col("v")),
                            F.col("tus"))).alias("c")))
    s3 = (sess.join(s2, key)
          .groupBy(*key, "v", "c")
          .agg(F.min(F.when((F.col("event_type") == "purchase")
                            & (F.col("tus") >= F.col("c")),
                            F.col("tus"))).alias("p")))
    return s3.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("v").isNotNull(), 1).otherwise(0))
         .cast("bigint").alias("n_viewed"),
        F.sum(F.when(F.col("c").isNotNull(), 1).otherwise(0))
         .cast("bigint").alias("n_clicked_after_view"),
        F.sum(F.when(F.col("p").isNotNull(), 1).otherwise(0))
         .cast("bigint").alias("n_purchased_after_click"),
        F.sum(F.when(F.col("p").isNotNull() & F.col("v").isNotNull(),
                     F.col("p") - F.col("v"))).cast("bigint")
         .alias("total_v2p_us"))


PROMO_START_H, PROMO_END_H = 18, 20   # daily 18:00-20:00 UTC window


@query(
    "promo_session_attribution",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, event_id, epoch_us(ts) AS tus,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    ),
    marked AS (
        SELECT *, CASE WHEN gap_us IS NULL
                            OR gap_us > 1800 * 1000000
                       THEN 1 ELSE 0 END AS is_new
        FROM gaps
    ),
    sess AS (
        SELECT user_id,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY tus, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id,
               tus
        FROM marked
    ),
    iv AS (
        SELECT user_id, session_id,
               MIN(tus) AS s_start, MAX(tus) AS s_end
        FROM sess GROUP BY 1, 2
    ),
    span AS (
        SELECT MIN(s_start) // 86400000000 AS d0,
               MAX(s_end) // 86400000000 AS d1
        FROM iv
    ),
    promo AS (
        SELECT d AS promo_day,
               d * 86400000000 + {PROMO_START_H} * 3600000000 AS p_start,
               d * 86400000000 + {PROMO_END_H} * 3600000000 AS p_end
        FROM (SELECT unnest(range(d0, d1 + 1)) AS d FROM span)
    )
    SELECT p.promo_day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT i.user_id) AS BIGINT) AS n_users,
           CAST(SUM(LEAST(i.s_end, p.p_end)
                    - GREATEST(i.s_start, p.p_start))
                AS BIGINT) AS total_overlap_us
    FROM promo p JOIN iv i
      ON i.s_start < p.p_end AND p.p_start < i.s_end
    GROUP BY p.promo_day ORDER BY p.promo_day
    """,
    tags=("timeseries", "interval-join", "attribution", "composed"),
    driver_visible=True,  # rotated INTO the driver window r14 (8th wave, first-time name)
)
def promo_session_attribution(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Campaign attribution by INTERVAL OVERLAP — which user sessions
    ran concurrently with each daily {PROMO_START_H}:00–{PROMO_END_H}
    :00 promo window (strict overlap: s_start < p_end AND p_start <
    s_end, half-open on both sides), with the summed overlap in exact
    integer microseconds. Unlike range_join_error_click there is NO
    shared equi-key between the sides — the promo calendar is
    time-span-bounded (grid:day), so it BROADCASTS and the overlap
    join is a linear scan of the session table against a handful of
    literal intervals; per-promo rollups are a bounded groupBy. At a
    promo table too large to broadcast, the scale path is bucketing
    both sides by day and equi-joining on the bucket — the same
    blocked-interval algebra, one shuffle."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tus = F.unix_micros(F.col("ts"))
    gap = tus - F.lag(tus).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    wc = (Window.partitionBy("user_id").orderBy("tus", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0))
    iv = (ev.select("user_id", "event_id", tus.alias("tus"),
                    is_new.alias("is_new"))
          .withColumn("session_id", F.sum("is_new").over(wc))
          .groupBy("user_id", "session_id")
          .agg(F.min("tus").alias("s_start"), F.max("tus").alias("s_end")))
    span = iv.agg(
        F.expr("min(s_start) div 86400000000").alias("d0"),
        F.expr("max(s_end) div 86400000000").alias("d1"))
    promo = (span.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("promo_day"))
        .select("promo_day",
                (F.col("promo_day") * 86_400_000_000
                 + PROMO_START_H * 3_600_000_000).alias("p_start"),
                (F.col("promo_day") * 86_400_000_000
                 + PROMO_END_H * 3_600_000_000).alias("p_end")))
    joined = iv.join(
        F.broadcast(promo),
        (F.col("s_start") < F.col("p_end"))
        & (F.col("p_start") < F.col("s_end")))
    return (joined.groupBy("promo_day")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.sum(F.least("s_end", "p_end")
                       - F.greatest("s_start", "p_start"))
                  .alias("total_overlap_us"))
            .orderBy("promo_day"))


@query(
    "cohort_ltv_curve",
    oracle="""
    WITH p AS (
        SELECT user_id, epoch_us(ts) // 2592000000000 AS m,
               CAST(value AS DECIMAL(18,4)) AS v
        FROM events WHERE event_type = 'purchase'
    ),
    cohort AS (
        SELECT user_id, MIN(m) AS c FROM p GROUP BY user_id
    ),
    sz AS (SELECT c, COUNT(*) AS n_users FROM cohort GROUP BY c),
    rev AS (
        SELECT co.c, p.m - co.c AS age,
               SUM(p.v) AS rev_d
        FROM p JOIN cohort co ON co.user_id = p.user_id
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT c, age,
               SUM(rev_d) OVER (
                   PARTITION BY c ORDER BY age
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_rev
        FROM rev
    )
    SELECT cum.c AS cohort_month, cum.age,
           CAST(sz.n_users AS BIGINT) AS n_users,
           CAST(cum.cum_rev AS DOUBLE) AS cum_revenue,
           ROUND(CAST(cum.cum_rev AS DOUBLE) / sz.n_users, 9)
               AS ltv_per_user
    FROM cum JOIN sz ON sz.c = cum.c
    ORDER BY cohort_month, age
    """,
    tags=("timeseries", "cohort", "ltv", "product-analytics"),
    # cohort attribution + per-cohort bounded running sum — the
    # cohort-retention family (driver-visible twins:
    # latest_event_per_user's per-key window, pricing_summary's
    # decimal rollup)
    # rotated OUT of the driver window r14 (8th wave);
    # pattern witnessed by session_conversion_funnel (coverage_map.py)
    driver_visible=False,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — the revenue companion of
    retention: users cohorted by FIRST purchase month (30-day
    integer-microsecond buckets — calendar-month parsing differs
    cross-engine, epoch buckets don't), then cumulative revenue per
    cohort by month-age, per capita. Revenue sums stay DECIMAL to the
    final division. The running sum is a window PARTITIONED by cohort
    over month-age rows — a grid:month-sized partition (ages, not
    users), so the window input is the calendar span regardless of
    user count; cohort sizes join back as a broadcast
    dimension-sized frame."""
    ev = t(spark, sf_dir, "events")
    p = (ev.where(F.col("event_type") == "purchase")
         .select("user_id",
                 F.expr("unix_micros(ts) div 2592000000000").alias("m"),
                 F.col("value").cast("decimal(18,4)").alias("v")))
    cohort = p.groupBy("user_id").agg(F.min("m").alias("c"))
    sz = cohort.groupBy("c").agg(F.count(F.lit(1)).alias("n_users"))
    rev = (p.join(cohort, "user_id")
           .groupBy("c", (F.col("m") - F.col("c")).alias("age"))
           .agg(F.sum("v").alias("rev_d")))
    w = (Window.partitionBy("c").orderBy("age")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = rev.withColumn("cum_rev", F.sum("rev_d").over(w))
    return (cum.join(F.broadcast(sz), "c")
            .select(F.col("c").alias("cohort_month"), "age",
                    F.col("n_users").cast("bigint").alias("n_users"),
                    F.col("cum_rev").cast("double").alias("cum_revenue"),
                    F.round(F.col("cum_rev").cast("double")
                            / F.col("n_users"), 9).alias("ltv_per_user"))
            .orderBy("cohort_month", "age"))
