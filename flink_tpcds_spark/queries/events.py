"""Event-time window analytics over the ``events`` table (batch form).

Covers the reference's group-window operators (SURVEY §2.5 —
BatchExecHashWindowAggregate, WindowOperator with tumbling/sliding/
session assigners) using Spark's ``window()`` / ``session_window()``
scalar expansion + normal aggregation. The streaming forms of the
same pipelines live in ``streaming/windows.py``; these batch queries
give them a DuckDB-checkable oracle.

Alignment notes: Spark's ``window()`` buckets are epoch-aligned;
DuckDB's ``time_bucket`` origin (2000-01-01) is a multiple of every
bucket width used here, so the two agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.deterministic import dsum, dsum_sql
from ..schemas import load_table

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Tumbling window (reference TumblingWindowAssigner)
# ---------------------------------------------------------------------------
@_q(
    "ev_tumbling_window",
    f"""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS cnt,
           {dsum_sql('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def ev_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLE(ts, 15 min) per event_type."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(e.value).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value"
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Sliding / hopping window (reference SlidingWindowAssigner, paned variant)
# ---------------------------------------------------------------------------
@_q(
    "ev_sliding_window",
    f"""
    SELECT ws AS window_start, event_type, COUNT(*) AS cnt,
           {dsum_sql('value')} AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL '10 minutes', ts)
               - k.k * INTERVAL '10 minutes' AS ws,
             event_type, value
      FROM events CROSS JOIN (VALUES (0), (1), (2)) AS k(k)
    ) t
    GROUP BY ws, event_type
    ORDER BY ws, event_type
    """,
)
def ev_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP(ts, slide 10 min, size 30 min): each event lands in 3
    windows — Spark's window() does the expansion (the reference's
    paned SlidingWindowAssigner pre-aggregates panes; Spark's Expand +
    partial agg achieves the same shuffle volume)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(e.value).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value"
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Session window (reference SessionWindowAssigner.java:37)
# ---------------------------------------------------------------------------
@_q(
    "ev_session_window",
    f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS cnt,
           {dsum_sql('value')} AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
)
def ev_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION(ts, gap 30 min) per user — session_window() merges rows
    whose gaps are < 30 min; the oracle reconstructs sessions with the
    classic gaps-and-islands window SQL."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(e.value).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "cnt",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# JSON access (FlinkSqlOperatorTable JSONVALUE → get_json_object)
# ---------------------------------------------------------------------------
@_q(
    "ev_json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1
    ORDER BY k NULLS FIRST
    """,
)
def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONVALUE(props, '$.k') histogram."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            F.get_json_object("props", "$.k").cast("int").alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("k").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# Per-user behavior profile (conditional aggs + event-time min/max)
# ---------------------------------------------------------------------------
@_q(
    "ev_user_profile",
    f"""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_purchases,
           {dsum_sql("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")}
             AS purchase_value,
           MIN(ts) AS first_seen,
           MAX(ts) AS last_seen
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def ev_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(is_purchase, 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchases"),
            dsum(F.when(is_purchase, F.col("value")).otherwise(0.0)).alias(
                "purchase_value"
            ),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Cohort retention (product-analytics rollup; no reference analog —
# the events-table counterpart of the datapipe curation layer)
# ---------------------------------------------------------------------------
@_q(
    "ev_cohort_retention",
    """
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
      FROM events GROUP BY user_id
    )
    SELECT strftime(f.cohort_date, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort_date, CAST(e.ts AS DATE))
                AS INTEGER) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN f USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    distinct-active counts at each day offset. Two shuffles (first-seen
    agg on user_id, then the cohort×offset distinct agg); the cohort
    assignment joins back on user_id — broadcastable when the user
    dimension is small, AQE decides. Cohort day is emitted as an ISO
    string (DATE is the pandas-fetch-fragile family)."""
    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    return (
        e.select("user_id", F.to_date("ts").alias("d"))
        .join(first, "user_id")
        .groupBy(
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "cohort_date").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


# ---------------------------------------------------------------------------
# Ordered funnel (view → click-after-view → purchase-after-click)
# ---------------------------------------------------------------------------
@_q(
    "ev_funnel",
    """
    WITH tv AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    tc AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN tv ON e.user_id = tv.user_id
      WHERE e.event_type = 'click' AND e.ts > tv.t_view
      GROUP BY e.user_id
    ),
    tp AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN tc ON e.user_id = tc.user_id
      WHERE e.event_type = 'purchase' AND e.ts > tc.t_click
      GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'view' AS stage_name,
           CAST(COUNT(*) AS BIGINT) AS n_users FROM tv
    UNION ALL
    SELECT 2, 'view>click', CAST(COUNT(*) AS BIGINT) FROM tc
    UNION ALL
    SELECT 3, 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM tp
    ORDER BY stage
    """,
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel: first view, first click
    AFTER that view, first purchase AFTER that click (overall minima
    would under-count users whose first click precedes their first
    view). Each stage is one filtered agg + an equi-join on user_id —
    the reference's MATCH_RECOGNIZE-style sequence detection expressed
    as join algebra, which unlike a per-user pattern scan keeps
    map-side partial aggregation and needs no ordered window."""
    e = load_table(spark, sf_dir, "events")
    tv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    tc = (
        e.filter(F.col("event_type") == "click")
        .join(tv, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    tp = (
        e.filter(F.col("event_type") == "purchase")
        .join(tc, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def stage(n: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(n).alias("stage"),
            F.lit(name).alias("stage_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )

    return (
        stage(1, "view", tv)
        .unionAll(stage(2, "view>click", tc))
        .unionAll(stage(3, "view>click>purchase", tp))
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# Paned sliding-window aggregation (reference PanedWindowAssigner.java
# — SURVEY §2.5: a hop window of size S sliding by s is the union of
# S/s disjoint PANES of width gcd(S,s); aggregate once per pane, then
# combine each pane's partial into the S/s windows containing it).
# Same result as ev_sliding_window, different physical shape: the
# ×(S/s) replication happens on PANE PARTIALS (one row per
# pane×group), not on input rows — at 100 TB the expand feeds
# panes×groups rows instead of 3× the fact table. Pane partials stay
# DECIMAL so the two-level sum is exactly associative.
# ---------------------------------------------------------------------------
@_q(
    "ev_sliding_paned",
    f"""
    SELECT ws AS window_start, event_type, COUNT(*) AS cnt,
           {dsum_sql('value')} AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL '10 minutes', ts)
               - k.k * INTERVAL '10 minutes' AS ws,
             event_type, value
      FROM events CROSS JOIN (VALUES (0), (1), (2)) AS k(k)
    ) t
    GROUP BY ws, event_type
    ORDER BY ws, event_type
    """,
)
def ev_sliding_paned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP(30 min, slide 10 min) via pane pre-aggregation: tumbling
    10-minute pane partials (count + exact decimal sum), each pane
    expanded to the 3 hop windows containing it, partials combined
    per window. Value-identical to the direct window() form (the
    oracle is byte-identical to ev_sliding_window's) — what changes
    is WHERE the ×3 replication happens."""
    e = load_table(spark, sf_dir, "events")
    pane = e.groupBy(
        F.window("ts", "10 minutes").alias("p"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("pcnt"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("psum"),
    )
    expanded = pane.select(
        F.col("p.start").alias("pstart"),
        "event_type",
        "pcnt",
        "psum",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
    )
    return (
        expanded.select(
            (
                F.col("pstart")
                - F.make_dt_interval(
                    F.lit(0), F.lit(0), F.col("k") * 10, F.lit(0)
                )
            ).alias("window_start"),
            "event_type",
            "pcnt",
            "psum",
        )
        .groupBy("window_start", "event_type")
        .agg(
            F.sum("pcnt").alias("cnt"),
            F.sum("psum").cast("double").alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Time-series gap filling + LOCF (operators/gapfill.py): the
# time_bucket_gapfill / interpolation operator class. The hourly
# series per event_type is densified onto the full [min, max] hour
# grid; empty buckets zero-fill their count/total (an empty bucket
# truly has zero events) while `total_locf` carries the last OBSERVED
# hourly total forward (NULL until a key's first observation). The
# grid is generated (sequence + explode), never shuffled; LOCF is one
# per-key ordered window.
# ---------------------------------------------------------------------------
@_q(
    "ev_gap_fill",
    f"""
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS cnt,
             {dsum_sql('value')} AS total
      FROM events GROUP BY event_type, h
    ),
    b AS (SELECT min(h) AS lo, max(h) AS hi FROM obs),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
    ),
    keys AS (SELECT DISTINCT event_type FROM events),
    dense AS (SELECT keys.event_type, grid.h FROM grid CROSS JOIN keys),
    j AS (
      SELECT dense.event_type, dense.h, obs.cnt, obs.total
      FROM dense LEFT JOIN obs USING (event_type, h)
    )
    SELECT event_type, h,
           CAST(coalesce(cnt, 0) AS BIGINT) AS cnt,
           CAST(coalesce(total, 0.0) AS DOUBLE) AS total,
           CAST(last_value(total IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS total_locf
    FROM j
    ORDER BY event_type, h
    """,
)
def ev_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly series densified per event_type: zero-filled counts,
    LOCF totals — operators/gapfill.py:gap_fill."""
    from ..operators.gapfill import gap_fill

    e = load_table(spark, sf_dir, "events")
    obs = (
        e.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
        )
        .groupBy("event_type", "h")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            dsum(F.col("value")).alias("total"),
        )
    )
    filled = gap_fill(
        obs,
        key_col="event_type",
        bucket_col="h",
        zero_fill={
            "cnt": F.lit(0).cast("bigint"),
            "total": F.lit(0.0),
        },
        locf_cols=["total"],
        interval="1 hour",
    )
    return filled.select(
        "event_type",
        "h",
        "cnt",
        F.col("total").cast("double").alias("total"),
        F.col("total_locf").cast("double").alias("total_locf"),
    ).orderBy("event_type", "h")


# ---------------------------------------------------------------------------
# Linear interpolation across interior gaps (operators/gapfill.py:
# linear_interpolate) — time_bucket_gapfill's interpolate(). The
# fraction is built from the dense grid's ROW INDEX (exact small
# integers, no epoch/timezone arithmetic), and the oracle evaluates
# the byte-identical `pv + (nv - pv) * frac` double formula, so the
# full-precision hash is deterministic. Leading/trailing gaps stay
# NULL (no second anchor), observed buckets pass through.
# ---------------------------------------------------------------------------
@_q(
    "ev_interpolate",
    f"""
    WITH obs AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             {dsum_sql('value')} AS total
      FROM events GROUP BY event_type, h
    ),
    b AS (SELECT min(h) AS lo, max(h) AS hi FROM obs),
    grid AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b
    ),
    keys AS (SELECT DISTINCT event_type FROM events),
    dense AS (SELECT keys.event_type, grid.h FROM grid CROSS JOIN keys),
    j AS (
      SELECT dense.event_type, dense.h, obs.total,
             row_number() OVER (
               PARTITION BY dense.event_type ORDER BY dense.h) AS rn
      FROM dense LEFT JOIN obs USING (event_type, h)
    ),
    k AS (
      SELECT event_type, h, total, rn,
             CASE WHEN total IS NOT NULL THEN rn END AS obs_rn
      FROM j
    ),
    m AS (
      SELECT event_type, h, total, rn,
             last_value(total IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(obs_rn IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pr,
             first_value(total IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(obs_rn IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nr
      FROM k
    )
    SELECT event_type, h,
           CAST(CASE WHEN total IS NOT NULL THEN total
                     WHEN pv IS NOT NULL AND nv IS NOT NULL
                     THEN pv + (nv - pv)
                          * (CAST(rn - pr AS DOUBLE)
                             / CAST(nr - pr AS DOUBLE))
                END AS DOUBLE) AS total_interp
    FROM m
    ORDER BY event_type, h
    """,
)
def ev_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interior-gap linear interpolation of the hourly totals series
    per event_type over the densified grid."""
    from ..operators.gapfill import gap_fill, linear_interpolate

    e = load_table(spark, sf_dir, "events")
    obs = (
        e.select(
            "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
        )
        .groupBy("event_type", "h")
        .agg(dsum(F.col("value")).alias("total"))
    )
    dense = gap_fill(
        obs,
        key_col="event_type",
        bucket_col="h",
        zero_fill={},
        locf_cols=[],
        interval="1 hour",
    )
    return (
        linear_interpolate(dense, "event_type", "h", "total")
        .select("event_type", "h", "total_interp")
        .orderBy("event_type", "h")
    )


# ---------------------------------------------------------------------------
# Robust anomaly detection via MAD (median absolute deviation): flag
# events whose value sits more than k MADs from their series median —
# the standard robust alternative to z-scores (median/MAD have a 50 %
# breakdown point; mean/stddev are dragged by the outliers they are
# supposed to find). Both medians are PERCENTILE_DISC (exact
# elements, no interpolation — engine-safe at full hash precision).
# Two grouped aggregations on the same key: series median, then MAD
# over the deviations; the flag is a pure map.
# ---------------------------------------------------------------------------
@_q(
    "ev_anomaly_mad",
    """
    WITH med AS (
      SELECT event_type,
             quantile_disc(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, med.med,
             abs(e.value - med.med) AS adev
      FROM events e JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type,
             quantile_disc(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_id, dev.event_type,
           CAST(dev.value AS DOUBLE) AS value,
           CAST(dev.med AS DOUBLE) AS series_median,
           CAST(mad.mad AS DOUBLE) AS series_mad,
           CAST(dev.adev > 3 * mad.mad AS BOOLEAN) AS is_anomaly
    FROM dev JOIN mad USING (event_type)
    WHERE dev.adev > 3 * mad.mad
    ORDER BY dev.event_id
    """,
)
def ev_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-MAD outliers per event_type series — only the flagged rows
    are emitted (the alerting shape)."""
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("ev_mad_events")
    return spark.sql(
        """
        WITH med AS (
          SELECT event_type,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY value)
                   AS med
          FROM ev_mad_events GROUP BY event_type
        ),
        dev AS (
          SELECT e.event_id, e.event_type, e.value, med.med,
                 abs(e.value - med.med) AS adev
          FROM ev_mad_events e JOIN med USING (event_type)
        ),
        mad AS (
          SELECT event_type,
                 percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)
                   AS mad
          FROM dev GROUP BY event_type
        )
        SELECT dev.event_id, dev.event_type,
               CAST(dev.value AS DOUBLE) AS value,
               CAST(dev.med AS DOUBLE) AS series_median,
               CAST(mad.mad AS DOUBLE) AS series_mad,
               CAST(dev.adev > 3 * mad.mad AS BOOLEAN) AS is_anomaly
        FROM dev JOIN mad USING (event_type)
        WHERE dev.adev > 3 * mad.mad
        ORDER BY dev.event_id
        """
    )


# ---------------------------------------------------------------------------
# First-touch attribution: each purchase credits the EARLIEST click
# by the same user within the 7 days before it (inclusive). One
# range-frame window over the tagged union — a single shuffle on
# user_id, no purchase x click interval join (the O(n*m)-per-key
# shape attribution queries usually degenerate into). The (ts, id)
# pair is packed into one BIGINT so MIN picks the earliest click
# with a deterministic id tie-break on both engines.
# ---------------------------------------------------------------------------
@_q(
    "ev_attribution",
    """
    WITH tagged AS (
      SELECT user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side,
             event_id
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    w AS (
      SELECT user_id, tsec, side, event_id,
             min(CASE WHEN side = 0
                      THEN tsec * 100000000 + event_id END) OVER (
               PARTITION BY user_id ORDER BY tsec
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
               AS first_touch
      FROM tagged
    )
    SELECT CAST(event_id AS BIGINT) AS purchase_id,
           CAST(first_touch % 100000000 AS BIGINT) AS first_click_id
    FROM w
    WHERE side = 1
    ORDER BY purchase_id
    """,
)
def ev_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day first-touch click attribution per purchase."""
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    # The (tsec, event_id) arithmetic packing below is only injective
    # while event_id < 1e8 — a larger id space would silently corrupt
    # first_click_id, and the oracle replays the identical packing so
    # the gate could not see it (ADVICE r10). Guard the precondition
    # in-entry: one O(1)-result aggregate, loud failure over wrong
    # answers. tsec*1e8 + id then tops out near 1.7e17 ≪ 2^63.
    max_id = e.agg(F.max("event_id")).first()[0]
    if max_id is not None and max_id >= 100_000_000:
        raise AssertionError(
            f"ev_attribution packing precondition violated: "
            f"max(event_id)={max_id} >= 1e8"
        )
    tagged = e.select(
        "user_id",
        # explicit whole-second floor on BOTH engines: DuckDB's
        # epoch() returns a fractional double whose BIGINT cast
        # ROUNDS, while Spark's long cast FLOORS — truncating first
        # removes the divergence class for sub-second timestamps
        F.date_trunc("second", F.col("ts"))
        .cast("timestamp_ltz")
        .cast("long")
        .alias("tsec"),
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("side"),
        "event_id",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tsec")
        .rangeBetween(-604800, W.currentRow)
    )
    packed = F.when(
        F.col("side") == 0,
        F.col("tsec") * F.lit(100_000_000) + F.col("event_id"),
    )
    out = tagged.withColumn("first_touch", F.min(packed).over(w))
    return (
        out.filter(F.col("side") == 1)
        .select(
            F.col("event_id").cast("bigint").alias("purchase_id"),
            (F.col("first_touch") % 100_000_000)
            .cast("bigint")
            .alias("first_click_id"),
        )
        .orderBy("purchase_id")
    )
