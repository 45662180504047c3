"""Event-analytics query inventory over the `events` table (SURVEY.md
§2.9 / M6 extension — the reference has no streaming surface, so these
define the engine's event-time semantics; the same logic runs as
Structured Streaming in streaming/, checked here as batch SQL).

Precision note: parquet stores ts as nanoseconds; Spark truncates to
microseconds on read, so every oracle query casts ``ts::TIMESTAMP``
(DuckDB's microsecond type, truncating) before comparing or
differencing — this keeps both engines bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.exactsum import exact_units
from ..sources.tables import load_table
from .registry import register


@register(
    "events_tumbling_window",
    oracle="""
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("events", "window"),
    bench=True,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation — the batch form of
    the streaming groupBy(window(ts)) plan in streaming/events.py."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_sessionization",
    oracle="""
WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events),
gaps AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM e
),
marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 10 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM gaps
),
sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, session_id::BIGINT AS session_id,
       count(*)::BIGINT AS n_events,
       (epoch_us(max(ts)) - epoch_us(min(ts))) AS duration_us
FROM sess GROUP BY user_id, session_id
""",
    tags=("events", "session", "window"),
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (10-min inactivity): lag → new-session
    flag → running sum as session id → per-session aggregates. This is the
    batch mirror of session_window in Structured Streaming."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.withColumn("prev_ts", F.lag("ts").over(w_lag)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 600_000_000),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn("session_id", F.sum("new_session").over(w_run))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias("duration_us"),
    )


@register(
    "events_type_stats",
    # sum/avg in exact cents (q5 failure class: 5 groups × the whole
    # event log = large-addend double sums); min/max/median are
    # order-independent already and keep their form
    oracle="""
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT / 100.0 AS total,
       sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT / 100.0 / count(*) AS mean,
       round(min(value), 2) AS vmin,
       round(max(value), 2) AS vmax,
       round(quantile_cont(value, 0.5), 6) AS median
FROM events
GROUP BY event_type
""",
    tags=("events", "agg"),
)
def events_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value statistics including an exact interpolated median
    (Spark `percentile` ≡ DuckDB `quantile_cont`). Sum and mean use
    exact-cents arithmetic (2-decimal values) so whole-log groups are
    independent of partition merge order."""
    ev = load_table(spark, sf_dir, "events")
    cents = exact_units(F.col("value"), 100)
    n = F.count(F.lit(1))
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        (F.sum(cents) / F.lit(100.0)).alias("total"),
        (F.sum(cents) / F.lit(100.0) / n).alias("mean"),
        F.round(F.min("value"), 2).alias("vmin"),
        F.round(F.max("value"), 2).alias("vmax"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median"),
    )


@register(
    "events_json_props",
    oracle="""
SELECT event_type,
       count(*)::BIGINT AS n,
       round(avg((props->>'$.k')::INTEGER), 6) AS avg_k,
       max((props->>'$.k')::INTEGER) AS max_k
FROM events
GROUP BY event_type
""",
    tags=("events", "json"),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: JSON scalar extraction + aggregation
    (get_json_object ≡ ->> )."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(k), 6).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "events_asof_click_purchase",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type, value
  FROM events WHERE event_type IN ('click', 'purchase')
),
marked AS (
  SELECT *,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER w AS last_click_ts,
         last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
           OVER w AS last_click_value
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id,
       event_id AS purchase_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       strftime(last_click_ts, '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts,
       round(last_click_value, 2) AS last_click_value
FROM marked WHERE event_type = 'purchase'
""",
    tags=("events", "asof", "window"),
)
def events_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click
    at-or-before it (in (ts, event_id) order). Spark has no native ASOF
    JOIN; the scalable form is NOT a range join (quadratic candidate
    blowup) but a single union + running `last(..., ignorenulls)` window —
    one hash-partition shuffle on user_id, merge-scan semantics, state
    O(1) per row. Purchases before any click get NULL."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_id", "user_id", "ts", "event_type", "value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    click_val = F.last(
        F.when(F.col("event_type") == "click", F.col("value")), ignorenulls=True
    ).over(w)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        ev.withColumn("last_click_ts", click_ts)
        .withColumn("last_click_value", F.round(click_val, 2))
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.date_format("ts", fmt).alias("purchase_ts"),
            F.date_format("last_click_ts", fmt).alias("last_click_ts"),
            "last_click_value",
        )
    )


@register(
    "events_range_join_clicks_before_purchase",
    oracle="""
WITH p AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, value FROM events
      WHERE event_type = 'click')
SELECT p.user_id, p.event_id AS purchase_id,
       count(c.event_id)::BIGINT AS n_clicks_30m,
       round(coalesce(sum(c.value), 0), 2) AS clicks_value_30m
FROM p LEFT JOIN c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts <  p.ts
GROUP BY 1, 2
""",
    tags=("events", "rangejoin"),
)
def events_range_join_clicks_before_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bounded-interval range join, bucketed (operators/rangejoin.py):
    clicks in the 30 minutes before each purchase, per user. The oracle
    states the naive range join; the engine runs the equi-join-on-
    (key, time-bucket) form that scales."""
    from ..operators.rangejoin import bucketed_range_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts", "value"
    )
    matched = bucketed_range_join(
        purchases, clicks, key="user_id", window_seconds=1800
    )
    counts = matched.groupBy("user_id", "purchase_id").agg(
        F.count("click_id").alias("n_clicks_30m"),
        F.round(F.sum("value"), 2).alias("clicks_value_30m"),
    )
    return (
        purchases.join(counts, ["user_id", "purchase_id"], "left")
        .select(
            "user_id",
            "purchase_id",
            F.coalesce("n_clicks_30m", F.lit(0)).alias("n_clicks_30m"),
            F.coalesce("clicks_value_30m", F.lit(0.0)).alias("clicks_value_30m"),
        )
    )


@register(
    "events_sliding_window",
    oracle="""
WITH w AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts::TIMESTAMP)
           - k.k * INTERVAL 15 MINUTE AS window_start,
         event_type, value
  FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k)
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS total_value
FROM w GROUP BY 1, 2
""",
    tags=("events", "window", "sliding"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window every 15 minutes (`window(ts, size, slide)`).
    Spark assigns each event to its size/slide = 4 overlapping windows
    map-side, then one hash aggregation — the oracle states the same
    semantics as an explicit 4-offset cross join. Streaming form is the
    identical plan plus a watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_latest_snapshot",
    oracle="""
WITH e AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type, value
           FROM events),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM e
)
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_type,
       round(value, 2) AS last_value,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
FROM r WHERE rn = 1
""",
    tags=("events", "cdc", "compaction"),
)
def events_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style latest-state compaction: one row per user = the most
    recent event by (ts, event_id). The oracle states it as the usual
    row_number()=1 window; the engine uses `max_by` over a struct key —
    a plain partial+final aggregation (map-side combine keeps one row per
    key per partition), no per-user sort and no window state. That is the
    100 TB shape for snapshotting a changelog."""
    ev = load_table(spark, sf_dir, "events")
    latest = ev.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "event_type", "value", "ts"),
            F.struct("ts", "event_id"),
        ).alias("s")
    )
    return latest.select(
        "user_id",
        F.col("s.event_id").alias("last_event_id"),
        F.col("s.event_type").alias("last_type"),
        F.round("s.value", 2).alias("last_value"),
        F.date_format("s.ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
    )


@register(
    "events_approx_quantiles",
    oracle=None,  # GK-sketch estimates are engine-specific; the error
    # bound vs exact percentiles is pinned in tests/test_bucketing.py
    tags=("events", "sketch", "quantile"),
)
def events_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles (`percentile_approx`,
    accuracy 10000 ⇒ ε=1e-4): like the HLL++ sketch, the 100 TB shape —
    the shuffle carries fixed-size sketch state per group instead of the
    full sorted value stream an exact percentile needs."""
    ev = load_table(spark, sf_dir, "events")
    q = F.percentile_approx("value", [0.5, 0.95, 0.99], 10000)
    return ev.groupBy("event_type").agg(
        F.round(F.element_at(q, 1), 4).alias("p50"),
        F.round(F.element_at(q, 2), 4).alias("p95"),
        F.round(F.element_at(q, 3), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "events_conversion_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts::TIMESTAMP) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts::TIMESTAMP > v.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts::TIMESTAMP) AS t
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts::TIMESTAMP > c.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v)::BIGINT AS n_view,
       (SELECT count(*) FROM c)::BIGINT AS n_click_after_view,
       (SELECT count(*) FROM p)::BIGINT AS n_purchase_after_click
""",
    tags=("events", "funnel", "sequence"),
)
def events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users whose first view precedes a click
    precedes a purchase, as ONE job with ONE data-sized shuffle.

    The three stage timestamps are dependent per-user mins
    (t_click = min click ts AFTER t_view, …), so they compute as three
    chained unbounded windows over the SAME user_id partitioning — Spark
    shuffles the (filtered) events once and the two follow-up window
    passes plus the per-user rollup reuse that distribution. No stage
    joins at all, so nothing user-sized is ever broadcast (users grow
    with the data — a broadcast of a per-user table OOMs at 100×), and
    no driver-side count() actions recompute the chain."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
    )
    w = Window.partitionBy("user_id")
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    staged = (
        ev.withColumn("t_v", F.min(F.when(is_("view"), F.col("ts"))).over(w))
        .withColumn(
            "t_c",
            F.min(
                F.when(is_("click") & (F.col("ts") > F.col("t_v")), F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "t_p",
            F.min(
                F.when(is_("purchase") & (F.col("ts") > F.col("t_c")), F.col("ts"))
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t_v").alias("t_v"), F.min("t_c").alias("t_c"), F.min("t_p").alias("t_p")
    )
    return per_user.agg(
        F.count("t_v").alias("n_view"),
        F.count("t_c").alias("n_click_after_view"),
        F.count("t_p").alias("n_purchase_after_click"),
    )


@register(
    "events_user_daily_pivot",
    oracle="""
SELECT user_id,
       strftime(time_bucket(INTERVAL 1 DAY, ts::TIMESTAMP), '%Y-%m-%d') AS day,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup
FROM events
WHERE user_id < 20
GROUP BY 1, 2
""",
    tags=("events", "pivot"),
)
def events_user_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user activity pivot (conditional aggregation — the
    shuffle-friendly form of pivot())."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in ("click", "view", "purchase", "error", "signup")
    ]
    return ev.groupBy("user_id", day).agg(*aggs)


#: One hypertable build (raw chunks + hourly rollup) per sf_dir per
#: process — queries share it, mirroring the IVF index cache.
_HYPERTABLE_CACHE: dict[str, "Hypertable"] = {}


def get_hypertable(spark: SparkSession, sf_dir: str) -> "Hypertable":
    import hashlib

    from ..index.hypertable import build_hypertable

    if sf_dir not in _HYPERTABLE_CACHE:
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        ev = load_table(spark, sf_dir, "events")
        _HYPERTABLE_CACHE[sf_dir] = build_hypertable(
            ev, path=f"/tmp/spark_graft_hypertable_{tag}"
        )
    return _HYPERTABLE_CACHE[sf_dir]


@register(
    "events_hypertable_rollup",
    oracle="""
SELECT strftime(ts::DATE, '%Y-%m-%d') AS event_date, event_type,
       count(*)::BIGINT AS n,
       round(sum(value), 2) AS total,
       round(min(value), 2) AS vmin,
       round(max(value), 2) AS vmax
FROM events
GROUP BY 1, 2
""",
    tags=("events", "hypertable", "rollup", "layout"),
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type summary answered the hypertable way: closed days
    (before 2024-01-25) re-aggregate the HOURLY ROLLUP layout, the open
    tail aggregates raw date-partitioned chunks, union + combine — while
    the oracle states the same semantics directly over raw `events`.
    Both legs' date predicates are partition filters (pinned in
    tests/test_plans.py); see index/hypertable.py for the 100-TB story.
    """
    ht = get_hypertable(spark, sf_dir)
    from ..index.hypertable import hypertable_report

    return hypertable_report(spark, ht, tail_from="2024-01-25")


@register(
    "events_exact_quantiles",
    oracle="""
SELECT event_type,
       quantile_cont(value, 0.25) AS p25,
       quantile_cont(value, 0.50) AS p50,
       quantile_cont(value, 0.75) AS p75,
       quantile_cont(value, 0.95) AS p95
FROM events
GROUP BY event_type
""",
    tags=("events", "quantiles", "aggregation"),
)
def events_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-type quantiles — the hash-checkable anchor for the
    quantile family whose scale path is the rows-only
    ``events_approx_quantiles`` (approx_percentile/KLL sketch, merge-
    able, one pass): both engines implement type-7 linear interpolation
    (pos = p·(n-1), lower + frac·(upper-lower)) over sorted doubles, so
    the values are bit-identical with NO rounding. Exact percentile
    requires a per-group sort — fine for bounded group cardinality like
    event types, and exactly the cost the sketch family exists to avoid
    on unbounded groups at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.50).alias("p50"),
        F.percentile("value", 0.75).alias("p75"),
        F.percentile("value", 0.95).alias("p95"),
    )


@register(
    "events_retention_cohorts",
    oracle="""
WITH u AS (
  SELECT user_id, min(ts::DATE) AS cohort_date,
         list(DISTINCT ts::DATE) AS days
  FROM events GROUP BY user_id
)
SELECT strftime(cohort_date, '%Y-%m-%d') AS cohort_date,
       (d - cohort_date)::INTEGER AS day_offset,
       count(DISTINCT user_id)::BIGINT AS active_users
FROM u CROSS JOIN unnest(days) AS t(d)
GROUP BY 1, 2
""",
    tags=("events", "retention", "cohort"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort-retention triangle: users grouped by first-activity
    day, counted on each later active day as an offset from their cohort.
    Shaped for scale as TWO shuffles and NO join: one user-keyed groupBy
    computes the cohort date AND the distinct active-day set together
    (collect_set is bounded by the calendar, not the event count), then
    the exploded (cohort, offset) pairs aggregate. The obvious
    first-activity-table-joined-back-to-events form would shuffle the
    raw event log twice and join it — strictly worse at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .groupBy("user_id")
        .agg(
            F.min("d").alias("cohort_date"),
            F.collect_set("d").alias("days"),
        )
    )
    return (
        per_user.select(
            "user_id", "cohort_date", F.explode("days").alias("d")
        )
        .groupBy(
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("d", "cohort_date").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@register(
    "events_hypertable_retention",
    # cutoff and tail split are derived from the data's own date span,
    # so the oracle is closed-form at any scale factor; n_dropped = one
    # raw + one rollup chunk directory per pre-cutoff day
    oracle="""
WITH b AS (SELECT min(ts::DATE) AS dmin, max(ts::DATE) AS dmax FROM events),
c AS (SELECT dmin + ((dmax - dmin) // 2)::INTEGER AS cutoff FROM b),
d AS (
  SELECT 2 * count(DISTINCT ts::DATE) AS n_dropped
  FROM events, c WHERE ts::DATE < cutoff
)
SELECT strftime(ts::DATE, '%Y-%m-%d') AS event_date, event_type,
       count(*)::BIGINT AS n,
       round(sum(value), 2) AS total,
       round(min(value), 2) AS vmin,
       round(max(value), 2) AS vmax,
       (SELECT n_dropped FROM d) AS n_dropped
FROM events, c
WHERE ts::DATE >= cutoff
GROUP BY 1, 2
""",
    tags=("events", "hypertable", "retention", "layout", "maintenance"),
)
def events_hypertable_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-retention on the time-chunked layout, hash-checked: build
    raw+rollup chunks, drop every day-chunk older than the span's
    midpoint (directory removal — O(days dropped), never a rewrite or a
    scan of survivors, index/hypertable.py::drop_chunks), then the
    continuous-aggregate report over what remains — closed days from
    the surviving rollup, the open tail from surviving raw — must equal
    SQL over exactly the post-cutoff events, and the dropped-directory
    count must equal one raw + one rollup chunk per pre-cutoff day.
    This is the ops story VERDICT's hypertable row points at: at 100 TB
    retention cost is proportional to what is deleted, not table size."""
    import datetime
    import shutil
    import tempfile

    from ..index.hypertable import build_hypertable, drop_chunks, hypertable_report

    ev = load_table(spark, sf_dir, "events")
    dmin, dmax = ev.agg(
        F.min(F.to_date("ts")), F.max(F.to_date("ts"))
    ).first()
    cutoff = dmin + datetime.timedelta(days=(dmax - dmin).days // 2)
    tail_from = cutoff + datetime.timedelta(days=(dmax - cutoff).days // 2)

    # per-run temp dir, materialize, clean up in finally: the query IS
    # the retention history, so re-runs must never see prior chunks and
    # the returned frame must outlive the layout
    base = tempfile.mkdtemp(prefix="spark_graft_htret_")
    try:
        table = build_hypertable(ev, base)
        n_dropped = drop_chunks(spark, table, cutoff.isoformat())
        rep = hypertable_report(spark, table, tail_from.isoformat())
        out = rep.withColumn("n_dropped", F.lit(n_dropped).cast("long"))
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
