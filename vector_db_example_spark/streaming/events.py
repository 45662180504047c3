"""Event-stream analytics: file-stream source + event-time windows.

Scale notes (the point of doing this on Spark):

* The file stream source is a stand-in for Kafka/Kinesis — the plan
  (watermark → window agg) is identical; only `format()` changes.
* Watermark + tumbling/session windows keep state bounded: at 100 TB/day
  the state store only holds windows newer than the watermark, and the
  shuffle is the same hash-partition-by-key exchange as the batch agg.
* `availableNow` gives batch-boundary exactly-once runs of the same
  streaming plan — the mechanism the tests and the driver's oracle
  comparison use (stream result ≡ batch result on a static input).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_example_spark.sources.tables import restore_event_ts


_MEMSINK_IDS = itertools.count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`readStream` over the events table with event-time `ts` restored
    to a microsecond timestamp (bit-identical to the batch loader).

    File-stream sources require an explicit schema (no inference at
    stream time); take it from one batch footer read so the stream sees
    whichever raw ts shape (int64 nanos / native µs) this corpus drop
    has — sources/tables.py's restore_event_ts normalizes either."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The test tables are single files; stream the parent dir filtered
    # to this table's file(s).
    raw = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return restore_event_ts(raw)


def windowed_type_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/hopping) event-time window ×
    event_type aggregation — the streaming form of
    `events_tumbling_window` / `events_sliding_window`
    (queries/events_q.py). The watermark bounds state retention; late
    rows older than it are dropped on arrival. A sliding window holds
    size/slide concurrent windows of state per key — still bounded by
    the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide or window).alias("w"), "event_type")
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


def session_windows(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Native gap-based session windows per user (`session_window` — the
    built-in stateful operator; no applyInPandasWithState needed because
    Spark ships the exact semantics). A session extends `gap` past each
    event; an event at exactly start+gap opens a NEW session (half-open
    [t, t+gap) extension — the oracle mirrors this with `>= gap`)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def run_to_memory(
    result: DataFrame, name: str = "stream_result", output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DataFrame to completion with `availableNow` into a
    memory sink and return the materialized result.

    Memory sink is the test/driver harness sink only — production sinks
    are parquet/Kafka via the same `writeStream`. `complete` output mode
    re-emits every window, so on a static input the result is exactly the
    batch answer (watermark eviction never drops output rows here; with a
    single-file source everything arrives in one micro-batch, so nothing
    is late either)."""
    qname = f"{name}_{next(_MEMSINK_IDS)}"
    q = (
        result.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(qname)


def stateful_user_topk(events: DataFrame, k: int = 3) -> DataFrame:
    """CUSTOM stateful operator via ``applyInPandasWithState`` — the
    escape hatch for semantics no built-in stateful op expresses: a
    per-user bounded top-k heap (largest ``value`` events, event_id
    tiebreak) carried as explicit group state across micro-batches.

    State is the current top-k triple-list only — O(k) per user however
    long the stream runs, the state-store discipline that survives
    unbounded streams. Each invocation merges the group's new rows into
    the heap, persists it, and emits the updated top-k (update-mode
    snapshot semantics: with a multi-batch source the sink holds one
    snapshot per batch; the latest is the answer — on the harness's
    single-file source exactly one batch fires, so the emission IS the
    final answer and equals the batch window-top-k).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, rank int, value double, event_type string, event_id long"
    )
    state_schema = (
        "values array<double>, event_ids array<long>, types array<string>"
    )

    def update(key, pdfs, state: GroupState):
        rows: list[tuple[float, int, str]] = []
        if state.exists:
            vs, ids, tys = state.get
            rows = list(zip(vs, ids, tys))
        for pdf in pdfs:
            rows.extend(
                zip(
                    (float(v) for v in pdf["value"]),
                    (int(i) for i in pdf["event_id"]),
                    (str(t) for t in pdf["event_type"]),
                )
            )
        rows.sort(key=lambda r: (-r[0], r[1]))
        top = rows[:k]
        state.update(
            ([r[0] for r in top], [r[1] for r in top], [r[2] for r in top])
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "value": [r[0] for r in top],
                "event_type": [r[2] for r in top],
                "event_id": [r[1] for r in top],
            }
        )

    return (
        events.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def interval_join_clicks_before_purchases(
    purchases: DataFrame,
    clicks: DataFrame,
    window_seconds: int = 1800,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding ``window_seconds``. Both sides carry
    watermarks and the join condition bounds event time in both
    directions, so the state store retains only rows inside the interval
    plus the watermark delay — bounded state on unbounded streams (the
    canonical Structured Streaming stream-stream join shape).

    ``how="inner"`` (the driver-checked default): matches emit as soon
    as both rows arrive, so a static input equals the batch inner join
    exactly. ``how="leftOuter"``: purchases with no qualifying click
    ALSO emit, with null click columns — but only once the watermark
    passes the purchase's join bound (the engine must prove no future
    click can match before it may emit the null row). A finite run
    therefore needs late watermark-advancing input (or it drops the
    unmatched tail) — which is why the oracle-checked surface pins the
    inner form and the outer form is pinned by a multi-batch pytest
    (tests/test_streaming.py) that advances the watermark explicitly.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("click_value"),
        )
    )
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_seconds} SECONDS"))
        & (F.col("c_ts") < F.col("p_ts")),
        how,
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "click_value",
    )


def enrich_against_dimension(
    events: DataFrame, dim: DataFrame, join_expr, segment_col: str
) -> DataFrame:
    """Stream–static enrichment join + segment rollup: each micro-batch
    joins against the (broadcast) static dimension STATELESSLY — no
    watermark, no join state, the one streaming join shape that is free
    at any scale — then feeds a running per-segment aggregate. On a
    cluster the dimension is a slowly-changing table re-read per batch;
    broadcast keeps the stream side shuffle-free."""
    joined = events.join(F.broadcast(dim), join_expr)
    return joined.groupBy(F.col(segment_col), F.col("event_type")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
