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

#: Explicit source schema — required by file-stream sources (no inference
#: at stream time). ts is TIMESTAMP(NANOS) in the parquet; we read it as
#: raw int64 (legacy nanosAsLong, same as the batch loader in
#: sources/tables.py) and truncate to microseconds with integer division.
EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)

_MEMSINK_IDS = itertools.count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`readStream` over the events table with event-time `ts` restored
    to a microsecond timestamp (bit-identical to the batch loader)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # File-stream sources require a directory; the test tables are single
    # files, so stream the parent dir filtered to this table's file(s).
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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
