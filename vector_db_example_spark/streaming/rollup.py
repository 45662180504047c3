"""Streaming maintenance of the hypertable's hourly rollup (a
continuous aggregate kept fresh by micro-batch upserts).

index/hypertable.py builds the rollup offline; this module keeps it
current from the events STREAM: each micro-batch reduces to hourly
partials (count / sum / min / max — all algebraic, so partials merge by
re-aggregation), merges them with the existing rollup rows of the
affected days, and rewrites ONLY those day partitions via dynamic
partition overwrite. Late events need no watermark bound here — a
straggler simply re-merges into its (already closed) day partition,
which is the TimescaleDB refresh semantics rather than the
emit-once-on-watermark semantics of the append-mode windowed aggs in
streaming/events.py. Both are legitimate continuous-aggregate designs;
this one trades bounded state (none at all — partials live in the
layout) for per-batch partition rewrites.

Scale: the per-batch shuffle is hourly partials (a few rows per
executor-hour), the merge re-reads only the touched days' rollup rows
(date partition pruning), and the rewrite touches only those
partitions. A batch that spans H hours of T types rewrites O(H·T) rows
regardless of corpus history size.

Delivery: foreachBatch is at-least-once and a merge is NOT naturally
idempotent (re-merging a delivered batch double-counts), so batches are
guarded by commit markers namespaced per checkpoint — the same
exactly-once recipe as the IVF streaming sink (streaming/ingest.py).
Markers and the persisted schema go through fsio (the Hadoop FS layer),
so the rollup layout can live on any scheme the cluster supports; the
single-writer-per-layout assumption is documented there too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from .. import fsio

#: Rollup row schema shared with index/hypertable.py's offline build.
_ROLLUP_AGGS = (
    ("n", F.sum),
    ("value_sum", F.sum),
    ("value_min", F.min),
    ("value_max", F.max),
)


def _hourly_partials(batch: DataFrame) -> DataFrame:
    return (
        batch.withColumn("event_date", F.to_date("ts"))
        .groupBy(
            "event_date",
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("value_sum"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
        )
    )


def stream_rollup_maintenance(
    spark: SparkSession,
    events_stream: DataFrame,
    rollup_path: str,
    checkpoint_path: str,
) -> None:
    """Drive `events_stream` to completion (availableNow), upserting
    hourly rollup rows into the date-partitioned layout at
    `rollup_path`."""
    marker_dir = f"{rollup_path}/_committed_batches/{fsio.canonical_token(checkpoint_path)}"
    fsio.mkdirs(marker_dir)
    # Persist the rollup schema up front (derivable from the stream's
    # schema through the partials plan, no execution needed): a run over
    # an all-empty stream writes no data file, and read_rollup's schema
    # inference would crash on the fileless layout (the delete-to-empty
    # class, SCALING.md round 6).
    schema_file = f"{rollup_path}/_rollup_schema.json"
    if not fsio.exists(schema_file):
        empty = spark.createDataFrame([], events_stream.schema)
        fsio.write_text(schema_file, _hourly_partials(empty).schema.json())

    def sink_batch(batch: DataFrame, batch_id: int) -> None:
        marker = f"{marker_dir}/batch_{batch_id}"
        if fsio.exists(marker):  # re-delivered batch: already merged
            return
        partials = _hourly_partials(batch)
        # Touched days: a tiny driver list (one row per day in the batch).
        days = [r[0] for r in partials.select("event_date").distinct().collect()]
        if not days:
            fsio.touch(marker)
            return
        try:
            existing = (
                spark.read.parquet(rollup_path)
                .filter(F.col("event_date").isin(days))  # partition pruning
                .select(partials.columns)
                # materialize BEFORE the overwrite below replaces the
                # files this plan would lazily re-read
                .localCheckpoint(eager=True)
            )
            merged_src = existing.unionByName(partials)
        except AnalysisException:  # first batch: layout doesn't exist yet
            merged_src = partials
        merged = merged_src.groupBy("event_date", "hour_ts", "event_type").agg(
            *[fn(c).alias(c) for c, fn in _ROLLUP_AGGS]
        )
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("event_date")
            .parquet(rollup_path)
        )
        fsio.touch(marker)

    q = (
        events_stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The maintained rollup, with the repo's string date/time output
    conventions applied (raw doubles stay unrounded — consumers round at
    their output edge). Reads with the schema the sink persisted, so a
    rollup maintained from an all-empty stream (no data file yet) is a
    well-typed empty frame rather than an inference error."""
    import json

    from pyspark.sql.types import StructType

    schema_file = f"{rollup_path}/_rollup_schema.json"
    if fsio.exists(schema_file):
        schema = StructType.fromJson(json.loads(fsio.read_text(schema_file)))
        base = spark.read.schema(schema).parquet(rollup_path)
    else:
        base = spark.read.parquet(rollup_path)
    return base.select(
        F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
        F.date_format("hour_ts", "yyyy-MM-dd HH:mm:ss").alias("hour_ts"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        "value_sum",
        "value_min",
        "value_max",
    )
