"""Time-chunked event layout + hourly continuous aggregate (rollup).

The 100-TB scale story for append-heavy event tables (the TimescaleDB
"hypertable" / Druid segment idea, expressed as plain Spark layouts):

- **Raw chunks**: events written date-partitioned (`event_date=.../`).
  Any query with a time-range predicate prunes whole days at the parquet
  source (`PartitionFilters`, pinned in tests/test_plans.py) — at 1000
  executors x 100 TB the scan cost is proportional to the window asked
  for, not the table's history.
- **Hourly rollup**: a pre-aggregated continuous aggregate per
  (hour, event_type) holding ONLY algebraic measures — count, sum, min,
  max — so any coarser grain (day/week/whole-range) or any sub-range
  re-aggregates from rollup rows without touching raw data. Mean is
  derived (sum/count), never stored. The rollup is itself
  date-partitioned, so rollup reads prune identically.
- **Query time** (`hypertable_report`): closed days are answered from
  the rollup; the open tail is aggregated from raw chunks on the fly;
  a union + final combine merges the two — the continuous-aggregate
  pattern. The tail scan's partition filter makes "aggregate 100 TB of
  history + today's live data" cost one rollup read + one day of raw.

Maintenance composes with the streaming layer: the idempotent
foreachBatch sink in streaming/ingest.py can append closed-hour rollup
rows per micro-batch (commit-marker exactly-once), with the same
query-time union covering the not-yet-rolled-up tail.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass(frozen=True)
class Hypertable:
    """Paths + schemas of a built time-chunked layout (both
    date-partitioned). Schemas are persisted at build time
    (``meta.json`` next to the chunk roots) so reads stay well-defined
    after retention drops every chunk — schema inference over an empty
    partitioned directory raises UNABLE_TO_INFER_SCHEMA, found by the
    hypothesis retention sweep in tests/test_properties.py."""

    raw_path: str
    rollup_path: str
    raw_schema: str  # StructType JSON
    rollup_schema: str

    @staticmethod
    def load(path: str) -> "Hypertable":
        import json

        from .. import fsio

        return Hypertable(**json.loads(fsio.read_text(f"{path}/meta.json")))


def build_hypertable(events: DataFrame, path: str) -> Hypertable:
    """Write `events` as a date-chunked raw layout plus an hourly rollup.

    One pass for each output; the rollup aggregation is partial+final
    (map-side combine) keyed on (event_date, hour_ts, event_type) — at
    scale this is a shuffle of per-(hour,type) partials, a few rows per
    executor-day, not of events.
    """
    import json

    raw_path = f"{path}/raw"
    rollup_path = f"{path}/rollup_1h"

    with_date = events.withColumn("event_date", F.to_date("ts"))
    (
        with_date.write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(raw_path)
    )

    rollup = (
        with_date.groupBy(
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
    (
        rollup.write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(rollup_path)
    )
    table = Hypertable(
        raw_path=raw_path,
        rollup_path=rollup_path,
        raw_schema=with_date.schema.json(),
        rollup_schema=rollup.schema.json(),
    )
    from .. import fsio

    # Hadoop-FS IO (fsio): table meta lives wherever the chunks live —
    # any scheme, not just the local filesystem.
    fsio.write_text(
        f"{path}/meta.json",
        json.dumps(
            {
                "raw_path": raw_path,
                "rollup_path": rollup_path,
                "raw_schema": table.raw_schema,
                "rollup_schema": table.rollup_schema,
            }
        ),
    )
    return table


def _read_chunked(spark: SparkSession, path: str, schema_json: str) -> DataFrame:
    """Read a chunk root with its persisted schema: identical plan when
    chunks exist (partition pruning untouched), and a well-typed EMPTY
    frame when retention has removed every chunk directory."""
    import json

    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(schema_json))
    return spark.read.schema(schema).parquet(path)


def hypertable_report(
    spark: SparkSession, table: Hypertable, tail_from: str
) -> DataFrame:
    """Per-(event_date, event_type) daily summary over the whole table:
    days before `tail_from` (ISO date string) re-aggregate ROLLUP rows
    (closed chunks — never touches raw), `tail_from` onward aggregates
    RAW events (the open tail). Both sides' date predicates are partition
    filters on the chunked layouts.

    Output: (event_date, event_type, n, total, vmin, vmax), `total`
    rounded to 2 (the repo's float-sum output convention); `event_date`
    formatted 'yyyy-MM-dd' (the repo's date output convention — both
    engines emit the identical string).
    """
    cutoff = F.lit(tail_from).cast("date")

    closed = (
        _read_chunked(spark, table.rollup_path, table.rollup_schema)
        .filter(F.col("event_date") < cutoff)
        .groupBy("event_date", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("value_sum").alias("total"),
            F.min("value_min").alias("vmin"),
            F.max("value_max").alias("vmax"),
        )
    )
    tail = (
        _read_chunked(spark, table.raw_path, table.raw_schema)
        .filter(F.col("event_date") >= cutoff)
        .groupBy("event_date", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
    )
    merged = closed.unionByName(tail)
    return merged.select(
        F.date_format("event_date", "yyyy-MM-dd").alias("event_date"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("total", 2).alias("total"),
        F.round("vmin", 2).alias("vmin"),
        F.round("vmax", 2).alias("vmax"),
    )


def drop_chunks(spark: SparkSession, table: Hypertable, older_than: str) -> int:
    """Retention: delete whole day-chunks (raw AND rollup) with
    `event_date` before `older_than` (ISO date). Because the layout is
    date-partitioned, retention is directory removal — no rewrite, no
    scan of surviving data; at 100 TB this is O(days dropped), not
    O(table). Returns the number of chunk directories removed.

    Single-writer assumption as elsewhere; a transactional table format
    would make the drop atomic against concurrent readers.
    """
    import datetime

    from .. import fsio

    cutoff = datetime.date.fromisoformat(older_than)
    dropped = 0
    for root in (table.raw_path, table.rollup_path):
        # One driver-side LIST per chunk root (O(days), not O(table)) —
        # through the Hadoop FS so retention works on any scheme.
        for name in fsio.list_names(root, spark):
            if not name.startswith("event_date="):
                continue
            day = datetime.date.fromisoformat(name.split("=", 1)[1])
            if day < cutoff:
                fsio.delete(f"{root}/{name}", spark=spark)
                dropped += 1
    return dropped
