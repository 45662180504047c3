"""Parquet table loaders for the driver-generated test corpus.

Tables (one parquet per table, see TESTDATA.md): TPC-H-ish star schema
``region nation customer supplier part orders lineitem`` plus ``events``
(streaming-shaped), ``documents`` (text corpus) and ``embeddings``
(64-dim float vectors).

At cluster scale these would be partitioned datasets / catalog tables;
the loader API is the same — Catalyst still gets pushdown + pruning
because we always go through ``spark.read.parquet``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def widen_cpu_dense(df: DataFrame, factor: int = 1) -> DataFrame:
    """Widen a CPU-DENSE map stage's input beyond its bytes-sized scan
    split (SCALING.md round-6 rule): text compresses ~10×, so a 5 MB
    parquet of 50 MB text opens as 2 partitions and any heavy per-row
    stage over it (embedders, tokenize/gram expressions, Arrow
    kernels) runs on 2 cores. Repartitions to the cluster's default
    parallelism ONLY when the scan is narrower than that — a no-op on
    pre-split 100 TB corpora (many files ⇒ partitioning already
    exceeds it); the one text shuffle it costs is the same bytes the
    scan already moves, repaid many times over by the widened map
    stage. Apply to the input of the dense stage only, never to
    pruned/filter-first reads (it would defeat pushdown).

    ``factor`` over-partitions to ``factor ×`` the core count for
    LONG corpus-sized dense passes (the standard straggler-granularity
    rule: with one task per core, one uneven native parquet split sets
    the stage's wall; at 4× granularity the scheduler rebalances the
    tail — measured 18% off the sf25 dedup-index signature pass,
    SCALING.md round 8). Leave at 1 for batch-sized inputs, where task
    overhead would dominate the smoothing."""
    par = df.sparkSession.sparkContext.defaultParallelism * max(1, int(factor))
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def restore_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to Spark's microsecond TimestampType.

    The driver's corpus has shipped two shapes across rounds: TIMESTAMP
    (NANOS) — which Spark 4 only reads as a raw int64 under legacy
    nanosAsLong, so we truncate ns → µs with *integer* division (the
    value is ~1.7e18, beyond double precision; float division would
    corrupt it) — and native timestamp[us], which arrives as
    TIMESTAMP_NTZ and only needs a cast (UTC session timezone makes the
    cast value-preserving)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nanosAsLong is a no-op for µs data; set defensively so the NANOS
    # corpus shape works under any caller's session, not just ours.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return restore_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so ``spark.sql`` queries work."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
