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


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to map
    to its microsecond timestamp type. Read it as a raw int64 (legacy
    nanosAsLong) and truncate ns → µs with integer division (the value is
    ~1.7e18, far beyond double precision — float division would corrupt
    it). Set defensively at runtime so this works under any caller's
    session, not just ours."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so ``spark.sql`` queries work."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
