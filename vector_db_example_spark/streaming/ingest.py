"""Continuous knowledge ingestion: the reference's batch embed+insert
loop (S5, /root/reference/src/app.py:205-238) as a Structured Streaming
`foreachBatch` pipeline (SURVEY.md §1.4, §7 M6).

Per micro-batch: clean (F1) → min-length filter (P4) → embed (F7 pandas
UDF) → append to the corpus sink — i.e. exactly the reference's
per-100-row driver loop, but each micro-batch is embedded
executor-parallel and written atomically. The inserted-count
accumulation (reference src/app.py:211,231-232) becomes a driver-side
counter updated per batch.

At scale: the source becomes Kafka, the sink a partitioned table; the
embed UDF cost dominates, and it scales linearly with executors because
the model is cached per worker process (functions/embedding.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embedding import hashing_embedder
from ..functions.text import clean_content

DOCUMENTS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def stream_ingest_documents(
    spark: SparkSession,
    sf_dir: str,
    sink_path: str,
    checkpoint_path: str,
    dim: int = 384,
    min_len: int = 10,
) -> int:
    """Run the continuous ingest pipeline to completion (`availableNow`)
    and return the total inserted row count (S5's accumulated count,
    done correctly — SURVEY.md §2.1 S9 notes the reference's count bug).
    """
    embed = hashing_embedder(dim)
    inserted = {"n": 0}

    def sink_batch(batch: DataFrame, batch_id: int) -> None:
        prepared = (
            batch.withColumn("text", clean_content(F.col("text")))
            .filter(F.length("text") >= min_len)
            .withColumn("embedding", embed(F.col("text")))
        )
        prepared.write.mode("append").parquet(sink_path)
        # spark.read-back is the honest count (write metrics are not
        # exposed to foreachBatch); batch sizes here are small relative
        # to the embed cost.
        inserted["n"] += prepared.count()

    q = (
        read_documents_stream(spark, sf_dir)
        .writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return inserted["n"]


def stream_ingest_embeddings_into_ivf(
    spark: SparkSession,
    sf_dir: str,
    index,
    checkpoint_path: str,
) -> int:
    """Continuous ingest INTO the ANN index layout: each micro-batch of
    vectors is assigned to its nearest existing centroid (pure-expression
    argmin, no Python) and appended to the cell-partitioned corpus — so
    rows become searchable at the next query with correct partition
    pruning, without any refit. This is the log-to-index pipeline the
    Milvus doc describes for its data nodes (doc/milvus介绍.md:27,47-52),
    as one Structured Streaming plan; offline `compact_ivf_index` refits
    when drift accumulates.

    Returns the number of vectors appended (exactly-once under restarts
    via the checkpoint, like stream_ingest_documents).
    """
    from ..index.ivf import assign_cells

    appended = {"n": 0}

    def sink_batch(batch: DataFrame, batch_id: int) -> None:
        assigned = batch.withColumn(
            "cell_id", assign_cells(index, F.col(index.vector_col))
        )
        assigned.write.partitionBy("cell_id").mode("append").parquet(index.path)
        appended["n"] += batch.count()

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .format("parquet")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir)
    )
    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return appended["n"]
