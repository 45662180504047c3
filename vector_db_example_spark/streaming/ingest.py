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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..functions.embedding import hashing_embedder
from ..functions.text import clean_content
from ..sources.tables import append_repartition

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

    foreachBatch is at-least-once: a batch can be re-delivered after a
    partial or complete sink write. The sink is therefore idempotent per
    batch — each batch writes its own ``__batch_id=`` partition with
    dynamic partition overwrite, so a retry replaces that batch's rows
    instead of appending duplicates. The count is the sink's read-back
    delta for this run — it never re-evaluates the embed pipeline and
    never double-counts a retried batch."""
    embed = hashing_embedder(dim)

    def sink_count() -> int:
        try:
            return spark.read.parquet(sink_path).count()
        except AnalysisException:  # sink not created yet
            return 0

    pre = sink_count()

    def sink_batch(batch: DataFrame, batch_id: int) -> None:
        prepared = (
            batch.withColumn("text", clean_content(F.col("text")))
            .filter(F.length("text") >= min_len)
            .withColumn("embedding", embed(F.col("text")))
            .withColumn("__batch_id", F.lit(int(batch_id)))
        )
        (
            prepared.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(sink_path)
        )

    q = (
        read_documents_stream(spark, sf_dir)
        .writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink_count() - pre


def stream_ingest_embeddings_into_ivf(
    spark: SparkSession,
    sf_dir: str,
    index,
    checkpoint_path: str,
    where: Column | None = None,
) -> int:
    """Continuous ingest INTO the ANN index layout: each micro-batch of
    vectors is assigned to its nearest existing centroid (the build
    path's Arrow-batched BLAS argmin) and appended to the cell-partitioned
    corpus — so
    rows become searchable at the next query with correct partition
    pruning, without any refit. This is the log-to-index pipeline the
    Milvus doc describes for its data nodes (doc/milvus介绍.md:27,47-52),
    as one Structured Streaming plan; offline `compact_ivf_index` refits
    when drift accumulates.

    Returns the number of vectors appended. Delivery: foreachBatch is
    at-least-once, and this sink must keep the index's exact
    ``cell_id=``-partitioned layout (adding a batch partition column
    would leak into every search schema) — so instead of per-batch
    dynamic overwrite it skips batches whose commit marker already
    exists (written after the data lands). A re-delivered committed
    batch is a no-op; only a crash inside the write→marker window can
    duplicate rows, which the offline ``compact_ivf_index`` rebuild
    clears.

    Batch ids are scoped to a *checkpoint*, so markers are namespaced by
    a digest of the checkpoint path: a second ingest run with a fresh
    checkpoint (new source data) into the same index starts again at
    batch 0 and must NOT be swallowed by a stale marker from an earlier
    run.

    ``where`` is an optional row predicate on the stream (selective
    ingest — e.g. only the rows not already in the seed layout); it
    lands on the streaming source scan, where Catalyst pushes it down
    like any batch filter."""
    from .. import fsio
    from ..index.ivf import assign_cells

    # Markers go through fsio so the layout (and its commit state) can
    # live on any scheme; fsio.canonical_token is the one shared
    # namespace-token convention across all sinks.
    marker_dir = f"{index.path}/_committed_batches/{fsio.canonical_token(checkpoint_path)}"
    fsio.mkdirs(marker_dir)
    appended = {"n": 0}

    def sink_batch(batch: DataFrame, batch_id: int) -> None:
        marker = f"{marker_dir}/batch_{batch_id}"
        if fsio.exists(marker):
            return
        assigned = batch.withColumn(
            "cell_id", assign_cells(index, F.col(index.vector_col))
        ).localCheckpoint(eager=True)  # one evaluation for write AND count
        # One file per touched cell per micro-batch, full parallelism
        # above the collapse ceiling (the package-wide size-gated
        # append discipline — sources/tables.py).
        append_repartition(assigned, "cell_id").write.partitionBy(
            "cell_id"
        ).mode("append").parquet(index.path)
        n = assigned.count()
        fsio.write_text(marker, str(n))
        appended["n"] += n

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .format("parquet")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir)
    )
    if where is not None:
        stream = stream.filter(where)
    q = (
        stream.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return appended["n"]


def stream_ingest_documents_into_inverted(
    spark: SparkSession,
    sf_dir: str,
    index,
    checkpoint_path: str,
) -> int:
    """Continuous LEXICAL indexing: each micro-batch of documents appends
    its postings into the term-bucket layout, its lengths into doclens,
    and bumps the 1-row stats (index/inverted.append_to_inverted_index) —
    so new documents become BM25-searchable at the next query with
    correct bucket pruning and correct corpus statistics, no rebuild.
    Document frequencies are computed from postings at query time, so
    nothing stored goes stale as batches land.

    Delivery: at-least-once foreachBatch guarded by per-checkpoint commit
    markers (the IVF sink's recipe — a replayed committed batch is a
    no-op). A crash inside the append→marker window can replay an
    uncommitted batch, duplicating its posting/doclen rows and
    double-bumping stats; offline compact_inverted_index clears exactly
    that (max per (term, doc) / per doc over the byte-identical replayed
    rows, stats recomputed from the deduped doclens). Returns the number
    of documents indexed this run."""
    from .. import fsio
    from ..index.inverted import append_to_inverted_index

    marker_dir = f"{index.path}/_committed_batches/{fsio.canonical_token(checkpoint_path)}"
    fsio.mkdirs(marker_dir)
    indexed = {"n": 0}

    def sink_batch(batch: DataFrame, batch_id: int) -> None:
        marker = f"{marker_dir}/batch_{batch_id}"
        if fsio.exists(marker):
            return
        n = batch.count()
        if n:
            append_to_inverted_index(index, batch)
        indexed["n"] += n
        fsio.touch(marker)

    q = (
        read_documents_stream(spark, sf_dir)
        .writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return indexed["n"]


def stream_count_min_maintenance(
    spark: SparkSession,
    docs_stream: DataFrame,
    sketch_path: str,
    checkpoint_path: str,
    depth: int = 4,
    width: int = 16,
    text_col: str = "text",
) -> None:
    """Maintain a count-min sketch continuously: each micro-batch's
    token occurrences collapse to (at most) a depth×width partial
    counter block, written idempotently under the batch id (replays
    overwrite their own directory, never double-count); the served
    sketch is the partition-discovered sum (``read_count_min``). This is
    the mergeability property of the sketch doing the streaming work —
    no stateful operator, no state store, exact results
    (operators/sketch.py for the matrix construction)."""
    from ..functions.text import extract_tokens
    from ..operators.sketch import count_min_sketch

    def sink(batch: DataFrame, batch_id: int) -> None:
        tok = batch.select(F.explode(extract_tokens(F.col(text_col))).alias("t"))
        part = count_min_sketch(tok, depth=depth, width=width)
        part.write.mode("overwrite").parquet(f"{sketch_path}/batch={batch_id}")

    q = (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_count_min(spark: SparkSession, sketch_path: str) -> DataFrame:
    """The served sketch: sum of every batch's partial counters."""
    return (
        spark.read.parquet(sketch_path)
        .groupBy("d", "bucket")
        .agg(F.sum("c").alias("c"))
    )
