"""Training-sequence packing (north-star LLM-data operator).

Pre-training pipelines concatenate documents into a token stream and cut
it into fixed-budget sequences ("concat-and-chunk", the GPT-style
packing); what a pipeline needs from the engine is the deterministic
doc → pack assignment and per-pack stats. That is a pure window
computation:

    pack_id(doc) = floor(cumulative_tokens_before_doc / budget)

i.e. a document belongs to the pack in which its first token lands
(documents may straddle a boundary — the tail spills into the next
sequence, exactly like the real concat-and-chunk).

Scale shape: packing is inherently sequential *within* a stream, so the
stream is the unit of parallelism — the window partitions by
``stream_col`` (source/shard/date), one shuffle on the stream key, and
each stream packs independently executor-side. A global single stream
would serialize into one partition; real pipelines always pack per
shard, which is what this operator models.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    stream_col: str = "source",
) -> DataFrame:
    """Assign each document to its concat-and-chunk pack and aggregate
    per-pack stats: (stream, pack_id, n_docs, pack_tokens, first_doc).

    ``n_tokens`` is whitespace token count; order within a stream is
    ``id_col`` ascending (deterministic across engines and runs —
    packing must be reproducible for resumable training jobs).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = (
        Window.partitionBy(stream_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = (
        docs.withColumn("__n_tokens", n_tokens)
        .withColumn("__cum", F.sum("__n_tokens").over(w))
        .withColumn(
            "pack_id",
            F.floor((F.col("__cum") - F.col("__n_tokens")) / F.lit(budget)),
        )
    )
    return assigned.groupBy(F.col(stream_col).alias("stream"), "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__n_tokens").alias("pack_tokens"),
        F.min(id_col).alias("first_doc"),
    )
