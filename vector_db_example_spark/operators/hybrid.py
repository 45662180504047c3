"""Hybrid-search rank fusion (north-star extension).

The reference fuses its vector/keyword/chunk strategies by raw score +
first-occurrence dedup (operators/multi_strategy.py mirrors that
exactly). Modern vector DBs — including Milvus 2.4+, the engine behind
the reference — also ship **Reciprocal Rank Fusion**: combine rankings
from incomparable scorers (L2 distance vs token overlap) by rank alone,

    rrf(id) = Σ_lists 1 / (k + rank_list(id)),   k = 60 by default.

Scale shape: each ranking is a per-list top-N (TakeOrderedAndProject or
rank-window — never a global sort), the fusion is a full-outer join on
id of N-row inputs plus one more top-k. Nothing here touches the corpus
a second time."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_RRF_K = 60


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "id",
    k: int = DEFAULT_RRF_K,
    top_k: int = 10,
) -> DataFrame:
    """Fuse named rankings (each: ``id_col`` + ``rank``, rank starting
    at 1) into (id, <name>_rank…, rrf_score), best-first, top_k rows.
    An id missing from a list simply contributes nothing for it."""
    sides = [
        df.select(F.col(id_col), F.col("rank").alias(f"{name}_rank"))
        for name, df in rankings.items()
    ]
    joined = reduce(lambda a, b: a.join(b, id_col, "full_outer"), sides)
    contribs = [
        F.when(
            F.col(f"{name}_rank").isNotNull(),
            F.lit(1.0) / (F.lit(k) + F.col(f"{name}_rank")),
        ).otherwise(F.lit(0.0))
        for name in rankings
    ]
    score = reduce(lambda a, b: a + b, contribs)
    return (
        joined.withColumn("rrf_score", score)
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(top_k)
    )
