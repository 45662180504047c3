"""Multi-strategy retrieval (SURVEY.md M5) — the reference's flagship
pipeline (multi_strategy_search, /root/reference/src/app.py:276-303)
re-expressed as ONE DataFrame DAG instead of a Python loop of searches:

  questions ──fan-out──► strategy queries (vector / keyword / chunk)
             ──embed───► query vectors (one UDF pass over ≤6 rows/question)
             ──J2──────► batched per-query top-k against the corpus
             ──U1/U2───► union + first-occurrence dedup on content[:50]
             ──W1──────► per-question score top-k

Reference constants preserved (SURVEY.md §2.6): vector top-(2·top_k),
keywords ≤3 × top-2 (fixed), chunks ≤2 × top-1 (fixed, only when
len(question) > 20), score threshold 0.3, final top-``top_k``. Strategy priority for dedup order:
vector < keyword < chunk (first occurrence wins, src/app.py:289-299).

Scale shape: N questions fan out to ≤6N query rows — always broadcastable;
the corpus is scanned once regardless of N (the win over the reference's
sequential per-strategy searches)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    CHUNK_SPLIT_PATTERN,
    STOPWORDS,
    TOKEN_PATTERN,
)
from .knn import knn_batch

#: array_sort comparator: length desc, lexicographic asc tiebreak
#: (reference sorts keywords by length desc, src/app.py:339).
_LEN_DESC_SORT = (
    "array_sort({arr}, (l, r) -> CASE WHEN length(l) > length(r) THEN -1 "
    "WHEN length(l) < length(r) THEN 1 "
    "WHEN l < r THEN -1 WHEN l > r THEN 1 ELSE 0 END)"
)


def build_strategy_queries(
    questions: DataFrame, question_col: str = "question", top_k: int = 5
) -> DataFrame:
    """Fan a questions DataFrame out into per-strategy query rows:
    (question_id, strategy, priority, qtext, k). Pure expressions.

    Per-strategy fetch sizes follow the reference exactly: the vector
    strategy fetches ``top_k * 2`` (src/app.py:279), while keyword and
    chunk sub-searches use FIXED k=2 / k=1 regardless of the caller's
    top_k (src/app.py:313-315, 326-328) — so only the vector k scales.

    P3 (reference src/app.py:242-243, 363-364): empty / whitespace-only
    questions are dropped here, so they fan out to zero query rows and
    contribute zero hits — the engine-native form of "return []"."""
    q = F.col(question_col)
    questions = questions.filter(F.length(F.trim(q)) > 0)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])

    vector = questions.select(
        "question_id",
        F.lit("vector").alias("strategy"),
        F.lit(0).alias("priority"),
        q.alias("qtext"),
        F.lit(top_k * 2).alias("k"),
    )

    tokens = F.array_distinct(
        F.filter(
            F.regexp_extract_all(q, F.lit(TOKEN_PATTERN), 0),
            lambda t: ~F.array_contains(stop_arr, t),
        )
    )
    top_keywords = F.slice(
        F.expr(_LEN_DESC_SORT.format(arr="__toks")), 1, 3
    )
    keyword = (
        questions.withColumn("__toks", tokens)
        .select(
            "question_id",
            F.explode(top_keywords).alias("qtext"),
        )
        .select(
            "question_id",
            F.lit("keyword").alias("strategy"),
            F.lit(1).alias("priority"),
            "qtext",
            F.lit(2).alias("k"),
        )
    )

    chunks = F.slice(
        F.filter(
            F.transform(F.split(q, CHUNK_SPLIT_PATTERN), lambda c: F.trim(c)),
            lambda c: F.length(c) > 5,
        ),
        1,
        2,
    )
    chunk = (
        questions.filter(F.length(q) > 20)
        .select("question_id", F.explode(chunks).alias("qtext"))
        .select(
            "question_id",
            F.lit("chunk").alias("strategy"),
            F.lit(2).alias("priority"),
            "qtext",
            F.lit(1).alias("k"),
        )
    )
    return vector.unionByName(keyword).unionByName(chunk)


def multi_strategy_search(
    corpus: DataFrame,
    questions: DataFrame,
    embedder: Column,
    top_k: int = 5,
    score_threshold: float = 0.3,
    vector_col: str = "vector",
    id_col: str = "id",
    question_col: str = "question",
) -> DataFrame:
    """Full multi-strategy retrieval for N questions in one DAG.

    ``embedder`` is a Column expression mapping column ``qtext`` to an
    array<float> query vector (e.g. ``hashing_embedder(dim)(F.col("qtext"))``).
    Returns (question_id, strategy, id, chapter, content, score) with at
    most ``top_k`` rows per question, score-descending.
    """
    squeries = build_strategy_queries(questions, question_col, top_k=top_k)
    w_dedup_order = [F.col("priority").asc(), F.col("score").desc(), F.col(id_col).asc()]

    embedded = (
        squeries.withColumn("query_vec", embedder)
        # Deterministic query key (NOT monotonically_increasing_id, which
        # could differ between the two evaluations of this subplan).
        .withColumn(
            "sq_id", F.concat_ws("|", "question_id", "strategy", "qtext")
        )
        .select("sq_id", "question_id", "strategy", "priority", "k", "query_vec")
    )
    # The per-strategy metadata (question_id, priority, per-row k) rides
    # through knn_batch's query broadcast, so no second join / second
    # broadcast of the query table is needed downstream.
    hits = knn_batch(
        corpus,
        embedded,
        k=max(top_k * 2, 2),  # max per-strategy k; per-row k filter below
        vector_col=vector_col,
        query_vector_col="query_vec",
        query_id_col="sq_id",
        score_threshold=score_threshold,
        id_col=id_col,
    ).filter(F.col("rank") <= F.col("k"))

    # U2: first-occurrence dedup on content[:50] within each question,
    # occurrence order = strategy priority then score (src/app.py:291-299).
    dedup_w = Window.partitionBy(
        "question_id", F.substring("content", 1, 50)
    ).orderBy(*w_dedup_order)
    deduped = (
        hits.withColumn("__occ", F.row_number().over(dedup_w))
        .filter(F.col("__occ") == 1)
        .drop("__occ")
    )

    # W1: final per-question top-k by score.
    final_w = Window.partitionBy("question_id").orderBy(
        F.col("score").desc(), F.col("priority").asc(), F.col(id_col).asc()
    )
    return (
        deduped.withColumn("__rk", F.row_number().over(final_w))
        .filter(F.col("__rk") <= top_k)
        .select(
            "question_id", "strategy", id_col, "chapter", "content",
            F.col("score"),
        )
    )
