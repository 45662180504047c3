"""ColBERT-style late-interaction retrieval (MaxSim) over chunked docs.

Extension beyond the reference surface: where single-vector search
compresses a document to one embedding, late interaction keeps one
vector per chunk and scores

    maxsim(q, d) = Σ_i  max_j  ⟨q_i, d_j⟩

(each query vector keeps its best-matching document chunk; the sum runs
over the query's vectors). Here chunks are the repo's 16-token windows
and vectors come from the deterministic hashing embedder, which is what
makes the score SQL-oracle-able end to end — the real-model analog swaps
the embedder UDF and nothing else.

Scale shape: the chunk embeddings are corpus-sized but NEVER shuffled on
the pair dimension — the query side is a tiny broadcast (one row per
query vector), the per-pair dot is map-side, and the only shuffle is the
groupBy(doc_id) that reduces each doc to its per-query-vector maxima
(pivoted into fixed columns, so the final sum has one deterministic
order; `max` itself is fold-order-free). Top-k is TakeOrderedAndProject.
In production the chunk-embedding stage is materialized once as a layout
(like `embeddings`), not recomputed per query; it is inlined here so the
driver query is self-contained.

Float discipline: dots are double folds over float32 components in index
order (functions/vector.dot_product ≡ the oracle's list_transform/
list_sum), maxima are order-free, and the per-query contributions sum
left-to-right.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.embedding import hash_embed_one, hashing_embedder
from ..functions.text import token_windows
from ..functions.vector import dot_product


def _dot_pairs_arrow(phrases: Sequence[str], dim: int, id_col: str):
    """Arrow kernel emitting (id, qi, dot) for every (chunk, phrase)
    pair — the dot is a left-to-right double fold over dimensions, one
    vectorized op per dim, BIT-IDENTICAL to the ``dot_product``
    expression's zip_with/aggregate fold (the knn_batch kernel rule,
    SCALING.md round 4: a correctly-bound higher-order expression is
    still an interpreter loop in the rows×queries hot path)."""
    import numpy as np
    import pandas as pd

    Q = np.ascontiguousarray(
        [hash_embed_one(p, dim) for p in phrases], dtype=np.float64
    )
    nq = Q.shape[0]

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["wv"]])
            acc = np.zeros((X.shape[0], nq))
            for j in range(dim):
                acc += X[:, j][:, None] * Q[:, j][None, :]
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    id_col: ids.repeat(nq),
                    "qi": np.tile(np.arange(nq, dtype=np.int32), len(ids)),
                    "dot": acc.ravel(),
                }
            )

    return gen


def _maxsim_tail(dots: DataFrame, n_phrases: int, k: int, id_col: str) -> DataFrame:
    """Shared reduction: per-doc per-phrase maxima (pivoted into fixed
    columns — max is fold-order-free), left-to-right phrase sum,
    round 6, TakeOrdered top-k."""
    per_q = dots.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("qi") == i, F.col("dot"))).alias(f"__m{i}")
            for i in range(n_phrases)
        ]
    )
    score = F.col("__m0")
    for i in range(1, n_phrases):
        score = score + F.col(f"__m{i}")
    return (
        per_q.select(F.col(id_col), F.round(score, 6).alias("maxsim"))
        .orderBy(F.col("maxsim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _dots(
    wvec: DataFrame,
    phrases: list[str],
    dim: int,
    id_col: str,
    impl: str,
) -> DataFrame:
    """(id, qi, dot) pairs from a (id, wv) chunk-vector frame — Arrow
    kernel by default, pure-expression crossJoin form for plan parity."""
    if impl == "arrow":
        return wvec.select(id_col, "wv").mapInPandas(
            _dot_pairs_arrow(phrases, dim, id_col),
            f"{id_col} long, qi int, dot double",
        )
    if impl == "expr":
        spark = wvec.sparkSession
        qdf = spark.createDataFrame(
            [(i, hash_embed_one(p, dim)) for i, p in enumerate(phrases)],
            "qi int, qv array<float>",
        )
        return wvec.crossJoin(F.broadcast(qdf)).select(
            id_col, "qi", dot_product("wv", "qv").alias("dot")
        )
    raise ValueError(f"unknown impl {impl!r}")


def maxsim_topk(
    docs: DataFrame,
    query_phrases: Sequence[str],
    k: int = 10,
    dim: int = 64,
    window: int = 16,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "arrow",
) -> DataFrame:
    """Top-``k`` docs by MaxSim against ``query_phrases`` (one embedded
    vector per phrase). Returns (id_col, maxsim) rounded to 6, score
    desc / id asc. ``impl="arrow"`` (default) computes the chunk×phrase
    dots in the Arrow kernel — bit-identical fold, so the SQL oracle
    stays hash-exact; ``impl="expr"`` keeps the broadcast-crossJoin
    expression form."""
    phrases = list(query_phrases)
    if not phrases:
        raise ValueError("query_phrases must be non-empty")
    embed = hashing_embedder(dim)

    wins = docs.select(
        id_col,
        F.posexplode(token_windows(F.col(text_col), window)).alias(
            "win_idx", "wtext"
        ),
    )
    wvec = wins.withColumn("wv", embed(F.col("wtext")))
    dots = _dots(wvec, phrases, dim, id_col, impl)
    return _maxsim_tail(dots, len(phrases), k, id_col)


def build_chunk_embedding_layout(
    docs: DataFrame,
    path: str,
    dim: int = 64,
    window: int = 16,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Materialize the per-chunk embeddings once (the production shape:
    embed at ingest, score many queries from the layout — the
    multi-vector-per-entity collection a late-interaction deployment
    stores). One corpus pass: window → embed → write."""
    embed = hashing_embedder(dim)
    (
        docs.select(
            id_col,
            F.posexplode(token_windows(F.col(text_col), window)).alias(
                "win_idx", "wtext"
            ),
        )
        .withColumn("wv", embed(F.col("wtext")))
        .drop("wtext")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def maxsim_topk_from_layout(
    layout_path: str,
    spark,
    query_phrases: Sequence[str],
    k: int = 10,
    dim: int = 64,
    *,
    id_col: str = "doc_id",
    impl: str = "arrow",
) -> DataFrame:
    """MaxSim against a materialized chunk-embedding layout: identical
    scores to `maxsim_topk` with zero per-query embedding work — the
    scan reads (id, win_idx, wv) only. Same ``impl`` contract as
    ``maxsim_topk`` (Arrow kernel default, bit-identical dot fold)."""
    phrases = list(query_phrases)
    if not phrases:
        raise ValueError("query_phrases must be non-empty")
    wvec = spark.read.parquet(layout_path)
    dots = _dots(wvec, phrases, dim, id_col, impl)
    return _maxsim_tail(dots, len(phrases), k, id_col)
