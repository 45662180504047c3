"""Okapi BM25 full-text ranking over a document corpus.

Extension beyond the reference surface (the reference delegates lexical
relevance to its vector store's full-text search; the keyword-priority
ranking it does implement — ``/root/reference/src/app.py`` multi-strategy
search — is covered by ``operators/multi_strategy.py``). This is the
engine-side analog: score documents against a small bag of query terms
with BM25 and return the global top-k.

Scale shape (the part that must survive 100 TB):

- ONE corpus scan feeds everything: per-doc term frequencies for the
  query terms (shuffle keyed on ``doc_id``), per-doc token length
  (map-side ``size()``, no explode), and the corpus-level statistics
  (N, total token count, per-term document frequencies) as partial+final
  aggregations that reduce to a SINGLE broadcast row — no join on the
  term dimension at all.
- Docs containing none of the query terms are filtered *before* the
  ``groupBy`` (predicate on the exploded term), so the shuffled volume is
  proportional to the posting lists of the query terms, not the corpus.
- The final top-k is ``orderBy().limit()`` → TakeOrderedAndProject:
  per-partition heaps + a k-row driver merge, never a global sort.

Bit-exactness discipline (required for the DuckDB value-hash oracle):
every floating-point input is integer-exact (term counts, doc lengths,
document frequencies, N), and the per-document score is a FIXED-ORDER
sum of per-term contributions (explicit ``c1 + c2 + ... + cn`` columns,
never an ``agg(sum(...))`` over doubles whose partition order could vary).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.text import extract_tokens

#: Okapi defaults (Robertson et al.; also Lucene's and Milvus 2.5's
#: full-text-search defaults).
K1 = 1.2
B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, bm25)`` for every document containing ≥1 query term,
    with the UNROUNDED double score (callers round at their output edge).

    IDF uses the Lucene form ``ln(1 + (N - df + 0.5) / (df + 0.5))``
    (always positive, unlike the raw Robertson IDF).
    """
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")

    tok = docs.select(
        id_col, F.explode(extract_tokens(F.col(text_col))).alias("term")
    )
    tokq = tok.filter(F.col("term").isin(terms))

    # Per-doc tf for each query term, pivoted into fixed columns so the
    # score sum below has one deterministic order.
    tf = tokq.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0))
            .cast("double")
            .alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ]
    )

    # Per-term document frequencies in ONE 1-row aggregate over the
    # (already term-filtered) posting rows — count_distinct over a when()
    # counts distinct non-null doc ids.
    dfs = tokq.groupBy().agg(
        *[
            F.count_distinct(F.when(F.col("term") == t, F.col(id_col)))
            .cast("double")
            .alias(f"__df{i}")
            for i, t in enumerate(terms)
        ]
    )
    # N and total token count come from the un-exploded side (a doc with
    # zero tokens must still count toward both). Integer sums stay exact;
    # the double casts happen once at the end.
    dl = docs.select(
        F.col(id_col), F.size(extract_tokens(F.col(text_col))).alias("__dl")
    )
    totals = docs.select(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(F.size(extract_tokens(F.col(text_col)))).cast("double").alias("__tot"),
    )

    scored = (
        tf.join(dl, id_col)
        .crossJoin(F.broadcast(dfs))
        .crossJoin(F.broadcast(totals))
    )

    return scored.select(F.col(id_col), bm25_score_expr(len(terms)).alias("bm25"))


def bm25_score_expr(n_terms: int):
    """The BM25 score Column over the pivoted inputs ``__tf{i}``,
    ``__df{i}`` (doubles of exact integers), ``__dl`` (int token count),
    ``__n``/``__tot`` (double corpus stats) — shared by the scan-based
    scorer above and the inverted-index scorer (index/inverted.py) so
    both engines and both access paths produce bit-identical doubles."""
    return bm25_score_expr_for(
        [f"__tf{i}" for i in range(n_terms)],
        [f"__df{i}" for i in range(n_terms)],
    )


def bm25_score_expr_for(tf_cols: Sequence[str], df_cols: Sequence[str]):
    """BM25 score from explicitly-named tf/df column pairs (the batched
    scorer pivots MANY queries' terms side by side, so names can't be
    positional). Literal constants appear in the SAME literal form as in
    the oracle SQL (2.2 not K1+1.0, 0.25 not 1-B) so both engines round
    the same decimal text to the same double; the per-term contributions
    sum in one fixed left-to-right order."""
    dl_d = F.col("__dl").cast("double")
    avgdl = F.col("__tot") / F.col("__n")
    contribs = []
    for tf_c, df_c in zip(tf_cols, df_cols):
        tf_i, df_i = F.col(tf_c), F.col(df_c)
        idf = F.log(
            F.lit(1.0) + (F.col("__n") - df_i + F.lit(0.5)) / (df_i + F.lit(0.5))
        )
        tfn = (tf_i * F.lit(2.2)) / (
            tf_i + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * dl_d / avgdl)
        )
        contribs.append(idf * tfn)
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    return score


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score against ``query_terms``:
    ``(id_col, bm25)`` rounded to 6 places, ordered by score desc then id
    asc (deterministic tiebreak so the LIMIT is stable across engines and
    partitionings)."""
    return (
        bm25_scores(docs, query_terms, id_col=id_col, text_col=text_col)
        .select(F.col(id_col), F.round(F.col("bm25"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )
