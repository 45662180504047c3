"""IVF index query inventory (M4). The nprobe=nlist run is *provably
exact* (IVF_FLAT identity), so it carries a full DuckDB oracle; the
pruned-probe and bucketed-pairs runs are approximate by design and carry
the rows-only check (SURVEY.md §5.2)."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..index.ivf import (
    IVFIndex,
    build_ivf_index,
    ivf_bucketed_pairs,
    ivf_search,
    ivf_search_batch,
)
from ..sources.tables import load_table
from .registry import register
from .vector_q import _dot_sql, _l2_sql, _query_vec, _query_vecs

#: One index build per (sf_dir, nlist) per process — queries share it.
_INDEX_CACHE: dict[tuple[str, int], IVFIndex] = {}

#: Same, for the bucket-partitioned LSH layout.
_LSH_CACHE: dict[tuple[str, int], "LSHIndex"] = {}

#: Same, for the IVF_PQ stored-codes layout: (IVFIndex, codebook).
_IVFPQ_CACHE: dict[tuple[str, int], tuple] = {}


def get_ivf_index(
    spark: SparkSession, sf_dir: str, nlist: int = 16
) -> IVFIndex:
    key = (sf_dir, nlist)
    if key not in _INDEX_CACHE:
        tag = hashlib.md5(f"{sf_dir}|{nlist}".encode()).hexdigest()[:8]
        emb = load_table(spark, sf_dir, "embeddings")
        _INDEX_CACHE[key] = build_ivf_index(
            emb, path=f"/tmp/spark_graft_ivf_{tag}", nlist=nlist
        )
    return _INDEX_CACHE[key]


@register(
    "vector_ivf_exact_parity",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11),
d AS (
  SELECT e.vec_id, e.label, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, label, round(dist, 6) AS distance
FROM d ORDER BY dist, vec_id LIMIT 10
""",
    tags=("vector", "ivf", "index"),
)
def vector_ivf_exact_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF_FLAT invariant: nprobe = nlist scans every cell ⇒ results are
    identical to exact brute force — which the DuckDB oracle states
    directly. This pins the index layout's correctness."""
    index = get_ivf_index(spark, sf_dir, nlist=16)
    hits = ivf_search(
        spark, index, _query_vec(spark, sf_dir, 11), k=10, nprobe=16
    )
    return hits.select(
        "vec_id", "label", F.round("distance", 6).alias("distance")
    )


@register(
    "vector_ivf_probe_topk",
    oracle=None,  # approximate by design (nprobe < nlist)
    tags=("vector", "ivf", "index"),
    bench=True,
)
def vector_ivf_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production IVF shape: nprobe=4 of nlist=16 cells — a 4×
    scan-fraction reduction with recall measured in tests/test_ivf.py."""
    index = get_ivf_index(spark, sf_dir, nlist=16)
    hits = ivf_search(
        spark, index, _query_vec(spark, sf_dir, 11), k=10, nprobe=4
    )
    return hits.select(
        "vec_id", "label", F.round("distance", 6).alias("distance")
    )


@register(
    "vector_ivf_batch_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN (3, 11, 23)
),
d AS (
  SELECT q.query_id, e.vec_id, {_l2_sql('e.embedding', 'q.qv')} AS dist,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY {_l2_sql('e.embedding', 'q.qv')}, e.vec_id) AS rank
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, round(dist, 6) AS distance, rank::INTEGER AS rank
FROM d WHERE rank <= 5
""",
    tags=("vector", "ivf", "index", "batch"),
    bench=True,
)
def vector_ivf_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched IVF search, nprobe=nlist (exact identity): three queries
    share ONE pruned scan feeding the Arrow distance kernel (probe map
    and query matrix in the UDF closure; dimension-ordered fold, so the
    doubles match the SQL bit-for-bit), then a per-query rank window —
    the amortized production shape. With nprobe=nlist it must equal the
    brute-force per-query top-k, which the oracle states."""
    index = get_ivf_index(spark, sf_dir, nlist=16)
    qids = (3, 11, 23)
    vecs = _query_vecs(spark, sf_dir, qids)  # one collect, not three
    queries = [(qid, vecs[qid]) for qid in qids]
    hits = ivf_search_batch(spark, index, queries, k=5, nprobe=16)
    return hits.select(
        "query_id",
        "vec_id",
        F.round("distance", 6).alias("distance"),
        "rank",
    )


def get_lsh_layout(
    spark: SparkSession, sf_dir: str, n_planes: int = 8
) -> "LSHIndex":
    from ..index.lsh import build_lsh_layout
    from .vector_q import DIM

    key = (sf_dir, n_planes)
    if key not in _LSH_CACHE:
        tag = hashlib.md5(f"{sf_dir}|lsh{n_planes}".encode()).hexdigest()[:8]
        emb = load_table(spark, sf_dir, "embeddings")
        _LSH_CACHE[key] = build_lsh_layout(
            emb, path=f"/tmp/spark_graft_lsh_{tag}", dim=DIM, n_planes=n_planes
        )
    return _LSH_CACHE[key]


@register(
    "vector_ann_lsh_topk",
    oracle=None,  # approximate by design (bucket pruning)
    tags=("vector", "lsh", "ann", "index"),
)
def vector_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN (cosine) against the bucket-PARTITIONED
    layout: the driver-side multiprobe list prunes Parquet partitions
    (unprobed buckets are never opened — plan-pinned in
    tests/test_plans.py), exact rerank within. Recall vs the exact
    cosine baseline is pinned in tests/test_lsh.py."""
    from ..index.lsh import lsh_layout_search

    index = get_lsh_layout(spark, sf_dir, n_planes=8)
    hits = lsh_layout_search(
        spark, index, _query_vec(spark, sf_dir, 7), k=10, probe_radius=3
    )
    return hits.select(
        "vec_id", "label", F.round("distance", 6).alias("distance")
    )


@register(
    "vector_ivf_bucketed_pairs",
    oracle=None,  # candidate set depends on the learned clustering
    tags=("vector", "ivf", "dedup"),
)
def vector_ivf_bucketed_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for embedding near-dup: per-cell pair generation +
    exact L2 verify (no global O(n²))."""
    index = get_ivf_index(spark, sf_dir, nlist=16)
    pairs = ivf_bucketed_pairs(spark, index, max_distance=1.25)
    return pairs.select(
        "a_id", "b_id", F.round("distance", 6).alias("distance")
    )


@register(
    "vector_sq8_rerank_topk",
    # Full closed-form oracle: per-dim min/max -> scales -> floor codes ->
    # midpoint-dequantized approximate distance -> approx top-30 ->
    # exact rerank top-10. floor (not round) keeps the code assignment
    # engine-portable; multiplication (not pow) matches Spark's fold.
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
dims AS (
  SELECT i.i AS d,
         min(e.embedding[i.i]::DOUBLE) AS mn,
         max(e.embedding[i.i]::DOUBLE) AS mx
  FROM embeddings e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
  GROUP BY 1
),
params AS (
  SELECT list(mn ORDER BY d) AS mins,
         list(greatest((mx - mn) / 256.0, 1e-12) ORDER BY d) AS scs
  FROM dims
),
coded AS (
  SELECT e.vec_id, e.embedding,
         list_transform(range(1, 65),
           i -> greatest(0, least(255,
                  floor((e.embedding[i]::DOUBLE - p.mins[i]) / p.scs[i])::BIGINT)))
           AS codes
  FROM embeddings e CROSS JOIN params p
),
approx AS (
  SELECT c.vec_id, c.embedding,
         sqrt(list_sum(list_transform(range(1, 65),
           i -> (q.qv[i]::DOUBLE - (p.mins[i] + (c.codes[i] + 0.5) * p.scs[i]))
              * (q.qv[i]::DOUBLE - (p.mins[i] + (c.codes[i] + 0.5) * p.scs[i])))))
           AS ad
  FROM coded c CROSS JOIN params p CROSS JOIN q
),
cand AS (SELECT * FROM approx ORDER BY ad, vec_id LIMIT 30)
SELECT cand.vec_id,
       round({_l2_sql('cand.embedding', 'q.qv')}, 6) AS distance
FROM cand CROSS JOIN q
ORDER BY {_l2_sql('cand.embedding', 'q.qv')}, cand.vec_id
LIMIT 10
""",
    tags=("vector", "index", "sq8", "quantization"),
)
def vector_sq8_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized search (the IVF_SQ8 family): 8-bit per-dim
    affine codes (4x memory/IO), approximate top-30 on dequantized codes
    map-side, exact rerank to top-10 — deterministic end to end, so the
    whole quantize/search path is hash-checked, not just recall-bounded."""
    from ..index.sq8 import sq8_search

    emb = load_table(spark, sf_dir, "embeddings")
    out = sq8_search(emb, _query_vec(spark, sf_dir, 7), k=10, overfetch=3)
    return out.select("vec_id", F.round("distance", 6).alias("distance"))


_PQ_SAMPLE_SQL = ", ".join(str(7 + 15 * k) for k in range(32))


@register(
    "vector_pq_adc_topk",
    # Full closed-form oracle for product quantization: the codebook is a
    # deterministic corpus sample (k-means init without the Lloyd step —
    # iterative means are not bit-reproducible across engines), so encode
    # (per-subspace argmin, ties -> smallest code via the rn window), ADC
    # distance (query vs per-subspace codeword patchwork, fixed 64-fold
    # add order) and the exact rerank all hash-match.
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11),
cb AS (
  SELECT list(embedding ORDER BY vec_id) AS cws
  FROM embeddings WHERE vec_id IN ({_PQ_SAMPLE_SQL})
),
dists AS (
  SELECT e.vec_id, j.j, k.k,
         list_sum(list_transform(range(1, 9), d ->
           (e.embedding[j.j*8+d]::DOUBLE - cb.cws[k.k+1][j.j*8+d]::DOUBLE)
         * (e.embedding[j.j*8+d]::DOUBLE - cb.cws[k.k+1][j.j*8+d]::DOUBLE)))
           AS dist
  FROM embeddings e CROSS JOIN cb
  CROSS JOIN (SELECT unnest(range(0, 8)) AS j) j
  CROSS JOIN (SELECT unnest(range(0, 32)) AS k) k
),
codes AS (
  SELECT vec_id, list(code ORDER BY j) AS codes FROM (
    SELECT vec_id, j, k AS code,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, k) AS rn
    FROM dists) WHERE rn = 1 GROUP BY vec_id
),
approx AS (
  SELECT c.vec_id, e.embedding,
         sqrt(list_sum(list_transform(range(1, 65), i ->
           (q.qv[i]::DOUBLE - cb.cws[c.codes[((i-1)//8)+1]+1][i]::DOUBLE)
         * (q.qv[i]::DOUBLE - cb.cws[c.codes[((i-1)//8)+1]+1][i]::DOUBLE))))
           AS ad
  FROM codes c JOIN embeddings e USING (vec_id) CROSS JOIN cb CROSS JOIN q
),
cand AS (SELECT * FROM approx ORDER BY ad, vec_id LIMIT 50)
SELECT cand.vec_id,
       round({_l2_sql('cand.embedding', 'q.qv')}, 6) AS distance
FROM cand CROSS JOIN q
ORDER BY {_l2_sql('cand.embedding', 'q.qv')}, cand.vec_id
LIMIT 10
""",
    tags=("vector", "index", "pq", "quantization"),
)
def vector_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized search (the IVF_PQ family): m=8 subspace codes
    of ksub=32 (32x compression vs float32), asymmetric-distance
    approximate top-50 map-side, exact rerank to top-10 — the entire
    encode/ADC/rerank path is hash-checked against DuckDB, not just
    recall-bounded."""
    from ..index.pq import pq_search

    emb = load_table(spark, sf_dir, "embeddings")
    out = pq_search(emb, _query_vec(spark, sf_dir, 11), k=10, overfetch=5)
    return out.select("vec_id", F.round("distance", 6).alias("distance"))


def get_ivf_pq_index(spark: SparkSession, sf_dir: str, nlist: int = 16):
    from ..index.pq import build_ivf_pq_index

    key = (sf_dir, nlist)
    if key not in _IVFPQ_CACHE:
        tag = hashlib.md5(f"{sf_dir}|ivfpq{nlist}".encode()).hexdigest()[:8]
        emb = load_table(spark, sf_dir, "embeddings")
        _IVFPQ_CACHE[key] = build_ivf_pq_index(
            emb, path=f"/tmp/spark_graft_ivfpq_{tag}", nlist=nlist
        )
    return _IVFPQ_CACHE[key]


@register(
    "vector_ivf_pq_topk",
    # End-to-end IVF_PQ against the STORED-CODES layout at nprobe=nlist:
    # every cell is probed, so the candidate set is the global ADC top-50
    # over the persisted pq_codes column and the whole build->store->
    # scan->ADC->rerank path is hash-exact (deterministic sampled
    # codebook, same closed form as vector_pq_adc_topk; qid 23 here).
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 23),
cb AS (
  SELECT list(embedding ORDER BY vec_id) AS cws
  FROM embeddings WHERE vec_id IN ({_PQ_SAMPLE_SQL})
),
dists AS (
  SELECT e.vec_id, j.j, k.k,
         list_sum(list_transform(range(1, 9), d ->
           (e.embedding[j.j*8+d]::DOUBLE - cb.cws[k.k+1][j.j*8+d]::DOUBLE)
         * (e.embedding[j.j*8+d]::DOUBLE - cb.cws[k.k+1][j.j*8+d]::DOUBLE)))
           AS dist
  FROM embeddings e CROSS JOIN cb
  CROSS JOIN (SELECT unnest(range(0, 8)) AS j) j
  CROSS JOIN (SELECT unnest(range(0, 32)) AS k) k
),
codes AS (
  SELECT vec_id, list(code ORDER BY j) AS codes FROM (
    SELECT vec_id, j, k AS code,
           row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, k) AS rn
    FROM dists) WHERE rn = 1 GROUP BY vec_id
),
approx AS (
  SELECT c.vec_id, e.embedding,
         sqrt(list_sum(list_transform(range(1, 65), i ->
           (q.qv[i]::DOUBLE - cb.cws[c.codes[((i-1)//8)+1]+1][i]::DOUBLE)
         * (q.qv[i]::DOUBLE - cb.cws[c.codes[((i-1)//8)+1]+1][i]::DOUBLE))))
           AS ad
  FROM codes c JOIN embeddings e USING (vec_id) CROSS JOIN cb CROSS JOIN q
),
cand AS (SELECT * FROM approx ORDER BY ad, vec_id LIMIT 50)
SELECT cand.vec_id,
       round({_l2_sql('cand.embedding', 'q.qv')}, 6) AS distance
FROM cand CROSS JOIN q
ORDER BY {_l2_sql('cand.embedding', 'q.qv')}, cand.vec_id
LIMIT 10
""",
    tags=("vector", "index", "ivf", "pq", "quantization"),
)
def vector_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF_PQ end to end on the persisted layout (Milvus
    ``index_type="IVF_PQ"``): codes stored as a column of the
    cell-partitioned corpus at build time; search scans ONLY
    (cell_id, vec_id, pq_codes) for the ADC stage (partition + column
    pruning — plan-pinned in tests) and touches float vectors for just
    the 50 rerank candidates. nprobe=nlist makes it exact-probe and
    hash-checkable."""
    from ..index.pq import ivf_pq_search

    index, codebook = get_ivf_pq_index(spark, sf_dir, nlist=16)
    out = ivf_pq_search(
        spark,
        index,
        codebook,
        _query_vec(spark, sf_dir, 23),
        k=10,
        nprobe=16,
        overfetch=5,
    )
    return out.select("vec_id", F.round("distance", 6).alias("distance"))


@register(
    "vector_bq_hamming_topk",
    # Closed-form oracle for binary quantization: sign-bit packing into
    # 32-bit words and XOR/popcount Hamming are exact integer math, so
    # there is no fold-order subtlety anywhere — codes, Hamming
    # distances, and the exact rerank all hash-match by construction.
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 13),
qc AS (
  SELECT list_transform(range(0, 2), w ->
           list_sum(list_transform(range(1, 33), b ->
             CASE WHEN q.qv[w*32 + b] > 0
                  THEN (2::BIGINT ^ (b - 1))::BIGINT ELSE 0 END))) AS qcode
  FROM q
),
coded AS (
  SELECT e.vec_id, e.embedding,
         list_transform(range(0, 2), w ->
           list_sum(list_transform(range(1, 33), b ->
             CASE WHEN e.embedding[w*32 + b] > 0
                  THEN (2::BIGINT ^ (b - 1))::BIGINT ELSE 0 END))) AS code
  FROM embeddings e
),
approx AS (
  SELECT c.vec_id, c.embedding,
         list_sum(list_transform(range(1, 3),
           w -> bit_count(xor(c.code[w], qc.qcode[w])))) AS hamming
  FROM coded c CROSS JOIN qc
),
cand AS (SELECT * FROM approx ORDER BY hamming, vec_id LIMIT 50)
SELECT cand.vec_id,
       round({_l2_sql('cand.embedding', 'q.qv')}, 6) AS distance
FROM cand CROSS JOIN q
ORDER BY {_l2_sql('cand.embedding', 'q.qv')}, cand.vec_id
LIMIT 10
""",
    tags=("vector", "index", "bq", "quantization", "milvus24"),
)
def vector_bq_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized search (Milvus BIN_FLAT / BQ compression): sign
    bits packed into 32-bit words (32x compression, training-free),
    XOR+popcount Hamming approximate top-50 map-side, exact L2 rerank to
    top-10 — hash-checked end to end."""
    from ..index.bq import bq_search

    emb = load_table(spark, sf_dir, "embeddings")
    out = bq_search(emb, _query_vec(spark, sf_dir, 13), k=10, overfetch=5)
    return out.select("vec_id", F.round("distance", 6).alias("distance"))


@register(
    "vector_lsh_exact_parity",
    # probe_radius = n_planes probes every bucket within Hamming distance
    # 8 of the query's bucket — i.e. ALL 2^8 buckets — so the layout
    # search degenerates to exact cosine top-k and the oracle states
    # brute force directly (the LSH twin of vector_ivf_exact_parity).
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 21),
d AS (
  SELECT e.vec_id, e.label,
         1.0 - ({_dot_sql('e.embedding', 'q.qv')}
           / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
              * sqrt({_dot_sql('q.qv', 'q.qv')}))) AS dist
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, label, round(dist, 6) + 0.0 AS distance
FROM d ORDER BY dist, vec_id LIMIT 10
""",
    tags=("vector", "lsh", "ann", "index"),
)
def vector_lsh_exact_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH layout invariant: probing at the full Hamming radius scans
    every bucket partition, so the multiprobe machinery (driver-side
    probe combinatorics → partition IN-filter → within-bucket cosine
    rerank) must reproduce exact brute-force cosine top-k bit-for-bit —
    which the DuckDB oracle states. This hash-pins the bucket assignment
    (sign(v·h_i) pandas_udf at build == driver-side bucket_of at query),
    the layout write, and the rerank in one driver verdict; the
    production pruned-radius run keeps its recall bound in
    tests/test_lsh.py."""
    from ..index.lsh import lsh_layout_search

    index = get_lsh_layout(spark, sf_dir, n_planes=8)
    hits = lsh_layout_search(
        spark, index, _query_vec(spark, sf_dir, 21), k=10,
        probe_radius=index.n_planes,
    )
    # `+ 0.0` normalizes IEEE negative zero: the self-hit's cosine can
    # land an ulp above 1.0, making round(1 - sim, 6) print as -0.0 in
    # one engine and 0.0 in the other — same trick on the oracle side
    return hits.select(
        "vec_id",
        "label",
        (F.round("distance", 6) + F.lit(0.0)).alias("distance"),
    )


@register(
    "vector_bucketed_pairs_exact",
    # nlist=1 puts the whole corpus in ONE cell, so per-cell pair
    # generation degenerates to the exhaustive all-pairs join and the
    # oracle can state the O(n²) baseline directly — hash-pinning the
    # candidate-generation machinery that the production nlist=16 run
    # (vector_ivf_bucketed_pairs) uses with pruned cells.
    oracle=f"""
WITH p AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         {_l2_sql('a.embedding', 'b.embedding')} AS dist
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT a_id, b_id, round(dist, 6) AS distance
FROM p WHERE dist <= 1.25
""",
    tags=("vector", "ivf", "dedup"),
)
def vector_bucketed_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-pairs invariant: with nlist=1 every vector lands in the
    same cell, so ivf_bucketed_pairs' within-cell generation must emit
    EXACTLY the all-pairs similarity self-join — stated by the oracle.
    One driver verdict proves the join/filter/distance plumbing; the
    scale win (cells prune the pair space) is the nlist>1 run."""
    index = get_ivf_index(spark, sf_dir, nlist=1)
    pairs = ivf_bucketed_pairs(spark, index, max_distance=1.25)
    return pairs.select(
        "a_id", "b_id", F.round("distance", 6).alias("distance")
    )


@register(
    "vector_ivf_filtered_parity",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11),
d AS (
  SELECT e.vec_id, e.label, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
  WHERE e.label IN (2, 5)
)
SELECT vec_id, label, round(dist, 6) AS distance
FROM d ORDER BY dist, vec_id LIMIT 10
""",
    tags=("vector", "ivf", "index", "filtered"),
)
def vector_ivf_filtered_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Milvus filtered-search semantics on the IVF layout: a metadata
    predicate (label IN (2,5)) applies BEFORE the top-k, pushed into the
    pruned parquet scan next to the partition filter. At nprobe=nlist the
    probe is exhaustive, so the result provably equals brute force over
    the filtered subset — which the oracle states directly."""
    index = get_ivf_index(spark, sf_dir, nlist=16)
    hits = ivf_search(
        spark,
        index,
        _query_vec(spark, sf_dir, 11),
        k=10,
        nprobe=16,
        where=F.col("label").isin(2, 5),
    )
    return hits.select(
        "vec_id", "label", F.round("distance", 6).alias("distance")
    )


@register(
    "vector_ivf_delete_compact_parity",
    # victims are the query's OWN top-3 — closed-form at any scale
    # factor, so the oracle needs no pinned id constants and the deletes
    # provably change the undeleted answer
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11),
d AS (
  SELECT e.vec_id, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
),
victims AS (SELECT vec_id FROM d ORDER BY dist, vec_id LIMIT 3)
SELECT vec_id, round(dist, 6) AS distance
FROM d WHERE vec_id NOT IN (SELECT vec_id FROM victims)
ORDER BY dist, vec_id LIMIT 10
""",
    tags=("vector", "ivf", "index", "maintenance", "compaction"),
)
def vector_ivf_delete_compact_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF layout's full MAINTENANCE lifecycle, hash-checked — the
    vector twin of text_inverted_compaction_parity: build on 70% of the
    embeddings → append the rest → tombstone-delete the query's own
    top-3 neighbors (deletion vectors, index/ivf.py::ivf_delete_lazy) →
    offline compaction (refits centroids over the live corpus, folds the
    deletion vectors in, write-new-then-swap) → exhaustive-probe search
    from the COMPACTED layout. The oracle is brute force over the corpus
    minus its own top-3: exact parity states that after arbitrary
    append/delete/compact history the index answers as if freshly built
    on the live vectors — the invariant that makes online maintenance
    safe at 100 TB."""
    import shutil
    import tempfile

    from ..index.ivf import compact_ivf_index, ivf_append, ivf_delete_lazy

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 11)
    # per-run temp dir, materialize, clean up in finally: the returned
    # frame must stay valid after the layout is gone, and re-runs must
    # never see a prior run's tombstones/cells (the query IS the
    # maintenance history)
    base = tempfile.mkdtemp(prefix="spark_graft_ivfmaint_")
    try:
        index = build_ivf_index(
            emb.filter(F.col("vec_id") % 10 < 7), f"{base}/idx", nlist=8
        )
        ivf_append(index, emb.filter(F.col("vec_id") % 10 >= 7))
        victims = [
            r.vec_id
            for r in ivf_search(spark, index, qv, k=3, nprobe=8).collect()
        ]
        ivf_delete_lazy(spark, index, victims)
        compacted = compact_ivf_index(spark, index, f"{base}/compacted")
        hits = ivf_search(spark, compacted, qv, k=10, nprobe=8)
        out = hits.select("vec_id", F.round("distance", 6).alias("distance"))
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "vector_ivf_uri_layout_parity",
    # same self-parametrizing victim set as the maintenance twin, but
    # searched from the TOMBSTONED (uncompacted) layout on a file:// URI
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 31),
d AS (
  SELECT e.vec_id, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
),
victims AS (SELECT vec_id FROM d ORDER BY dist, vec_id LIMIT 3)
SELECT vec_id, round(dist, 6) AS distance
FROM d WHERE vec_id NOT IN (SELECT vec_id FROM victims)
ORDER BY dist, vec_id LIMIT 10
""",
    tags=("vector", "ivf", "index", "portability", "fsio"),
)
def vector_ivf_uri_layout_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage portability, driver-checked: the IVF lifecycle on a
    ``file://`` URI layout — the scheme-addressed path every remote
    store (s3://, hdfs://) shares, which plain open()/os.path IO cannot
    touch. Build → tombstone-delete the query's own top-3
    (ivf_delete_lazy) → exhaustive-probe search from the UNCOMPACTED
    layout: the tombstone anti-join only fires if the presence probe
    goes through the Hadoop FileSystem (fsio) — before the fsio
    migration a local-FS probe on this layout silently returned False
    and the deleted rows RESURFACED, which is exactly the hash mismatch
    this oracle would catch. Brute-force-minus-victims is the oracle;
    parity states deletion vectors work wherever the layout lives."""
    import shutil
    import tempfile

    from ..index.ivf import ivf_delete_lazy

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 31)
    base = tempfile.mkdtemp(prefix="spark_graft_ivfuri_")
    try:
        index = build_ivf_index(emb, f"file://{base}/idx", nlist=8)
        victims = [
            r.vec_id
            for r in ivf_search(spark, index, qv, k=3, nprobe=8).collect()
        ]
        ivf_delete_lazy(spark, index, victims)
        hits = ivf_search(spark, index, qv, k=10, nprobe=8)
        out = hits.select("vec_id", F.round("distance", 6).alias("distance"))
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "vector_lsh_delete_parity",
    # same self-parametrizing victim set as the IVF maintenance twin:
    # the query's own top-3 under the full-radius (exact) probe
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 21),
d AS (
  SELECT e.vec_id, e.label,
         1.0 - ({_dot_sql('e.embedding', 'q.qv')}
           / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
              * sqrt({_dot_sql('q.qv', 'q.qv')}))) AS dist
  FROM embeddings e CROSS JOIN q
),
victims AS (SELECT vec_id FROM d ORDER BY dist, vec_id LIMIT 3)
SELECT vec_id, label, round(dist, 6) + 0.0 AS distance
FROM d WHERE vec_id NOT IN (SELECT vec_id FROM victims)
ORDER BY dist, vec_id LIMIT 10
""",
    tags=("vector", "lsh", "index", "maintenance"),
)
def vector_lsh_delete_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH layout's maintenance lifecycle, hash-checked — completing
    the lifecycle-parity trio (inverted: text_inverted_compaction_parity;
    IVF: vector_ivf_delete_compact_parity): build on 70% of the
    embeddings → append the rest (hyperplanes fixed, no refit) →
    per-bucket-rewrite delete of the query's own top-3
    (index/lsh.py::lsh_delete touches only the victims' bucket
    directories) → full-radius search must equal brute-force cosine
    top-k over the corpus minus those top-3. Deletes rewrite eagerly,
    so the search plan stays join-free, which this parity also
    witnesses; the offline compactor's replay-heal side is the
    vector_lsh_compact_parity twin below."""
    import shutil
    import tempfile

    from ..index.lsh import build_lsh_layout, lsh_append, lsh_delete, lsh_layout_search
    from .vector_q import DIM

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 21)
    # per-run temp dir + materialize + finally-cleanup (see the IVF
    # maintenance twin above for the rationale)
    base = tempfile.mkdtemp(prefix="spark_graft_lshmaint_")
    try:
        index = build_lsh_layout(
            emb.filter(F.col("vec_id") % 10 < 7), f"{base}/idx", dim=DIM, n_planes=8
        )
        lsh_append(index, emb.filter(F.col("vec_id") % 10 >= 7))
        victims = [
            r.vec_id
            for r in lsh_layout_search(
                spark, index, qv, k=3, probe_radius=index.n_planes
            ).collect()
        ]
        lsh_delete(spark, index, victims)
        hits = lsh_layout_search(
            spark, index, qv, k=10, probe_radius=index.n_planes
        )
        out = hits.select(
            "vec_id",
            "label",
            (F.round("distance", 6) + F.lit(0.0)).alias("distance"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "vector_lsh_compact_parity",
    # same self-parametrizing victim shape as the delete twin (vec_id=31
    # this time): the oracle states brute-force cosine minus the query's
    # own top-3 — a replayed duplicate surviving compaction would put
    # the same (vec_id, distance) row in the top-10 twice and break the
    # hash, as would a victim copy the delete missed.
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 31),
d AS (
  SELECT e.vec_id, e.label,
         1.0 - ({_dot_sql('e.embedding', 'q.qv')}
           / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
              * sqrt({_dot_sql('q.qv', 'q.qv')}))) AS dist
  FROM embeddings e CROSS JOIN q
),
victims AS (SELECT vec_id FROM d ORDER BY dist, vec_id LIMIT 3)
SELECT vec_id, label, round(dist, 6) + 0.0 AS distance
FROM d WHERE vec_id NOT IN (SELECT vec_id FROM victims)
ORDER BY dist, vec_id LIMIT 10
""",
    tags=("vector", "lsh", "index", "maintenance", "compaction"),
)
def vector_lsh_compact_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH offline compactor (index/lsh.py::compact_lsh_layout),
    hash-checked through the at-least-once crash window it exists to
    heal: build on 70% of the embeddings → append the rest → compute
    the query's top-3 victims on the clean state → REPLAY the whole
    append (byte-identical rows land twice, the streaming-sink crash
    window) → per-bucket-rewrite delete of the victims (removes every
    copy) → compact into a fresh layout (full-row distinct, no refit —
    buckets are a pure function of the fixed hyperplanes) →
    full-radius search must equal brute-force cosine top-10 over the
    corpus minus the victims, each id EXACTLY once. Scale shape:
    compaction is one distinct shuffle + partitioned write, offline;
    the search plan over the compacted layout is the same join-free
    pruned scan as ever."""
    import shutil
    import tempfile

    from ..index.lsh import (
        build_lsh_layout,
        compact_lsh_layout,
        lsh_append,
        lsh_delete,
        lsh_layout_search,
    )
    from .vector_q import DIM

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 31)
    base = tempfile.mkdtemp(prefix="spark_graft_lshcompact_")
    try:
        index = build_lsh_layout(
            emb.filter(F.col("vec_id") % 10 < 7), f"{base}/idx", dim=DIM, n_planes=8
        )
        tail = emb.filter(F.col("vec_id") % 10 >= 7)
        lsh_append(index, tail)
        victims = [
            r.vec_id
            for r in lsh_layout_search(
                spark, index, qv, k=3, probe_radius=index.n_planes
            ).collect()
        ]
        lsh_append(index, tail)  # at-least-once replay of the same batch
        lsh_delete(spark, index, victims)
        compacted = compact_lsh_layout(spark, index, f"{base}/compacted")
        hits = lsh_layout_search(
            spark, compacted, qv, k=10, probe_radius=compacted.n_planes
        )
        out = hits.select(
            "vec_id",
            "label",
            (F.round("distance", 6) + F.lit(0.0)).alias("distance"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "vector_manifest_rollback_parity",
    # two serving states, one result: v2 (rewrite-published without the
    # query's top-3) then rollback to v1 (full corpus). Both halves are
    # brute-force-stated, so the hash breaks if publish/rollback resolve
    # the wrong path OR if v1's directory was mutated in between.
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11),
d AS (
  SELECT e.vec_id, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
),
victims AS (SELECT vec_id FROM d ORDER BY dist, vec_id LIMIT 3),
v2 AS (
  SELECT 'v2' AS serving, vec_id, round(dist, 6) AS distance
  FROM d WHERE vec_id NOT IN (SELECT vec_id FROM victims)
  ORDER BY dist, vec_id LIMIT 10
),
v3 AS (
  SELECT 'v3_rollback' AS serving, vec_id, round(dist, 6) AS distance
  FROM d ORDER BY dist, vec_id LIMIT 10
)
SELECT * FROM v2 UNION ALL SELECT * FROM v3
""",
    tags=("vector", "ivf", "index", "manifest", "serving"),
)
def vector_manifest_rollback_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned serving pointer (index/manifest.py), hash-checked
    through real searches: publish v1 (full corpus layout), publish v2
    (a REWRITE without the query's top-3 — never-mutate-in-place, so
    v1's directory stays bit-frozen), search what ``current`` serves,
    then ``rollback(1)`` and search again. v2 must answer brute force
    minus the victims; the rollback must answer brute force over the
    FULL corpus — which only holds if the pointer resolves correctly
    AND v1 was truly immutable while v2 was being served. History stays
    append-only: the rollback is version 3, not an erase of version 2."""
    import shutil
    import tempfile

    from ..index.manifest import current, publish, rollback

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 11)
    # per-run temp dir + finally-cleanup, same lifecycle discipline as
    # the maintenance twins (both serving states are materialized below
    # anyway — v2's rows must be read BEFORE the pointer moves)
    base = tempfile.mkdtemp(prefix="spark_graft_manifest_")
    try:
        v1 = build_ivf_index(emb, f"{base}/layout_v1", nlist=8)
        publish(base, "serving", v1.path)
        victims = [
            r.vec_id for r in ivf_search(spark, v1, qv, k=3, nprobe=8).collect()
        ]
        v2 = build_ivf_index(
            emb.filter(~F.col("vec_id").isin(victims)),
            f"{base}/layout_v2",
            nlist=8,
        )
        publish(base, "serving", v2.path)

        def _serve(label: str) -> DataFrame:
            idx = IVFIndex.load(current(base, "serving"))
            hits = ivf_search(spark, idx, qv, k=10, nprobe=8)
            return hits.select(
                F.lit(label).alias("serving"),
                "vec_id",
                F.round("distance", 6).alias("distance"),
            )

        served_v2 = _serve("v2")
        rows_v2 = served_v2.collect()  # materialize BEFORE the pointer moves
        rollback(base, "serving", 1)
        rows_v3 = _serve("v3_rollback").collect()
        schema = served_v2.schema
        return spark.createDataFrame(rows_v2 + rows_v3, schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "vector_ivf_hot_split_parity",
    # exhaustive probe over the post-split layout must equal brute force
    # over the full corpus, and the live row count must equal count(*) —
    # together these break the hash if the split loses, duplicates, or
    # corrupts any row. split_occurred is TRUE by pigeonhole: with
    # nlist=4 and the cap at total/8, the largest cell (>= total/4)
    # always exceeds the cap, at every scale factor.
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 11),
d AS (
  SELECT e.vec_id, {_l2_sql('e.embedding', 'q.qv')} AS dist
  FROM embeddings e CROSS JOIN q
),
n AS (SELECT count(*)::BIGINT AS n_rows FROM embeddings)
SELECT vec_id, round(dist, 6) AS distance, n.n_rows, TRUE AS split_occurred
FROM d, n ORDER BY dist, vec_id LIMIT 10
""",
    tags=("vector", "ivf", "index", "maintenance", "skew"),
)
def vector_ivf_hot_split_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted skew repair (index/ivf.py::split_hot_cells), hash-checked
    — the last lifecycle operator without a driver anchor: build at
    nlist=4 (guaranteeing a hot cell over the total/8 cap by pigeonhole),
    split every over-cap cell into 4 sub-cells (k-means WITHIN the cell;
    only hot partitions are rewritten, the cold ones are never touched,
    old centroids retire to the unreachable sentinel), then an
    exhaustive-probe search from the post-split layout must equal brute
    force over the full corpus and the layout's live row count must
    equal count(*) — the invariant that makes surgical skew repair safe:
    re-bucketing a hot region never changes any answer."""
    import shutil
    import tempfile

    from ..index.ivf import split_hot_cells

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir, 11)
    total = emb.count()
    base = tempfile.mkdtemp(prefix="spark_graft_ivfsplit_")
    try:
        index = build_ivf_index(emb, f"{base}/idx", nlist=4)
        split = split_hot_cells(
            spark, index, max_cell_rows=max(1, total // 8), sub_nlist=4
        )
        split_occurred = len(split.centroids) > len(index.centroids)
        n_rows = spark.read.parquet(split.path).count()
        hits = ivf_search(
            spark, split, qv, k=10, nprobe=len(split.centroids)
        )
        out = hits.select(
            "vec_id",
            F.round("distance", 6).alias("distance"),
            F.lit(n_rows).cast("long").alias("n_rows"),
            F.lit(split_occurred).alias("split_occurred"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "vector_lsh_batch_topk",
    # full-radius probes = every bucket ⇒ the batch search must equal
    # the brute-force per-query cosine top-k, which the oracle states
    # (the batch twin of vector_lsh_exact_parity, and the LSH twin of
    # vector_ivf_batch_topk)
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN (5, 21, 37)
),
d AS (
  SELECT q.query_id, e.vec_id,
         1.0 - ({_dot_sql('e.embedding', 'q.qv')}
           / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
              * sqrt({_dot_sql('q.qv', 'q.qv')}))) AS dist
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist, vec_id) AS rank
  FROM d
)
SELECT query_id, vec_id, round(dist, 6) + 0.0 AS distance, rank::INTEGER AS rank
FROM r WHERE rank <= 5
""",
    tags=("vector", "lsh", "index", "batch"),
)
def vector_lsh_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multiprobe LSH at the full Hamming radius (exact
    identity): three queries share ONE partition-pruned scan feeding the
    Arrow cosine kernel (bucket→query map and query matrix in the UDF
    closure; dimension-ordered fold, bit-identical to the
    cosine_similarity expression), then a per-query rank window — the
    amortized production shape (index/lsh.py::lsh_layout_search_batch).
    At radius = n_planes every bucket is probed, so the result must
    equal brute-force per-query cosine top-k, which the oracle
    states; the pruned-radius batch keeps its recall bound in
    tests/test_lsh.py."""
    from ..index.lsh import lsh_layout_search_batch

    index = get_lsh_layout(spark, sf_dir, n_planes=8)
    qids = (5, 21, 37)
    vecs = _query_vecs(spark, sf_dir, qids)
    queries = [(qid, vecs[qid]) for qid in qids]
    hits = lsh_layout_search_batch(
        spark, index, queries, k=5, probe_radius=index.n_planes
    )
    return hits.select(
        "query_id",
        "vec_id",
        (F.round("distance", 6) + F.lit(0.0)).alias("distance"),
        "rank",
    )
