"""Text-operator query inventory (SURVEY.md §2.8 F1–F6 + north-star text
analysis) over the `documents` table.

The synthetic corpus is punctuation-free lowercase word-soup, so the
punctuation-split operator (F3) runs on an in-plan sentence-ified
derivation (same derivation on both engines) and chunking also gets the
token-window form used for real LLM pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.text import (
    CLEAN_PATTERN,
    STOPWORDS,
    TOKEN_PATTERN,
    clean_content,
    extract_tokens,
    token_windows,
)
from ..operators.textstats import with_text_stats
from ..sources.tables import load_table, widen_cpu_dense
from .registry import register

_STOPLIST_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


@register(
    "pipeline_train_test_split",
    oracle="""
WITH s AS (
  SELECT doc_id, n_chars,
         CASE WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10 < 8
              THEN 'train' ELSE 'test' END AS split
  FROM documents
)
SELECT split, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM s GROUP BY split
""",
    tags=("pipeline", "split", "training-data"),
)
def pipeline_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/test split (80/20) — the
    reproducible alternative to random sampling for training pipelines:
    membership is a pure function of the id (stable across runs, engines
    and re-partitioning; md5 so the oracle reproduces it), no shuffle, no
    RNG state."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("bigint") % 10
    )
    split = F.when(bucket < 8, "train").otherwise("test")
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "text_tfidf_top_terms",
    oracle=f"""
WITH tok AS (
  SELECT source, doc_id, unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS term
  FROM documents
),
tf AS (
  SELECT source, term, count(*)::DOUBLE AS tf
  FROM tok GROUP BY source, term
),
df AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY term
),
n AS (SELECT count(*)::DOUBLE AS n FROM documents),
scored AS (
  SELECT tf.source, tf.term,
         round(tf.tf * ln(n.n / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY tfidf DESC, term ASC) AS rk
  FROM scored
)
SELECT source, term, tfidf, rk::INTEGER AS rk FROM ranked WHERE rk <= 5
""",
    tags=("text", "tfidf", "analysis"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-5 terms by tf-idf (tf = per-source term count,
    idf = ln(N_docs / doc-frequency)). Two narrow aggregations + a
    broadcastable df table — the classic corpus-statistics shape. The
    corpus size N rides along as a broadcast 1-row cross join, so the
    whole query is ONE Spark job (a separate driver-side count() action
    would scan the corpus twice)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", "doc_id", F.explode(extract_tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dfreq = tok.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("__n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6)
        )
        .drop("__n_docs")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("source", "term", "tfidf", "rk")
    )


@register(
    "text_clean_preprocess",
    oracle=r"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(text, '[^\w一-鿿\s.,!?;:，。！？；：]', '', 'g'),
                           '\s+', ' ', 'g')) AS clean_text
FROM documents
WHERE length(trim(regexp_replace(regexp_replace(text, '[^\w一-鿿\s.,!?;:，。！？；：]', '', 'g'),
                                 '\s+', ' ', 'g'))) >= 10
""",
    tags=("text", "F1", "P4"),
)
def text_clean_preprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 + P4: content cleaning (strip/collapse/trim) + min-length filter
    (reference _preprocess_content, src/app.py:190-203)."""
    docs = load_table(spark, sf_dir, "documents")
    cleaned = docs.withColumn("clean_text", clean_content(F.col("text")))
    return cleaned.filter(F.length("clean_text") >= 10).select("doc_id", "clean_text")


@register(
    "text_tokenize_topk",
    oracle=f"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS token
  FROM documents
)
SELECT token, count(*)::BIGINT AS cnt
FROM tok
WHERE NOT list_contains({_STOPLIST_SQL}, token)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
""",
    tags=("text", "F2", "J3", "W3"),
    bench=True,
)
def text_tokenize_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 + J3: regex tokenization → explode → stopword anti-join →
    frequency top-k (reference extract_keywords, src/app.py:332-340)."""
    docs = load_table(spark, sf_dir, "documents")
    stopwords_df = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(s,) for s in STOPWORDS], "token string"
        )
    )
    tokens = docs.select(F.explode(extract_tokens(F.col("text"))).alias("token"))
    return (
        tokens.join(stopwords_df, "token", "left_anti")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(20)
    )


@register(
    "text_chunk_token_windows",
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
)
SELECT doc_id, i::INTEGER AS chunk_idx,
       array_to_string(toks[(i*16+1):(i*16+16)], ' ') AS chunk
FROM (
  -- per-row unnest(range(...)) mirrors Spark's sequence(): the bound is
  -- derived from each document's token count, never a fixed cap
  SELECT doc_id, toks,
         unnest(range(0, greatest((len(toks) - 1) // 16, 0) + 1)) AS i
  FROM t
)
""",
    tags=("text", "F3", "chunking"),
)
def text_chunk_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (the LLM-pipeline chunker): each document →
    fixed 16-token windows, as a pure higher-order expression + posexplode."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.posexplode(token_windows(F.col("text"), 16)).alias("chunk_idx", "chunk"),
    ).select("doc_id", "chunk_idx", "chunk")


@register(
    "text_sentence_split",
    oracle=r"""
WITH s AS (
  SELECT doc_id, regexp_replace(text, ' table ', '. ', 'g') AS sent_text
  FROM documents
),
c AS (
  SELECT doc_id, trim(chunk) AS chunk
  FROM s CROSS JOIN unnest(string_split_regex(sent_text, '[，。！？；:,\.!?;]')) AS u(chunk)
)
SELECT doc_id, chunk FROM c WHERE length(chunk) > 5
""",
    tags=("text", "F3", "P5"),
)
def text_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 + P5: punctuation sentence split → trim → drop short chunks
    (reference chunk_search, src/app.py:319-330). The corpus has no
    punctuation, so sentences are derived in-plan (same on both engines)."""
    from ..functions.text import CHUNK_SPLIT_PATTERN

    docs = load_table(spark, sf_dir, "documents")
    sent = docs.withColumn(
        "sent_text", F.regexp_replace(F.col("text"), " table ", ". ")
    )
    chunks = sent.select(
        "doc_id",
        F.explode(F.split(F.col("sent_text"), CHUNK_SPLIT_PATTERN)).alias("raw"),
    ).select("doc_id", F.trim(F.col("raw")).alias("chunk"))
    return chunks.filter(F.length("chunk") > 5)


@register(
    "text_stats_full",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '\s+') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, text, toks,
         len(toks)::DOUBLE AS n,
         len(list_filter(toks, x -> list_contains({_STOPLIST_SQL}, x)))::DOUBLE AS n_stop,
         len(list_distinct(toks))::DOUBLE AS n_distinct,
         len(list_filter(list_distinct(toks),
             x -> list_contains(['the','and','for','that','this','with','from'], x))) AS en,
         len(list_filter(list_distinct(toks),
             x -> list_contains(['el','la','los','las','que','una'], x))) AS es,
         len(list_filter(list_distinct(toks),
             x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS de,
         len(list_filter(list_distinct(toks),
             x -> list_contains(['le','les','des','une','est','dans'], x))) AS fr
  FROM t
)
SELECT doc_id,
       len(toks)::INTEGER AS n_ws_tokens,
       len(regexp_extract_all(text, '{TOKEN_PATTERN}'))::INTEGER AS n_regex_tokens,
       len(regexp_extract_all(text, '[aeiou]+|[^aeiou\s]+'))::INTEGER AS n_subword_tokens,
       CASE WHEN en >= greatest(es, de, fr) AND en > 0 THEN 'en'
            WHEN es >= greatest(de, fr) AND es > 0 THEN 'es'
            WHEN de >= fr AND de > 0 THEN 'de'
            WHEN fr > 0 THEN 'fr'
            ELSE 'und' END AS lang_pred,
       round(0.4 * (n_distinct / n) + 0.3 * (1.0 - n_stop / n)
             + 0.3 * least(n / 100.0, 1.0), 6) AS quality_score,
       md5(array_to_string(toks, ' ')) AS fingerprint
FROM m
""",
    tags=("text", "langid", "quality", "fingerprint"),
    bench=True,
)
def text_stats_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star text analysis in one narrow projection: token counts
    (3 notions), marker-word language ID, composite quality score,
    md5 fingerprint."""
    # CPU-dense per-row stage over ~10x-compressed text: widen beyond
    # the bytes-sized scan split (sources/tables.py::widen_cpu_dense)
    docs = widen_cpu_dense(load_table(spark, sf_dir, "documents"))
    return with_text_stats(docs, "text").select(
        "doc_id",
        "n_ws_tokens",
        "n_regex_tokens",
        "n_subword_tokens",
        "lang_pred",
        F.round("quality_score", 6).alias("quality_score"),
        "fingerprint",
    )


@register(
    "pipeline_balanced_lang_sample",
    oracle="""
WITH c AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang),
r AS (
  SELECT lang, n_docs,
         sqrt((SELECT min(n_docs) FROM c)::DOUBLE / n_docs::DOUBLE) AS rate
  FROM c
),
u AS (
  SELECT lang, n_chars,
         ('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE
           / 4294967296.0 AS u
  FROM documents
)
SELECT u.lang,
       r.n_docs,
       round(r.rate, 6) AS rate,
       sum(CASE WHEN u.u < r.rate THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
       sum(CASE WHEN u.u < r.rate THEN n_chars ELSE 0 END)::BIGINT
         AS sampled_chars
FROM u JOIN r USING (lang)
GROUP BY u.lang, r.n_docs, r.rate
""",
    tags=("pipeline", "sampling", "training-data"),
)
def pipeline_balanced_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balancing downsample (temperature α=0.5 flavor): each
    language keeps a sqrt(n_min/n_lang) fraction, pulling the source
    mixture toward uniform — the standard multilingual-corpus rebalance.
    Membership is deterministic: an md5-derived uniform in [0,1) per doc
    compared against the per-lang rate, so the sample is reproducible
    across runs, engines and repartitioning (no RNG state). The rate
    math is a single correctly-rounded division + sqrt (no
    order-dependent float sums), so the oracle is bit-exact.

    Scale shape: one tiny per-lang count agg, broadcast of the 5-row
    rate table back onto the corpus, one filtered pass — the corpus is
    never shuffled."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n_docs",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_docs").cast("double")).alias(
            "rate"
        ),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        )
        .cast("bigint")
        .cast("double")
        / F.lit(4294967296.0)
    )
    keep = (u < F.col("rate")).cast("int")
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang", "n_docs", F.round("rate", 6).alias("rate"))
        .agg(
            F.sum(keep).cast("bigint").alias("n_sampled"),
            F.sum(keep * F.col("n_chars")).cast("bigint").alias("sampled_chars"),
        )
    )


@register(
    "text_bigram_top_counts",
    oracle="""
WITH t AS (SELECT lang, string_split_regex(trim(text), '\\s+') AS toks
           FROM documents),
b AS (
  SELECT lang,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM t
),
c AS (SELECT lang, bigram, count(*)::BIGINT AS n FROM b GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY n DESC, bigram) AS rn FROM c)
SELECT lang, bigram, n FROM r WHERE rn <= 5
""",
    tags=("text", "ngram", "training-data"),
)
def text_bigram_top_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model counts: top-5 bigrams per language with a
    deterministic tie-break (count desc, bigram asc). The n-gram expansion
    is a JVM index-lambda `transform` + explode (no Python), the count is
    a partial+final agg, and the per-lang top-5 is a rank window over the
    (small) distinct-bigram counts — the raw token stream never passes
    through a window."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.split(F.trim("text"), r"\s+").alias("toks"))
    bigrams = toks.select(
        "lang",
        F.explode(
            F.expr(
                "filter(transform(toks, (t, i) -> "
                "IF(i < size(toks) - 1, concat(t, ' ', toks[i+1]), "
                "CAST(NULL AS STRING))), x -> x IS NOT NULL)"
            )
        ).alias("bigram"),
    )
    counts = bigrams.groupBy("lang", "bigram").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "text_pii_scrub",
    # PII is planted deterministically (no natural emails/phones in the
    # synthetic corpus), then both engines run the same portable regexes
    # (no lookaround — Java regex and RE2 agree) and count + redact.
    oracle=r"""
WITH corpus AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 4 = 0
                      THEN ' contact user' || doc_id ||
                           '@example.com or 555-123-4567 now'
                      ELSE '' END AS text
  FROM documents
),
pat AS (
  SELECT doc_id, text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}' AS email_re,
         '\b\d{3}[-.]\d{3,4}[-.]\d{4}\b' AS phone_re
  FROM corpus
)
SELECT doc_id,
       (len(regexp_extract_all(text, email_re))
        + len(regexp_extract_all(text, phone_re)))::BIGINT AS n_pii,
       regexp_replace(regexp_replace(text, email_re, '[EMAIL]', 'g'),
                      phone_re, '[PHONE]', 'g') AS clean_text
FROM pat
""",
    tags=("text", "pii", "scrub"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (email + phone redaction with per-doc counts) — the
    compliance pass every training-data pipeline runs before anything
    else. Pure JVM regex expressions, map-side only; the patterns avoid
    lookaround so they behave identically across engines."""
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-123-4567 now"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    n_pii = F.size(F.regexp_extract_all(F.col("text"), F.lit(email_re), 0)) + F.size(
        F.regexp_extract_all(F.col("text"), F.lit(phone_re), 0)
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), email_re, "[EMAIL]"), phone_re, "[PHONE]"
    )
    return planted.select(
        "doc_id",
        n_pii.cast("long").alias("n_pii"),
        clean.alias("clean_text"),
    )


@register(
    "text_repetition_filter",
    # Same 3-gram derivation as the minhash family but WITHOUT the
    # distinct: the repetition ratio is 1 - distinct/total shingles.
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
),
g AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                        i -> array_to_string(toks[i:i+2], ' ')) AS grams
  FROM t
)
SELECT doc_id,
       len(grams)::BIGINT AS total_3grams,
       len(list_distinct(grams))::BIGINT AS distinct_3grams,
       round(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 6) AS rep_ratio,
       (1.0 - len(list_distinct(grams))::DOUBLE / len(grams)) <= 0.2 AS kept
FROM g
""",
    tags=("text", "quality", "repetition"),
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition rule: the fraction of duplicated 3-gram
    shingles per document (1 - distinct/total); documents above 0.2 are
    flagged for removal. Pure higher-order expressions, map-side only —
    the canonical cheap quality gate before any dedup pass."""
    # CPU-dense per-row stage over ~10x-compressed text: widen beyond
    # the bytes-sized scan split (sources/tables.py::widen_cpu_dense)
    docs = widen_cpu_dense(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, 3), " "),
    )
    total = F.size(grams).cast("long")
    distinct = F.size(F.array_distinct(grams)).cast("long")
    ratio = F.lit(1.0) - distinct.cast("double") / total.cast("double")
    return docs.select(
        "doc_id",
        total.alias("total_3grams"),
        distinct.alias("distinct_3grams"),
        F.round(ratio, 6).alias("rep_ratio"),
        (ratio <= 0.2).alias("kept"),
    )


_BM25_TERMS = ("vector", "stream", "window")


def _bm25_oracle_ctes(
    terms: tuple[str, ...] = _BM25_TERMS, where: str = "", rel: str = "documents"
) -> str:
    """DuckDB CTE chain ending in `bm25_scored(doc_id, bm25)` (unrounded),
    mirroring operators/bm25.py expression-for-expression: integer-exact
    tf/df/dl/N inputs, identical literal constants (2.2 / 1.2 / 0.25 /
    0.75), and a fixed left-to-right per-term contribution sum — the
    invariants that make the double bit-exact across engines. Shared by
    the text_bm25_search oracle and the weighted-hybrid oracle.

    ``where`` (e.g. ``"WHERE doc_id NOT IN (13, 259, 401)"``) restricts
    the corpus in every CTE that reads it; ``rel`` swaps the corpus
    relation itself (a prior CTE with ``(doc_id, text)`` columns — the
    crawl-ingest twin scores corpus + streamed survivors) — the oracle shape for
    maintenance queries whose index has deletions folded in."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    tf_cols = ",\n".join(
        f"         sum(CASE WHEN term = '{t}' THEN 1 ELSE 0 END)::DOUBLE AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n".join(
        f"         count(DISTINCT CASE WHEN term = '{t}' THEN doc_id END)::DOUBLE AS df{i}"
        for i, t in enumerate(terms)
    )
    contribs = "\n       + ".join(
        f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))\n"
        f"           * (tf{i} * 2.2 / (tf{i} + 1.2 * (0.25 + 0.75 * dl::DOUBLE / (tot / n))))"
        for i in range(len(terms))
    )
    return f"""tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS term
  FROM {rel} {where}
),
tf AS (
  SELECT doc_id,
{tf_cols}
  FROM tok WHERE term IN ({terms_sql}) GROUP BY doc_id
),
dfs AS (
  SELECT
{df_cols}
  FROM tok WHERE term IN ({terms_sql})
),
dl AS (
  SELECT doc_id, len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS dl
  FROM {rel} {where}
),
totals AS (
  SELECT count(*)::DOUBLE AS n,
         sum(len(regexp_extract_all(text, '{TOKEN_PATTERN}')))::DOUBLE AS tot
  FROM {rel} {where}
),
bm25_scored AS (
  SELECT doc_id,
         {contribs}
           AS bm25
  FROM tf JOIN dl USING (doc_id) CROSS JOIN dfs CROSS JOIN totals
)"""


@register(
    "text_bm25_search",
    oracle=f"""
WITH {_bm25_oracle_ctes()}
SELECT doc_id, round(bm25, 6) AS bm25
FROM bm25_scored
ORDER BY round(bm25, 6) DESC, doc_id ASC
LIMIT 10
""",
    tags=("text", "bm25", "full-text", "search"),
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 over `documents` for a fixed 3-term query —
    the lexical full-text leg a Milvus 2.5-era deployment pairs with
    vector search (and the input to hybrid RRF fusion). See
    operators/bm25.py for the one-scan / single-broadcast-row /
    TakeOrderedAndProject plan shape and the fixed-order float
    discipline that keeps it hash-exact vs the oracle."""
    from ..operators.bm25 import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, k=10)


#: One inverted-index build per (sf_dir, n_buckets) per process.
_INVERTED_CACHE: dict = {}


def get_inverted_index(spark: SparkSession, sf_dir: str, n_buckets: int = 64):
    import hashlib

    from ..index.inverted import build_inverted_index

    key = (sf_dir, n_buckets)
    if key not in _INVERTED_CACHE:
        tag = hashlib.md5(f"{sf_dir}|{n_buckets}".encode()).hexdigest()[:8]
        docs = load_table(spark, sf_dir, "documents")
        _INVERTED_CACHE[key] = build_inverted_index(
            docs, path=f"/tmp/spark_graft_inverted_{tag}", n_buckets=n_buckets
        )
    return _INVERTED_CACHE[key]


@register(
    "text_bm25_inverted_topk",
    oracle=f"""
WITH {_bm25_oracle_ctes()}
SELECT doc_id, round(bm25, 6) AS bm25
FROM bm25_scored
ORDER BY round(bm25, 6) DESC, doc_id ASC
LIMIT 10
""",
    tags=("text", "bm25", "inverted-index", "layout"),
)
def text_bm25_inverted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME BM25 top-10 as text_bm25_search, answered from the
    term-bucket-partitioned posting-list layout instead of a corpus
    scan: the query's terms map to crc32 buckets driver-side, the
    postings read prunes to those partitions, and scoring runs over
    posting rows + the stored doclen/stats side-tables (shared score
    expression — index/inverted.py). The oracle is the full-scan SQL:
    exact parity is the correctness statement for the index, mirroring
    vector_ivf_exact_parity for the dense layout."""
    from ..index.inverted import bm25_search_inverted

    idx = get_inverted_index(spark, sf_dir)
    return bm25_search_inverted(spark, idx, _BM25_TERMS, k=10)


#: Deleted in the maintenance-parity query: ids that sit in the sf0.01
#: BM25 top-10, so the deletion visibly changes the answer.
_MAINT_VICTIMS = (13, 259, 401)


@register(
    "text_inverted_compaction_parity",
    oracle=f"""
WITH {_bm25_oracle_ctes(where=f"WHERE doc_id NOT IN {_MAINT_VICTIMS}")}
SELECT doc_id, round(bm25, 6) AS bm25
FROM bm25_scored
ORDER BY round(bm25, 6) DESC, doc_id ASC
LIMIT 10
""",
    tags=("text", "bm25", "inverted-index", "maintenance", "compaction"),
)
def text_inverted_compaction_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverted index's full MAINTENANCE lifecycle, hash-checked:
    build on 70% of the corpus → append the rest → tombstone-delete three
    docs that sit in the undeleted top-10 → offline compaction (merges
    append batches, folds the deletion vectors in, recomputes stats) →
    BM25 top-10 from the COMPACTED layout. The oracle is the clean
    full-scan SQL over the corpus minus the victims: exact parity states
    that after arbitrary append/delete/compact history the index answers
    as if freshly built on the live documents — the invariant that makes
    online maintenance safe at 100 TB (index/inverted.py's
    write-new-then-swap compaction contract)."""
    import hashlib
    import shutil

    from ..index.inverted import (
        append_to_inverted_index,
        bm25_search_inverted,
        build_inverted_index,
        compact_inverted_index,
        delete_from_inverted_index,
    )

    tag = hashlib.md5(f"{sf_dir}|maint".encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_invmaint_{tag}"
    # fresh layout every run: the query IS the maintenance history, so
    # stale tombstones/postings from a prior run must not leak in
    shutil.rmtree(base, ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents")
    idx = build_inverted_index(
        docs.filter(F.col("doc_id") % 10 < 7), f"{base}/idx", n_buckets=64
    )
    append_to_inverted_index(idx, docs.filter(F.col("doc_id") % 10 >= 7))
    delete_from_inverted_index(idx, _MAINT_VICTIMS)
    compacted = compact_inverted_index(spark, idx, f"{base}/compacted")
    return bm25_search_inverted(spark, compacted, _BM25_TERMS, k=10)


#: One positional-index build per sf_dir per process.
_POSITIONAL_CACHE: dict = {}

_PHRASE = ("table", "hash")


@register(
    "text_phrase_search",
    # closed-form oracle: phrase occurrences = sliding-window equality
    # over the SAME token sequence (integer counts — no float subtlety)
    oracle=f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '{{TOKEN_PATTERN}}') AS ts FROM documents
),
m AS (
  SELECT doc_id,
         len(list_filter(range(1, len(ts) - {len(_PHRASE) - 1} + 1),
             i -> {" AND ".join(f"ts[i+{j}] = '{t}'" for j, t in enumerate(_PHRASE))}
         ))::INTEGER AS phrase_matches
  FROM tok
)
SELECT doc_id, phrase_matches FROM m WHERE phrase_matches > 0
ORDER BY phrase_matches DESC, doc_id ASC LIMIT 10
""".replace("{TOKEN_PATTERN}", TOKEN_PATTERN),
    tags=("text", "phrase", "inverted-index", "positional"),
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search (the Milvus 2.5 / Lucene ``match_phrase``
    capability) from the POSITIONAL posting-list layout: docs where
    'table hash' occur consecutively, top-10 by occurrence count. The
    layout read prunes to the two terms' crc32 buckets; the consecutive
    test is position-list intersection — pure JVM array algebra over
    posting rows, never a corpus scan (index/inverted.py
    phrase_search_positional). The oracle recomputes occurrences as a
    sliding-window equality over the raw token sequence — exact parity
    proves positions, bucketing, and the intersection algebra end to
    end."""
    import hashlib

    from ..index.inverted import build_positional_index, phrase_search_positional

    if sf_dir not in _POSITIONAL_CACHE:
        tag = hashlib.md5(f"{sf_dir}|pos".encode()).hexdigest()[:8]
        docs = load_table(spark, sf_dir, "documents")
        _POSITIONAL_CACHE[sf_dir] = build_positional_index(
            docs, path=f"/tmp/spark_graft_positional_{tag}", n_buckets=64
        )
    return phrase_search_positional(spark, _POSITIONAL_CACHE[sf_dir], _PHRASE, k=10)


@register(
    "text_positional_compact_parity",
    # self-parametrizing victim: the phrase's own top-1 match. The
    # oracle restates phrase counting over documents MINUS that victim —
    # a replayed posting row surviving compaction would double a match
    # count, and a missed tombstone would resurrect the victim; either
    # breaks the hash.
    oracle=f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '{{TOKEN_PATTERN}}') AS ts FROM documents
),
m AS (
  SELECT doc_id,
         len(list_filter(range(1, len(ts) - {len(_PHRASE) - 1} + 1),
             i -> {" AND ".join(f"ts[i+{j}] = '{t}'" for j, t in enumerate(_PHRASE))}
         ))::INTEGER AS phrase_matches
  FROM tok
),
victim AS (
  SELECT doc_id FROM m WHERE phrase_matches > 0
  ORDER BY phrase_matches DESC, doc_id ASC LIMIT 1
)
SELECT doc_id, phrase_matches FROM m
WHERE phrase_matches > 0 AND doc_id NOT IN (SELECT doc_id FROM victim)
ORDER BY phrase_matches DESC, doc_id ASC LIMIT 10
""".replace("{TOKEN_PATTERN}", TOKEN_PATTERN),
    tags=("text", "phrase", "positional", "index", "maintenance", "compaction"),
)
def text_positional_compact_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The positional layout's full maintenance lifecycle, hash-checked
    (the phrase-index sibling of vector_lsh_compact_parity): build on
    70% of the documents → append the rest → REPLAY the whole append
    (at-least-once crash window; reads survive it via the pruned-scan
    distinct, index/inverted.py::phrase_search_positional) → tombstone-
    delete the phrase's top-1 match → compact
    (index/inverted.py::compact_positional_index folds tombstones in
    and collapses the replay duplicates) → phrase top-10 must equal
    sliding-window counting over the raw corpus minus the victim."""
    import shutil
    import tempfile

    from ..index.inverted import (
        append_to_positional_index,
        build_positional_index,
        compact_positional_index,
        delete_from_inverted_index,
        phrase_search_positional,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="spark_graft_poscompact_")
    try:
        idx = build_positional_index(
            docs.filter(F.col("doc_id") % 10 < 7), f"{base}/idx", n_buckets=64
        )
        tail = docs.filter(F.col("doc_id") % 10 >= 7)
        append_to_positional_index(idx, tail)
        append_to_positional_index(idx, tail)  # at-least-once replay
        victim = phrase_search_positional(spark, idx, _PHRASE, k=1).head().doc_id
        delete_from_inverted_index(idx, [int(victim)])
        compacted = compact_positional_index(spark, idx, f"{base}/compacted")
        out = phrase_search_positional(spark, compacted, _PHRASE, k=10)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "text_winnow_fingerprint_overlap",
    # the winnowing pipeline is hash-CHECKABLE end to end: gram hashes
    # use the portable first-8-md5-hex family (same as the CMS oracle),
    # window minima and the per-fingerprint document counts are integer
    # math, so DuckDB rebuilds identical fingerprints and identical
    # overlap counts.
    oracle="""
WITH l AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - 4, 1) + 1),
           i -> ('0x' || substring(md5(substr(text, i::INTEGER, 5)), 1, 8))::BIGINT
         ) AS hs
  FROM documents
),
w AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(hs) - 3, 1) + 1),
           j -> list_min(hs[j:j+3]))) AS fps
  FROM l
),
f AS (SELECT doc_id, unnest(fps) AS fp FROM w),
c AS (SELECT fp, count(*) AS n_docs FROM f GROUP BY fp)
SELECT f.doc_id,
       count(*)::BIGINT AS n_fingerprints,
       sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_shared
FROM f JOIN c USING (fp)
GROUP BY f.doc_id
""",
    tags=("text", "fingerprint", "winnowing", "dedup"),
)
def text_winnow_fingerprint_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. SIGMOD'03 —
    the MOSS overlap detector; the brief's rolling-hash fingerprinting
    operator): hash every 5-char gram, keep each 4-window's minimum,
    and audit per document how many of its fingerprints occur in other
    documents too. Fingerprinting is per-doc expression work (no
    shuffle); the overlap audit is ONE shuffle keyed by fingerprint —
    carrying the winnowed ~2/(w+1) fraction of gram count, never the
    text (operators/fingerprint.py)."""
    from ..operators.fingerprint import fingerprint_overlap_stats

    docs = load_table(spark, sf_dir, "documents")
    return fingerprint_overlap_stats(
        docs,
        k=5,
        window=4,
        min_partitions=spark.sparkContext.defaultParallelism,
    )


#: Dyadic query weights (exactly representable doubles), so every
#: product with an integer tf — and their fixed-order sum — is EXACT.
_SPARSE_WEIGHTS = {"vector": 1.5, "spark": 0.75, "stream": 1.25}


@register(
    "text_sparse_weighted_topk",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id,
         sum(CASE WHEN term = 'vector' THEN 1 ELSE 0 END)::DOUBLE AS tf0,
         sum(CASE WHEN term = 'spark' THEN 1 ELSE 0 END)::DOUBLE AS tf1,
         sum(CASE WHEN term = 'stream' THEN 1 ELSE 0 END)::DOUBLE AS tf2
  FROM tok WHERE term IN ('vector', 'spark', 'stream') GROUP BY doc_id
)
SELECT doc_id, round(1.5 * tf0 + 0.75 * tf1 + 1.25 * tf2, 6) AS sparse_score
FROM tf
ORDER BY sparse_score DESC, doc_id ASC
LIMIT 10
""",
    tags=("text", "sparse", "inverted-index", "search"),
)
def text_sparse_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-vector retrieval (the SPLADE / Milvus sparse-embedding
    query shape) over the posting-list layout: score = Σ w_t · tf_td for
    the query's nonzero terms, reading only those terms' crc32 bucket
    partitions. Dyadic weights × integer tf keep the double score exact,
    so the full-scan SQL oracle is hash-exact against the index path."""
    from ..index.inverted import sparse_dot_topk

    idx = get_inverted_index(spark, sf_dir)
    return sparse_dot_topk(spark, idx, _SPARSE_WEIGHTS, k=10)


_BM25_BATCH = {
    0: ("vector", "stream", "window"),
    1: ("hash", "join", "merge"),
    2: ("spark", "table"),
}


@register(
    "text_bm25_batch_topk",
    oracle="\nUNION ALL\n".join(
        f"""SELECT {qid} AS query_id, doc_id, bm25 FROM (
WITH {_bm25_oracle_ctes(terms)}
SELECT doc_id, round(bm25, 6) AS bm25
FROM bm25_scored
ORDER BY round(bm25, 6) DESC, doc_id ASC
LIMIT 10)"""
        for qid, terms in _BM25_BATCH.items()
    ),
    tags=("text", "bm25", "batch", "inverted-index"),
)
def text_bm25_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three lexical queries answered in ONE postings scan (the lexical
    twin of vector_ivf_batch_topk's amortized-scan MPP pattern): union
    bucket pruning, one doc-keyed pivot of every distinct term, per-query
    fixed-order score expressions, per-query rank window. The oracle is
    the UNION ALL of the three single-query full-scan SQLs — the batch
    path must reproduce each exactly."""
    from ..index.inverted import bm25_search_inverted_batch

    idx = get_inverted_index(spark, sf_dir)
    return bm25_search_inverted_batch(spark, idx, _BM25_BATCH, k=10)


@register(
    "text_bigram_lm_quality",
    # full closed-form mirror of operators/textstats.bigram_lm_scores:
    # integer-exact counts, ln parity (proven by the BM25 oracles), and
    # the per-doc float fold pinned to POSITION order on both engines
    oracle=f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(text, '{{TOKEN_PATTERN}}') AS ts FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)),
                i -> {{'pos': i, 'w1': ts[i], 'w2': ts[i+1]}})) AS s
  FROM tok WHERE len(ts) >= 2
),
r AS (SELECT doc_id, s.pos AS pos, s.w1 AS w1, s.w2 AS w2 FROM bg),
bgc AS (SELECT w1, w2, count(*)::DOUBLE AS c_bg FROM r GROUP BY 1, 2),
ctx AS (SELECT w1, count(*)::DOUBLE AS c_ctx FROM r GROUP BY 1),
v AS (
  SELECT count(DISTINCT t)::DOUBLE AS v
  FROM (SELECT unnest(regexp_extract_all(text, '{{TOKEN_PATTERN}}')) AS t
        FROM documents)
),
s AS (
  SELECT r.doc_id, r.pos,
         ln((bgc.c_bg + 1.0) / (ctx.c_ctx + v.v)) AS logp
  FROM r JOIN bgc USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v
),
d AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         list_sum(list(logp ORDER BY pos)) AS sum_logp
  FROM s GROUP BY doc_id
)
SELECT doc_id, n_bigrams, round(sum_logp / n_bigrams, 6) AS avg_logp
FROM d
""".replace("{TOKEN_PATTERN}", TOKEN_PATTERN),
    tags=("text", "quality", "lm", "perplexity"),
)
def text_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scores from a corpus-trained add-one
    bigram LM (the CCNet/KenLM-shaped filter): every doc's average
    token-transition log-probability, hash-exact end to end — counts,
    smoothing, and the position-ordered float fold all mirrored in SQL
    (operators/textstats.py::bigram_lm_scores for the broadcast-counts
    scale shape)."""
    from ..operators.textstats import bigram_lm_scores

    # CPU-dense per-row stage over ~10x-compressed text: widen beyond
    # the bytes-sized scan split (sources/tables.py::widen_cpu_dense)
    docs = widen_cpu_dense(load_table(spark, sf_dir, "documents"))
    out = bigram_lm_scores(docs)
    return out.select(
        "doc_id", "n_bigrams", F.round("avg_logp", 6).alias("avg_logp")
    )


@register(
    "text_inverted_merge_parity",
    oracle=f"""
WITH {{ctes}}
SELECT doc_id, round(bm25, 6) AS bm25
FROM bm25_scored
ORDER BY round(bm25, 6) DESC, doc_id ASC
LIMIT 10
""".format(ctes=_bm25_oracle_ctes(where="WHERE doc_id <> 259")),
    tags=("text", "bm25", "inverted-index", "maintenance", "segment-merge"),
)
def text_inverted_merge_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSM-style SEGMENT MERGE, hash-checked: the corpus is indexed as
    three independent segments (disjoint thirds, deliberately built with
    DIFFERENT bucket counts: 64/32/16), one segment takes a
    tombstone-delete of doc 259 (a doc in the undeleted top-10, so the
    delete visibly changes the answer), then the segments merge into one
    64-bucket layout. BM25 top-10 from the merged layout must equal the
    clean full-scan SQL over the live corpus — the invariant that lets
    segmented parallel ingest + off-path merging serve exact answers at
    100 TB (index/inverted.py::merge_inverted_indexes: re-bucketing,
    tombstone folding and stats recompute are all under test here)."""
    import hashlib
    import shutil

    from ..index.inverted import (
        build_inverted_index,
        bm25_search_inverted,
        delete_from_inverted_index,
        merge_inverted_indexes,
    )

    tag = hashlib.md5(f"{sf_dir}|segmerge".encode()).hexdigest()[:8]
    base = f"/tmp/spark_graft_invmerge_{tag}"
    shutil.rmtree(base, ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents")
    segs = []
    for i, nb in enumerate((64, 32, 16)):
        segs.append(
            build_inverted_index(
                docs.filter(F.col("doc_id") % 3 == i), f"{base}/seg{i}", n_buckets=nb
            )
        )
    # doc 259 ≡ 1 (mod 3) lives in segment 1; delete it there
    delete_from_inverted_index(segs[1], [259])
    merged = merge_inverted_indexes(spark, segs, f"{base}/merged", n_buckets=64)
    return bm25_search_inverted(spark, merged, _BM25_TERMS, k=10)


@register(
    "text_bpe_word_freqs",
    # Hash anchor for the BPE family: the corpus tier (word-frequency
    # table) and the trainer's FIRST decision (argmax pair count with
    # the freq-desc → lexicographic tiebreak) ARE closed-form SQL, even
    # though the iterated merge loop is not. Rank 1 of this result is
    # bpe_train(...)[0] by construction (pinned in tests).
    oracle=f"""
WITH w AS (
  SELECT t AS word, count(*)::BIGINT AS freq
  FROM (SELECT unnest(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS t
        FROM documents)
  GROUP BY 1
),
pairs AS (
  SELECT freq,
         unnest(list_concat(
           list_transform(range(1, len(word)),
                          i -> {{'a': word[i:i], 'b': word[i+1:i+1]}}),
           [{{'a': word[len(word):len(word)], 'b': '</w>'}}]
         )) AS p
  FROM w
),
pc AS (
  SELECT p.a AS left_sym, p.b AS right_sym, sum(freq)::BIGINT AS pair_count
  FROM pairs GROUP BY 1, 2
),
top AS (
  SELECT * FROM pc ORDER BY pair_count DESC, left_sym, right_sym LIMIT 50
)
SELECT row_number() OVER (ORDER BY pair_count DESC, left_sym, right_sym)
         ::INTEGER AS rank,
       left_sym, right_sym, pair_count
FROM top
""",
    tags=("text", "bpe", "tokenizer", "training-data"),
)
def text_bpe_word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-expressible tiers of BPE training, as a hash-checkable
    twin of text_bpe_vocab_merges: the corpus word-frequency pass
    (operators/bpe.py word_frequencies — the ONE corpus-scale stage),
    then the symbol-pair counts over that table with each word's
    characters plus the `</w>` end marker. Ordered by (count desc,
    pair asc) — exactly bpe_train's argmax + tiebreak — so rank 1 IS
    the trainer's first merge.

    Scale shape: corpus-scale work is the single tokenize + groupBy
    shuffle (map-side combined, vocabulary-sized output); the pair
    explode and pair groupBy run over the vocab-sized table; the top-50
    is TakeOrderedAndProject and the rank window sees 50 rows."""
    from ..operators.bpe import END_OF_WORD, word_frequencies

    docs = load_table(spark, sf_dir, "documents")
    freqs = word_frequencies(docs)
    # Adjacent symbol pairs of word + </w>: substring is codepoint-based
    # (matches Python tuple(word) and DuckDB's char slicing for CJK).
    pair_at = (
        "transform(sequence(1, length(word)), i -> struct("
        "substring(word, i, 1) AS left_sym, "
        f"CASE WHEN i < length(word) THEN substring(word, i + 1, 1) "
        f"ELSE '{END_OF_WORD}' END AS right_sym))"
    )
    pc = (
        freqs.select(F.explode(F.expr(pair_at)).alias("p"), "freq")
        .groupBy(F.col("p.left_sym").alias("left_sym"),
                 F.col("p.right_sym").alias("right_sym"))
        .agg(F.sum("freq").alias("pair_count"))
    )
    top = pc.orderBy(
        F.col("pair_count").desc(), F.col("left_sym").asc(),
        F.col("right_sym").asc(),
    ).limit(50)
    w = Window.orderBy(
        F.col("pair_count").desc(), F.col("left_sym").asc(),
        F.col("right_sym").asc(),
    )
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "left_sym", "right_sym", "pair_count"
    )


@register(
    "text_bpe_vocab_merges",
    # A sequential merge loop (merge i+1 counts pairs that only exist
    # after merge i) has no SQL encoding — rows-only for the driver;
    # tests/test_operators.py pins the paper's classic example and the
    # roundtrip/determinism invariants.
    oracle=None,
    tags=("text", "bpe", "tokenizer", "training-data"),
)
def text_bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary training over the corpus: ONE Spark pass reduces
    the documents to a word-frequency table (the only corpus-scale
    stage), then the classic Sennrich merge loop runs driver-side over
    that vocabulary-sized dict (operators/bpe.py — the same two-tier
    shape HuggingFace/SentencePiece trainers use). Returns the ordered
    merge table (rank, left, right) — deterministic: frequency desc,
    lexicographic tiebreak."""
    from ..operators.bpe import bpe_train, word_frequencies

    docs = load_table(spark, sf_dir, "documents")
    freqs = [(r["word"], r["freq"]) for r in word_frequencies(docs).collect()]
    merges = bpe_train(sorted(freqs), num_merges=50)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )


@register(
    "text_nb_lang_confusion",
    # full closed-form mirror of textstats.naive_bayes_lang_predictions:
    # integer-exact counts, add-one smoothing, position-ordered fold,
    # score-desc/label-asc argmax
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, regexp_extract_all(text, '{{TOKEN_PATTERN}}') AS ts
  FROM documents
),
r0 AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(ts) + 1),
                i -> {{'pos': i, 't': ts[i]}})) AS s
  FROM tok WHERE len(ts) >= 1
),
rr AS (SELECT doc_id, lang, s.pos AS pos, s.t AS t FROM r0),
ct AS (SELECT lang AS cand_lang, t, count(*)::DOUBLE AS c_lt FROM rr GROUP BY 1, 2),
tot AS (SELECT lang AS cand_lang, count(*)::DOUBLE AS c_l FROM rr GROUP BY 1),
pri AS (
  SELECT lang AS cand_lang,
         ln(count(*)::DOUBLE / (SELECT count(*)::DOUBLE FROM documents)) AS lp
  FROM documents GROUP BY 1
),
v AS (SELECT count(DISTINCT t)::DOUBLE AS v FROM rr),
langs AS (SELECT DISTINCT lang AS cand_lang FROM documents),
sc AS (
  SELECT rr.doc_id, rr.lang, l.cand_lang, rr.pos,
         ln((coalesce(ct.c_lt, 0.0) + 1.0) / (tot.c_l + v.v)) AS logp
  FROM rr CROSS JOIN langs l
  LEFT JOIN ct ON ct.cand_lang = l.cand_lang AND ct.t = rr.t
  JOIN tot ON tot.cand_lang = l.cand_lang
  CROSS JOIN v
),
per AS (
  SELECT doc_id, lang, cand_lang,
         list_sum(list(logp ORDER BY pos)) AS sum_logp
  FROM sc GROUP BY 1, 2, 3
),
scored AS (
  SELECT per.doc_id, per.lang, per.cand_lang, pri.lp + per.sum_logp AS score
  FROM per JOIN pri USING (cand_lang)
),
pred AS (
  SELECT doc_id, lang, cand_lang AS pred_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand_lang ASC) AS rn
  FROM scored
)
SELECT lang, pred_lang, count(*)::BIGINT AS n_docs
FROM pred WHERE rn = 1 GROUP BY 1, 2
""".replace("{TOKEN_PATTERN}", TOKEN_PATTERN),
    tags=("text", "lang-id", "classifier", "naive-bayes", "training-data"),
)
def text_nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised language identification: a multinomial naive-Bayes
    classifier TRAINED on the corpus labels and applied back to it, one
    DAG, reported as the (true lang, predicted lang, n_docs) confusion
    matrix. NB training is pure counting, so the distributed 'fit' is
    three broadcastable aggregates and inference is a bounded label
    fan-out — the closed-form stand-in for the fastText-style quality/
    language classifiers of production data pipelines, hash-checked
    end to end including the argmax
    (operators/textstats.py::naive_bayes_lang_predictions)."""
    from ..operators.textstats import naive_bayes_lang_predictions

    # CPU-dense per-row stage over ~10x-compressed text: widen beyond
    # the bytes-sized scan split (sources/tables.py::widen_cpu_dense)
    docs = widen_cpu_dense(load_table(spark, sf_dir, "documents"))
    preds = naive_bayes_lang_predictions(docs)
    return preds.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


#: Shared by the batch heavy-hitter query and its streaming twin
#: (stream_cms_documents) — both must reproduce this matrix exactly.
CMS_HH_ORACLE = f"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(text, '{{TOKEN_PATTERN}}')) AS t FROM documents
),
exact AS (
  SELECT t, count(*)::BIGINT AS exact_count
  FROM tok GROUP BY t ORDER BY exact_count DESC, t ASC LIMIT 20
),
ds AS (SELECT unnest(range(0, 4)) AS d),
pairs AS (
  SELECT d, ('0x' || substring(md5(d::VARCHAR || '|' || t), 1, 8))::BIGINT % 16
           AS bucket
  FROM tok CROSS JOIN ds
),
sketch AS (SELECT d, bucket, count(*)::BIGINT AS c FROM pairs GROUP BY 1, 2),
qp AS (
  SELECT e.t, e.exact_count, ds.d,
         ('0x' || substring(md5(ds.d::VARCHAR || '|' || e.t), 1, 8))::BIGINT % 16
           AS bucket
  FROM exact e CROSS JOIN ds
)
SELECT qp.t AS token, qp.exact_count, min(s.c) AS cms_estimate
FROM qp JOIN sketch s USING (d, bucket)
GROUP BY 1, 2
""".replace("{TOKEN_PATTERN}", TOKEN_PATTERN)


@register(
    "agg_count_min_heavy_hitters",
    # the sketch is hash-CHECKABLE despite being approximate: its state
    # is a deterministic counter matrix under the md5 hash family, so
    # DuckDB rebuilds the identical matrix and identical estimates
    oracle=CMS_HH_ORACLE,
    tags=("agg", "sketch", "count-min", "heavy-hitters"),
)
def agg_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy-hitter check, hash-exact end to end: build
    the depth=4 × width=16 counter matrix over all token occurrences
    (the shuffle carries ≤ depth×width rows per partition — sketch-sized
    regardless of corpus), then estimate the top-20 exact tokens'
    frequencies from it. Width 16 forces real collisions on this vocab,
    so estimates visibly overcount — and the overcounts themselves are
    deterministic and oracle-checked, unlike the engine-internal HLL/GK
    sketches that can only be bounds-tested
    (operators/sketch.py::count_min_sketch)."""
    from ..operators.sketch import cms_estimates, count_min_sketch

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(extract_tokens(F.col("text"))).alias("t"))
    sketch = count_min_sketch(tok, depth=4, width=16)
    exact = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("t").asc())
        .limit(20)
    )
    est = cms_estimates(sketch, exact.select("t"), depth=4, width=16)
    return (
        exact.join(est, "t")
        .select(F.col("t").alias("token"), "exact_count", "cms_estimate")
    )


@register(
    "text_chapter_parse_roundtrip",
    # each synthetic chapter holds two documents' texts as its content
    # lines; the corpus is single-line and marker-free (verified: no
    # newlines, no 章 characters), so the parse must recover exactly
    # (chapter k) -> docs 2k and 2k+1. The edge-strip mirrors Python
    # str.strip()'s whitespace set (the parser strips each line with
    # .strip(), and DuckDB's trim() is space-only — a tab/CR/ideographic
    # space at a text edge would silently diverge otherwise)
    oracle=r"""
WITH s AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(text,
             '^[ \t\r\n\f\v 　]+', ''),
             '[ \t\r\n\f\v 　]+$', '') AS content
  FROM documents WHERE doc_id < 20
)
SELECT '第一章 ' || (doc_id // 2)::VARCHAR AS chapter, content
FROM s WHERE content <> ''
""",
    tags=("text", "chapter", "source", "parse"),
)
def text_chapter_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's pasted-text chapter parser (S7 + the F6 header
    regex, src/app.py:549-599), hash-checked end to end: assemble a
    pasted corpus from the first 20 documents — a 第一章-marked header
    every two documents, the documents' texts as content lines — then
    parse it back into (chapter, content) rows with the distributed
    last-seen-header window (sources/csv_source.py::parse_chapter_text).
    The oracle states the roundtrip directly: every content line must
    land under the header written two-docs back, which exercises header
    detection, line stripping, empty-line dropping, and the
    unbounded-preceding assignment window against real corpus text."""
    from ..sources.csv_source import parse_chapter_text

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    lines: list[str] = []
    for d in docs:
        if d.doc_id % 2 == 0:
            lines.append(f"第一章 {d.doc_id // 2}")
        lines.append(d.text)
    return parse_chapter_text(spark, "\n".join(lines))
