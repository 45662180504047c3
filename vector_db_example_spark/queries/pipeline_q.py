"""End-to-end pipeline query inventory: CSV ingestion (S1–S4), collection
catalog round-trip (S5/S8/S9), and the multi-strategy retrieval pipeline
(M5) running on the hashing embedder (F7).

The ingestion queries derive their CSV input from the `documents` table
deterministically (pandas write of the same parquet both engines read),
so the oracle can state the expected end-state directly over `documents`.
The multi-strategy query is rows-only: its query vectors come from the
Python hashing embedder, which SQL cannot express.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import CollectionCatalog
from ..functions.embedding import hashing_embedder
from ..operators.multi_strategy import multi_strategy_search
from ..sources.csv_source import load_knowledge_csv
from ..sources.tables import load_table
from .registry import register


def _derived_csv_path(sf_dir: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/spark_graft_kb_{tag}.csv"


def _write_kb_csv(sf_dir: str) -> str:
    """Derive a knowledge CSV (knowledge_col/章节-style sniffing exercised
    via non-canonical header names) from documents.parquet."""
    import pandas as pd

    path = _derived_csv_path(sf_dir)
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    pdf = pdf.rename(columns={"source": "章节", "text": "knowledge_text"})
    pdf.to_csv(path, index=False)
    return path


@register(
    "pipeline_ingest_csv",
    oracle=r"""
SELECT source AS chapter,
       count(*)::BIGINT AS n_docs,
       sum(length(trim(regexp_replace(regexp_replace(text,
             '[^\w一-鿿\s.,!?;:，。！？；：]', '', 'g'), '\s+', ' ', 'g'))))::BIGINT
         AS total_chars
FROM documents
WHERE length(trim(regexp_replace(regexp_replace(text,
        '[^\w一-鿿\s.,!?;:，。！？；：]', '', 'g'), '\s+', ' ', 'g'))) >= 10
GROUP BY source
""",
    tags=("pipeline", "S1", "S2", "S3", "F1"),
)
def pipeline_ingest_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1–S3 + F1 + P4 end-to-end: CSV with non-canonical headers
    (章节 / knowledge_text) → column sniffing → clean → length filter →
    per-chapter stats. Oracle states the same end-state over documents."""
    path = _write_kb_csv(sf_dir)
    kb = load_knowledge_csv(spark, path)
    return kb.groupBy(F.col("chapter")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("content")).alias("total_chars"),
    )


@register(
    "pipeline_catalog_roundtrip",
    oracle=r"""
SELECT count(*)::BIGINT AS row_count, 4::INTEGER AS n_fields
FROM documents
WHERE length(trim(regexp_replace(regexp_replace(text,
        '[^\w一-鿿\s.,!?;:，。！？；：]', '', 'g'), '\s+', ' ', 'g'))) >= 10
""",
    tags=("pipeline", "S5", "S8", "S9"),
)
def pipeline_catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 DDL + S5 batched embed-insert + S9 true stats, end to end:
    create collection (force), ingest cleaned documents with the hashing
    embedder, read back the TRUE count (not the reference's stats bug)."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    cat = CollectionCatalog(spark, root=f"/tmp/spark_graft_cat_{tag}")
    cat.create("kb", dim=16, force_recreate=True)
    rows = (
        load_knowledge_csv(spark, _write_kb_csv(sf_dir))
        .select("chapter", "content")
    )
    cat.insert("kb", rows, embedder=hashing_embedder(16)(F.col("content")))
    st = cat.stats("kb")
    return spark.createDataFrame(
        [(st["row_count"], len(st["fields"]))], "row_count bigint, n_fields int"
    )


@register(
    "pipeline_multi_strategy",
    oracle=None,  # query vectors come from the Python hashing embedder
    tags=("pipeline", "M5", "J2", "U2", "W1"),
    bench=True,
)
def pipeline_multi_strategy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 flagship: multi-strategy retrieval (vector + keyword + chunk,
    reference constants) over an embedded documents corpus, for two
    deterministically-derived questions, in one DAG."""
    docs = load_table(spark, sf_dir, "documents")
    embed = hashing_embedder(64)
    corpus = docs.select(
        F.col("doc_id").alias("id"),
        F.col("source").alias("chapter"),
        F.col("text").alias("content"),
        embed(F.col("text")).alias("vector"),
    )
    questions = (
        docs.filter(F.col("doc_id").isin(0, 7))
        .select(
            F.col("doc_id").alias("question_id"),
            F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 1, 8), " ").alias(
                "question"
            ),
        )
    )
    return multi_strategy_search(
        corpus,
        questions,
        embedder=embed(F.col("qtext")),
        top_k=5,
        score_threshold=-1.0,  # unit-norm corpus: keep all, rank by score
    )
