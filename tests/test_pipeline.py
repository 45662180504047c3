"""Ingestion, catalog, and multi-strategy pipeline behavior tests
(the reference's app-level semantics: column sniffing, fallbacks,
idempotent DDL, validated inserts, golden retrieval)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_csv_sniffing_variants(spark, tmp_path):
    from vector_db_example_spark.sources.csv_source import load_knowledge_csv

    # canonical, chinese, fallback-positional headers (reference S2)
    variants = {
        "canonical.csv": "chapter,content\nc1,some long enough content here\n",
        "chinese.csv": "章节,内容\nc1,some long enough content here\n",
        "anon.csv": "colA,colB\nc1,some long enough content here\n",
    }
    for fname, body in variants.items():
        p = tmp_path / fname
        p.write_text(body)
        df = load_knowledge_csv(spark, str(p))
        rows = df.collect()
        assert [r.chapter for r in rows] == ["c1"], fname
        assert rows[0].content == "some long enough content here", fname


def test_csv_missing_falls_back_to_examples(spark):
    from vector_db_example_spark.sources.csv_source import (
        EXAMPLE_ROWS,
        load_knowledge_csv,
    )

    df = load_knowledge_csv(spark, "/nonexistent/path.csv")
    assert df.count() == len(EXAMPLE_ROWS)


def test_csv_empty_content_filtered(spark, tmp_path):
    from vector_db_example_spark.sources.csv_source import load_knowledge_csv

    p = tmp_path / "gaps.csv"
    p.write_text(
        "chapter,content\nc1,this row is long enough to stay\nc2,\nc3,short\n"
    )
    df = load_knowledge_csv(spark, str(p))
    assert [r.chapter for r in df.collect()] == ["c1"]  # empty + P4 dropped


def test_chapter_text_parser(spark):
    from vector_db_example_spark.sources.csv_source import parse_chapter_text

    text = """第一章 绪论
数据库系统的基本概念介绍。
数据模型的三要素。
第二章 关系模型
关系代数与关系演算。
"""
    rows = parse_chapter_text(spark, text).collect()
    got = {(r.chapter, r.content) for r in rows}
    assert got == {
        ("第一章 绪论", "数据库系统的基本概念介绍。"),
        ("第一章 绪论", "数据模型的三要素。"),
        ("第二章 关系模型", "关系代数与关系演算。"),
    }


def test_catalog_ddl_idempotent_and_stats(spark, tmp_path):
    from vector_db_example_spark.catalog import CollectionCatalog
    from vector_db_example_spark.functions.embedding import hashing_embedder

    cat = CollectionCatalog(spark, root=str(tmp_path / "cols"))
    assert cat.create("kb", dim=8) is True
    assert cat.exists("kb")
    assert cat.create("kb", dim=8) is False  # idempotent reuse
    rows = spark.createDataFrame(
        [("c1", "first content row long enough"), ("c2", "second content row long enough")],
        "chapter string, content string",
    )
    n = cat.insert("kb", rows, embedder=hashing_embedder(8)(F.col("content")))
    assert n == 2
    st = cat.stats("kb")
    assert st["row_count"] == 2  # TRUE count (reference bug not replicated)
    # append again: ids stay unique
    cat.insert("kb", rows, embedder=hashing_embedder(8)(F.col("content")))
    ids = [r.id for r in cat.read("kb").select("id").collect()]
    assert len(ids) == len(set(ids)) == 4
    assert cat.create("kb", force_recreate=True) is True
    assert cat.stats("kb")["row_count"] == 0


def test_catalog_insert_one_validation(spark, tmp_path):
    from vector_db_example_spark.catalog import CollectionCatalog

    cat = CollectionCatalog(spark, root=str(tmp_path / "cols"))
    cat.create("kb", dim=8)
    ok, _ = cat.insert_one("kb", "", "long enough content here")
    assert not ok
    ok, _ = cat.insert_one("kb", "c1", "short")
    assert not ok
    ok, msg = cat.insert_one("kb", "c1", "this content is long enough to pass")
    assert ok, msg
    assert cat.stats("kb")["row_count"] == 1


def test_multi_strategy_golden_retrieval(spark):
    """Golden: a question quoting a document's words retrieves that
    document first via the vector strategy; keyword strategy contributes
    hits; dedup keeps one row per content prefix."""
    from vector_db_example_spark.functions.embedding import hashing_embedder
    from vector_db_example_spark.operators.multi_strategy import (
        multi_strategy_search,
    )

    corpus_rows = [
        (1, "ch1", "physical data independence separates schema from storage layout"),
        (2, "ch1", "a key uniquely identifies a tuple within a relation model"),
        (3, "ch2", "the network model represents records as linked nodes"),
        (4, "ch2", "query optimization rewrites logical plans into physical plans"),
    ]
    embed = hashing_embedder(64)
    corpus = spark.createDataFrame(
        corpus_rows, "id long, chapter string, content string"
    ).withColumn("vector", embed(F.col("content")))
    questions = spark.createDataFrame(
        [(1, "what is physical data independence storage layout")],
        "question_id long, question string",
    )
    out = multi_strategy_search(
        corpus, questions, embedder=embed(F.col("qtext")), top_k=3,
        score_threshold=-1.0,
    ).collect()
    assert out, "no results"
    assert out[0].id == 1  # the quoted document wins
    assert len({r.content[:50] for r in out}) == len(out)  # deduped
    strategies = {r.strategy for r in out}
    assert "vector" in strategies


def test_multi_strategy_chunk_path_triggers(spark):
    from vector_db_example_spark.operators.multi_strategy import (
        build_strategy_queries,
    )

    qs = spark.createDataFrame(
        [
            (1, "short one"),
            (2, "first clause with words, second clause with words, third bit"),
        ],
        "question_id long, question string",
    )
    out = build_strategy_queries(qs).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.question_id, set()).add(r.strategy)
    assert "chunk" not in by_q[1]  # len <= 20: no chunk strategy
    assert "chunk" in by_q[2]
    chunk_rows = [r for r in out if r.strategy == "chunk"]
    assert len(chunk_rows) == 2  # first 2 chunks only (reference constant)
    assert all(r.k == 1 for r in chunk_rows)


def test_empty_question_yields_no_rows(spark):
    """P3: empty / whitespace-only questions produce zero result rows
    (reference returns [] — src/app.py:242-243, 363-364)."""
    from vector_db_example_spark.functions.embedding import hashing_embedder
    from vector_db_example_spark.operators.multi_strategy import multi_strategy_search
    from pyspark.sql import functions as F

    embed = hashing_embedder(16)
    corpus = spark.createDataFrame(
        [(1, "ch1", "databases store structured data reliably")],
        "id long, chapter string, content string",
    ).withColumn("vector", embed(F.col("content")))
    questions = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "databases")],
        "question_id long, question string",
    )
    out = multi_strategy_search(
        corpus, questions, embedder=embed(F.col("qtext")), score_threshold=-1.0
    )
    got = {r["question_id"] for r in out.collect()}
    assert got == {3}


def test_multi_strategy_cjk_golden(spark):
    """CJK end-to-end golden: Chinese corpus + a long Chinese question.
    Exercises the CJK branches of every text operator at once — F2
    keyword extraction ([一-龥]{2,} runs), F3 chunk splitting on 中文
    punctuation (question > 20 chars ⇒ chunk strategy fires), F1-safe
    content, and the strategy-priority dedup — the reference's actual
    use-case (a Chinese DB course)."""
    from vector_db_example_spark.functions.embedding import hashing_embedder
    from vector_db_example_spark.operators.multi_strategy import (
        build_strategy_queries,
        multi_strategy_search,
    )

    corpus_rows = [
        (1, "第一章", "数据的物理独立性 是指 应用程序 与 磁盘上 数据 的 存储 相互独立"),
        (2, "第一章", "码 是指 唯一 标识 实体 的 属性集合"),
        (3, "第二章", "数据模型 的 三要素 是 数据结构 数据操作 和 完整性约束"),
        (4, "第二章", "网状模型 的 缺点 是 结构复杂 且 应用程序 编写 困难"),
    ]
    embed = hashing_embedder(64)
    corpus = spark.createDataFrame(
        corpus_rows, "id long, chapter string, content string"
    ).withColumn("vector", embed(F.col("content")))
    question = "数据的物理独立性 是指 什么，它 与 存储 有什么 关系？"
    assert len(question) > 20  # chunk strategy must trigger
    questions = spark.createDataFrame(
        [(1, question)], "question_id long, question string"
    )

    squeries = build_strategy_queries(questions).collect()
    by_strategy = {}
    for r in squeries:
        by_strategy.setdefault(r.strategy, []).append(r.qtext)
    # CJK keywords extracted (>=2-char runs), CJK-punctuation chunks split
    assert by_strategy.get("keyword"), "no CJK keywords extracted"
    assert all(len(k) >= 2 for k in by_strategy["keyword"])
    assert len(by_strategy.get("chunk", [])) == 2  # split on ，and ？

    out = multi_strategy_search(
        corpus, questions, embedder=embed(F.col("qtext")), top_k=3,
        score_threshold=-1.0,
    ).collect()
    assert out and out[0].id == 1  # the quoted 物理独立性 doc wins
    assert len({r.content[:50] for r in out}) == len(out)
