"""Knowledge-base CSV ingestion (SURVEY.md §2.1 S1–S4, S7).

Reproduces the reference's ingestion semantics Spark-first:

* S1 — CSV read with header + quoted multi-line fields
  (reference pd.read_csv, src/app.py:156-188)
* S2 — column auto-detection by name substring ('chapter'/'章节',
  'content'/'内容'/'knowledge'), falling back to the first two columns
  (src/app.py:163-175)
* S3 — non-empty content filter (src/app.py:177-182)
* S4 — fallback literal rows when the CSV is missing/empty
  (src/app.py:120-154)
* S7 — chapter-header text-format parser (第X章 / '章节' markers,
  src/app.py:549-599), implemented distributed: lines → header flags →
  running group assignment via a window, not a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import fsio
from ..functions.text import clean_content, is_chapter_header

#: S4 fallback corpus — engine-original example rows (the reference ships
#: seven hardcoded DB-course facts; ours are equivalent-purpose).
EXAMPLE_ROWS: list[tuple[str, str]] = [
    ("Chapter 1", "A database is an organized collection of structured data."),
    ("Chapter 1", "A DBMS provides storage, querying and transaction management."),
    ("Chapter 2", "The relational model organizes data into relations (tables)."),
    ("Chapter 2", "A key uniquely identifies a tuple within a relation."),
    ("Chapter 3", "Physical data independence isolates schemas from storage layout."),
    ("Chapter 3", "A data model has structure, operations and integrity constraints."),
    ("Chapter 4", "The network model represents records as nodes with many-to-many links."),
]

CHAPTER_NAME_HINTS = ("chapter", "章节")
CONTENT_NAME_HINTS = ("content", "内容", "knowledge")


def sniff_columns(columns: list[str]) -> tuple[str, str]:
    """S2: pick (chapter_col, content_col) by name substring, falling back
    to the first two columns (reference src/app.py:163-175)."""
    chapter = next(
        (c for c in columns if any(h in c.lower() for h in CHAPTER_NAME_HINTS)), None
    )
    content = next(
        (c for c in columns if any(h in c.lower() for h in CONTENT_NAME_HINTS)), None
    )
    if chapter is None or content is None:
        if len(columns) < 2:
            raise ValueError(f"need at least 2 columns, got {columns}")
        chapter = chapter or columns[0]
        content = content or (columns[1] if columns[1] != chapter else columns[0])
    return chapter, content


def example_data(spark: SparkSession) -> DataFrame:
    """S4: the fallback literal source."""
    return spark.createDataFrame(EXAMPLE_ROWS, "chapter string, content string")


def load_knowledge_csv(
    spark: SparkSession,
    path: str,
    min_content_length: int = 10,
    preprocess: bool = True,
) -> DataFrame:
    """S1–S4: read, sniff columns, normalize to (chapter, content), drop
    empties, optionally clean + length-filter (F1 + P4). Falls back to
    the example rows when the file is missing or yields no usable rows
    (reference _load_initial_data, src/app.py:120-142)."""
    # fsio (Hadoop FS), not os.path: knowledge CSVs can live on any
    # scheme the cluster reads (the missing-file fallback still fires).
    if not fsio.exists(path, spark):
        return example_data(spark)
    df = spark.read.csv(path, header=True, multiLine=True, quote='"', escape='"')
    if len(df.columns) < 2:
        return example_data(spark)
    chapter_col, content_col = sniff_columns(df.columns)
    out = df.select(
        F.coalesce(F.col(chapter_col).cast("string"), F.lit("")).alias("chapter"),
        F.col(content_col).cast("string").alias("content"),
    ).filter(F.col("content").isNotNull() & (F.trim(F.col("content")) != ""))
    if preprocess:
        out = out.withColumn("content", clean_content(F.col("content"))).filter(
            F.length("content") >= min_content_length
        )
    # The reference falls back to examples when the CSV has no usable rows.
    # Materialize before the emptiness probe so the clean+filter pipeline
    # runs ONCE: the probe reads the snapshot, and so does every
    # downstream consumer (previously the probe was its own throwaway
    # limit(1) job through the full pipeline). Knowledge-base CSVs are
    # small by contract (the reference's are KB-sized), so snapshotting
    # them in executor storage is the right trade.
    out = out.localCheckpoint(eager=True)
    if not out.head(1):
        return example_data(spark)
    return out


def parse_chapter_text(spark: SparkSession, text: str) -> DataFrame:
    """S7: parse pasted multi-line text into (chapter, content) rows.

    Distributed formulation of the reference's line loop
    (src/app.py:549-599): each line gets a header flag, a running
    last-seen-header (max over an unbounded-preceding window keyed by
    line number) assigns content lines to their chapter.
    """
    lines = [ln.strip() for ln in text.splitlines()]
    rows = [(i, ln) for i, ln in enumerate(lines) if ln]
    if not rows:
        return spark.createDataFrame([], "chapter string, content string")
    df = spark.createDataFrame(rows, "line_no long, line string")
    flagged = df.withColumn("is_header", is_chapter_header(F.col("line")))
    w = Window.orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    assigned = flagged.withColumn(
        "header_no",
        F.max(F.when(F.col("is_header"), F.col("line_no"))).over(w),
    )
    headers = assigned.filter(F.col("is_header")).select(
        F.col("line_no").alias("header_no"), F.col("line").alias("chapter")
    )
    return (
        assigned.filter(~F.col("is_header") & F.col("header_no").isNotNull())
        .join(headers, "header_no")
        .select("chapter", F.col("line").alias("content"))
    )
