"""Persisted incremental-dedup layout: MinHash band keys as an index.

The batch dedup operators (operators/dedup.py) answer "which documents in
THIS frame are near-duplicates of each other" — one shot, whole corpus.
A 100 TB training-data pipeline almost never asks that question twice:
after the first global pass, every subsequent crawl batch needs "which of
these NEW documents duplicate anything we already kept?", and
re-shingling petabytes of accepted corpus per batch is exactly the
recompute this layout exists to avoid (the reference's collection is the
same shape: an accumulating store that every new insert batch is checked
against, src/app.py insert-then-search flow).

The layout persists ONLY the corpus's LSH band keys — ``(id, band,
key)``, 16 md5 strings per document via the same
shingle → minhash → band pipeline as ``minhash_near_duplicates``
(operators/dedup.py:84,99) — partitioned by ``band``. Checking a batch is
then:

1. one narrow scan of the layout reading just ``(band, key)`` (column
   pruning; the text/shingles of the accepted corpus are never touched
   again),
2. one shuffle join of the batch's bands against it on ``(band, key)``
   — 16-byte keys, AQE-skew-splittable if a boilerplate band key goes
   hot,
3. a groupBy-min within the batch for the intra-batch verdicts
   (map-side combine; never a collect).

Appending accepted survivors is a blind partitioned parquet append of
their band rows — O(batch), never a corpus rewrite.

Semantics (documented, deterministic, single-pass):

- ``corpus_dup``: the document shares ≥1 ``(band, key)`` with the
  layout — the standard LSH candidate test. Exact duplicates always
  collide (identical text ⇒ identical signature ⇒ all bands equal);
  near-duplicates collide with the usual banding probability.
- ``within_dup`` (among non-corpus-dup batch docs only): the document
  shares ≥1 band key with a LOWER-id batch document that is itself not
  a corpus dup. This is the pessimistic one-pass rule — a doc can be
  suppressed by an earlier doc that was itself suppressed by a still
  earlier one — chosen because it needs no iteration (greedy-sequential
  semantics need a transitive closure; the batch CC operators,
  operators/dedup.py:360, provide that when exactness of the survivor
  set matters more than one extra shuffle). Over-suppression at band
  level is the safe direction for dedup.
- survivors: neither flag set. ``dedup_index_append`` persists their
  bands so the next batch sees them.

Same lifecycle conventions as the IVF/LSH/inverted layouts: meta via
fsio (any filesystem scheme), persisted layout schema so a declared
EMPTY index (first-crawl bootstrap: build over zero documents, filter
the very first batch against nothing) reads well-typed.

Append-visibility hazard (regression-pinned in tests/test_dedupidx.py):
each ``dedup_index_filter`` call lists the layout's files when the
DataFrame is CREATED, so a filter built after an append sees it — but
file scans canonicalize by root path, NOT by file listing, so if a
pre-append filter and a post-append filter of the same layout execute
in ONE action (a union collected once), exchange reuse can substitute
the pre-append scan for the post-append one and the appended bands
silently vanish. Materialize pre-append verdicts (``localCheckpoint`` /
collect) before combining them with post-append reads — in a real
pipeline the stages are separate jobs and the hazard cannot arise.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import fsio
from ..operators.dedup import lsh_band_keys, minhash_signature, shingles


@dataclass
class DedupIndex:
    """Band-partitioned dedup layout on disk (the dedup twin of
    index/lsh.py::LSHIndex)."""

    path: str
    shingle_k: int
    n_hashes: int
    bands: int
    id_col: str
    text_col: str

    @property
    def rows_per_band(self) -> int:
        return self.n_hashes // self.bands

    def save_meta(self) -> None:
        meta = {
            "shingle_k": self.shingle_k,
            "n_hashes": self.n_hashes,
            "bands": self.bands,
            "id_col": self.id_col,
            "text_col": self.text_col,
        }
        fsio.write_text(f"{self.path}/_dedup_meta.json", json.dumps(meta))

    @classmethod
    def load(cls, path: str) -> "DedupIndex":
        meta = json.loads(fsio.read_text(f"{path}/_dedup_meta.json"))
        return cls(path=path, **meta)


def _band_schema(index: DedupIndex) -> T.StructType:
    """The layout schema is fully determined by the meta — no JSON blob
    needed (unlike the vector layouts, whose payload columns vary)."""
    return T.StructType(
        [
            T.StructField(index.id_col, T.LongType(), True),
            T.StructField("key", T.StringType(), True),
            T.StructField("band", T.IntegerType(), True),
        ]
    )


def band_rows(index: DedupIndex, docs: DataFrame) -> DataFrame:
    """``(id, band, key)`` — one row per (doc, band). One narrow pass:
    shingle → minhash → band keys are a single JVM expression tree, then
    an explode; nothing here leaves whole-stage codegen."""
    sig = minhash_signature(
        shingles(F.col(index.text_col), k=index.shingle_k), n_hashes=index.n_hashes
    )
    return docs.select(
        F.col(index.id_col).cast("long").alias(index.id_col),
        F.explode(lsh_band_keys(sig, index.bands, index.rows_per_band)).alias("bk"),
    ).select(index.id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _read_bands(spark: SparkSession, index: DedupIndex) -> DataFrame:
    """Read the band-partitioned root with the meta-derived schema, so a
    declared-empty layout (zero parquet footers) stays well-typed."""
    return (
        spark.read.schema(_band_schema(index))
        .option("basePath", index.path)
        .parquet(index.path)
    )


def build_dedup_index(
    docs: DataFrame,
    path: str,
    *,
    shingle_k: int = 3,
    n_hashes: int = 16,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DedupIndex:
    """Shingle+minhash the accepted corpus ONCE and persist its band
    keys partitioned by ``band``. An empty ``docs`` declares an empty
    layout (first-crawl bootstrap) — the schema is meta-derived, so
    reads and the first filter work before any append."""
    if n_hashes % bands:
        raise ValueError(f"n_hashes={n_hashes} not divisible by bands={bands}")
    index = DedupIndex(
        path=path,
        shingle_k=shingle_k,
        n_hashes=n_hashes,
        bands=bands,
        id_col=id_col,
        text_col=text_col,
    )
    band_rows(index, docs).write.partitionBy("band").mode("overwrite").parquet(path)
    index.save_meta()
    return index


def dedup_index_filter(
    spark: SparkSession, index: DedupIndex, batch: DataFrame
) -> DataFrame:
    """Per-document verdicts for a new batch against the accepted
    corpus: ``(id, corpus_dup, within_dup)`` (module docstring pins the
    exact semantics). Survivors are the rows with neither flag.

    Plan shape: the layout side is read as ``(band, key)`` only — the
    corpus text is never re-touched (ReadSchema pinned in
    tests/test_plans.py). Both joins shuffle on the 16-byte band key."""
    id_col = index.id_col
    bands = band_rows(index, batch)
    layout = _read_bands(spark, index).select("band", "key")
    corpus_hits = (
        bands.join(layout, ["band", "key"], "left_semi").select(id_col).distinct()
    )
    new_bands = bands.join(corpus_hits, id_col, "left_anti")
    grp_min = new_bands.groupBy("band", "key").agg(F.min(id_col).alias("_min_id"))
    within_hits = (
        new_bands.join(grp_min, ["band", "key"])
        .filter(F.col(id_col) > F.col("_min_id"))
        .select(id_col)
        .distinct()
    )
    return (
        batch.select(F.col(id_col).cast("long").alias(id_col))
        .join(corpus_hits.withColumn("_c", F.lit(True)), id_col, "left")
        .join(within_hits.withColumn("_w", F.lit(True)), id_col, "left")
        .select(
            id_col,
            F.coalesce("_c", F.lit(False)).alias("corpus_dup"),
            F.coalesce("_w", F.lit(False)).alias("within_dup"),
        )
    )


def dedup_index_append(index: DedupIndex, docs: DataFrame) -> None:
    """Persist the band rows of newly accepted documents — a blind
    partitioned append, O(batch); the existing layout is never read or
    rewritten."""
    band_rows(index, docs).write.partitionBy("band").mode("append").parquet(
        index.path
    )
