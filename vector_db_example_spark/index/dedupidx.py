"""Persisted incremental-dedup layout: MinHash band keys as an index.

The batch dedup operators (operators/dedup.py) answer "which documents in
THIS frame are near-duplicates of each other" — one shot, whole corpus.
A 100 TB training-data pipeline almost never asks that question twice:
after the first global pass, every subsequent crawl batch needs "which of
these NEW documents duplicate anything we already kept?", and
re-shingling petabytes of accepted corpus per batch is exactly the
recompute this layout exists to avoid (the reference's collection is the
same shape: an accumulating store that new inserts extend and later
queries are checked against — create_collection src/app.py:81, batched
insert src/app.py:230, single insert src/app.py:409).

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
the very first batch against nothing) reads well-typed, and the full
maintenance pair — ``dedup_index_delete`` (tombstone deletion vectors:
takedown/retention removals stop suppressing future near-duplicates
immediately, O(k) not O(corpus)) and ``dedup_index_compact``
(write-new-then-swap rewrite that folds tombstones in, heals
at-least-once replay duplicates, and collapses per-append small
files).

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
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # classic PySpark ships py4j; Spark Connect clients may not
    from py4j.protocol import Py4JError as _Py4JError
    from py4j.protocol import Py4JJavaError as _Py4JJavaError
except ImportError:  # pragma: no cover - Connect-only environment
    class _Py4JError(Exception):
        pass

    class _Py4JJavaError(_Py4JError):
        pass
from pyspark.sql import types as T

from .. import fsio
from ..operators.dedup import _py_minhash, _py_shingles, lsh_band_keys
from ..sources.tables import append_repartition, widen_cpu_dense

# Round-16 post-materialization narrow (sources/tables.py holds the
# shared implementation + rationale; ``signature_rows`` widens the
# kernel input, this un-widens the CHECKPOINT for the ~dozen downstream
# probe/join jobs). Imported under a module-local name so the A/B
# harness can seam it per-module.
from ..sources.tables import narrow_materialized as _narrow_ckpt


@dataclass
class DedupIndex:
    """Band-partitioned dedup layout on disk (the dedup twin of
    index/lsh.py::LSHIndex).

    ``sig_buckets`` > 0 means the signature side-car is partitioned by
    ``sig_bucket = pmod(id, sig_buckets)``, so the verified filter's
    candidate-signature fetch reads ONLY the buckets holding candidate
    ids instead of a corpus-proportional full scan — the one per-batch
    cost in the intake loop that used to grow with corpus size. 0 is
    the legacy unpartitioned layout (metas written before the field
    existed load as 0 and keep their read path)."""

    path: str
    shingle_k: int
    n_hashes: int
    bands: int
    id_col: str
    text_col: str
    sig_buckets: int = 0

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
            "sig_buckets": self.sig_buckets,
        }
        fsio.write_text(f"{self.path}/_dedup_meta.json", json.dumps(meta))

    @classmethod
    def load(cls, path: str) -> "DedupIndex":
        meta = json.loads(fsio.read_text(f"{path}/_dedup_meta.json"))
        meta.setdefault("sig_buckets", 0)  # pre-round-11 metas: unpartitioned
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


def _minhash_sig_of_text(
    text, k: int, n_hashes: int, prefixes: list[bytes]
) -> list | None:
    """One text → its n_hashes md5-hex MinHash signature, EXACTLY the
    value the Catalyst expression tree produces
    (``minhash_signature(shingles(text, k))``) — built from the shared
    pure-Python twins in operators/dedup.py (``_py_shingles`` /
    ``_py_minhash``, which pin the Java-tokenization and byte-order
    equivalences). Null text mirrors the expression tree's null
    algebra: a length-n array of NULLs (not a null array)."""
    if not isinstance(text, str):
        return [None] * n_hashes
    return _py_minhash(_py_shingles(text, k), prefixes)


def _sig_kernel(id_col: str, text_col: str, k: int, n_hashes: int):
    """mapInPandas body for ``signature_rows``: whole Arrow batches of
    (id, text) → (id, sig) through the C-backed md5 kernel above."""
    import pandas as pd

    prefixes = [f"{s}|".encode() for s in range(1, n_hashes + 1)]

    def kernel(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sig": [
                        _minhash_sig_of_text(t, k, n_hashes, prefixes)
                        for t in pdf[text_col]
                    ],
                }
            )

    return kernel


def signature_rows(
    index: DedupIndex, docs: DataFrame, widen_factor: int = 1
) -> DataFrame:
    """``(id, sig)`` — the n_hashes-string MinHash signature per doc.
    THE one expensive pass; everything else in this module derives from
    signatures.

    Since round 15 the kernel is an Arrow-batched ``mapInPandas`` over
    (id, text) only, computing the identical md5 signatures through
    C-backed ``hashlib`` (``_minhash_sig_of_text`` pins the
    equivalences). The previous shape — the
    ``minhash_signature(shingles(...))`` Catalyst expression — is
    higher-order lambdas, which Spark INTERPRETS per element with boxed
    values (the SCALING.md round-4 lesson): at 16 seeds × ~50 shingles
    that interpretation overhead is the whole stage. Measured on the
    6,000-doc bench batch: 2.1 s → 0.68 s wall for the signature pass
    (noop sink, min-of-3), bit-identical output at sf0.01 and sf0.1 —
    the guide-§4.2 move (vectorize opaque per-row work in native code
    behind an Arrow boundary, projecting only the columns it reads).

    The input is widened first (SCALING.md round-6 rule): text
    compresses ~10×, so a batch read from parquet opens as a couple of
    scan splits and the md5 storm would run on a couple of cores —
    measured 2.2 s → 0.3 s for a 2.4k-doc batch on local[32]. A no-op
    on pre-split 100 TB corpora and on frames already at cluster
    parallelism. ``widen_factor`` over-partitions corpus-sized passes
    (the full-build path) so one uneven scan split can't set the stage
    wall — SCALING.md round 8 measured an 18% straggler tail on the
    sf25 build at 1×."""
    out_schema = T.StructType(
        [
            T.StructField(index.id_col, T.LongType(), True),
            T.StructField("sig", T.ArrayType(T.StringType()), True),
        ]
    )
    return (
        widen_cpu_dense(docs, factor=widen_factor)
        .select(
            F.col(index.id_col).cast("long").alias(index.id_col),
            F.col(index.text_col),
        )
        .mapInPandas(
            _sig_kernel(
                index.id_col, index.text_col, index.shingle_k, index.n_hashes
            ),
            out_schema,
        )
    )


def _bands_of_sigs(index: DedupIndex, sigs: DataFrame) -> DataFrame:
    """``(id, band, key)`` from an ``(id, sig)`` frame — md5 of signature
    slices, an explode away; never re-touches text."""
    return sigs.select(
        index.id_col,
        F.explode(
            lsh_band_keys(F.col("sig"), index.bands, index.rows_per_band)
        ).alias("bk"),
    ).select(index.id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def band_rows(index: DedupIndex, docs: DataFrame) -> DataFrame:
    """``(id, band, key)`` for a document frame (signature pass + slice
    hashing fused in one plan)."""
    return _bands_of_sigs(index, signature_rows(index, docs))


def _sig_band_rows(index: DedupIndex, docs: DataFrame) -> DataFrame:
    """``(id, band, key, sig)`` in ONE kernel pass — the verified
    filter's single batch-side materialization shape (round 14, closing
    the fixed-floor gap vs band-only mode measured in SCALING.md
    round 13). The signature rides ONLY on each doc's band-0 row
    (``sig`` is null elsewhere), so checkpointing this frame costs the
    band table band-only mode materializes anyway PLUS one sig array
    per doc — not bands × sig — while every downstream subtree reads
    bands DIRECTLY from the checkpoint (the round-13 shape checkpointed
    sigs alone and re-derived explode + slice-md5 inside each consumer
    job) and the verification joins recover ``(id, sig)`` with a narrow
    ``band = 0`` filter: no shuffle, no second kernel run."""
    sigs = signature_rows(index, docs)
    return sigs.select(
        index.id_col,
        F.explode(
            lsh_band_keys(F.col("sig"), index.bands, index.rows_per_band)
        ).alias("bk"),
        "sig",
    ).select(
        index.id_col,
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
        F.when(F.col("bk.band") == 0, F.col("sig")).alias("sig"),
    )


def _sigs_path(index: DedupIndex) -> str:
    """Sibling directory, NOT a subdirectory: the layout root holds the
    ``band=`` partition dirs and Spark's partition discovery would trip
    over a foreign child (same convention as the IVF tombstone table,
    index/ivf.py::_tombstone_path)."""
    return f"{index.path}_sigs"


def _sig_schema(index: DedupIndex) -> T.StructType:
    fields = [
        T.StructField(index.id_col, T.LongType(), True),
        T.StructField("sig", T.ArrayType(T.StringType()), True),
    ]
    if index.sig_buckets:
        # Partition column (directory-encoded): declared in the schema so
        # a declared-empty bucketed layout reads well-typed.
        fields.append(T.StructField("sig_bucket", T.IntegerType(), True))
    return T.StructType(fields)


def _sig_bucket_expr(index: DedupIndex, id_expr):
    """The id → bucket mapping the sig side-car is partitioned by. Plain
    ``pmod(id, sig_buckets)`` — deterministic across engines (the filter
    derives the SAME expression from candidate ids to pick the buckets
    it reads), no hash-function coupling."""
    return F.pmod(id_expr.cast("long"), F.lit(index.sig_buckets)).cast("int")


def _read_bands(spark: SparkSession, index: DedupIndex) -> DataFrame:
    """Read the band-partitioned root with the meta-derived schema, so a
    declared-empty layout (zero parquet footers) stays well-typed."""
    return (
        spark.read.schema(_band_schema(index))
        .option("basePath", index.path)
        .parquet(index.path)
    )


def _read_sigs(spark: SparkSession, index: DedupIndex) -> DataFrame:
    return spark.read.schema(_sig_schema(index)).parquet(_sigs_path(index))


def _tombstone_path(index: DedupIndex) -> str:
    """Sibling directory, NOT a subdirectory: the layout root holds the
    ``band=`` partition dirs and partition discovery would trip over a
    foreign child (same convention as ``_sigs_path`` and the IVF
    tombstone table, index/ivf.py::_tombstone_path)."""
    return f"{index.path}_tombstones"


def _live(spark: SparkSession, index: DedupIndex, df: DataFrame) -> DataFrame:
    """Apply deletion vectors: broadcast anti-join against the tombstone
    sibling (absent ⇒ identity, so the filter plans are unchanged until
    the first delete — the IVF ``_ivf_live`` contract). The probe goes
    through fsio, so a scheme-addressed layout can never silently skip
    the anti-join and resurrect deleted docs' band rows."""
    tomb = _tombstone_path(index)
    if not fsio.exists(tomb, spark):
        return df
    return df.join(F.broadcast(spark.read.parquet(tomb)), index.id_col, "left_anti")


def _persist(index: DedupIndex, docs: DataFrame, mode: str) -> None:
    """One shingle+minhash pass total; the band table derives from the
    signatures, never from a second pass over the text (the
    fingerprint_overlap_stats lesson — the two consumers' subtrees can't
    ReusedExchange, so an unmaterialized sig frame would run the kernel
    twice).

    - build (overwrite): write sigs, then derive bands from a READ-BACK
      of the sig table — streaming 512 B/doc back through the executors
      scales to a corpus-sized build where no in-memory materialization
      could.
    - append: the batch is ingest-sized; localCheckpoint the batch sigs
      once and feed both writes from the materialized rows (a read-back
      can't isolate the new batch from the already-appended corpus).

    Bucketed layouts (``sig_buckets`` > 0) shuffle the sig rows on the
    bucket column before the partitioned write, so each write lands at
    most one file per touched bucket instead of (tasks × buckets) shards
    — an O(rows) shuffle of 512 B/doc rows, cheap at both build and
    append scale.
    """
    spark = docs.sparkSession

    def _write_sigs(sigs_df: DataFrame, m: str) -> None:
        if index.sig_buckets:
            bucketed = sigs_df.withColumn(
                "sig_bucket", _sig_bucket_expr(index, F.col(index.id_col))
            )
            if m == "append":
                # Size-gated collapse (round 16 — sources/tables.py::
                # append_repartition): micro-batch appends land one
                # file per touched bucket; an over-the-ceiling frame
                # keeps full write parallelism instead of serializing
                # onto ≤ sig_buckets tasks.
                bucketed = append_repartition(bucketed, "sig_bucket")
            else:
                # Build keeps the unconditional bucket shuffle: one
                # file set per bucket partition, full-size tasks.
                bucketed = bucketed.repartition(F.col("sig_bucket"))
            (
                bucketed.write.partitionBy("sig_bucket")
                .mode(m)
                .parquet(_sigs_path(index))
            )
        else:
            sigs_df.write.mode(m).parquet(_sigs_path(index))

    if mode == "overwrite":
        # Corpus-sized pass: over-partition 4× so one uneven scan split
        # can't set the build's wall (signature_rows docstring; measured
        # 18% off the sf25 sigs pass, SCALING.md round 8).
        _write_sigs(signature_rows(index, docs, widen_factor=4), mode)
        sigs = _read_sigs(spark, index)
        bands = _bands_of_sigs(index, sigs)
    else:
        sigs = signature_rows(index, docs).localCheckpoint(eager=True)
        _write_sigs(sigs, mode)
        # Append-path band rows shuffle onto the band column first —
        # the same one-file-per-touched-partition discipline the sig
        # write above has always had: without it every batch append
        # lands (tasks × bands) shards (measured 256 files / 1.63 s for
        # a 190-doc append; repartitioned: 8 files / 0.50 s — round
        # 15). An O(batch·bands) shuffle of 25 B rows, and AQE
        # coalesces it to a handful of tasks on small batches.
        # Size-gated since round 16 (append_repartition): a frame over
        # the collapse ceiling keeps full write parallelism — a
        # corpus-sized shuffle onto 8 band values would serialize the
        # write into 8 tasks; compaction owns big-append file hygiene,
        # same as the BUILD path below.
        bands = append_repartition(_bands_of_sigs(index, sigs), "band")
    bands.write.partitionBy("band").mode(mode).parquet(index.path)


def build_dedup_index(
    docs: DataFrame,
    path: str,
    *,
    shingle_k: int = 3,
    n_hashes: int = 16,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    sig_buckets: int = 64,
) -> DedupIndex:
    """Shingle+minhash the accepted corpus ONCE and persist its band
    keys partitioned by ``band`` plus the signature side-car table
    (partitioned by ``pmod(id, sig_buckets)`` so the verified filter's
    candidate fetch prunes; ``sig_buckets=0`` writes the legacy
    unpartitioned side-car). An empty ``docs`` declares an empty layout
    (first-crawl bootstrap) — the schema is meta-derived, so reads and
    the first filter work before any append."""
    if n_hashes % bands:
        raise ValueError(f"n_hashes={n_hashes} not divisible by bands={bands}")
    if sig_buckets < 0:
        raise ValueError(f"sig_buckets={sig_buckets} must be >= 0")
    index = DedupIndex(
        path=path,
        shingle_k=shingle_k,
        n_hashes=n_hashes,
        bands=bands,
        id_col=id_col,
        text_col=text_col,
        sig_buckets=sig_buckets,
    )
    _persist(index, docs, "overwrite")
    index.save_meta()
    return index


def dedup_index_filter(
    spark: SparkSession, index: DedupIndex, batch: DataFrame
) -> DataFrame:
    """Per-document verdicts for a new batch — see
    ``dedup_index_filter_with_rows`` (this is its verdict-only view)."""
    return dedup_index_filter_with_rows(spark, index, batch)[0]


def dedup_index_filter_with_rows(
    spark: SparkSession, index: DedupIndex, batch: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Per-document verdicts for a new batch against the accepted
    corpus: ``(id, corpus_dup, within_dup)`` (module docstring pins the
    exact semantics). Survivors are the rows with neither flag.

    Returns ``(verdicts, sig_band_rows)`` — the second element is the
    batch's MATERIALIZED ``(id, band, key, sig)`` checkpoint
    (``_sig_band_rows`` shape), so an ingest loop that appends the
    survivors afterwards can feed ``dedup_index_append_rows`` instead
    of re-running the shingle+minhash kernel over text it just
    fingerprinted (round 15; the crawl intake was paying the kernel
    twice per batch). Carrying the sig column costs the checkpoint one
    ~512 B array per doc on top of the band rows it materialized
    anyway — the round-14 ``_sig_band_rows`` accounting.

    Plan shape: the layout side is read as ``(band, key)`` only — the
    corpus text is never re-touched (ReadSchema pinned in
    tests/test_dedupidx.py) — and the layout is NEVER shuffled,
    whichever side of Spark's broadcast threshold it sits on. A layout
    within ``autoBroadcastJoinThreshold`` takes the direct semi-join
    (Spark broadcasts the layout side — already shuffle-free, and the
    restriction below would only add barrier stages). A BIGGER layout
    — where the direct join would degrade to a SortMergeJoin that
    re-shuffles the ENTIRE corpus band table per batch, the same
    ceiling the verified filter's hot-restriction removed in round 10
    — evaluates the corpus test as ``layout ⋉ broadcast(batch keys)``
    (a broadcast hash semi-join the layout scan streams through
    map-side), and the surviving O(collisions) key set broadcasts back
    against the batch's bands (plan-pinned in
    tests/test_dedupidx.py::test_band_filter_never_shuffles_layout).
    Batches whose key count exceeds ``_BROADCAST_KEYS_MAX`` fall back
    to the plain shuffle join, same as verified mode. The crossover is
    Spark's own auto-broadcast decision read from the layout's planner
    size estimate (``_fits_auto_broadcast`` — driver-side metadata, no
    job). The batch's band frame feeds two join subtrees
    (the corpus semi-join and the within-batch anti-join base) whose
    exchanges cannot be reused, so it is materialized once — without
    this the shingle+minhash kernel runs twice per filter (the
    fingerprint_overlap_stats lesson; measured 1.7× on the sf1.0
    crawl-batch benchmark in SCALING.md)."""
    id_col = index.id_col
    sb = _sig_band_rows(index, batch).localCheckpoint(eager=True)
    # One count over the materialized checkpoint serves the join-strategy
    # decision AND the width decision (round 16 — _narrow_ckpt: the
    # kernel runs wide, the dozen downstream jobs over a micro-batch
    # checkpoint shouldn't).
    n_rows = sb.count()
    sb = _narrow_ckpt(sb, n_rows)
    bands = sb.select(id_col, "band", "key")
    layout = _live(spark, index, _read_bands(spark, index)).select("band", "key")
    if (
        not _fits_auto_broadcast(spark, layout)
        and n_rows <= _BROADCAST_KEYS_MAX
    ):
        # Big layout: (keys that collide) = layout ⋉ broadcast(batch
        # keys) — the layout scan streams through a map-side broadcast
        # hash join, no corpus-side exchange — and the result is
        # bounded by the batch's own key count, so it broadcasts back.
        # No distinct on the probe side: a semi-join's output is
        # unchanged by duplicate probe keys, and the dedup exchange
        # cost more than the ≤ docs·bands extra broadcast rows
        # (round 15 — one shuffle job per filter call removed).
        batch_keys = bands.select("band", "key")
        hot_keys = layout.join(
            F.broadcast(batch_keys), ["band", "key"], "left_semi"
        ).distinct()
        corpus_hits = (
            bands.join(F.broadcast(hot_keys), ["band", "key"], "left_semi")
            .select(id_col)
            .distinct()
        )
    else:
        # Small layout (Spark auto-broadcasts it — already shuffle-free)
        # or an over-the-ceiling catch-up batch (key set too big to
        # hint): direct semi-join.
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
    verdicts = (
        batch.select(F.col(id_col).cast("long").alias(id_col))
        .join(corpus_hits.withColumn("_c", F.lit(True)), id_col, "left")
        .join(within_hits.withColumn("_w", F.lit(True)), id_col, "left")
        .select(
            id_col,
            F.coalesce("_c", F.lit(False)).alias("corpus_dup"),
            F.coalesce("_w", F.lit(False)).alias("within_dup"),
        )
    )
    return verdicts, sb


def _est_sim(a, b, n_hashes: int):
    """MinHash similarity estimate: the fraction of equal signature
    positions — an unbiased Jaccard estimator, pure array expressions."""
    eq = F.zip_with(a, b, lambda x, y: (x == y).cast("int"))
    return F.aggregate(eq, F.lit(0), lambda acc, x: acc + x).cast("double") / float(
        n_hashes
    )


#: Above this many batch band keys, the verified filter's corpus
#: restriction switches from an explicit broadcast hint to a plain
#: shuffle semi-join: the hint bypasses autoBroadcastJoinThreshold, and
#: an unbounded catch-up batch (no max_files_per_trigger) could
#: otherwise broadcast an arbitrarily large key set (advisor finding,
#: round 10). 1M 16-byte keys ≈ tens of MB broadcast — the safe ceiling.
_BROADCAST_KEYS_MAX = 1_000_000



#: Spark's byte-string suffixes (JavaUtils.byteStringAsBytes), parsed in
#: Python so the threshold check needs no JVM round-trip.
_BYTE_SUFFIXES = {
    "": 1, "b": 1,
    "k": 1024, "kb": 1024,
    "m": 1024**2, "mb": 1024**2,
    "g": 1024**3, "gb": 1024**3,
    "t": 1024**4, "tb": 1024**4,
    "p": 1024**5, "pb": 1024**5,
}


def _parse_byte_string(s: str) -> int:
    """``"10MB"`` → 10485760, mirroring the conf layer's
    ``ConfigHelpers.byteFromString`` (which strips ONE leading ``-`` and
    negates before handing the rest to JavaUtils' case-insensitive
    suffix table) — so ``"-1k"`` parses to -1024, a valid disable value
    for ``spark.sql.autoBroadcastJoinThreshold``, exactly as Spark
    itself accepts it (advisor finding, round 13; the round-12 shape
    rejected it and crashed the filter on a conf Spark allows). Raises
    ValueError on anything Spark's own parser would reject."""
    sign, body = (-1, s[1:]) if s.startswith("-") else (1, s)
    m = re.fullmatch(r"\s*(\d+)\s*([A-Za-z]*)\s*", body)
    if not m or m.group(2).lower() not in _BYTE_SUFFIXES:
        raise ValueError(f"unparseable byte string: {s!r}")
    return sign * int(m.group(1)) * _BYTE_SUFFIXES[m.group(2).lower()]


def _fits_auto_broadcast(spark: SparkSession, df: DataFrame) -> bool:
    """True iff Spark's planner would auto-broadcast ``df`` — its
    optimized-plan size estimate is within
    ``spark.sql.autoBroadcastJoinThreshold`` (and the threshold isn't
    disabled). Used as the crossover for the band-only filter's layout
    restriction: below the threshold a direct semi-join is ALREADY
    shuffle-free (BroadcastHashJoin on the layout side), so the
    two-step restriction would only add barrier stages; above it the
    direct join degrades to a corpus-wide SortMergeJoin shuffle and
    restriction wins. Pass the PROJECTED frame actually joined (the
    pruned/filtered layout, not the raw full-width scan) so the
    estimate mirrors the planner's real decision (advisor finding,
    round 11). The stats call is driver-side metadata (the file
    listing already happened when the DataFrame was created); it rides
    py4j internals unavailable under Spark Connect, so an unreachable
    estimate reports not-fitting — the caller then takes the
    restriction path, which keeps the layout unshuffled either way
    (the scale-safe failure mode, never a silent wrong plan)."""
    thresh = _parse_byte_string(
        str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    )
    if thresh <= 0:
        return False
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except AttributeError:
        # Missing JVM surface: Spark Connect frames have no `_jdf`
        # (PySparkAttributeError ⊂ AttributeError).
        return False
    except _Py4JError as e:
        if isinstance(e, _Py4JJavaError):
            # The JVM evaluated the plan and THREW — a genuine
            # analysis/optimization error that must surface, not
            # silently flip the join strategy (advisor findings,
            # rounds 12 + 13: Py4JJavaError ⊂ Py4JError, so the
            # round-12 blanket Py4JError catch still swallowed it).
            raise
        # Bare Py4JError shapes are gateway/protocol faults (the JVM
        # never answered) — the stats are unreachable, same as Connect.
        return False
    return size <= thresh


def dedup_index_filter_verified(
    spark: SparkSession,
    index: DedupIndex,
    batch: DataFrame,
    threshold: float = 0.5,
    candidate_cap: int = 64,
) -> DataFrame:
    """Verified per-document verdicts — see
    ``dedup_index_filter_verified_with_rows`` (this is its verdict-only
    view)."""
    return dedup_index_filter_verified_with_rows(
        spark, index, batch, threshold=threshold, candidate_cap=candidate_cap
    )[0]


def dedup_index_filter_verified_with_rows(
    spark: SparkSession,
    index: DedupIndex,
    batch: DataFrame,
    threshold: float = 0.5,
    candidate_cap: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Band-collision candidates VERIFIED by the MinHash similarity
    estimate (fraction of equal signature positions ≥ ``threshold``) —
    8×2 banding alone false-positives on a single lucky band; real
    curation pipelines verify candidates before dropping documents. The
    verification joins the persisted signature side-car, so the corpus
    text is STILL never re-touched.

    Same verdict columns and the same pessimistic one-pass within-batch
    ordering rule as ``dedup_index_filter``, with "shares a band key"
    replaced by "shares a band key AND estimate ≥ threshold".

    Mega-key routing (the count-first discipline of
    operators/dedup.py:148): a ``(band, key)`` held by more than
    ``candidate_cap`` corpus docs — boilerplate — auto-flags its batch
    colliders as corpus_dup WITHOUT pair enumeration (over-suppression
    is the safe direction, and a key that common is a duplicate factory
    by construction); only under-cap keys enumerate (batch × corpus)
    candidate pairs, so the pair count is bounded by
    cap · batch_bands. Within-batch keys over the cap likewise flag
    everything above the group min unverified.

    Plan shape (the 100 TB path): every corpus-side computation is
    restricted FIRST to layout rows whose (band, key) appears in the
    batch — a broadcast semi-join against the batch's O(8·batch) key
    set (falling back to a plain shuffle semi-join when the batch's key
    count exceeds ``_BROADCAST_KEYS_MAX``, so an unbounded catch-up run
    without max_files_per_trigger cannot OOM the driver on the hint) —
    so the mega-key counts and the candidate enumeration group and join
    only COLLIDING rows, never the whole layout. Without the
    restriction the key counts were a corpus-wide shuffle per batch
    (measured sf1.0→sf5: SCALING.md round 10); with it the layout scan
    stays the same narrow pruned read as the band-only filter and the
    shuffle is O(collisions). Count-first since round 12: the per-key
    counts aggregate ON the streamed restricted scan (nothing
    collision-proportional is materialized — the round-11 shape
    checkpointed the full restricted frame first, so one boilerplate
    key colliding with a large corpus could materialize near-corpus
    rows before the cap routed it away), and a second pruned pass
    restricted to the UNDER-cap keys feeds the enumeration — its input
    is ≤ cap · batch_bands rows by construction. The two materialized
    frames (key counts, candidate pairs) are both batch-bounded.

    The signature fetch prunes too (bucketed layouts): candidate corpus
    ids are mapped to their ``sig_bucket`` partitions and the side-car
    scan reads ONLY those directories — static partition pruning, so
    the verified path's one remaining corpus-proportional per-batch
    cost (the full (id, sig) side-car scan, flagged in SCALING.md
    round 10) is gone. Legacy unpartitioned layouts (sig_buckets=0)
    keep the full-scan read path.

    Batch-side floor (round 14): ONE materialization shared by bands
    and signatures (``_sig_band_rows`` — sig rides the band-0 rows), so
    verified mode's checkpoint is band-only mode's band table plus one
    sig array per doc, downstream subtrees never re-derive the
    explode + slice-md5, and on the fresh path (``no_under``) two
    further probes over already-materialized frames collapse the final
    plan: an empty ``key_counts`` drops the over-cap semi-join, and a
    batch with no repeated (band, key) drops the entire within-batch
    groupBy/self-join/verification algebra (provably empty — group
    sizes in ``new_bands`` only shrink vs ``bands``). Neither probe
    adds a job on the collision-rich profile.

    Returns ``(verdicts, sig_band_rows)`` like
    ``dedup_index_filter_with_rows`` — the second element is the
    batch's materialized ``(id, band, key, sig)`` checkpoint, reusable
    by ``dedup_index_append_rows`` so an ingest loop never runs the
    kernel twice over one batch (round 15)."""
    id_col = index.id_col
    # ONE batch-side materialization: bands AND signatures ride the same
    # checkpoint (sig on band-0 rows only — _sig_band_rows docstring).
    # The round-13 shape checkpointed sigs alone, so the key-counts job
    # and every final-plan subtree re-derived explode + slice-md5 from
    # the checkpoint, and the checkpoint itself was a DIFFERENT (purely
    # additional) materialization than band-only mode's — the fixed
    # batch-side floor the zero-collision A/B measured at 2.47 s vs
    # band-only's 1.31 s (SCALING.md round 13, VERDICT r13 gap #3).
    sb = _sig_band_rows(index, batch).localCheckpoint(eager=True)
    # One count over the materialized checkpoint serves the broadcast
    # decision below AND the checkpoint-width decision (round 16 —
    # _narrow_ckpt docstring: wide kernel, narrow downstream).
    n_rows = sb.count()
    sb = _narrow_ckpt(sb, n_rows)
    bands = sb.select(id_col, "band", "key")
    # (id, sig): a narrow filter over the checkpoint — one row per doc,
    # no shuffle, no second kernel run.
    bsigs = sb.filter(F.col("band") == 0).select(id_col, "sig")
    # Tombstoned docs drop out of BOTH the candidate enumeration and the
    # mega-key counts — a deleted boilerplate cluster must not keep its
    # band key over the cap and auto-suppress future batches.
    layout = _live(spark, index, _read_bands(spark, index))
    # No distinct on the probe side (round 15): the key-counts semi-join
    # and the under/over semi-joins are unchanged by duplicate probe
    # keys, and the dedup exchange cost more than the ≤ docs·bands
    # extra broadcast rows.
    batch_keys = bands.select("band", "key")
    # sb is materialized, so its count (= docs · bands) is a cheap upper
    # bound on the distinct key count — no extra shuffle to decide the
    # join strategy.
    small_batch = n_rows <= _BROADCAST_KEYS_MAX
    if small_batch:
        batch_keys = F.broadcast(batch_keys)
    # Count-first, end-to-end (the operators/dedup.py:148 discipline):
    # the per-key collision counts aggregate directly on the STREAMED
    # ``layout ⋉ batch_keys`` scan — map-side partial combine, and the
    # ONLY thing materialized is the aggregated counts themselves,
    # bounded by the batch's own key count. Nothing
    # collision-proportional ever touches executor storage: a
    # boilerplate-heavy batch whose one hot key collides with half a
    # billion-doc corpus used to checkpoint every one of those rows
    # before routing; now an over-cap key routes to the no-enumeration
    # path having only ever existed as one count row (measured: the
    # hot-key A/B in SCALING.md round 12).
    key_counts = (
        layout.join(batch_keys, ["band", "key"], "left_semi")
        .groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=True)
    )
    over = key_counts.filter(F.col("_n") > candidate_cap).select("band", "key")
    under = key_counts.filter(F.col("_n") <= candidate_cap).select("band", "key")
    # Emptiness probes on the SAME frame the enumeration would join (one
    # predicate, no drift — advisor finding, round 12), taken before the
    # broadcast hint: ONE aggregate over the already-materialized counts
    # answers both "any under-cap key?" and "any collision at all?"
    # (round 16 — the previous shape was two separate limit(1).count()
    # jobs; the counts table is batch-bounded, so the full agg costs the
    # same one tiny job and halves the probe round-trips), never a job
    # against the layout.
    kc_probe = key_counts.agg(
        F.count(F.lit(1)).alias("_nk"),
        F.count(F.when(F.col("_n") <= candidate_cap, True)).alias("_nu"),
    ).head()
    no_under = kc_probe["_nu"] == 0
    if small_batch:
        # ≤ the batch's key count by construction (a subset of
        # key_counts), so the small-batch guard covers it too.
        under = F.broadcast(under)
    # No inner distinct: corpus_hits' outer union-distinct below is the
    # one load-bearing dedup — an inner one was a pure extra exchange
    # over a batch-bounded frame (round 16; same for verified_hits and
    # the within-batch hit legs).
    auto_hits = bands.join(over, ["band", "key"], "left_semi").select(id_col)
    if no_under:
        # No under-cap colliding key ⇒ the candidate set is provably
        # empty, so skip the second layout pass AND the whole
        # signature-verification subtree — the bucketed layouts'
        # candidate checkpoint + bucket collect and the side-car read
        # were still paid as jobs over a provably-empty frame before
        # round 13 (advisor finding). This is the count-first dividend
        # on the two batch shapes where the extra pass would hurt most:
        # a fully FRESH batch (no collisions at all — the common
        # diverse-crawl case) and a boilerplate-heavy batch whose every
        # collision is over-cap (measured in the hot-key A/B,
        # SCALING.md round 12).
        verified_hits = bands.select(id_col).limit(0)
        if kc_probe["_nk"] == 0:
            # Nothing collided at all (the fresh-batch common case):
            # the corpus side is provably empty — drop the over-cap
            # semi-join from the final plan too, not just the
            # verification subtree. The answer rode the one probe
            # aggregate above — no second job.
            auto_hits = verified_hits
    else:
        # Second pruned layout pass reads ONLY under-cap keys' colliding
        # rows — ≤ cap · batch_bands rows by construction, so the
        # enumeration input is bounded BEFORE anything is materialized.
        cand = (
            bands.alias("b")
            .join(
                layout.join(under, ["band", "key"], "left_semi").alias("c"),
                ["band", "key"],
            )
            .select(
                F.col(f"b.{id_col}").alias(id_col), F.col(f"c.{id_col}").alias("_cid")
            )
            .distinct()
        )
        csigs = _read_sigs(spark, index)
        if index.sig_buckets:
            # Bucket-pruned fetch: materialize the (small —
            # ≤ cap·batch_bands pairs) candidate set once, collect the
            # ≤ sig_buckets distinct buckets its corpus ids live in, and
            # read ONLY those partitions of the side-car. The collect is
            # bounded metadata (at most sig_buckets ints), never layout
            # rows.
            cand = cand.localCheckpoint(eager=True)
            buckets = [
                r["_b"]
                for r in cand.select(
                    _sig_bucket_expr(index, F.col("_cid")).alias("_b")
                )
                .distinct()
                .collect()
            ]
            if buckets:
                csigs = csigs.filter(F.col("sig_bucket").isin(buckets))
            else:
                csigs = csigs.filter(F.lit(False))
        verified_hits = (
            cand.join(bsigs.withColumnRenamed("sig", "_bs"), id_col)
            .join(
                csigs.select(F.col(id_col).alias("_cid"), F.col("sig").alias("_cs")),
                "_cid",
            )
            .filter(_est_sim(F.col("_bs"), F.col("_cs"), index.n_hashes) >= threshold)
            .select(id_col)
        )
    corpus_hits = auto_hits.unionByName(verified_hits).distinct()

    # Within-batch short-circuit, fresh path only (when the corpus side
    # already ran verification, the within joins are marginal — no new
    # probe job on the collision-rich profile): if NO (band, key) is
    # shared by two batch docs, every within-batch group has size 1 in
    # ``bands`` and hence in its subset ``new_bands``, so wauto and
    # wpairs are provably empty — skip the groupBy, self-join, and
    # signature-verification exchanges entirely. The probe is one
    # batch-bounded agg over the materialized checkpoint.
    no_within = no_under and (
        bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= 2)
        .limit(1)
        .count()
        == 0
    )
    new_bands = bands.join(corpus_hits, id_col, "left_anti")
    if no_within:
        within_hits = bands.select(id_col).limit(0)
    else:
        wcounts = new_bands.groupBy("band", "key").agg(
            F.count(F.lit(1)).alias("_n"), F.min(id_col).alias("_min_id")
        )
        wover = wcounts.filter(F.col("_n") > candidate_cap)
        wauto = (
            new_bands.join(wover.select("band", "key", "_min_id"), ["band", "key"])
            .filter(F.col(id_col) > F.col("_min_id"))
            .select(id_col)
        )
        wunder = wcounts.filter(F.col("_n") <= candidate_cap).select("band", "key")
        wpairs = (
            new_bands.join(wunder, ["band", "key"], "left_semi")
            .alias("l")
            .join(
                new_bands.join(wunder, ["band", "key"], "left_semi").alias("r"),
                ["band", "key"],
            )
            .filter(F.col(f"l.{id_col}") > F.col(f"r.{id_col}"))
            .select(
                F.col(f"l.{id_col}").alias(id_col), F.col(f"r.{id_col}").alias("_rid")
            )
            .distinct()
        )
        wverified = (
            wpairs.join(bsigs.withColumnRenamed("sig", "_ls"), id_col)
            .join(
                bsigs.select(F.col(id_col).alias("_rid"), F.col("sig").alias("_rs")),
                "_rid",
            )
            .filter(_est_sim(F.col("_ls"), F.col("_rs"), index.n_hashes) >= threshold)
            .select(id_col)
        )
        within_hits = wauto.unionByName(wverified).distinct()
    verdicts = (
        batch.select(F.col(id_col).cast("long").alias(id_col))
        .join(corpus_hits.withColumn("_c", F.lit(True)), id_col, "left")
        .join(within_hits.withColumn("_w", F.lit(True)), id_col, "left")
        .select(
            id_col,
            F.coalesce("_c", F.lit(False)).alias("corpus_dup"),
            F.coalesce("_w", F.lit(False)).alias("within_dup"),
        )
    )
    return verdicts, sb


def dedup_index_append_rows(index: DedupIndex, sig_band_rows: DataFrame) -> None:
    """Persist band rows AND signatures from an ALREADY-COMPUTED
    ``(id, band, key, sig)`` frame (the ``_sig_band_rows`` shape: one
    row per (doc, band), the sig array riding each doc's band-0 row) —
    the zero-recompute twin of ``dedup_index_append`` for ingest loops
    that just filtered the same batch: the filter's materialized
    checkpoint, restricted to the surviving ids, IS this frame, so the
    append runs no shingle+minhash kernel and no extra materialization
    job at all (round 15; the crawl loop previously re-fingerprinted
    every survivor's text on append). The caller must pass
    MATERIALIZED rows (the ``_with_rows`` filters return a
    localCheckpoint) — the writes below are two separate actions and an
    unmaterialized frame would recompute between them.

    Writes are byte-identical to ``dedup_index_append``'s: the same
    bucketed sig side-car shuffle-then-partitioned write, the same
    band-partitioned append (``_persist`` docstring)."""
    id_col = index.id_col
    sigs = sig_band_rows.filter(F.col("band") == 0).select(id_col, "sig")
    if index.sig_buckets:
        (
            append_repartition(
                sigs.withColumn(
                    "sig_bucket", _sig_bucket_expr(index, F.col(id_col))
                ),
                "sig_bucket",
            )
            .write.partitionBy("sig_bucket")
            .mode("append")
            .parquet(_sigs_path(index))
        )
    else:
        sigs.write.mode("append").parquet(_sigs_path(index))
    # Same size-gated band-column shuffle as _persist's append path: one
    # file per touched band partition instead of (tasks × bands) shards
    # on micro-batches; full parallelism above the collapse ceiling.
    append_repartition(
        sig_band_rows.select(id_col, "band", "key"), "band"
    ).write.partitionBy("band").mode("append").parquet(index.path)


def dedup_index_append(index: DedupIndex, docs: DataFrame) -> None:
    """Persist the band rows AND signatures of newly accepted documents
    — blind appends, O(batch); the existing layout is never read or
    rewritten.

    Doc ids are assumed unique for the layout's lifetime (the
    package-wide contract, same as IVF/LSH/inverted): appending a NEW
    document under a previously-DELETED id would be suppressed by that
    id's tombstone until the next compaction — standard deletion-vector
    semantics, so don't recycle ids."""
    _persist(index, docs, "append")


#: Above this many delete ids, ``dedup_index_delete`` switches from
#: inlined ``isin`` literals to a broadcast ids DataFrame so the plan
#: size stays O(1) in the batch size (same constant as index/ivf.py).
_DELETE_ISIN_MAX = 10_000


def dedup_index_delete(spark: SparkSession, index: DedupIndex, ids) -> int:
    """Remove documents from the accepted corpus — takedowns/retention,
    the reference's drop lifecycle next to its inserts (drop_collection
    src/app.py:87 vs insert src/app.py:230,409). Without this, a deleted
    document's band+sig rows stay behind and silently OVER-SUPPRESS
    every future batch that near-duplicates it: the batch doc reads as
    corpus_dup against a document the corpus no longer contains.

    Deletion vectors, not a rewrite (the O(k) design every other mutable
    layout here uses — IVF ``ivf_delete_lazy``, inverted tombstones):
    victim ids append to a tiny sibling table; both filter modes
    broadcast-anti-join it on the corpus side (band rows AND mega-key
    counts — a deleted boilerplate cluster must not keep its key over
    the candidate cap); ``dedup_index_compact`` folds tombstones in for
    real. A doc's band rows span every ``band=`` partition, so an eager
    rewrite would touch the whole layout — exactly what the tombstone
    defers until one compaction amortizes it.

    Idempotent: victims resolve through the LIVE sig table (one narrow
    id-column scan — on bucketed layouts pruned to the victims'
    ``sig_bucket`` partitions, computed driver-side from the ids via
    the same ``pmod`` the side-car is partitioned by, so victim
    resolution reads O(touched buckets) not the full corpus id column;
    the same pruning the verified filter's candidate fetch uses), so
    re-deleting a tombstoned or absent id is a no-op. Returns the
    number of ids newly tombstoned."""
    ids = [int(i) for i in ids]
    if not ids:
        return 0
    victims = _delete_victims(spark, index, ids).localCheckpoint(eager=True)
    n = victims.count()
    if n:
        victims.write.mode("append").parquet(_tombstone_path(index))
    return n


def _delete_victims(spark: SparkSession, index: DedupIndex, ids: list[int]) -> DataFrame:
    """The (unmaterialized) live-victim frame ``dedup_index_delete``
    tombstones — split out so its plan shape is pinnable: on bucketed
    layouts the side-car scan must carry the victims' ``sig_bucket``
    partition filter (tests/test_dedupidx.py)."""
    id_col = index.id_col
    sigs = _read_sigs(spark, index)
    if index.sig_buckets:
        # Python % equals Spark's pmod for a positive modulus, so this
        # driver-side set names exactly the partitions the victims can
        # live in — static partition pruning, no job.
        buckets = sorted({i % index.sig_buckets for i in ids})
        sigs = sigs.filter(F.col("sig_bucket").isin(buckets))
    live = _live(spark, index, sigs.select(id_col))
    if len(ids) <= _DELETE_ISIN_MAX:
        victims = live.filter(F.col(id_col).isin(ids))
    else:
        ids_df = spark.createDataFrame([(i,) for i in ids], f"{id_col} long").coalesce(1)
        victims = live.join(F.broadcast(ids_df), id_col, "semi")
    return victims.distinct()


def dedup_index_compact(
    spark: SparkSession,
    index: DedupIndex,
    new_path: str,
    *,
    sig_buckets: int | None = None,
) -> DedupIndex:
    """Offline maintenance: rewrite the band table and signature side-car
    at ``new_path`` — write-new-then-swap-pointer, never in place
    (readers of the old path stay consistent; the same contract as
    ``compact_ivf_index`` / ``compact_lsh_layout``). Three debts settle
    in one pass, none of which re-touches corpus TEXT (both tables are
    already derived — compaction is a filter + shuffle, no re-shingle):

    - FOLDS DELETION VECTORS IN: tombstoned docs' band+sig rows are
      dropped for real and the fresh layout starts with no tombstone
      sibling, restoring the no-anti-join filter plan.
    - CLEARS AT-LEAST-ONCE REPLAY DUPLICATES: a crashed append can lay
      down byte-identical rows twice; full-row ``distinct()`` collapses
      them deterministically (the package-wide healing contract —
      replayed rows are byte-identical by construction).
    - COLLAPSES SMALL FILES: every ``dedup_index_append`` adds one file
      set per batch; the rewrite shuffles on ``(band, key)`` so each
      ``band=`` partition lands in parallel bounded-count files sized by
      ``spark.sql.shuffle.partitions``, independent of how many appends
      accumulated.

    Delete-to-empty is well-typed: a fully-tombstoned layout writes
    zero data files and reads back through the meta-derived schema, the
    same declared-empty path the first-crawl bootstrap uses.

    ``sig_buckets`` overrides the side-car partitioning for the NEW
    layout (default: inherit the source's). This is the migration path
    for pre-round-11 legacy layouts (``sig_buckets=0``, full-scan
    verified reads): the signatures are already persisted, so one
    ordinary compaction — ``sig_buckets=64`` — moves the layout onto
    the bucket-pruned verified read path without ever re-shingling the
    corpus text. Verdicts are unaffected: bucketing changes WHERE sig
    rows live, never their values (regression-pinned in
    tests/test_dedupidx.py::test_compact_migrates_sig_buckets)."""
    if sig_buckets is None:
        sig_buckets = index.sig_buckets
    if sig_buckets < 0:
        raise ValueError(f"sig_buckets={sig_buckets} must be >= 0")
    out = DedupIndex(
        path=new_path,
        shingle_k=index.shingle_k,
        n_hashes=index.n_hashes,
        bands=index.bands,
        id_col=index.id_col,
        text_col=index.text_col,
        sig_buckets=sig_buckets,
    )
    # Drop the source's directory-derived bucket column (if any) before
    # re-deriving for the OUT layout — the override may change the
    # bucket count or remove the partitioning entirely.
    sigs = (
        _live(spark, index, _read_sigs(spark, index))
        .drop("sig_bucket")
        .distinct()
    )
    if out.sig_buckets:
        # The bucket column is re-derived here and directory-derived on
        # read, so a replayed row dedups identically; one file set per
        # bucket after the shuffle.
        (
            sigs.withColumn("sig_bucket", _sig_bucket_expr(out, F.col(out.id_col)))
            .repartition(F.col("sig_bucket"))
            .write.partitionBy("sig_bucket")
            .mode("overwrite")
            .parquet(_sigs_path(out))
        )
    else:
        sigs.repartition(F.col(index.id_col)).write.mode("overwrite").parquet(
            _sigs_path(out)
        )
    bands = _live(spark, index, _read_bands(spark, index)).distinct()
    bands.repartition(F.col("band"), F.col("key")).write.partitionBy("band").mode(
        "overwrite"
    ).parquet(out.path)
    out.save_meta()
    return out
