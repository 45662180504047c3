"""Document fingerprinting via winnowing (rolling k-gram hashes).

The standard local document-fingerprinting scheme (Schleimer, Wilkerson
& Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
SIGMOD'03 — the MOSS algorithm): hash every character k-gram, slide a
window of ``w`` consecutive hashes over the sequence, and keep the
minimum of each window. The guarantee that makes it THE
plagiarism/overlap detector: any substring match of length at least
``k + w - 1`` between two documents is caught by a shared fingerprint,
while the fingerprint density stays ~2/(w+1) of the gram count.

Spark-first shape: fingerprinting is per-document expression work — the
k-gram hashes and window minima are higher-order array expressions
(JVM-side, no UDF, no shuffle), following the package's lambda-binding
rule (SCALING.md: bind reused subtrees through a one-element
``transform``, never re-evaluate them per lambda call). Corpus-level
overlap statistics are then ONE shuffle keyed by fingerprint value —
group-by-fingerprint is the MOSS join shape, and at 100 TB the shuffle
carries the winnowed fingerprints (a ~2/(w+1) fraction of gram count),
never the corpus text.

Hash family: first 8 md5 hex chars of the k-gram as an integer — the
engine-portable family every sketch oracle here uses
(operators/sketch.py), so DuckDB reproduces identical fingerprints and
the driver check is hash-exact, not rows-only. A production deployment
would swap in a true O(1)-per-shift Rabin-Karp polynomial hash; the
semantics (k-gram hash + window minima) and every plan shape are
identical, which is what these queries pin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def gram_hashes(text: Column | str, k: int = 5) -> Column:
    """Position-ordered character k-gram hashes: ``array<bigint>``, one
    entry per position 1..max(len-k+1, 1) (a document shorter than
    ``k`` yields one hash of its whole text — same convention both
    engines' ``substr`` gives for free)."""
    t = F.col(text) if isinstance(text, str) else text

    def per_text(tt: Column) -> Column:
        npos = F.greatest(F.length(tt) - (k - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), npos),
            lambda i: F.conv(
                F.substring(F.md5(F.encode(F.substring(tt, i, k), "UTF-8")), 1, 8),
                16,
                10,
            ).cast("bigint"),
        )

    # one-element transform binds the text through a lambda variable
    # (the SCALING.md lambda rule) so codegen sees one column reference
    return F.element_at(F.transform(F.array(t), per_text), 1)


def winnow_fingerprints(
    text: Column | str, k: int = 5, window: int = 4
) -> Column:
    """The document's winnowing fingerprint set: ``array<bigint>`` of
    DISTINCT window-minimum gram hashes. Any substring shared between
    two documents with length >= ``k + window - 1`` produces at least
    one shared fingerprint (the winnowing guarantee, pinned by the
    hypothesis property in tests/test_properties.py)."""
    hs = gram_hashes(text, k)

    def per_hashes(hh: Column) -> Column:
        nwin = F.greatest(F.size(hh) - (window - 1), F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), nwin),
                lambda j: F.array_min(F.slice(hh, j, window)),
            )
        )

    # bind the hash array once — it is referenced by size() AND slice()
    return F.element_at(F.transform(F.array(hs), per_hashes), 1)


def fingerprint_overlap_stats(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document overlap audit from the winnowed fingerprints: one
    row per document with ``(id, n_fingerprints, n_shared)`` where
    ``n_shared`` counts the document's fingerprints that also occur in
    at least one OTHER document — the curation signal for boilerplate
    and cross-document copying.

    Plan: explode the per-doc fingerprint set (already distinct per
    doc), ONE shuffle keyed by fingerprint to count carrying documents
    (map-side partial combine; a boilerplate fingerprint in half the
    corpus costs the reducer O(partitions), the exact heavy-hitter
    shape corpus_line_dedup documents), then a per-doc count — keyed by
    the unique document id, AQE-friendly."""
    fps = docs.select(
        F.col(id_col),
        F.explode(winnow_fingerprints(F.col(text_col), k, window)).alias("fp"),
    )
    by_fp = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        fps.join(by_fp, "fp")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
    )
