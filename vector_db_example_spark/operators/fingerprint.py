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


def _winnow_pairs_arrow(k: int, window: int, id_col: str, text_col: str):
    """Arrow kernel emitting the exploded (id, fp) fingerprint pairs —
    bit-identical to the expression path's md5-prefix family (first 8
    hex chars == first 4 digest bytes big-endian), with the window
    minima as one vectorized sliding-window reduction per document.
    The expression form is an interpreted per-element lambda doing an
    md5 per gram (the SCALING.md round-4 hot-path rule: higher-order
    lambdas are interpreter loops); this kernel is the measured ~20×
    faster production path at sf1.0."""
    import hashlib

    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    def gen(batches):
        for pdf in batches:
            ids_out: list[int] = []
            fps_out: list[int] = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                s = str(t) if t is not None else ""
                b = s.encode("utf-8")
                npos = max(len(s) - k + 1, 1)
                # note: slice by CHARACTER to match substring();
                # encode per gram (multi-byte chars stay correct)
                hs = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.md5(s[p : p + k].encode("utf-8")).digest()[:4],
                            "big",
                        )
                        for p in range(npos)
                    ),
                    dtype=np.int64,
                    count=npos,
                ) if len(b) != len(s) else np.fromiter(
                    (
                        int.from_bytes(hashlib.md5(b[p : p + k]).digest()[:4], "big")
                        for p in range(npos)
                    ),
                    dtype=np.int64,
                    count=npos,
                )
                if npos >= window:
                    mins = sliding_window_view(hs, window).min(axis=1)
                else:
                    mins = hs.min(keepdims=True)
                fps = np.unique(mins)
                ids_out.extend([int(i)] * len(fps))
                fps_out.extend(int(x) for x in fps)
            yield pd.DataFrame({id_col: ids_out, "fp": fps_out})

    return gen


def fingerprint_overlap_stats(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "arrow",
    min_partitions: int | None = None,
) -> DataFrame:
    """Per-document overlap audit from the winnowed fingerprints: one
    row per document with ``(id, n_fingerprints, n_shared)`` where
    ``n_shared`` counts the document's fingerprints that also occur in
    at least one OTHER document — the curation signal for boilerplate
    and cross-document copying.

    ``impl="arrow"`` (default) computes the per-doc fingerprint pairs
    in an Arrow kernel — same md5-prefix hash family as the expression
    form, so the output (and the DuckDB oracle hash) is identical,
    ~20× faster at sf1.0 (SCALING.md round-6). ``impl="expr"`` keeps
    the pure-expression form (winnow_fingerprints) for plan parity.

    Plan: per-doc fingerprint pairs (distinct per doc by
    construction), ONE shuffle keyed by fingerprint to count carrying
    documents (map-side partial combine; a boilerplate fingerprint in
    half the corpus costs the reducer O(partitions), the exact
    heavy-hitter shape corpus_line_dedup documents), then a per-doc
    count — keyed by the unique document id, AQE-friendly.

    ``min_partitions``: the md5-per-gram kernel is CPU-DENSE relative
    to its input bytes (text compresses ~10×), so a bytes-sized scan
    split can under-parallelize it badly — a 5 MB parquet of 50 MB of
    text opens as 2 partitions and runs the kernel on 2 cores. Pass
    the cluster's parallelism to widen CPU-bound fingerprinting; the
    one text shuffle it may cost is the same size as the scan, and a
    100 TB corpus arrives pre-split across many files anyway (the knob
    is then a no-op since current partitioning already exceeds it)."""
    if min_partitions and docs.rdd.getNumPartitions() < min_partitions:
        docs = docs.repartition(min_partitions)
    if impl == "arrow":
        fps = docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
            _winnow_pairs_arrow(k, window, id_col, text_col),
            f"{id_col} long, fp long",
        )
    elif impl == "expr":
        fps = docs.select(
            F.col(id_col),
            F.explode(winnow_fingerprints(F.col(text_col), k, window)).alias("fp"),
        )
    else:
        raise ValueError(f"unknown impl {impl!r}")
    # Materialize the fingerprint table ONCE before the self-join: `fps`
    # feeds both the groupBy side and the join probe side, and their
    # exchange subtrees differ (the groupBy's partial combine runs before
    # its shuffle), so Catalyst cannot ReusedExchange them — without this
    # the md5-per-gram kernel (or the expression winnow) executes twice
    # per query. Same idiom as the dedup shingle tables
    # (operators/dedup.py:190). A window over fp would also run the
    # kernel once but would lose the map-side combine AND AQE's
    # skew-join splitting on the boilerplate-fingerprint hot key.
    fps = fps.localCheckpoint(eager=True)
    by_fp = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        fps.join(by_fp, "fp")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
    )
