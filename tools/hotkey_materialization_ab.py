"""A/B: executor-storage materialization of the verified dedup filter on a
boilerplate-heavy batch — the round-12 count-first rewrite vs the
round-11 shape (VERDICT r11 gap #1 / task 1).

The round-11 verified filter localCheckpointed the full ``hot`` frame —
every layout row colliding with ANY batch key — and only then computed
per-key counts and routed over-cap mega-keys to the no-enumeration
path. On a boilerplate-heavy batch (many batch docs sharing one hot
key) against a large corpus, that frame is collision-proportional: one
hot key held by N corpus docs materializes ~8·N rows before the cap
drops them. The round-12 shape aggregates the per-key counts ON the
streamed restricted scan and checkpoints only (a) the counts (≤ batch
keys) and (b) the under-cap candidate pairs (≤ cap·batch_bands).

This tool builds a corpus with an N-copy boilerplate cluster, runs BOTH
shapes on the same boilerplate-heavy batch (the round-11 shape is
inlined below from the module's public helpers — 15 lines, kept
verbatim so the A/B survives the rewrite), and reports rows + bytes
localCheckpointed and wall time. Verdict equality is asserted.

Usage:
    python tools/hotkey_materialization_ab.py [--copies 100000]
        [--distinct 10000] [--batch 100] [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOILER = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"


def _checkpoint_spy(spark):
    """Patch the concrete DataFrame class so every localCheckpoint
    records the row count of the materialized frame."""
    cls = type(spark.range(1))
    orig = cls.localCheckpoint
    records: list[int] = []

    def spy(self, eager=True):
        out = orig(self, eager=eager)
        records.append(out.count())
        return out

    cls.localCheckpoint = spy
    return records, lambda: setattr(cls, "localCheckpoint", orig)


def _old_shape(spark, index, batch, threshold, candidate_cap):
    """The round-11 verified filter, verbatim plan shape (checkpoint the
    full restricted collision frame, THEN count) — FULL filter including
    the within-batch half (identical in both rounds, copied verbatim) so
    the wall comparison is apples-to-apples with the real
    dedup_index_filter_verified."""
    from pyspark.sql import functions as F

    from vector_db_example_spark.index.dedupidx import (
        _BROADCAST_KEYS_MAX,
        _bands_of_sigs,
        _est_sim,
        _live,
        _read_bands,
        _read_sigs,
        signature_rows,
    )

    id_col = index.id_col
    bsigs = signature_rows(index, batch).localCheckpoint(eager=True)
    bands = _bands_of_sigs(index, bsigs)
    layout = _live(spark, index, _read_bands(spark, index))
    batch_keys = bands.select("band", "key").distinct()
    if bsigs.count() * index.bands <= _BROADCAST_KEYS_MAX:
        batch_keys = F.broadcast(batch_keys)
    hot = layout.join(batch_keys, ["band", "key"], "left_semi").localCheckpoint(
        eager=True
    )
    key_counts = hot.groupBy("band", "key").agg(F.count(F.lit(1)).alias("_n"))
    over = key_counts.filter(F.col("_n") > candidate_cap).select("band", "key")
    auto_hits = (
        bands.join(over, ["band", "key"], "left_semi").select(id_col).distinct()
    )
    cand = (
        bands.alias("b")
        .join(hot.join(over, ["band", "key"], "left_anti").alias("c"), ["band", "key"])
        .select(F.col(f"b.{id_col}").alias(id_col), F.col(f"c.{id_col}").alias("_cid"))
        .distinct()
    )
    csigs = _read_sigs(spark, index)
    if index.sig_buckets:
        from vector_db_example_spark.index.dedupidx import _sig_bucket_expr

        cand = cand.localCheckpoint(eager=True)
        buckets = [
            r["_b"]
            for r in cand.select(_sig_bucket_expr(index, F.col("_cid")).alias("_b"))
            .distinct()
            .collect()
        ]
        csigs = (
            csigs.filter(F.col("sig_bucket").isin(buckets))
            if buckets
            else csigs.filter(F.lit(False))
        )
    verified_hits = (
        cand.join(bsigs.withColumnRenamed("sig", "_bs"), id_col)
        .join(csigs.select(F.col(id_col).alias("_cid"), F.col("sig").alias("_cs")), "_cid")
        .filter(_est_sim(F.col("_bs"), F.col("_cs"), index.n_hashes) >= threshold)
        .select(id_col)
        .distinct()
    )
    corpus_hits = auto_hits.unionByName(verified_hits).distinct()
    # within-batch half + final verdict join: identical in both rounds,
    # copied verbatim so the walls compare full filter vs full filter
    new_bands = bands.join(corpus_hits, id_col, "left_anti")
    wcounts = new_bands.groupBy("band", "key").agg(
        F.count(F.lit(1)).alias("_n"), F.min(id_col).alias("_min_id")
    )
    wover = wcounts.filter(F.col("_n") > candidate_cap)
    wauto = (
        new_bands.join(wover.select("band", "key", "_min_id"), ["band", "key"])
        .filter(F.col(id_col) > F.col("_min_id"))
        .select(id_col)
        .distinct()
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
        .select(F.col(f"l.{id_col}").alias(id_col), F.col(f"r.{id_col}").alias("_rid"))
        .distinct()
    )
    wverified = (
        wpairs.join(bsigs.withColumnRenamed("sig", "_ls"), id_col)
        .join(bsigs.select(F.col(id_col).alias("_rid"), F.col("sig").alias("_rs")), "_rid")
        .filter(_est_sim(F.col("_ls"), F.col("_rs"), index.n_hashes) >= threshold)
        .select(id_col)
        .distinct()
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
    return {r[id_col] for r in verdicts.filter(F.col("corpus_dup")).collect()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=100_000)
    ap.add_argument("--distinct", type=int, default=10_000)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from vector_db_example_spark.index.dedupidx import (
        build_dedup_index,
        dedup_index_filter_verified,
    )
    from vector_db_example_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    corpus = (
        spark.range(args.copies)
        .select(F.col("id").alias("doc_id"), F.lit(BOILER).alias("text"))
        .unionByName(
            spark.range(args.copies, args.copies + args.distinct).select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit("unique document body "),
                    F.col("id").cast("string"),
                    F.lit(" alpha"),
                    (F.col("id") % 97).cast("string"),
                    F.lit(" beta"),
                    (F.col("id") % 89).cast("string"),
                    F.lit(" gamma"),
                    (F.col("id") % 83).cast("string"),
                ).alias("text"),
            )
        )
    )
    half = args.batch // 2
    batch = (
        spark.range(half)
        .select((F.col("id") + 10_000_000).alias("doc_id"), F.lit(BOILER).alias("text"))
        .unionByName(
            spark.range(half, args.batch).select(
                (F.col("id") + 10_000_000).alias("doc_id"),
                F.concat(
                    F.lit("fresh crawl doc "),
                    F.col("id").cast("string"),
                    F.lit(" delta"),
                    (F.col("id") % 71).cast("string"),
                    F.lit(" epsilon"),
                    (F.col("id") % 67).cast("string"),
                    F.lit(" zeta omega"),
                ).alias("text"),
            )
        )
        .localCheckpoint(eager=True)
    )

    work = tempfile.mkdtemp(prefix="hotkey_ab_")
    index = build_dedup_index(corpus, f"{work}/idx")
    print(
        f"corpus: {args.copies} boilerplate copies + {args.distinct} distinct; "
        f"batch: {half} colliders + {args.batch - half} fresh",
        flush=True,
    )

    results: dict[str, set] = {}
    for label, runner in (
        (
            "round-12 count-first",
            lambda: {
                r["doc_id"]
                for r in dedup_index_filter_verified(
                    spark, index, batch, threshold=0.5, candidate_cap=64
                )
                .filter(F.col("corpus_dup"))
                .collect()
            },
        ),
        (
            "round-11 checkpoint-hot",
            lambda: _old_shape(spark, index, batch, 0.5, 64),
        ),
    ):
        walls, max_rows, verdicts = [], 0, None
        for _ in range(args.runs):
            records, undo = _checkpoint_spy(spark)
            t0 = time.perf_counter()
            verdicts = runner()
            walls.append(time.perf_counter() - t0)
            undo()
            max_rows = max([max_rows] + records)
        results[label] = verdicts
        print(
            f"{label}: min wall {min(walls):.2f}s  "
            f"max rows checkpointed in one frame: {max_rows:,}  "
            f"corpus_dup count: {len(verdicts)}",
            flush=True,
        )
    a, b = results.values()
    assert a == b, "shapes disagree on corpus_dup — A/B is void"
    print("verdict sets identical across shapes", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
