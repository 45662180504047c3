"""Round-16 interleaved A/B harness (memory/verdict rule: never trust
raw wall deltas on this host — interleave the variants in ONE session
and read them against the constant-work canary).

Usage: python tools/ab_r16.py --what narrow [--sf-dir ...] [--n 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def canary(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    spark.range(0, 16_000_000, 1, 32).select(
        F.md5(F.concat(F.lit("canary|"), F.col("id").cast("string"))).alias("h")
    ).agg(F.max("h"), F.min("h")).collect()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--what", default="narrow")
    ap.add_argument("--n", type=int, default=4)
    args = ap.parse_args()
    sf_dir = args.sf_dir

    from pyspark.sql import functions as F

    from vector_db_example_spark.functions.embedding import hashing_embedder
    from vector_db_example_spark.session import get_spark

    spark = get_spark(app_name="ab_r16")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = hashing_embedder(8)
    spark.range(256).repartition(32).select(
        warm(F.col("id").cast("string"))).collect()

    import vector_db_example_spark.index.dedupidx as dx
    from vector_db_example_spark.queries import dedup_q

    if args.what == "chits":
        chits_variants(spark, sf_dir, args.n)
    if args.what == "widen":
        widen_narrow_variants(spark, sf_dir, args.n)
    if args.what == "curation":
        curation_variants(spark, sf_dir, args.n)
    if args.what == "narrow":
        real_narrow = dx._narrow_ckpt
        variants = {
            "narrow_on": lambda: setattr(dx, "_narrow_ckpt", real_narrow),
            "narrow_off": lambda: setattr(
                dx, "_narrow_ckpt", lambda df, n: df
            ),
        }
        lines = {
            "verified": lambda: dedup_q.dedup_incremental_verified_batch_filter(
                spark, sf_dir).collect(),
            "band": lambda: dedup_q.dedup_incremental_batch_filter(
                spark, sf_dir).collect(),
        }
        # warm both variants once (index build, JIT)
        for setv in variants.values():
            setv()
            for fn in lines.values():
                fn()
        results: dict[tuple[str, str], list[float]] = {}
        print(f"canary: {canary(spark):.3f}s")
        for i in range(args.n):
            for vname, setv in variants.items():
                setv()
                for lname, fn in lines.items():
                    t0 = time.perf_counter()
                    fn()
                    results.setdefault((vname, lname), []).append(
                        time.perf_counter() - t0)
        print(f"canary: {canary(spark):.3f}s")
        dx._narrow_ckpt = real_narrow
        for (vname, lname), ss in sorted(results.items()):
            print(f"  {vname:<12} {lname:<10} min {min(ss):.3f}s  "
                  + ", ".join(f"{s:.3f}" for s in ss))

    spark.stop()




def curation_variants(spark, sf_dir: str, n: int) -> None:
    """Interleaved A/B: pipeline_corpus_curation with vs without the
    broadcast hint on the loser anti-join (round-16 adjudication of the
    r15 x1.11 'regressed' flag)."""
    import time

    from pyspark.sql import functions as F

    from vector_db_example_spark.functions.text import clean_content
    from vector_db_example_spark.operators.dedup import (
        exact_dedup,
        minhash_near_duplicates,
    )
    from vector_db_example_spark.queries.dedup_q import _PLANT_SUFFIX
    from vector_db_example_spark.sources.tables import load_table

    def run(hint: bool) -> None:
        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
        raw = (
            docs.select(F.col("doc_id").alias("id"), "source", "text")
            .unionByName(docs.select((F.col("doc_id") + 100000).alias("id"),
                                     "source",
                                     F.concat("text", F.lit(_PLANT_SUFFIX)).alias("text")))
            .unionByName(docs.select((F.col("doc_id") + 200000).alias("id"),
                                     "source", F.upper("text").alias("text")))
        )
        cleaned = raw.withColumn("text", clean_content(F.col("text")))
        quality = cleaned.filter((F.length("text") >= 10)
                                 & (F.size(F.split(F.trim("text"), r"\s+")) >= 5))
        exact_d = exact_dedup(quality, F.md5(F.lower("text")), id_col="id")
        exact_d = exact_d.localCheckpoint(eager=True)
        pairs = minhash_near_duplicates(exact_d, text_col="text", id_col="id",
                                        shingle_k=3, n_hashes=16, bands=8,
                                        threshold=0.6)
        losers = pairs.select(F.col("b_id").alias("id")).distinct()
        losers = F.broadcast(losers) if hint else losers
        curated = exact_d.join(losers, "id", "left_anti")
        curated.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("total_tokens"),
        ).collect()

    for h in (True, False):
        run(h)  # warm
    results: dict[bool, list[float]] = {True: [], False: []}
    print(f"canary: {canary(spark):.3f}s")
    for _ in range(n):
        for h in (True, False):
            t0 = time.perf_counter()
            run(h)
            results[h].append(time.perf_counter() - t0)
    print(f"canary: {canary(spark):.3f}s")
    for h, ss in results.items():
        print(f"  hint={h!s:<5} min {min(ss):.3f}s  "
              + ", ".join(f"{s:.3f}" for s in ss))




def widen_narrow_variants(spark, sf_dir: str, n: int) -> None:
    """Interleaved A/B: minhash_near_duplicates with the round-16
    wide-kernel/narrow-checkpoint discipline vs the stock round-15
    shape (no widen, no narrow, no count job)."""
    import time

    import vector_db_example_spark.operators.dedup as dop
    from vector_db_example_spark.queries import dedup_q

    # NOTE: the widen+narrow variant was REVERTED in operators/dedup.py
    # after this A/B measured it losing (see OPTIMIZATION_r16.md); the
    # seam below survives only to re-run the experiment if needed.
    real_narrow = getattr(dop, '_narrow', lambda ckpt: ckpt)
    # widen lives behind a local import inside the operator; seam it via
    # sources.tables (these three lines touch no dedupidx path)
    import vector_db_example_spark.sources.tables as tbl
    real_tbl_widen = tbl.widen_cpu_dense

    def on_full():
        dop._narrow = real_narrow
        tbl.widen_cpu_dense = real_tbl_widen

    def off_full():  # stock r15 shape: no widen, no narrow, no count job
        dop._narrow = lambda ckpt: ckpt
        tbl.widen_cpu_dense = lambda df, factor=1: df

    variants = {
        "widen+narrow": on_full,
        "stock_r15": off_full,
    }
    lines = {
        "minhash_lsh": lambda: dedup_q.dedup_minhash_lsh(spark, sf_dir).collect(),
        "curation": lambda: dedup_q.pipeline_corpus_curation(spark, sf_dir).collect(),
        "simhash": lambda: dedup_q.dedup_simhash(spark, sf_dir).collect(),
    }
    for setv in variants.values():
        setv()
        for fn in lines.values():
            fn()
    results = {}
    print(f"canary: {canary(spark):.3f}s")
    for _ in range(n):
        for vname, setv in variants.items():
            setv()
            for lname, fn in lines.items():
                t0 = time.perf_counter()
                fn()
                results.setdefault((vname, lname), []).append(
                    time.perf_counter() - t0)
    print(f"canary: {canary(spark):.3f}s")
    on_full()
    for (vname, lname), ss in sorted(results.items()):
        print(f"  {vname:<14} {lname:<12} min {min(ss):.3f}s  "
              + ", ".join(f"{s:.3f}" for s in ss))




def chits_variants(spark, sf_dir: str, n: int) -> None:
    """Interleaved A/B: localCheckpoint of corpus_hits in the verified
    filter (re-test of the r15 negative, post-narrow landscape)."""
    import time

    import vector_db_example_spark.index.dedupidx as dx
    from vector_db_example_spark.queries import dedup_q

    # NOTE: the _CKPT_CORPUS_HITS seam was REMOVED from dedupidx after
    # this A/B measured a dead heat (5.373 vs 5.401 min-of-5 — AQE
    # runtime exchange reuse already dedups the subtree, same as the
    # r15 negative); re-add the flag to re-run.
    lines = {
        "verified": lambda: dedup_q.dedup_incremental_verified_batch_filter(
            spark, sf_dir).collect(),
    }
    variants = {"ckpt_on": True, "ckpt_off": False}
    for v in variants.values():
        dx._CKPT_CORPUS_HITS = v
        for fn in lines.values():
            fn()
    results = {}
    print(f"canary: {canary(spark):.3f}s")
    for _ in range(n):
        for vname, v in variants.items():
            dx._CKPT_CORPUS_HITS = v
            for lname, fn in lines.items():
                t0 = time.perf_counter()
                fn()
                results.setdefault((vname, lname), []).append(
                    time.perf_counter() - t0)
    print(f"canary: {canary(spark):.3f}s")
    dx._CKPT_CORPUS_HITS = False
    for (vname, lname), ss in sorted(results.items()):
        print(f"  {vname:<10} {lname:<10} min {min(ss):.3f}s  "
              + ", ".join(f"{s:.3f}" for s in ss))


if __name__ == "__main__":
    main()
