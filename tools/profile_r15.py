"""Round-15 measurement harness (guide §1: measure first).

Per-phase wall breakdown of the three most expensive bench lines —
the verified/band batch filters and the composed crawl-intake bench —
plus isolated timings of the shared kernels (shingle+minhash, embed),
so optimization targets the measured wall, not the suspected one.

Usage: python tools/profile_r15.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def t(label, fn, n=2):
    """min-of-n wall timer (the bench convention)."""
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        samples.append(time.perf_counter() - t0)
    print(f"  {label:<58} {min(samples):7.3f}s  (runs: "
          + ", ".join(f"{s:.3f}" for s in samples) + ")")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    sf_dir = args.sf_dir

    from pyspark.sql import functions as F

    from vector_db_example_spark.functions.embedding import hashing_embedder
    from vector_db_example_spark.index.dedupidx import (
        _read_bands,
        _sig_band_rows,
        band_rows,
        dedup_index_filter,
        dedup_index_filter_verified,
        signature_rows,
    )
    from vector_db_example_spark.queries.dedup_q import get_dedup_index
    from vector_db_example_spark.session import get_spark
    from vector_db_example_spark.sources.tables import load_table

    spark = get_spark(app_name="profile_r15")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = hashing_embedder(8)
    spark.range(256).repartition(32).select(
        warm(F.col("id").cast("string"))).collect()

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") < 5000).unionByName(
        docs.filter((F.col("doc_id") < 5000) & (F.col("doc_id") % 5 == 0)).select(
            (F.col("doc_id") + 2000000).alias("doc_id"), "text"
        )
    )
    index = get_dedup_index(spark, sf_dir)  # build outside all timers

    print(f"== kernels (sf_dir={sf_dir}, batch={b1.count()} docs) ==")
    noop = lambda df: df.write.format("noop").mode("overwrite").save()
    t("batch signature_rows (shingle+minhash kernel) -> noop",
      lambda: noop(signature_rows(index, b1)))
    t("batch band_rows (kernel + band explode) -> noop",
      lambda: noop(band_rows(index, b1)))
    t("batch _sig_band_rows (kernel + bands + sig col) -> noop",
      lambda: noop(_sig_band_rows(index, b1)))
    t("layout band scan -> noop",
      lambda: noop(_read_bands(spark, index)))
    emb = hashing_embedder(64)
    t("embed 5000 docs (Arrow pandas UDF) -> noop",
      lambda: noop(docs.select(emb(F.col("text")).alias("v"))))

    print("== full filter lines (bench shape, collect) ==")
    t("dedup_index_filter (band-only) collect",
      lambda: dedup_index_filter(spark, index, b1).collect())
    t("dedup_index_filter_verified collect",
      lambda: dedup_index_filter_verified(
          spark, index, b1, threshold=0.5, candidate_cap=64).collect())

    print("== verified filter sub-phases (single pass, wall per stage) ==")
    t0 = time.perf_counter()
    sb = _sig_band_rows(index, b1).localCheckpoint(eager=True)
    print(f"  sb checkpoint: {time.perf_counter() - t0:.3f}s")
    t0 = time.perf_counter()
    n = sb.count()
    print(f"  sb.count() [{n} rows]: {time.perf_counter() - t0:.3f}s")
    from vector_db_example_spark.index.dedupidx import _live
    bands = sb.select(index.id_col, "band", "key")
    layout = _live(spark, index, _read_bands(spark, index))
    batch_keys = F.broadcast(bands.select("band", "key").distinct())
    t0 = time.perf_counter()
    key_counts = (
        layout.join(batch_keys, ["band", "key"], "left_semi")
        .groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=True)
    )
    print(f"  key_counts checkpoint: {time.perf_counter() - t0:.3f}s")
    t0 = time.perf_counter()
    verd = dedup_index_filter_verified(
        spark, index, b1, threshold=0.5, candidate_cap=64)
    verd.collect()
    print(f"  full verified filter (end-to-end again): "
          f"{time.perf_counter() - t0:.3f}s")

    print("== crawl production bench, stage walls (monkeypatched) ==")
    import vector_db_example_spark.streaming.crawl as crawl_mod
    from vector_db_example_spark.queries import streaming_q

    stage_walls: dict[str, float] = {}

    def wrap(mod, name, label):
        orig = getattr(mod, name)

        def timed(*a, **kw):
            t0 = time.perf_counter()
            out = orig(*a, **kw)
            stage_walls[label] = stage_walls.get(label, 0.0) + (
                time.perf_counter() - t0)
            return out

        setattr(mod, name, timed)
        return orig

    import shutil as _sh

    import vector_db_example_spark.index.inverted as inv_mod
    import vector_db_example_spark.index.ivf as ivf_mod

    origs = [
        (crawl_mod, "dedup_index_filter_verified_with_rows",
         wrap(crawl_mod, "dedup_index_filter_verified_with_rows",
              "verified_filter")),
        (crawl_mod, "dedup_index_append_rows",
         wrap(crawl_mod, "dedup_index_append_rows", "dedup_append")),
        (inv_mod, "append_to_inverted_index",
         wrap(inv_mod, "append_to_inverted_index", "inverted_append")),
        (inv_mod, "bm25_search_inverted",
         wrap(inv_mod, "bm25_search_inverted", "bm25_leg")),
        (ivf_mod, "ivf_search", wrap(ivf_mod, "ivf_search", "ivf_leg")),
        (streaming_q, "shutil",
         None),  # placeholder; copytree timed below
        (crawl_mod, "stream_crawl_ingest",
         wrap(crawl_mod, "stream_crawl_ingest", "stream_total")),
    ]
    origs = [o for o in origs if o[2] is not None]
    orig_copytree = _sh.copytree

    def timed_copytree(*a, **kw):
        t0 = time.perf_counter()
        out = orig_copytree(*a, **kw)
        stage_walls["copytree"] = stage_walls.get("copytree", 0.0) + (
            time.perf_counter() - t0)
        return out

    _sh.copytree = timed_copytree
    # first (uncached-pristine) run builds the layouts; run twice like bench
    for run in range(2):
        stage_walls.clear()
        t0 = time.perf_counter()
        streaming_q._production_ingest(
            spark, sf_dir, max_doc_id=1000, reuse_builds=True).collect()
        total = time.perf_counter() - t0
        print(f"  run {run}: total {total:.3f}s, stage walls: "
              + ", ".join(f"{k}={v:.3f}s" for k, v in stage_walls.items()))
    for mod, name, orig in origs:
        setattr(mod, name, orig)
    _sh.copytree = orig_copytree

    spark.stop()


if __name__ == "__main__":
    main()
