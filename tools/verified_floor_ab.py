"""Measure the verified filter's FIXED batch-side floor against
band-only mode on a zero-collision fresh batch (VERDICT r13 gap #3).

Profile (the round-13 ad-hoc measurement, now a repeatable tool): the
corpus is the sf-dir documents table's %3<2 slice; the batch is the
%3==2 slice with every text replaced by synthesized-unique md5 words,
so NOTHING collides with the layout and no (band, key) repeats within
the batch — both filters suppress 0 and their walls are pure fixed
cost. Round-13 record: band-only 1.31 s, verified 2.47 s (min-of-3,
sf0.1) — the 1.16 s premium was the sig-only checkpoint plus the
re-derived band subtrees plus the always-built within algebra, all
layout-independent. Round 14 shares one materialization shape and
collapses the fresh-path plan (index/dedupidx.py::_sig_band_rows and
the no_under/no_within probes); this tool is the A/B that grades it.

Prints min-of-N walls per mode and the verified/band-only ratio.
Recorded in SCALING.md round 14.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--cap", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from vector_db_example_spark.index.dedupidx import (
        build_dedup_index,
        dedup_index_filter,
        dedup_index_filter_verified,
    )
    from vector_db_example_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 3 < 2).localCheckpoint(eager=True)
    # 40 unique letter-only words per doc, seeded by doc_id — shares no
    # shingle with anything (the crawl_loop_scale --fresh construction).
    batch = (
        docs.filter(F.col("doc_id") % 3 == 2)
        .select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(39)),
                    # '|' separator: concat(doc_id, i) alone is ambiguous
                    # ("11"+"2" == "1"+"12"), which plants identical
                    # 3-word runs across docs and fakes collisions
                    lambda i: F.regexp_replace(
                        F.md5(
                            F.concat_ws(
                                "|", F.col("doc_id").cast("string"), i.cast("string")
                            )
                        ),
                        "[0-9]",
                        "",
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    n_batch = batch.count()

    work = tempfile.mkdtemp(prefix="verified_floor_")
    try:
        index = build_dedup_index(corpus, f"{work}/idx")
        walls: dict[str, list[float]] = {"band-only": [], "verified": []}
        suppressed: dict[str, int] = {}
        for _ in range(args.runs):
            for mode in ("band-only", "verified"):
                t0 = time.monotonic()
                if mode == "band-only":
                    v = dedup_index_filter(spark, index, batch)
                else:
                    v = dedup_index_filter_verified(
                        spark,
                        index,
                        batch,
                        threshold=args.threshold,
                        candidate_cap=args.cap,
                    )
                n = v.filter("corpus_dup or within_dup").count()
                walls[mode].append(time.monotonic() - t0)
                suppressed[mode] = n
        print(
            f"sf_dir={args.sf_dir} corpus={corpus.count()} batch={n_batch} "
            f"runs={args.runs} cap={args.cap}"
        )
        for mode, ws in walls.items():
            print(
                f"{mode:<10} min={min(ws):.2f}s all={[round(w, 2) for w in ws]} "
                f"suppressed={suppressed[mode]}"
            )
        print(
            f"verified/band-only ratio: "
            f"{min(walls['verified']) / min(walls['band-only']):.2f}x"
        )
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
