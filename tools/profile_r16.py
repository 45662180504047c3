"""Round-16 measurement harness (guide §1: measure first).

Per-JOB wall breakdown of the big bench lines via the Spark UI REST API
(http://localhost:4040/api/v1): every Spark job in a timed window is
listed with its name/description, duration, and the DRIVER-SIDE GAP
since the previous job finished — the gaps are where availableNow
stream machinery, py4j round-trips, and file-listing hide. Module
functions on the crawl path are wrapped to stamp job descriptions so
jobs attribute to pipeline stages.

Usage: python tools/profile_r16.py [--sf-dir ...] [--what crawl|verified|curation|multi|all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl  # e.g. http://host:4040
    with urllib.request.urlopen(f"{base}/api/v1{path}") as r:
        return json.loads(r.read())


def _app_id(spark) -> str:
    return spark.sparkContext.applicationId


def _jobs_between(spark, t0_ms: float, t1_ms: float):
    jobs = _api(spark, f"/applications/{_app_id(spark)}/jobs?status=succeeded")
    out = []
    for j in jobs:
        sub = _parse_ts(j["submissionTime"])
        if t0_ms <= sub <= t1_ms:
            comp = _parse_ts(j.get("completionTime", j["submissionTime"]))
            out.append(
                {
                    "id": j["jobId"],
                    "sub": sub,
                    "comp": comp,
                    "dur": (comp - sub) / 1000.0,
                    "desc": (j.get("description") or j.get("name", ""))[:90],
                    "tasks": j.get("numCompletedTasks", 0),
                }
            )
    out.sort(key=lambda x: x["id"])
    return out


def _parse_ts(s: str) -> float:
    # "2026-08-18T03:40:12.123GMT"
    import datetime as dt

    return (
        dt.datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .timestamp()
        * 1000.0
    )


def _report_window(spark, label: str, t0: float, t1: float) -> None:
    """Print every job in [t0, t1] (epoch seconds) with duration and the
    gap since the previous job's completion (driver-side dead time)."""
    jobs = _jobs_between(spark, t0 * 1000.0, t1 * 1000.0)
    wall = t1 - t0
    busy = sum(j["dur"] for j in jobs)
    print(f"\n== {label}: wall {wall:.3f}s, {len(jobs)} jobs, "
          f"sum-of-job-durations {busy:.3f}s, driver/other {wall - busy:.3f}s ==")
    prev_comp = t0 * 1000.0
    gap_total = 0.0
    for j in jobs:
        gap = max(0.0, (j["sub"] - prev_comp) / 1000.0)
        gap_total += gap
        print(f"  job {j['id']:>4}  gap {gap:6.3f}s  dur {j['dur']:6.3f}s  "
              f"tasks {j['tasks']:>4}  {j['desc']}")
        prev_comp = max(prev_comp, j["comp"])
    tail = max(0.0, t1 * 1000.0 - prev_comp) / 1000.0
    print(f"  (gaps total {gap_total:.3f}s + tail {tail:.3f}s)")


def _stamp(spark, mod, name: str, label: str):
    """Wrap mod.name so its jobs carry `label` as the job description."""
    orig = getattr(mod, name)

    def stamped(*a, **kw):
        spark.sparkContext.setJobDescription(label)
        try:
            return orig(*a, **kw)
        finally:
            spark.sparkContext.setJobDescription(None)

    setattr(mod, name, stamped)
    return (mod, name, orig)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--what", default="all")
    args = ap.parse_args()
    sf_dir = args.sf_dir

    from pyspark.sql import functions as F

    from vector_db_example_spark.functions.embedding import hashing_embedder
    from vector_db_example_spark.session import get_spark

    spark = get_spark(app_name="profile_r16")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = hashing_embedder(8)
    spark.range(256).repartition(32).select(
        warm(F.col("id").cast("string"))).collect()

    want = args.what

    if want in ("crawl", "all"):
        import vector_db_example_spark.index.inverted as inv_mod
        import vector_db_example_spark.index.ivf as ivf_mod
        import vector_db_example_spark.streaming.crawl as crawl_mod
        from vector_db_example_spark.queries import streaming_q

        restores = [
            _stamp(spark, crawl_mod, "dedup_index_filter_verified_with_rows",
                   "STAGE:verified_filter"),
            _stamp(spark, crawl_mod, "dedup_index_append_rows",
                   "STAGE:dedup_append"),
            _stamp(spark, inv_mod, "append_to_inverted_index",
                   "STAGE:inverted_append"),
            _stamp(spark, inv_mod, "bm25_search_inverted", "STAGE:bm25_leg"),
            _stamp(spark, ivf_mod, "ivf_search", "STAGE:ivf_leg"),
        ]
        # run 1 warms the pristine-build cache; run 2 is the timed one
        streaming_q._production_ingest(
            spark, sf_dir, max_doc_id=1000, reuse_builds=True).collect()
        t0 = time.time()
        streaming_q._production_ingest(
            spark, sf_dir, max_doc_id=1000, reuse_builds=True).collect()
        t1 = time.time()
        for mod, name, orig in restores:
            setattr(mod, name, orig)
        _report_window(spark, "stream_crawl_production_bench (run 2)", t0, t1)

    if want in ("verified", "all"):
        from vector_db_example_spark.queries import dedup_q

        fn = dedup_q.dedup_incremental_verified_batch_filter
        fn(spark, sf_dir).collect()
        t0 = time.time()
        fn(spark, sf_dir).collect()
        t1 = time.time()
        _report_window(spark, "dedup_incremental_verified_batch_filter (run 2)",
                       t0, t1)

        fn2 = dedup_q.dedup_incremental_batch_filter
        fn2(spark, sf_dir).collect()
        t0 = time.time()
        fn2(spark, sf_dir).collect()
        t1 = time.time()
        _report_window(spark, "dedup_incremental_batch_filter (run 2)", t0, t1)

    if want in ("curation", "all"):
        from vector_db_example_spark.queries import dedup_q

        fn = dedup_q.pipeline_corpus_curation
        fn(spark, sf_dir).collect()
        t0 = time.time()
        fn(spark, sf_dir).collect()
        t1 = time.time()
        _report_window(spark, "pipeline_corpus_curation (run 2)", t0, t1)

        fn = dedup_q.dedup_minhash_lsh
        fn(spark, sf_dir).collect()
        t0 = time.time()
        fn(spark, sf_dir).collect()
        t1 = time.time()
        _report_window(spark, "dedup_minhash_lsh (run 2)", t0, t1)

    if want in ("multi", "all"):
        from vector_db_example_spark.queries import pipeline_q

        fn = pipeline_q.pipeline_multi_strategy
        fn(spark, sf_dir).collect()
        t0 = time.time()
        fn(spark, sf_dir).collect()
        t1 = time.time()
        _report_window(spark, "pipeline_multi_strategy (run 2)", t0, t1)

    spark.stop()


if __name__ == "__main__":
    main()
