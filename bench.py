"""Benchmark harness: runs the headline (bench-tagged) queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: The constant-work drift canary's line name (bench.py main + deltas).
_CANARY = "cpu_canary_md5_16m"


def main() -> None:
    from vector_db_example_spark.queries import QUERIES
    from vector_db_example_spark.session import get_spark

    spark = get_spark(app_name="vector_db_example_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in QUERIES.items() if q.bench}

    # JVM/codegen + Python-worker warmup on trivial plans so the first
    # query isn't charged for session/worker-pool spin-up (workers are
    # reused afterwards — spark.python.worker.reuse).
    spark.range(1000).selectExpr("sum(id)").collect()
    from vector_db_example_spark.functions.embedding import hashing_embedder

    from pyspark.sql import functions as F

    warm = hashing_embedder(8)
    spark.range(256).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        warm(F.col("id").cast("string"))
    ).collect()

    timings: dict[str, float] = {}

    # Constant-work CPU canary (no IO, no Python, fixed 16M-row md5
    # kernel over spark.range): host drift dominated raw BENCH_r{N}
    # deltas by round 14 (legacy lines ×1.1–1.7 on untouched code), so
    # every run records one line whose work NEVER changes — divide any
    # query's delta by the canary's to read code vs box in one step
    # (see _report_deltas' normalized column).
    canary_samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(0, 16_000_000, 1, 32).select(
            F.md5(F.concat(F.lit("canary|"), F.col("id").cast("string"))).alias(
                "h"
            )
        ).agg(F.max("h"), F.min("h")).collect()
        canary_samples.append(time.perf_counter() - t0)
    timings[_CANARY] = round(min(canary_samples), 3)

    # Index build is an ingest-time cost (the reference builds IVF at
    # collection creation, not per search) — time it as its own line so
    # the probe-search number measures search.
    from vector_db_example_spark.index.ivf import build_ivf_index
    from vector_db_example_spark.queries.index_q import get_ivf_index
    from vector_db_example_spark.sources.tables import load_table

    build_samples = []
    t0 = time.perf_counter()
    get_ivf_index(spark, SF_DIR, nlist=16)  # the layout the search queries use
    build_samples.append(time.perf_counter() - t0)
    # min-of-2, like every other line: the first build is still charged
    # ~2s of Python-worker/Arrow spin-up the warmup doesn't fully cover.
    t0 = time.perf_counter()
    build_ivf_index(
        load_table(spark, SF_DIR, "embeddings"), "/tmp/bench_ivf_rebuild", nlist=16
    )
    build_samples.append(time.perf_counter() - t0)
    timings["ivf_index_build"] = round(min(build_samples), 3)

    # min-of-2 per query: this box shows ±30% run-to-run spread on sub-3s
    # queries (r02's four >2x "regressions" were all machine noise that a
    # re-run dissolved) — the min of two back-to-back runs is a far more
    # stable point estimate of the plan's cost than a single sample.
    for name, q in sorted(bench_queries.items()):
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).collect()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_queries_total_wall",
        # The canary is drift INSTRUMENTATION, not a headline query: its
        # ~1 s of synthetic work stays out of the total so the metric
        # keeps meaning what its name says and stays comparable with
        # pre-r15 BENCH records (advisor finding, round 15). It remains
        # a `queries` entry (never removed/renamed) and is additionally
        # surfaced as its own top-level field.
        "value": round(
            sum(v for k, v in timings.items() if k != _CANARY), 3
        ),
        "unit": "sec",
        "queries": timings,
        "canary_sec": timings[_CANARY],
        "sf": sf_val,
    }
    print(json.dumps(result))
    _report_deltas(result)
    spark.stop()


def _report_deltas(result: dict) -> None:
    """Round-over-round tracking: compare against the newest BENCH_r*.json
    next to this script and print a per-query delta table to STDERR
    (stdout stays the one-line JSON contract). A headline query >2× its
    previous-round time is flagged as a REGRESSION."""
    here = Path(__file__).resolve().parent
    # Compare against the newest ROUND record (BENCH_r<N>.json, numeric
    # order) — a lexicographic glob would pick a side-record like
    # BENCH_r15_c8.json (the 8-core scaling run) over the round's real
    # 32-core record and print misleading deltas (round 16).
    import re as _re

    benches = [
        (int(m.group(1)), p)
        for p in here.glob("BENCH_r*.json")
        if (m := _re.fullmatch(r"BENCH_r(\d+)\.json", p.name))
    ]
    if not benches:
        return
    prev_path = max(benches)[1]
    try:
        prev = json.loads(prev_path.read_text())
    except (OSError, json.JSONDecodeError):
        return
    # Driver-recorded BENCH files wrap the bench JSON line under "parsed".
    prev = prev.get("parsed", prev)
    prev_q = prev.get("queries", {})
    # Drift normalization: when both records carry the constant-work
    # canary, divide each query's ratio by the canary's — the result
    # reads as the CODE's delta with the box's drift factored out.
    canary_ratio = None
    if prev_q.get(_CANARY) and result["queries"].get(_CANARY):
        canary_ratio = result["queries"][_CANARY] / prev_q[_CANARY]
    lines = [
        f"-- bench deltas vs {prev_path.name} "
        f"(total {prev.get('value')}s -> {result['value']}s"
        + (f"; canary x{canary_ratio:.2f}" if canary_ratio else "")
        + ") --"
    ]
    regressions = []
    for name, now in sorted(result["queries"].items()):
        was = prev_q.get(name)
        if was is None:
            lines.append(f"   {name:<40} {now:>7.3f}s   (new)")
            continue
        ratio = now / was if was else float("inf")
        mark = ""
        # Flag only when RAW AND drift-normalized ratios both exceed 2×
        # (advisor finding, round 15, tightened round 16): a real code
        # regression moves both; host drift inflates only the raw ratio
        # (the r14/r15 false-flag mode); and a FAST canary sample next
        # to an absolute-noise wobble on a sub-0.5 s floor line inflates
        # only the normalized one (observed round 16: raw ×1.48 floor
        # wobble read norm ×2.15 because the canary ran ×0.69).
        flag_ratio = ratio
        if canary_ratio and name != _CANARY:
            mark = f"  norm x{ratio / canary_ratio:.2f}"
            flag_ratio = min(ratio, ratio / canary_ratio)
        if flag_ratio > 2.0:
            mark += "  REGRESSION >2x"
            regressions.append(name)
        lines.append(f"   {name:<40} {now:>7.3f}s  vs {was:.3f}s  x{ratio:.2f}{mark}")
    for name in sorted(set(prev_q) - set(result["queries"])):
        lines.append(f"   {name:<40} (dropped; was {prev_q[name]:.3f}s)")
    if regressions:
        lines.append(f"-- {len(regressions)} regression(s): {', '.join(regressions)}")
    print("\n".join(lines), file=sys.stderr)


if __name__ == "__main__":
    main()
