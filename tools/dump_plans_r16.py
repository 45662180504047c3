"""Dump .explain("formatted") for the round-16 touched queries into
plans/r16/<name>_<tag>.txt (tag = before|after: run once on the
pre-change tree via `git stash`, once after).

Usage: python tools/dump_plans_r16.py <tag> [names...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT = [
    "dedup_incremental_batch_filter",
    "dedup_incremental_verified_batch_filter",
    "pipeline_corpus_curation",
    "dedup_simhash",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parents[1] / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)

    from vector_db_example_spark.queries import QUERIES
    from vector_db_example_spark.session import get_spark

    spark = get_spark(app_name="dump_plans_r16")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
