"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real implementations live in ``vector_db_example_spark``; this module
just adapts the query registry to the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from vector_db_example_spark.queries import QUERIES  # noqa: E402
from vector_db_example_spark.queries.registry import driver_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's headline operation is a thresholded L2 top-k vector
    search (similarity_search, /root/reference/src/app.py:240-274); this is
    that operator, exact/brute-force, over the sf0.001 embeddings table.
    """
    return QUERIES["vector_knn_exact_l2"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered and capped (see ``registry.driver_queries``): the driver's
    CORRECTNESS run stops after ~50 entries, so never-driver-verified
    queries come first and entries hash-green in two prior rounds are
    trimmed (rotation policy documented in the registry). Every
    registered query — surfaced or not — stays oracle-checked locally by
    ``tests/test_oracle_parity.py``, which iterates the registry itself,
    so no count is repeated here to drift.
    """
    return {name: q.fn for name, q in driver_queries().items()}


def oracle_sql() -> dict[str, str]:
    """Equivalent DuckDB SQL per query (omitted → rows-only check)."""
    return {
        name: q.oracle for name, q in driver_queries().items() if q.oracle is not None
    }
