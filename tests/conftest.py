from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running perf smokes (reference-shape index builds)"
    )


@pytest.fixture(scope="session")
def spark():
    from vector_db_example_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="vector_db_example_spark-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    # CREATE VIEW (main schema) on purpose, not con.register() (temp
    # schema): the crawl-production oracles shadow `documents` with a
    # `main.documents`-qualified CTE, which only resolves when the base
    # tables live in main — the qualifier dodges DuckDB's circular
    # same-name CTE reference (queries/streaming_q.py, advisor note
    # round 14). The external driver registers tables the same way.
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_CORRECTNESS}/{name}.parquet'"
        )
    yield con
    con.close()
