"""Mirror of the driver's correctness gate: every registered query's Spark
result must match its DuckDB oracle at sf0.01 — row count, column set and
values (order-insensitive, compared after sorting rows by all columns).

We compare *exactly* (no tolerance) — the engine's arithmetic is designed
to be bit-identical to the oracle's (double math, fixed fold order,
identical rounding), which is what makes the driver's value-hash match.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from vector_db_example_spark.queries import QUERIES

from conftest import SF_CORRECTNESS

ORACLE_QUERIES = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, q in QUERIES.items() if q.oracle is None)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[col] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_integer_dtype(s):
            df[col] = s.astype("int64")
        elif s.dtype == object:
            df[col] = s.astype(str)
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> None:
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: row count {len(spark_pd)} (spark) != {len(duck_pd)} (oracle)"
    )
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"{name}: columns {sorted(spark_pd.columns)} != {sorted(duck_pd.columns)}"
    )
    a, b = _normalize(spark_pd), _normalize(duck_pd)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, (
                    f"{name}.{col}[{i}]: {x!r} != {y!r} (diff {abs(x - y):.3e})"
                )
            else:
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck):
    q = QUERIES[name]
    spark_pd = q.fn(spark, SF_CORRECTNESS).toPandas()
    duck_pd = duck.execute(q.oracle).fetchdf()
    assert len(spark_pd) > 0, f"{name}: spark result is empty — weak test"
    _compare(name, spark_pd, duck_pd)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(name, spark):
    q = QUERIES[name]
    df = q.fn(spark, SF_CORRECTNESS)
    assert df.count() >= 0
