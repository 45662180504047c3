"""Registry plumbing for the query inventory."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    #: Equivalent DuckDB SQL over the pre-registered table views; ``None``
    #: for genuinely non-SQL-expressible ops (driver falls back to a
    #: rows-only check).
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    #: Include in bench.py's headline set.
    bench: bool = False


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco
