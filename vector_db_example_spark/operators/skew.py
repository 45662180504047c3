"""Skew-resistant operators (north-star scale engineering).

AQE's skew-join splitting handles skewed JOINS automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py). The two shapes
AQE does NOT fix are handled here:

* per-key top-k over a skewed key — a row_number window ships EVERY row
  of the hot key to one reducer and sorts it there. ``salted_topk`` cuts
  the hot key into ``n_salt`` shards, takes a per-shard top-k (each shard
  a different reducer), and reruns the window on the surviving
  ``k × n_salt`` rows per key. Top-k is algebraic (the global top-k is
  contained in the union of shard top-ks), so results are IDENTICAL to
  the unsalted window — which the registry checks by giving the salted
  query the same DuckDB oracle as the plain one.
* distinct counting per skewed key — exact count-distinct shuffles every
  (key, value) occurrence of the hot key to one reducer's hash set.
  ``skew_resistant_count_distinct`` dedupes on (key, value) first (that
  shuffle is spread by value, not concentrated by key), then counts —
  two well-distributed stages, same exact answer.

Salting uses a deterministic hash of a stable id, not ``rand()`` —
deterministic retries matter at scale (a failed stage re-executes; a
rand() salt would re-shard rows differently mid-query).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_topk(
    df: DataFrame,
    key: str,
    order: Sequence[Column],
    k: int,
    salt_on: str | Column,
    n_salt: int = 8,
    rank_col: str = "rank",
) -> DataFrame:
    """Per-key top-k that survives a pathologically hot key.

    ``order`` must be a total order (include a unique tiebreaker) so the
    result is deterministic and exactly equals the unsalted window.
    ``salt_on`` is a stable VALUE column (e.g. the unique id) to derive
    the shard from — it must not carry a sort direction (sort expressions
    are not hashable values)."""
    salt = F.pmod(F.xxhash64(salt_on), F.lit(n_salt))
    w_shard = Window.partitionBy(key, "__salt").orderBy(*order)
    survivors = (
        df.withColumn("__salt", salt)
        .withColumn("__srn", F.row_number().over(w_shard))
        .filter(F.col("__srn") <= k)
        .drop("__srn")
    )
    w_final = Window.partitionBy(key).orderBy(*order)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w_final))
        .filter(F.col(rank_col) <= k)
        .drop("__salt")
    )


def skew_resistant_count_distinct(
    df: DataFrame, key: str, value: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count as two spread-out stages: dedupe on
    (key, value) — partitioned by both, so a hot key fans out across
    reducers — then count per key (map-side partial combine applies)."""
    return (
        df.select(key, value)
        .distinct()
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
