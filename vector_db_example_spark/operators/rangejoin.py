"""Bounded-interval range join (north-star events operator).

``A range-join B ON a.key = b.key AND b.ts IN [a.ts - W, a.ts)`` executed
naively is a per-key cross product with a range filter — quadratic in hot
keys and not shuffle-plannable. The scale shape is **time bucketing**:
with bucket width = W, any b within [a.ts − W, a.ts) lies in a's bucket
or the one before, so exploding each left row to its two candidate
buckets turns the range join into an EQUI-join on (key, bucket) — a
plain hash shuffle Catalyst plans well — followed by the exact range
filter on the (small) candidate set. Cost: 2× left rows shuffled, zero
false-negative, candidates bounded by 2 buckets per row."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 1800,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows of the same ``key`` with
    ``right_ts ∈ [left_ts − window, left_ts)``. Columns from both sides
    survive (right's ts column is exposed as ``__right_ts``)."""
    w_us = window_seconds * 1_000_000

    def bucket(ts: Column) -> Column:
        # Floor division via pmod, not `/` + cast: the cast truncates
        # toward zero, which mis-buckets pre-1970 (negative-micros)
        # timestamps at bucket boundaries. (us - pmod(us, w)) is an exact
        # multiple of w, so the division is exact for any valid timestamp.
        us = F.unix_micros(ts)
        return ((us - F.pmod(us, F.lit(w_us))) / w_us).cast("long")

    lb = left.withColumn(
        "__bucket", F.explode(F.array(bucket(F.col(left_ts)) - 1, bucket(F.col(left_ts))))
    )
    rb = right.withColumnRenamed(right_ts, "__right_ts").withColumn(
        "__bucket", bucket(F.col("__right_ts"))
    )
    joined = lb.join(rb, [key, "__bucket"], "inner").filter(
        (F.unix_micros("__right_ts") >= F.unix_micros(F.col(left_ts)) - w_us)
        & (F.unix_micros("__right_ts") < F.unix_micros(F.col(left_ts)))
    )
    # the bucket explosion can match the same (left, right) pair only
    # once (a right row lives in exactly one bucket), so no dedup needed
    out = joined.drop("__bucket")
    if how == "inner":
        return out
    raise ValueError(f"unsupported how={how!r} (use the caller's left join)")
