"""Count-min sketch over a Spark corpus — a mergeable frequency sketch
whose CONSTRUCTION and ESTIMATES are both exactly reproducible.

The engine's other sketches (HLL++ distinct counts, GK quantiles) are
rows-only for the driver because their internals are engine-specific.
Count-min is different: its state is a depth×width counter matrix under
a fixed hash family, so with the package's md5 discipline the whole
sketch is a deterministic pure function of the data — DuckDB builds the
identical matrix and the identical estimates, making even an
APPROXIMATE structure hash-checkable (the same trick that makes the
MinHash/LSH path oracle-exact).

Scale shape: building the sketch is one explode (×depth) feeding a
groupBy whose partial aggregation collapses each partition's
contribution to ≤ depth×width rows — the shuffle carries sketch-sized
data no matter how large the corpus, which is the entire point of a
mergeable sketch (counters from any partitioning/stream/segment sum
into the same matrix). Estimation joins query tokens against the tiny
broadcast counter table.

Standard guarantees (Cormode & Muthukrishnan 2005): estimate ≥ true
count always (counters only overcount on collisions), and with width w,
depth d the overestimate is ≤ εN with probability 1−δ for w = ⌈e/ε⌉,
d = ⌈ln(1/δ)⌉.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(token: Column, d: int, width: int) -> Column:
    """Row-``d`` bucket: first 8 md5 hex chars of "d|token" mod width —
    the engine-portable hash family (DuckDB computes the same value)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{d}|"), token).cast("binary")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % width
    )


def count_min_sketch(
    tokens: DataFrame, token_col: str = "t", depth: int = 4, width: int = 16
) -> DataFrame:
    """Build the (d, bucket, c) counter table from a DataFrame of token
    occurrences (one row per occurrence)."""
    pairs = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(token_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p")
    )
    return pairs.groupBy(
        F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))


def cms_estimates(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str = "t",
    depth: int = 4,
    width: int = 16,
) -> DataFrame:
    """Point estimates for the tokens in ``queries``: min over the
    sketch rows addressed by each token's buckets. The sketch is tiny
    (depth×width) and broadcast; unseen tokens estimate to 0."""
    qp = queries.select(
        token_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(token_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select(token_col, F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
    return (
        qp.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_estimate"))
    )
