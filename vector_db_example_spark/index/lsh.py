"""Random-hyperplane LSH for cosine ANN (north-star similarity search —
the LSH-bucketed scale path next to the IVF layout in index/ivf.py).

Semantics (SimHash-for-vectors, Charikar 2002): ``n_planes`` fixed random
hyperplanes; a vector's bucket is the bit-pattern of sign(v·h_i). Cosine-
similar vectors agree on most signs, so a query only scans its own bucket
plus all buckets within Hamming distance ``probe_radius`` (multiprobe),
then reranks exactly.

Scale design:

* The plane matrix is (n_planes × dim) floats — broadcast as literal
  expressions; bucketing is a pure JVM expression column, so the one-off
  bucket assignment is a single map pass (or a partitioned write, same as
  the IVF layout, for repeated querying).
* A query's probe set is computed driver-side (tiny combinatorics); the
  scan filters ``bucket IN probes`` — with a bucket-partitioned layout
  that is partition pruning, identical machinery to IVF nprobe.
* Expected scan fraction ≈ Σ_{i<=r} C(n_planes, i) / 2^n_planes — tune
  n_planes to corpus size (buckets ≈ a few hundred rows each) and
  probe_radius to the recall target.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.knn import knn_exact


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplane matrix (n_planes × dim)."""
    return np.random.RandomState(seed).randn(n_planes, dim)


def bucket_expr(vector: Column, planes: np.ndarray) -> Column:
    """Bucket id = sign-bit pattern of v·h_i, as a pure expression (one
    dot product per plane via zip_with/aggregate — JVM-side, no Python)."""
    bits = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(lit_plane, vector, lambda p, v: p * v.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def bucket_of(vec, planes: np.ndarray) -> int:
    """Driver-side bucket of a query vector (same sign convention)."""
    dots = planes @ np.asarray(vec, dtype=np.float64)
    return int(sum(1 << i for i, d in enumerate(dots) if d >= 0))


def probe_buckets(bucket: int, n_planes: int, probe_radius: int = 1) -> list[int]:
    """Multiprobe set: all buckets within Hamming distance probe_radius."""
    probes = [bucket]
    for r in range(1, probe_radius + 1):
        for flips in combinations(range(n_planes), r):
            b = bucket
            for i in flips:
                b ^= 1 << i
            probes.append(b)
    return probes


def lsh_ann_search(
    corpus: DataFrame,
    query_vec,
    planes: np.ndarray,
    k: int = 10,
    probe_radius: int = 1,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k by cosine: prune to the multiprobe buckets, exact rerank
    within them. With a bucket-partitioned layout the IN-filter becomes
    partition pruning (see module docstring)."""
    probes = probe_buckets(
        bucket_of(query_vec, planes), len(planes), probe_radius
    )
    bucketed = corpus.withColumn("bucket", bucket_expr(F.col(vector_col), planes))
    pruned = bucketed.filter(F.col("bucket").isin(probes))
    return knn_exact(
        pruned,
        query_vec,
        k=k,
        vector_col=vector_col,
        metric="cosine",
        score_threshold=None,
        id_col=id_col,
    )
