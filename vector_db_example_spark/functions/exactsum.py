"""Order-independent aggregation of fixed-decimal doubles.

A double SUM's value depends on addition order, and Spark does not fix
partition merge order run-to-run — so `round(sum(x), 2)` over a
large-addend group can flip at a .005 boundary between runs (observed on
tpch_q5 at sf1.0; SCALING.md round 6). When the inputs carry a fixed
number of decimals (TPC-H money/discount/tax columns, the events value
column — all ≤2 decimals in the test data), the cure is exact-units
arithmetic:

1. per row, recover the exact integer ``x * scale`` — one-row double
   math is deterministic and identical across engines, and the product
   is within ~1e-4 of an integer, so ``floor(x*scale + 0.5)`` snaps it
   exactly (floor, not round(): Spark's Round on doubles allocates a
   BigDecimal per value — 2× slower on a scan-bound aggregate — while
   floor stays in whole-stage-codegen double math; the two agree
   everywhere the argument is near an integer, which it is by
   construction for non-negative fixed-decimal inputs);
2. SUM the BIGINT units — integer addition is associative, so any
   partition order gives the same total;
3. divide once by ``scale`` at the end — a single deterministic double
   op (no post-aggregation rounding, which would reintroduce a
   string-vs-float rounding-mode hazard between engines).

The DuckDB oracle states the identical computation as
``sum(floor(x * scale + 0.5)::BIGINT)::BIGINT / scale.0``.

Scale ceiling: BIGINT units overflow at ~9.2e18. At scale 100 that is
~9e16 currency units per group — beyond any 100 TB corpus; at scale 1e6
(three multiplied 2-decimal factors, tpch_q1's sum_charge) a 100 TB
group could approach it, in which case sum the units as
``DECIMAL(38,0)`` instead (still exact and associative; Spark and
DuckDB both widen decimal sums).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def exact_units(x: Column, scale: int) -> Column:
    """``x * scale`` snapped to the exact BIGINT it is known to be.

    ``x`` must be non-negative with at most ``log10(scale)`` decimals
    (e.g. a 2-decimal money column with scale=100); see module docstring
    for why this is floor-based and when it is exact."""
    return F.floor(x * scale + F.lit(0.5)).cast("long")


def exact_units_sql(expr: str, scale: int) -> str:
    """The DuckDB side of :func:`exact_units`, as a SQL fragment."""
    return f"floor({expr} * {scale} + 0.5)::BIGINT"
