"""Relational query inventory over the TPC-H-ish star schema.

The reference has no relational surface (single collection), but SURVEY.md
§2.3/§2.4 notes joins/aggregations come free from Spark and are exercised
by the driver's corpus. These queries pin down the engine's relational
semantics: multi-way joins (broadcast for dims), grouped aggregation with
partial (map-side) combine, windows, rollup, set ops, semi/anti joins.

Timestamps in lineitem/orders are date-precision; the session timezone is
UTC on both engines so date arithmetic compares exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.exactsum import exact_units
from ..sources.tables import load_table
from .registry import register


@register(
    "tpch_q1_pricing_summary",
    # Exact-units aggregation (see tpch_q5 / SCALING.md round 6): price,
    # discount, tax, and quantity all carry ≤2 decimals, so every
    # per-row measure is an exact multiple of 1e-2/1e-4/1e-6 — recovered
    # by identical one-row double math on both engines, summed as BIGINT
    # (associative: a double sum over this query's million-addend groups
    # is partition-merge-order dependent, the q5 failure class), then
    # divided once. Averages reuse the exact sums with an identical
    # left-to-right division chain; no post-aggregation rounding.
    oracle="""
SELECT
  l_returnflag, l_linestatus,
  sum(floor(l_quantity * 100 + 0.5)::BIGINT)::BIGINT / 100.0 AS sum_qty,
  sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT / 100.0 AS sum_base_price,
  sum(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)::BIGINT)::BIGINT
    / 10000.0 AS sum_disc_price,
  sum(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000 + 0.5)
      ::BIGINT)::BIGINT / 1000000.0 AS sum_charge,
  sum(floor(l_quantity * 100 + 0.5)::BIGINT)::BIGINT / 100.0 / count(*) AS avg_qty,
  sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT / 100.0 / count(*)
    AS avg_price,
  sum(floor(l_discount * 100 + 0.5)::BIGINT)::BIGINT / 100.0 / count(*) AS avg_disc,
  count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("relational", "agg"),
    bench=True,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation. Catalyst pushes the
    shipdate predicate into the Parquet scan and does map-side partial
    aggregation (6 groups → near-zero shuffle). Measures sum in exact
    integer units (2-decimal inputs) so the six million-addend groups
    are independent of partition merge order."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_u = exact_units(F.col("l_quantity"), 100)
    price_u = exact_units(F.col("l_extendedprice"), 100)
    disc_u = exact_units(F.col("l_discount"), 100)
    dp_u = exact_units(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    ch_u = exact_units(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax")),
        1000000,
    )
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_u) / F.lit(100.0)).alias("sum_qty"),
            (F.sum(price_u) / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(dp_u) / F.lit(10000.0)).alias("sum_disc_price"),
            (F.sum(ch_u) / F.lit(1000000.0)).alias("sum_charge"),
            (F.sum(qty_u) / F.lit(100.0) / n).alias("avg_qty"),
            (F.sum(price_u) / F.lit(100.0) / n).alias("avg_price"),
            (F.sum(disc_u) / F.lit(100.0) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("relational", "join", "topk"),
    bench=True,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + grouped agg + top-k.
    customer is small relative to lineitem → broadcast; the orderBy+limit
    compiles to TakeOrderedAndProject (no full sort)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "tpch_q5_local_supplier_volume",
    # Exact-units aggregation: price and discount carry 2 decimals each,
    # so per-row revenue is an exact multiple of 1e-4 — round(x*10000)
    # recovers that integer from identical per-row double math on both
    # engines, the BIGINT sum is associative (order-independent, unlike
    # a double sum whose partition-order noise flipped a .005 rounding
    # boundary at sf1.0 — see SCALING.md round 6), and the single final
    # division is deterministic.
    oracle="""
SELECT n_name,
       sum(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)::BIGINT)::BIGINT
         / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
    tags=("relational", "join", "agg"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with two tiny dims (nation, region)
    broadcast; supplier/customer co-join on nationkey. Revenue sums in
    exact 1e-4 units (BIGINT) so the aggregate is independent of
    partition merge order — the double-sum form was nondeterministic at
    a rounding boundary at sf1.0."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    units = exact_units(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
    )
    return joined.groupBy("n_name").agg(
        (F.sum(units) / F.lit(10000.0)).alias("revenue")
    )


@register(
    "window_top_orders_per_customer",
    oracle="""
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn::INTEGER AS rank
FROM r WHERE rn <= 3
""",
    tags=("relational", "window"),
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 generalized: per-group top-k via row_number window."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rank",
        )
    )


@register(
    "window_top_orders_salted",
    oracle="""
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn::INTEGER AS rank
FROM r WHERE rn <= 3
""",
    tags=("relational", "window", "skew"),
)
def window_top_orders_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same per-key top-k through the skew-resistant salted path
    (operators/skew.py) — deliberately given the SAME oracle as
    window_top_orders_per_customer: salting must not change a single
    row."""
    from ..operators.skew import salted_topk

    orders = load_table(spark, sf_dir, "orders")
    out = salted_topk(
        orders,
        key="o_custkey",
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
        n_salt=8,
        salt_on=F.col("o_orderkey"),
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        "rank",
    )


@register(
    "window_running_revenue",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
WHERE o_custkey < 100
""",
    tags=("relational", "window"),
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window (rows between unbounded preceding and current)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "agg_rollup_order_status",
    # exact-units sum (q5 failure class): the grand-total row sums EVERY
    # order — a million-addend double sum is partition-merge-order
    # dependent; 2-decimal o_totalprice sums exactly in cents
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*)::BIGINT AS n_orders,
       sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT / 100.0 AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    tags=("relational", "agg", "rollup"),
)
def agg_rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregation (ROLLUP) — subtotals + grand total.
    Totals sum in exact cents so the grand-total row is independent of
    partition merge order."""
    orders = load_table(spark, sf_dir, "orders")
    cents = exact_units(F.col("o_totalprice"), 100)
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(cents) / F.lit(100.0)).alias("total"),
    )


@register(
    "agg_cube_orders",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus, o_orderpriority)::BIGINT AS gid,
       count(*)::BIGINT AS n_orders,
       sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT / 100.0 AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("relational", "agg", "cube"),
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (status, priority) with the grouping-set id exposed
    (`grouping_id()` ≡ DuckDB `grouping(a, b)` bitmask, status = high bit)
    so NULL-as-subtotal is distinguishable from a NULL key value. Spark
    expands the 4 grouping sets map-side into one hash aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    cents = exact_units(F.col("o_totalprice"), 100)
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum(cents) / F.lit(100.0)).alias("total"),
    )


@register(
    "agg_distinct_counts",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey)::BIGINT AS n_parts,
       count(DISTINCT l_suppkey)::BIGINT AS n_supps,
       count(*)::BIGINT AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("relational", "agg"),
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple distinct aggregates in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_approx_distinct_sketch",
    oracle=None,  # HLL++ estimates are engine-specific; the relative-error
    # bound vs the exact count is pinned in tests/test_operators.py
    tags=("relational", "agg", "sketch"),
)
def agg_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct sketch (`approx_count_distinct`, rsd=2%).
    The 100 TB shape for distinct counting: the shuffle carries fixed-size
    sketch buffers instead of the exploded per-distinct-value rows that
    exact count-distinct needs — constant memory per group, one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "join_semi_anti_customers",
    oracle="""
SELECT
  (SELECT count(*) FROM customer c
     WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))::BIGINT
    AS with_orders,
  (SELECT count(*) FROM customer c
     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))::BIGINT
    AS without_orders
""",
    tags=("relational", "join"),
)
def join_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti joins (existence tests) — expressed as ONE
    plan: a left join against the distinct order keys, then a conditional
    count, so the customer and orders tables are each scanned once (the
    two-action semi+anti form cost two driver jobs and two scans)."""
    cust = load_table(spark, sf_dir, "customer")
    okeys = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    )
    joined = cust.join(okeys, cust.c_custkey == okeys.o_custkey, "left")
    return joined.agg(
        F.count(F.col("o_custkey")).alias("with_orders"),
        F.count_if(F.col("o_custkey").isNull()).alias("without_orders"),
    )


@register(
    "setop_part_brands",
    oracle="""
WITH big AS (SELECT p_brand FROM part WHERE p_size > 25),
pricey AS (SELECT p_brand FROM part WHERE p_retailprice > 900)
SELECT 'both' AS grp, p_brand FROM (SELECT p_brand FROM big INTERSECT
                                    SELECT p_brand FROM pricey)
UNION ALL
SELECT 'big_only' AS grp, p_brand FROM (SELECT p_brand FROM big EXCEPT
                                        SELECT p_brand FROM pricey)
""",
    tags=("relational", "setop"),
)
def setop_part_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT + EXCEPT of two predicate-defined brand sets (predicates
    loose enough that both branches are non-empty at every test SF)."""
    part = load_table(spark, sf_dir, "part")
    big = part.filter(F.col("p_size") > 25).select("p_brand")
    pricey = part.filter(F.col("p_retailprice") > 900).select("p_brand")
    both = big.intersect(pricey).select(F.lit("both").alias("grp"), "p_brand")
    only = big.subtract(pricey).select(  # subtract == SQL EXCEPT (distinct)
        F.lit("big_only").alias("grp"), "p_brand"
    )
    return both.unionByName(only)


#: Bucketed-table pairs per sf_dir per process (table names in the
#: session catalog; data lands in spark.sql.warehouse.dir).
_BUCKETED_CACHE: dict = {}


def get_bucketed_order_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """orders + lineitem written as BUCKETED tables (8 buckets on the
    join key, sorted within buckets): Spark's bucket metadata then proves
    both sides share a hash distribution, so an equi-join needs NO
    exchange — at 100 TB this is the difference between shuffling the
    fact tables on every join and shuffling them once at layout time
    (the same pay-at-write/save-at-read contract as the IVF/LSH/term
    layouts, applied to relational co-location; plan-pinned in
    tests/test_plans.py)."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    if sf_dir not in _BUCKETED_CACHE:
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        names = (f"bkt_orders_{tag}", f"bkt_lineitem_{tag}")
        # a prior process may have left the managed-table directories in
        # the warehouse while THIS process's in-memory catalog has no
        # such tables — saveAsTable then refuses (LOCATION_ALREADY_EXISTS),
        # so clear any unregistered leftover location first
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        for name in names:
            if not spark.catalog.tableExists(name):
                shutil.rmtree(
                    os.path.join(warehouse.path, name), ignore_errors=True
                )
        (
            load_table(spark, sf_dir, "orders")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(names[0])
        )
        (
            load_table(spark, sf_dir, "lineitem")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(names[1])
        )
        _BUCKETED_CACHE[sf_dir] = names
    return _BUCKETED_CACHE[sf_dir]


@register(
    "join_bucketed_colocated",
    # integer-exact aggregates only (count; sum of integer-valued
    # l_quantity doubles), so summation order cannot perturb the hash
    oracle="""
SELECT o.o_orderstatus, count(*)::BIGINT AS n_items,
       sum(l.l_quantity)::DOUBLE AS sum_qty
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
""",
    tags=("relational", "join", "bucketing", "layout"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exchange-free fact-fact join via bucketed layouts. In the 100 TB
    regime — both sides over the broadcast threshold, which the plan
    test forces with autoBroadcastJoinThreshold=-1 — the join runs as a
    SortMergeJoin with ZERO Exchange: the bucket metadata satisfies the
    hash-distribution requirement on both sides, so neither fact table
    is ever shuffled. At toy SF Catalyst rightly broadcasts the small
    side instead; either way the oracle states plain join semantics —
    the layout changes the PLAN, never the answer."""
    t_orders, t_lineitem = get_bucketed_order_tables(spark, sf_dir)
    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    joined = o.join(li, o["o_orderkey"] == li["l_orderkey"])
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("l_quantity").alias("sum_qty"),
    )
