"""Bucketed co-located joins + sketch accuracy — scale behaviors that
don't fit the (spark, sf_dir) -> DataFrame registry shape.

Bucketing is THE big-join answer at 100 TB: both fact tables are written
bucketed by the join key, so the sort-merge join reads co-located buckets
with NO exchange on either side — the shuffle happened once at write
time, amortized over every subsequent join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from vector_db_example_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        tbl = f"b_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            load_table(spark, SF_SMOKE, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(wh / tbl))
            .saveAsTable(tbl)
        )
    yield
    for tbl in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # merge hint: at sf0.001 orders would auto-broadcast, but the shape
    # under test is the fact×fact join where broadcast is impossible —
    # exactly when bucketing pays.
    joined = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_section = plan.split("HashAggregate")[-1]  # below the agg: the join
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in join_section, (
        "bucketed join must read co-located buckets with no exchange"
    )


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    def agg(df_l, df_o):
        return {
            r["o_orderpriority"]: float(r["qty"])
            for r in df_l.join(df_o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
            .collect()
        }

    bucketed = agg(spark.table("b_lineitem"), spark.table("b_orders"))
    plain = agg(
        load_table(spark, SF_SMOKE, "lineitem"),
        load_table(spark, SF_SMOKE, "orders"),
    )
    assert bucketed == plain


def test_approx_distinct_within_rsd(spark):
    """HLL++ at rsd=2%: estimates must sit within 5× the configured
    relative error of the exact counts (generous: rsd is a std-dev)."""
    from vector_db_example_spark.queries import QUERIES

    approx = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_approx_distinct_sketch"].fn(spark, SF_SMOKE).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_distinct_counts"].fn(spark, SF_SMOKE).collect()
    }
    assert set(approx) == set(exact)
    for flag, e in exact.items():
        a = approx[flag]
        for acol, ecol in (("approx_parts", "n_parts"), ("approx_supps", "n_supps")):
            rel = abs(a[acol] - e[ecol]) / e[ecol]
            assert rel <= 0.10, f"{flag}.{acol}: rel error {rel:.3f}"
        assert a["n_rows"] == e["n_rows"]


def test_approx_quantiles_within_epsilon(spark):
    """GK sketch at accuracy 10000: each estimate must be an actual data
    value whose rank is within ~epsilon·n of the target rank — checked
    directly against the sorted per-type values."""
    import numpy as np
    from vector_db_example_spark.queries import QUERIES
    from vector_db_example_spark.sources.tables import load_table

    approx = {
        r["event_type"]: r
        for r in QUERIES["events_approx_quantiles"].fn(spark, SF_SMOKE).collect()
    }
    rows = load_table(spark, SF_SMOKE, "events").select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    for etype, vals in by_type.items():
        vals = np.sort(np.array(vals))
        n = len(vals)
        a = approx[etype]
        assert a["n"] == n
        for col, pct in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            rank = np.searchsorted(vals, a[col], side="left")
            assert abs(rank - pct * n) <= max(2, 0.01 * n), (
                f"{etype}.{col}: rank {rank} vs target {pct * n:.0f}"
            )
