"""Structured Streaming: stream-on-static-input ≡ batch, plus the
foreachBatch continuous-ingest pipeline (SURVEY.md §1.4/§2.9 M6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from vector_db_example_spark.functions.text import clean_content
from vector_db_example_spark.queries import QUERIES
from vector_db_example_spark.sources.tables import load_table, restore_event_ts
from vector_db_example_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    windowed_type_counts,
)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_tumbling_equals_batch(spark):
    batch = QUERIES["events_tumbling_window"].fn(spark, SF_SMOKE)
    stream = run_to_memory(
        windowed_type_counts(read_events_stream(spark, SF_SMOKE)), name="t_eq"
    )
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(stream, cols) == _rows(batch, cols)
    assert stream.count() > 0


def test_stream_event_time_restored(spark):
    """The stream source must restore ts to the same microsecond timestamps
    as the batch loader (nanos → micros truncation)."""
    stream_ts = run_to_memory(
        read_events_stream(spark, SF_SMOKE)
        .withWatermark("ts", "2 hours")
        .groupBy()
        .agg(
            F.min("ts").alias("tmin"),
            F.max("ts").alias("tmax"),
            F.count(F.lit(1)).alias("n"),
        ),
        name="ts_range",
    ).collect()[0]
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .agg(F.min("ts"), F.max("ts"), F.count(F.lit(1)))
        .collect()[0]
    )
    assert (stream_ts[0], stream_ts[1], stream_ts[2]) == tuple(batch)


def test_stream_sessionization_counts(spark):
    """Session windows partition all events: per-user session counts must
    sum back to the per-user event counts, and no session may span a
    >= gap hole (spot-checked via the registered oracle in parity tests;
    here we check the partition invariant)."""
    sess = QUERIES["stream_events_sessionization"].fn(spark, SF_SMOKE)
    per_user_sessions = (
        sess.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()
    )
    batch_counts = dict(
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    assert {r["user_id"]: r["n"] for r in per_user_sessions} == batch_counts


def test_stream_ingest_documents(spark, tmp_path):
    from vector_db_example_spark.streaming.ingest import stream_ingest_documents

    n = stream_ingest_documents(
        spark,
        SF_SMOKE,
        sink_path=str(tmp_path / "sink"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    docs = load_table(spark, SF_SMOKE, "documents")
    expected = docs.filter(
        F.length(clean_content(F.col("text"))) >= 10
    ).count()
    assert n == expected

    out = spark.read.parquet(str(tmp_path / "sink"))
    assert out.count() == expected
    first = out.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in first] == [384]

    # Restart with the same checkpoint: availableNow is exactly-once, so
    # nothing is re-ingested.
    n2 = stream_ingest_documents(
        spark,
        SF_SMOKE,
        sink_path=str(tmp_path / "sink"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    assert n2 == 0
    assert spark.read.parquet(str(tmp_path / "sink")).count() == expected

    # Re-delivery (fresh checkpoint, same sink): foreachBatch is
    # at-least-once, so the same batches arrive again with the same ids —
    # the per-batch dynamic-overwrite sink must replace, not duplicate.
    n3 = stream_ingest_documents(
        spark,
        SF_SMOKE,
        sink_path=str(tmp_path / "sink"),
        checkpoint_path=str(tmp_path / "ckpt2"),
    )
    assert n3 == 0  # replaced its own partitions: no net new rows
    assert spark.read.parquet(str(tmp_path / "sink")).count() == expected


def test_stream_ingest_where_filters_rows(spark, tmp_path):
    """The selective-ingest predicate keeps filtered rows out of the
    layout entirely: only the matching vec_ids are appended, and the
    returned count reflects the filtered stream."""
    from vector_db_example_spark.index.ivf import build_ivf_index
    from vector_db_example_spark.sources.tables import load_table
    from vector_db_example_spark.streaming.ingest import (
        stream_ingest_embeddings_into_ivf,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    seed = emb.filter(F.col("vec_id") % 10 < 3)
    index = build_ivf_index(seed, path=str(tmp_path / "ivf"), nlist=4)
    n = stream_ingest_embeddings_into_ivf(
        spark, SF_SMOKE, index, checkpoint_path=str(tmp_path / "ckpt"),
        where=F.col("vec_id") % 10 >= 3,
    )
    rest = emb.filter(F.col("vec_id") % 10 >= 3).count()
    assert n == rest
    layout_ids = {
        r.vec_id for r in spark.read.parquet(index.path).select("vec_id").collect()
    }
    assert layout_ids == {r.vec_id for r in emb.select("vec_id").collect()}
    # each id exactly once: seed and stream partitions were disjoint
    assert spark.read.parquet(index.path).count() == emb.count()


def test_stream_ingest_into_ivf_layout(spark, tmp_path):
    """Streamed vectors land in the cell-partitioned layout and are
    found by a subsequent pruned search (nearest-centroid assignment ==
    the probe-list computation, so a streamed vector's cell is always
    probed first for itself)."""
    from vector_db_example_spark.index.ivf import build_ivf_index, ivf_search
    from vector_db_example_spark.sources.tables import load_table
    from vector_db_example_spark.streaming.ingest import (
        stream_ingest_embeddings_into_ivf,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    # seed layout from half the corpus; stream the WHOLE table in (the
    # stream path re-adds every row — counts double, all searchable)
    seed = emb.filter(F.col("vec_id") < 250)
    index = build_ivf_index(seed, path=str(tmp_path / "ivf"), nlist=8)
    n0 = spark.read.parquet(index.path).count()

    n = stream_ingest_embeddings_into_ivf(
        spark, SF_SMOKE, index, checkpoint_path=str(tmp_path / "ckpt")
    )
    assert n == emb.count()
    assert spark.read.parquet(index.path).count() == n0 + n

    # a vector that only exists via the stream (vec_id >= 250) is found
    # at distance 0 by a pruned probe
    qv = emb.filter(F.col("vec_id") == 400).collect()[0]["embedding"]
    hits = ivf_search(spark, index, qv, k=1, nprobe=1).collect()
    assert hits[0]["vec_id"] == 400 and hits[0]["distance"] == 0.0

    # A SECOND run with a FRESH checkpoint restarts batch ids at 0; its
    # commit markers are namespaced per checkpoint, so the stale markers
    # of run 1 must not swallow run 2's data (that would be silent loss,
    # not idempotence).
    n2 = stream_ingest_embeddings_into_ivf(
        spark, SF_SMOKE, index, checkpoint_path=str(tmp_path / "ckpt_fresh")
    )
    assert n2 == emb.count()
    assert spark.read.parquet(index.path).count() == n0 + n + n2

    # Re-delivery on the SAME checkpoint is a no-op (markers hit).
    n3 = stream_ingest_embeddings_into_ivf(
        spark, SF_SMOKE, index, checkpoint_path=str(tmp_path / "ckpt_fresh")
    )
    assert n3 == 0
    assert spark.read.parquet(index.path).count() == n0 + n + n2


def test_stateful_topk_merges_state_across_batches(spark, tmp_path):
    """applyInPandasWithState must MERGE per-user state across
    micro-batches: the events split into two files processed one file
    per trigger must end at the same per-user top-3 as one pass over
    everything (for every user updated in the final batch, and the
    others carry their batch-1 snapshot)."""
    import pandas as pd

    from vector_db_example_spark.streaming.events import stateful_user_topk

    src = tmp_path / "events_split"
    src.mkdir()
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    pdf[pdf.event_id % 2 == 0].to_parquet(src / "events_a.parquet", index=False)
    pdf[pdf.event_id % 2 == 1].to_parquet(src / "events_b.parquet", index=False)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(str(src)).schema
    stream = restore_event_ts(
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(src))
    )
    snapshots: list = []

    def capture(batch, batch_id):
        snapshots.append((batch_id, batch.toPandas()))

    q = (
        stateful_user_topk(stream, k=3)
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(snapshots) >= 2, "expected one micro-batch per file"

    # latest snapshot per user across batches = the operator's answer
    latest: dict[int, pd.DataFrame] = {}
    for _, snap in sorted(snapshots, key=lambda s: s[0]):
        for uid, grp in snap.groupby("user_id"):
            latest[uid] = grp

    expect = (
        pdf[pdf.value.notna()]
        .sort_values(["value", "event_id"], ascending=[False, True])
        .groupby("user_id")
        .head(3)
    )
    for uid, grp in expect.groupby("user_id"):
        got = latest[uid].sort_values("rank")
        assert got.event_id.tolist() == grp.event_id.tolist(), f"user {uid}"


def test_interval_join_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    """Left-outer stream-stream interval join: a purchase with no
    qualifying click must surface with null click columns — but only
    after the watermark passes its join bound, which a finite run has to
    force with later watermark-advancing input. Three micro-batches
    (maxFilesPerTrigger=1): batch A holds the real data (one matched
    purchase, one unmatched), batches B and C hold far-future events
    that drag the watermark past batch A's bounds."""
    import datetime as dt

    import pandas as pd

    from vector_db_example_spark.streaming.events import (
        interval_join_clicks_before_purchases,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def mk(rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        # micros, not pandas' default nanos — Spark reads TIMESTAMP(MICROS)
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        return pdf

    src = tmp_path / "ev"
    src.mkdir()
    # batch A: user 1 purchase at 12:00 with a click 10 min before
    # (match); user 2 purchase at 12:00 with no click at all (unmatched)
    mk(
        [
            (100, t0, 1, "purchase", 50.0),
            (101, t0 - dt.timedelta(minutes=10), 1, "click", 1.0),
            (200, t0, 2, "purchase", 70.0),
        ]
    ).to_parquet(src / "a_batch.parquet", index=False)
    # batches B, C: watermark advancers half a day out on BOTH types
    # (the join watermark is min over both input streams' watermarks)
    adv1 = t0 + dt.timedelta(hours=12)
    mk(
        [(900, adv1, 9, "purchase", 0.0), (901, adv1, 9, "click", 0.0)]
    ).to_parquet(src / "b_batch.parquet", index=False)
    adv2 = t0 + dt.timedelta(hours=24)
    mk(
        [(950, adv2, 9, "purchase", 0.0), (951, adv2, 9, "click", 0.0)]
    ).to_parquet(src / "c_batch.parquet", index=False)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"

    def read(name):
        return (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(str(src))
            .filter(F.col("event_type") == name)
        )

    joined = interval_join_clicks_before_purchases(
        read("purchase"), read("click"), watermark="1 hour", how="leftOuter"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("outer_ij")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("SELECT * FROM outer_ij").collect()
    }
    assert (100, 101) in got, got  # the inner match
    assert (200, None) in got, got  # unmatched purchase, null click


def test_rollup_upsert_merges_across_batches_and_late_data(spark, tmp_path):
    """The merge-upsert continuous aggregate: (a) a 2-batch replay equals
    the one-shot hourly aggregation; (b) re-running a drained stream on
    the same checkpoint is a no-op; (c) late data appended to the source
    and drained under the SAME checkpoint (the file source tracks
    processed files; batch ids continue past the committed markers)
    merges stragglers into already-closed hours instead of duplicating
    or dropping."""
    import pandas as pd

    from vector_db_example_spark.sources.tables import load_table, restore_event_ts
    from vector_db_example_spark.streaming.rollup import (
        read_rollup,
        stream_rollup_maintenance,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    src = tmp_path / "src"
    rollup = str(tmp_path / "rollup")
    for i in range(2):
        ev.filter(F.col("event_id") % 3 == i).write.mode("append").parquet(str(src))

    def run(ckpt: str) -> None:
        schema = spark.read.parquet(str(src)).schema
        stream = restore_event_ts(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        stream_rollup_maintenance(
            spark, stream, rollup_path=rollup, checkpoint_path=str(tmp_path / ckpt)
        )

    run("ckpt1")
    partial = {
        (r.hour_ts, r.event_type): (r.n, r.value_sum)
        for r in read_rollup(spark, rollup).collect()
    }
    expect_partial = {
        (r.hour_ts, r.event_type): (r.n, r.value_sum)
        for r in ev.filter(F.col("event_id") % 3 != 2)
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_ts"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .collect()
    }
    assert {k: (n, round(v, 6)) for k, (n, v) in partial.items()} == {
        k: (n, round(v, 6)) for k, (n, v) in expect_partial.items()
    }

    # same checkpoint, nothing new: no-op
    run("ckpt1")
    assert {
        (r.hour_ts, r.event_type): (r.n, r.value_sum)
        for r in read_rollup(spark, rollup).collect()
    } == partial

    # late data arrives (the remaining third); drain the same checkpoint
    ev.filter(F.col("event_id") % 3 == 2).write.mode("append").parquet(str(src))
    run("ckpt1")
    final = {
        (r.hour_ts, r.event_type): (r.n, round(r.value_sum, 6))
        for r in read_rollup(spark, rollup).collect()
    }
    expect_full = {
        (r.hour_ts, r.event_type): (r.n, round(r.value_sum, 6))
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_ts"
            ),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .collect()
    }
    assert final == expect_full


def test_hypertable_drop_chunks_retention(spark, tmp_path):
    """drop_chunks removes whole day partitions below the cutoff from
    both layouts and leaves survivors byte-identical (no rewrite)."""
    from vector_db_example_spark.index.hypertable import (
        build_hypertable,
        drop_chunks,
        hypertable_report,
    )
    from vector_db_example_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    ht = build_hypertable(ev, str(tmp_path / "ht"))
    before = spark.read.parquet(ht.raw_path).count()
    dropped = drop_chunks(spark, ht, older_than="2024-01-10")
    assert dropped > 0
    kept = spark.read.parquet(ht.raw_path)
    assert kept.count() < before
    assert kept.agg(F.min(F.to_date("event_date"))).collect()[0][0].isoformat() >= "2024-01-10"
    # the report still runs over the retained window
    rep = hypertable_report(spark, ht, tail_from="2024-01-25")
    assert rep.agg(F.min("event_date")).collect()[0][0] >= "2024-01-10"


def test_rollup_from_empty_stream_is_readable(spark, tmp_path):
    """A maintenance run over a zero-event stream writes no data file;
    read_rollup must still return a well-typed EMPTY rollup (the sink
    persists the rollup schema up front), and a later run with real
    events upserts into the same layout normally."""
    from vector_db_example_spark.sources.tables import load_table, restore_event_ts
    from vector_db_example_spark.streaming.rollup import (
        read_rollup,
        stream_rollup_maintenance,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "src")
    rollup = str(tmp_path / "rollup")
    ev.filter(F.lit(False)).write.parquet(src)  # schema'd, zero rows

    def run(ckpt: str) -> None:
        stream = restore_event_ts(
            spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
        )
        stream_rollup_maintenance(
            spark, stream, rollup_path=rollup, checkpoint_path=str(tmp_path / ckpt)
        )

    run("ckpt_empty")
    out = read_rollup(spark, rollup)
    assert out.count() == 0
    assert "hour_ts" in out.columns and "value_sum" in out.columns

    ev.write.mode("append").parquet(src)  # now feed the real events
    run("ckpt_full")
    assert read_rollup(spark, rollup).count() > 0
