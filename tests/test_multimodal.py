"""Multimodal operators: binary payload plumbing, mapInPandas batch
shapes, deterministic byte-level semantics vs pure-Python references."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from vector_db_example_spark.operators.multimodal import (
    attach_media,
    decode_images,
    extract_byte_histogram,
    sample_frames,
)
from vector_db_example_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark):
    return attach_media(load_table(spark, SF_SMOKE, "documents")).cache()


def test_attach_media_metadata(spark, media):
    docs = {r["doc_id"]: r["text"] for r in
            load_table(spark, SF_SMOKE, "documents").collect()}
    rows = media.collect()
    assert len(rows) == len(docs)
    for r in rows:
        raw = docs[r["doc_id"]].encode("utf-8")
        assert bytes(r["payload"]) == raw
        assert r["n_bytes"] == len(raw)
        assert r["checksum"] == hashlib.sha256(raw).hexdigest()
        assert r["media_type"] == ("image", "audio", "video")[r["doc_id"] % 3]


def test_byte_histogram_matches_numpy(media):
    feats = {r["doc_id"]: r["features"]
             for r in extract_byte_histogram(media, n_bins=16).collect()}
    sample = media.limit(25).collect()
    for r in sample:
        b = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        expected = np.bincount(b // 16, minlength=16) / b.size
        got = np.array(feats[r["doc_id"]], dtype=np.float64)
        assert got.shape == (16,)
        assert abs(got.sum() - 1.0) < 1e-5
        np.testing.assert_allclose(got, expected, atol=1e-6)


def test_byte_histogram_rejects_bad_bins(media):
    with pytest.raises(ValueError):
        extract_byte_histogram(media, n_bins=15)


def test_sample_frames_reassembles_prefix(media):
    frames = sample_frames(media, frame_size=64, every=4)
    by_doc = (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min(F.octet_length("frame_bytes")).alias("min_len"),
            F.max(F.octet_length("frame_bytes")).alias("max_len"),
            F.max("frame_idx").alias("max_idx"),
        )
        .collect()
    )
    n_bytes = {r["doc_id"]: r["n_bytes"] for r in media.collect()}
    assert {r["doc_id"] for r in by_doc} == set(n_bytes)
    for r in by_doc:
        n_frames = -(-n_bytes[r["doc_id"]] // 64)
        assert r["n_sampled"] == (n_frames + 3) // 4
        assert r["max_idx"] == ((n_frames - 1) // 4) * 4
        assert r["max_len"] <= 64

    # frame 0 of each doc is the payload's first 64 bytes
    first = dict(
        frames.filter(F.col("frame_idx") == 0)
        .select("doc_id", "frame_bytes")
        .collect()
    )
    for r in media.limit(10).collect():
        assert bytes(first[r["doc_id"]]) == bytes(r["payload"])[:64]


def test_decode_images_is_gated_stub(media):
    """Codec libs are absent in this container: the decode surface must
    fail loudly at plan-build time, not silently return junk."""
    with pytest.raises(NotImplementedError):
        decode_images(media)


def test_metadata_query_prunes_payload(spark):
    """The metadata-stats plan must not read the binary payload column
    (column pruning down to the parquet scan)."""
    from vector_db_example_spark.queries import QUERIES

    plan = (
        QUERIES["multimodal_metadata_stats"]
        .fn(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "payload" not in scan[0]


def test_resize_images_is_gated_stub(media):
    from vector_db_example_spark.operators.multimodal import resize_images

    with pytest.raises(NotImplementedError):
        resize_images(media, 64, 64)
