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


def test_ppm_codec_roundtrip_bit_exact():
    from vector_db_example_spark.operators.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)


def test_resize_nearest_matches_numpy_oracle():
    from vector_db_example_spark.operators.multimodal import _resize_nearest

    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, size=(6, 10, 3), dtype=np.uint8)
    out = _resize_nearest(arr, width=4, height=3)
    for r in range(3):
        for c in range(4):
            assert np.array_equal(out[r, c], arr[(r * 6) // 3, (c * 10) // 4])


def test_decode_images_real_ppm_path(spark):
    """decode_images actually executes on PPM payloads (no codec lib):
    dims and first pixel match the synthetic corpus' closed form."""
    from vector_db_example_spark.operators.multimodal import synth_ppm_images

    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    decoded = decode_images(synth_ppm_images(docs)).collect()
    assert decoded
    for r in decoded:
        d = r.doc_id
        assert (r.width, r.height, r.mode) == (4 + d % 13, 3 + d % 7, "RGB")
        assert r.first_px == (d * 31) % 256


def test_decode_images_unknown_format_fails_loudly(spark, media):
    """Non-image bytes (the text-derived payloads) must raise, not
    silently return junk, when no codec library is present."""
    from vector_db_example_spark.operators.multimodal import _HAS_PIL

    if _HAS_PIL:
        pytest.skip("PIL present: unknown formats go to the PIL path")
    with pytest.raises(Exception, match="unsupported image format"):
        decode_images(media).collect()


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


def test_resize_images_real_ppm_path(spark):
    """Full executor-side resize: payload out is a decodable PPM of the
    target size whose pixels are the nearest-neighbor sample of the
    source (checked against the closed-form pixel formula)."""
    from vector_db_example_spark.operators.multimodal import (
        decode_ppm,
        resize_images,
        synth_ppm_images,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    out = resize_images(synth_ppm_images(docs), width=8, height=6).collect()
    assert out
    for r in out:
        d = r.doc_id
        arr = decode_ppm(bytes(r.payload))
        assert arr.shape == (6, 8, 3)
        w_in, h_in = 4 + d % 13, 3 + d % 7
        for rr, cc in ((0, 0), (5, 7), (2, 3)):
            src_r, src_c = (rr * h_in) // 6, (cc * w_in) // 8
            expect = [(d * 31 + 7 * src_r + 3 * src_c + ch) % 256 for ch in range(3)]
            assert arr[rr, cc].tolist() == expect
