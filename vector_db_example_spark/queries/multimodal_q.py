"""Multimodal-column query inventory (north-star extension — binary
payload + typed metadata over the `documents` table; see
operators/multimodal.py for the scale design).

The frame-sample oracle deliberately does NOT chunk blobs in SQL: it
computes the expected frame counts/byte totals arithmetically from
``octet_length``, so it is an independent cross-check of the mapInPandas
chunker, not a re-implementation of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.multimodal import (
    attach_media,
    decode_images,
    extract_byte_histogram,
    extract_waveform_features,
    resize_images,
    sample_frames,
    synth_ppm_images,
)
from ..sources.tables import load_table
from .registry import register

_MEDIA_CTE = """
media AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         octet_length(encode(text))::BIGINT AS n_bytes,
         sha256(text) AS checksum
  FROM documents
)
"""


@register(
    "multimodal_metadata_stats",
    oracle=f"""
WITH {_MEDIA_CTE}
SELECT media_type,
       count(*)::BIGINT AS n_items,
       sum(n_bytes)::BIGINT AS total_bytes,
       round(avg(n_bytes), 6) AS avg_bytes,
       count(DISTINCT checksum)::BIGINT AS n_unique
FROM media
GROUP BY media_type
""",
    tags=("multimodal", "metadata", "agg"),
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over the media table: per-type counts, byte
    volumes, checksum-distinct (exact-dedup readiness). The binary column
    is pruned out of the scan — this is the cheap path at 100 TB."""
    media = attach_media(load_table(spark, sf_dir, "documents"))
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
        F.countDistinct("checksum").alias("n_unique"),
    )


@register(
    "multimodal_frame_sample",
    oracle=f"""
WITH {_MEDIA_CTE},
expect AS (
  SELECT media_type,
         ceil(n_bytes / 64.0)::BIGINT AS n_frames,
         n_bytes
  FROM media
),
per_doc AS (
  SELECT media_type,
         ((n_frames + 3) // 4)::BIGINT AS n_sampled,
         -- every sampled frame is 64 bytes except a sampled last ragged
         -- frame (sampled iff (n_frames-1) % 4 == 0)
         (((n_frames + 3) // 4) * 64
          + CASE WHEN (n_frames - 1) % 4 = 0
                 THEN n_bytes - 64 * n_frames ELSE 0 END)::BIGINT AS sampled_bytes
  FROM expect
)
SELECT media_type,
       sum(n_sampled)::BIGINT AS n_frames,
       sum(sampled_bytes)::BIGINT AS frame_bytes
FROM per_doc
GROUP BY media_type
""",
    tags=("multimodal", "frames", "mapInPandas"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample every 4th 64-byte frame of each payload (mapInPandas
    fan-out), then aggregate per media_type. The oracle derives the same
    totals purely arithmetically — an independent check of the chunker."""
    media = attach_media(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(media, frame_size=64, every=4)
    return frames.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.octet_length("frame_bytes")).alias("frame_bytes"),
    )


@register(
    "multimodal_image_decode_roundtrip",
    # The synthetic PPM corpus is closed-form in doc_id (dims 4+d%13 ×
    # 3+d%7, pixel(r,c,ch) = (d*31 + 7r + 3c + ch) % 256), so the oracle
    # checks the encode → nearest-neighbor resize → decode round-trip
    # arithmetically: resized first pixel is source pixel (0,0) and the
    # in-corner sample at dst (5,7) maps to src (floor(5*h/6), floor(7*w/8)).
    oracle="""
WITH img AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w_in,
         3 + doc_id % 7 AS h_in
  FROM documents WHERE doc_id % 3 = 0
)
SELECT doc_id,
       8 AS width, 6 AS height, 'RGB' AS mode,
       ((doc_id * 31) % 256)::INTEGER AS first_px,
       ((doc_id * 31 + 7 * ((5 * h_in) // 6) + 3 * ((7 * w_in) // 8) + 2)
         % 256)::INTEGER AS corner_px
FROM img
""",
    tags=("multimodal", "decode", "resize", "mapInPandas"),
)
def multimodal_image_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec path: synthesize PPM payloads per image-typed doc,
    resize nearest-neighbor to 8×6 (numpy inside mapInPandas), decode the
    resized payload, and probe two pixels. Every byte is deterministic,
    so the DuckDB oracle replays the whole round-trip in closed form."""
    images = synth_ppm_images(load_table(spark, sf_dir, "documents"))
    resized = resize_images(images, width=8, height=6)
    decoded = decode_images(resized)

    # Second probe, JVM-side: blue channel of resized pixel (row 5,
    # col 7). The resized header "P6\n8 6\n255\n" is 11 bytes, so the
    # byte sits at 1-based offset 11 + ((5*8 + 7)*3 + 2) + 1; substring
    # slices BINARY natively and hex→conv reads the byte value — no
    # second Python pass over the payloads.
    off = 11 + ((5 * 8) + 7) * 3 + 2 + 1
    corner = resized.select(
        "doc_id",
        F.conv(F.hex(F.expr(f"substring(payload, {off}, 1)")), 16, 10)
        .cast("int")
        .alias("corner_px"),
    )
    return decoded.join(corner, "doc_id").select(
        "doc_id", "width", "height", "mode", "first_px", "corner_px"
    )


@register(
    "multimodal_byte_histogram",
    # The corpus is pure ASCII (asserted by parity: a non-ASCII doc would
    # make byte != codepoint and fail the hash match loudly), so DuckDB
    # reproduces the byte histogram via per-char ord()//16, including the
    # float32 rounding of each per-doc mass. The pytest numpy reference
    # additionally covers the general (non-ASCII) byte path.
    oracle="""
WITH chars AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         string_split(text, '') AS cs
  FROM documents
),
feat AS (
  SELECT media_type, bins.b AS bin,
         (len(list_filter(cs, ch -> ord(ch) // 16 = bins.b))::DOUBLE
            / nullif(len(cs), 0))::FLOAT AS mass
  FROM chars CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bins
)
SELECT media_type, bin::INTEGER AS bin, round(avg(mass), 6) AS avg_mass
FROM feat GROUP BY media_type, bin
""",
    tags=("multimodal", "features", "mapInPandas"),
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-item feature vectors (byte histogram — the decode
    stand-in), aggregated to per-type mean feature mass per bin."""
    media = attach_media(load_table(spark, sf_dir, "documents"))
    feats = extract_byte_histogram(media, n_bins=16)
    return feats.select(
        "media_type", F.posexplode("features").alias("bin", "mass")
    ).groupBy("media_type", "bin").agg(
        F.round(F.avg("mass"), 6).alias("avg_mass")
    )


@register(
    "multimodal_audio_waveform_stats",
    # ASCII corpus ⇒ byte == ord(char) (same contract the byte-histogram
    # oracle states); all sums are integer-exact, so RMS is bit-exact.
    oracle="""
WITH xs AS (
  SELECT doc_id,
         list_transform(string_split(text, ''), ch -> ord(ch) - 128) AS x
  FROM documents
  WHERE doc_id % 3 = 1
)
SELECT doc_id,
       len(x)::BIGINT AS n_samples,
       round(sqrt(list_sum(list_transform(x, v -> (v * v)::DOUBLE)) / len(x)), 6)
         AS rms,
       list_max(list_transform(x, v -> abs(v)))::BIGINT AS peak,
       len(list_filter(range(1, len(x)), i -> x[i] * x[i + 1] < 0))::BIGINT
         AS zero_crossings
FROM xs
""",
    tags=("multimodal", "audio", "waveform", "mapInPandas"),
)
def multimodal_audio_waveform_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform feature extraction for the audio items (payload as u8
    PCM): sample count, RMS about the 128 midline, peak magnitude,
    sign-change count. The media-type filter prunes BEFORE the decode
    UDF, so only audio payloads are ever read."""
    media = attach_media(load_table(spark, sf_dir, "documents"))
    feats = extract_waveform_features(media.filter(F.col("media_type") == "audio"))
    return feats.select(
        "doc_id",
        "n_samples",
        F.round("rms", 6).alias("rms"),
        "peak",
        "zero_crossings",
    )


@register(
    "multimodal_image_feature_knn",
    # ASCII corpus ⇒ byte == ord(char), so the SQL histogram equals the
    # numpy one bit-for-bit (incl. each mass's float32 rounding), and the
    # L2 fold is the shared element-ordered double sum.
    oracle="""
WITH chars AS (
  SELECT doc_id, string_split(text, '') AS cs
  FROM documents WHERE doc_id % 3 = 0
),
feat AS (
  SELECT doc_id,
         list_transform(range(0, 16),
           b -> (len(list_filter(cs, ch -> ord(ch) // 16 = b))::DOUBLE
                   / len(cs))::FLOAT) AS fv
  FROM chars
),
q AS (SELECT fv AS qv FROM feat WHERE doc_id = 0),
d AS (
  SELECT f.doc_id,
         sqrt(list_sum(list_transform(range(1, 17),
           i -> (f.fv[i]::DOUBLE - q.qv[i]::DOUBLE)
              * (f.fv[i]::DOUBLE - q.qv[i]::DOUBLE)))) AS dist
  FROM feat f CROSS JOIN q
)
SELECT doc_id, round(dist, 6) AS distance
FROM d ORDER BY dist ASC, doc_id ASC LIMIT 10
""",
    tags=("multimodal", "features", "knn", "cross-modal"),
)
def multimodal_image_feature_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image similarity search over EXTRACTED features — the multimodal
    retrieval composition: decode-stand-in feature vectors (16-bin byte
    histogram, Arrow-batched) feed the exact k-NN operator, media-type
    filter pruning non-images BEFORE the feature UDF. This is the
    pipeline shape of real image dedup/search (CLIP embedding → ANN); at
    100 TB the feature pass is materialized once as a layout (like
    `embeddings`) and served by the IVF/LSH machinery — inlined here so
    the driver query is self-contained."""
    from ..operators.knn import knn_exact

    media = attach_media(load_table(spark, sf_dir, "documents"))
    imgs = media.filter(F.col("media_type") == "image")
    feats = extract_byte_histogram(imgs, n_bins=16).select("doc_id", "features")
    qv = feats.filter(F.col("doc_id") == 0).collect()[0]["features"]
    hits = knn_exact(
        feats,
        [float(x) for x in qv],
        k=10,
        vector_col="features",
        id_col="doc_id",
        score_threshold=None,
    )
    return hits.select("doc_id", F.round("distance", 6).alias("distance"))
