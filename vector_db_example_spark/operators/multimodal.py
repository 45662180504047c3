"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / frame-sample as Arrow-batched ``mapInPandas``
operators (north-star extension; the reference is text-only, so this is
the engine's media surface for LLM-data pipelines).

Design for 100 TB:

* Media is an opaque ``binary`` column next to typed metadata
  (``media_type``, ``n_bytes``, ``checksum``) — metadata predicates
  (type, size range, checksum dedup) are Catalyst expressions that push
  down to the parquet scan, so the binary column is never even read for
  metadata-only queries (column pruning).
* Heavy per-item work (decode, feature extraction, frame sampling) runs
  as ``mapInPandas`` — Arrow batches in, Arrow batches out, one Python
  worker per core, no driver collect, no shuffle. Output size is bounded
  per batch, so executor memory stays flat regardless of table size.
* The actual image/audio codecs are NOT in this container; ``decode``
  is therefore a clearly-marked stub behind an import-try (real plumbing,
  fake pixels). The byte-level operators (histogram features, frame
  sampling) are real and deterministic, and stand in for the same
  batch shape a torchvision/librosa decode would have.

Test payloads are derived deterministically from the driver's
``documents`` table (``payload = encode(text, 'UTF-8')``) so every
metadata operator is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    pass

try:  # codec libraries are absent in this container — gate, don't import-fail
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

#: Media-type assignment for the synthetic corpus (deterministic from the
#: key so the DuckDB oracle reproduces it).
MEDIA_TYPES = ("image", "audio", "video")


def media_type_for(key: Column) -> Column:
    """Deterministic media_type from an int key (doc_id % 3)."""
    return (
        F.when(key % 3 == 0, MEDIA_TYPES[0])
        .when(key % 3 == 1, MEDIA_TYPES[1])
        .otherwise(MEDIA_TYPES[2])
    )


def attach_media(docs: DataFrame) -> DataFrame:
    """documents → multimodal table: opaque binary ``payload`` + typed
    metadata columns. On a real pipeline the payload arrives from object
    storage; here it is derived from ``text`` so oracles are exact."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        media_type_for(F.col("doc_id")).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
    )


# ---------------------------------------------------------------------------
# Feature extraction: normalized byte histogram (the deterministic stand-in
# for an image/audio embedding — same mapInPandas batch shape).
# ---------------------------------------------------------------------------

FEATURES_SCHEMA = "doc_id long, media_type string, features array<float>"


def extract_byte_histogram(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-item feature vector: L1-normalized histogram of payload bytes
    in ``n_bins`` equal-width bins. Arrow-batched, numpy-vectorized within
    the batch; scales linearly with executors (no shuffle)."""
    if 256 % n_bins != 0:
        raise ValueError(f"n_bins must divide 256, got {n_bins}")
    width = 256 // n_bins

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for buf in pdf["payload"]:
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                if b.size == 0:
                    feats.append(np.zeros(n_bins, dtype=np.float32))
                    continue
                hist = np.bincount(b // width, minlength=n_bins).astype(np.float64)
                feats.append((hist / hist.sum()).astype(np.float32))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        compute, FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# Frame sampling: treat the payload as a stream of fixed-size frames and
# keep every k-th one (video keyframe sampling shape: 1 row → N rows).
# ---------------------------------------------------------------------------

FRAMES_SCHEMA = "doc_id long, media_type string, frame_idx int, frame_bytes binary"


def sample_frames(
    media: DataFrame, frame_size: int = 64, every: int = 4
) -> DataFrame:
    """Chunk each payload into ``frame_size``-byte frames (last frame
    ragged) and emit frames ``0, every, 2*every, ...``. mapInPandas so a
    single huge payload fans out executor-side without ever visiting the
    driver."""
    if frame_size <= 0 or every <= 0:
        raise ValueError("frame_size and every must be positive")

    def chop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "media_type": [],
                "frame_idx": [],
                "frame_bytes": [],
            }
            for doc_id, mt, buf in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                raw = bytes(buf)
                n_frames = (len(raw) + frame_size - 1) // frame_size
                for idx in range(0, n_frames, every):
                    out["doc_id"].append(doc_id)
                    out["media_type"].append(mt)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(
                        raw[idx * frame_size : (idx + 1) * frame_size]
                    )
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        chop, FRAMES_SCHEMA
    )


# ---------------------------------------------------------------------------
# Codec-backed decode — REAL for PPM (P6), a format simple enough to codec
# in pure numpy (header + raw RGB24), so the decode/resize mapInPandas path
# actually executes and is deterministic end-to-end. Other formats fall
# back to PIL when installed (it is not, in this container).
# ---------------------------------------------------------------------------


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6) bytes."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(buf: bytes):
    """Binary PPM (P6) bytes → (h, w, 3) uint8 array."""
    import re

    import numpy as np

    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", buf)
    if m is None:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = (int(g) for g in m.groups())
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    pixels = np.frombuffer(buf, dtype=np.uint8, count=h * w * 3, offset=m.end())
    return pixels.reshape(h, w, 3)


def _resize_nearest(arr, width: int, height: int):
    """Nearest-neighbor resize (floor index map — deterministic, the
    standard src = floor(dst * in/out) grid)."""
    import numpy as np

    h_in, w_in = arr.shape[:2]
    rows = (np.arange(height) * h_in) // height
    cols = (np.arange(width) * w_in) // width
    return arr[rows][:, cols]


DECODED_IMAGE_SCHEMA = (
    "doc_id long, width int, height int, mode string, first_px int"
)


def _decode_one(buf: bytes):
    """payload → (width, height, mode, first_px). PPM natively; anything
    else via PIL when present."""
    if buf[:2] == b"P6":
        arr = decode_ppm(buf)
        return arr.shape[1], arr.shape[0], "RGB", int(arr[0, 0, 0])
    if _HAS_PIL:  # pragma: no cover — PIL absent in this container
        import io

        from PIL import Image as PILImage

        img = PILImage.open(io.BytesIO(buf))
        first = img.getpixel((0, 0))
        return img.width, img.height, img.mode, int(
            first[0] if isinstance(first, tuple) else first
        )
    raise ValueError(
        "unsupported image format (only PPM/P6 decodes without Pillow)"
    )


def decode_images(media: DataFrame) -> DataFrame:
    """Decode image payloads to (width, height, mode, first_px) inside
    mapInPandas. PPM (P6) decodes in pure numpy — deterministic and
    always available; other formats require Pillow."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                w, h, mode, px = _decode_one(bytes(buf))
                rows.append((doc_id, w, h, mode, px))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mode", "first_px"]
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        decode, DECODED_IMAGE_SCHEMA
    )


RESIZED_SCHEMA = "doc_id long, media_type string, payload binary"


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image payloads to (width × height) inside mapInPandas.
    PPM (P6) payloads resize nearest-neighbor in numpy and re-encode as
    PPM (bit-deterministic); other formats require Pillow."""
    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")

    def resize_one(buf: bytes) -> bytes:
        if buf[:2] == b"P6":
            return encode_ppm(_resize_nearest(decode_ppm(buf), width, height))
        if _HAS_PIL:  # pragma: no cover — PIL absent in this container
            import io

            from PIL import Image as PILImage

            img = PILImage.open(io.BytesIO(buf)).resize((width, height))
            out = io.BytesIO()
            img.save(out, format=img.format or "PNG")
            return out.getvalue()
        raise ValueError(
            "unsupported image format (only PPM/P6 resizes without Pillow)"
        )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (doc_id, mt, resize_one(bytes(buf)))
                for doc_id, mt, buf in zip(
                    pdf["doc_id"], pdf["media_type"], pdf["payload"]
                )
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    return media.filter(F.col("media_type") == "image").mapInPandas(
        resize, RESIZED_SCHEMA
    )


# ---------------------------------------------------------------------------
# Synthetic PPM corpus: deterministic image payloads derived from doc_id
# alone, so the decode/resize round-trip has an ARITHMETIC DuckDB oracle
# (expected dims and pixels are closed-form in doc_id — no codec needed on
# the oracle side).
# ---------------------------------------------------------------------------


def synth_ppm_images(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media_type='image', payload) where payload is
    a PPM image of size (4 + doc_id%13) × (3 + doc_id%7) with pixel
    (r, c, ch) = (doc_id*31 + r*7 + c*3 + ch) % 256. Only image-typed
    rows (doc_id % 3 == 0, mirroring attach_media)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 4 + d % 13, 3 + d % 7
                r = np.arange(h).reshape(h, 1, 1) * 7
                c = np.arange(w).reshape(1, w, 1) * 3
                ch = np.arange(3).reshape(1, 1, 3)
                arr = ((d * 31 + r + c + ch) % 256).astype(np.uint8)
                rows.append((d, "image", encode_ppm(arr)))
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    return (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
        .mapInPandas(build, "doc_id long, media_type string, payload binary")
    )


# ---------------------------------------------------------------------------
# Audio-shaped feature extraction: treat the payload as unsigned-8-bit PCM
# samples and compute waveform statistics per item. The container ships no
# audio codecs, but PCM interpretation IS the decoded form — so unlike the
# stubbed compressed-codec paths this executes real signal math (numpy over
# Arrow batches), deterministically. Every statistic is built from integer
# sums (|x|<=128, squares <=16384, totals < 2^40 — exactly representable in
# doubles regardless of summation order), which is what lets the DuckDB
# oracle replay it bit-exactly from the ASCII payload bytes.
# ---------------------------------------------------------------------------

WAVEFORM_SCHEMA = (
    "doc_id long, n_samples long, rms double, peak long, zero_crossings long"
)


def extract_waveform_features(media: DataFrame) -> DataFrame:
    """Per-item waveform stats over u8 PCM samples centered at 128:
    sample count, RMS, peak magnitude, and sign-change count (a
    zero-crossing rate numerator). mapInPandas: one numpy pass per Arrow
    batch, no per-row Python."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "n_samples": [],
                "rms": [],
                "peak": [],
                "zero_crossings": [],
            }
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                xs = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.int64) - 128
                n = int(xs.size)
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                if n:
                    out["rms"].append(float(np.sqrt(float((xs * xs).sum()) / n)))
                    out["peak"].append(int(np.abs(xs).max()))
                    out["zero_crossings"].append(int(((xs[:-1] * xs[1:]) < 0).sum()))
                else:
                    out["rms"].append(0.0)
                    out["peak"].append(0)
                    out["zero_crossings"].append(0)
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(compute, WAVEFORM_SCHEMA)
