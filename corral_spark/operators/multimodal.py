"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

North-star extension (SURVEY §2.4). The engine treats image/audio/
video as ``binary`` columns with a metadata struct, processed by
Arrow-batched pandas functions via ``mapInPandas`` — the decode step
itself is STUBBED (no image/audio libraries in this container): decode
is a deterministic fake keyed on the payload bytes, and
``decode_real`` raises NotImplementedError where PIL/ffmpeg would be
called. The Spark-side contract — schema, batch iteration, partition
behavior, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical asset schema: payload + typed metadata, parquet-friendly.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sha256", StringType(), False),
    ]
)


def decode_real(payload: bytes, media_type: str = "image") -> tuple[int, int]:
    """The real-decoder SEAM: decode image dimensions via PIL when an
    image library is importable, raise NotImplementedError otherwise
    (this container ships no media libs — charter limit).

    The import happens HERE, lazily, per process: on a cluster with
    Pillow installed the same pickled function resolves the real
    library inside each executor worker, with zero engine changes.
    The seam's contract (payload-in, (width, height)-out, usable as
    ``extract_features``'s decoder) is pinned by a pytest that ships a
    fake PIL module through ``addPyFile`` — proving the batch/schema
    plumbing end-to-end without media libs."""
    try:
        from PIL import Image  # noqa: PLC0415 — the seam IS the lazy import
    except ImportError as exc:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present "
            "here; decode_fake provides the deterministic test double"
        ) from exc
    import io

    with Image.open(io.BytesIO(payload)) as im:
        width, height = im.size
        return int(width), int(height)


def decode_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image decode: derive (width, height)
    from the payload digest so tests are stable and schema-real."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    return width, height


def resize_fake(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic stand-in for image resize: where PIL's
    ``Image.resize`` would run, produce a digest-derived byte string
    of length proportional to the target area, so downstream size
    accounting and schema plumbing behave like the real op."""
    digest = hashlib.sha256(payload + f"{target_w}x{target_h}".encode()).digest()
    n = max(1, (target_w * target_h) // 64)
    return (digest * (n // len(digest) + 1))[:n]


def frame_sample_fake(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in for video frame sampling (pyav/ffmpeg
    territory): n digest-derived 'frames' per payload. Real plumbing
    shape: one binary in, array<binary> out."""
    return [
        hashlib.sha256(payload + bytes([i])).digest() for i in range(n_frames)
    ]


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Manufacture a binary asset table from the documents corpus
    (text bytes as payload) — the container has no real media files;
    the column types and row shapes match what real ingestion would
    produce."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "UTF-8").cast("binary").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


def extract_features(assets: DataFrame, decoder=None) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams record batches through Python once —
    payload bytes never round-trip row-at-a-time. At scale this is the
    pattern for any CPU-bound media op: batch in, batch out, stateless,
    so Spark can fuse it after the scan with no extra shuffle.

    ``decoder``: ``bytes -> (width, height)``; defaults to
    ``decode_fake``. Pass ``decode_real`` on a cluster with image
    libraries installed — the decoder reference is pickled into the
    UDF and resolved per worker process.
    """
    decode = decoder if decoder is not None else decode_fake

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(lambda b: decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_assets(assets: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize pipeline stage: binary in, binary out, Arrow-batched.
    Output keeps asset identity plus the resized payload and its size.
    """
    from pyspark.sql.types import StructType, StructField

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("payload", BinaryType(), False),
            StructField("n_bytes", LongType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(
                lambda b: resize_fake(bytes(b), target_w, target_h)
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": resized,
                    "n_bytes": resized.map(len).astype("int64"),
                }
            )

    return assets.mapInPandas(batches, schema=schema)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage: one binary 'video' in, one row per
    sampled frame out (asset_id, frame_idx, frame) — the explode-
    after-Python shape a real pyav sampler would use."""
    from pyspark.sql.types import IntegerType, StructType, StructField

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": [], "frame_idx": [], "frame": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                for i, fr in enumerate(frame_sample_fake(bytes(payload), n_frames)):
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["frame"].append(fr)
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=schema)
