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


def decode_real(payload: bytes, media_type: str):  # pragma: no cover
    """Where a real decoder would go (PIL.Image.open / torchaudio /
    pyav frame sampling). Deliberately unimplemented in this
    container."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present here; "
        "decode_fake provides the deterministic test double"
    )


def decode_fake(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image decode: derive (width, height)
    from the payload digest so tests are stable and schema-real."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    return width, height


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


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams record batches through Python once —
    payload bytes never round-trip row-at-a-time. At scale this is the
    pattern for any CPU-bound media op: batch in, batch out, stateless,
    so Spark can fuse it after the scan with no extra shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(decode_fake)
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
