"""Multimodal column plumbing (SURVEY.md north-star: image/audio/video
as opaque binary columns + typed metadata).

The container has no image/audio libraries, so the *decode kernels*
are stubbed: `decode_image` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder derives
metadata from the bytes themselves. Everything Spark-side — the
schema, the mapInPandas batch shape, the partitioning behavior, the
binary handling through Arrow — is real and tested
(tests/test_multimodal.py), so dropping in PIL/libav later changes
one function body, not the pipeline.

Data model: media lives in a struct column
    media: struct<content: binary, meta: struct<kind string,
                  n_bytes long, sha string>>
— binary payloads stay opaque to the optimizer (no codegen over
them), metadata is columnar and prunable: a query touching only
`meta.*` never deserializes `content` (parquet column pruning works
per struct field).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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

MEDIA_META = StructType(
    [
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def with_media_column(docs: DataFrame) -> DataFrame:
    """Attach a media struct built from the document text bytes (the
    testdata has no real media; payload = utf-8 bytes keeps the binary
    path end-to-end real). All JVM-side expressions."""
    content = F.encode("text", "utf-8").cast(BinaryType())
    return docs.withColumn(
        "media",
        F.struct(
            content.alias("content"),
            F.struct(
                F.lit("image").alias("kind"),
                F.length(content).cast("long").alias("n_bytes"),
                F.sha2(content, 256).alias("sha"),
            ).alias("meta"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: metadata derived from a digest of the
    payload. Stands in for PIL.Image.open until the lib is present."""
    d = hashlib.sha256(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    n_frames = 1 + d[2] % 8
    return width, height, n_frames


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, int]:
    """Decode kernel boundary. Real implementation requires an image
    library that is not in this container — STUB (clearly marked); the
    deterministic fake exists so the distributed plumbing is testable."""
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "image decode requires PIL/opencv (not installed); "
        "pass fake=True for the deterministic test decoder"
    )


def decode_media(media_df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas over (doc_id, media): batch-streaming decode.

    Batch shape: each Arrow batch arrives as a pandas DataFrame whose
    `media` column is a dict of {content: bytes, meta: {...}} — the
    kernel touches bytes only inside the Python worker; no
    driver-side collect, no shuffle (map-only, preserves input
    partitioning). At 100 TB: size partitions so payload batches fit
    worker memory (spark.sql.execution.arrow.maxRecordsPerBatch)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                w, h, n = decode_image(bytes(media["content"]), fake=fake)
                rows.append((doc_id, media["meta"]["kind"], w, h, n))
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "width", "height", "n_frames"]
            )

    return media_df.select("doc_id", "media").mapInPandas(
        run, schema=DECODED_SCHEMA
    )
