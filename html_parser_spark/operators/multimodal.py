"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The sandbox has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake, or ``NotImplementedError`` for real codec paths) —
but the Spark-side plumbing is real and tested: binary column schema,
Arrow batch shape through ``mapInPandas``, partition-preserving metadata
extraction, and an exactly-SQL-checkable metadata projection.

At 100 TB, the pattern is: binary blobs stay columnar in parquet, the
``mapInPandas`` stage streams Arrow batches (bounded by
``maxRecordsPerBatch`` — large blobs never amplify into Python lists of
rows), and metadata-only queries prune the binary column entirely.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

META_SCHEMA = (
    "doc_id bigint, byte_len int, sha256 string, fake_width int, fake_height int"
)


def with_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload: binary).  Stand-in for an image/audio
    blob column: the UTF-8 bytes of the text (deterministic)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": [len(b) for b in payloads],
                "sha256": [hashlib.sha256(bytes(b)).hexdigest() for b in payloads],
                # fake decode: dimensions derived from byte length (a real
                # deployment swaps this block for PIL/ffmpeg decode)
                "fake_width": [len(b) % 1920 for b in payloads],
                "fake_height": [len(b) % 1080 for b in payloads],
            }
        )


def payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas over the binary column → typed metadata rows."""
    return with_binary_payload(spark, sf_dir).mapInPandas(
        _meta_batches, schema=META_SCHEMA
    )


def payload_metadata_sql(table: str = "documents") -> str:
    """DuckDB twin — sha256/octet_length over the same UTF-8 bytes."""
    return f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS byte_len,
           sha256(text) AS sha256,
           CAST(octet_length(encode(text)) % 1920 AS INT) AS fake_width,
           CAST(octet_length(encode(text)) % 1080 AS INT) AS fake_height
    FROM {table}
    """


def decode_image(payload: bytes):  # pragma: no cover - codec-less sandbox
    """Real codec path — requires PIL/libjpeg, absent in this container."""
    raise NotImplementedError(
        "image decode needs PIL/libjpeg; wire into _meta_batches when available"
    )


def sample_frames(payload: bytes, every_n: int = 30):  # pragma: no cover
    """Real video path — requires ffmpeg, absent in this container."""
    raise NotImplementedError(
        "frame sampling needs ffmpeg; wire into _meta_batches when available"
    )
