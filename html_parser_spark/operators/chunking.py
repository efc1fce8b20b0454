"""Passage chunking: sliding token windows over documents.

The staple between a cleaned corpus and a training/RAG pipeline:
fixed-size whitespace-token windows with overlap, stable
``(doc_id, chunk_idx)`` identity, one output row per chunk.

Scale shape: the window arithmetic is a LOCAL higher-order expression
(sequence → transform → explode) — no shuffle; output rows inherit the
scan's partitioning, so a downstream repartition is the consumer's
choice, not this operator's.  The explode multiplies rows, not bytes:
each chunk materializes only its own slice (plus the overlap), so the
output is ≈ input × (1 + overlap/stride) bytes no matter how long the
documents are — long-doc skew splits itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DEFAULT_CHUNK = 128
DEFAULT_OVERLAP = 32


def chunk_documents(
    spark: SparkSession,
    sf_dir: str,
    chunk_tokens: int = DEFAULT_CHUNK,
    overlap: int = DEFAULT_OVERLAP,
) -> DataFrame:
    """One row per ``chunk_tokens``-token window at stride
    ``chunk_tokens - overlap`` over the whitespace/case-normalized text
    (the dedup normalizer, so chunk identity is stable across the
    family).  The final window clamps; every document yields ≥ 1 chunk
    (an empty doc yields one empty chunk — keeps the chunk table
    left-total over documents)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    from .dedup import _norm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(_norm(), " ")
    n = F.size(toks)
    n_starts = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor(
            (n - F.lit(chunk_tokens) + F.lit(stride - 1)).cast("double")
            / F.lit(float(stride))
        ).cast("int")
        + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_starts - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(toks, i * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n - i * stride)
            .cast("long")
            .alias("chunk_tokens"),
        ),
    )
    return docs.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.chunk_tokens").alias("chunk_tokens"),
    )


def chunk_documents_sql(
    table: str = "documents",
    chunk_tokens: int = DEFAULT_CHUNK,
    overlap: int = DEFAULT_OVERLAP,
) -> str:
    from .dedup import NORM_SQL

    stride = chunk_tokens - overlap
    return f"""
    WITH t AS (
      SELECT doc_id, string_split({NORM_SQL}, ' ') AS toks FROM {table}),
    s AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= {chunk_tokens} THEN 1
                  ELSE ((len(toks) - {chunk_tokens} + {stride - 1}) // {stride}) + 1
             END AS n_starts
      FROM t),
    c AS (
      SELECT doc_id, unnest(list_transform(range(0, n_starts),
               i -> struct_pack(
                 chunk_idx := i,
                 chunk_text := array_to_string(
                   list_slice(toks, i*{stride} + 1, i*{stride} + {chunk_tokens}), ' '),
                 chunk_tokens := least({chunk_tokens}, n - i*{stride})))) AS u
      FROM s)
    SELECT doc_id,
           CAST(u.chunk_idx AS BIGINT) AS chunk_idx,
           u.chunk_text AS chunk_text,
           CAST(u.chunk_tokens AS BIGINT) AS chunk_tokens
    FROM c
    """
