"""Similarity search over the ``embeddings`` table (array<float> column).

Two paths:

- **brute-force cosine top-k** — the correctness baseline.  All math in
  double precision via built-in higher-order functions (``zip_with`` +
  ``aggregate``) so the plan stays JVM-side; the DuckDB oracle mirrors
  the exact double-math fold so values are bit-comparable after ROUND.
  The query side is tiny (n_queries rows) and is broadcast, so the scan
  side never shuffles — at 100 TB this is one pass over the vectors.
- **LSH-bucketed (random hyperplane)** — the scale path: sign-bit
  signature over ``n_planes`` fixed hyperplanes (seeded, deterministic),
  candidates = same-bucket vectors, exact re-score within bucket.
  Recall vs brute force is asserted in pytest; driver check is
  rows-only (the plane constants are not practical to inline in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

N_QUERIES = 5
TOP_K = 10


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Broadcast the query side; rank with a window over (query_id), ordered
    by unrounded similarity with vec_id tie-break for determinism.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = emb.alias("e").join(
        F.broadcast(q), F.col("e.vec_id") != F.col("query_id")
    )
    sim = _dot(F.col("q_emb"), F.col("e.embedding")) / (
        _norm(F.col("q_emb")) * _norm(F.col("e.embedding"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim_exact"), F.asc("neighbor_id")
    )
    return (
        pairs.select(
            "query_id",
            F.col("e.vec_id").alias("neighbor_id"),
            sim.alias("sim_exact"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.floor(F.col("sim_exact") * 10000).cast("long").alias("cosine_bp"),
        )
    )


def cosine_topk_sql(
    table: str = "embeddings", n_queries: int = N_QUERIES, k: int = TOP_K
) -> str:
    """DuckDB twin with the same left-to-right double fold (list_sum over
    a double list matches Spark's aggregate fold on doubles)."""
    dot = (
        "list_sum(list_transform(list_zip(q.embedding, e.embedding), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )

    def norm(side: str) -> str:
        return (
            f"sqrt(list_sum(list_transform({side}.embedding, "
            f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        )

    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding FROM {table}
               WHERE vec_id < {n_queries}),
    pairs AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {dot} / ({norm('q')} * {norm('e')}) AS sim_exact
      FROM {table} e JOIN q ON e.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, sim_exact,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim_exact DESC, neighbor_id ASC) AS rank
      FROM pairs
    )
    SELECT query_id, rank, neighbor_id,
           CAST(floor(sim_exact * 10000) AS BIGINT) AS cosine_bp
    FROM ranked WHERE rank <= {k}
    """


# ------------------------------------------------- LSH (random hyperplane)


def _planes(dim: int, n_planes: int, seed: int = 1234):
    """Deterministic pseudo-random hyperplanes (numpy PCG64 with fixed
    seed — identical on every executor and in tests)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signatures(
    spark: SparkSession, sf_dir: str, n_planes: int = 8, seed: int = 1234
) -> DataFrame:
    """vec_id → LSH bucket (sign pattern over the hyperplanes).

    Planes are inlined as literal arrays: the sign-dot per plane is a
    built-in fold, no Python.  Bucket cardinality 2^n_planes; at 100 TB
    tune n_planes so buckets fit an executor (~log2(n_vectors/10^5))."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    planes = _planes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        bit = (_dot(plane, F.col("embedding")) > 0).cast("int")
        bucket = bucket + bit * (1 << i)
    return emb.select("vec_id", "embedding", bucket.alias("bucket"))


def lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    n_planes: int = 4,
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's LSH
    bucket.  Same output schema as :func:`cosine_topk`."""
    sig = lsh_signatures(spark, sf_dir, n_planes=n_planes)
    q = sig.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    pairs = sig.alias("e").join(
        F.broadcast(q),
        (F.col("e.bucket") == F.col("q_bucket"))
        & (F.col("e.vec_id") != F.col("query_id")),
    )
    sim = _dot(F.col("q_emb"), F.col("e.embedding")) / (
        _norm(F.col("q_emb")) * _norm(F.col("e.embedding"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim_exact"), F.asc("neighbor_id")
    )
    return (
        pairs.select(
            "query_id",
            F.col("e.vec_id").alias("neighbor_id"),
            sim.alias("sim_exact"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.floor(F.col("sim_exact") * 10000).cast("long").alias("cosine_bp"),
        )
    )


def embedding_near_dups(
    spark: SparkSession, sf_dir: str, threshold: float = 0.9
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above ``threshold``.

    Sandbox-scale uses the exact all-pairs product; the scale path is the
    same re-score over :func:`lsh_signatures` buckets (swap the join)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    sim = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim_exact"))
        .filter(F.col("sim_exact") >= threshold)
        .select(
            "vec_a",
            "vec_b",
            F.floor(F.col("sim_exact") * 10000).cast("long").alias("cosine_bp"),
        )
    )


def embedding_near_dups_sql(table: str = "embeddings", threshold: float = 0.9) -> str:
    dot = (
        "list_sum(list_transform(list_zip(a.embedding, b.embedding), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )

    def norm(side: str) -> str:
        return (
            f"sqrt(list_sum(list_transform({side}.embedding, "
            f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        )

    return f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           CAST(floor({dot} / ({norm('a')} * {norm('b')}) * 10000) AS BIGINT)
               AS cosine_bp
    FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
    WHERE {dot} / ({norm('a')} * {norm('b')}) >= {threshold}
    """
