"""Text-analysis operators over the ``documents`` table.

All of these are pure built-in-function pipelines (zero Python in the hot
path — whole-stage codegen end to end), and each has an exact ANSI-SQL
twin in ``__spark_entry__.oracle_sql`` so the driver can differentially
check values against DuckDB.  Design rule for parity: only deterministic
primitives that exist identically in both engines (md5 hex, regexp with
trivial patterns, lexicographic min, integer arithmetic, ROUND on
double).

At 100 TB these stay embarrassingly parallel: no shuffle at all for the
per-doc feature queries (scan → project), one partial+final aggregation
for the rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# shared stopword lists — mirrored literally in the SQL oracles; the
# canonical tuples live Spark-free in functions/stopwords.py so the DOM
# scorer can import them without dragging Spark in
from ..functions.stopwords import STOP_DE, STOP_EN, STOP_ES, STOP_FR  # noqa: E402,F401
from ..functions.textnorm import SQL_WS  # DuckDB \\s lacks \\x0b (textnorm.py)


def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _tokens_expr() -> str:
    return "split(trim(text), '\\\\s+')"


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + length features per document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.when(F.trim("text") == "", F.array()).otherwise(
        F.split(F.trim("text"), r"\s+")
    )
    avg_len = F.when(
        F.size(toks) > 0,
        F.aggregate(
            F.transform(toks, lambda w: F.length(w).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.size(toks),
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("char_count"),
        F.size(toks).cast("long").alias("token_count"),
        # basis points via floor: deterministic across engines (ROUND
        # tie-breaking differs between Spark HALF_UP and DuckDB)
        F.floor(avg_len * 10000).cast("long").alias("avg_token_len_bp"),
    )


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jusText/Boilerpipe-style quality features: punctuation density,
    alphabetic ratio, stopword ratio, and a composite score."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = F.greatest(F.length("text"), F.lit(1))
    punct = F.length("text") - F.length(F.regexp_replace("text", r"[.,;:!?]", ""))
    alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    toks = F.when(F.trim("text") == "", F.array()).otherwise(
        F.split(F.lower(F.trim("text")), r"\s+")
    )
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*STOP_EN)))
    tok_n = F.greatest(F.size(toks), F.lit(1))
    punct_ratio = punct.cast("double") / n
    alpha_ratio = alpha.cast("double") / n
    stop_ratio = stop_hits.cast("double") / tok_n
    # all ratios exported as floor basis points (see token_stats note)
    return docs.select(
        "doc_id",
        F.floor(punct_ratio * 10000).cast("long").alias("punct_bp"),
        F.floor(alpha_ratio * 10000).cast("long").alias("alpha_bp"),
        F.floor(stop_ratio * 10000).cast("long").alias("stop_bp"),
        F.floor(
            (alpha_ratio * 0.5 + stop_ratio * 0.4 - punct_ratio * 0.1) * 10000
        ).cast("long").alias("quality_bp"),
    )


def quality_scores_sql(table: str = "documents") -> str:
    punct = ("(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) "
             "* 1.0 / greatest(length(text), 1)")
    alpha = ("length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 "
             "/ greatest(length(text), 1)")
    stop = (f"len(list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+'), "
            f"w -> w IN ({_sql_list(STOP_EN)}))) * 1.0 "
            "/ greatest(CASE WHEN trim(text) = '' THEN 0 "
            "ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END, 1)")
    return f"""
    SELECT doc_id,
           CAST(floor(({punct}) * 10000) AS BIGINT) AS punct_bp,
           CAST(floor(({alpha}) * 10000) AS BIGINT) AS alpha_bp,
           CAST(floor(({stop}) * 10000) AS BIGINT) AS stop_bp,
           CAST(floor((({alpha}) * 0.5 + ({stop}) * 0.4 - ({punct}) * 0.1) * 10000)
                AS BIGINT) AS quality_bp
    FROM {table}
    """


def langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-free heuristic language ID: stopword-hit argmax over
    {en,fr,de,es} with a fixed tie-break order."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.when(F.trim("text") == "", F.array()).otherwise(
        F.split(F.lower(F.trim("text")), r"\s+")
    )
    def _hits(stops):
        # NB: the lambda must take exactly one arg — a second parameter
        # makes Spark pass the element index instead
        return F.size(F.filter(toks, lambda w: w.isin(*stops)))

    hits = {
        lang: _hits(stops)
        for lang, stops in (
            ("en", STOP_EN),
            ("fr", STOP_FR),
            ("de", STOP_DE),
            ("es", STOP_ES),
        )
    }
    best = (
        F.when(
            (hits["en"] >= hits["fr"])
            & (hits["en"] >= hits["de"])
            & (hits["en"] >= hits["es"]),
            F.lit("en"),
        )
        .when((hits["fr"] >= hits["de"]) & (hits["fr"] >= hits["es"]), F.lit("fr"))
        .when(hits["de"] >= hits["es"], F.lit("de"))
        .otherwise(F.lit("es"))
    )
    pred = F.when(
        (hits["en"] + hits["fr"] + hits["de"] + hits["es"]) == 0, F.lit("und")
    ).otherwise(best)
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        hits["en"].cast("long").alias("en_hits"),
    )


def langid_sql(table: str = "documents") -> str:
    def hits(stops):
        return (
            f"len(list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\x0b\f\r]+'), "
            f"w -> w IN ({_sql_list(stops)})))"
        )

    en, fr, de, es = hits(STOP_EN), hits(STOP_FR), hits(STOP_DE), hits(STOP_ES)
    return f"""
    SELECT doc_id, lang,
           CASE WHEN ({en} + {fr} + {de} + {es}) = 0 THEN 'und'
                WHEN {en} >= {fr} AND {en} >= {de} AND {en} >= {es} THEN 'en'
                WHEN {fr} >= {de} AND {fr} >= {es} THEN 'fr'
                WHEN {de} >= {es} THEN 'de'
                ELSE 'es' END AS pred_lang,
           {en} AS en_hits
    FROM {table}
    """


def length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length quantiles — corpus profiling (exact
    ``percentile``: single-pass sort-based; for 100 TB swap to
    ``approx_percentile`` with a documented error bound).  Spark's exact
    interpolation is bit-identical to DuckDB ``quantile_cont`` (verified
    at sf0.001 and sf0.01), so no rounding is needed."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = F.expr("percentile(n_chars, array(0.25, 0.5, 0.9, 0.99))")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            q.getItem(0).alias("p25"),
            q.getItem(1).alias("p50"),
            q.getItem(2).alias("p90"),
            q.getItem(3).alias("p99"),
        )
        .orderBy("source")
    )


def length_quantiles_sql(table: str = "documents") -> str:
    return f"""
    SELECT source, count(*) AS n_docs,
           quantile_cont(n_chars, 0.25) AS p25,
           quantile_cont(n_chars, 0.5)  AS p50,
           quantile_cont(n_chars, 0.9)  AS p90,
           quantile_cont(n_chars, 0.99) AS p99
    FROM {table} GROUP BY source ORDER BY source
    """


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source distinct-fingerprint cardinality (dedup-rate
    profiling).  Exact COUNT DISTINCT shuffles every distinct key — fine
    at CI scale and as the oracle; the 100 TB path is
    :func:`distinct_counts_approx`."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return (
        docs.select("source", F.md5(norm).alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_distinct"),
        )
        .orderBy("source")
    )


def distinct_counts_sql(table: str = "documents") -> str:
    return f"""
    SELECT source, count(*) AS n_docs,
           count(DISTINCT md5(trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g'))))
               AS n_distinct
    FROM {table} GROUP BY source ORDER BY source
    """


def length_quantiles_approx(
    spark: SparkSession, sf_dir: str, accuracy: int = 10000
) -> DataFrame:
    """Approximate quantiles — the 100 TB path (Greenwald-Khanna style
    mergeable summaries, bounded memory per group, vs the exact
    percentile's full sort).  Approximate by construction → rows-only
    driver check; pytest bounds the error vs the exact quantiles."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = F.expr(
        f"approx_percentile(n_chars, array(0.25, 0.5, 0.9, 0.99), {accuracy})"
    )
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            q.getItem(0).alias("p25"),
            q.getItem(1).alias("p50"),
            q.getItem(2).alias("p90"),
            q.getItem(3).alias("p99"),
        )
        .orderBy("source")
    )


def distinct_counts_approx(
    spark: SparkSession, sf_dir: str, rsd: float = 0.02
) -> DataFrame:
    """HyperLogLog++ cardinality sketch — the scale path: fixed-size
    sketch per group, map-side mergeable, no distinct-key shuffle.
    Approximate by construction (driver check is rows-only; pytest
    asserts ≤5% error vs the exact count)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return (
        docs.select("source", F.md5(norm).alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.approx_count_distinct("fp", rsd).alias("n_distinct_approx"),
        )
        .orderBy("source")
    )


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the whitespace-normalized lowercase
    text — the exact-dedup key, exposed as its own operator."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).cast("long").alias("norm_len"),
    )


def fingerprints_sql(table: str = "documents") -> str:
    return f"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g'))) AS fingerprint,
           length(trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g'))) AS norm_len
    FROM {table}
    """


def ngram_topk(spark: SparkSession, sf_dir: str, n_top: int = 20) -> DataFrame:
    """Corpus-wide most-frequent word 3-grams (all occurrences — unlike
    the dedup shingles, NOT per-doc-distinct), the staple corpus-statistics
    pass of a pretraining pipeline (boilerplate discovery, contamination
    spot checks).

    Plan at 100 TB: scan → explode → hash aggregate with map-side partial
    combine (one shuffle keyed on the gram) → TakeOrderedAndProject for
    the top slice.  Ties are broken by the gram itself so the result is
    deterministic across engines and partitionings."""
    from .dedup import _norm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = F.split(_norm(), " ")
    n = F.greatest(F.size(ws) - 2, F.lit(0))
    tri = F.when(F.size(ws) < 3, F.array().cast("array<string>")).otherwise(
        F.zip_with(
            F.zip_with(
                F.slice(ws, 1, n),
                F.slice(ws, 2, n),
                lambda x, y: F.concat_ws(" ", x, y),
            ),
            F.slice(ws, 3, n),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    )
    return (
        docs.select(F.explode(tri).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(n_top)
    )


def ngram_topk_sql(table: str = "documents", n_top: int = 20) -> str:
    from .dedup import NORM_SQL

    return f"""
    WITH g AS (
      SELECT unnest(
        CASE WHEN len(string_split({NORM_SQL}, ' ')) < 3
             THEN []::VARCHAR[]
             ELSE list_transform(
                    range(0, len(string_split({NORM_SQL}, ' ')) - 2),
                    i -> string_split({NORM_SQL}, ' ')[i + 1] || ' ' ||
                         string_split({NORM_SQL}, ' ')[i + 2] || ' ' ||
                         string_split({NORM_SQL}, ' ')[i + 3])
        END) AS gram
      FROM {table})
    SELECT gram, count(*) AS n_occurrences
    FROM g GROUP BY gram
    ORDER BY n_occurrences DESC, gram LIMIT {n_top}
    """
