"""The flagship operator: transcripts table → extracted main-content table.

Spark-first design (SURVEY.md §3.4): the whole job is scan → salted
repartition → sortWithinPartitions → one vectorized pandas UDF → project.
No RDDs, no custom Catalyst rules — Catalyst keeps column pruning and
predicate pushdown on the scan because the UDF consumes exactly one column
(``text``) and everything else passes through untouched.

Scale notes (10^12-turn target, BASELINE.json north_rule):

- **Turn-level parallelism is safe**: the reference tokenizer
  (mod.rs:17-37) holds no cross-turn state, so rows can be partitioned
  arbitrarily.  Conversation skew (1% of conversations have 100× turns)
  and text-length skew (64 KB P99 tail) are both *compute* skew inside the
  Python worker — invisible to AQE, which only rebalances shuffle bytes.
  The salted repartition below spreads any single conversation over
  ``salt_k`` partitions while keeping (conv_id, salt) groups intact, and
  ``sortWithinPartitions(conv_id, turn_idx)`` restores the stable turn
  ordering the north_star requires.
- **One shuffle total.**  The repartition is the only exchange in the
  plan; the UDF and the projection pipeline on top of it.
- **Arrow batches bound worker memory**: see plans/session.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.extract import extract

# NB: no per-span `kind` string — every span the current policy emits is
# 'main', and a constant Python str per span cost ~30% of the UDF stage
# in Arrow serialization (measured sf0.1: 8.0k → 11.1k turns/s dropping
# it).  The pure-Python extract() API keeps kind; a future multi-kind
# policy should add a dictionary-encoded small-int column, not strings.
SPAN = StructType(
    [
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
    ]
)

# Span TRANSPORT encoding (round-4 A/B, VERDICT r03 item 6): the UDFs
# emit each span as ONE int64 (start<<32 | end) and the projection on
# top of the UDF unpacks to the public array<struct<start,end>> with a
# codegen'd transform().  Arrow then moves a primitive list<int64>
# instead of a list<struct<int32,int32>> built from Python tuples —
# the tuple→StructArray conversion inside the Python worker was the
# measurable cost, not the bytes.  The PUBLIC schema (and the driver
# contract / goldens) is unchanged: `spans` is still
# array<struct<start,end>> on every DataFrame this module returns.
# start/end are source offsets < 2^31, so the packed value is always a
# non-negative int64.
SPAN_PACKED = ArrayType(LongType())


def _span_unpack(col):
    """packed array<long> → public array<struct<start:int,end:int>>."""
    return F.transform(
        col,
        lambda p: F.struct(
            F.shiftright(p, 32).cast("int").alias("start"),
            p.bitwiseAND(F.lit(0xFFFFFFFF)).cast("int").alias("end"),
        ),
    )


def _proj_ext(name):
    """Project ``ext.<name>`` out of the UDF struct, unpacking spans
    (any ``*spans`` column carries the packed-int64 transport)."""
    c = F.col(f"ext.{name}")
    if name.endswith("spans"):
        c = _span_unpack(c)
    return c.alias(name)


EXTRACT_SCHEMA = StructType(
    [
        StructField("main_text", StringType()),
        StructField("spans", SPAN_PACKED),
        StructField("err_count", IntegerType()),
        StructField("parse_status", StringType()),
        StructField("n_tokens", IntegerType()),
        StructField("n_blocks", IntegerType()),
        StructField("n_kept_blocks", IntegerType()),
    ]
)

_COLS = [f.name for f in EXTRACT_SCHEMA.fields]


def _extract_frame(texts: pd.Series) -> pd.DataFrame:
    rows = []
    for t in texts:
        if t is None:
            rows.append(("", [], 0, "null_input", 0, 0, 0))
            continue
        r = extract(t)
        rows.append(
            (
                r["main_text"],
                [(s[0] << 32) | s[1] for s in r["spans"]],
                r["err_count"],
                r["parse_status"],
                r["n_tokens"],
                r["n_blocks"],
                r["n_kept_blocks"],
            )
        )
    return pd.DataFrame(rows, columns=_COLS)


@pandas_udf(EXTRACT_SCHEMA)
def extract_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """SCALAR_ITER pandas UDF: one Arrow batch of turn texts in, one batch
    of extraction structs out.  Iterator form amortizes per-task setup
    (entity dict + dispatch tables are module globals, imported once per
    Python worker, ~100 KB — no broadcast needed, SURVEY.md §1.2)."""
    for texts in batches:
        yield _extract_frame(texts)


def _salted_udf_stage(
    pruned: DataFrame,
    udf_col,
    out_cols: list,
    cols: list,
    num_partitions: int | None,
    salt_k: int,
) -> DataFrame:
    """The shared physical shape of every per-turn UDF pipeline: salted
    repartition with an EXPLICIT partition count (CLAUDE.md invariant —
    column-only repartition is AQE-coalescible and compressed-text
    shuffles get merged under the Python compute), sortWithinPartitions
    for stable (conv_id, turn_idx) order, one Arrow UDF, project."""
    if num_partitions is None:
        # 2× cores.  4× was the r1 sweet spot (64→13.3k, 128→16.1k,
        # 256→10.8k turns/s) when per-task Python time dominated; the
        # round-4 fast paths (tag/entity memos, fused scan) shrank
        # per-task compute enough that task overhead flipped the curve —
        # re-measured clean-window sweep at local[32]/sf0.1: 32p→23.6k,
        # 48p→26.1k, 64p→26.0k, 128p→22.9k turns/s.  2× keeps one wave
        # of slack for text-length skew (the salt spreads hot
        # conversations; a single straggler can't serialize the stage).
        sc = pruned.sparkSession.sparkContext
        num_partitions = max(
            sc.defaultParallelism * 2,
            int(pruned.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        )
    salt = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt_k))
    parted = pruned.repartition(num_partitions, F.col("conv_id"), salt)
    ordered = parted.sortWithinPartitions("conv_id", "turn_idx")
    ext = ordered.withColumn("ext", udf_col)
    return ext.select(
        *[c for c in cols if c != "text"],
        *[_proj_ext(name) for name in out_cols],
    )


def run_extraction(
    df: DataFrame,
    *,
    num_partitions: int | None = None,
    salt_k: int = 8,
    passthrough: tuple = ("conv_id", "turn_idx"),
    long_text_threshold: int | None = None,
    source_partitioned: bool = False,
) -> DataFrame:
    """transcripts DataFrame → extracted DataFrame.

    Output columns: ``passthrough + (main_text, spans, err_count,
    parse_status, n_tokens, n_blocks, n_kept_blocks)``.

    ``salt_k`` splits each conversation across up to ``salt_k`` shuffle
    partitions (long-conversation skew); within a partition rows are
    sorted by (conv_id, turn_idx) — the north_star's stable turn ordering.

    ``long_text_threshold``: per-row COMPUTE skew (the 64 KB-P99 text
    tail) is invisible to AQE, which only rebalances shuffle bytes.
    When set, rows with ``length(text) > threshold`` are routed to a
    dedicated round-robin-balanced pass (few rows per partition, so no
    single task drags the stage tail) and unioned back.  At the 10^12
    target set it near the corpus P99.

    ``source_partitioned=True`` drops the salted repartition entirely —
    ZERO exchanges in the plan.  Use when the source layout already
    spreads conversations (the Iceberg DDL's ``bucket(512, conv_id)``
    transform, or any layout where no single input split is hot): at
    100 TB this saves shuffling the whole corpus once (~25 TB of lz4'd
    shuffle I/O).  Rows are still sorted by (conv_id, turn_idx) within
    each split.
    """
    cols = list(dict.fromkeys([*passthrough, "text"]))
    pruned = df.select(*cols)
    if source_partitioned:
        ordered = pruned.sortWithinPartitions("conv_id", "turn_idx")
        ext = ordered.withColumn("ext", extract_udf(F.col("text")))
        return ext.select(
            *[c for c in cols if c != "text"],
            *[_proj_ext(name) for name in _COLS],
        )
    if long_text_threshold is not None:
        is_long = F.length("text") > long_text_threshold
        short = run_extraction(
            pruned.filter(~is_long),
            num_partitions=num_partitions,
            salt_k=salt_k,
            passthrough=passthrough,
        )
        sc = pruned.sparkSession.sparkContext
        long_rows = (
            pruned.filter(is_long)
            .repartition(sc.defaultParallelism)  # round-robin: balanced by count
            .sortWithinPartitions("conv_id", "turn_idx")
            .withColumn("ext", extract_udf(F.col("text")))
        )
        long_out = long_rows.select(
            *[c for c in cols if c != "text"],
            *[_proj_ext(name) for name in _COLS],
        )
        return short.unionByName(long_out)
    return _salted_udf_stage(
        pruned, extract_udf(F.col("text")), _COLS, cols, num_partitions, salt_k
    )


DOM_EXTRACT_SCHEMA = StructType(
    [
        StructField("main_text", StringType()),
        StructField("spans", SPAN_PACKED),
        StructField("err_count", IntegerType()),
        StructField("parse_status", StringType()),
        StructField("n_blocks", IntegerType()),
        StructField("n_kept_blocks", IntegerType()),
    ]
)

_DOM_COLS = [f.name for f in DOM_EXTRACT_SCHEMA.fields]


@pandas_udf(DOM_EXTRACT_SCHEMA)
def dom_extract_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """SCALAR_ITER pandas UDF over the DOM-heuristic extraction
    (functions/domextract.py: tree builder + text-density scoring).
    ``spans`` carries the same provenance contract as the flagship
    (source ranges of the text runs in kept blocks)."""
    from ..functions.domextract import dom_extract

    for texts in batches:
        rows = []
        for t in texts:
            if t is None:
                rows.append(("", [], 0, "null_input", 0, 0))
                continue
            r = dom_extract(t)
            rows.append(
                (
                    r["main_text"],
                    [(s[0] << 32) | s[1] for s in r["spans"]],
                    r["err_count"],
                    r["parse_status"],
                    r["n_blocks"],
                    r["n_kept_blocks"],
                )
            )
        yield pd.DataFrame(rows, columns=_DOM_COLS)


def run_dom_extraction(
    df: DataFrame,
    *,
    num_partitions: int | None = None,
    salt_k: int = 8,
    passthrough: tuple = ("conv_id", "turn_idx"),
) -> DataFrame:
    """transcripts DataFrame → DOM-extracted DataFrame.

    Same partitioning discipline as :func:`run_extraction` (salted
    repartition with an EXPLICIT partition count, sortWithinPartitions
    for stable turn order, one Arrow UDF stage); the per-turn compute is
    the tree-building scorer instead of the token-stream policy."""
    cols = list(dict.fromkeys([*passthrough, "text"]))
    pruned = df.select(*cols)
    return _salted_udf_stage(
        pruned,
        dom_extract_udf(F.col("text")),
        _DOM_COLS,
        cols,
        num_partitions,
        salt_k,
    )


def extraction_metrics(extracted: DataFrame) -> DataFrame:
    """Per-status metrics rollup (north_star: turns processed, parse
    errors, bytes of main text) — pure built-in aggregates, map-side
    partial agg + final, one small shuffle."""
    return extracted.groupBy("parse_status").agg(
        F.count(F.lit(1)).alias("turns"),
        F.sum("err_count").alias("dropped_end_tags"),
        F.sum(F.length("main_text")).alias("main_text_chars"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_kept_blocks").alias("kept_blocks"),
        F.sum("n_blocks").alias("blocks"),
    )


def assemble_conversations(df: DataFrame, max_turns: int = 4096) -> DataFrame:
    """Conversation-level corpus assembly: one row per conversation with
    its turns joined in (conv_id, turn_idx) order — the unit a
    conversation-tuned training run actually consumes.

    ``text_md5`` fingerprints the assembled text so the driver gate
    hashes 32 bytes per conversation instead of megabytes; real
    consumers drop the md5 and keep ``full_text``.

    Scale shape: ONE shuffle on conv_id (map-side partial collect_list),
    ordering restored inside each group by array_sort on the
    (turn_idx, text) struct — no global sort, no window.  Long-
    conversation skew is bounded by the corpus's max conversation size
    (the same P99 the salted extraction handles); a conversation is the
    atomic output unit here, so it must land on one reducer by
    definition.

    ``max_turns`` caps the assembled output (VERDICT r03: one
    pathological conversation must not widen downstream rows without
    bound): only the first ``max_turns`` turns are concatenated and
    ``overflow=1`` flags the truncation — the parse_status-style signal
    a pipeline uses to route monsters to a dedicated pass.  The cap
    bounds the OUTPUT row, not the collect_list buffer itself; if an
    adversarial corpus could hold single conversations past executor
    memory, pre-aggregate per-conv turn counts (ids-only) and anti-join
    the monsters out before assembly — same two-shuffle shape, documented
    here rather than paid by default."""
    collected = (
        df.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .agg(F.collect_list(F.struct("turn_idx", "text")).alias("turns"))
    )
    kept = F.slice(F.array_sort("turns"), 1, max_turns)
    full_text = F.concat_ws("\n", F.transform(kept, lambda s: s["text"]))
    return collected.select(
        "conv_id",
        F.size("turns").cast("long").alias("n_turns"),
        F.md5(full_text).alias("text_md5"),
        F.length(full_text).cast("long").alias("n_chars"),
        (F.size("turns") > max_turns).cast("long").alias("overflow"),
    ).orderBy("conv_id")


def run_extraction_with_links(
    df: DataFrame,
    *,
    num_partitions: int | None = None,
    salt_k: int = 8,
) -> DataFrame:
    """Single-pass extraction + link harvest: one tokenize per turn feeds
    BOTH the main-content policy and the link policy, so a pipeline that
    wants text and the link graph pays one UDF stage instead of two —
    tokenization dominates both operators (bench: extract 6.7 s +
    links 12.9 s separately at sf0.1; this fuses the common pass).

    Output = ``run_extraction`` columns + a ``links`` array column with
    the ``run_link_extraction`` struct contract (explode it for the
    per-link table).  Same salted one-shuffle physical shape."""
    from ..functions.extract import extract_from_tokens
    from ..functions.links import links_from_tokens
    from ..functions.tokenizer import tokenize
    from .linkops import LINK

    schema = StructType(
        EXTRACT_SCHEMA.fields + [StructField("links", ArrayType(LINK))]
    )
    cols = [f.name for f in schema.fields]

    def _frame(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            if t is None:
                rows.append(("", [], 0, "null_input", 0, 0, 0, []))
                continue
            tokens, status, err = tokenize(t)
            r = extract_from_tokens(tokens, status, err)
            links = [
                (
                    lk["link_idx"],
                    lk["href"],
                    lk["anchor_text"],
                    lk["src_start"],
                    lk["src_end"],
                )
                for lk in links_from_tokens(tokens)
            ]
            rows.append(
                (
                    r["main_text"],
                    [(s[0] << 32) | s[1] for s in r["spans"]],
                    r["err_count"],
                    r["parse_status"],
                    r["n_tokens"],
                    r["n_blocks"],
                    r["n_kept_blocks"],
                    links,
                )
            )
        return pd.DataFrame(rows, columns=cols)

    @pandas_udf(schema)
    def fused_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for texts in batches:
            yield _frame(texts)

    in_cols = ["conv_id", "turn_idx", "text"]
    return _salted_udf_stage(
        df.select(*in_cols),
        fused_udf(F.col("text")),
        cols,
        in_cols,
        num_partitions,
        salt_k,
    )


def run_extraction_full(
    df: DataFrame,
    *,
    num_partitions: int | None = None,
    salt_k: int = 8,
) -> DataFrame:
    """Everything from one tokenize: the flagship token-stream policy,
    the DOM-heuristic policy, and the link harvest share a SINGLE
    tokenize pass per turn — tokenization dominates all three, so a
    pipeline wanting text + DOM-quality signals + the link graph pays
    roughly the DOM pass alone instead of three UDF stages (bench:
    4.1 + 7.6 + 3.5 s separately at sf0.1).

    Output = ``run_extraction`` columns + ``dom_main_text``/``dom_spans``
    /``dom_n_blocks``/``dom_n_kept_blocks`` (the ``run_dom_extraction``
    contract; err/status are shared — same tokenize, same stream) + the
    ``links`` array column.  Same salted one-shuffle physical shape."""
    from ..functions.domextract import dom_extract_from_tokens
    from ..functions.extract import extract_from_tokens
    from ..functions.links import links_from_tokens
    from ..functions.tokenizer import tokenize
    from .linkops import LINK

    schema = StructType(
        EXTRACT_SCHEMA.fields
        + [
            StructField("dom_main_text", StringType()),
            StructField("dom_spans", SPAN_PACKED),
            StructField("dom_n_blocks", IntegerType()),
            StructField("dom_n_kept_blocks", IntegerType()),
            StructField("links", ArrayType(LINK)),
        ]
    )
    cols = [f.name for f in schema.fields]

    def _frame(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            if t is None:
                rows.append(
                    ("", [], 0, "null_input", 0, 0, 0, "", [], 0, 0, [])
                )
                continue
            tokens, status, err = tokenize(t)
            r = extract_from_tokens(tokens, status, err)
            d = dom_extract_from_tokens(tokens, status, err)
            links = [
                (
                    lk["link_idx"],
                    lk["href"],
                    lk["anchor_text"],
                    lk["src_start"],
                    lk["src_end"],
                )
                for lk in links_from_tokens(tokens)
            ]
            rows.append(
                (
                    r["main_text"],
                    [(s[0] << 32) | s[1] for s in r["spans"]],
                    r["err_count"],
                    r["parse_status"],
                    r["n_tokens"],
                    r["n_blocks"],
                    r["n_kept_blocks"],
                    d["main_text"],
                    [(s[0] << 32) | s[1] for s in d["spans"]],
                    d["n_blocks"],
                    d["n_kept_blocks"],
                    links,
                )
            )
        return pd.DataFrame(rows, columns=cols)

    @pandas_udf(schema)
    def full_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for texts in batches:
            yield _frame(texts)

    in_cols = ["conv_id", "turn_idx", "text"]
    return _salted_udf_stage(
        df.select(*in_cols),
        full_udf(F.col("text")),
        cols,
        in_cols,
        num_partitions,
        salt_k,
    )
