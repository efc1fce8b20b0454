"""Link-graph analytics over the harvested corpus link graph.

Web-scale corpus curation uses link-graph signals two ways: exact
per-target aggregates (inlink counts, anchor-text consensus — the
signals C4/CC-style quality filters and search indexing consume) and
iterative centrality (PageRank) for host/page-level quality priors.
Both operate on `linkops.run_link_extraction`'s output — the link rows
the reference-verified tokenizer harvested (functions/links.py), so the
graph itself is oracle-pinned upstream.

Scale shape:

- ``link_target_stats``: two href-keyed hash aggregations (the second
  over pre-shrunk (href, anchor) counts) + one href equi-join +
  TakeOrderedAndProject.  Everything that shuffles is ids/counts; text
  crosses the wire only as the anchor strings being aggregated.
- ``pagerank``: the classic ids-only iteration — edges join ranks on
  the source key, contributions aggregate on the destination key,
  ``localCheckpoint`` per round truncates lineage (the
  connected-components lesson, BENCH.md r3).  The only driver-side
  values per round are two scalars (total/dangling mass), the same
  class of post-agg metric scalar as resume.py's.

PageRank is deliberately NOT a driver-gate row: it is float-valued and
cross-engine float summation order differs, so a bit-exact md5 hash
would be flaky by construction (CLAUDE.md: never ROUND on doubles).
Its correctness is pytest-pinned instead against an independent dense
NumPy power iteration on the same edge list (test_linkrank.py), plus
invariants (mass conservation, teleport floor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.session import free_local_checkpoint
from .linkops import run_link_extraction


def _links(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..fixtures import ensure_transcripts, sf_of

    return run_link_extraction(
        spark.read.parquet(ensure_transcripts(sf_of(sf_dir)))
    )


def link_target_stats(
    spark: SparkSession, sf_dir: str, top_k: int = 100
) -> DataFrame:
    """Per-target link signals: inlink count, distinct source
    conversations, distinct anchor texts, and the consensus anchor
    (most frequent; ties broken to the lexicographically LARGEST anchor
    so both engines agree deterministically).  Top ``top_k`` targets by
    (n_inlinks DESC, href ASC) — TakeOrderedAndProject, never a global
    sort."""
    return target_stats_from_links(_links(spark, sf_dir), top_k=top_k)


def target_stats_from_links(links: DataFrame, top_k: int = 100) -> DataFrame:
    """Same stats over an already-materialized link table (the corpus
    job aggregates the links parquet it just wrote instead of paying a
    second harvest pass).

    Both downstream aggregates route through ONE shared
    ``(href, anchor_text, conv_id)`` pre-aggregation: the two branches'
    subplans are identical up to that exchange, so Spark executes the
    upstream (including the harvest UDF when ``links`` is the live
    harvest) once and reuses the exchange output (``ReusedExchange`` in
    the physical plan, plan-asserted in test_linkrank.py) — without
    this, each grouping keyed its own exchange and the UDF ran twice."""
    t = links.groupBy("href", "anchor_text", "conv_id").agg(
        F.count(F.lit(1)).alias("n3")
    )
    base = t.groupBy("href").agg(
        F.sum("n3").alias("n_inlinks"),
        F.count_distinct("conv_id").alias("n_source_convs"),
        F.count_distinct("anchor_text").alias("n_distinct_anchors"),
    )
    pair = t.groupBy("href", "anchor_text").agg(F.sum("n3").alias("n"))
    top = pair.groupBy("href").agg(
        F.expr("max_by(anchor_text, struct(n, anchor_text))").alias(
            "top_anchor"
        ),
        F.max("n").alias("top_anchor_n"),
    )
    return (
        base.join(top, "href")
        .orderBy(F.desc("n_inlinks"), "href")
        .limit(top_k)
    )


def link_target_stats_sql(golden_path: str, top_k: int = 100) -> str:
    """DuckDB twin over the committed engine-golden link rows — the
    stats are re-derived entirely inside DuckDB, so a Spark-side agg or
    tie-break bug breaks the hash."""
    return f"""
    WITH links AS (SELECT * FROM read_parquet('{golden_path}')),
    base AS (
      SELECT href,
             CAST(count(*) AS BIGINT) AS n_inlinks,
             CAST(count(DISTINCT conv_id) AS BIGINT) AS n_source_convs,
             CAST(count(DISTINCT anchor_text) AS BIGINT) AS n_distinct_anchors
      FROM links GROUP BY href
    ),
    pair AS (
      SELECT href, anchor_text, CAST(count(*) AS BIGINT) AS n
      FROM links GROUP BY href, anchor_text
    ),
    ranked AS (
      SELECT href, anchor_text, n,
             row_number() OVER (
               PARTITION BY href ORDER BY n DESC, anchor_text DESC
             ) AS rn
      FROM pair
    )
    SELECT b.href, b.n_inlinks, b.n_source_convs, b.n_distinct_anchors,
           r.anchor_text AS top_anchor, r.n AS top_anchor_n
    FROM base b JOIN ranked r ON b.href = r.href AND r.rn = 1
    ORDER BY b.n_inlinks DESC, b.href
    LIMIT {top_k}
    """


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over an edge list ``(src, dst)`` (any node id type).

    Standard power iteration with uniform teleport and dangling-mass
    redistribution:

        r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/deg(u) + dangling/N)

    Physical shape per round: edges ⋈ ranks on src (both sides keyed by
    node id), groupBy dst partial+final agg, one scalar agg for the
    dangling mass.  ``localCheckpoint`` every ``checkpoint_every``
    rounds — without it Catalyst re-analyzes a k-deep join tree every
    round (measured on connected components: per-round wall GREW 18→104 s
    under bare persist, BENCH.md r3).

    Returns (node, rank) for every node that appears in the graph.
    """
    spark = edges.sparkSession
    edges = edges.select(
        F.col(edges.columns[0]).cast("string").alias("src"),
        F.col(edges.columns[1]).cast("string").alias("dst"),
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return spark.createDataFrame([], "node string, rank double")
    out_deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    teleport = (1.0 - damping) / n_nodes
    prev_ckpt = None
    for i in range(iterations):
        # ONE ranks⋈out_deg join per round feeds both the dangling mass
        # and the per-edge shares (the old code planned it twice)
        with_deg = ranks.join(out_deg, ranks["node"] == out_deg["src"], "left")
        # dangling mass: rank held by nodes with no out-edges — a lazy
        # 1-row aggregate broadcast into the update instead of a per-round
        # .collect(): each round adds plan depth but NO action, so the
        # uncheckpointed lineage is evaluated once per checkpoint window
        # rather than re-run by every round's driver scalar
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling")
        )
        shares = with_deg.filter(F.col("deg").isNotNull()).select(
            F.col("node").alias("u"),
            (F.col("rank") / F.col("deg")).alias("share"),
        )
        contribs = edges.join(shares, edges["src"] == F.col("u")).select(
            F.col("dst").alias("node"), F.col("share")
        )
        summed = contribs.groupBy("node").agg(F.sum("share").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("dangling") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            new_ranks = ranks.localCheckpoint()
            # the new checkpoint is materialized; the superseded one's
            # blocks are dead weight (unpersist() alone is a no-op on
            # local checkpoints — see free_local_checkpoint)
            if prev_ckpt is not None:
                free_local_checkpoint(prev_ckpt)
            prev_ckpt = new_ranks
            ranks = new_ranks
    if iterations > 0:
        # the returned frame is checkpointed (the last round always
        # checkpoints), so the helper tables' blocks are releasable;
        # with iterations=0 ranks still reads THROUGH nodes — keep them
        free_local_checkpoint(nodes)
        free_local_checkpoint(out_deg)
    return ranks


def link_pagerank(
    spark: SparkSession, sf_dir: str, iterations: int = 10
) -> DataFrame:
    """PageRank over the bipartite (turn-document → href) corpus link
    graph: documents contribute their rank to the targets they cite;
    targets are sinks whose mass recirculates via the dangling term.
    Node ids: ``doc:<conv_id>#<turn_idx>`` and ``url:<href>``."""
    links = _links(spark, sf_dir)
    edges = links.select(
        F.concat(F.lit("doc:"), "conv_id", F.lit("#"), "turn_idx").alias(
            "src"
        ),
        F.concat(F.lit("url:"), "href").alias("dst"),
    )
    return pagerank(edges, iterations=iterations)


# ----------------------------------------------- fixed-point gate variant

# Total rank mass in fixed-point units.  Integer arithmetic is
# associative — unlike the float iteration above, the per-round sums are
# order-independent, so Spark and DuckDB produce bit-identical ranks and
# the operator can ride the md5 value gate (VERDICT r4 item 4; CLAUDE.md:
# never ROUND on doubles — so don't: keep the mass integral end to end).
FP_SCALE = 10**12
FP_DAMP_NUM = 85
FP_DAMP_DEN = 100


def pagerank_fixed(
    edges: DataFrame,
    *,
    iterations: int = 4,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-point-integer PageRank: the same power iteration and the
    same physical shape as :func:`pagerank` (edges ⋈ ranks on src,
    groupBy dst, lazy 1-row dangling aggregate) with all mass carried
    as int64 units of ``1/FP_SCALE``:

        r'(v) = (15·M div 100) div N
                + (85 · (S(v) + D div N)) div 100

    where ``M = FP_SCALE``, ``S(v) = Σ_{u→v} r(u) div deg(u)`` and
    ``D = Σ_{deg(u)=0} r(u)``.  Integer division loses ≤1 unit per
    term (≤ deg·1e-12 of the mass per round) — the float twin remains
    the production scorer; this form exists so the gate can verify the
    ITERATION (joins, dangling redistribution, teleport) exactly.
    Overflow-safe: every intermediate ≤ 85·M < 2^47.
    """
    spark = edges.sparkSession
    edges = edges.select(
        F.col(edges.columns[0]).cast("string").alias("src"),
        F.col(edges.columns[1]).cast("string").alias("dst"),
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return spark.createDataFrame([], "node string, rank_fp long")
    out_deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint()

    ranks = nodes.select(
        "node", F.lit(FP_SCALE // n_nodes).cast("long").alias("rank_fp")
    )
    teleport = ((FP_SCALE * (FP_DAMP_DEN - FP_DAMP_NUM)) // FP_DAMP_DEN) // n_nodes
    prev_ckpt = None
    for i in range(iterations):
        with_deg = ranks.join(out_deg, ranks["node"] == out_deg["src"], "left")
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank_fp"), F.lit(0)).cast("long").alias("dangling")
        )
        shares = with_deg.filter(F.col("deg").isNotNull()).select(
            F.col("node").alias("u"),
            F.expr("rank_fp div deg").alias("share"),
        )
        contribs = edges.join(shares, edges["src"] == F.col("u")).select(
            F.col("dst").alias("node"), F.col("share")
        )
        summed = contribs.groupBy("node").agg(F.sum("share").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + F.expr(
                        f"({FP_DAMP_NUM} * (coalesce(s, 0L)"
                        f" + (dangling div {n_nodes}))) div {FP_DAMP_DEN}"
                    )
                ).cast("long").alias("rank_fp"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            new_ranks = ranks.localCheckpoint()
            if prev_ckpt is not None:
                free_local_checkpoint(prev_ckpt)
            prev_ckpt = new_ranks
            ranks = new_ranks
    if iterations > 0:
        free_local_checkpoint(nodes)
        free_local_checkpoint(out_deg)
    return ranks


def link_pagerank_fp(
    spark: SparkSession, sf_dir: str, iterations: int = 4, top_k: int = 100
) -> DataFrame:
    """Gate form of :func:`link_pagerank`: fixed-point ranks over the
    same doc→url bipartite graph, top ``top_k`` by (rank_fp DESC, node
    ASC) — TakeOrderedAndProject, never a global sort."""
    links = _links(spark, sf_dir)
    edges = links.select(
        F.concat(F.lit("doc:"), "conv_id", F.lit("#"), "turn_idx").alias("src"),
        F.concat(F.lit("url:"), "href").alias("dst"),
    )
    ranks = pagerank_fixed(edges, iterations=iterations)
    return ranks.orderBy(F.desc("rank_fp"), F.asc("node")).limit(top_k)


def link_pagerank_sql(
    golden_path: str, iterations: int = 4, top_k: int = 100
) -> str:
    """DuckDB twin: the identical integer recurrence UNROLLED — one CTE
    pair (dangling scalar + next ranks) per iteration — over the
    committed engine-golden link rows, so a Spark-side join/dangling/
    teleport bug breaks the value hash.  Tie-break mirrors the Spark
    orderBy exactly (rank_fp DESC, node ASC)."""
    m, dn, dd = FP_SCALE, FP_DAMP_NUM, FP_DAMP_DEN
    ctes = [
        f"links AS (SELECT * FROM read_parquet('{golden_path}'))",
        (
            "edges AS (SELECT 'doc:' || conv_id || '#' || turn_idx AS src, "
            "'url:' || href AS dst FROM links)"
        ),
        (
            "nodes AS (SELECT src AS node FROM edges "
            "UNION SELECT dst FROM edges)"
        ),
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        "p AS (SELECT count(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, CAST({m} AS BIGINT) // p.n AS rank_fp FROM nodes, p)",
    ]
    for i in range(iterations):
        prev, cur = f"r{i}", f"r{i + 1}"
        ctes.append(
            f"d{i} AS (SELECT CAST(coalesce(sum(rank_fp), 0) AS BIGINT) AS dm "
            f"FROM {prev} LEFT JOIN deg ON {prev}.node = deg.src "
            "WHERE deg.deg IS NULL)"
        )
        ctes.append(
            f"s{i} AS (SELECT e.dst AS node, "
            f"CAST(sum({prev}.rank_fp // deg.deg) AS BIGINT) AS s "
            f"FROM edges e JOIN deg ON e.src = deg.src "
            f"JOIN {prev} ON {prev}.node = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"{cur} AS (SELECT nodes.node, "
            f"CAST((({m} * {dd - dn}) // {dd}) // p.n "
            f"+ ({dn} * (coalesce(s{i}.s, 0) + d{i}.dm // p.n)) // {dd} "
            f"AS BIGINT) AS rank_fp "
            f"FROM nodes LEFT JOIN s{i} ON nodes.node = s{i}.node, d{i}, p)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, rank_fp FROM r{iterations} "
        f"ORDER BY rank_fp DESC, node ASC LIMIT {top_k}"
    )
