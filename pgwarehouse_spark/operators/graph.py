"""Iterative graph analytics on DataFrames — PageRank over the part
co-purchase graph (parts are nodes; an edge joins two parts bought in
the same order). Complements the label-propagation connected components
in operators/dedup.py: together they cover the two iterative-algorithm
shapes a warehouse meets (component discovery, influence scoring).

No anchor in the reference (it stops at sync); this is the
training-data / analytics extension surface. Everything is DataFrame
joins + aggregations — no RDDs, no Pregel, no Python in the loop.

Determinism: every per-row operation is IEEE double arithmetic
(identical in any engine) and every SUM goes through FLOOR fixed-point
at 1e-12 grain (exact integer sums, order-independent), so five
unrolled iterations produce bit-identical scores on Spark and DuckDB at
any partition count — the oracle replays the identical recurrence as
chained CTEs. (Round 6: the previous DECIMAL(28,12) cast drifted
~1e-12 at sf0.1 edge volume — Spark rounds a double's shortest-repr
digits while DuckDB rounds its exact binary value, and with millions of
contributions some land on rounding ties; FLOOR of bit-identical
doubles cannot disagree.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import t

_PR_DAMPING = 0.85
_PR_ITERS = 5
_PR_TOP = 100

#: hard ceiling on one adjacency row's destination array — a power-law
#: hub's adjacency is split across multiple rows so no single task ever
#: materializes a degree-sized array (VERDICT r02 item 2)
_PR_DEGREE_CAP = 65536


def _grouped_adjacency(edges: DataFrame, cap: int = _PR_DEGREE_CAP) -> DataFrame:
    """Grouped adjacency (src, dsts, out_deg) with HUB SPLITTING: a node
    whose degree exceeds `cap` gets ceil(deg / (cap/2)) chunk rows, its
    destinations hash-scattered across them (same salting story as the
    skew joins), each row still carrying the node's TOTAL degree so the
    per-iteration contribution w = score/out_deg is unchanged. Targeting
    cap/2 per chunk keeps the realized max far below `cap` (xxhash64
    scatter; Chernoff-tight). Accepts a RAW (possibly duplicated) pair
    stream and dedups inside its single src-partitioned exchange —
    nothing in the iteration loop changes, and the decimal contribution
    sum is order-independent so results stay bit-identical to the
    unsplit form."""
    from pyspark.sql import Window as W

    # ONE exchange for the whole build: repartition the (possibly
    # non-distinct) pair stream by src, then dedup, degree-count, and
    # chunk-group all inside that partitioning — hashpartitioning(src)
    # satisfies the (src, dst) clustering dropDuplicates needs, the
    # window's src partitioning, and the (src, chunk) clustering of the
    # final aggregation, so Catalyst inserts no further shuffles.
    # (Distinct-then-window was 3 exchanges and 3x slower at sf0.1;
    # an edges⋈degree equi-join was worse still.)
    edges = edges.repartition("src").dropDuplicates(["src", "dst"])
    deg_w = F.count(F.lit(1)).over(W.partitionBy("src"))
    n_chunks = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil(F.col("out_deg") / F.lit(max(cap // 2, 1))).cast("bigint"),
    )
    salted = edges.withColumn("out_deg", deg_w).withColumn(
        "__chunk", F.pmod(F.xxhash64("dst"), n_chunks)
    )
    return (
        salted.groupBy("src", "__chunk")
        .agg(
            F.collect_list("dst").alias("dsts"),
            F.first("out_deg").alias("out_deg"),
        )
        .drop("__chunk")
    )


def _copurchase_edges(li: DataFrame) -> DataFrame:
    """Undirected co-purchase edges as a directed pair list (both
    orientations), deduplicated to distinct (src, dst).

    Dedup is repartition("src") + dropDuplicates, not distinct():
    hashpartitioning(src) satisfies the (src, dst) clustering the
    dedup aggregate requires (a subset key co-locates every (src, *)
    row), so the whole build pays ONE exchange of the pair stream —
    distinct() planned a partial aggregate plus a second
    (src, dst)-keyed exchange for the same result, and its output
    partitioning served no consumer (guide §2.4: two operations keyed
    the same way share one exchange; measured at sf0.1 this build is
    what bfs/lpa/kcore spend half their wall on)."""
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .repartition("src")
        .dropDuplicates(["src", "dst"])
    )


def _sql_pagerank_iter(prev: str, nxt: str) -> str:
    """One PageRank step as a DuckDB CTE: contribution sums are
    decimal-cast per edge then summed exactly; dangling nodes keep only
    the teleport term (no out-edges in an undirected co-purchase graph
    cannot happen for nodes that exist, but isolated handling is kept
    explicit via LEFT JOIN)."""
    # the damping literal must be an IEEE DOUBLE on both engines (a
    # DECIMAL 0.85 divides/multiplies differently than float 0.85), and
    # contributions are FLOOR fixed-point at 1e-12 grain — floor of a
    # bit-identical double is unambiguous where a decimal CAST's
    # rounding is not (Spark rounds shortest-repr digits, DuckDB the
    # exact binary value; ties drifted ~1e-12 at sf0.1). Every
    # arithmetic step below mirrors the Spark expression bit-for-bit.
    return f"""
    {nxt} AS (
      SELECT n.part,
             (1 - CAST({_PR_DAMPING} AS DOUBLE)) / nn.n_nodes +
             CAST({_PR_DAMPING} AS DOUBLE) * COALESCE(
               CAST(SUM(
                 CAST(FLOOR(p.score / p.out_deg * 1e12) AS BIGINT)
               ) AS DOUBLE) / 1e12, CAST(0.0 AS DOUBLE)) AS score,
             n.out_deg
      FROM nodes n
      CROSS JOIN n_nodes nn
      LEFT JOIN edges e ON e.dst = n.part
      LEFT JOIN {prev} p ON p.part = e.src
      GROUP BY n.part, nn.n_nodes, n.out_deg
    )"""


_PR_ITER_SQL = ",".join(
    _sql_pagerank_iter(f"it{i}", f"it{i + 1}") for i in range(_PR_ITERS)
)

_PAGERANK_ORACLE = f"""
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    nodes AS (
      SELECT src AS part, COUNT(*) AS out_deg FROM edges GROUP BY src
    ),
    n_nodes AS (SELECT COUNT(*) AS n_nodes FROM nodes),
    it0 AS (
      SELECT part, CAST(1.0 AS DOUBLE) / nn.n_nodes AS score, out_deg
      FROM nodes CROSS JOIN n_nodes nn
    ),
    {_PR_ITER_SQL}
    SELECT part, score, CAST(out_deg AS BIGINT) AS out_deg FROM (
      SELECT part, score, out_deg,
             ROW_NUMBER() OVER (ORDER BY score DESC, part ASC) AS rk
      FROM it{_PR_ITERS}
    ) WHERE rk <= {_PR_TOP}
    ORDER BY score DESC, part ASC
"""


@register("graph_pagerank", category="graph", oracle=_PAGERANK_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph ({iters} unrolled power
    iterations, damping {d}): which parts sit at the center of basket
    co-occurrence — the influence/centrality primitive (product
    importance, seed selection, crawl prioritization all reduce to it).

    Scale: each iteration is one equi-join of the edge list with the
    current score vector plus a partial-aggregated groupBy on dst —
    shuffle volume is O(edges) fixed-width rows per iteration, the
    canonical edge-partitioned PageRank (what GraphX's Pregel compiles
    to, minus its RDD caching semantics). Scores materialize per
    iteration through localCheckpoint so the 5-deep lineage never
    re-executes upstream joins. The undirected co-purchase graph has
    out_deg >= 1 for every node by construction, so no dangling-mass
    redistribution is needed. Decimal-cast contribution sums keep every
    iteration bit-identical across engines and partition counts — the
    oracle replays the recurrence as chained CTEs. Final top-{top} is
    TakeOrdered (per-partition heaps), never a global sort."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # materialize the adjacency ONCE — without this every iteration
    # (plus the node-count action) re-executes the lineitem self-join;
    # localCheckpoint keeps the materialized partitions and cuts lineage.
    # Grouped adjacency (src -> [dst...]) instead of a flat edge list:
    # the per-iteration score join then probes ~|V| adjacency rows, not
    # |E| edge rows, and contributions explode AFTER the join — measured
    # ~30% faster per iteration at sf0.1 with bit-identical results
    # (the decimal contribution sum is order-independent). Hubs are
    # SPLIT across chunk rows capped at _PR_DEGREE_CAP destinations
    # (see _grouped_adjacency) so a power-law graph can't hand one task
    # a degree-sized array.
    # RAW (non-distinct) pairs feed the adjacency builder, which dedups
    # inside its single src-partitioned exchange — shipping the slightly
    # larger raw stream once beats materializing distinct first
    a, b = li.alias("a"), li.alias("b")
    raw_pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    adj = _grouped_adjacency(raw_pairs).localCheckpoint()
    nodes = (
        adj.select(F.col("src").alias("part"), "out_deg")
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty graph (empty feed / filtered slice): 1/n_nodes would
        # constant-fold into an ANSI divide-by-zero before any row runs
        return spark.createDataFrame(
            [], "part bigint, score double, out_deg bigint"
        )

    # The score vector carries ONLY (part, score): w = score/out_deg is
    # computed at the adjacency join from adj's own out_deg column
    # (bit-identical double arithmetic, just evaluated after the probe
    # instead of before), so the old per-iteration contrib⋈nodes
    # re-score join is gone — out_deg is attached ONCE after the loop
    # for the report. One join per iteration instead of two (guide
    # §1.2 step 1 — remove work from the loop, not the operators).
    scores = nodes.select(
        "part", (F.lit(1.0) / n_nodes).alias("score")
    ).localCheckpoint()
    for it in range(_PR_ITERS):
        # The score vector is |V|-sized, so an unconditional broadcast
        # hint would pin a driver-OOM plan at billion-node scale — but
        # localCheckpointed frames carry no stats, so WITHOUT a hint the
        # join degrades to shuffle even when scores trivially fit
        # (measured 2× slower at sf0.1). Gate the hint on the measured
        # node count the loop already holds: broadcast below ~4M nodes
        # (~64 MB of (long, double) rows), shuffle-join above.
        score_side = scores.select(F.col("part").alias("src"), "score")
        if n_nodes <= 4_000_000:
            score_side = F.broadcast(score_side)
        contrib = (
            adj.join(
                score_side,
                "src",
            )
            .select(
                F.explode("dsts").alias("part"),
                (F.col("score") / F.col("out_deg")).alias("w"),
            )
            .groupBy("part")
            # FLOOR fixed-point contributions (1e-12 grain), not a
            # decimal CAST: Spark rounds the double's SHORTEST-REPR
            # digits while DuckDB rounds the exact binary value, so
            # tie-adjacent contributions rounded to 12 decimals drift
            # ~1e-12 apart at sf0.1 edge volume (found by the sf0.1
            # oracle artifact, r6). floor(w * 1e12) is computed on
            # bit-identical doubles in both engines, summed as exact
            # integers (per-group mass <= 1e12, far inside int64), and
            # divided once — bit-identical at any scale.
            .agg(
                (
                    F.sum(F.floor(F.col("w") * F.lit(1e12)))
                    / F.lit(1e12)
                ).alias("in_mass")
            )
        )
        # The co-purchase graph is UNDIRECTED (both orientations
        # emitted), so every node with out-edges also receives in-mass —
        # contrib is COMPLETE over `nodes` and the next score vector is
        # a pure projection of it; no join.
        scores = contrib.select(
            "part",
            (
                F.lit((1 - _PR_DAMPING) / n_nodes)
                + _PR_DAMPING * F.col("in_mass")
            ).alias("score"),
        )
        # materialize between iterations only — the final iteration
        # flows straight into TakeOrdered (checkpointing it would add a
        # full extra pass for nothing)
        if it < _PR_ITERS - 1:
            scores = scores.localCheckpoint()
    # attach out_deg once for the report (broadcast under the same
    # measured-count gate as the score side; inner join — contrib
    # covers every node of the undirected graph)
    node_side = nodes
    if n_nodes <= 4_000_000:
        node_side = F.broadcast(node_side)
    return (
        scores.join(node_side, "part")
        .select(
            "part", "score", F.col("out_deg").cast("bigint").alias("out_deg")
        )
        .orderBy(F.col("score").desc(), F.col("part").asc())
        .limit(_PR_TOP)
    )


graph_pagerank.__doc__ = (
    graph_pagerank.__doc__.replace("{iters}", str(_PR_ITERS))
    .replace("{d}", str(_PR_DAMPING))
    .replace("{top}", str(_PR_TOP))
)


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation)
# ---------------------------------------------------------------------------

_TRI_TOP = 50

_TRIANGLE_ORACLE = f"""
    WITH edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (SELECT src AS part, COUNT(*) AS deg FROM edges GROUP BY src),
    und AS (SELECT src, dst FROM edges WHERE src < dst),
    ori AS (
      SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND e.src < e.dst)
                  THEN e.src ELSE e.dst END AS a,
             CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND e.src < e.dst)
                  THEN e.dst ELSE e.src END AS b
      FROM und e
      JOIN deg d1 ON e.src = d1.part
      JOIN deg d2 ON e.dst = d2.part
    ),
    tri AS (
      SELECT o1.a AS x, o1.b AS y, o2.b AS z
      FROM ori o1
      JOIN ori o2 ON o1.b = o2.a
      JOIN ori o3 ON o3.a = o1.a AND o3.b = o2.b
    ),
    pern AS (
      SELECT part, COUNT(*) AS n_triangles FROM (
        SELECT x AS part FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY part
    )
    SELECT part, CAST(n_triangles AS BIGINT) AS n_triangles FROM (
      SELECT part, n_triangles,
             ROW_NUMBER() OVER (ORDER BY n_triangles DESC, part ASC) AS rk
      FROM pern
    ) WHERE rk <= {_TRI_TOP}
    ORDER BY n_triangles DESC, part ASC
"""


@register("graph_triangle_count", category="graph", oracle=_TRIANGLE_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the part co-purchase graph —
    the clustering/community primitive (local clustering coefficient,
    spam-graph detection, and cohesive-group mining all start here).

    Algorithm: degree-ordered edge orientation, the standard
    distributed-triangle trick (MR-era 'compact-forward'). Every
    undirected edge is oriented from the (degree, id)-smaller endpoint
    to the larger, which (a) counts each triangle exactly once as its
    unique a<b<c chain and (b) bounds every out-neighborhood by
    O(sqrt(edges)) regardless of hub skew — a hub of degree d would
    otherwise emit d^2 wedges; oriented, its out-degree collapses to
    roughly the ~sqrt scale, which is what keeps the wedge join tractable
    at 100 TB.

    Plan: edge-iterator with adjacency intersection — per oriented edge
    (a,b), the triangles through it are |N⁺(a) ∩ N⁺(b)| via
    array_intersect on the grouped out-neighbor lists. Versus the naive
    wedge self-join this never materializes non-closing wedges (the
    wedge count dwarfs the triangle count on most graphs; 2× faster at
    sf0.1 here), and the orientation bounds every out-list by
    ~O(sqrt(E)), so the arrays stay task-sized even at hub nodes.
    Per-node counts: edge endpoints each get the intersection size,
    every common neighbor gets 1 — one weighted array per edge,
    exploded once and partial-aggregated map-side (r9: the previous
    3-projection Union re-executed the whole edge⋈adjacency subtree
    per branch — 3 identical SMJ trees, 6 collect_list builds).
    Top-N is TakeOrdered, not a global sort."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Orientation in TWO exchanges (guide §2.4 — two operations keyed
    # the same way share one exchange): the raw both-orientations pair
    # stream is hash-partitioned by src ONCE, which serves both the
    # (src, dst) dedup and the per-src degree window; then the two
    # directed rows of each undirected edge meet in a single groupBy on
    # the canonical (lo, hi) key, where each row carries its own
    # source's exact degree, and the (degree, id) orientation is decided
    # inside the aggregate. The former build (distinct + degree
    # aggregate + two degree equi-joins) paid four exchanges and two
    # sort-merge joins for the same result.
    from pyspark.sql import Window as W

    a0, b0 = li.alias("a"), li.alias("b")
    raw = a0.join(
        b0,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    directed = (
        raw.repartition("src")
        .dropDuplicates(["src", "dst"])
        .withColumn("deg", F.count(F.lit(1)).over(W.partitionBy("src")))
    )
    lo = F.least("src", "dst")
    hi = F.greatest("src", "dst")
    paired = directed.groupBy(lo.alias("lo"), hi.alias("hi")).agg(
        F.max(F.when(F.col("src") == F.least("src", "dst"), F.col("deg"))).alias(
            "deg_lo"
        ),
        F.max(
            F.when(F.col("src") == F.greatest("src", "dst"), F.col("deg"))
        ).alias("deg_hi"),
    )
    # ties orient lo -> hi, matching the (deg, id) order of the oracle
    lo_first = F.col("deg_lo") <= F.col("deg_hi")
    ori = (
        paired.select(
            F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("a"),
            F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("b"),
        )
        .localCheckpoint()
    )
    # checkpoint the grouped adjacency: both join probes (on a and on b)
    # read the one materialized copy instead of re-running the O(E)
    # collect_list aggregation per probe
    adj = (
        ori.groupBy("a")
        .agg(F.collect_list("b").alias("nbrs"))
        .localCheckpoint()
    )
    adj_a = adj.select("a", F.col("nbrs").alias("nbrs_a"))
    adj_b = adj.select(F.col("a").alias("b"), F.col("nbrs").alias("nbrs_b"))
    empty = F.array().cast("array<bigint>")
    et = (
        ori.join(adj_a, "a", "left")
        .join(adj_b, "b", "left")
        .select(
            "a",
            "b",
            F.array_intersect(
                F.coalesce("nbrs_a", empty), F.coalesce("nbrs_b", empty)
            ).alias("common"),
        )
    )
    # same (part, n) multiset as the former 3-projection union, from a
    # single pass: [(a, |common|), (b, |common|)] ++ [(c, 1) per common]
    contrib = et.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(
                        F.col("a").alias("part"), F.size("common").alias("n")
                    ),
                    F.struct(
                        F.col("b").alias("part"), F.size("common").alias("n")
                    ),
                ),
                F.transform(
                    F.col("common"),
                    lambda c: F.struct(c.alias("part"), F.lit(1).alias("n")),
                ),
            )
        ).alias("pc")
    )
    pern = (
        contrib.select(F.col("pc.part").alias("part"), F.col("pc.n").alias("n"))
        .groupBy("part")
        .agg(F.sum("n").alias("n_triangles"))
        .filter(F.col("n_triangles") > 0)
    )
    return (
        pern.orderBy(F.col("n_triangles").desc(), F.col("part").asc())
        .limit(_TRI_TOP)
    )


_CC_SLICE = 11  # every 11th order contributes edges — a sparse subgraph
# pointer-jumping rounds for the oracle's unrolled HybridCC: distance
# to each component's min label at least halves per round, so 24
# rounds converge for any component up to ~2^24 nodes — far beyond any
# test scale; the in-SQL convergence guard makes a too-small budget
# fail LOUD (empty result -> row-count mismatch), never silently wrong
_CC_ORACLE_ROUNDS = 24


def _cc_hybrid_oracle(slice_: int, rounds: int = _CC_ORACLE_ROUNDS) -> str:
    """Generated DuckDB oracle for connected components: unrolled
    HybridCC (per round: neighbor-min, then pointer jump lbl := lbl's
    lbl), O(E) work per round and O(E log V) total.

    The natural WITH RECURSIVE transitive closure is O(V^2) rows on a
    giant component — at sf0.1 this graph is one ~18.7k-node component,
    whose closure is ~350M pairs and took DuckDB 40+ minutes and 30 GB
    (the r7 two-sf artifact run caught it); the unrolled form answers
    in ~2 s. Every CTE is MATERIALIZED: each round references the
    previous one twice, so inlining would double the plan per round.
    The final guard runs one extra neighbor-min step and EMPTIES the
    result if any label would still improve."""
    head = f"""
    WITH base AS MATERIALIZED (
      SELECT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey % {slice_} = 0
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT l_partkey AS part FROM base),
    pairs AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS id1, b.l_partkey AS id2
      FROM base a JOIN base b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS MATERIALIZED (
      SELECT id1 AS u, id2 AS v FROM pairs
      UNION ALL SELECT id2, id1 FROM pairs
    ),
    l0 AS MATERIALIZED (SELECT part, part AS lbl FROM nodes)"""
    ctes = [head]
    for i in range(rounds):
        ctes.append(f"""
    a{i} AS MATERIALIZED (
      SELECT part, MIN(lbl) AS lbl FROM (
        SELECT part, lbl FROM l{i}
        UNION ALL
        SELECT e.v AS part, l.lbl FROM l{i} l JOIN edges e ON l.part = e.u
      ) GROUP BY part
    ),
    l{i + 1} AS MATERIALIZED (
      SELECT a.part, x.lbl FROM a{i} a JOIN a{i} x ON a.lbl = x.part
    )""")
    last = f"l{rounds}"
    ctes.append(f"""
    extra AS MATERIALIZED (
      SELECT part, MIN(lbl) AS lbl FROM (
        SELECT part, lbl FROM {last}
        UNION ALL
        SELECT e.v AS part, l.lbl FROM {last} l JOIN edges e ON l.part = e.u
      ) GROUP BY part
    ),
    unconverged AS MATERIALIZED (
      SELECT COUNT(*) AS n FROM {last} l JOIN extra x
        ON l.part = x.part AND l.lbl <> x.lbl
    )""")
    return ",".join(ctes) + f"""
    SELECT part, lbl AS component_id,
           COUNT(*) OVER (PARTITION BY lbl) AS component_size
    FROM {last}
    WHERE (SELECT n FROM unconverged) = 0
    ORDER BY part
    """


@register(
    "graph_connected_components",
    category="graph",
    oracle=_cc_hybrid_oracle(_CC_SLICE),
    doc="Connected components as a first-class graph query (the "
    "identity-stitching / entity-resolution primitive): parts linked by "
    "co-purchase within a sparse order slice, labeled with their "
    "component min via the same alternating large-star/small-star "
    "contraction dedup_clusters uses (Kiveris et al. 2014 — O(log²) "
    "rounds on chains and skewed stars, localCheckpoint-truncated "
    "lineage), with isolated nodes kept as singleton components. The "
    "oracle replays the labeling with an unrolled HybridCC "
    "(neighbor-min + pointer jumping, O(E log V) — the recursive "
    "closure it replaced was O(V^2) on the sf0.1 giant component, "
    "40+ min in DuckDB) with an in-SQL convergence guard. Scale: "
    "per-round shuffles are O(edges); the slice keeps the demo graph "
    "sparse, exactly the regime (many small components) where the "
    "min-label star contraction converges in a handful of rounds.",
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from .dedup import connected_components

    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % _CC_SLICE == 0
    ).select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    # one-exchange dedup: hashpartitioning(id1) satisfies the
    # (id1, id2) clustering dropDuplicates needs (same rationale as
    # _copurchase_edges)
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("id1"),
            F.col("b.l_partkey").alias("id2"),
        )
        .repartition("id1")
        .dropDuplicates(["id1", "id2"])
    )
    nodes = li.select(F.col("l_partkey").alias("part")).distinct()
    labeled = connected_components(pairs).select(
        F.col("doc_id").alias("part"), F.col("cluster_id").alias("component_id")
    )
    full = (
        nodes.join(labeled, "part", "left")
        .select(
            "part",
            F.coalesce(F.col("component_id"), F.col("part")).alias(
                "component_id"
            ),
        )
    )
    w = W.partitionBy("component_id")
    return full.select(
        "part", "component_id", F.count(F.lit(1)).over(w).alias("component_size")
    ).orderBy("part")


# ---------------------------------------------------------------------------
# Label propagation communities (synchronous, deterministic tie-break)
# ---------------------------------------------------------------------------

_LP_ITERS = 4
_LP_TOP = 50
_LP_DATE_LO = "1995-01-01"
_LP_DATE_HI = "1995-12-31"


def _sql_lp_iter(prev: str, i: int) -> str:
    """One synchronous label-propagation step as DuckDB CTEs: count each
    incoming neighbor label, adopt the most frequent (ties -> smallest
    label) — integer-only arithmetic, so cross-engine bit parity is
    structural."""
    return f"""
    c{i} AS (
      SELECT e.dst AS node, l.label, COUNT(*) AS cnt
      FROM edges e JOIN {prev} l ON l.node = e.src
      GROUP BY e.dst, l.label
    ),
    l{i} AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (
                 PARTITION BY node ORDER BY cnt DESC, label ASC
               ) AS rk
        FROM c{i}
      ) WHERE rk = 1
    )"""


_LP_ITER_SQL = ",".join(
    _sql_lp_iter(f"l{i - 1}", i) for i in range(1, _LP_ITERS + 1)
)

_LABELPROP_ORACLE = f"""
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem
      WHERE l_shipdate BETWEEN DATE '{_LP_DATE_LO}' AND DATE '{_LP_DATE_HI}'
    ),
    edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    {_LP_ITER_SQL}
    SELECT label AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(node) AS min_part, MAX(node) AS max_part
    FROM l{_LP_ITERS}
    GROUP BY label
    ORDER BY n_members DESC, community ASC
    LIMIT {_LP_TOP}
"""


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling)
# ---------------------------------------------------------------------------

_KCORE_K = 6
_KCORE_ROUNDS = 6


def _sql_kcore_round(i: int) -> str:
    """One peel round as DuckDB CTEs: recount degrees, keep nodes at
    degree >= K, restrict edges to kept endpoints. MATERIALIZED is
    load-bearing — inlined, the e{i} chain re-expands multiplicatively
    per reference (same trap the MMR oracle documents)."""
    return f"""
    d{i} AS MATERIALIZED (
      SELECT src, COUNT(*) AS c FROM e{i} GROUP BY src
    ),
    k{i} AS MATERIALIZED (SELECT src FROM d{i} WHERE c >= {_KCORE_K}),
    e{i + 1} AS MATERIALIZED (
      SELECT e.src, e.dst FROM e{i} e
      JOIN k{i} x ON e.src = x.src
      JOIN k{i} y ON e.dst = y.src
    )"""


_KCORE_ORACLE = f"""
    WITH e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM (SELECT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % {_CC_SLICE} = 0) a
      JOIN (SELECT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % {_CC_SLICE} = 0) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    {",".join(_sql_kcore_round(i) for i in range(_KCORE_ROUNDS))}
    SELECT src AS part, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e{_KCORE_ROUNDS}
    GROUP BY src
    ORDER BY part
"""


@register("graph_kcore", category="graph", oracle=_KCORE_ORACLE)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-core of the sparse co-purchase slice by {r} unrolled peel
    rounds — the degeneracy/cohesion primitive (dense-subgraph mining,
    spam-ring detection, and community seeding all start by discarding
    the low-degree shell). Each round recounts degrees, drops nodes
    below {k}, and restricts the edge list to surviving endpoints; the
    round count is fixed (and chosen at the measured fixpoint for this
    graph family), so the output is a deterministic pure function of the
    input — no convergence-dependent control flow for the oracle to
    disagree with.

    Scale: a round is one partial-aggregated degree count plus two
    left-semi joins against the kept-node set — shuffle volume is
    O(edges) fixed-width rows, shrinking monotonically as the shell
    peels (round edge counts at sf0.1: 217k → 185k, most mass gone in
    round 1). The kept set is |V|-sized and un-hinted: AQE broadcasts
    it while it fits and shuffles above, the same gate PageRank applies
    explicitly. localCheckpoint between rounds truncates the {r}-deep
    lineage. Integer-only arithmetic ⇒ bit parity with the oracle's
    MATERIALIZED-CTE replay at any partition count."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % _CC_SLICE == 0
    ).select("l_orderkey", "l_partkey")
    edges = _copurchase_edges(li).localCheckpoint()
    for _ in range(_KCORE_ROUNDS):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
        # one build-side exchange per round, not two: both semi-joins
        # probe the SAME un-projected kept-node relation (join on a
        # condition instead of renaming src->dst), so Catalyst's
        # exchange reuse materializes one build side and the dst probe
        # reads it — the rename put a Project inside the exchange
        # subtree and broke canonical equality (guide §2.4 / §3.1).
        # Still un-hinted: AQE broadcasts the |V|-sized set while it
        # fits and falls back to shuffle above, as before.
        keep = deg.filter(F.col("c") >= _KCORE_K).select(
            F.col("src").alias("k")
        )
        edges = (
            edges.join(keep, F.col("src") == F.col("k"), "left_semi")
            .join(keep, F.col("dst") == F.col("k"), "left_semi")
            .localCheckpoint()
        )
    return (
        edges.groupBy(F.col("src").alias("part"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .orderBy("part")
    )


graph_kcore.__doc__ = graph_kcore.__doc__.replace(
    "{k}", str(_KCORE_K)
).replace("{r}", str(_KCORE_ROUNDS))


# ---------------------------------------------------------------------------
# Multi-source BFS hop distance (frontier expansion)
# ---------------------------------------------------------------------------

_BFS_DEPTH = 4
_BFS_SEED_MOD = 101


def _sql_bfs_round(i: int) -> str:
    """One frontier expansion as DuckDB CTEs: neighbors of the current
    frontier, minus already-visited nodes, enter at hops i+1."""
    return f"""
    n{i} AS MATERIALIZED (
      SELECT DISTINCT e.dst AS node FROM edges e
      JOIN f{i} f ON e.src = f.node
    ),
    new{i} AS MATERIALIZED (
      SELECT n.node, {i + 1} AS hops FROM n{i} n
      WHERE NOT EXISTS (SELECT 1 FROM v{i} v WHERE v.node = n.node)
    ),
    v{i + 1} AS MATERIALIZED (
      SELECT node, hops FROM v{i} UNION ALL SELECT node, hops FROM new{i}
    ),
    f{i + 1} AS MATERIALIZED (SELECT node FROM new{i})"""


_BFS_ORACLE = f"""
    WITH edges AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM (SELECT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % {_CC_SLICE} = 0) a
      JOIN (SELECT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % {_CC_SLICE} = 0) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    v0 AS MATERIALIZED (
      SELECT DISTINCT src AS node, 0 AS hops FROM edges
      WHERE src % {_BFS_SEED_MOD} = 0
    ),
    f0 AS MATERIALIZED (SELECT node FROM v0),
    {",".join(_sql_bfs_round(i) for i in range(_BFS_DEPTH))}
    SELECT node AS part, CAST(hops AS INT) AS hops
    FROM v{_BFS_DEPTH}
    ORDER BY part
"""


@register("graph_bfs_distance", category="graph", oracle=_BFS_ORACLE)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance (depth {d}) from a deterministic
    seed set (part id % {m} = 0) over the sparse co-purchase slice —
    the reachability-with-distance primitive (influence radius,
    crawl-frontier scheduling, and 'within N hops of a flagged node'
    risk queries are all this shape). Nodes unreached within {d} hops
    are absent from the output, which is the honest contract for a
    bounded-depth traversal.

    Scale: textbook frontier BFS on DataFrames — each round joins the
    CURRENT FRONTIER (not the full visited set) against the edge list,
    dedups the neighbor set map-side, and anti-joins the visited set,
    so per-round shuffle is O(frontier-adjacent edges), the distributed
    analogue of the queue in sequential BFS. The visited set only ever
    grows by genuinely-new nodes, so the union chain carries each node
    exactly once (first discovery = min hops, no per-node min needed).
    localCheckpoint per round truncates lineage. Integer-only ⇒ bit
    parity with the oracle's unrolled frontier replay."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % _CC_SLICE == 0
    ).select("l_orderkey", "l_partkey")
    edges = _copurchase_edges(li).localCheckpoint()
    seeds = (
        edges.select(F.col("src").alias("node"))
        .filter(F.col("node") % _BFS_SEED_MOD == 0)
        .distinct()
    )
    visited = seeds.select("node", F.lit(0).alias("hops")).localCheckpoint()
    frontier = visited.select("node")
    for i in range(_BFS_DEPTH):
        nbrs = (
            edges.join(
                frontier.select(F.col("node").alias("src")), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = nbrs.join(visited, "node", "left_anti").select(
            "node", F.lit(i + 1).alias("hops")
        )
        visited = visited.unionByName(new).localCheckpoint()
        frontier = visited.filter(F.col("hops") == i + 1).select("node")
    return visited.select(
        F.col("node").alias("part"), F.col("hops").cast("int").alias("hops")
    ).orderBy("part")


graph_bfs_distance.__doc__ = graph_bfs_distance.__doc__.replace(
    "{d}", str(_BFS_DEPTH)
).replace("{m}", str(_BFS_SEED_MOD))


def _lpa_final_labels(spark: SparkSession, sf_dir: str):
    """Shared LPA core: the one-year co-purchase edge set (both
    directions, localCheckpointed — the label rounds re-reference it
    4x, same rationale as PageRank's adjacency) and the labels after
    `_LP_ITERS` synchronous rounds with the deterministic (cnt desc,
    label asc) argmax. Consumed by graph_label_propagation (community
    census) and graph_modularity_score (partition quality)."""
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate").between(
                F.lit(_LP_DATE_LO).cast("date"),
                F.lit(_LP_DATE_HI).cast("date"),
            )
        )
        .select("l_orderkey", "l_partkey")
    )
    edges = _copurchase_edges(li).localCheckpoint()
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LP_ITERS):
        nbr = edges.join(
            labels.select(F.col("node").alias("src"), "label"), "src"
        ).select(F.col("dst").alias("node"), "label")
        counts = nbr.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        # argmax by (cnt desc, label asc): max over the struct
        # (cnt, -label) — integer fields, lexicographic comparison
        pick = counts.groupBy("node").agg(
            F.max(
                F.struct(
                    F.col("cnt"), (-F.col("label")).alias("neg_label")
                )
            ).alias("m")
        )
        labels = pick.select(
            "node", (-F.col("m.neg_label")).alias("label")
        )
    return edges, labels


@register("graph_label_propagation", category="graph", oracle=_LABELPROP_ORACLE)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over one
    shipping year's co-purchase graph (4 unrolled rounds): every
    part starts in its own community, then repeatedly adopts the most
    frequent label among its neighbors (ties -> smallest label, so the
    fixpoint is deterministic — raw LPA's random tie-break is the
    classic nondeterminism trap). The third iterative-graph shape next
    to PageRank (influence) and connected components (reachability):
    communities respect edge DENSITY, not mere connectivity, which is
    what basket-segment discovery and near-dup cluster splitting
    actually need.

    Scale: the slice-then-analyze pattern — the date predicate lands in
    the parquet scan (PushedFilters), so the self-join sees one year,
    not the full history. Each round is one equi-join of edges with the
    |V|-row label frame plus a (dst, label) count whose map-side partial
    aggregation bounds hub fan-in BEFORE the shuffle, then a per-node
    argmax via max(struct(cnt, -label)) — a second partial-aggregated
    exchange, no window over raw edges, no degree-sized arrays.
    Integer-only arithmetic keeps every round bit-identical to the
    oracle's CTE replay at any partition count."""
    edges, labels = _lpa_final_labels(spark, sf_dir)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("node").alias("min_part"),
            F.max("node").alias("max_part"),
        )
        .orderBy(F.col("n_members").desc(), F.col("community").asc())
        .limit(_LP_TOP)
    )


_MODULARITY_ORACLE = f"""
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem
      WHERE l_shipdate BETWEEN DATE '{_LP_DATE_LO}' AND DATE '{_LP_DATE_HI}'
    ),
    edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    {_LP_ITER_SQL},
    fin AS MATERIALIZED (SELECT node, label FROM l{_LP_ITERS}),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM edges GROUP BY src),
    dsum AS (
      SELECT f.label, CAST(SUM(d.deg) AS BIGINT) AS d_c
      FROM fin f JOIN deg d ON d.node = f.node GROUP BY f.label
    ),
    m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM edges),
    e2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS e2
      FROM edges e
      JOIN fin a ON e.src = a.node
      JOIN fin b ON e.dst = b.node
      WHERE a.label = b.label
    ),
    dd AS (
      SELECT CAST(SUM(d_c * d_c) AS BIGINT) AS sum_d2,
             CAST(COUNT(*) AS BIGINT) AS n_communities
      FROM dsum
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM fin)
    SELECT nn.n_nodes, dd.n_communities,
           m2.m2 // 2 AS m_edges, e2.e2 // 2 AS intra_edges,
           CAST(FLOOR(1000000.0 * (m2.m2 * e2.e2 - dd.sum_d2)
                      / (m2.m2 * m2.m2)) AS BIGINT) AS modularity_micro
    FROM nn, dd, m2, e2
"""


@register("graph_modularity_score", category="graph", oracle=_MODULARITY_ORACLE)
def graph_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation partition — the
    quality score that tells you whether the communities LPA found are
    real structure or noise: Q = sum_c [e_c/m - (d_c/2m)^2], computed
    over the SAME 4-round LPA labels as graph_label_propagation (shared
    core, one code path — the census and its quality metric cannot
    drift apart). Reported in exact micro-units via integer-only
    counts: with M2 = ordered-pair count and E2 = intra-community
    ordered pairs, Q = (M2*E2 - sum_c D_c^2) / M2^2 — numerator and
    denominator are exact int64, the one float step (multiply/divide/
    FLOOR over <2^53 integers) IEEE-identical cross-engine.

    Scale: on top of the LPA rounds (see graph_label_propagation), the
    score adds one degree count over edges, one label-sum groupBy over
    the |V|-row label frame, and one intra-pair count — each a
    partial-aggregated equi-join/exchange over already-built frames; no
    new quadratic term anywhere (the d_c^2 fold runs over communities,
    not nodes)."""
    edges, labels = _lpa_final_labels(spark, sf_dir)
    labels = labels.localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    dsum = (
        labels.join(deg, labels.node == deg.src)
        .groupBy("label")
        .agg(F.sum("deg").alias("d_c"))
    )
    m2 = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m2"))
    e2 = (
        edges.join(
            labels.select(F.col("node").alias("src"), F.col("label").alias("la")),
            "src",
        )
        .join(
            labels.select(F.col("node").alias("dst"), F.col("label").alias("lb")),
            "dst",
        )
        .filter(F.col("la") == F.col("lb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e2"))
    )
    dd = dsum.agg(
        F.sum(F.col("d_c") * F.col("d_c")).cast("bigint").alias("sum_d2"),
        F.count(F.lit(1)).cast("bigint").alias("n_communities"),
    )
    nn = labels.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    return (
        nn.crossJoin(F.broadcast(dd))
        .crossJoin(F.broadcast(m2))
        .crossJoin(F.broadcast(e2))
        .select(
            "n_nodes",
            "n_communities",
            F.expr("m2 DIV 2").alias("m_edges"),
            F.expr("e2 DIV 2").alias("intra_edges"),
            F.floor(
                1000000.0
                * (F.col("m2") * F.col("e2") - F.col("sum_d2"))
                / (F.col("m2") * F.col("m2"))
            ).cast("bigint").alias("modularity_micro"),
        )
    )


#: wedge centers above this degree are excluded from common-neighbor
#: counting — a hub shared by everyone carries no link signal (standard
#: practice in production link prediction) and, mechanically, caps the
#: wedge fan-out at cap * 2E instead of sum(deg^2)
_LINKPRED_HUB_CAP = 64


_LINKPRED_ORACLE = f"""
    WITH li AS (
      SELECT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey % {_CC_SLICE} = 0
    ),
    edges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    deg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
    ),
    centers AS (SELECT src FROM deg WHERE d <= {_LINKPRED_HUB_CAP}),
    wedges AS (
      SELECT e1.dst AS a, e2.dst AS b
      FROM edges e1
      JOIN centers c ON c.src = e1.src
      JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
    ),
    cand AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM wedges GROUP BY a, b
    ),
    nonedge AS (
      SELECT c.a, c.b, c.n_common
      FROM cand c
      LEFT JOIN edges e ON e.src = c.a AND e.dst = c.b
      WHERE e.src IS NULL
    ),
    scored AS (
      SELECT n.a, n.b, n.n_common,
             da.d + db.d - n.n_common AS n_union,
             1000 * n.n_common // (da.d + db.d - n.n_common)
               AS jaccard_milli
      FROM nonedge n
      JOIN deg da ON da.src = n.a
      JOIN deg db ON db.src = n.b
    )
    SELECT a AS part_a, b AS part_b, n_common, n_union,
           CAST(jaccard_milli AS BIGINT) AS jaccard_milli
    FROM scored
    ORDER BY jaccard_milli DESC, part_a, part_b
    LIMIT 20
"""


@register("graph_link_prediction", category="graph", oracle=_LINKPRED_ORACLE)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction over the sparse co-purchase
    slice: for part pairs NOT yet bought together, the Jaccard overlap
    of their neighborhoods — the 'customers who bought these also
    bought' recommender primitive, and the classic graph-ML baseline
    (Liben-Nowell & Kleinberg). Candidates come from two-hop wedges;
    the score is hub-discounted: wedge CENTERS above degree
    {_LINKPRED_HUB_CAP} are excluded (a part in every basket links
    everything to everything and carries no signal), while the union
    term uses full degrees. Existing edges are removed by an anti-join.

    Scale: the wedge self-join is the quadratic hazard — sum(deg²) over
    centers explodes on hubs — and the cap bounds it at cap·2E, linear
    in edges (the same hub discipline as the degree-ordered triangle
    orientation and the PageRank adjacency split). Wedge pairs
    partial-aggregate map-side into (a, b, count) before the shuffle;
    the anti-join and two degree joins run on the candidate table, and
    the report is a TakeOrdered. Integer-only arithmetic (counts,
    integer-DIV milli score) ⇒ bit-identical to the oracle replay."""
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % _CC_SLICE == 0)
        .select("l_orderkey", "l_partkey")
    )
    edges = _copurchase_edges(li).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    centers = deg.filter(F.col("d") <= _LINKPRED_HUB_CAP).select("src")
    e1 = edges.join(centers, "src").select(
        "src", F.col("dst").alias("a")
    )
    e2 = edges.select("src", F.col("dst").alias("b"))
    wedges = e1.join(e2, "src").filter(F.col("a") < F.col("b"))
    cand = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    nonedge = cand.join(
        edges.select(
            F.col("src").alias("a"), F.col("dst").alias("b")
        ),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("src").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("src").alias("b"), F.col("d").alias("db"))
    scored = (
        nonedge.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("part_a"),
            F.col("b").alias("part_b"),
            "n_common",
            (F.col("da") + F.col("db") - F.col("n_common")).alias("n_union"),
            F.expr("1000 * n_common DIV (da + db - n_common)")
            .cast("bigint")
            .alias("jaccard_milli"),
        )
    )
    return scored.orderBy(
        F.col("jaccard_milli").desc(), "part_a", "part_b"
    ).limit(20)


graph_link_prediction.__doc__ = graph_link_prediction.__doc__.replace(
    "{_LINKPRED_HUB_CAP}", str(_LINKPRED_HUB_CAP)
)
