"""Spatial analytics via grid-cell bucketing — the radius self-join and
the neighborhood-density hotspot scan.

No anchor in the reference (it stops at sync); this is the analytics
extension surface, covering the join shape the banded interval join
(`relational.py::join_interval_banded`) handles in one dimension, lifted
to two: quantize the plane into cells sized to the query radius, turn
the O(N²) distance theta-join into an equi hash join on the cell key,
then refine with the exact integer distance predicate.

Coordinates are derived from customer keys by a fixed multiplicative
hash-scatter into a 1000×1000 integer plane — the tables carry no
geography, so the POINT SET is synthetic but the OPERATOR is the real
thing: every step (cell assignment, 3×3 replication, equi-join, refine)
is exactly what an IP-geolocation or store-catchment join runs at scale.
All arithmetic is int64, so Spark and DuckDB agree bit-for-bit and the
oracle can afford the naive quadratic join at verification scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import t

#: plane is GRID_SIZE × GRID_SIZE integer cells of CELL px; the radius
#: query uses R = CELL so a point's candidates live in its 3×3
#: neighborhood — cell size ≥ radius is the invariant that makes the
#: 9-cell replication a candidate SUPERSET (no match can be lost).
_CELL = 25
_RADIUS_SQ = _CELL * _CELL
_PLANE = 1000

# multiplicative scatter constants (Lehmer / Park–Miller multipliers,
# public-domain); primes just above 1e5 decorrelate x from y.
_AX, _PX = 48271, 100003
_AY, _PY = 69621, 100019


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic point set: one point per customer, int64 coords in
    [0, _PLANE)²."""
    c = t(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("long")
    return c.select(
        k.alias("k"),
        ((k * _AX) % _PX % _PLANE).alias("x"),
        ((k * _AY) % _PY % _PLANE).alias("y"),
    )


def _pts_sql() -> str:
    return f"""
      SELECT CAST(c_custkey AS BIGINT) AS k,
             (CAST(c_custkey AS BIGINT) * {_AX}) % {_PX} % {_PLANE} AS x,
             (CAST(c_custkey AS BIGINT) * {_AY}) % {_PY} % {_PLANE} AS y
      FROM customer
    """


def _radius_candidate_pairs(pts, pair_filter):
    """Shared grid candidate pipeline: cell assignment, 3x3 one-side
    replication, equi hash join on the cell key, exact integer distance
    refine. `pair_filter` distinguishes the unordered-pair form
    (cust_a < cust_b, radius self-join) from the per-point form
    (cust_a != cust_b, kNN) — everything else, including the cell-size
    >= radius invariant that makes the 9-cell set a candidate SUPERSET,
    lives here exactly once."""
    cx = (F.col("x") / _CELL).cast("long")
    cy = (F.col("y") / _CELL).cast("long")
    home = pts.select("k", "x", "y", cx.alias("cx"), cy.alias("cy"))
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    repl = home.select(
        F.col("k").alias("cust_a"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.explode(offsets).alias("o"),
        F.col("cx"),
        F.col("cy"),
    ).select(
        "cust_a", "ax", "ay",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    d2 = (F.col("ax") - F.col("x")) * (F.col("ax") - F.col("x")) + (
        F.col("ay") - F.col("y")
    ) * (F.col("ay") - F.col("y"))
    return (
        repl.join(home.withColumnRenamed("k", "cust_b"), ["cx", "cy"])
        .filter(pair_filter & (d2 <= _RADIUS_SQ))
        .select("cust_a", "cust_b", d2.alias("dist_sq"))
    )


@register(
    "spatial_grid_neighbors",
    category="spatial",
    oracle=f"""
    WITH pts AS ({_pts_sql()}),
    pairs AS (
      SELECT a.k AS cust_a, b.k AS cust_b,
             (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist_sq
      FROM pts a JOIN pts b ON a.k < b.k
      WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_RADIUS_SQ}
    )
    SELECT cust_a, cust_b, dist_sq,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_pairs
    FROM pairs
    ORDER BY dist_sq, cust_a, cust_b
    LIMIT 20
    """,
)
def spatial_grid_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join (all point pairs within distance R) via the grid
    rewrite: assign each point its cell (x DIV R, y DIV R), replicate ONE
    side into the 3×3 neighboring cells, equi-join on the cell key, then
    refine with the exact integer distance predicate. Because cell size
    equals R, any pair within R shares a's 3×3 neighborhood with b's home
    cell — the candidate set is a superset by construction and the refine
    decides membership exactly; `a.k < b.k` keeps each unordered pair
    exactly once. Output: the 20 nearest pairs plus the total in-radius
    pair count. The oracle runs the naive quadratic theta-join.

    Scale: the naive form is a broadcast-nested-loop — O(N²) distance
    evaluations with no pruning; at 10⁹ points it never finishes. The
    grid form is an equi hash join: the build side replicates exactly 9×
    (data-independent), each probe touches one cell, so cost is
    O(9N + true_candidates·refine) and both sides shuffle ONCE on the
    cell key. Density skew (urban hotspots) concentrates a cell's
    candidates; the cell key is two-dimensional so AQE's skew split
    handles a hot cell the same way it splits any hot join key. The
    total-count column is a broadcast one-row cross join, not a second
    scan of the pair set."""
    pts = _points(spark, sf_dir)
    pairs = _radius_candidate_pairs(
        pts, F.col("cust_a") < F.col("cust_b")
    )
    pairs = pairs.localCheckpoint()
    total = pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
    return (
        pairs.crossJoin(F.broadcast(total))
        .orderBy("dist_sq", "cust_a", "cust_b")
        .limit(20)
    )


@register(
    "spatial_cell_density",
    category="spatial",
    oracle=f"""
    WITH pts AS ({_pts_sql()}),
    cells AS (
      SELECT x // {_CELL} AS cx, y // {_CELL} AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2
    ),
    sm AS (
      SELECT c.cx + dx.d AS cx, c.cy + dy.d AS cy,
             CAST(SUM(c.n) AS BIGINT) AS n_neighborhood
      FROM cells c,
           (VALUES (-1), (0), (1)) dx(d),
           (VALUES (-1), (0), (1)) dy(d)
      GROUP BY 1, 2
    )
    SELECT sm.cx, sm.cy,
           COALESCE(c2.n, 0) AS n_points,
           sm.n_neighborhood
    FROM sm LEFT JOIN cells c2 ON sm.cx = c2.cx AND sm.cy = c2.cy
    ORDER BY sm.n_neighborhood DESC, sm.cx, sm.cy
    LIMIT 15
    """,
)
def spatial_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hotspot scan: per-cell point counts smoothed over the 3×3
    neighborhood (kernel density with a box kernel on the grid), top 15
    cells by smoothed count. A cell with no points of its own still
    appears when its neighbors are dense — the left join back to the raw
    counts fills `n_points` with 0 there.

    Scale: the point-sized work is ONE partial-aggregated groupBy to
    cell grain; everything after operates on the CELL table (≤ (plane/
    cell)² rows regardless of point count — here 1600, at planet scale
    maybe 10⁸ for meter cells, still tiny next to the points). The
    smoothing is explode×9 + a second groupBy over cells, the final
    ranking a TakeOrdered. This shuffle-carries-cells-not-points
    structure is the same sketch-rollup discipline as the distinct/
    quantile rollups: aggregate early, move summaries."""
    pts = _points(spark, sf_dir)
    cells = (
        pts.groupBy(
            (F.col("x") / _CELL).cast("long").alias("cx"),
            (F.col("y") / _CELL).cast("long").alias("cy"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    sm = (
        cells.select("cx", "cy", "n", F.explode(offsets).alias("o"))
        .groupBy(
            (F.col("cx") + F.col("o.dx")).alias("cx"),
            (F.col("cy") + F.col("o.dy")).alias("cy"),
        )
        .agg(F.sum("n").alias("n_neighborhood"))
    )
    return (
        sm.join(cells.withColumnRenamed("n", "n_points"), ["cx", "cy"], "left")
        .select(
            "cx", "cy",
            F.coalesce("n_points", F.lit(0)).cast("long").alias("n_points"),
            "n_neighborhood",
        )
        .orderBy(F.col("n_neighborhood").desc(), "cx", "cy")
        .limit(15)
    )


@register(
    "spatial_knn_within_radius",
    category="spatial",
    oracle=f"""
    WITH pts AS ({_pts_sql()}),
    pairs AS (
      SELECT a.k AS cust_a, b.k AS cust_b,
             (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist_sq
      FROM pts a JOIN pts b ON a.k <> b.k
      WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_RADIUS_SQ}
    ),
    ranked AS (
      SELECT cust_a, cust_b, dist_sq,
             CAST(ROW_NUMBER() OVER (PARTITION BY cust_a
                                     ORDER BY dist_sq, cust_b) AS BIGINT)
               AS rk
      FROM pairs
    )
    SELECT cust_a, rk, cust_b, dist_sq
    FROM ranked WHERE rk <= 3
    ORDER BY cust_a, rk
    LIMIT 60
    """,
)
def spatial_knn_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-nearest-neighbor join: each point's 3 nearest neighbors
    WITHIN radius R — the per-point form of the radius self-join
    (store-to-nearest-competitors, sensor-to-calibration-peers). The
    radius bound is what keeps a grid kNN exact: candidates beyond one
    cell ring cannot be within R, so the 3×3 replication join is a
    complete candidate set and the per-point top-3 is a WindowGroupLimit
    over it (rank pushed into the shuffle, no global sort). An unbounded
    kNN would need expanding ring probes; bounding by R is the standard
    scale-out contract (and what a real catchment analysis wants anyway).

    Scale: identical join cost to spatial_grid_neighbors (one shuffle on
    the cell key, 9× bounded replication) plus one per-point window over
    in-radius candidates only — never over the point set. Output is
    TakeOrdered-limited for the report."""
    pts = _points(spark, sf_dir)
    pairs = _radius_candidate_pairs(
        pts, F.col("cust_a") != F.col("cust_b")
    )
    from pyspark.sql import Window as W

    wk = W.partitionBy("cust_a").orderBy("dist_sq", "cust_b")
    return (
        pairs.withColumn("rk", F.row_number().over(wk).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("cust_a", "rk", "cust_b", "dist_sq")
        .orderBy("cust_a", "rk")
        .limit(60)
    )


# ---------------------------------------------------------------------------
# Grid DBSCAN (density-based clustering over cells)
# ---------------------------------------------------------------------------

#: hotspot compression: every 4th customer is mapped into a 120x120 box
#: (a synthetic downtown) so the plane has genuine density contrast at
#: every scale factor — uniform scatter alone never clusters
_HOT_MOD = 4
_HOT_BOX = 120
_HOT_X0, _HOT_Y0 = 400, 300
#: total cells on the fixed plane — the denominator of the adaptive
#: density threshold (dense iff n > 2x the global mean, floor 2)
_CELLS_TOTAL = (_PLANE // _CELL) * (_PLANE // _CELL)
_GRID_W = _PLANE // _CELL


def _points_hotspot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _points(spark, sf_dir)
    hot = F.col("k") % _HOT_MOD == 0
    return p.select(
        "k",
        F.when(hot, _HOT_X0 + F.col("x") % _HOT_BOX).otherwise(F.col("x")).alias("x"),
        F.when(hot, _HOT_Y0 + F.col("y") % _HOT_BOX).otherwise(F.col("y")).alias("y"),
    )


def _pts_hotspot_sql() -> str:
    return f"""
      SELECT k,
             CASE WHEN k % {_HOT_MOD} = 0
                  THEN {_HOT_X0} + x % {_HOT_BOX} ELSE x END AS x,
             CASE WHEN k % {_HOT_MOD} = 0
                  THEN {_HOT_Y0} + y % {_HOT_BOX} ELSE y END AS y
      FROM ({_pts_sql()})
    """


_DBSCAN_ORACLE = f"""
    WITH RECURSIVE pts AS ({_pts_hotspot_sql()}),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM pts),
    cells AS (
      SELECT x // {_CELL} AS cx, y // {_CELL} AS cy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2
    ),
    dense AS (
      SELECT cx, cy, cx * {_GRID_W} + cy AS cid, n
      FROM cells, tot
      WHERE n >= GREATEST(2, (2 * n_total) // {_CELLS_TOTAL} + 1)
    ),
    edges AS (
      SELECT a.cid AS u, b.cid AS v
      FROM dense a JOIN dense b
        ON ABS(a.cx - b.cx) <= 1 AND ABS(a.cy - b.cy) <= 1
       AND a.cid <> b.cid
    ),
    closure(a, b) AS (
      SELECT cid, cid FROM dense
      UNION
      SELECT c.a, e.v FROM closure c JOIN edges e ON c.b = e.u
    ),
    labeled AS (
      SELECT a AS cid, MIN(b) AS cluster_id FROM closure GROUP BY a
    ),
    clus AS (
      SELECT l.cluster_id,
             CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(d.n) AS BIGINT) AS n_points
      FROM labeled l JOIN dense d ON d.cid = l.cid
      GROUP BY l.cluster_id
    ),
    noise AS (
      SELECT CAST(COALESCE(SUM(c.n), 0) AS BIGINT) AS n_noise
      FROM cells c, tot
      WHERE c.n < GREATEST(2, (2 * n_total) // {_CELLS_TOTAL} + 1)
    )
    SELECT cluster_id, n_cells, n_points,
           (SELECT n_noise FROM noise) AS n_noise_total
    FROM clus
    ORDER BY n_points DESC, cluster_id
    LIMIT 20
"""


@register("spatial_dbscan_grid", category="spatial", oracle=_DBSCAN_ORACLE)
def spatial_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid DBSCAN: density-based clustering where the clustering loop
    runs over CELLS, never points. Points are bucketed once into
    R-sized cells; a cell is dense iff its count exceeds max(2, 2x the
    global mean) — an adaptive threshold, so the density CONTRAST (the
    hotspot box vs the uniform background) decides, not an absolute
    count that breaks at the next scale factor; clusters are connected
    components of 8-adjacent dense cells (labels = component min via
    the shared large-star/small-star contraction); points in non-dense
    cells are noise. This is the cell-based DBSCAN approximation used
    at scale (GriT-DBSCAN family): core-cell clustering without
    per-point eps-neighborhood queries.

    Scale: the points table is touched EXACTLY ONCE (one
    map-side-combinable groupBy into cells). Everything after operates
    on at most {c} cells — a quantity fixed by the plane, independent
    of the point count — so the CC loop's joins are driver-trivial at
    any data size; the adjacency join replicates nothing (it's a
    bounded self-join on a <= {c}-row table, broadcast under AQE), and
    the adaptive threshold is a broadcast one-row cross join, not a
    collected scalar. The oracle replays the component closure with
    WITH RECURSIVE over the same dense-cell graph."""
    pts = _points_hotspot(spark, sf_dir)
    cells = (
        pts.groupBy(
            (F.col("x") / _CELL).cast("long").alias("cx"),
            (F.col("y") / _CELL).cast("long").alias("cy"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    tot = cells.agg(F.sum("n").alias("n_total"))
    thr = F.greatest(
        F.lit(2).cast("bigint"),
        F.expr(f"CAST((2 * n_total) DIV {_CELLS_TOTAL} + 1 AS BIGINT)"),
    )
    withthr = cells.crossJoin(tot)
    dense = (
        withthr.filter(F.col("n") >= thr)
        .select(
            "cx", "cy", (F.col("cx") * _GRID_W + F.col("cy")).alias("cid"), "n"
        )
        .localCheckpoint()
    )
    noise = withthr.filter(F.col("n") < thr).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_noise_total")
    )
    a, b = dense.alias("a"), dense.alias("b")
    pairs = (
        a.join(
            b,
            (F.abs(F.col("a.cx") - F.col("b.cx")) <= 1)
            & (F.abs(F.col("a.cy") - F.col("b.cy")) <= 1)
            & (F.col("a.cid") < F.col("b.cid")),
        )
        .select(F.col("a.cid").alias("id1"), F.col("b.cid").alias("id2"))
    )
    from .dedup import connected_components

    labeled = connected_components(pairs).select(
        F.col("doc_id").alias("cid"), F.col("cluster_id")
    )
    full = dense.join(labeled, "cid", "left").select(
        F.coalesce(F.col("cluster_id"), F.col("cid")).alias("cluster_id"),
        "n",
    )
    clus = full.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("n").cast("bigint").alias("n_points"),
    )
    return (
        clus.crossJoin(noise)
        .orderBy(F.col("n_points").desc(), "cluster_id")
        .limit(20)
    )


spatial_dbscan_grid.__doc__ = spatial_dbscan_grid.__doc__.replace(
    "{c}", str(_CELLS_TOTAL)
)
