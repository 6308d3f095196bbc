"""Similarity search over the ``embeddings`` table (array<float> column):
brute-force cosine top-k (exact baseline), random-hyperplane LSH and IVF
(the 100 TB scale paths).

Everything is built-in DataFrame ops — dot products are `zip_with` +
`aggregate` folds (JVM codegen), never per-row Python. The exact top-k
has a DuckDB oracle (identical decimal-exact arithmetic); the ANN
variants are approximate by construction, so their registered queries are
*recall verdicts* (same pattern as ``agg_approx_distinct``): the query
emits the exact brute-force top-k — which the SQL oracle reproduces
hash-exactly — plus a ``recall_ok`` boolean computed in Spark (ANN hits
over exact pairs >= the test-pinned floor) that the oracle asserts as
literal TRUE. An ANN variant whose recall degrades turns its driver row
red instead of hiding behind a rows-only check. The raw ANN functions
remain the engine API and are additionally recall-tested in
tests/test_similarity.py.

Scale design:
- brute force: broadcast the (small) query set against the full table —
  one scan, no shuffle of the big side; per-partition top-k via the
  window group-limit pushdown.
- LSH: bucket vectors by sign-bit signatures (4 tables × 8 hyperplanes);
  the candidate join is an equi-join on bucket keys — O(tables·N) rows.
- IVF: assign vectors to a BOUNDED seed-centroid set (one broadcast
  join; centroid count capped at IVF_MAX_CENTROIDS so the assignment
  pass is O(N*K), linear in the corpus), queries probe the nearest
  `NPROBE` cells — the classic inverted-file layout; at 100 TB the
  cell assignment becomes the partitioning key so probes touch only
  matching partitions, and hot cells sub-split by hash at layout time
  (SemDeDup's capped-cluster template, dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vector import dot_exact as _dot
from ..functions.vector import dot_fixed, sql_cosine, sql_cosine_fixed, sql_dot
from ..registry import register
from ._helpers import t

TOPK = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
LSH_TABLES = 8
LSH_PLANES_PER_TABLE = 6
LSH_MULTIPROBE = True  # probe hamming-1 neighbor buckets on the query side
IVF_CENTROID_STRIDE = 50  # minimum seed stride (small-corpus floor)
# Hard cap on the centroid count: the coarse quantizer's size must NOT
# grow with the corpus, or (a) centroid assignment becomes
# O(N * N/stride) dot products and (b) the broadcast centroid table
# itself grows linearly and eventually OOMs the driver/executors — the
# round-3 bench measured exactly that (sim_topk_ivfpq slope 14.9x at
# 10x data under the old unbounded `vec_id % 50` seeding). With a
# fixed K the assignment pass is O(N*K) — linear in the corpus — and
# the broadcast is constant-size. Production deployments tune K (FAISS
# guidance ~sqrt(N), still bounded in practice); skewed/hot cells are
# handled at layout time by hash sub-splitting oversized cells, the
# same template as SemDeDup's capped clusters (dedup.py:1131-1147).
IVF_MAX_CENTROIDS = 64
IVF_NPROBE = 3

# Recall floors for the registered verdict queries — identical to the
# assertions in tests/test_similarity.py (this testdata's embeddings are
# near-uniform, the adversarial case for every ANN family, so the floors
# are "meaningfully better than random", not production-recall claims).
LSH_MIN_RECALL = 0.2
IVF_MIN_RECALL = 0.2
PQ_MIN_RECALL = 0.2
IVFPQ_MIN_RECALL = 0.1


def with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    return df.withColumn("norm", F.sqrt(_dot(F.col(vec), F.col(vec))))


def _ivf_stride(n_vectors: int) -> int:
    """Seed stride bounding the centroid count at IVF_MAX_CENTROIDS:
    ``max(IVF_CENTROID_STRIDE, ceil(N / K_MAX))`` — integer arithmetic so
    the DuckDB oracle (same formula via GREATEST + ``//``) derives the
    bit-identical centroid set. Small corpora keep the historical
    stride-50 seeding; large corpora get a K-capped quantizer."""
    return max(IVF_CENTROID_STRIDE, -(-int(n_vectors) // IVF_MAX_CENTROIDS))


def ivf_centroids(e: DataFrame, n_vectors: int | None = None) -> DataFrame:
    """Bounded IVF seed-centroid set: (centroid_id, cent_emb), at most
    ~IVF_MAX_CENTROIDS rows regardless of corpus size. The count() is a
    driver control-plane scalar (one columnar row-count scan) that sizes
    the stride; pass ``n_vectors`` when the caller already holds the
    corpus count so the sizing pass runs once per query, not once per
    helper call. The resulting table is always broadcast-safe."""
    stride = _ivf_stride(e.count() if n_vectors is None else n_vectors)
    return e.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cent_emb")
    )


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = TOPK
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, rank per query.
    Returns (query_id, neighbor_id, cosine, rank)."""
    q = with_norm(queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    c = with_norm(corpus).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def rerank_exact(pairs: "DataFrame", e: "DataFrame", k: int = TOPK) -> "DataFrame":
    """Exact cosine re-rank of an ANN shortlist: (query_id, neighbor_id)
    candidate pairs → (query_id, neighbor_id, cosine, rank ≤ k). The
    finish line shared by the PQ / IVF-PQ / Matryoshka / binary-hamming
    / SQ8 paths — shortlist CONSTRUCTION is each family's own business,
    but the exact re-rank (norms folded once, broadcast query side,
    deterministic (cosine desc, neighbor asc) tie-break, bigint rank)
    lives exactly once so a tie-break or cast fix cannot drift between
    copies (r4 self-review: eight near-identical blocks, one of which
    had already lost the bigint cast)."""
    qn = with_norm(e.filter(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    cn = with_norm(e).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_norm") * F.col("c_norm")
    )
    w_rank = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.join(cn, "neighbor_id")
        .join(F.broadcast(qn), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


# Exact brute-force top-k in SQL — the oracle for sim_topk_bruteforce and
# the exact half of every ANN recall-verdict oracle below.
_SQL_BF_INNER = f"""
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {sql_cosine('q.embedding', 'c.embedding')} AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {sql_cosine('q.embedding', 'c.embedding')} DESC, c.vec_id ASC
             ) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}
"""

_SQL_BF_TOPK = f"""
    SELECT query_id, neighbor_id, cosine, rank FROM ({_SQL_BF_INNER})
    WHERE rank <= {TOPK}
    ORDER BY query_id, rank
"""

# ANN verdict oracle: the exact top-k (hash-matched cross-engine) plus the
# recall claim as literal TRUE — Spark computes the actual boolean.
_SQL_RECALL_VERDICT = f"""
    SELECT query_id, neighbor_id, cosine, rank, TRUE AS recall_ok
    FROM ({_SQL_BF_INNER})
    WHERE rank <= {TOPK}
    ORDER BY query_id, rank
"""


def recall_verdict(ann: DataFrame, exact: DataFrame, min_recall: float) -> DataFrame:
    """Exact top-k rows + an aggregate ANN-recall verdict column.

    ANN buckets are hash-seeded and engine-specific, so the raw ANN rows
    can never hash-match a SQL oracle. The oracle-checkable facts are
    (a) the exact brute-force top-k, reproduced by ``_SQL_RECALL_VERDICT``
    decimal-exactly, and (b) the claim "ANN recall >= min_recall",
    computed here in Spark and emitted as a constant boolean the oracle
    pins to TRUE (the ``agg_approx_distinct`` bounded-error pattern).

    The verdict aggregate runs through a single-partition window over
    exactly N_QUERIES*TOPK rows (a few dozen, constant in data size), so
    no data-sized frame ever collapses to one partition."""
    flags = exact.join(
        ann.select("query_id", "neighbor_id").withColumn("in_ann", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    w_all = W.partitionBy(F.lit(1))
    caught = F.sum(F.coalesce(F.col("in_ann"), F.lit(0))).over(w_all)
    total = F.count(F.lit(1)).over(w_all)
    return (
        flags.withColumn(
            "recall_ok", caught.cast("double") >= F.lit(min_recall) * total
        )
        .select("query_id", "neighbor_id", "cosine", "rank", "recall_ok")
        .orderBy("query_id", "rank")
    )


def exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    return brute_force_topk(e.filter(F.col("vec_id") < N_QUERIES), e)


@register(
    "sim_topk_bruteforce",
    category="similarity",
    oracle=_SQL_BF_TOPK,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return brute_force_topk(queries, e).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------


def _hyperplane_sign(vec: Column, table: int, plane: int) -> Column:
    """sign(v · h) for the pseudo-random ±1 hyperplane h derived from
    xxhash64 — deterministic, seedless, no stored plane matrix."""
    dim_sign = lambda d: F.when(  # noqa: E731
        F.xxhash64(F.lit(f"plane:{table}:{plane}:"), d).bitwiseAND(F.lit(1)) == 1, 1.0
    ).otherwise(-1.0)
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda x, d: x.cast("double") * dim_sign(d),
        ),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    return (proj > 0).cast("int")


def lsh_buckets(df: DataFrame, vec: str = "embedding") -> DataFrame:
    """(vec_id, table_id, bucket) — one row per hash table; bucket is the
    packed sign-bit signature of the table's hyperplanes.

    r10 (guide §7.2/§3.3 — plan size is a real cost, the same fix as the
    PQ `_sub_l2_all` tree): the previous shape instantiated the
    `_hyperplane_sign` aggregate/zip_with tree once per (table, plane) —
    48 copies that Catalyst re-analyzes on every optimizer pass, making
    this query planning-bound. This form carries ONE nested
    lambda-indexed tree (tables × planes from lambda variables). The
    hash input is the identical string `plane:{t}:{p}:` built by concat,
    so every sign bit — and therefore every bucket, candidate set, and
    recall — is bit-identical to the unrolled form (pinned by
    tests/test_similarity.py's equivalence test). Bucket packing uses
    Horner form over a descending plane sequence, which equals the
    shiftleft sum exactly in integer arithmetic."""
    v = F.col(vec)

    def sign(ti: Column, pi: Column) -> Column:
        seed = F.concat(
            F.lit("plane:"),
            ti.cast("string"),
            F.lit(":"),
            pi.cast("string"),
            F.lit(":"),
        )
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, d: x.cast("double")
                * F.when(
                    F.xxhash64(seed, d).bitwiseAND(F.lit(1)) == 1, 1.0
                ).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
        return (proj > 0).cast("int")

    tb = F.transform(
        F.sequence(F.lit(0), F.lit(LSH_TABLES - 1)),
        lambda ti: F.struct(
            ti.cast("int").alias("table_id"),
            F.aggregate(
                F.sequence(
                    F.lit(LSH_PLANES_PER_TABLE - 1), F.lit(0), F.lit(-1)
                ),
                F.lit(0),
                lambda acc, pi: acc * 2 + sign(ti, pi),
            ).alias("bucket"),
        ),
    )
    return df.select("vec_id", F.explode(tb).alias("tb")).select(
        "vec_id", "tb.table_id", "tb.bucket"
    )


@register(
    "sim_topk_lsh",
    category="similarity",
    oracle=_SQL_RECALL_VERDICT,
    doc="ANN top-k via random-hyperplane LSH: 8 tables × 6 sign bits with "
    "hamming-1 multi-probe on the query side; candidates share a bucket "
    "in ≥1 table; exact cosine re-rank on candidates. Registered as a "
    "recall verdict: exact top-k (hash-matched vs DuckDB) + recall_ok "
    "computed in Spark, TRUE in the oracle. "
    "NOTE: this testdata's embeddings are near-uniform (max pair cosine "
    "≈0.48), the adversarial case for LSH — multi-probe is what keeps "
    "recall usable; on clustered real embeddings fewer probes suffice.",
)
def sim_topk_lsh_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recall_verdict(
        sim_topk_lsh(spark, sf_dir), exact_topk(spark, sf_dir), LSH_MIN_RECALL
    )


def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    buckets = lsh_buckets(e)
    q_exact = buckets.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table_id", "bucket"
    )
    if LSH_MULTIPROBE:
        # Expand each query bucket to itself + all hamming-1 variants.
        probe_set = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << p))
                for p in range(LSH_PLANES_PER_TABLE)
            ],
        )
        q_buckets = q_exact.select(
            "query_id", "table_id", F.explode(probe_set).alias("bucket")
        )
    else:
        q_buckets = q_exact
    candidates = (
        F.broadcast(q_buckets)
        .join(
            buckets.select(
                F.col("vec_id").alias("neighbor_id"), "table_id", "bucket"
            ),
            ["table_id", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    e_named = with_norm(e)
    q = e_named.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    c = e_named.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted file)
# ---------------------------------------------------------------------------


@register(
    "sim_topk_ivf",
    category="similarity",
    oracle=_SQL_RECALL_VERDICT,
    doc="ANN top-k via IVF: bounded seed-centroid set (stride-sampled, "
    "count capped at IVF_MAX_CENTROIDS so assignment stays O(N*K) and "
    "the broadcast constant-size), one broadcast-join assignment pass, "
    "queries probe the 3 nearest cells. Registered as a recall verdict "
    "(exact top-k hash-matched, recall_ok pinned TRUE by the oracle).",
)
def sim_topk_ivf_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recall_verdict(
        sim_topk_ivf(spark, sf_dir), exact_topk(spark, sf_dir), IVF_MIN_RECALL
    )


def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    centroids = ivf_centroids(e)
    # Assignment: nearest centroid per vector (broadcast centroids — the
    # only pass over the full table; at scale this keys the layout).
    # _assign_nearest's max(struct) aggregate partial-combines map-side;
    # the old window variant here shuffled the full N·k candidate
    # relation on vec_id for the identical winner (r4 self-review).
    assigned = _assign_nearest(e, centroids)
    # Queries probe their NPROBE nearest cells.
    q = e.filter(F.col("vec_id") < N_QUERIES)
    w_probe = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.join(F.broadcast(centroids))
        .select(
            F.col("vec_id").alias("query_id"),
            "centroid_id",
            _dot(F.col("embedding"), F.col("cent_emb")).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("query_id", "centroid_id")
    )
    qn = with_norm(q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    cn = with_norm(assigned).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
        "centroid_id",
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
    w_rank = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(probes)
        .join(cn, "centroid_id")
        .join(F.broadcast(qn), "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= TOPK)
        .orderBy("query_id", "rank")
    )


@register(
    "embedding_norm_stats",
    category="vector",
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           SQRT(CAST(list_sum(list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                     AS DECIMAL(28,12)))) AS DOUBLE)) AS l2_norm,
           list_max(list_transform(embedding,
                x -> ABS(CAST(x AS DOUBLE)))) AS max_abs
    FROM embeddings
    ORDER BY vec_id
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector norm statistics — the validation pass every embedding
    pipeline runs before indexing (catch zero/NaN/denormal vectors).
    Single scan, all JVM-side array folds, no shuffle (ORDER BY is the
    presentation sort only; at scale you'd drop it or write partitioned)."""
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return (
        e.select(
            "vec_id",
            "label",
            F.size(emb).cast("bigint").alias("dim"),  # len() in SQL is bigint
            F.sqrt(_dot(emb, emb)).alias("l2_norm"),
            F.array_max(F.transform(emb, lambda x: F.abs(x.cast("double")))).alias(
                "max_abs"
            ),
        )
        .orderBy("vec_id")
    )


@register(
    "embedding_avg_pool",
    category="vector",
    oracle="""
    SELECT label, CAST(pos AS INTEGER) AS pos,
           CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*) AS avg_val
    FROM (
      SELECT label,
             unnest(embedding) AS val,
             unnest(range(len(embedding))) AS pos
      FROM embeddings
    )
    GROUP BY label, pos
    ORDER BY label, pos
    """,
)
def embedding_avg_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average pooling per label — the class-centroid / group-embedding
    primitive (mean vector per group). posexplode → groupBy(label, pos)
    with order-independent decimal-quantized sums (scale 6: the
    double->decimal boundary-crossing hazard of the inexact v*10^s
    multiply is ~1e-12 per value there, vs ~1e-6 at scale 12); one
    shuffle of (label, pos, partial) rows.
    At 100 TB the shuffle carries labels × dim partials per map task
    (partial aggregation), independent of row count — centroids of a
    billion vectors cost the same shuffle as a million."""
    e = t(spark, sf_dir, "embeddings")
    exploded = e.select("label", F.posexplode("embedding").alias("pos", "val"))
    return (
        exploded.groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("val").cast("double").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_val")
        )
        .orderBy("label", "pos")
    )


@register(
    "embedding_quantize_int8",
    category="vector",
    oracle="""
    WITH b AS (
      SELECT vec_id,
             list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mn,
             list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mx,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    )
    SELECT vec_id, mn AS offset, (mx - mn) / 255.0 AS scale,
           CAST(LEN(v) AS INT) AS dim,
           list_transform(v, x -> CAST(LEAST(FLOOR(
             (x - mn) / ((mx - mn) / 255.0) + 0.5), 255) AS INT)) AS q,
           list_max(list_transform(v, x -> ABS(x - (mn +
             CAST(LEAST(FLOOR((x - mn) / ((mx - mn) / 255.0) + 0.5), 255)
                  AS INT) * ((mx - mn) / 255.0))))) AS max_recon_err
    FROM b ORDER BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization (the 4x compression every
    vector store applies before indexing): affine-map each dimension to
    0..255 against the vector's own min/max, and report the max
    reconstruction error. All arithmetic is FLOOR(x + 0.5) on doubles —
    identical binary ops in both engines (ROUND(double) is not
    cross-engine stable; floor is). Single scan, per-row lambdas, no
    shuffle — embarrassingly parallel at any scale."""
    e = t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select(
        "vec_id",
        v.alias("v"),
        F.array_min(v).alias("mn"),
        F.array_max(v).alias("mx"),
    )
    scale = (F.col("mx") - F.col("mn")) / 255.0
    qexpr = F.expr(
        "transform(v, x -> CAST(LEAST(FLOOR((x - mn) / ((mx - mn) / 255.0) + 0.5),"
        " 255) AS INT))"
    )
    recon = F.expr(
        "array_max(transform(v, x -> ABS(x - (mn + "
        "CAST(LEAST(FLOOR((x - mn) / ((mx - mn) / 255.0) + 0.5), 255) AS INT)"
        " * ((mx - mn) / 255.0)))))"
    )
    return (
        base.select(
            "vec_id",
            F.col("mn").alias("offset"),
            scale.alias("scale"),
            F.size("v").alias("dim"),  # oracle emits INT32 here
            qexpr.alias("q"),
            recon.alias("max_recon_err"),
        )
        .orderBy("vec_id")
    )


def _assign_nearest(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding, centroid_id): nearest centroid by dot product
    (broadcast centroids, deterministic tie-break on centroid_id).

    Argmax via `max(struct(sim, -centroid_id))`: struct ordering
    compares the exact-decimal similarity first, then the negated id —
    identical winner to ORDER BY sim DESC, centroid_id ASC — and the
    aggregate partial-combines map-side, so the N·k candidate relation
    reduces before its exchange instead of window-sorting through it
    (the window variant shuffled every candidate row)."""
    sim = _dot(F.col("embedding"), F.col("cent_emb"))
    return (
        vectors.join(F.broadcast(centroids))
        .select(
            "vec_id",
            "embedding",
            F.struct(
                sim.alias("sim"), (-F.col("centroid_id")).alias("neg_id")
            ).alias("cand"),
        )
        .groupBy("vec_id", "embedding")
        .agg(F.max("cand").alias("best"))
        .select(
            "vec_id", "embedding", (-F.col("best.neg_id")).alias("centroid_id")
        )
    )


def kmeans_centroids(
    vectors: DataFrame, seed_stride: int | None = None, iters: int = 2
) -> DataFrame:
    """Lloyd's k-means on DataFrames: seed from a deterministic stride,
    then iterate assign (broadcast join + per-vector top-1) → re-center
    (posexplode + decimal-exact mean per (centroid, pos) → rebuild the
    array ordered by position). Returns (centroid_id, cent_emb).

    Scale: each iteration is one broadcast-assign pass over the corpus
    and one shuffle of (centroid, pos, partial) rows — the shuffle
    volume is centroids × dim per map task (partial aggregation), not
    corpus-sized. The iteration count is a small constant (k-means for
    IVF is about balanced cells, not convergence); each hop materializes
    through the aggregate, so lineage stays linear, no cache churn.
    Determinism: decimal-exact means and the stride seeding make every
    round's centroids bit-identical at any partition count. K is bounded
    (seed_stride=None derives the IVF_MAX_CENTROIDS-capped stride) so
    both the assign pass (O(N*K)) and the re-center shuffle (K x dim
    partials) stay linear in the corpus."""
    if seed_stride is None:
        seed_stride = _ivf_stride(vectors.count())
    cents = vectors.filter(F.col("vec_id") % seed_stride == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cent_emb")
    )
    for _ in range(iters):
        assigned = _assign_nearest(vectors, cents)
        means = (
            assigned.select("centroid_id", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("centroid_id", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("double").cast("decimal(18,6)")).cast(
                        "double"
                    )
                    / F.count(F.lit(1))
                ).alias("m")
            )
        )
        cents = (
            means.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("m")))
                    ),
                    lambda s: s["m"].cast("float"),
                ).alias("cent_emb")
            )
        )
    return cents


@register(
    "sim_topk_ivf_kmeans",
    category="similarity",
    oracle=_SQL_RECALL_VERDICT,
    doc="ANN top-k via IVF with k-means-trained centroids (2 Lloyd "
    "iterations from stride seeds). Registered as a recall verdict "
    "(exact top-k hash-matched, recall_ok pinned TRUE by the oracle); "
    "tests additionally assert trained recall >= the seed variant's.",
)
def sim_topk_ivf_kmeans_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recall_verdict(
        sim_topk_ivf_kmeans(spark, sf_dir), exact_topk(spark, sf_dir), IVF_MIN_RECALL
    )


def sim_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim_topk_ivf with trained centroids: Lloyd iterations tighten the
    cells around the data's actual clusters, which raises recall at the
    same nprobe (equivalently: allows lower nprobe at the same recall —
    the knob that matters when each probed cell is a partition-pruned
    read of a 100 TB index layout)."""
    e = t(spark, sf_dir, "embeddings")
    centroids = kmeans_centroids(e, iters=2)
    assigned = _assign_nearest(e, centroids)
    q = e.filter(F.col("vec_id") < N_QUERIES)
    w_probe = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.join(F.broadcast(centroids))
        .select(
            F.col("vec_id").alias("query_id"),
            "centroid_id",
            _dot(F.col("embedding"), F.col("cent_emb")).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("query_id", "centroid_id")
    )
    qn = with_norm(q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    cn = with_norm(assigned).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
        "centroid_id",
    )
    cos = _dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
    w_rank = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(probes)
        .join(cn, "centroid_id")
        .join(F.broadcast(qn), "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= TOPK)
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011): compress each vector to M
# sub-codes (here 8 subspaces × 16 codewords = 8 bytes per 64-d float
# vector, a 32× compression) and search with asymmetric distance
# computation (ADC) — the memory-side scale path that composes with IVF.
# The codebook is the K lowest-vec_id vectors (deterministic, no RNG),
# so encode/decode is decimal-exact and the codes have a DuckDB oracle.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces over the 64-d embedding
PQ_SUBDIM = 8  # dims per subspace
PQ_K = 16  # codewords per subspace
PQ_RERANK = 50  # ADC shortlist size before exact re-rank

_PQ_ACC = "decimal(30,12)"


def _sub_l2_exact(u: Column, v: Column, m: int) -> Column:
    """Exact squared L2 distance between subvectors m of two float
    arrays: per-element diff in double (bit-identical in any engine),
    squared, cast DECIMAL(28,12), summed exactly. Stays decimal so
    argmin comparisons are exact; cast to double only for output."""
    lo = m * PQ_SUBDIM + 1
    diff2 = lambda x, y: (  # noqa: E731
        (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    ).cast("decimal(28,12)")
    return F.aggregate(
        F.zip_with(
            F.slice(u, lo, PQ_SUBDIM), F.slice(v, lo, PQ_SUBDIM), diff2
        ),
        F.lit(0).cast(_PQ_ACC),
        lambda acc, z: (acc + z).cast(_PQ_ACC),
    )


def _sub_l2_all(u: Column, v: Column) -> Column:
    """All PQ_M exact per-subspace L2 distances as ONE array<decimal>
    expression — a lambda-indexed `transform(sequence(0, M-1), m -> …)`
    whose slice bounds come from the lambda variable.

    r9 (guide §7.2/§3.3 — plan size is a real cost): the previous shape
    instantiated _sub_l2_exact's zip_with/aggregate/decimal tree once
    PER SUBSPACE (8 copies, wrapped in when/coalesce or 8 aggregates),
    and Catalyst re-analyzes every copy on every optimizer pass — the
    PQ queries spent more wall time planning than executing at sf0.1.
    This form carries ONE copy; per-element decimal arithmetic is the
    identical expression chain, so distances are bit-equal (verified
    row-by-row for codes and query distance tables at sf0.1).
    Plan-build for pq_encode: 1.59 -> 0.59 s; execution also drops
    (2.48 -> 1.69 s noop) because codegen compiles one lambda body."""
    diff2 = lambda x, y: (  # noqa: E731
        (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    ).cast("decimal(28,12)")
    return F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda m: F.aggregate(
            F.zip_with(
                F.slice(u, m * PQ_SUBDIM + 1, PQ_SUBDIM),
                F.slice(v, m * PQ_SUBDIM + 1, PQ_SUBDIM),
                diff2,
            ),
            F.lit(0).cast(_PQ_ACC),
            lambda acc, z: (acc + z).cast(_PQ_ACC),
        ),
    )


def _sql_sub_l2(u: str, v: str, m: int) -> str:
    lo, hi = m * PQ_SUBDIM + 1, (m + 1) * PQ_SUBDIM
    return (
        f"CAST(list_sum(list_transform("
        f"list_zip(list_slice({u}, {lo}, {hi}), list_slice({v}, {lo}, {hi})), "
        f"x -> CAST((CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * "
        f"(CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) AS DECIMAL(28,12))))"
        f" AS DECIMAL(30,12))"
    )


def pq_codebook(e: DataFrame) -> DataFrame:
    """(k, cb_emb): the PQ codebook — K lowest-vec_id vectors, k = rank.
    Deterministic stand-in for k-means codewords (swap in
    kmeans_centroids per subspace when cross-engine determinism is not
    needed); K rows total, always broadcastable."""
    w = W.orderBy("vec_id")
    return (
        e.orderBy("vec_id")
        .limit(PQ_K)
        .withColumn("k", F.row_number().over(w) - 1)
        .select("k", F.col("embedding").alias("cb_emb"))
    )


def pq_encode(e: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, m, code, dist): per-subspace nearest codeword (exact
    decimal argmin, tie-break on k). One broadcast join against K rows,
    then `min(struct(dist, k))` — struct ordering compares the exact
    decimal first, k second, so the argmin is deterministic AND the
    aggregate partial-combines map-side.

    r9 shape (guide §2.3 "shuffle fewer bytes" / §1.2 per-task work):
    the join emits N·K rows and each row computes all PQ_M subspace
    distances into PQ_M parallel min-struct aggregates — versus the
    previous explode-m-first form whose join emitted N·M·K rows, each
    dispatching a coalesce over M when-branches to recover which
    subspace it was. 8× fewer joined rows, no branch dispatch, and the
    map-side partials shrink from (N·M groups × K rows) to (N groups,
    M structs); the per-subspace argmin decimals are computed by the
    identical _sub_l2_exact expressions, so codes and dists are
    bit-identical (equality over all 16k (vec, m) rows verified at
    sf0.1 against the previous form)."""
    # darr is computed once per joined row in the projection BELOW the
    # aggregate (aggregate expressions reference the attribute, so
    # CollapseProject cannot inline the lambda tree 8×)
    bests = (
        e.join(F.broadcast(codebook))
        .select(
            "vec_id",
            "k",
            _sub_l2_all(F.col("embedding"), F.col("cb_emb")).alias("darr"),
        )
        .groupBy("vec_id")
        .agg(
            *[
                F.min(
                    F.struct(
                        F.element_at("darr", m + 1).alias("dist"),
                        F.col("k"),
                    )
                ).alias(f"b{m}")
                for m in range(PQ_M)
            ]
        )
    )
    per_sub = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.col(f"b{m}.k").alias("code"),
                F.col(f"b{m}.dist").alias("dist"),
            )
            for m in range(PQ_M)
        ]
    )
    return bests.select("vec_id", F.explode(per_sub).alias("x")).select(
        "vec_id",
        F.col("x.m").alias("m"),
        F.col("x.code").alias("code"),
        F.col("x.dist").alias("dist"),
    )


_PQ_DIST_CASES = " ".join(
    f"WHEN {m} THEN {_sql_sub_l2('v.embedding', 'c.cb_emb', m)}"
    for m in range(PQ_M)
)

_PQ_ENCODE_SQL = f"""
    cb AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS k,
             embedding AS cb_emb
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {PQ_K})
    ),
    sub AS (
      SELECT vec_id, embedding, unnest(generate_series(0, {PQ_M - 1})) AS m
      FROM embeddings
    ),
    scored AS (
      SELECT v.vec_id, v.m, c.k,
             CASE v.m {_PQ_DIST_CASES} END AS dist,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id, v.m
               ORDER BY CASE v.m {_PQ_DIST_CASES} END ASC, c.k ASC
             ) AS rn
      FROM sub v CROSS JOIN cb c
    ),
    codes AS (
      SELECT vec_id, m, k AS code, dist FROM scored WHERE rn = 1
    )"""


@register(
    "embedding_pq_codes",
    category="similarity",
    oracle=f"""
    WITH {_PQ_ENCODE_SQL}
    SELECT vec_id,
           list_transform(
             list_sort(list_zip(list(m), list(code))), x -> CAST(x[2] AS INT)
           ) AS codes,
           CAST(SUM(dist) AS DOUBLE) AS recon_err
    FROM codes
    GROUP BY vec_id
    ORDER BY vec_id
    """,
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (Jégou et al. 2011): each 64-d
    vector becomes 8 sub-codes (nearest of 16 codewords per 8-d
    subspace) plus the total quantization error — 8 bytes instead of
    256, the compression that lets a 100 TB embedding corpus fit its
    ANN index in executor memory. Encode is one broadcast join against
    the K-row codebook and a per-(vector, subspace) exact-decimal
    argmin; nothing corpus-sized shuffles. The deterministic codebook
    (K lowest-vec_id vectors) makes the codes bit-stable cross-engine —
    the oracle replays the identical argmin in DuckDB."""
    e = t(spark, sf_dir, "embeddings")
    codes = pq_encode(e, pq_codebook(e))
    return (
        codes.groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("m", "code"))),
                lambda s: s["code"].cast("int"),
            ).alias("codes"),
            F.sum("dist").cast("double").alias("recon_err"),
        )
        .orderBy("vec_id")
    )


@register(
    "sim_topk_pq",
    category="similarity",
    oracle=_SQL_RECALL_VERDICT,
    doc="ANN top-k via product quantization + asymmetric distance "
    "computation: corpus vectors live as 8 sub-codes; each query builds "
    "a 8x16 distance table to the codebook (broadcast), ADC distance is "
    "a table-lookup sum, and the ADC shortlist is exactly re-ranked. "
    "Registered as a recall verdict (exact top-k hash-matched, "
    "recall_ok pinned TRUE by the oracle).",
)
def sim_topk_pq_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recall_verdict(
        sim_topk_pq(spark, sf_dir), exact_topk(spark, sf_dir), PQ_MIN_RECALL
    )


def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-k: the query never touches raw corpus vectors until
    the final re-rank — it scans (vec_id, m, code) tuples and sums
    per-subspace distances looked up from its broadcast 8×16 table.
    At 100 TB the codes relation is ~32× smaller than the embeddings,
    and the ADC join is an equi-join on (m, code) against a
    constant-size broadcast — no corpus shuffle; composes with IVF
    (probe cells first, ADC within cells). Exact re-rank touches only
    PQ_RERANK raw vectors per query."""
    e = t(spark, sf_dir, "embeddings")
    cb = pq_codebook(e)
    # NO localCheckpoint on the codes frame (r10): r9 added one to
    # truncate the encode subtree out of the verdict plan, but the
    # checkpoint's eager materialization pass (encode executed as
    # separate blocking jobs + serialize + read-back) costs MORE than
    # the re-walked plan it saves — quiet-window alternating A/B at
    # sf0.1: checkpoint 4.63 s vs lazy 3.58 s best-of-4 (the r9
    # adoption measurement was taken under contention). The codes
    # subtree feeds exactly one consumer here, so nothing re-executes
    # without it (guide §5 — caching is only worth it when the frame is
    # REUSED).
    codes = pq_encode(e, cb).select("vec_id", "m", "code")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    # per-query distance table: (query_id, m, k, d) — PQ_M*PQ_K rows/query;
    # posexplode of the ONE-tree subspace-distance array (see
    # _sub_l2_all) replaces the explode-m + coalesce-of-8-when form
    dtable = (
        q.join(F.broadcast(cb))
        .select(
            F.col("vec_id").alias("query_id"),
            "k",
            F.posexplode(
                _sub_l2_all(F.col("embedding"), F.col("cb_emb"))
            ).alias("m", "d"),
        )
        .select("query_id", "m", "k", "d")
    )
    adc = (
        codes.join(
            F.broadcast(dtable),
            (codes.m == dtable.m) & (codes.code == dtable.k),
        )
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w_short = W.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= PQ_RERANK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    return rerank_exact(shortlist, e)


@register(
    "sim_topk_ivfpq",
    category="similarity",
    oracle=_SQL_RECALL_VERDICT,
    doc="ANN top-k via IVF-PQ — the composed 100 TB architecture: coarse "
    "IVF cells prune the corpus to NPROBE partitions, PQ-ADC ranks "
    "inside the probed cells from 8-byte codes, and only the shortlist "
    "touches raw vectors for the exact re-rank. Registered as a recall "
    "verdict (exact top-k hash-matched, recall_ok pinned TRUE by the "
    "oracle; the floor is lower — two stacked approximations).",
)
def sim_topk_ivfpq_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    return recall_verdict(
        sim_topk_ivfpq(spark, sf_dir), exact_topk(spark, sf_dir), IVFPQ_MIN_RECALL
    )


def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: the index layout a billion-vector deployment actually
    ships (FAISS IVFx,PQy). Coarse quantizer = stride-seeded IVF
    centroids (cell assignment is one broadcast join; at scale the cell
    id is the partition key, so probes read only matching partitions).
    Fine quantizer = PQ codes (32× smaller residency). A query probes
    IVF_NPROBE cells, ADC-ranks the cells' codes against its broadcast
    8×16 distance table, and exactly re-ranks the PQ_RERANK shortlist.
    Versus flat PQ the scan shrinks by ~nprobe/k_cells; versus flat IVF
    the probed partitions are read as codes, not vectors."""
    e = t(spark, sf_dir, "embeddings")
    cents = ivf_centroids(e)
    assigned = _assign_nearest(e, cents)  # (vec_id, embedding, centroid_id)
    cb = pq_codebook(e)
    # NO localCheckpoint (r10, same adjudication as sim_topk_pq): the
    # r9 checkpoint here was the cause of the round's one real
    # per-query regression (driver 4.52→6.67 s; reproduced in a quiet
    # window this round at 3.71→5.45). Variant A/B, 4 alternating
    # rounds in one session: checkpoint 4.20 s / lazy 3.11 s / r8
    # encode shape 3.37 s — the eager materialization pass costs more
    # than the plan re-walks it truncates, and the codes⋈assignment
    # subtree feeds exactly one consumer (the probe-pruned ADC).
    codes = pq_encode(e, cb).join(
        assigned.select("vec_id", "centroid_id"), "vec_id"
    ).select("vec_id", "centroid_id", "m", "code")

    q = e.filter(F.col("vec_id") < N_QUERIES)
    w_probe = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.join(F.broadcast(cents))
        .select(
            F.col("vec_id").alias("query_id"),
            "centroid_id",
            _dot(F.col("embedding"), F.col("cent_emb")).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= IVF_NPROBE)
        .select("query_id", "centroid_id")
    )
    # one-tree subspace-distance array, posexploded (see _sub_l2_all)
    dtable = (
        q.join(F.broadcast(cb))
        .select(
            F.col("vec_id").alias("query_id"),
            "k",
            F.posexplode(
                _sub_l2_all(F.col("embedding"), F.col("cb_emb"))
            ).alias("m", "d"),
        )
        .select("query_id", "m", "k", "d")
    )
    # probe-pruned ADC: only codes in a probed cell join the query's table
    adc = (
        codes.join(F.broadcast(probes), "centroid_id")
        .join(
            F.broadcast(dtable.withColumnRenamed("query_id", "dq")),
            (F.col("dq") == F.col("query_id"))
            & (dtable.m == codes.m)
            & (F.col("k") == F.col("code")),
        )
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w_short = W.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    shortlist = (
        adc.withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= PQ_RERANK)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    return rerank_exact(shortlist, e)


_CONTRASTIVE_ANCHORS = 20  # vec_id < N → anchors
_CONTRASTIVE_NEGS = 3


@register(
    "embedding_contrastive_pairs",
    category="similarity",
    oracle=f"""
    WITH anchors AS (
      SELECT vec_id AS anchor_id, embedding AS a_emb, label AS a_label
      FROM embeddings WHERE vec_id < {_CONTRASTIVE_ANCHORS}
    ),
    pos AS (
      SELECT anchor_id, vec_id AS pair_id, 'pos' AS role,
             CAST(0 AS BIGINT) AS rank FROM (
        SELECT a.anchor_id, c.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY a.anchor_id
                 ORDER BY {sql_cosine('a.a_emb', 'c.embedding')} DESC,
                          c.vec_id ASC
               ) AS rn
        FROM anchors a JOIN embeddings c
          ON c.label = a.a_label AND c.vec_id <> a.anchor_id
      ) WHERE rn = 1
    ),
    neg AS (
      SELECT anchor_id, vec_id AS pair_id, 'neg' AS role,
             CAST(rn AS BIGINT) AS rank FROM (
        SELECT a.anchor_id, c.vec_id,
               ROW_NUMBER() OVER (
                 PARTITION BY a.anchor_id
                 ORDER BY md5(CAST(a.anchor_id AS VARCHAR) || ':'
                              || CAST(c.vec_id AS VARCHAR)) ASC,
                          c.vec_id ASC
               ) AS rn
        FROM anchors a JOIN embeddings c ON c.label <> a.a_label
      ) WHERE rn <= {_CONTRASTIVE_NEGS}
    )
    SELECT anchor_id, pair_id, role, rank
    FROM (SELECT * FROM pos UNION ALL SELECT * FROM neg)
    ORDER BY anchor_id, role DESC, rank, pair_id
    """,
)
def embedding_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining: for each anchor, ONE hard
    positive (highest-cosine same-label vector — exact decimal
    arithmetic) and K hash-drawn negatives from other labels
    (md5(anchor, candidate) order — RNG-free, append-stable, no
    coordinated state between workers). This is the dataset-construction
    step for embedding/contrastive training (SimCLR/InfoNCE-style),
    expressed as two joins.

    Scale: anchors are the small side (a training batch worth) —
    broadcast against the corpus, so the corpus is scanned once per
    role with no shuffle of the big side; both top-1 and top-K prune
    through WindowGroupLimit (per-partition heaps, never a full sort).
    Hard-negative variants swap the hash order for ANN-ranked cosine
    (compose with sim_topk_* candidates)."""
    e = t(spark, sf_dir, "embeddings")
    anchors = e.filter(F.col("vec_id") < _CONTRASTIVE_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("a_emb"),
        F.col("label").alias("a_label"),
    )
    cos = _dot(F.col("a_emb"), F.col("embedding")) / (
        F.sqrt(_dot(F.col("a_emb"), F.col("a_emb")))
        * F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    )
    w_pos = W.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    pos = (
        F.broadcast(anchors)
        .join(e, (e.label == anchors.a_label) & (e.vec_id != anchors.anchor_id))
        .select("anchor_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w_pos))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("vec_id").alias("pair_id"),
            F.lit("pos").alias("role"),
            F.lit(0).cast("bigint").alias("rank"),
        )
    )
    draw = F.md5(
        F.concat(
            F.col("anchor_id").cast("string"),
            F.lit(":"),
            F.col("vec_id").cast("string"),
        ).cast("binary")
    )
    w_neg = W.partitionBy("anchor_id").orderBy(
        F.col("draw").asc(), F.col("vec_id").asc()
    )
    neg = (
        F.broadcast(anchors.select("anchor_id", "a_label"))
        .join(e, e.label != anchors.a_label)
        .select("anchor_id", "vec_id", draw.alias("draw"))
        .withColumn("rn", F.row_number().over(w_neg))
        .filter(F.col("rn") <= _CONTRASTIVE_NEGS)
        .select(
            "anchor_id",
            F.col("vec_id").alias("pair_id"),
            F.lit("neg").alias("role"),
            F.col("rn").cast("bigint").alias("rank"),
        )
    )
    return pos.unionAll(neg).orderBy(
        "anchor_id", F.col("role").desc(), "rank", "pair_id"
    )


# ---------------------------------------------------------------------------
# Incremental IVF index maintenance
# ---------------------------------------------------------------------------

_IVF_DELTA_MOD, _IVF_DELTA_REM = 7, 1  # vec_id % 7 == 1 is "the new batch"


@register(
    "sim_ivf_index_delta",
    category="similarity",
    oracle=f"""
    WITH params AS (
      SELECT GREATEST({IVF_CENTROID_STRIDE},
                      (COUNT(*) + {IVF_MAX_CENTROIDS} - 1)
                        // {IVF_MAX_CENTROIDS}) AS stride
      FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS centroid_id, embedding AS cent_emb
      FROM embeddings, params WHERE vec_id % params.stride = 0
    ),
    delta AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id % {_IVF_DELTA_MOD} = {_IVF_DELTA_REM}
    ),
    scored AS (
      SELECT d.vec_id, c.centroid_id,
             {sql_dot('d.embedding', 'c.cent_emb')} AS sim,
             ROW_NUMBER() OVER (
               PARTITION BY d.vec_id
               ORDER BY {sql_dot('d.embedding', 'c.cent_emb')} DESC,
                        c.centroid_id ASC
             ) AS rk
      FROM delta d CROSS JOIN cents c
    )
    SELECT vec_id, centroid_id, sim FROM scored WHERE rk = 1
    ORDER BY vec_id
    """,
    doc="Incremental ANN-index maintenance: assign a delta batch of new "
    "vectors to the EXISTING IVF cells (broadcast centroids, exact-"
    "decimal argmax) — the per-batch step that keeps a 100 TB IVF "
    "layout current without re-clustering; the assignment rows are "
    "exactly what appends into the cell-partitioned index table.",
)
def sim_ivf_index_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch index append for the IVF family (the vector-search
    sibling of sync/ivm.py): cost is O(|delta|·k) JVM dot products with
    no corpus access at all — the existing index is untouched, and the
    output's centroid_id IS the partition key of the index table, so
    the append lands partition-local. Periodic re-training
    (`kmeans_centroids`) swaps centroids wholesale; between trainings,
    assignment drift is the monitored quantity (corpus_drift_kl is the
    companion monitor)."""
    e = t(spark, sf_dir, "embeddings")
    cents = ivf_centroids(e)
    delta = e.filter(F.col("vec_id") % _IVF_DELTA_MOD == _IVF_DELTA_REM)
    sim = _dot(F.col("embedding"), F.col("cent_emb"))
    best = (
        delta.join(F.broadcast(cents))
        .select(
            "vec_id",
            F.struct(
                sim.alias("sim"), (-F.col("centroid_id")).alias("neg_id")
            ).alias("cand"),
        )
        .groupBy("vec_id")
        .agg(F.max("cand").alias("best"))
    )
    return best.select(
        "vec_id",
        (-F.col("best.neg_id")).alias("centroid_id"),
        F.col("best.sim").alias("sim"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# IVF physical layout: cell-partitioned index with hot-cell sub-split
# ---------------------------------------------------------------------------

#: layout-time ceiling on rows per (centroid_id, subcell) partition —
#: a hot cell is hash-scattered across enough subcells to stay under it
#: (same template as SemDeDup's capped clusters and the PageRank hub
#: split); probes read ALL of a probed cell's subcells, so the split is
#: invisible to query semantics
IVF_MAX_CELL_ROWS = 1_000_000


def write_ivf_layout(
    e: DataFrame, path: str, max_cell_rows: int = IVF_MAX_CELL_ROWS
) -> DataFrame:
    """Materialize the IVF index as a ``centroid_id``-partitioned
    parquet table — the physical form the sim_topk_ivf* docstrings
    promise: a probe then reads ONLY the matching partition directories
    (Spark partition pruning), i.e. nprobe/K of the corpus, instead of
    filtering a full scan.

    Hot cells (skewed assignment) are sub-split: each cell gets
    ``ceil(cell_rows / (max_cell_rows/2))`` subcells, rows
    hash-scattered by vec_id — targeting HALF the cap keeps the
    realized max below it despite hash-scatter variance (the same
    Chernoff headroom as the PageRank hub split) — so no partition
    directory (and no downstream task reading it) exceeds the cap
    regardless of how lopsided the quantizer is. The subcell count
    rides a broadcast join of the (≤K rows) cell-size table — one extra
    tiny join at write time, zero cost at read time. Returns the
    centroid table (broadcast-sized) for the probe side."""
    cents = ivf_centroids(e)
    assigned = _assign_nearest(e, cents)
    sizes = assigned.groupBy("centroid_id").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(max(max_cell_rows // 2, 1)))
        .cast("bigint")
        .alias("n_sub")
    )
    (
        assigned.join(F.broadcast(sizes), "centroid_id")
        .withColumn("subcell", F.pmod(F.xxhash64("vec_id"), F.col("n_sub")))
        .drop("n_sub")
        .repartition("centroid_id", "subcell")
        .write.mode("overwrite")
        .partitionBy("centroid_id", "subcell")
        .parquet(path)
    )
    return cents


def read_ivf_probes(
    spark: SparkSession, path: str, cell_ids: list[int]
) -> DataFrame:
    """Probe-side read of a written IVF layout: the ``isin`` filter on
    the partition column becomes a PartitionFilter — Spark lists only
    the probed cells' directories (all their subcells), so scan cost is
    proportional to the probed fraction of the index, not the corpus.
    At 100 TB this file-skipping is the entire point of the layout."""
    return spark.read.parquet(path).filter(F.col("centroid_id").isin(cell_ids))


# ---------------------------------------------------------------------------
# Embedding covariance (PCA/whitening prep)
# ---------------------------------------------------------------------------


@register(
    "embedding_covariance",
    category="vector",
    oracle="""
    WITH ex AS (
      SELECT vec_id,
             CAST(unnest(embedding) AS DOUBLE) AS x,
             CAST(unnest(range(len(embedding))) AS INTEGER) AS i
      FROM embeddings
    ),
    n_vec AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
    means AS (
      SELECT i,
             CAST(SUM(CAST(FLOOR(x * 1e12) AS BIGINT)) AS DOUBLE)
               / 1e12 / COUNT(*) AS mu
      FROM ex GROUP BY i
    ),
    prods AS (
      SELECT a.i AS i, b.i AS j,
             CAST(SUM(CAST(FLOOR(a.x * b.x * 1e12) AS BIGINT)) AS DOUBLE)
               / 1e12 AS sxy
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY a.i, b.i
    )
    SELECT p.i, p.j, p.sxy / n.n - ma.mu * mb.mu AS cov
    FROM prods p
    JOIN means ma ON p.i = ma.i
    JOIN means mb ON p.j = mb.i
    CROSS JOIN n_vec n
    ORDER BY p.i, p.j
    """,
    doc="Embedding covariance matrix (upper triangle): E[xy] - E[x]E[y] "
    "per dimension pair — the one-pass moment computation feeding PCA / "
    "whitening / Mahalanobis pipelines. Moments sum 1e-12-quantized "
    "fixed-point units (FLOOR of one double multiply into BIGINT): every "
    "step is an IEEE double op or exact integer arithmetic, so the "
    "matrix is bit-identical cross-engine and partition-independent — "
    "unlike double->DECIMAL casts, whose half-up (Spark) vs half-even "
    "(DuckDB) tie-breaking diverges on dyadic float32 values that land "
    "exactly on a .5 decimal boundary.",
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moments, not centering: covariance from raw product sums (one
    groupBy over d²/2 dimension pairs) plus the d means — no centered
    copy of the data is ever materialized. The pair expansion is per-row
    array work (d²/2 struct rows per vector via nested transform +
    explode); the shuffle moves decimal partials for d(d+1)/2 keys —
    constant in row count, so at 100 TB this is a pure map-side-combine
    pattern. For d large enough that d² rows per vector hurt, block the
    matrix (compute P×P dimension tiles per pass) — same plan per
    tile."""
    e = t(spark, sf_dir, "embeddings")
    n_vec = e.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("i", "x")
    ).select("vec_id", "i", F.col("x").cast("double").alias("x"))
    units = lambda c: F.floor(c * F.lit(1e12)).cast("bigint")  # noqa: E731
    means = ex.groupBy("i").agg(
        (
            F.sum(units(F.col("x"))).cast("double")
            / F.lit(1e12)
            / F.count(F.lit(1))
        ).alias("mu")
    )
    a = ex.alias("a")
    b = ex.alias("b")
    prods = (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.i") <= F.col("b.i")),
        )
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(
            (
                F.sum(units(F.col("a.x") * F.col("b.x"))).cast("double")
                / F.lit(1e12)
            ).alias("sxy")
        )
    )
    ma = means.select(F.col("i"), F.col("mu").alias("mu_i"))
    mb = means.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))
    return (
        prods.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .crossJoin(F.broadcast(n_vec))
        .select(
            "i",
            "j",
            (
                F.col("sxy") / F.col("n") - F.col("mu_i") * F.col("mu_j")
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


# ---------------------------------------------------------------------------
# PCA top component via unrolled power iteration
# ---------------------------------------------------------------------------

_PCA_ITERS = 3

_SQL_COV_CTES = """
    ex AS (
      SELECT vec_id,
             CAST(unnest(embedding) AS DOUBLE) AS x,
             CAST(unnest(range(len(embedding))) AS INTEGER) AS i
      FROM embeddings
    ),
    n_vec AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings),
    means AS (
      SELECT i,
             CAST(SUM(CAST(FLOOR(x * 1e12) AS BIGINT)) AS DOUBLE)
               / 1e12 / COUNT(*) AS mu
      FROM ex GROUP BY i
    ),
    prods AS (
      SELECT a.i AS i, b.i AS j,
             CAST(SUM(CAST(FLOOR(a.x * b.x * 1e12) AS BIGINT)) AS DOUBLE)
               / 1e12 AS sxy
      FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY a.i, b.i
    ),
    cov AS (
      SELECT p.i, p.j, p.sxy / n.n - ma.mu * mb.mu AS c
      FROM prods p
      JOIN means ma ON p.i = ma.i
      JOIN means mb ON p.j = mb.i
      CROSS JOIN n_vec n
    ),
    sym AS (
      SELECT i, j, c FROM cov
      UNION ALL
      SELECT j, i, c FROM cov WHERE i <> j
    )
"""


def _sql_power_iter(prev: str, k: int) -> str:
    return f"""
    w{k} AS (
      SELECT s.i,
             CAST(SUM(CAST(FLOOR(s.c * v.v * 1e12) AS BIGINT)) AS DOUBLE)
               / 1e12 AS w
      FROM sym s JOIN {prev} v ON s.j = v.i
      GROUP BY s.i
    ),
    n{k} AS (
      SELECT SQRT(CAST(SUM(CAST(FLOOR(w * w * 1e12) AS BIGINT)) AS DOUBLE)
                  / 1e12) AS nrm
      FROM w{k}
    ),
    v{k} AS (SELECT i, w / nrm AS v FROM w{k} CROSS JOIN n{k})"""


_SQL_PCA = (
    "WITH "
    + _SQL_COV_CTES
    + ", v0 AS (SELECT DISTINCT i, CASE WHEN i = 0 THEN 1.0 ELSE 0.0 END AS v"
    "   FROM cov)"
    + ","
    + ",".join(_sql_power_iter(f"v{k - 1}", k) for k in range(1, _PCA_ITERS + 1))
    + f"""
    SELECT v.i, v.v AS loading, n.nrm AS eigenvalue_est
    FROM v{_PCA_ITERS} v CROSS JOIN n{_PCA_ITERS} n
    ORDER BY v.i
    """
)


@register(
    "embedding_pca_top_component",
    category="vector",
    oracle=_SQL_PCA,
    doc="Top principal component of the embedding cloud via 3 unrolled "
    "power iterations over the covariance matrix (the PCA/whitening "
    "front door). Every matrix-vector product sums 1e-12 fixed-point "
    "units (FLOOR into BIGINT), so the iteration trajectory — including "
    "the sign, pinned by the deterministic e_0 start — is bit-identical "
    "cross-engine; the oracle replays the recurrence as chained CTEs "
    "(the graph_pagerank pattern).",
)
def embedding_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed part: the covariance moments (one corpus pass, see
    embedding_covariance). The iteration itself runs on the d²-row
    matrix frame — constant-size, so each step is a broadcast-scale
    join; at d where this matters, the same recurrence runs on d²
    partials just as well. ||w_k|| converges to the top eigenvalue;
    3 iterations are unrolled so the whole thing stays one lazy plan."""
    # cov is d²-row tiny but its subtree is the full corpus moment pass;
    # un-checkpointed it fed THREE consumers (both sym branches + the
    # v0 seed) and re-ran inside every power iteration's broadcast-norm
    # build — the static plan scanned the embeddings parquet 9×.
    # Materializing cov (and the sym union both iteration probes share)
    # truncates the loop's lineage to the d²-row frames (guide §3.3;
    # measured ~2.6× at sf0.1).
    cov = embedding_covariance(spark, sf_dir).localCheckpoint()
    sym = (
        cov.select("i", "j", F.col("cov").alias("c"))
        .unionByName(
            cov.filter(F.col("i") != F.col("j")).select(
                F.col("j").alias("i"),
                F.col("i").alias("j"),
                F.col("cov").alias("c"),
            )
        )
        .localCheckpoint()
    )
    v = cov.select("i").distinct().select(
        "i", F.when(F.col("i") == 0, 1.0).otherwise(0.0).alias("v")
    )
    units = lambda c: F.floor(c * F.lit(1e12)).cast("bigint")  # noqa: E731
    nrm_col = None
    for _ in range(_PCA_ITERS):
        w = (
            sym.join(v.select(F.col("i").alias("j"), "v"), "j")
            .groupBy("i")
            .agg(
                (F.sum(units(F.col("c") * F.col("v"))).cast("double") / F.lit(1e12)).alias("w")
            )
        )
        nrm = w.agg(
            F.sqrt(
                F.sum(units(F.col("w") * F.col("w"))).cast("double") / F.lit(1e12)
            ).alias("nrm")
        )
        v = w.crossJoin(F.broadcast(nrm)).select(
            "i", (F.col("w") / F.col("nrm")).alias("v")
        )
        nrm_col = nrm
    return (
        v.crossJoin(F.broadcast(nrm_col))
        .select("i", F.col("v").alias("loading"), F.col("nrm").alias("eigenvalue_est"))
        .orderBy("i")
    )


# ---------------------------------------------------------------------------
# Mutual k-NN graph (semdedup / graph-clustering front-end)
# ---------------------------------------------------------------------------

KNN_GRAPH_K = 3

# exact-baseline gate: the N×N compare runs over at most this many
# vectors — a deterministic stride-sample keeps work bounded at any
# corpus size (the same hard-stop policy as dedup.py's exact embedding
# cosine; the scale path is the bucketed ANN family). At every shipped
# test sf the corpus is <= the cap, so the stride is 1 and results are
# the full exact graph.
KNN_GRAPH_MAX_VECTORS = 2000

_SQL_KNN_CORPUS = f"""
      SELECT * FROM embeddings
      WHERE vec_id % (SELECT GREATEST(1, CAST(CEIL(COUNT(*) / {KNN_GRAPH_MAX_VECTORS}.0) AS BIGINT))
                      FROM embeddings) = 0
"""

_SQL_KNN_MUTUAL = f"""
    WITH corpus AS ({_SQL_KNN_CORPUS}),
    ranked AS (
      SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
             {sql_cosine_fixed('a.embedding', 'b.embedding')} AS cosine,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY {sql_cosine_fixed('a.embedding', 'b.embedding')} DESC,
                        b.vec_id ASC
             ) AS rank
      FROM corpus a JOIN corpus b ON a.vec_id != b.vec_id
    ),
    knn AS (SELECT * FROM ranked WHERE rank <= {KNN_GRAPH_K})
    SELECT k.src_id, k.dst_id, k.cosine, k.rank,
           EXISTS (SELECT 1 FROM knn r
                   WHERE r.src_id = k.dst_id AND r.dst_id = k.src_id) AS mutual
    FROM knn k ORDER BY src_id, rank
"""


@register(
    "sim_knn_graph_mutual",
    category="similarity",
    oracle=_SQL_KNN_MUTUAL,
    doc="Exact mutual k-NN graph over the embedding corpus: every "
    "vector's top-k cosine neighbors, with edges flagged MUTUAL when "
    "both endpoints rank each other — the standard front-end for "
    "semantic-dedup clustering (mutual edges are the high-precision "
    "ones fed to connected components / dedup_clusters). The N×N "
    "compare is the labeled exact baseline, same contract as "
    "sim_topk_bruteforce; at 100 TB you build candidate edges from the "
    "LSH/IVF buckets (sim_topk_lsh / sim_topk_ivf share the bucketing) "
    "and only score within buckets. The mutual flag itself costs one "
    "extra shuffle of the N·k edge list (tiny) — a self-join on the "
    "reversed edge, no second pass over the vectors. GATED: the exact "
    "compare stride-samples the corpus down to KNN_GRAPH_MAX_VECTORS "
    "(deterministic vec_id stride, mirrored in the oracle) so the "
    "baseline stays bounded at any scale — at the shipped sfs the "
    "stride is 1 and the graph is the full exact one.",
)
def sim_knn_graph_mutual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r9 execution shape (guide §4.2 — hand whole batches to vectorized
    native code): the exact N×N compare previously ran as an interpreted
    fixed-point fold per pair — 4M pairs × 64 elements of per-element
    Decimal/floor expression evaluation at sf0.1 — plus a 4M-row window
    shuffle for the per-source rank. It is now one Arrow-batched
    `mapInArrow` block product: the stride-gated corpus (≤
    KNN_GRAPH_MAX_VECTORS vectors — ~1 MB, the same bounded-collect
    class as a broadcast relation) is broadcast as a float64 matrix,
    each task scores its sources against the block with NumPy computing
    the IDENTICAL floor fixed-point chain (floor(x·y·1e12) summed as
    int64, /1e12, IEEE divide by the norm product), and the per-source
    top-k comes from a lexsort on (-cosine, dst_id) — the same
    (cosine desc, id asc) tie-break as the window form. All 6000 output
    rows verified bit-equal (doubles included) against the previous
    plan at sf0.1; 3.19 → 1.58 s warm. No corpus-sized shuffle remains:
    the only exchange left is the 6k-edge mutual self-join."""
    import numpy as np

    e = t(spark, sf_dir, "embeddings")
    # control-plane scalar (one count) to fix the deterministic stride —
    # the same bounded-collect category as the sync watermark reads
    n_total = e.count()
    stride = max(1, -(-n_total // KNN_GRAPH_MAX_VECTORS))  # ceil div
    e = e.filter(F.col("vec_id") % stride == 0).select("vec_id", "embedding")
    # gated collect: ≤ KNN_GRAPH_MAX_VECTORS rows by construction
    rows = e.collect()
    if not rows:
        # empty corpus: C would be 1-D and the axis-1 reductions below
        # would raise; the kNN graph over zero vectors is the typed
        # empty edge list (same frame the window form produced)
        return spark.createDataFrame(
            [],
            "src_id bigint, dst_id bigint, cosine double, "
            "rank bigint, mutual boolean",
        )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    C = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, C = ids[order], C[order]
    # fixed-point (FLOOR) norms/dots, not decimal-rounded: FLOOR has no
    # rounding tie for engines to disagree on (same rationale as
    # dot_fixed, which this replicates bit-for-bit in NumPy)
    norms = np.sqrt(np.floor(C * C * 1e12).astype(np.int64).sum(1) / 1e12)
    bc = spark.sparkContext.broadcast((ids, C, norms))
    k = KNN_GRAPH_K

    def block(batches):
        import numpy as np
        import pyarrow as pa

        b_ids, b_c, b_norms = bc.value
        for batch in batches:
            src = batch.column("vec_id").to_numpy(zero_copy_only=False)
            xs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            out_src, out_dst, out_cos, out_rank = [], [], [], []
            for i in range(len(src)):
                x = xs[i]
                dots = np.floor(b_c * x * 1e12).astype(np.int64).sum(1) / 1e12
                nx = np.sqrt(np.floor(x * x * 1e12).astype(np.int64).sum() / 1e12)
                cos = dots / (b_norms * nx)
                mask = b_ids != src[i]
                cids, ccos = b_ids[mask], cos[mask]
                sel = np.lexsort((cids, -ccos))[:k]
                out_src += [src[i]] * len(sel)
                out_dst += list(cids[sel])
                out_cos += list(ccos[sel])
                out_rank += list(range(1, len(sel) + 1))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_src, pa.int64()),
                    pa.array(out_dst, pa.int64()),
                    pa.array(out_cos, pa.float64()),
                    pa.array(out_rank, pa.int64()),
                ],
                names=["src_id", "dst_id", "cosine", "rank"],
            )

    knn = e.mapInArrow(
        block, "src_id bigint, dst_id bigint, cosine double, rank bigint"
    )
    rev = knn.select(
        F.col("dst_id").alias("src_id"),
        F.col("src_id").alias("dst_id"),
        F.lit(1).alias("m"),
    )
    return (
        knn.join(rev, ["src_id", "dst_id"], "left")
        .select(
            "src_id",
            "dst_id",
            "cosine",
            "rank",
            F.col("m").isNotNull().alias("mutual"),
        )
        .orderBy("src_id", "rank")
    )


# ---------------------------------------------------------------------------
# Matryoshka prefix-dimension retrieval (MRL truncation)
# ---------------------------------------------------------------------------

MRL_DIM = 32  # prefix dims used by the cheap first-pass ranker
MRL_POOL = 50  # shortlist size re-ranked with full dimensionality
MRL_MIN_RECALL = 0.5


@register(
    "sim_topk_matryoshka",
    category="similarity",
    oracle=_SQL_RECALL_VERDICT,
    doc="Matryoshka-truncation retrieval (MRL): shortlist with the "
    "cosine of the FIRST 32 of 64 dimensions (half the scan bytes and "
    "FLOPs — the cheap pass when embeddings are Matryoshka-trained), "
    "then re-rank only the 50-deep shortlist with full vectors — the "
    "same shortlist+rerank shape as PQ-ADC. Reported as a recall "
    "verdict (exact top-k rows hash-matched, recall_ok pinned TRUE by "
    "the oracle; the floor is deliberately loose because the synthetic "
    "vectors are random — MRL-trained embeddings concentrate signal in "
    "the prefix). Same broadcast-queries/no-corpus-shuffle plan as "
    "sim_topk_bruteforce; at 100 TB the prefix pass composes with IVF "
    "(probe cells in 32-d, re-rank survivors in 64-d) and reads only "
    "the prefix when embeddings are stored dimension-sharded.",
)
def sim_topk_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    truncated = e.select(
        "vec_id", F.slice(F.col("embedding"), 1, MRL_DIM).alias("embedding")
    )
    queries = truncated.filter(F.col("vec_id") < N_QUERIES)
    shortlist = brute_force_topk(queries, truncated, k=MRL_POOL).select(
        "query_id", "neighbor_id"
    )
    ann = rerank_exact(shortlist, e)
    return recall_verdict(ann, exact_topk(spark, sf_dir), MRL_MIN_RECALL)


# ---------------------------------------------------------------------------
# Binary quantization: 64-bit sign signature + hamming shortlist
# ---------------------------------------------------------------------------

BQ_POOL = 50
BQ_MIN_RECALL = 0.5


def _pack_signs(vec_slice: Column) -> Column:
    """Fold a float slice into a bigint of sign bits (acc*2 + bit —
    shift-free, ANSI-overflow-safe for slices ≤ 62 bits)."""
    return F.aggregate(
        vec_slice,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc * 2
        + F.when(x > 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint"),
    )


def sign_signature_halves(vec: Column) -> tuple[Column, Column]:
    """Sign bits of a 64-d vector packed as two 32-bit bigint halves
    (two halves instead of one 64-bit word so the arithmetic fold never
    touches the sign bit under ANSI overflow checking). Pure JVM fold —
    no UDF, no array retained; hamming(a, b) = bit_count(hi⊕hi′) +
    bit_count(lo⊕lo′)."""
    n = F.size(vec)
    half = (n / 2).cast("int")
    return (
        _pack_signs(F.slice(vec, 1, half)),
        _pack_signs(F.slice(vec, half + 1, n - half)),
    )


@register(
    "sim_topk_binary_hamming",
    category="similarity",
    oracle=_SQL_RECALL_VERDICT,
    doc="Binary-quantized retrieval (the vector-DB 'BQ' mode): each "
    "64-d vector compresses 256× to ONE bigint of sign bits; candidate "
    "distance is bit_count(xor) — a register-width hamming op — and "
    "only the 50-deep shortlist touches raw vectors for the exact "
    "cosine re-rank. Same verdict contract as the other ANN paths "
    "(exact top-k hash-matched, recall_ok pinned TRUE; floor loose "
    "because the synthetic vectors are random — real embeddings are "
    "angularly clustered and BQ recall rises sharply). Scale: the "
    "signature scan reads 8 bytes/vector instead of 256, the hamming "
    "compare is a broadcast of 10 query longs — no corpus shuffle "
    "at all until the tiny shortlist join.",
)
def sim_topk_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit binary quantization: 1 bit/dim signatures, Hamming
    shortlist, exact re-rank. The shortlist pool scales with the corpus
    (max(BQ_POOL, 10%)): a FIXED pool over a growing corpus dilutes
    1-bit recall below the gate — measured r6: pool 50 = recall 0.68 at
    500 vecs but 0.48 at 2000; 10% holds 0.68/0.78 at both shipped
    scales (found by the sf0.1 oracle artifact, invisible at sf0.01).
    At production scale the knob to grow is signature BITS (multiple
    projections per dim), not the pool fraction — 1-bit-per-dim recall
    at fixed pool genuinely degrades with corpus size; the scaled pool
    keeps this operator's stated recall contract honest at the scales
    it ships. The corpus count enters as a broadcast 1-row aggregate,
    not a driver-side count(): building this DataFrame stays lazy (no
    Spark job at plan-construction time — the plan ledger and explain
    paths build every registered query without executing any)."""
    e = t(spark, sf_dir, "embeddings")
    n_vecs = e.agg(F.count(F.lit(1)).alias("n_vecs"))
    pool = F.greatest(
        F.lit(BQ_POOL), F.floor(F.col("n_vecs") * 0.10).cast("int")
    )
    hi, lo = sign_signature_halves(F.col("embedding"))
    sigs = e.select("vec_id", hi.alias("sig_hi"), lo.alias("sig_lo"))
    q = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("sig_hi").alias("q_hi"),
        F.col("sig_lo").alias("q_lo"),
    )
    hamming = F.bit_count(
        F.col("sig_hi").bitwiseXOR(F.col("q_hi"))
    ) + F.bit_count(F.col("sig_lo").bitwiseXOR(F.col("q_lo")))
    w_short = W.partitionBy("query_id").orderBy(
        F.col("hd").asc(), F.col("vec_id").asc()
    )
    shortlist = (
        sigs.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", hamming.alias("hd"))
        .withColumn("rn", F.row_number().over(w_short))
        .crossJoin(F.broadcast(n_vecs))
        .filter(F.col("rn") <= pool)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    ann = rerank_exact(shortlist, e)
    return recall_verdict(ann, exact_topk(spark, sf_dir), BQ_MIN_RECALL)


# ---------------------------------------------------------------------------
# Scalar-quantized (int8) retrieval with exact re-rank
# ---------------------------------------------------------------------------

SQ_POOL = 50
SQ_MIN_RECALL = 0.6


def _sq8_codes(vec: Column, mn: Column, mx: Column) -> Column:
    """Centered int8 codes: the affine 0..255 map of
    embedding_quantize_int8 (FLOOR(x+0.5) — cross-engine-stable,
    ROUND(double) is not), shifted by -128 so the integer dot product
    of two code arrays approximates the centered-float dot. Integer
    output ⇒ downstream scoring is exact arithmetic. Built from the
    PASSED columns (the old F.expr form silently ignored its argument
    and captured outer columns named v/mn/mx by string)."""
    step = (mx - mn) / F.lit(255.0)
    return F.transform(
        vec,
        lambda x: F.least(
            F.floor((x - mn) / step + F.lit(0.5)), F.lit(255)
        ).cast("bigint")
        - 128,
    )


def _sq8_scored(e: "DataFrame") -> "DataFrame":
    """Shared SQ8 scoring relation: int8-encode the corpus, broadcast
    the query codes, exact-integer dot per candidate, ranked per query
    — (query_id, neighbor_id, score, rn). sim_topk_sq8 cuts this at
    SQ_POOL for its shortlist; sim_recall_curve reads rn directly, so
    the recall curve MEASURES THE SAME QUANTIZER the retrieval path
    ships (r4 self-review: the construction existed twice and could
    drift)."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    codes = e.select(
        "vec_id",
        v.alias("v"),
        F.array_min(v).alias("mn"),
        F.array_max(v).alias("mx"),
    ).select(
        "vec_id", _sq8_codes(F.col("v"), F.col("mn"), F.col("mx")).alias("code")
    )
    q = codes.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("q_code")
    )
    int_dot = F.aggregate(
        F.zip_with(F.col("code"), F.col("q_code"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    w_rn = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            int_dot.alias("score"),
        )
        .withColumn("rn", F.row_number().over(w_rn))
    )



@register(
    "sim_topk_sq8",
    category="similarity",
    oracle=_SQL_RECALL_VERDICT,
    doc="Scalar-quantized retrieval (the vector-DB 'SQ8' mode, "
    "completing the compression family beside PQ and binary BQ): each "
    "float32 dimension compresses 4x to one centered int8 code; "
    "candidate score is the INTEGER dot product of code arrays (exact "
    "bigint arithmetic — no float nondeterminism in the shortlist), "
    "and only the 50-deep shortlist touches raw vectors for the exact "
    "cosine re-rank. Same verdict contract as the other ANN paths: "
    "exact top-k hash-matched, aggregate recall_ok pinned TRUE "
    "(measured 0.88-0.96 on this synthetic corpus; floor 0.6 — random "
    "vectors are SQ's worst case, real embeddings cluster angularly). "
    "Scale: codes would persist beside the parquet (4x less scan "
    "bandwidth than floats — SQ's actual win); the scoring pass "
    "broadcasts 10 query code arrays, shuffles nothing corpus-sized, "
    "and the per-candidate cost is a JVM integer fold.",
)
def sim_topk_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    shortlist = (
        _sq8_scored(e)
        .filter(F.col("rn") <= SQ_POOL)
        .select("query_id", "neighbor_id")
    )
    ann = rerank_exact(shortlist, e)
    return recall_verdict(ann, exact_topk(spark, sf_dir), SQ_MIN_RECALL)


_RECALL_POOLS = (10, 25, 50)

_SQL_RECALL_CURVE = f"""
    WITH exact5 AS (
      SELECT query_id, neighbor_id FROM ({_SQL_BF_INNER}) WHERE rank <= {TOPK}
    ),
    codes AS (
      SELECT vec_id,
             list_transform(v,
               x -> CAST(LEAST(FLOOR((x - mn) / ((mx - mn) / 255.0) + 0.5),
                               255) AS BIGINT) - 128) AS code
      FROM (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
               list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mn,
               list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mx
        FROM embeddings
      )
    ),
    scores AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_sum(list_transform(list_zip(c.code, q.code),
                        s -> s[1] * s[2])) DESC, c.vec_id ASC
             ) AS rn
      FROM codes q JOIN codes c ON q.vec_id != c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    pools(pool_size) AS (VALUES {", ".join(f"({p})" for p in _RECALL_POOLS)})
    SELECT p.pool_size,
           CAST(COUNT(s.neighbor_id) AS BIGINT) AS hits,
           CAST((1000000 * COUNT(s.neighbor_id)) // COUNT(*) AS BIGINT)
             AS recall_ppm
    FROM pools p
    LEFT JOIN exact5 e ON TRUE
    LEFT JOIN scores s ON s.query_id = e.query_id
      AND s.neighbor_id = e.neighbor_id AND s.rn <= p.pool_size
    GROUP BY p.pool_size
    ORDER BY p.pool_size
"""


@register(
    "sim_recall_curve",
    category="similarity",
    oracle=_SQL_RECALL_CURVE,
    doc="ANN evaluation harness: recall@pool for the SQ8 shortlist at "
    "pool sizes 10/25/50 — the recall-vs-cost CURVE an ANN deployment "
    "tunes against, not a single operating point. Unlike the verdict "
    "queries (which pin one boolean), this is FULLY oracle-replayed: "
    "the int8 shortlist ranking is exact integer arithmetic, so DuckDB "
    "reproduces shortlists, hit counts, and ppm recalls bit-for-bit. "
    "Because the final re-rank uses exact cosine, recall@pool = "
    "|exact top-k ∩ pool| / k — no re-rank needs simulating. Scale: "
    "one integer-scored candidate pass (broadcast query codes, "
    "per-query heaps via the rank window), the exact top-k it is "
    "judged against is the same broadcast brute-force pass "
    "sim_topk_bruteforce runs, and everything after is "
    "pool-count-sized. The output is 3 rows.",
)
def sim_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    exact5 = exact_topk(spark, sf_dir).select("query_id", "neighbor_id")
    scores = _sq8_scored(e)
    pools = spark.createDataFrame(
        [(p,) for p in _RECALL_POOLS], "pool_size int"
    )
    flagged = (
        pools.crossJoin(exact5)
        .join(
            scores.select("query_id", "neighbor_id", "rn"),
            ["query_id", "neighbor_id"],
            "left",
        )
        .select(
            "pool_size",
            F.when(F.col("rn") <= F.col("pool_size"), 1)
            .otherwise(0)
            .alias("hit"),
        )
    )
    return (
        flagged.groupBy("pool_size")
        .agg(
            F.sum("hit").cast("bigint").alias("hits"),
            F.count(F.lit(1)).alias("total"),
        )
        .select(
            "pool_size",
            "hits",
            F.expr("CAST((1000000 * hits) DIV total AS BIGINT)").alias(
                "recall_ppm"
            ),
        )
        .orderBy("pool_size")
    )


# ---------------------------------------------------------------------------
# Greedy k-center coreset (farthest-point traversal)
# ---------------------------------------------------------------------------

KCENTER_K = 8


def _kcenter_oracle() -> str:
    from ..functions.vector import sql_l2sq_fixed

    dist = sql_l2sq_fixed("e.embedding", "c.embedding")
    steps = []
    prev_sel = "s0"
    prev_d = "d0"
    steps.append(f"""
    s0 AS (
      SELECT 0 AS center_rank, vec_id, CAST(0.0 AS DOUBLE) AS dist_at_selection
      FROM embeddings ORDER BY vec_id LIMIT 1
    ),
    d0 AS (
      SELECT e.vec_id, {sql_l2sq_fixed('e.embedding',
        '(SELECT embedding FROM embeddings ORDER BY vec_id LIMIT 1)')} AS md
      FROM embeddings e
    )""")
    for i in range(1, KCENTER_K):
        steps.append(f"""
    s{i} AS (
      SELECT {i} AS center_rank, vec_id, md AS dist_at_selection
      FROM {prev_d} ORDER BY md DESC, vec_id ASC LIMIT 1
    ),
    d{i} AS (
      SELECT e.vec_id, LEAST({prev_d}.md, {dist}) AS md
      FROM embeddings e
      JOIN {prev_d} ON e.vec_id = {prev_d}.vec_id
      CROSS JOIN (SELECT embedding FROM embeddings
                  WHERE vec_id = (SELECT vec_id FROM s{i})) c
    )""")
        prev_sel, prev_d = f"s{i}", f"d{i}"
    unions = "\n      UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(KCENTER_K))
    return f"""
    WITH {','.join(steps)}
    SELECT CAST(center_rank AS BIGINT) AS center_rank, vec_id,
           dist_at_selection
    FROM ({unions})
    ORDER BY center_rank
    """


@register(
    "sample_coreset_kcenter",
    category="similarity",
    oracle=_kcenter_oracle(),
    doc="Greedy k-center coreset (farthest-point traversal, the 2-"
    "approximation of Gonzalez 1985): seed with the lowest id, then "
    "7× pick the point FARTHEST from the selected set — the classic "
    "diversity-maximizing coreset for active learning / eval-set "
    "selection, and the seeding step of k-center clustering. Each "
    "round is one broadcast of the single new center + a running "
    "per-point min-distance column + one TakeOrdered(1) argmax — "
    "O(k·N) distance evaluations total, never O(N²); the min-dist "
    "frame is localCheckpointed so lineage stays flat. Distances are "
    "FLOOR fixed-point squared-L2 (no rounding tie), ties broken by "
    "vec_id, so selections are bit-reproducible — the oracle replays "
    "the identical traversal as unrolled CTEs.",
)
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import l2sq_fixed

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    seed = e.orderBy("vec_id").limit(1)
    seed_row = seed.collect()
    if not seed_row:
        return spark.createDataFrame(
            [], "center_rank bigint, vec_id bigint, dist_at_selection double"
        )
    centers = [(0, seed_row[0]["vec_id"], 0.0)]
    seed_emb = seed.select(F.col("embedding").alias("c_emb"))
    dists = (
        e.crossJoin(F.broadcast(seed_emb))
        .select(
            "vec_id",
            "embedding",
            l2sq_fixed(F.col("embedding"), F.col("c_emb")).alias("md"),
        )
        .localCheckpoint(eager=True)
    )
    for i in range(1, KCENTER_K):
        far = dists.orderBy(F.col("md").desc(), F.col("vec_id").asc()).limit(1)
        far_row = far.collect()[0]
        centers.append((i, far_row["vec_id"], float(far_row["md"])))
        c_emb = (
            e.filter(F.col("vec_id") == far_row["vec_id"])
            .select(F.col("embedding").alias("c_emb"))
        )
        dists = (
            dists.crossJoin(F.broadcast(c_emb))
            .select(
                "vec_id",
                "embedding",
                F.least(
                    F.col("md"), l2sq_fixed(F.col("embedding"), F.col("c_emb"))
                ).alias("md"),
            )
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(
        centers, "center_rank bigint, vec_id bigint, dist_at_selection double"
    ).orderBy("center_rank")


RANGE_TAU = 0.25  # cosine radius for range search


_SQL_RANGE_SEARCH = f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {sql_cosine_fixed('q.embedding', 'c.embedding')} AS cosine
    FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
    WHERE q.vec_id < {N_QUERIES}
      AND {sql_cosine_fixed('q.embedding', 'c.embedding')} >= {RANGE_TAU}
    ORDER BY query_id, cosine DESC, neighbor_id
"""


@register(
    "sim_range_search",
    category="similarity",
    oracle=_SQL_RANGE_SEARCH,
    doc="Radius (range) similarity search: ALL neighbors with cosine ≥ τ "
    "per query — the epsilon-ball complement to top-k (dedup thresholds, "
    "recall-oriented retrieval, near-duplicate audit all want 'everything "
    "this similar', not a fixed k). Exact baseline with the same "
    "broadcast-queries/no-corpus-shuffle plan as sim_topk_bruteforce; "
    "the radius predicate is applied in the join, so only in-ball pairs "
    "survive to the output. At 100 TB the LSH band buckets serve as the "
    "candidate generator (a radius in cosine maps to a band-collision "
    "probability), identical to the dedup-threshold pipeline.",
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    c = e.withColumn(
        "norm", F.sqrt(dot_fixed(F.col("embedding"), F.col("embedding")))
    )
    left = c.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    right = c.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm").alias("c_norm"),
    )
    cos = dot_fixed(F.col("q_emb"), F.col("c_emb")) / (
        F.col("q_norm") * F.col("c_norm")
    )
    return (
        F.broadcast(left)
        .join(right, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= RANGE_TAU)
        .orderBy("query_id", F.col("cosine").desc(), "neighbor_id")
    )


# ---------------------------------------------------------------------------
# Leave-one-out kNN classification eval (labeled embeddings)
# ---------------------------------------------------------------------------

KNN_EVAL_K = 5

_SQL_KNN_EVAL = f"""
    WITH corpus AS ({_SQL_KNN_CORPUS}),
    ranked AS (
      SELECT a.vec_id, a.label AS true_label, b.label AS nbr_label,
             ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY {sql_cosine_fixed('a.embedding', 'b.embedding')} DESC,
                        b.vec_id ASC
             ) AS rank
      FROM corpus a JOIN corpus b ON a.vec_id != b.vec_id
    ),
    votes AS (
      SELECT vec_id, true_label, nbr_label, COUNT(*) AS n_votes
      FROM ranked WHERE rank <= {KNN_EVAL_K}
      GROUP BY vec_id, true_label, nbr_label
    ),
    pred AS (
      SELECT vec_id, true_label, nbr_label AS predicted_label
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id
          ORDER BY n_votes DESC, nbr_label ASC
        ) AS vr
        FROM votes
      ) WHERE vr = 1
    )
    SELECT true_label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN predicted_label = true_label
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN predicted_label = true_label
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS accuracy
    FROM pred GROUP BY true_label ORDER BY true_label
"""


@register(
    "sim_knn_classifier_eval",
    category="similarity",
    oracle=_SQL_KNN_EVAL,
    doc="Leave-one-out k-NN classification accuracy per label over the "
    "labeled embedding corpus (k = 5, majority vote, ties → lowest "
    "label) — the standard embedding-quality probe (a good embedding "
    "space separates labels; accuracy ≈ chance means the space carries "
    "no signal). Exact all-pairs baseline sharing "
    "sim_knn_graph_mutual's contract, fixed-point cosine, AND its "
    "KNN_GRAPH_MAX_VECTORS stride gate (oracle-mirrored); at scale "
    "the vote runs over ANN candidates instead (sim_topk_lsh/ivf) — "
    "identical vote/eval plan over a cheaper edge list. The vote and "
    "the accuracy rollup are combinable aggregates over the N·k edge "
    "frame; per-vector argmax is a WindowGroupLimit.",
)
def sim_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    # same deterministic stride gate as sim_knn_graph_mutual (shared
    # exact-baseline contract): corpus bounded at KNN_GRAPH_MAX_VECTORS,
    # stride 1 at every shipped sf
    n_total = e.count()
    stride = max(1, -(-n_total // KNN_GRAPH_MAX_VECTORS))
    e = e.filter(F.col("vec_id") % stride == 0)
    c = e.withColumn(
        "norm", F.sqrt(dot_fixed(F.col("embedding"), F.col("embedding")))
    )
    left = c.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("a_emb"),
        F.col("norm").alias("a_norm"),
    )
    right = c.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("nbr_label"),
        F.col("embedding").alias("b_emb"),
        F.col("norm").alias("b_norm"),
    )
    cos = dot_fixed(F.col("a_emb"), F.col("b_emb")) / (
        F.col("a_norm") * F.col("b_norm")
    )
    w_rank = W.partitionBy("a_id").orderBy(
        F.col("cosine").desc(), F.col("b_id").asc()
    )
    knn = (
        left.join(right, F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", "true_label", "nbr_label", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= KNN_EVAL_K)
    )
    votes = knn.groupBy("a_id", "true_label", "nbr_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    w_vote = W.partitionBy("a_id").orderBy(
        F.col("n_votes").desc(), F.col("nbr_label").asc()
    )
    pred = (
        votes.withColumn("vr", F.row_number().over(w_vote))
        .filter(F.col("vr") == 1)
        .select("a_id", "true_label", F.col("nbr_label").alias("predicted_label"))
    )
    correct = F.when(
        F.col("predicted_label") == F.col("true_label"), 1
    ).otherwise(0)
    return (
        pred.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(correct).alias("n_correct"),
            (F.sum(correct).cast("double") / F.count(F.lit(1))).alias(
                "accuracy"
            ),
        )
        .orderBy("true_label")
    )


# ---------------------------------------------------------------------------
# MMR diversified re-rank (retrieval post-processing)
# ---------------------------------------------------------------------------

MMR_POOL = 50  # candidate pool depth entering the re-rank
MMR_K = 8  # diversified results returned
# lambda / (1 - lambda) written as SEPARATE literals in both engines so
# neither side constant-folds 1 - 0.7 into 0.30000000000000004 while the
# other uses 0.3 — the pair below is what both engines actually multiply.
MMR_LAMBDA = 0.7
MMR_DIVERSITY = 0.3


def _mmr_oracle() -> str:
    """Unrolled greedy-MMR CTE chain (same style as the PageRank / BPE
    oracles): round k's pick is the argmax of
    ``0.7*rel - 0.3*max(sim to selected)`` over the not-yet-selected
    pool, ties broken by vec_id — identical tie-break and fixed-point
    cosine arithmetic to the Spark loop, so the selection sequence is
    bit-deterministic cross-engine. Every sel/pick CTE is MATERIALIZED:
    each round references its predecessor 3x, so inlined CTEs would
    re-expand the chain 3^k-fold (measured: the un-hinted oracle ran
    minutes at sf0.001; materialized, 0.1 s)."""
    from ..functions.vector import sql_dot_fixed

    cos = (
        f"({sql_dot_fixed('c.embedding', 's.embedding')}"
        " / (c.nrm * s.nrm))"
    )
    rounds = []
    for rk in range(2, MMR_K + 1):
        prev = f"sel{rk - 1}"
        rounds.append(
            f"""
    pick{rk} AS MATERIALIZED (
      SELECT vec_id, embedding, nrm, rel, mmr_score,
             CAST({rk} AS INT) AS rank
      FROM (
        SELECT c.vec_id, c.embedding, c.nrm, c.rel,
               CAST({MMR_LAMBDA} AS DOUBLE) * c.rel
                 - CAST({MMR_DIVERSITY} AS DOUBLE) * MAX({cos}) AS mmr_score
        FROM (SELECT p.* FROM pool p
              WHERE p.vec_id NOT IN (SELECT vec_id FROM {prev})) c
        CROSS JOIN {prev} s
        GROUP BY c.vec_id, c.embedding, c.nrm, c.rel
      ) ORDER BY mmr_score DESC, vec_id LIMIT 1
    ),
    sel{rk} AS MATERIALIZED (
      SELECT * FROM {prev} UNION ALL SELECT * FROM pick{rk})"""
        )
    rounds_sql = ",".join(rounds)
    return f"""
    WITH pool AS MATERIALIZED (
      SELECT * FROM (
        SELECT e.vec_id, e.embedding,
               {sql_cosine_fixed('e.embedding', 'q.embedding')} AS rel,
               SQRT({sql_dot_fixed('e.embedding', 'e.embedding')}) AS nrm
        FROM embeddings e
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        WHERE e.vec_id <> 0
        ORDER BY rel DESC, e.vec_id LIMIT {MMR_POOL}
      )
    ),
    sel1 AS MATERIALIZED (
      SELECT vec_id, embedding, nrm, rel,
             CAST({MMR_LAMBDA} AS DOUBLE) * rel AS mmr_score,
             CAST(1 AS INT) AS rank
      FROM pool ORDER BY rel DESC, vec_id LIMIT 1
    ),
    {rounds_sql}
    SELECT rank, vec_id, rel, mmr_score
    FROM sel{MMR_K} ORDER BY rank
    """


@register(
    "sim_mmr_rerank",
    category="similarity",
    oracle=_mmr_oracle(),
    doc="Maximal-marginal-relevance re-rank of a retrieval pool: greedy "
    "selection of 8 results maximizing 0.7*relevance - 0.3*max-"
    "similarity-to-already-selected — the standard RAG diversification "
    "step after any top-k retriever (kills near-duplicate passages "
    "the retriever surfaces together). Scale: the corpus-sized work is "
    "exactly one TakeOrderedAndProject building the 50-row pool (at "
    "100 TB the pool instead comes from the IVF/LSH probes, cost "
    "unchanged); the greedy loop then runs on the CONSTANT-size pool — "
    "7 broadcast joins of <=50x8 rows each, data-independent of corpus "
    "size, with the pool localCheckpointed once so rounds never rescan "
    "the corpus. No collect: each round's argmax is a 1-row "
    "TakeOrdered, each selected set a broadcast.",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import sql_dot_fixed  # noqa: F401 (oracle twin)

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    rel = dot_fixed(F.col("embedding"), F.col("q_emb")) / (
        F.sqrt(dot_fixed(F.col("embedding"), F.col("embedding")))
        * F.sqrt(dot_fixed(F.col("q_emb"), F.col("q_emb")))
    )
    pool = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "embedding", rel.alias("rel"))
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(MMR_POOL)
        .withColumn(
            "nrm",
            F.sqrt(dot_fixed(F.col("embedding"), F.col("embedding"))),
        )
        # one materialization of the pool: the greedy rounds below
        # reference it 2x per round and must not re-run the corpus scan
        .localCheckpoint()
    )
    selected = (
        pool.orderBy(F.col("rel").desc(), "vec_id")
        .limit(1)
        .select(
            "vec_id",
            "embedding",
            "nrm",
            "rel",
            (F.lit(MMR_LAMBDA) * F.col("rel")).alias("mmr_score"),
            F.lit(1).cast("int").alias("rank"),
        )
        .localCheckpoint()
    )
    for rk in range(2, MMR_K + 1):
        cand = pool.join(
            F.broadcast(selected.select(F.col("vec_id").alias("s_id"))),
            F.col("vec_id") == F.col("s_id"),
            "left_anti",
        )
        sim = dot_fixed(F.col("embedding"), F.col("s_emb")) / (
            F.col("nrm") * F.col("s_nrm")
        )
        # cartesian of (<=50 candidates) x (<=7 selected): both sides
        # bounded constants, the selected side broadcast — this is the
        # documented tiny-dims crossJoin shape, not a data-sized one
        scored = cand.crossJoin(
            F.broadcast(
                selected.select(
                    F.col("embedding").alias("s_emb"),
                    F.col("nrm").alias("s_nrm"),
                )
            )
        ).select("vec_id", "embedding", "nrm", "rel", sim.alias("sim"))
        pick = (
            scored.groupBy("vec_id")
            .agg(
                F.first("embedding").alias("embedding"),
                F.first("nrm").alias("nrm"),
                F.first("rel").alias("rel"),
                F.max("sim").alias("max_sim"),
            )
            .select(
                "vec_id",
                "embedding",
                "nrm",
                "rel",
                (
                    F.lit(MMR_LAMBDA) * F.col("rel")
                    - F.lit(MMR_DIVERSITY) * F.col("max_sim")
                ).alias("mmr_score"),
            )
            .orderBy(F.col("mmr_score").desc(), "vec_id")
            .limit(1)
            .withColumn("rank", F.lit(rk).cast("int"))
        )
        # eager materialization keeps each round's plan constant-size
        # (selected appears twice per round; unchecked the lineage tree
        # would triple per iteration)
        selected = selected.unionByName(pick).localCheckpoint()
    return selected.select("rank", "vec_id", "rel", "mmr_score").orderBy(
        "rank"
    )


@register(
    "embedding_drift_monitor",
    category="vector",
    oracle="""
    WITH cells AS (
      SELECT vec_id % 2 AS split,
             CAST(pos AS INTEGER) AS pos,
             CAST(FLOOR(CAST(val AS DOUBLE) * 1000000) AS BIGINT) AS q
      FROM (
        SELECT vec_id,
               unnest(embedding) AS val,
               unnest(range(len(embedding))) AS pos
        FROM embeddings
      )
    ),
    sums AS (
      SELECT split, pos, CAST(SUM(q) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM cells GROUP BY split, pos
    ),
    means AS (
      SELECT pos,
             MAX(CASE WHEN split = 0 THEN
               CAST(FLOOR(1.0 * s / n) AS BIGINT) END) AS m_ref,
             MAX(CASE WHEN split = 1 THEN
               CAST(FLOOR(1.0 * s / n) AS BIGINT) END) AS m_prod
      FROM sums GROUP BY pos
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
             CAST(SUM(m_ref * m_prod) AS BIGINT) AS dot,
             CAST(SUM(m_ref * m_ref) AS BIGINT) AS qr,
             CAST(SUM(m_prod * m_prod) AS BIGINT) AS qp,
             CAST(MAX(ABS(m_ref - m_prod)) AS BIGINT) AS max_abs_delta
      FROM means
    ),
    top AS (
      SELECT CAST(MIN(m.pos) AS INTEGER) AS top_drift_dim
      FROM means m, agg a
      WHERE ABS(m.m_ref - m.m_prod) = a.max_abs_delta
    ),
    counts AS (
      SELECT CAST(COUNT(DISTINCT CASE WHEN vec_id % 2 = 0
                                      THEN vec_id END) AS BIGINT) AS n_ref,
             CAST(COUNT(DISTINCT CASE WHEN vec_id % 2 = 1
                                      THEN vec_id END) AS BIGINT) AS n_prod
      FROM embeddings
    )
    SELECT c.n_ref, c.n_prod, a.n_dims,
           CAST(FLOOR(1000.0 * a.dot / (SQRT(a.qr) * SQRT(a.qp)))
                AS BIGINT) AS cos_milli,
           a.max_abs_delta, tp.top_drift_dim
    FROM counts c, agg a, top tp
    """,
)
def embedding_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor — the MLOps check that a
    freshly-embedded production slice still lives where the reference
    corpus does (encoder version skew, upstream text drift): centroid
    cosine between the even-keyed (reference) and odd-keyed
    (production) halves, the largest per-dimension mean shift, and
    which dimension moved most. The embedding sibling of
    `corpus_drift_kl` (which monitors token distributions).

    Determinism: per-dimension sums fold FLOOR(val·1e6) int64 (the
    functions/vector.py fixed-point pattern); means divide via one
    correctly-rounded IEEE divide then FLOOR (exact <2^53 operands);
    the centroid cosine works on the int64 mean vectors — dot and norms
    exact, one sqrt/divide/FLOOR at the end. Argmax dimension breaks
    ties to the smallest index via max(struct(delta, -pos)).

    Scale: posexplode → groupBy(split, pos) partial-aggregates map-side
    — the shuffle carries 2·dims partial rows per task, independent of
    vector count (a billion vectors cost the same shuffle as a
    million); everything after runs on the dims-row mean table."""
    e = t(spark, sf_dir, "embeddings")
    cells = e.select(
        (F.col("vec_id") % 2).alias("split"),
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "split",
        "pos",
        F.floor(F.col("val").cast("double") * 1000000).cast("bigint").alias("q"),
    )
    sums = cells.groupBy("split", "pos").agg(
        F.sum("q").cast("bigint").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.floor(1.0 * F.col("s") / F.col("n")).cast("bigint")
    means = (
        sums.select("split", "pos", mean.alias("m"))
        .groupBy("pos")
        .agg(
            F.max(F.when(F.col("split") == 0, F.col("m"))).alias("m_ref"),
            F.max(F.when(F.col("split") == 1, F.col("m"))).alias("m_prod"),
        )
    )
    delta = F.abs(F.col("m_ref") - F.col("m_prod"))
    agg = means.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        F.sum(F.col("m_ref") * F.col("m_prod")).cast("bigint").alias("dot"),
        F.sum(F.col("m_ref") * F.col("m_ref")).cast("bigint").alias("qr"),
        F.sum(F.col("m_prod") * F.col("m_prod")).cast("bigint").alias("qp"),
        F.max(delta).cast("bigint").alias("max_abs_delta"),
        (-F.max(F.struct(delta.alias("d"), (-F.col("pos")).alias("np"))).getField("np"))
        .cast("int")
        .alias("top_drift_dim"),
    )
    counts = e.agg(
        F.countDistinct(
            F.when(F.col("vec_id") % 2 == 0, F.col("vec_id"))
        ).cast("bigint").alias("n_ref"),
        F.countDistinct(
            F.when(F.col("vec_id") % 2 == 1, F.col("vec_id"))
        ).cast("bigint").alias("n_prod"),
    )
    return counts.crossJoin(F.broadcast(agg)).select(
        "n_ref",
        "n_prod",
        "n_dims",
        F.floor(
            1000.0 * F.col("dot") / (F.sqrt("qr") * F.sqrt("qp"))
        ).cast("bigint").alias("cos_milli"),
        "max_abs_delta",
        "top_drift_dim",
    )
