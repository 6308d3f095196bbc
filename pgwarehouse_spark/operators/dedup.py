"""Deduplication operators over ``documents`` / ``embeddings`` — the
large-scale training-data-pipeline surface: exact dedup, n-gram Jaccard,
MinHash+LSH, SimHash, and embedding-cosine near-dup.

All stages are built-in DataFrame ops (no Python UDFs): shingling is
`split`+`transform`, MinHash is `array_min` over `xxhash64`, banding is
an `explode`+self-join inverted index, verification is `array_intersect`
on candidate pairs only. At 100 TB the LSH path is the one that scales —
the candidate join shuffles O(b·N) band keys instead of O(N²) pairs, and
exact verification touches only the (tiny) candidate set.

Oracle SQL mirrors the *semantics* (exact Jaccard over the same
shingles) — for MinHash+LSH the banding parameters (48 hashes, 12 bands
× 4 rows) make P(miss) < 1e-4 for any pair at the 0.8 threshold, so the
verified output equals the exact answer on real data.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vector import dot_exact, dot_fixed, sql_cosine, sql_cosine_fixed
from ..registry import register
from ._helpers import t
from .textstats import fingerprint_expr

NUM_HASHES = 48
LSH_BANDS = 12
LSH_ROWS = 4  # NUM_HASHES = LSH_BANDS * LSH_ROWS
JACCARD_THRESHOLD = 0.8
SHINGLE_WIDTH = 3  # word n-grams


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    category="dedup",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id, md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS fp
      FROM documents
    )
    SELECT fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM fp GROUP BY fp
    ORDER BY keep_doc_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized md5 fingerprint, keeping
    the lowest doc_id per group. One shuffle on a 128-bit key — the
    canonical first pass of any pretraining dedup pipeline."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", fingerprint_expr(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keep_doc_id")
    )


# ---------------------------------------------------------------------------
# Exact substring-span dedup (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — their suffix-array exact-substring
# pass, approximated with strided token windows so it stays one
# explode + one groupBy on Spark)
# ---------------------------------------------------------------------------

_SPAN_W = 20  # tokens per window
# stride MUST be 1 for an exactness guarantee: with stride s > 1 the two
# documents' windows only align when the shared run's start offsets are
# congruent mod s — misaligned runs of ANY length (even 1000 verbatim
# tokens) produce zero common fingerprints. Stride 1 fingerprints every
# window (one per token, still linear in corpus tokens) and catches
# every shared run >= W exactly. To cut cost at equal recall, the
# position-independent alternative is winnowing/content-defined anchors,
# not a positional stride.
_SPAN_STRIDE = 1


@register(
    "dedup_substring_spans",
    category="dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(TRIM(text), '\\s+') AS w
      FROM documents
    ),
    spans AS (
      SELECT doc_id,
             md5(array_to_string(w[i:i+{_SPAN_W - 1}], ' ')) AS fp
      FROM toks, UNNEST(generate_series(1, len(w) - {_SPAN_W - 1},
                                        {_SPAN_STRIDE})) AS t(i)
    )
    SELECT fp,
           COUNT(DISTINCT doc_id) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           MIN(doc_id) AS min_doc
    FROM spans GROUP BY fp
    HAVING COUNT(DISTINCT doc_id) > 1
    ORDER BY min_doc, fp
    """,
    doc="Exact substring-span dedup (Lee et al. 2022's exact-substring "
    f"pass): md5 fingerprints of every {_SPAN_W}-token window (stride "
    "1); a fingerprint seen in >1 document marks a verbatim "
    "cross-document span — the boilerplate/quotation duplication that "
    "document-level Jaccard misses when the surrounding text differs. "
    f"Catches every shared run of >= {_SPAN_W} tokens exactly, at any "
    "alignment.",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one fingerprint per token (32-byte md5 + doc_id), one
    shuffle on the fingerprint with map-side partial aggregation —
    linear in corpus tokens. Stride 1 is what makes the guarantee exact
    for runs ≥ W at ANY alignment (a positional stride only matches
    runs whose start offsets are congruent mod the stride); the cheaper
    equal-recall option is winnowing/content-defined anchor selection.
    The full suffix-array construction is the non-Spark-native
    alternative; this is the shape that distributes."""
    d = t(spark, sf_dir, "documents")
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(tokens)
    starts = F.when(
        n >= _SPAN_W,
        F.sequence(F.lit(1), n - (_SPAN_W - 1), F.lit(_SPAN_STRIDE)),
    ).otherwise(F.array().cast("array<int>"))
    spans = d.select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice(tokens, i, _SPAN_W)).cast("binary")
                ),
            )
        ).alias("fp"),
    )
    return (
        spans.groupBy("fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("min_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("min_doc", "fp")
    )


# ---------------------------------------------------------------------------
# Shingling (shared by Jaccard / MinHash / SimHash)
# ---------------------------------------------------------------------------


def shingles_expr(text: Column, width: int = SHINGLE_WIDTH) -> Column:
    """Distinct word n-gram shingles as an array column (JVM-side).

    Built as a zip of shifted slices, NOT an index lambda with
    element_at(words, i+k): expressions referenced inside a higher-order
    lambda are re-evaluated per element (no CSE across the lambda
    boundary), so the index form re-runs split() ~3n times per row —
    measured 10× slower. The zip form evaluates split O(width) times.
    """
    words = F.split(F.trim(text), r"\s+")
    n = F.size(words)
    shifted = [F.slice(words, 1 + off, n) for off in range(width)]
    zipped = F.arrays_zip(*shifted)
    grams = F.transform(
        zipped, lambda x: F.concat_ws(" ", *[x[str(k)] for k in range(width)])
    )
    # Trailing zip entries are partial grams (null-padded) — cut them off.
    return F.array_distinct(
        F.slice(grams, 1, F.greatest(n - (width - 1), F.lit(0)))
    )


def hashed_shingles_expr(text: Column, width: int = SHINGLE_WIDTH) -> Column:
    """Distinct word n-gram shingles as array<long> — no trigram STRINGS
    are ever built: each word hashes to a long once, then a gram is
    xxhash64 of its word-hashes. For set-based consumers (MinHash,
    SimHash, exact verify via array_intersect) this is equivalent to the
    string form — distinct-set cardinalities match up to a 2^-64
    collision — while skipping millions of per-gram string allocations
    and shrinking the cached arrays ~8×. `shingles_expr` (strings)
    remains for `dedup_ngram_jaccard`, whose SQL oracle joins on the
    shingle TEXT."""
    words = F.split(F.trim(text), r"\s+")
    wh = F.transform(words, lambda w: F.xxhash64(w))
    n = F.size(wh)
    shifted = [F.slice(wh, 1 + off, n) for off in range(width)]
    zipped = F.arrays_zip(*shifted)
    grams = F.transform(
        zipped, lambda x: F.xxhash64(*[x[str(k)] for k in range(width)])
    )
    return F.array_distinct(
        F.slice(grams, 1, F.greatest(n - (width - 1), F.lit(0)))
    )


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", shingles_expr(F.col("text")).alias("shingles"))


def _shingled_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", hashed_shingles_expr(F.col("text")).alias("shingles")
    )


# DuckDB-side shingles (list_zip with shifted slices; zip pads with NULL
# so trailing partial grams drop out via the IS NOT NULL filter).
SQL_SHINGLES = r"""
    words AS (
      SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS w FROM documents
    ),
    sh0 AS (
      SELECT doc_id,
             unnest([x[1] || ' ' || x[2] || ' ' || x[3]
                     for x in list_zip(w, w[2:], w[3:])]) AS s
      FROM words
    ),
    sh AS (SELECT DISTINCT doc_id, s FROM sh0 WHERE s IS NOT NULL),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)
"""

_SQL_EXACT_JACCARD = f"""
    WITH {SQL_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id1, id2, n_shared,
           CAST(n_shared AS DOUBLE) / (s1.n + s2.n - n_shared) AS jaccard
    FROM pairs
    JOIN sizes s1 ON pairs.id1 = s1.doc_id
    JOIN sizes s2 ON pairs.id2 = s2.doc_id
    WHERE CAST(n_shared AS DOUBLE) / (s1.n + s2.n - n_shared) >= {JACCARD_THRESHOLD}
    ORDER BY id1, id2
"""


def ngram_jaccard_pairs(
    sh: DataFrame, max_shingle_freq: int | None = None
) -> DataFrame:
    """Inverted-index exact Jaccard over a (doc_id, shingles) frame.

    ``max_shingle_freq`` is the hot-shingle guard (same production cap
    as its LSH sibling's ``max_bucket``, lsh_candidate_pairs): the
    self-join is quadratic WITHIN a shingle's posting list, so one
    boilerplate shingle shared by c documents alone emits c·(c-1)/2
    pairs. Shingles whose document frequency exceeds the cap are
    dropped from the index, the pair counts, AND the per-doc sizes —
    i.e. the result is exact Jaccard over the stopword-filtered shingle
    sets (deterministic, order-independent semantics, analogous to IDF
    pruning). None keeps exact parity with the SQL oracle."""
    exploded = sh.select("doc_id", F.explode("shingles").alias("s"))
    if max_shingle_freq is not None:
        w_s = W.partitionBy("s")
        # localCheckpoint, not cache(): the frame is self-joined below,
        # and a cache() here (reached from long-lived sessions and the
        # streaming near-dup filter) is never unpersisted — CacheManager
        # would pin one corpus-sized shingle relation per call
        exploded = (
            exploded.withColumn("df_s", F.count(F.lit(1)).over(w_s))
            .filter(F.col("df_s") <= max_shingle_freq)
            .drop("df_s")
            .localCheckpoint()
        )
        sizes = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    else:
        sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    jaccard = F.col("n_shared").cast("double") / (
        F.col("s1.n") + F.col("s2.n") - F.col("n_shared")
    )
    return (
        pairs.join(s1, F.col("id1") == F.col("s1.doc_id"))
        .join(s2, F.col("id2") == F.col("s2.doc_id"))
        .select("id1", "id2", "n_shared", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("id1", "id2")
    )


@register("dedup_ngram_jaccard", category="dedup", oracle=_SQL_EXACT_JACCARD)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted shingle index:
    explode distinct shingles, self-join on shingle (only docs sharing a
    shingle ever meet), count shared, compute |∩|/|∪|. The exact
    baseline the sketch methods approximate; at 100 TB you run
    dedup_minhash_lsh instead (same output, bounded candidates) or pass
    ``max_shingle_freq`` to `ngram_jaccard_pairs` to cap hot posting
    lists."""
    return ngram_jaccard_pairs(_shingled(spark, sf_dir))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures_df(
    shingled: DataFrame, num_hashes: int = NUM_HASHES
) -> DataFrame:
    """(doc_id, sig array<long>) as a pure per-row expression: each
    shingle hashes to a long once, then `num_hashes` seeded re-hash +
    array_min passes — the SAME hash chain (xxhash64(xxhash64(s), j))
    the previous explode + groupBy form computed, so signatures (and
    therefore LSH candidate sets) are bit-identical (verified doc-by-doc
    at sf0.1).

    r9 shape (guide §2.4 "remove shuffles outright"): the explode +
    48-min-aggregate form shuffled one row per (doc, shingle) — O(corpus
    tokens) rows through an exchange — to compute something that never
    needed rows from more than one document. The array form runs inside
    the scan/projection stage with NO exchange at any scale; measured
    1.24 -> 0.86 s at sf0.1 for the signature pass and 1.99 -> 1.29 s
    for the full LSH+verify chain it feeds. Docs with empty shingle sets
    are filtered (the exploded form dropped them by construction —
    without the filter they would share all-NULL band hashes and
    quadratically pair with each other)."""
    hashed = F.transform("shingles", lambda s: F.xxhash64(s))
    sig = F.array(
        *[
            F.array_min(F.transform(hashed, lambda h: F.xxhash64(h, F.lit(j))))
            for j in range(num_hashes)
        ]
    )
    return shingled.filter(F.size("shingles") > 0).select(
        "doc_id", sig.alias("sig")
    )


def band_keys(
    sig_df: DataFrame, bands: int = LSH_BANDS, rows: int = LSH_ROWS
) -> DataFrame:
    """(doc_id, band_id, band_hash): one row per LSH band — the posting
    key of the banded index. Shared by the self-join (batch dedup) and
    the delta→corpus join (incremental dedup)."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_id"),
                F.xxhash64(
                    *[
                        F.element_at("sig", bi * rows + ri + 1)
                        for ri in range(rows)
                    ]
                ).alias("band_hash"),
            )
            for bi in range(bands)
        ]
    )
    return sig_df.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", "b.band_id", "b.band_hash"
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    max_bucket: int | None = None,
    materialize: str = "cache",
) -> DataFrame:
    """Banded LSH: hash each r-row slice of the signature, explode to
    (band_id, band_hash), self-join. Returns distinct (id1, id2)
    candidate pairs with id1 < id2. The self-join shuffles O(bands·N)
    small keys — never O(N²) across buckets; WITHIN a bucket the pair
    count is quadratic in bucket size, which is where real corpora bite:
    boilerplate (empty pages, licence headers, template chrome) lands
    thousands of near-identical docs in one bucket and that single hot
    key degenerates to O(c²). ``max_bucket`` is the standard production
    guard — buckets larger than the cap are dropped entirely (their
    members are boilerplate you'd dedup by exact-hash first, and any
    genuinely-similar pair this skips still has 11 other bands to
    collide in). None (the default, used by the registered queries)
    keeps exact parity with the oracle.

    ``materialize`` — how the banded frame is pinned before the
    self-join (without pinning, both join sides recompute the entire
    shingle→signature lineage, 2× the pipeline cost). "cache" for
    one-shot batch queries; "localCheckpoint" for REPEATED callers
    (the streaming ingest filter): a cache() inside foreachBatch is
    never unpersisted and CacheManager pins one relation per
    micro-batch forever, while checkpointed RDDs are released by the
    ContextCleaner once unreferenced. At cluster scale this would be a
    reliable checkpoint/staging write."""
    banded = band_keys(sig_df, bands, rows)
    if materialize == "cache":
        banded = banded.localCheckpoint()
    elif materialize == "localCheckpoint":
        banded = banded.localCheckpoint(eager=True)
    if max_bucket is not None:
        w = W.partitionBy("band_id", "band_hash")
        banded = (
            banded.withColumn("bucket_n", F.count(F.lit(1)).over(w))
            .filter(F.col("bucket_n") <= max_bucket)
            .drop("bucket_n")
        )
    x = banded.alias("x")
    y = banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("id1"), F.col("y.doc_id").alias("id2"))
        .distinct()
    )


def verified_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shingle → MinHash(48) → 12×4 banded LSH → candidate pairs → exact
    Jaccard verification via array_intersect on candidates only. Returns
    (id1, id2, n_shared, jaccard) with id1 < id2, jaccard ≥ threshold."""
    return verified_pairs_from_shingled(_shingled_hashed(spark, sf_dir).localCheckpoint())


def verified_pairs_from_shingled(
    sh: DataFrame, materialize: str = "cache"
) -> DataFrame:
    """The LSH→verify core over an arbitrary (doc_id, shingles) frame
    (used by the full-corpus query and the within-batch incremental
    pass). ``materialize`` is forwarded to `lsh_candidate_pairs` —
    repeated callers (foreachBatch) must pass "localCheckpoint", see
    there."""
    sigs = minhash_signatures_df(sh)
    candidates = lsh_candidate_pairs(sigs, materialize=materialize)
    s1 = sh.alias("s1")
    s2 = sh.alias("s2")
    inter = F.size(F.array_intersect(F.col("s1.shingles"), F.col("s2.shingles")))
    union = (
        F.size(F.col("s1.shingles")) + F.size(F.col("s2.shingles")) - inter
    )
    return (
        candidates.join(s1, F.col("id1") == F.col("s1.doc_id"))
        .join(s2, F.col("id2") == F.col("s2.doc_id"))
        .select(
            "id1",
            "id2",
            inter.cast("bigint").alias("n_shared"),  # COUNT in SQL is bigint
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@register(
    "dedup_minhash_lsh",
    category="dedup",
    oracle=_SQL_EXACT_JACCARD,
    doc="MinHash+LSH near-dup with exact verification. The oracle is the "
    "exact-Jaccard SQL: with 12 bands × 4 rows, P(missing a pair at "
    "jaccard 0.8) ≈ (1-0.8^4)^12 < 1.3e-4, and observed near-dups sit at "
    "~0.99 where P(miss) < 1e-12 — the verified candidate set equals the "
    "exact answer.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path: shingle → MinHash(48) → 12×4 banded LSH →
    candidate pairs → exact Jaccard verification via array_intersect on
    candidates only."""
    return verified_near_dup_pairs(spark, sf_dir).orderBy("id1", "id2")


# ---------------------------------------------------------------------------
# Incremental dedup: delta batch vs existing corpus
# ---------------------------------------------------------------------------

# deterministic batch split: docs with doc_id % MOD == REM are "the new
# batch"; everything else is "the existing corpus". Scale-proportional at
# any SF, and stable (a given doc is always in the same side).
_DELTA_MOD = 5
_DELTA_REM = 3

_SQL_INCREMENTAL_DELTA = f"""
    WITH {SQL_SHINGLES},
    pairs AS (
      SELECT a.doc_id AS new_doc_id, b.doc_id AS corpus_doc_id,
             COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.s = b.s
      WHERE a.doc_id % {_DELTA_MOD} = {_DELTA_REM}
        AND b.doc_id % {_DELTA_MOD} <> {_DELTA_REM}
      GROUP BY 1, 2
    )
    SELECT new_doc_id, corpus_doc_id,
           CAST(n_shared AS DOUBLE) / (s1.n + s2.n - n_shared) AS jaccard
    FROM pairs
    JOIN sizes s1 ON pairs.new_doc_id = s1.doc_id
    JOIN sizes s2 ON pairs.corpus_doc_id = s2.doc_id
    WHERE CAST(n_shared AS DOUBLE) / (s1.n + s2.n - n_shared)
          >= {JACCARD_THRESHOLD}
    ORDER BY new_doc_id, corpus_doc_id
"""


def incremental_near_dup_pairs(
    sh_corpus: DataFrame,
    sh_delta: DataFrame,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Delta→corpus near-dup matches via the banded MinHash index: band
    keys of the NEW batch join the corpus's band index, candidates are
    exact-verified with array_intersect. Returns (new_doc_id,
    corpus_doc_id, jaccard) at ≥ threshold.

    This is the continuously-ingesting pipeline's shape: at 100 TB the
    corpus band index is a precomputed, bucketed table maintained by
    each batch (append bands of accepted docs); per batch only
    O(bands·|delta|) keys shuffle — never the corpus, never all-pairs.
    The corpus side is built in-query when ``corpus_bands`` is None
    (the registered query must be self-contained); the streaming filter
    passes the MAINTAINED index instead
    (streaming/events.py::stream_near_dup_filter), so the corpus is
    never re-shingled per batch."""
    if corpus_bands is None:
        corpus_bands = band_keys(minhash_signatures_df(sh_corpus))
    sig_d = minhash_signatures_df(sh_delta)
    bc = corpus_bands.alias("bc")
    bd = band_keys(sig_d).alias("bd")
    candidates = (
        bd.join(
            bc,
            (F.col("bd.band_id") == F.col("bc.band_id"))
            & (F.col("bd.band_hash") == F.col("bc.band_hash")),
        )
        .select(
            F.col("bd.doc_id").alias("new_doc_id"),
            F.col("bc.doc_id").alias("corpus_doc_id"),
        )
        .distinct()
    )
    s1 = sh_delta.alias("s1")
    s2 = sh_corpus.alias("s2")
    inter = F.size(F.array_intersect(F.col("s1.shingles"), F.col("s2.shingles")))
    union = F.size(F.col("s1.shingles")) + F.size(F.col("s2.shingles")) - inter
    return (
        candidates.join(s1, F.col("new_doc_id") == F.col("s1.doc_id"))
        .join(s2, F.col("corpus_doc_id") == F.col("s2.doc_id"))
        .select(
            "new_doc_id",
            "corpus_doc_id",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def _split_delta(spark: SparkSession, sf_dir: str):
    sh = _shingled_hashed(spark, sf_dir).localCheckpoint()
    is_new = F.col("doc_id") % _DELTA_MOD == _DELTA_REM
    return sh.filter(~is_new), sh.filter(is_new)


@register(
    "dedup_incremental_delta",
    category="dedup",
    oracle=_SQL_INCREMENTAL_DELTA,
    doc="Incremental near-dup: which docs of the NEW batch (doc_id % "
    f"{_DELTA_MOD} == {_DELTA_REM}) near-dup an EXISTING corpus doc — "
    "banded-index join of delta bands against corpus bands, exact "
    "verification on candidates. Oracle is the exact delta×corpus "
    "Jaccard (same miss-probability argument as dedup_minhash_lsh).",
)
def dedup_incremental_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, delta = _split_delta(spark, sf_dir)
    return incremental_near_dup_pairs(corpus, delta).orderBy(
        "new_doc_id", "corpus_doc_id"
    )


_SQL_INCREMENTAL_SURVIVORS = f"""
    WITH {SQL_SHINGLES},
    jac AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
      WHERE a.doc_id % {_DELTA_MOD} = {_DELTA_REM}
      GROUP BY 1, 2
    ),
    dropped AS (
      SELECT DISTINCT id1 AS new_doc_id FROM jac
      JOIN sizes s1 ON jac.id1 = s1.doc_id
      JOIN sizes s2 ON jac.id2 = s2.doc_id
      WHERE CAST(n_shared AS DOUBLE) / (s1.n + s2.n - n_shared)
            >= {JACCARD_THRESHOLD}
        AND (id2 % {_DELTA_MOD} <> {_DELTA_REM} OR id2 < id1)
    )
    SELECT doc_id FROM documents
    WHERE doc_id % {_DELTA_MOD} = {_DELTA_REM}
      AND doc_id NOT IN (SELECT new_doc_id FROM dropped)
    ORDER BY doc_id
"""


@register(
    "dedup_incremental_survivors",
    category="dedup",
    oracle=_SQL_INCREMENTAL_SURVIVORS,
    doc="The ingest filter itself: new-batch docs to APPEND — no near-dup "
    "in the corpus AND no near-dup to a lower-id doc within the batch "
    "(first-seen wins inside a batch). Composes the delta→corpus banded "
    "join with a within-delta LSH pass; anti joins remove the matched.",
)
def dedup_incremental_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At scale both match sets are O(delta)-sized; the two left-anti
    joins are build-side-small and the corpus is touched only through
    its band index (see incremental_near_dup_pairs)."""
    corpus, delta = _split_delta(spark, sf_dir)
    vs_corpus = incremental_near_dup_pairs(corpus, delta).select(
        F.col("new_doc_id").alias("doc_id")
    )
    within = verified_pairs_from_shingled(delta).select(
        F.col("id2").alias("doc_id")  # id1 < id2 → later id drops
    )
    return (
        delta.select("doc_id")
        .join(vs_corpus, "doc_id", "left_anti")
        .join(within, "doc_id", "left_anti")
        .orderBy("doc_id")
    )


@register(
    "dedup_clusters",
    category="dedup",
    oracle=f"""
    WITH RECURSIVE {SQL_SHINGLES},
    p0 AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT id1, id2 FROM p0
      JOIN sizes s1 ON p0.id1 = s1.doc_id
      JOIN sizes s2 ON p0.id2 = s2.doc_id
      WHERE CAST(n_shared AS DOUBLE) / (s1.n + s2.n - n_shared)
            >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT id1 AS u, id2 AS v FROM pairs
      UNION ALL SELECT id2, id1 FROM pairs
    ),
    closure(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT c.a, e.v FROM closure c JOIN edges e ON c.b = e.u
    )
    SELECT a AS doc_id, MIN(b) AS cluster_id
    FROM closure GROUP BY a ORDER BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: connected components over the verified
    near-dup pairs via alternating large-star/small-star contraction
    (`connected_components`) — every document gets the min doc_id of its
    component (singletons keep their own id). Each round is two
    join+groupBy passes over pair-sized (long, long) frames; the
    driver-side loop checks one edge-set signature per round — the
    iterative pattern Spark SQL alone can't express (DuckDB needs WITH
    RECURSIVE; the oracle uses exactly that).

    At 100 TB: round count is O(log²) in component size even for
    chain-shaped or skewed components (vs O(diameter) for plain one-hop
    min propagation), edges are per-pair longs, and per-round caches
    are released as soon as the next round materializes."""
    return cluster_labels(spark, sf_dir).orderBy("doc_id")


# rounds used by the most recent connected_components call (test/obs hook);
# 0 means the driver union-find path ran (no contraction rounds needed)
LAST_CC_ROUNDS: int = 0

# Size gate for the driver-side union-find fast path (r9 optimization,
# guide §1.2 "the distributed algorithm" + §5 driver rules): below this
# many DISTINCT canonical edges, components are computed on the driver —
# the same bounded-collect class as a broadcast hash relation (Spark
# itself collects up to 8 GB / 512M rows to the driver for every
# broadcast join; 2M (long,long) edges ≈ 32 MB). The distributed
# large-star/small-star contraction remains the path for bigger edge
# sets, so nothing data-sized is ever collected: the gate is checked
# with take(cap+1), which aborts as soon as cap+1 rows exist.
#
# Why this wins: the contraction loop costs ~4-6 Spark jobs per round
# (two star passes × two exchanges + eager checkpoint + convergence
# signature) — measured 4.5 s for a 241-edge pair graph at sf0.1 while
# the union-find over the same edges is sub-millisecond. At 100 TB the
# verified near-dup pair set (post exact-collapse) is exactly the kind
# of heavy-tailed but edge-sparse graph that routinely fits the gate;
# when it does not, the O(log²)-round contraction takes over unchanged.
#
# Default 250k (r10, ADVICE r9): the edges now cross as ONE Arrow batch
# (two primitive columns), but the union-find itself and the result
# build are driver-side Python dict work — 250k edges is comfortably
# sub-second there, while the old 2M default left multi-second
# single-threaded driver stalls (and, before the Arrow switch, hundreds
# of MB of Row objects) on the table for edge sets just under the gate.
CC_DRIVER_MAX_EDGES = int(
    os.environ.get("SPARK_GRAFT_CC_DRIVER_MAX_EDGES", "250000")
)


def _driver_union_find(spark: SparkSession, edge_rows, id_type) -> DataFrame:
    """Union-find with path compression over collected (a, b) edge rows;
    roots are always the component-min id (unions attach the larger root
    under the smaller), so labels equal the distributed contraction's
    min-label output exactly. Returns (doc_id, cluster_id) for every
    node incident to an edge — the same contract as the star loop."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if ra < rb:
            parent[rb] = ra
        else:
            parent[ra] = rb
    nodes = set()
    for a, b in edge_rows:
        nodes.add(a)
        nodes.add(b)
    out = [(n, find(n)) for n in sorted(nodes)]
    schema = T.StructType(
        [
            T.StructField("doc_id", id_type),
            T.StructField("cluster_id", id_type),
        ]
    )
    return spark.createDataFrame(out, schema)


def connected_components(
    pairs: DataFrame, max_rounds: int = 30, driver_max_edges: int | None = None
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    2014): each round rewires every node toward its neighborhood min,
    which contracts components to min-rooted stars in O(log²) rounds —
    versus O(diameter) for one-hop min-label propagation, the
    difference between 6 rounds and hundreds on chain-shaped or skewed
    components.

    large-star: for each node u, every LARGER neighbor v re-attaches to
    m = min(Γ(u) ∪ {u}). small-star: on (big→small)-oriented edges,
    the big endpoint and all its smaller neighbors attach to the min.
    Both preserve connectivity; a component is converged when it is a
    star whose center is its min node — then both operations are
    no-ops and the edge-set signature (count + order-independent xor of
    edge hashes) stops changing.

    Each round materializes via localCheckpoint, not cache: a round
    references its input twice (the symmetric union), so an uncut
    lineage doubles per round and the logical plan grows exponentially —
    checkpointing truncates it to the materialized frame. On a cluster
    this is the same pattern with reliable checkpoint/staging writes.

    Input: (id1, id2) pairs. Output: (doc_id, cluster_id = component
    min) for every node incident to an edge. Every step is a
    DataFrame join/groupBy — shuffles scale with edge count, and the
    per-round frames are cached then released."""
    global LAST_CC_ROUNDS
    # canonical big→small orientation, self-loops dropped
    canon = (
        pairs.select(
            F.greatest("id1", "id2").alias("a"), F.least("id1", "id2").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    cap = CC_DRIVER_MAX_EDGES if driver_max_edges is None else driver_max_edges
    if cap > 0:
        # Gate probe (r10, ADVICE r9): canon is persisted so the probe's
        # distinct pass is paid once — over-gate graphs reuse the cached
        # partitions at the localCheckpoint below instead of recomputing
        # the heaviest pre-CC stage; and the capped head crosses as ONE
        # Arrow batch of two primitive columns (limit().toPandas()), not
        # cap+1 py4j Row objects (~100+ bytes each — the old take() put
        # hundreds of MB of Python heap on the driver at the 2M gate).
        canon = canon.persist()
        head = canon.limit(cap + 1).toPandas()
        if len(head) <= cap:
            LAST_CC_ROUNDS = 0
            id_type = canon.schema["a"].dataType
            edge_rows = list(zip(head["a"].tolist(), head["b"].tolist()))
            out = _driver_union_find(pairs.sparkSession, edge_rows, id_type)
            canon.unpersist()
            return out
        edges = canon.localCheckpoint(eager=True)
        canon.unpersist()
    else:
        edges = canon.localCheckpoint(eager=True)

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        # NO distinct here (r9, guide §2.4): the output feeds small_star,
        # whose min-aggregate and final distinct are insensitive to
        # duplicate rows — the dedup exchange the distinct would add per
        # round is pure overhead (the duplicates are bounded by |sym|,
        # and the map-side partial min/distinct aggregation compacts
        # them before the shuffle anyway).
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))  # larger neighbors re-attach
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        mins = e.groupBy("a").agg(F.min("b").alias("m"))
        moved = (
            e.join(mins, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("x"), F.col("m").alias("y"))
        )
        center = mins.select(F.col("a").alias("x"), F.col("m").alias("y"))
        return (
            moved.unionAll(center)
            .select(F.greatest("x", "y").alias("a"), F.least("x", "y").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def signature(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev_sig = signature(edges)
    rounds = 0
    for _ in range(max_rounds):
        new_edges = small_star(large_star(edges)).localCheckpoint(eager=True)
        sig = signature(new_edges)
        rounds += 1
        edges = new_edges
        if sig == prev_sig:
            break
        prev_sig = sig
    LAST_CC_ROUNDS = rounds

    # converged star forest: each edge points a member at its component
    # min; centers label themselves
    members = edges.select(F.col("a").alias("doc_id"), F.col("b").alias("cluster_id"))
    centers = edges.select(F.col("b").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    )
    return members.unionAll(centers).groupBy("doc_id").agg(
        F.min("cluster_id").alias("cluster_id")
    )


def cluster_labels(
    spark: SparkSession, sf_dir: str, *, with_pairs: bool = False
):
    """(doc_id, cluster_id) via large-star/small-star connected
    components over the verified near-dup pairs — see dedup_clusters.
    With ``with_pairs=True`` returns ``(labels, pairs)`` where pairs is
    the verified representative pair list the components were built
    from, localCheckpointed so a consumer auditing against it (e.g.
    split_leakage_safe) does not re-run the LSH/verify pass.

    EXACT duplicates are collapsed before any shingling (one md5 groupBy
    over the exact word sequence; min doc_id per key is the
    representative): two word-identical docs have identical shingle sets
    and Jaccard 1, so they are always near-dup-connected, and any edge
    between copies exists iff the same edge exists between
    representatives (identical shingle sets). Components over representatives therefore expand EXACTLY to
    components over all docs, and because each representative is its
    group's min id, the expanded cluster_id (component min) is
    unchanged. On duplicate-heavy corpora — the ones dedup exists for —
    this removes the quadratic candidate blowup inside exact-duplicate
    groups: c copies of a doc otherwise contribute c·(c-1)/2 verified
    pairs that say nothing; collapsed, the LSH/verify/CC cost tracks
    the number of UNIQUE texts (measured at the sf1 replica: 4.7×→
    near-linear slope). Only edge-incident representatives enter the CC
    loop; untouched docs rejoin labeled by their representative."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    # The collapse key must coincide with shingle-set equality, not the
    # reporting fingerprint: shingling is case-SENSITIVE and whitespace-
    # collapsing (TRIM + \s+ split), so the key is md5 over the exact
    # word sequence. Docs that cannot produce a shingle (NULL text or
    # fewer than SHINGLE_WIDTH words) have empty shingle sets — Jaccard
    # never links them (0-size union), so they must NOT collapse with
    # their byte-identical twins: they get a per-doc sentinel key.
    words = F.split(F.trim(F.col("text")), r"\s+")
    collapsible = F.col("text").isNotNull() & (
        F.size(words) >= SHINGLE_WIDTH
    )
    key = F.when(
        collapsible, F.md5(F.concat_ws(" ", words).cast("binary"))
    ).otherwise(F.concat(F.lit("solo:"), F.col("doc_id").cast("string")))
    fp = d.select("doc_id", key.alias("fp"))
    reps = fp.groupBy("fp").agg(F.min("doc_id").alias("rep"))
    membership = fp.join(reps, "fp").select("doc_id", "rep")
    rep_docs = d.join(
        reps.select(F.col("rep").alias("doc_id")), "doc_id", "left_semi"
    )
    sh = rep_docs.select(
        "doc_id", hashed_shingles_expr(F.col("text")).alias("shingles")
    ).localCheckpoint()
    pairs = verified_pairs_from_shingled(sh).select("id1", "id2")
    if with_pairs:
        pairs = pairs.localCheckpoint(eager=True)
    labels = connected_components(pairs).select(
        F.col("doc_id").alias("rep"), "cluster_id"
    )
    out = (
        membership.join(labels, "rep", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("rep")).alias("cluster_id"),
        )
    )
    return (out, pairs) if with_pairs else out


@register(
    "dedup_survivors",
    category="dedup",
    oracle=f"""
    WITH RECURSIVE {SQL_SHINGLES},
    p0 AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT id1, id2 FROM p0
      JOIN sizes s1 ON p0.id1 = s1.doc_id
      JOIN sizes s2 ON p0.id2 = s2.doc_id
      WHERE CAST(n_shared AS DOUBLE) / (s1.n + s2.n - n_shared)
            >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT id1 AS u, id2 AS v FROM pairs
      UNION ALL SELECT id2, id1 FROM pairs
    ),
    closure(a, b) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT c.a, e.v FROM closure c JOIN edges e ON c.b = e.u
    ),
    labels AS (
      SELECT a AS doc_id, MIN(b) AS cluster_id FROM closure GROUP BY a
    )
    SELECT cluster_id AS keep_doc_id, COUNT(*) AS n_members
    FROM labels GROUP BY cluster_id ORDER BY keep_doc_id
    """,
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus after near-dup removal: one representative (min doc_id)
    per cluster with its member count — the `keep_doc_id` set IS the
    deduplicated training corpus; joining it back to documents is a
    broadcast semi join. Reuses the label-propagation labels; the final
    aggregation shuffles one (long, long) row per document."""
    labels = cluster_labels(spark, sf_dir)
    return (
        labels.groupBy(F.col("cluster_id").alias("keep_doc_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("keep_doc_id")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
# Measured on the fixture: true near-dups (jaccard ≥ 0.8) land at hamming
# ≤ 14 (one ~0.8 outlier at 31 — beyond any simhash's reach); random pairs
# start at ~20. 14 separates cleanly.
SIMHASH_HAMMING_MAX = 14
SIMHASH_BAND_CHUNKS = 8  # 8 chunks × 8 bits: clean-chunk guaranteed ≤ 7 flips


def simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document: hash each distinct shingle, accumulate
    ±1 per bit position, take the sign bit-vector. One explode + one
    groupBy with 64 codegen'd conditional sums.

    Features are word n-gram shingles, not words: this corpus has a tiny
    vocabulary (~40 words), so word-level bit sums hover near zero and
    flip under small edits; shingle sets (~120/doc, 99% overlap for
    near-dups) keep signatures stable."""
    d = t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(hashed_shingles_expr(F.col("text"))).alias("h"),
    )
    bit_sums = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", k).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{k}")
            for k in range(SIMHASH_BITS)
        ]
    )
    sim = F.lit(0).cast("long")
    for k in range(SIMHASH_BITS):
        sim = sim.bitwiseOR(
            F.when(
                F.col(f"b{k}") > 0, F.shiftleft(F.lit(1).cast("long"), k)
            ).otherwise(F.lit(0).cast("long"))
        )
    return bit_sums.select("doc_id", sim.alias("simhash"))


# Floor for the registered simhash recall verdict — identical to the
# assertion in tests/test_dedup.py.
SIMHASH_MIN_RECALL = 0.9

_SQL_SIMHASH_VERDICT = f"""
    SELECT id1, id2, n_shared, jaccard, TRUE AS recall_ok
    FROM ({_SQL_EXACT_JACCARD})
    ORDER BY id1, id2
"""


@register(
    "dedup_simhash",
    category="dedup",
    oracle=_SQL_SIMHASH_VERDICT,
    doc="SimHash near-dup: 64-bit signatures, 8×8-bit band LSH for "
    "candidates, exact Hamming-distance verification (bit_count of xor). "
    "The sketch is bit-level and engine-specific, so the registered "
    "query is a recall verdict (the agg_approx_distinct pattern): it "
    "emits the exact n-gram-Jaccard near-dup pairs — hash-matched "
    "against the SQL oracle — plus recall_ok = (fraction of exact pairs "
    "the simhash candidates caught >= 0.9), which the oracle pins to "
    "literal TRUE. Recall degradation turns the driver row red.",
)
def dedup_simhash_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs + simhash recall verdict. The verdict
    aggregate runs through a single-partition window over the near-dup
    PAIR set (the operator's small output, never the corpus)."""
    exact = ngram_jaccard_pairs(_shingled(spark, sf_dir))
    caught = dedup_simhash(spark, sf_dir).select("id1", "id2").withColumn(
        "caught", F.lit(1)
    )
    flags = exact.join(caught, ["id1", "id2"], "left")
    w_all = W.partitionBy(F.lit(1))
    n_caught = F.sum(F.coalesce(F.col("caught"), F.lit(0))).over(w_all)
    n_exact = F.count(F.lit(1)).over(w_all)
    return (
        flags.withColumn(
            "recall_ok",
            n_caught.cast("double") >= F.lit(SIMHASH_MIN_RECALL) * n_exact,
        )
        .select("id1", "id2", "n_shared", "jaccard", "recall_ok")
        .orderBy("id1", "id2")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the signature frame feeds BOTH sides of the banded self-join —
    # un-checkpointed, the shingle explode + 64-way bit-sum aggregation
    # ran twice (guide §3.3); one row per doc, so the materialization is
    # corpus-count-sized, not token-sized
    sims = simhash_df(spark, sf_dir).localCheckpoint()
    width = SIMHASH_BITS // SIMHASH_BAND_CHUNKS
    mask = (1 << width) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftright("simhash", c * width)
                .bitwiseAND(F.lit(mask))
                .alias("chunk_val"),
            )
            for c in range(SIMHASH_BAND_CHUNKS)
        ]
    )
    banded = sims.select("doc_id", "simhash", F.explode(chunks).alias("c")).select(
        "doc_id", "simhash", "c.chunk_id", "c.chunk_val"
    )
    x = banded.alias("x")
    y = banded.alias("y")
    hamming = F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash")))
    return (
        x.join(
            y,
            (F.col("x.chunk_id") == F.col("y.chunk_id"))
            & (F.col("x.chunk_val") == F.col("y.chunk_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("id1"),
            F.col("y.doc_id").alias("id2"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .orderBy("id1", "id2")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

COSINE_DUP_THRESHOLD = 0.4  # testdata max pair cosine ≈ 0.48


# the registered exact baseline stride-samples its corpus to this many
# vectors (deterministic, oracle-mirrored) — the same gate as
# similarity.py's sim_knn_graph_mutual. Stride is 1 at every shipped sf.
COSINE_MAX_VECTORS = 2000


@register(
    "dedup_embedding_cosine",
    category="dedup",
    oracle=f"""
    WITH corpus AS (
      SELECT * FROM embeddings
      WHERE vec_id % (SELECT GREATEST(1,
              CAST(CEIL(COUNT(*) / {COSINE_MAX_VECTORS}.0) AS BIGINT))
            FROM embeddings) = 0
    )
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           {sql_cosine_fixed('a.embedding', 'b.embedding')} AS cosine
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE {sql_cosine_fixed('a.embedding', 'b.embedding')}
          >= {COSINE_DUP_THRESHOLD}
    ORDER BY id1, id2
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs. This is the exact all-pairs
    baseline (self-join); the bucketed/ANN scale path is
    operators/similarity.py. Norms are precomputed once per vector
    before the pair join — O(N) instead of O(N²) norm work. GATED:
    the registered form stride-samples to COSINE_MAX_VECTORS
    (oracle-mirrored; stride 1 at every shipped sf) so the baseline
    stays bounded at any corpus size — embedding_cosine_pairs keeps
    its explicit max_vectors hard-stop for API callers."""
    e = t(spark, sf_dir, "embeddings")
    n_total = e.count()
    stride = max(1, -(-n_total // COSINE_MAX_VECTORS))
    e = e.filter(F.col("vec_id") % stride == 0)
    # max_vectors=None: the stride above already bounds the corpus; the
    # default guard would re-count the filtered frame (a second scan)
    return embedding_cosine_pairs(
        e, COSINE_DUP_THRESHOLD, max_vectors=None, fixed=True
    )


def embedding_cosine_pairs(
    e: DataFrame,
    threshold: float,
    max_vectors: int | None = 200_000,
    fixed: bool = False,
) -> DataFrame:
    """All-pairs exact cosine near-dup over (vec_id, embedding).

    GATED (VERDICT r01 scale-risk 4): the self-join is O(N²) — the
    labeled exact baseline, tractable to a few hundred thousand
    vectors, quadratically hopeless beyond. ``max_vectors`` hard-stops
    larger inputs with a pointer at the scale paths
    (`operators/similarity.py`: ann_topk_lsh / ann_topk_ivf — bucketed
    joins whose recall is test-pinned) instead of silently launching a
    10¹² -row join. None disables the guard (the registered query passes
    the threshold explicitly and testdata is far below the cap; the
    count probe is one parquet-footer aggregate, not a scan)."""
    if max_vectors is not None:
        n = e.count()
        if n > max_vectors:
            raise ValueError(
                f"all-pairs cosine over {n} vectors exceeds the "
                f"max_vectors={max_vectors} guard (O(N²) join). Use the "
                "ANN paths in operators/similarity.py (ann_topk_lsh, "
                "ann_topk_ivf) or raise the guard explicitly."
            )
    # fixed=True swaps in the FLOOR fixed-point kernel (dot_fixed):
    # bigint folds instead of decimal(28,12) folds — measured ~10x
    # faster per pair with bit-identical cross-engine behavior (the
    # covariance/kNN-graph family's kernel). The decimal form stays the
    # default for decimal-valued business data.
    dot = dot_fixed if fixed else dot_exact
    withnorm = e.select(
        "vec_id",
        "embedding",
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    a = withnorm.alias("a")
    b = withnorm.alias("b")
    cos = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id1"),
            F.col("b.vec_id").alias("id2"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id1", "id2")
    )


# SemDeDup (Abbas et al. 2023): semantic dedup by clustering embeddings
# and comparing pairs only WITHIN each cluster — the scale fix for the
# all-pairs join above. Stride-seeded centroids keep the whole pipeline
# deterministic and therefore oracle-checkable; the k-means-trained
# variant reuses operators/similarity.kmeans_centroids.
_SEMDEDUP_STRIDE = 50  # vec_id % stride == 0 → centroid seed
# centroid-count ceiling: beyond STRIDE*MAX_CENTROIDS vectors the stride
# grows with N so the centroid set stays <= MAX_CENTROIDS and the
# assignment join stays O(N·k) LINEAR in the corpus (a fixed stride
# makes k = N/stride and assignment quadratic). Sub-cell splitting
# already bounds within-cluster pair work, so a capped k costs recall
# only across sub-cells — the documented trade. At every shipped sf the
# cap is not binding (N/50 <= 40 <= 64): results are unchanged.
_SEMDEDUP_MAX_CENTROIDS = 64
_SEMDEDUP_TAU = 0.35  # testdata max pair cosine ≈ 0.48
# hot-cluster guard: clusters larger than this sub-split by a portable
# md5 hash of vec_id so no cell's pair join exceeds ~MAX_CELL² work —
# the same boilerplate-blowup cap the LSH band buckets carry. Chosen
# below the sf0.01 max cluster size (59) so the split path is exercised
# by the driver gate, not just documented.
_SEMDEDUP_MAX_CELL = 48


def _semdedup_assign_sql(stride: int) -> str:
    """DuckDB CTEs: stride-seeded centroids + nearest-centroid (by exact
    dot product, centroid_id tie-break) assignment of every vector,
    then the hot-cluster sub-split (portable md5 sub-cell hash)."""
    from ..functions.vector import sql_dot

    return f"""
    cents AS (
      SELECT vec_id AS centroid_id, embedding AS cent_emb
      FROM embeddings
      WHERE vec_id % (SELECT GREATEST({stride},
              CAST(CEIL(COUNT(*) / {_SEMDEDUP_MAX_CENTROIDS}.0) AS BIGINT))
            FROM embeddings) = 0
    ),
    assign0 AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT v.vec_id, v.embedding, c.centroid_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {sql_dot('v.embedding', 'c.cent_emb')} DESC,
                          c.centroid_id ASC
               ) AS rn
        FROM embeddings v CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    csize AS (
      SELECT centroid_id, COUNT(*) AS n_c,
             CAST(CEIL(COUNT(*) / {_SEMDEDUP_MAX_CELL}.0) AS BIGINT)
               AS n_cells
      FROM assign0 GROUP BY centroid_id
    ),
    assign AS (
      SELECT a.vec_id, a.embedding, a.centroid_id, s.n_c,
             CAST('0x' || SUBSTR(md5(CAST(a.vec_id AS VARCHAR)), 1, 4)
                  AS BIGINT) % s.n_cells AS sub_cell
      FROM assign0 a JOIN csize s USING (centroid_id)
    )"""


@register(
    "semdedup_centroid",
    category="dedup",
    oracle=f"""
    WITH {_semdedup_assign_sql(_SEMDEDUP_STRIDE)},
    dup_ids AS (
      SELECT DISTINCT b.vec_id
      FROM assign a JOIN assign b
        ON a.centroid_id = b.centroid_id
       AND a.sub_cell = b.sub_cell
       AND a.vec_id < b.vec_id
      WHERE {sql_cosine('a.embedding', 'b.embedding')} >= {_SEMDEDUP_TAU}
    )
    SELECT v.vec_id, v.centroid_id,
           CAST(v.n_c AS BIGINT) AS n_cluster_members,
           CAST(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT)
             AS is_dup
    FROM assign v LEFT JOIN dup_ids d ON v.vec_id = d.vec_id
    ORDER BY v.vec_id
    """,
)
def semdedup_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings, then mark as
    duplicate any vector with a lower-id same-cluster neighbor at
    cosine >= {tau} — pairwise comparison happens only INSIDE clusters,
    never across the corpus. Emits per-vector (centroid, cluster size,
    verdict); `WHERE is_dup = 0` is the deduplicated corpus.

    This is the scale path that replaces dedup_embedding_cosine's gated
    all-pairs join: with k balanced clusters the pair work drops from
    O(N²) to O(N²/k), and the only corpus-sized exchange is one hash
    shuffle on centroid_id that co-locates each cluster (assignment
    itself is a broadcast join against the centroid set — centroids are
    k rows, never the corpus). At 100 TB, k scales with the corpus so
    each cluster stays executor-sized, and the within-cluster join
    stays local to its partition. Hot-cluster guard: clusters above
    {max_cell} members sub-split by a portable md5 hash of vec_id, so
    one boilerplate mega-cluster (the real-corpus failure mode — k-means
    collapses near-identical docs into one cell) can never go quadratic;
    the cost is missed cross-sub-cell pairs, the same recall-for-bound
    trade the LSH hot-bucket cap makes. Stride-seeded centroids (same
    seeds as sim_topk_ivf) keep every step decimal-exact and
    deterministic — the oracle replays the identical assignment AND the
    identical sub-split; swap in similarity.kmeans_centroids for
    trained cells when determinism across engines is not required."""
    from .similarity import _assign_nearest

    e = t(spark, sf_dir, "embeddings")
    n_total = e.count()
    stride = max(
        _SEMDEDUP_STRIDE, -(-n_total // _SEMDEDUP_MAX_CENTROIDS)
    )
    cents = e.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cent_emb"),
    )
    assigned = _assign_nearest(e, cents)
    csize = assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_c"),
        F.ceil(F.count(F.lit(1)) / float(_SEMDEDUP_MAX_CELL)).alias("n_cells"),
    )
    sub_cell = (
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string").cast("binary")), 1, 4),
            16,
            10,
        ).cast("bigint")
        % F.col("n_cells")
    )
    withnorm = assigned.join(F.broadcast(csize), "centroid_id").select(
        "vec_id",
        "centroid_id",
        "n_c",
        sub_cell.alias("sub_cell"),
        "embedding",
        F.sqrt(dot_exact(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    a = withnorm.alias("a")
    b = withnorm.alias("b")
    cos = dot_exact(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    dup_ids = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.sub_cell") == F.col("b.sub_cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= _SEMDEDUP_TAU)
        .select(F.col("b.vec_id").alias("dup_id"))
        .distinct()
    )
    return (
        withnorm.join(
            dup_ids, F.col("vec_id") == F.col("dup_id"), "left_outer"
        )
        .select(
            "vec_id",
            "centroid_id",
            F.col("n_c").cast("bigint").alias("n_cluster_members"),
            F.when(F.col("dup_id").isNotNull(), 1).otherwise(0).alias("is_dup"),
        )
        .orderBy("vec_id")
    )


semdedup_centroid.__doc__ = semdedup_centroid.__doc__.replace(
    "{tau}", str(_SEMDEDUP_TAU)
).replace("{max_cell}", str(_SEMDEDUP_MAX_CELL))


# ---------------------------------------------------------------------------
# Asymmetric containment (subset/quotation detection)
# ---------------------------------------------------------------------------

CONTAINMENT_THRESHOLD = 0.8
# hot-shingle cap for the REGISTERED containment query (mirrored in the
# oracle): shingles shared by more than this many docs leave the
# inverted index before pair generation. Exact duplicates are caught
# upstream by dedup_exact's md5 pass; without the cap a corpus that is
# mostly duplicates makes pair generation quadratic in the duplication
# factor (measured: slope 12x at the 10x-duplicated sf1 replica).
# Denominators stay FULL doc size, so containment keeps its meaning
# ("share of src's shingles found in dst, hot boilerplate excluded").
CONTAINMENT_MAX_SHINGLE_FREQ = 128

_SQL_CONTAINMENT = f"""
    WITH {SQL_SHINGLES},
    kept AS (
      SELECT sh.doc_id, sh.s FROM sh
      JOIN (SELECT s FROM sh GROUP BY s
            HAVING COUNT(*) <= {CONTAINMENT_MAX_SHINGLE_FREQ}) k
        ON sh.s = k.s
    ),
    upairs AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_shared
      FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    directed AS (
      SELECT id1 AS src_id, id2 AS dst_id, n_shared FROM upairs
      UNION ALL
      SELECT id2 AS src_id, id1 AS dst_id, n_shared FROM upairs
    )
    SELECT src_id, dst_id, n_shared,
           CAST(n_shared AS DOUBLE) / s.n AS containment
    FROM directed d JOIN sizes s ON d.src_id = s.doc_id
    WHERE CAST(n_shared AS DOUBLE) / s.n >= {CONTAINMENT_THRESHOLD}
    ORDER BY src_id, dst_id
"""


@register(
    "dedup_containment",
    category="dedup",
    oracle=_SQL_CONTAINMENT,
    doc="Asymmetric shingle containment C(src→dst) = |src∩dst| / |src|: "
    "detects documents CONTAINED in a larger one (quotation, boilerplate "
    "superset, truncated re-crawl) that symmetric Jaccard misses — a "
    "short doc fully quoted inside a long one has Jaccard ≈ |A|/|B| "
    "(tiny) but containment 1.0. Same inverted shingle index and "
    "undirected shared-count join as dedup_ngram_jaccard (one shuffle "
    "on the shingle, one on the pair), then each undirected pair emits "
    "both directions against its own denominator — the directed "
    "expansion is O(pairs), free. The hot-shingle cap "
    "(CONTAINMENT_MAX_SHINGLE_FREQ, mirrored in the oracle) bounds "
    "posting lists so a duplicate-heavy corpus cannot drive pair "
    "generation quadratic; exact duplicates are dedup_exact's job "
    "upstream, and denominators stay full-size so the score keeps its "
    "meaning.",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # hashed shingles (r9, guide §2.3 "narrower types"): the inverted
    # index joins and counts on the shingle key only — no output column
    # carries shingle text — so 8-byte longs replace ~20-byte gram
    # strings through the df_s groupBy and the pair self-join (the two
    # big exchanges). Pair multiset verified identical at sf0.1 (1.13M
    # pairs); same 2^-64 collision acceptance as the MinHash family.
    sh = _shingled_hashed(spark, sf_dir)
    # ONE corpus shingling pass (r10). The lazy form re-tokenized and
    # re-hashed the documents once per consumer — and the consumers
    # multiply: df_s + both self-join sides, then the directed UNION
    # re-executed that whole subtree per branch = 8 corpus scans in the
    # static plan (plans/r10/dedup_containment_before.txt). The
    # (doc_id, s) frame is two longs per shingle occurrence (~40 MB at
    # the sf1 replica), the cheapest possible materialization point.
    # The checkpoint also erases the b-side's size ESTIMATE: with
    # 8-byte hashed keys Catalyst under-estimated the corpus-derived
    # join side and BROADCAST it (1.88M rows per branch at sf1 —
    # guide §3.1 "estimates are often badly wrong"); a checkpointed
    # scan carries no stats, so the pair join stays a shuffle join at
    # every scale.
    exploded = (
        sh.select("doc_id", F.explode("shingles").alias("s"))
        .localCheckpoint()
    )
    # shingle arrays are array_distinct, so per-doc occurrence count ==
    # set size: sizes derives from the checkpointed frame instead of a
    # second shingling scan. (Docs with zero shingles drop out, but a
    # doc with zero shingles cannot appear in upairs — inner-join
    # equivalent, verified row-identical.)
    sizes = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # hot-shingle cap (CONTAINMENT_MAX_SHINGLE_FREQ): one groupBy on the
    # same shingle key the pair join shuffles on, so the filter rides
    # the exchange the join needs anyway
    df_s = exploded.groupBy("s").agg(F.count(F.lit(1)).alias("df_s"))
    kept = (
        exploded.join(df_s, "s")
        .filter(F.col("df_s") <= CONTAINMENT_MAX_SHINGLE_FREQ)
        .drop("df_s")
    )
    a = kept.alias("a")
    b = kept.alias("b")
    upairs = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # both directions from ONE pass over upairs: attach both endpoint
    # sizes, then explode a 2-struct array — the former
    # upairs-UNION-upairs shape re-executed the entire inverted-index
    # join and 71M-row aggregation per branch (the pair join is the
    # query's dominant cost at the duplicate-dense sf1 replica).
    # Same rows, same arithmetic (double n_shared/n per direction).
    s1 = sizes.select(F.col("doc_id").alias("id1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("id2"), F.col("n").alias("n2"))
    ns = F.col("n_shared").cast("double")
    both = upairs.join(s1, "id1").join(s2, "id2").select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id1").alias("src_id"),
                    F.col("id2").alias("dst_id"),
                    F.col("n_shared"),
                    (ns / F.col("n1")).alias("containment"),
                ),
                F.struct(
                    F.col("id2").alias("src_id"),
                    F.col("id1").alias("dst_id"),
                    F.col("n_shared"),
                    (ns / F.col("n2")).alias("containment"),
                ),
            )
        ).alias("d")
    )
    return (
        both.filter(F.col("d.containment") >= CONTAINMENT_THRESHOLD)
        .select("d.src_id", "d.dst_id", "d.n_shared", "d.containment")
        .orderBy("src_id", "dst_id")
    )


@register(
    "text_ngram_novelty",
    category="text",
    oracle=f"""
    WITH {SQL_SHINGLES},
    firsts AS (
      SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s
    )
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS novelty_ratio
    FROM sh JOIN firsts f ON sh.s = f.s
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
    doc="N-gram novelty score per document: the fraction of a doc's "
    "distinct trigrams whose FIRST corpus appearance (lowest doc_id) is "
    "this document — the dataset-curation diversity metric (a doc of "
    "recycled n-grams scores ~0, fresh material ~1; ingestion order "
    "stands in for time). Plan: one gram→first-doc aggregate (map-side "
    "combinable on the gram key), one join back to the exploded grams "
    "on the same key — the same inverted index the dedup family builds, "
    "then a per-doc count. Lives beside that index (docs with <3 words "
    "have no grams and drop out, matching the Jaccard convention). "
    "Integer counts and one exact division keep it hash-identical "
    "cross-engine.",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingled(spark, sf_dir).select(
        "doc_id", F.explode("shingles").alias("s")
    )
    firsts = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        sh.join(firsts, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).alias("n_novel"),
            (F.sum(novel).cast("double") / F.count(F.lit(1))).alias(
                "novelty_ratio"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Cross-corpus boilerplate segment removal (CCNet-style)
# ---------------------------------------------------------------------------

#: words per segment — the dedup unit; CCNet dedups paragraphs, which
#: this corpus (single-line docs) does not have, so fixed 3-word
#: segments stand in as the repeated-unit granularity
_BOILER_SEG = 3
#: a segment appearing in >= this many DISTINCT documents is boilerplate
_BOILER_MIN_DOCS = 3


_BOILER_ORACLE = f"""
    WITH words AS (
      SELECT doc_id, string_split_regex(TRIM(text), '\\s+') AS l
      FROM documents
    ),
    segs AS (
      SELECT doc_id, (g.i - 1) // {_BOILER_SEG} AS seg_no,
             array_to_string(
               l[g.i : g.i + {_BOILER_SEG} - 1], ' ') AS seg
      FROM words,
           UNNEST(generate_series(1, LEN(l), {_BOILER_SEG})) AS g(i)
    ),
    boiler AS (
      SELECT seg FROM segs GROUP BY seg
      HAVING COUNT(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}
    ),
    kept AS (
      SELECT s.doc_id, s.seg_no, s.seg
      FROM segs s LEFT JOIN boiler b ON s.seg = b.seg
      WHERE b.seg IS NULL
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(seg, ' ' ORDER BY seg_no) AS clean_text
      FROM kept GROUP BY doc_id
    ),
    tot AS (
      SELECT doc_id,
             CAST((LEN(l) + {_BOILER_SEG} - 1) // {_BOILER_SEG} AS BIGINT)
               AS n_segs
      FROM words
    )
    SELECT t.doc_id, t.n_segs,
           t.n_segs - COALESCE(a.n_kept, 0) AS n_removed,
           CAST(LENGTH(COALESCE(a.clean_text, '')) AS BIGINT)
             AS clean_chars,
           md5(COALESCE(a.clean_text, '')) AS clean_md5
    FROM tot t LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
"""


@register("corpus_boilerplate_removal", category="dedup", oracle=_BOILER_ORACLE)
def corpus_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-corpus boilerplate removal (Wenzek et al. 2020):
    split every document into fixed {w}-word segments, count each
    segment's DISTINCT-document frequency across the whole corpus, and
    strip segments appearing in >= {k} documents — the nav-menu /
    cookie-banner / footer scrubber that runs before any pretraining
    tokenization. Output per doc: segment counts before/after and the
    md5 of the reassembled cleaned text, which pins the REASSEMBLY ORDER
    cross-engine, not just the removal set.

    Scale: segmentation is per-row JVM expression work (split +
    sequence/slice/transform — zero shuffle); the corpus-frequency pass
    is one map-side-combinable groupBy on the segment string; the
    boilerplate set is bounded by the corpus's REPEATED-segment
    vocabulary (Zipf head — tiny vs the corpus), so the anti-join
    broadcasts under AQE; reassembly is one shuffle on doc_id with the
    order restored by array_sort over (seg_no, seg) structs, never a
    global sort. Nothing in the plan is ever O(docs^2)."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_segs = F.expr(
        f"CAST((size(split(trim(text), '\\\\s+')) + {_BOILER_SEG - 1}) "
        f"DIV {_BOILER_SEG} AS BIGINT)"
    )
    segs_arr = F.transform(
        F.sequence(F.lit(0), (n_segs - 1).cast("int")),
        lambda i: F.array_join(
            F.slice(words, i * _BOILER_SEG + 1, _BOILER_SEG), " "
        ),
    )
    segs = d.select(
        "doc_id", n_segs.alias("n_segs"), F.posexplode(segs_arr).alias("seg_no", "seg")
    )
    boiler = (
        segs.groupBy("seg")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= _BOILER_MIN_DOCS)
        .select("seg")
    )
    kept = segs.join(boiler, "seg", "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_no", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
    )
    tot = d.select("doc_id", n_segs.alias("n_segs"))
    clean = F.coalesce(F.col("clean_text"), F.lit(""))
    return (
        tot.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_segs",
            (F.col("n_segs") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
            F.length(clean).cast("bigint").alias("clean_chars"),
            F.md5(clean.cast("binary")).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


corpus_boilerplate_removal.__doc__ = corpus_boilerplate_removal.__doc__.replace(
    "{w}", str(_BOILER_SEG)
).replace("{k}", str(_BOILER_MIN_DOCS))
