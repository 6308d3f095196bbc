"""Training-data pipeline operators over ``documents`` — the corpus-prep
stages between "synced raw text" and "ready to train": sequence packing,
benchmark-contamination checks, stratified sampling, vocabulary building.

No anchor in the reference (it stops at sync, `/root/reference/README.md:13-15`
— these are the first-class large-scale extensions layered on the same
table surface). Everything is built-in Spark SQL (JVM codegen, zero
Python UDFs), each with a DuckDB oracle using identical integer/hash
arithmetic, so results are bit-deterministic cross-engine.

Scale notes per operator are on the docstrings; the common theme: all
hashes/counts are pure functions of the row (embarrassingly parallel),
and every aggregation is preceded by map-side reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import t
from .textstats import fingerprint_expr, token_count

PACK_BUDGET = 512  # tokens per packed sequence bin


@register(
    "pack_sequences",
    category="pipeline",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, lang, source,
             CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS INT) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT lang, source, n_tokens,
             CAST(FLOOR(
               (SUM(n_tokens) OVER (
                  PARTITION BY lang, source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS bin_id
      FROM toks
    )
    SELECT lang, source, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY lang, source, bin_id
    ORDER BY lang, source, bin_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: documents are laid into fixed
    token-budget bins in doc_id order within each (lang, source) stream —
    bin = floor(prefix_sum_before_doc / budget). Deterministic (pure
    function of the ordered stream, no RNG, no first-fit heuristics), so
    it is oracle-checkable and append-stable per stream.

    Scale: the window partitions by (lang, source) — parallelism is the
    stream count, and each stream's prefix sum is one sorted pass. For a
    100 TB corpus with few streams, sub-shard the partition key (e.g.
    add pmod(hash(doc_id), 64)) and pack within shards: bins never cross
    shards, so the result stays deterministic while the sort spreads over
    64× more tasks. The output here is the bin manifest (counts/sizes),
    which is what the downstream loader consumes."""
    d = t(spark, sf_dir, "documents")
    w = (
        W.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    n_tok = token_count(F.col("text"))
    return (
        d.select("doc_id", "lang", "source", n_tok.alias("n_tokens"))
        .withColumn(
            "bin_id",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / float(PACK_BUDGET)
            ),
        )
        .groupBy("lang", "source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("lang", "source", "bin_id")
    )


@register(
    "contamination_check",
    category="pipeline",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id, lang,
             md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    bench AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 97 = 0)
    SELECT f.lang, COUNT(*) AS n_contaminated
    FROM fp f JOIN bench b ON f.fp = b.fp
    WHERE f.doc_id % 97 <> 0
    GROUP BY f.lang
    ORDER BY f.lang
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: training documents whose normalized
    fingerprint collides with a held-out evaluation set (here the
    deterministic pseudo-benchmark doc_id % 97 == 0). The real-world
    shape: eval suites are thousands of rows, the corpus is billions —
    so the benchmark fingerprint set broadcasts and the check is a
    map-side semi join on the full scan, no corpus shuffle. Exact-match
    fingerprints here; the n-gram-overlap variant composes this with the
    shingle machinery in operators/dedup.py."""
    d = t(spark, sf_dir, "documents")
    fp = d.select("doc_id", "lang", fingerprint_expr(F.col("text")).alias("fp"))
    bench = fp.filter(F.col("doc_id") % 97 == 0).select("fp").distinct()
    return (
        fp.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "fp", "left_semi")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
        .orderBy("lang")
    )


@register(
    "sample_stratified",
    category="pipeline",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                         < CASE WHEN lang = 'en' THEN '1a' ELSE '80' END
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-stratum rates (the data-mixing
    knob: downsample over-represented languages): en keeps ~10%
    (md5 prefix < '1a' = 26/256), everything else ~50% ('80' = 128/256).
    Like split_train_test, membership is a pure hash of doc_id —
    reproducible across engines/runs/cluster sizes and append-stable,
    unlike df.sample. One scan, map-side conditional counts, a
    stratum-sized final exchange."""
    d = t(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    threshold = F.when(F.col("lang") == "en", "1a").otherwise("80")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(prefix < threshold, 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled"),
        )
        .orderBy("lang")
    )


@register(
    "vocab_top_terms",
    category="pipeline",
    oracle=r"""
    WITH words AS (
      SELECT DISTINCT doc_id, word FROM (
        SELECT doc_id,
               unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS word
        FROM documents
      ) x WHERE word <> ''
    )
    SELECT word, COUNT(*) AS doc_freq
    FROM words
    GROUP BY word
    ORDER BY doc_freq DESC, word
    LIMIT 50
    """,
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: top-50 terms by document frequency. The
    explode fans each doc into its tokens, the per-doc DISTINCT
    deduplicates repeats map-side (partial aggregation on
    (doc_id, word) before any exchange), then the document-frequency
    count reduces to vocabulary size and TakeOrdered picks the head —
    the corpus is scanned once and nothing doc-sized is ever sorted."""
    d = t(spark, sf_dir, "documents")
    words = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), "word")
        .limit(50)
    )


@register(
    "sample_topk_per_stratum",
    category="pipeline",
    oracle="""
    WITH ranked AS (
      SELECT lang, source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT lang, source, rk, doc_id
    FROM ranked WHERE rk <= 3
    ORDER BY lang, source, rk
    """,
)
def sample_topk_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows inside each
    (lang, source) stratum by the md5 of their key and keep the first 3 —
    an RNG-free uniform draw that is reproducible across engines, runs,
    and partitionings (companion to sample_stratified's rate-based
    draw; this one guarantees exactly-k representatives per stratum).
    Catalyst turns the rank-then-filter into WindowGroupLimit, so each
    partition keeps only k candidates per stratum before the shuffle."""
    d = t(spark, sf_dir, "documents")
    w = W.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    return (
        d.select("lang", "source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .select("lang", "source", "rk", "doc_id")
        .orderBy("lang", "source", "rk")
    )


_DECON_WIDTH = 8


def _sql_grams(width: int) -> str:
    concat = " || ' ' || ".join(f"l[i+{k}]" for k in range(width))
    return (
        f"list_distinct(list_transform(generate_series(1, LEN(l) - {width - 1}),"
        f" i -> {concat.replace('l[i+0]', 'l[i]')}))"
    )


@register(
    "contamination_ngram_overlap",
    category="pipeline",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS l FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest({_sql_grams(_DECON_WIDTH)}) AS g FROM toks
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0)
    SELECT grams.doc_id, COUNT(*) AS n_shared_grams
    FROM grams JOIN bench USING (g)
    WHERE grams.doc_id % 50 <> 0
    GROUP BY grams.doc_id
    ORDER BY grams.doc_id
    """,
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-overlap decontamination (the GPT-3-style complement to
    contamination_check's whole-document fingerprints): flag any corpus
    document sharing an 8-token shingle with the benchmark set (docs
    %50==0 stand in for the eval suite). The benchmark gram set is
    vocabulary-sized → broadcast; the corpus side explodes grams and
    semi-joins map-side, so the corpus is scanned once and never
    shuffled at doc grain — the only exchange carries (doc, count)
    pairs for flagged docs, which are rare by construction."""
    from .dedup import shingles_expr

    d = t(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        F.explode(shingles_expr(F.col("text"), width=_DECON_WIDTH)).alias("g"),
    )
    bench = grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    return (
        grams.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .orderBy("doc_id")
    )
