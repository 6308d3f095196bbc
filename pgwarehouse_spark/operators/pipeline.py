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

from ..functions.hashing import h13
from ..functions.vector import sql_cosine_fixed as _semcon_cos
from ..registry import register
from ._helpers import dsum, t
from .dedup import (
    COSINE_MAX_VECTORS as _SEMCON_MV,
    JACCARD_THRESHOLD as _LS_JT,
    SQL_SHINGLES as _LS_SHINGLES,
    cluster_labels as _ls_cluster_labels,
)
from .textstats import GOPHER_FEAT_SQL, fingerprint_expr, gopher_flags, token_count

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
        d.select(
            "lang", "source", "doc_id",
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .select("lang", "source", "rk", "doc_id")
        .orderBy("lang", "source", "rk")
    )


_MIX_WEIGHTS = {"en": 0.40, "zh": 0.20, "de": 0.15, "fr": 0.15}  # else 0.10
_MIX_CASE_SQL = (
    "CAST(CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS.items())
    + " ELSE 0.10 END AS DOUBLE)"
)


@register(
    "sample_mixture_weighted",
    category="pipeline",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY lang
    ),
    wts AS (SELECT lang, n, {_MIX_CASE_SQL} AS w FROM counts),
    cap AS (SELECT MIN(n / w) AS cap_min FROM wts),
    rates AS (
      SELECT lang,
             CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE), (w * cap_min) / n) * 65536)
                  AS BIGINT) AS thr
      FROM wts, cap
    )
    SELECT d.lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN CAST('0x' || SUBSTR(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
                              AS BIGINT) < r.thr
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           MIN(r.thr) AS thr
    FROM documents d JOIN rates r USING (lang)
    GROUP BY d.lang ORDER BY d.lang
    """,
)
def sample_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture rebalancing: given target language weights
    (en .40 / zh .20 / de .15 / fr .15 / else .10), compute the largest
    achievable total T = min(n_lang / w_lang) and keep each language at
    rate w·T/n via an RNG-free md5 threshold — the data-mixing step that
    turns an as-crawled distribution into the training mixture.

    Scale: pass 1 is a language-cardinality aggregate (tiny); the rate
    table broadcasts back onto the single corpus scan, so membership is
    decided map-side with no corpus shuffle. Hash thresholds make the
    draw reproducible across engines/partitionings and append-stable
    modulo the recomputed rates. Double arithmetic ((w·capmin)/n, one
    FLOOR) is IEEE-identical cross-engine, so thresholds — and therefore
    membership — are bit-deterministic, not approximately so."""
    d = t(spark, sf_dir, "documents")
    w = F.lit(0.10)
    for k, v in reversed(_MIX_WEIGHTS.items()):
        w = F.when(F.col("lang") == k, F.lit(v)).otherwise(w)
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).cast("double").alias("n"))
    wts = counts.withColumn("w", w)
    cap = wts.agg(F.min(F.col("n") / F.col("w")).alias("cap_min"))
    rates = (
        wts.crossJoin(F.broadcast(cap))
        .withColumn(
            "thr",
            F.floor(
                F.least(F.lit(1.0), (F.col("w") * F.col("cap_min")) / F.col("n"))
                * 65536
            ).cast("bigint"),
        )
        .select("lang", "thr")
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4),
        16,
        10,
    ).cast("bigint")
    return (
        d.join(F.broadcast(rates), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(h < F.col("thr"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.min("thr").alias("thr"),
        )
        .orderBy("lang")
    )


@register(
    "filter_pipeline_gates",
    category="pipeline",
    oracle=r"""
    WITH g AS (
      SELECT lang,
             CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS INT) AS n_tokens,
             CAST(LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
               / NULLIF(CAST(LENGTH(text) AS DOUBLE), 0) AS digit_ratio,
             CAST(LENGTH(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
               / NULLIF(CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS DOUBLE), 0)
               AS mean_tok_len
      FROM documents
    ),
    flags AS (
      SELECT lang,
             CASE WHEN n_tokens < 5 THEN 1 ELSE 0 END AS f_short,
             CASE WHEN n_tokens > 5000 THEN 1 ELSE 0 END AS f_long,
             CASE WHEN digit_ratio > 0.2 THEN 1 ELSE 0 END AS f_digit,
             CASE WHEN mean_tok_len < 2.0 OR mean_tok_len > 12.0 THEN 1 ELSE 0 END
               AS f_wordlen
      FROM g
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN f_short + f_long + f_digit + f_wordlen = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(f_short) AS BIGINT) AS n_short,
           CAST(SUM(f_long) AS BIGINT) AS n_long,
           CAST(SUM(f_digit) AS BIGINT) AS n_digit,
           CAST(SUM(f_wordlen) AS BIGINT) AS n_wordlen
    FROM flags GROUP BY lang ORDER BY lang
    """,
)
def filter_pipeline_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality-gate filter (the CCNet/Gopher-style keep/drop
    ensemble): each document is scored against independent gates —
    too-few/too-many tokens, digit-character ratio, mean token length
    out of range — and the manifest reports per-language kept counts
    plus each gate's independent trip count (the per-reason breakdown
    an ablation needs, not just the final verdict).

    Scale: every gate is a pure JVM expression over the row — one corpus
    scan, map-side partial counts, a language-cardinality exchange. Gate
    ratios are double divisions compared against constants; identical
    IEEE results cross-engine make the counts exact, not approximate."""
    d = t(spark, sf_dir, "documents")
    n_tokens = token_count(F.col("text"))
    digit_ratio = (
        F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")).cast("double")
        / F.nullif(F.length(F.col("text")).cast("double"), F.lit(0.0))
    )
    mean_tok_len = F.length(
        F.regexp_replace(F.col("text"), r"\s", "")
    ).cast("double") / F.nullif(n_tokens.cast("double"), F.lit(0.0))
    f_short = F.when(n_tokens < 5, 1).otherwise(0)
    f_long = F.when(n_tokens > 5000, 1).otherwise(0)
    f_digit = F.when(digit_ratio > 0.2, 1).otherwise(0)
    f_wordlen = F.when((mean_tok_len < 2.0) | (mean_tok_len > 12.0), 1).otherwise(0)
    return (
        d.select(
            "lang",
            f_short.alias("f_short"),
            f_long.alias("f_long"),
            f_digit.alias("f_digit"),
            f_wordlen.alias("f_wordlen"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    F.col("f_short") + F.col("f_long") + F.col("f_digit")
                    + F.col("f_wordlen")
                    == 0,
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_kept"),
            F.sum("f_short").cast("bigint").alias("n_short"),
            F.sum("f_long").cast("bigint").alias("n_long"),
            F.sum("f_digit").cast("bigint").alias("n_digit"),
            F.sum("f_wordlen").cast("bigint").alias("n_wordlen"),
        )
        .orderBy("lang")
    )


_SHUFFLE_SHARDS = 8


@register(
    "shuffle_order_sharded",
    category="pipeline",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR)) AS hfull,
             CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
               % {_SHUFFLE_SHARDS} AS shard
      FROM documents
    )
    SELECT shard, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hfull, doc_id)
             AS rk, doc_id
    FROM h ORDER BY shard, rk
    """,
)
def shuffle_order_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sharded training order: each document hashes into
    one of {_SHUFFLE_SHARDS} shards and gets a within-shard rank by the
    md5 of its key — the reproducible global shuffle a training run reads
    (shard files consumed round-robin give a uniform random-looking order
    with no RNG state and no global sort).

    Scale: this is the alternative to ORDER BY rand() — a global sort
    that serializes through a range exchange and is irreproducible across
    retries. Here the only exchange is the shard hash partitioning; each
    shard sorts locally (parallelism = shard count; raise shards to
    spread — ranks never cross shards so determinism survives any
    fan-out). Append-stable: new docs interleave without moving old
    ranks' relative order within a shard draw."""
    d = t(spark, sf_dir, "documents")
    hfull = F.md5(F.col("doc_id").cast("string").cast("binary"))
    shard = F.conv(F.substring(hfull, 1, 4), 16, 10).cast("bigint") % _SHUFFLE_SHARDS
    w = W.partitionBy("shard").orderBy("hfull", "doc_id")
    return (
        d.select("doc_id", hfull.alias("hfull"), shard.alias("shard"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .select("shard", "rk", "doc_id")
        .orderBy("shard", "rk")
    )


# plain docstrings don't interpolate — splice the real shard count so
# help() reads correctly and can't drift from _SHUFFLE_SHARDS.
shuffle_order_sharded.__doc__ = shuffle_order_sharded.__doc__.replace(
    "{_SHUFFLE_SHARDS}", str(_SHUFFLE_SHARDS)
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


# Shared CTE chain: per-document mean token log-prob under the corpus
# unigram model — reused by text_unigram_logprob's oracle and
# sample_quality_buckets' (one definition, two consumers).
UNIGRAM_LP_SQL = r"""
    ulp_tok AS (
      SELECT doc_id,
             unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
      FROM documents
    ),
    ulp_tok2 AS (SELECT doc_id, w FROM ulp_tok WHERE w <> ''),
    ulp_vocab AS (
      SELECT w, CAST(COUNT(*) AS DOUBLE) AS c FROM ulp_tok2 GROUP BY w
    ),
    ulp_tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM ulp_vocab),
    ulp_scored AS (
      SELECT t.doc_id, LN(v.c / ulp_tot.n) AS lp
      FROM ulp_tok2 t JOIN ulp_vocab v USING (w), ulp_tot
    ),
    unigram_lp AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CAST(lp AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS avg_logprob
      FROM ulp_scored GROUP BY doc_id
    )
"""


@register(
    "text_unigram_logprob",
    category="pipeline",
    oracle=f"""
    WITH {UNIGRAM_LP_SQL}
    SELECT doc_id, n_tokens, avg_logprob
    FROM unigram_lp ORDER BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: every document's mean token
    log-probability under the corpus's own unigram distribution — the
    classic LM-based quality filter (low score = token salad / OCR junk,
    relative to the corpus). Two aggregations over one tokenization:
    vocab counts, then a token⋈vocab equi-join and per-doc mean of
    ln p(w).

    Scale: the vocab (unique tokens, Zipf-bounded ≪ corpus) broadcasts
    onto the token stream, so scoring is map-side — the only wide
    shuffle is the vocab count itself, which moves map-side-combined
    (token, count) partials. At 100 TB you'd cap the broadcast vocab at
    top-K tokens with an OOV floor probability — same plan, bounded
    build side. Determinism: counts are integers (exact as doubles),
    c/n and ln are evaluated per-row identically in both engines, and
    per-doc sums go through the decimal cast (_helpers), so a 1-ulp
    libm difference in LN is absorbed by the scale-6 rounding rather
    than amplified by accumulation order."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    # the Zipf-bounded vocab feeds the total AND the broadcast scoring
    # join — checkpointed so each stops re-tokenizing the corpus
    # (3 passes -> 2: vocab build + scoring stream; guide §3.3)
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint()
    )
    tot = vocab.agg(F.sum("c").alias("n"))
    lp = F.log(F.col("c") / F.col("n"))
    return (
        tok.join(F.broadcast(vocab), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (dsum(lp) / F.count(F.lit(1))).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


_CHUNK_W, _CHUNK_STRIDE = 50, 25


@register(
    "text_chunk_windows",
    category="pipeline",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(TRIM(LOWER(text)), '\s+') AS toks
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST(UNNEST(range(CAST(CEIL(LEN(toks) / {_CHUNK_STRIDE}.0) AS BIGINT)))
                  AS INT) AS chunk_id,
             toks
      FROM tok
    )
    SELECT doc_id, chunk_id,
           CAST(LEAST({_CHUNK_W}, LEN(toks) - chunk_id * {_CHUNK_STRIDE}) AS INT)
             AS n_tokens,
           toks[chunk_id * {_CHUNK_STRIDE} + 1] AS first_tok,
           toks[LEAST(LEN(toks), chunk_id * {_CHUNK_STRIDE} + {_CHUNK_W})]
             AS last_tok
    FROM chunks WHERE chunk_id * {_CHUNK_STRIDE} < LEN(toks)
    ORDER BY doc_id, chunk_id
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (50-token windows, stride 25) —
    the context-chunking step a RAG index or long-document training
    pipeline applies before embedding. Chunk boundaries are pure
    arithmetic on the token array: sequence → explode → slice metadata,
    no UDF, no second scan.

    Scale: the explode multiplies rows by ~n_tokens/stride (2× token
    coverage at 50/25) — that fan-out IS the workload, and it's entirely
    map-side: no shuffle until whatever consumes the chunks aggregates.
    Stride/window are compile-time constants so every engine and every
    re-run derives identical chunk ids (append-stable, join-safe)."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n = F.size(toks)
    chunked = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(
            F.sequence(F.lit(0), F.floor((n - 1) / _CHUNK_STRIDE).cast("int"))
        ).alias("chunk_id"),
    )
    nn = F.size(F.col("toks"))
    start = F.col("chunk_id") * _CHUNK_STRIDE
    return (
        chunked.select(
            "doc_id",
            "chunk_id",
            F.least(F.lit(_CHUNK_W), nn - start).cast("int").alias("n_tokens"),
            F.element_at("toks", start + 1).alias("first_tok"),
            F.element_at("toks", F.least(nn, start + _CHUNK_W)).alias("last_tok"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# Weighted sampling without replacement: language upweighting for a
# training mixture (low-resource languages get more draws). Integer
# weights only — each document races with `w` deterministic md5 draws
# and keeps the smallest; P(item wins the race) = w_i / sum(w_j), the
# replicated-minimum form of an Efraimidis-Spirakis priority. All
# arithmetic is integer-exact, so the oracle hash is bit-stable (no
# pow/ln whose last-ulp behavior differs across libms).
_SAMPLE_WEIGHTS = {"en": 1, "de": 3, "es": 3, "fr": 4, "zh": 4}
_SAMPLE_K = 100

_WEIGHT_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{lang}' THEN {w}" for lang, w in _SAMPLE_WEIGHTS.items())
    + " ELSE 1 END"
)


@register(
    "sample_weighted_priority",
    category="pipeline",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, lang,
             CAST({_WEIGHT_SQL} AS INT) AS weight,
             list_min(list_transform(
               generate_series(1, {_WEIGHT_SQL}),
               j -> CAST('0x' || SUBSTR(
                      md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)),
                      1, 13) AS BIGINT))) AS priority
      FROM documents
    ),
    top AS (
      SELECT * FROM pri ORDER BY priority, doc_id LIMIT {_SAMPLE_K}
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS BIGINT) AS rank,
           doc_id, lang, weight, priority
    FROM top ORDER BY rank
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (language-upweighted
    mixture draw): each document gets an integer weight from its
    language and races `weight` deterministic md5 draws, keeping the
    minimum as its priority — the replicated-minimum equivalent of an
    Efraimidis-Spirakis u^(1/w) key, but in pure int64 arithmetic so
    the draw is bit-reproducible across engines, retries, and appends
    (no RNG state, no float pow). The k smallest priorities are the
    sample; P(selected next) ∝ weight.

    Scale: the priority is a per-row O(weight) expression — no shuffle,
    no explode (the draws fold inside array_min/transform). The global
    top-k is TakeOrderedAndProject: per-partition top-k then a driver
    merge of k·partitions rows — no global sort, no single-partition
    exchange. The final rank window runs on k rows. Real-valued weights
    would swap the race for a rounded u^(1/w) key; integer weights are
    the common mixture case (upsample factors)."""
    d = t(spark, sf_dir, "documents")
    weight = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(w))
            for lang, w in _SAMPLE_WEIGHTS.items()
        ],
        F.lit(1),
    )
    draw = (
        "transform(sequence(1, weight), "
        "j -> CAST(conv(substring(md5(CAST("
        "CAST(doc_id AS STRING) || ':' || CAST(j AS STRING) AS BINARY"
        ")), 1, 13), 16, 10) AS BIGINT))"
    )
    pri = d.select(
        "doc_id", "lang", weight.alias("weight")
    ).withColumn("priority", F.expr(f"array_min({draw})"))
    top = pri.orderBy("priority", "doc_id").limit(_SAMPLE_K)
    w_rank = W.orderBy("priority", "doc_id")
    return (
        top.withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .select("rank", "doc_id", "lang", "weight", "priority")
        .orderBy("rank")
    )


@register(
    "corpus_drift_kl",
    category="pipeline",
    oracle=r"""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
      FROM documents
    ),
    tok2 AS (SELECT source, w FROM tok WHERE w <> ''),
    sv AS (SELECT source, w, COUNT(*) AS c_sv FROM tok2 GROUP BY source, w),
    st AS (SELECT source, SUM(c_sv) AS n_s, COUNT(*) AS n_distinct FROM sv GROUP BY source),
    cv AS (SELECT w, SUM(c_sv) AS c_v FROM sv GROUP BY w),
    tot AS (SELECT SUM(c_v) AS n FROM cv),
    terms AS (
      SELECT sv.source,
             (CAST(sv.c_sv AS DOUBLE) / st.n_s)
               * LN((CAST(sv.c_sv AS DOUBLE) * tot.n)
                    / (CAST(st.n_s AS DOUBLE) * cv.c_v)) AS term
      FROM sv JOIN st USING (source) JOIN cv USING (w), tot
    )
    SELECT st.source,
           CAST(st.n_s AS BIGINT) AS n_tokens,
           CAST(st.n_distinct AS BIGINT) AS n_distinct_tokens,
           CAST(SUM(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS kl_vs_corpus
    FROM terms JOIN st USING (source)
    GROUP BY st.source, st.n_s, st.n_distinct
    ORDER BY st.source
    """,
)
def corpus_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture drift monitor: KL divergence of each source's unigram
    token distribution from the corpus-wide distribution — the signal a
    training pipeline watches to catch a crawl slice or vendor feed
    whose content shifted (KL spikes) before it contaminates a mixture.
    Summed only over tokens the source actually emits, so no smoothing
    is needed (c_v >= c_sv > 0).

    Scale: both distributions come from ONE tokenize pass — per-(source,
    token) counts roll up to source totals, corpus totals, and vocab
    counts without re-reading text; the vocab join broadcasts
    (Zipf-bounded ≪ corpus). Per-term arithmetic is integer-ratio ->
    double -> LN evaluated identically in both engines, and the
    per-source sum goes through the decimal cast so 1-ulp libm
    differences in LN are absorbed by scale-6 rounding, not amplified
    by accumulation order."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    # sv (the source×token count table) feeds st, cv AND the scoring
    # join — checkpointed so the docstring's "ONE tokenize pass" is
    # true in execution, not just in shape (same fix as
    # sample_importance_dsir's dw; guide §3.3)
    sv = (
        tok.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c_sv"))
        .localCheckpoint()
    )
    st = sv.groupBy("source").agg(
        F.sum("c_sv").alias("n_s"), F.count(F.lit(1)).alias("n_distinct")
    )
    cv = sv.groupBy("w").agg(F.sum("c_sv").alias("c_v"))
    tot = cv.agg(F.sum("c_v").alias("n"))
    term = (F.col("c_sv").cast("double") / F.col("n_s")) * F.log(
        (F.col("c_sv").cast("double") * F.col("n"))
        / (F.col("n_s").cast("double") * F.col("c_v"))
    )
    return (
        sv.join(F.broadcast(st), "source")
        .join(F.broadcast(cv), "w")
        .crossJoin(F.broadcast(tot))
        .select("source", "n_s", "n_distinct", term.alias("term"))
        .groupBy("source", "n_s", "n_distinct")
        .agg(dsum(F.col("term")).alias("kl_vs_corpus"))
        .select(
            "source",
            F.col("n_s").cast("bigint").alias("n_tokens"),
            F.col("n_distinct").cast("bigint").alias("n_distinct_tokens"),
            "kl_vs_corpus",
        )
        .orderBy("source")
    )


_SOURCE_QUALITY_ORACLE = f"""
    WITH {GOPHER_FEAT_SQL},
    fp AS (
      SELECT doc_id,
             md5(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    dups AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) > 1
                  AS INT) AS is_dup
      FROM fp
    )
    SELECT g.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT g.lang) AS BIGINT) AS n_langs,
           CAST(SUM(g.n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens,
           CAST(SUM(g.keep) AS BIGINT) AS n_keep,
           CAST(SUM(g.keep) AS DOUBLE) / COUNT(*) AS keep_rate,
           CAST(SUM(d.is_dup) AS BIGINT) AS n_exact_dups,
           CAST(SUM(d.is_dup) AS DOUBLE) / COUNT(*) AS dup_rate
    FROM gopher g JOIN dups d USING (doc_id)
    GROUP BY g.source ORDER BY g.source
"""


@register(
    "source_quality_report",
    category="pipeline",
    oracle=_SOURCE_QUALITY_ORACLE,
)
def source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health dashboard: the one-page report a data
    team reviews before admitting a source into a training mixture —
    volume, language spread, mean length, Gopher-rule keep rate, and
    exact-duplicate rate, one row per source. Composes gopher_flags
    (shared with filter_gopher_rules) and the normalized fingerprint
    (shared with dedup_exact), so the report can never drift from the
    operators it summarizes.

    Scale: flags are map-side expressions; dup detection is ONE shuffle
    on the md5 fingerprint (row_number per fingerprint, first doc_id
    survives); the final per-source aggregate moves map-side-combined
    partials. n_sources rows out — driver-safe at any corpus size."""
    d = t(spark, sf_dir, "documents")
    flags = gopher_flags(d)
    w_fp = W.partitionBy("fp").orderBy("doc_id")
    dups = (
        d.select("doc_id", fingerprint_expr(F.col("text")).alias("fp"))
        .withColumn(
            "is_dup",
            (F.row_number().over(w_fp) > 1).cast("int"),
        )
        .select("doc_id", "is_dup")
    )
    n_docs = F.count(F.lit(1))
    return (
        flags.join(dups, "doc_id")
        .groupBy("source")
        .agg(
            n_docs.alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            (F.sum("n_tokens").cast("double") / n_docs).alias("mean_tokens"),
            F.sum("keep").cast("bigint").alias("n_keep"),
            (F.sum("keep").cast("double") / n_docs).alias("keep_rate"),
            F.sum("is_dup").cast("bigint").alias("n_exact_dups"),
            (F.sum("is_dup").cast("double") / n_docs).alias("dup_rate"),
        )
        .orderBy("source")
    )


# DoReMi-flavored quality-bucket sampling: documents ranked by their
# unigram-LM quality score, split into quintiles, sampled at a rate
# that rises with quality. Rates in 1/65536 units so the hash-threshold
# comparison is pure integer.
_QUALITY_BUCKETS = 5
_BUCKET_KEEP_65536 = [13107, 26214, 39321, 52428, 65536]  # 0.2 .. 1.0


@register(
    "sample_quality_buckets",
    category="pipeline",
    oracle=f"""
    WITH {UNIGRAM_LP_SQL},
    ranked AS (
      SELECT doc_id, avg_logprob,
             ROW_NUMBER() OVER (ORDER BY avg_logprob, doc_id) AS rk,
             COUNT(*) OVER () AS n
      FROM unigram_lp
    ),
    bucketed AS (
      SELECT doc_id,
             CAST(FLOOR((rk - 1) * {_QUALITY_BUCKETS}.0 / n) AS BIGINT)
               AS bucket,
             CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
               AS h
      FROM ranked
    ),
    verdicts AS (
      SELECT bucket, doc_id,
             CASE WHEN h < CASE bucket
               {' '.join(f'WHEN {b} THEN {r}' for b, r in enumerate(_BUCKET_KEEP_65536))}
             END THEN 1 ELSE 0 END AS kept
      FROM bucketed
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(kept) AS DOUBLE) / COUNT(*) AS kept_frac
    FROM verdicts GROUP BY bucket ORDER BY bucket
    """,
)
def sample_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted downsampling (the DoReMi/quality-curriculum
    shape): rank every document by its unigram-LM score, cut the
    ranking into quintiles, and keep a hash-deterministic fraction that
    rises with quality (20% of the worst bucket, 100% of the best) —
    upweighting high-quality data without dropping the tail entirely.

    Scale: the score reuses text_unigram_logprob's two-aggregation
    plan; the global ranking is the distributed two-pass prefix sum
    (`global_rank_cumsum` — range partition + per-partition rank +
    broadcast offsets, NO single-partition exchange, plan-pinned for
    its other consumers); membership is an integer md5-threshold per
    doc — RNG-free, append-stable within a bucket assignment, and
    bit-identical cross-engine. Output is the per-bucket manifest."""
    from ._helpers import global_rank_cumsum

    lp = text_unigram_logprob(spark, sf_dir).select("doc_id", "avg_logprob")
    ranked, total, _ = global_rank_cumsum(
        lp, [F.col("avg_logprob"), F.col("doc_id")], rank_name="rk"
    )
    bucket = F.floor(
        (F.col("rk") - 1) * _QUALITY_BUCKETS / F.lit(float(total))
    ).cast("bigint")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4),
        16,
        10,
    ).cast("bigint")
    rate = F.coalesce(
        *[
            F.when(F.col("bucket") == b, F.lit(r))
            for b, r in enumerate(_BUCKET_KEEP_65536)
        ]
    )
    return (
        ranked.select("doc_id", bucket.alias("bucket"), h.alias("h"))
        .withColumn("kept", F.when(F.col("h") < rate, 1).otherwise(0))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            (F.sum("kept").cast("double") / F.count(F.lit(1))).alias("kept_frac"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (data selection for language models)
# ---------------------------------------------------------------------------

_SQL_DSIR = r"""
    WITH dw AS (
      SELECT doc_id, w, COUNT(*) AS n_dw
      FROM (
        SELECT doc_id, unnest(string_split_regex(TRIM(text), '\s+')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY doc_id, w
    ),
    doc_lang AS (SELECT doc_id, lang FROM documents),
    raw_cnt AS (
      SELECT w, CAST(SUM(n_dw) AS BIGINT) AS c_r FROM dw GROUP BY w
    ),
    tgt_cnt AS (
      SELECT w, CAST(SUM(n_dw) AS BIGINT) AS c_t
      FROM dw JOIN doc_lang USING (doc_id) WHERE lang = 'en' GROUP BY w
    ),
    totals AS (
      SELECT (SELECT SUM(c_r) FROM raw_cnt) AS n_r,
             (SELECT COALESCE(SUM(c_t), 0) FROM tgt_cnt) AS n_t,
             (SELECT COUNT(*) FROM raw_cnt) AS v
    ),
    ratios AS (
      SELECT r.w,
             LN( ((COALESCE(t.c_t, 0) + 1.0) / (totals.n_t + totals.v))
               / ((r.c_r + 1.0) / (totals.n_r + totals.v)) ) AS logratio
      FROM raw_cnt r LEFT JOIN tgt_cnt t USING (w), totals
    )
    SELECT dw.doc_id, dl.lang,
           CAST(SUM(dw.n_dw) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(FLOOR(dw.n_dw * ratios.logratio * 1e9) AS BIGINT))
                AS DOUBLE) / 1e9 AS dsir_logweight
    FROM dw JOIN ratios USING (w) JOIN doc_lang dl USING (doc_id)
    GROUP BY dw.doc_id, dl.lang
    ORDER BY dw.doc_id
"""


@register(
    "sample_importance_dsir",
    category="pipeline",
    oracle=_SQL_DSIR,
    doc="DSIR-style importance weight per document (Xie et al. 2023, "
    "Data Selection via Importance Resampling): score every raw doc by "
    "the log-likelihood ratio of its unigrams under the TARGET "
    "distribution (here: the lang='en' slice) vs the RAW distribution, "
    "add-1 smoothed over the raw vocabulary. Docs whose token mix "
    "matches the target get high weight; sampling Gumbel-top-k on "
    "(weight + noise) — or thresholding, as filter_pipeline_gates does "
    "— yields the DSIR selection. Plan: one corpus-wide doc×word count "
    "(map-side combinable), two vocabulary-sized aggregates, the "
    "per-word log-ratio table joined back BROADCAST (vocab ≪ corpus), "
    "and one per-doc sum — two data-sized shuffles total (word, then "
    "doc). The per-doc fold is FLOOR fixed-point at 1e-9 so the sum is "
    "order-independent and bit-identical cross-engine (log terms are "
    "irrational doubles; a decimal cast could land on a rounding tie).",
)
def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    # dw (the doc×word count table) feeds raw_cnt, tgt_cnt AND the final
    # scoring join — un-checkpointed, each consumer re-tokenized the
    # corpus (3 full passes; guide §3.3). One materialization of the
    # compressed (doc, word, count) grain replaces them.
    dw = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("n_dw"))
        .localCheckpoint()
    )
    doc_lang = d.select("doc_id", "lang")
    raw_cnt = dw.groupBy("w").agg(F.sum("n_dw").alias("c_r"))
    tgt_cnt = (
        dw.join(doc_lang, "doc_id")
        .filter(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.sum("n_dw").alias("c_t"))
    )
    totals = raw_cnt.agg(
        F.sum("c_r").alias("n_r"), F.count(F.lit(1)).alias("v")
    ).crossJoin(tgt_cnt.agg(F.coalesce(F.sum("c_t"), F.lit(0)).alias("n_t")))
    ratios = (
        raw_cnt.join(tgt_cnt, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "w",
            F.log(
                (
                    (F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(1.0))
                    / (F.col("n_t") + F.col("v"))
                )
                / ((F.col("c_r") + F.lit(1.0)) / (F.col("n_r") + F.col("v")))
            ).alias("logratio"),
        )
    )
    return (
        dw.join(ratios, "w")
        .join(doc_lang, "doc_id")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("n_dw").alias("n_tokens"),
            (
                F.sum(
                    F.floor(
                        F.col("n_dw") * F.col("logratio") * F.lit(1e9)
                    ).cast("bigint")
                ).cast("double")
                / F.lit(1e9)
            ).alias("dsir_logweight"),
        )
        .orderBy("doc_id")
    )


_MIX_EPOCH = 100_000  # documents drawn per training epoch


@register(
    "sample_temperature_mixture",
    category="pipeline",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang
    ),
    keyed AS (
      SELECT lang, n_docs,
             CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1e9) AS BIGINT)
               AS weight_fixed
      FROM counts
    )
    SELECT lang, n_docs, weight_fixed,
           CAST(weight_fixed AS DOUBLE)
             / (SELECT SUM(weight_fixed) FROM keyed) AS mixture_share,
           CAST(weight_fixed AS DOUBLE)
             / (SELECT SUM(weight_fixed) FROM keyed) * {_MIX_EPOCH}
             AS expected_docs_per_epoch
    FROM keyed ORDER BY lang
    """,
    doc="Temperature-scaled language mixture (the multilingual-LM "
    "upsampling rule: p_i ∝ n_i^α, here α = 1/2): low-resource "
    "languages are upweighted relative to their raw share so an epoch "
    "doesn't collapse onto the head language. α = 1/2 uses SQRT — "
    "correctly rounded by IEEE 754, so unlike POW (libm-dependent, "
    "±1 ulp across engines) the weights are bit-identical everywhere; "
    "the fixed-point FLOOR then makes the normalizing SUM an exact "
    "integer sum (no float accumulation-order hazard). Plan: one "
    "map-side-combinable count per language, then constant-size "
    "(|langs| rows) arithmetic — the data-sized work is exactly one "
    "combinable groupBy at any corpus size. The per-doc sampler "
    "consuming these shares is sample_mixture_weighted.",
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    keyed = counts.select(
        "lang",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * F.lit(1e9))
        .cast("bigint")
        .alias("weight_fixed"),
    )
    total = keyed.agg(F.sum("weight_fixed").alias("tw"))
    share = F.col("weight_fixed").cast("double") / F.col("tw")
    return (
        keyed.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            "weight_fixed",
            share.alias("mixture_share"),
            (share * _MIX_EPOCH).alias("expected_docs_per_epoch"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Curriculum ordering (round 3)
# ---------------------------------------------------------------------------

_CURRICULUM_HEAD = 100


@register(
    "sample_curriculum_order",
    category="pipeline",
    oracle=f"""
    WITH banded AS (
      SELECT doc_id,
             CASE WHEN n_chars < 500 THEN 0
                  WHEN n_chars < 2000 THEN 1
                  ELSE 2 END AS band,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    head AS (
      SELECT doc_id, band, h FROM banded
      ORDER BY band, h, doc_id LIMIT {_CURRICULUM_HEAD}
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY band, h, doc_id) AS BIGINT)
             AS curriculum_rank,
           doc_id, CAST(band AS INT) AS band
    FROM head ORDER BY curriculum_rank
    """,
    doc="Curriculum schedule for training: documents progress easy → "
    "hard (difficulty bands from length — the cheap proxy; swap in a "
    "quality/perplexity score column unchanged) while the order WITHIN "
    "a band is a seedless deterministic shuffle (md5 of doc_id — the "
    "same RNG-free idiom as the sampling family, so the schedule is "
    "reproducible and resumable from any offset without materializing "
    "a permutation). The registered query emits the schedule head; the "
    "full-scale layout is the identical sort expressed as "
    "repartitionByRange(band, h) + sortWithinPartitions — a single "
    "range shuffle writing shards that stream in curriculum order. "
    "Plan: TakeOrderedAndProject for the head (per-partition heaps), "
    "a window only over the head rows (driver-sized), no global sort.",
)
def sample_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    banded = d.select(
        "doc_id",
        F.when(F.col("n_chars") < 500, 0)
        .when(F.col("n_chars") < 2000, 1)
        .otherwise(2)
        .cast("int")
        .alias("band"),
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
    )
    head = banded.orderBy("band", "h", "doc_id").limit(_CURRICULUM_HEAD)
    w = W.orderBy("band", "h", "doc_id")
    return (
        head.withColumn(
            "curriculum_rank", F.row_number().over(w).cast("bigint")
        )
        .select("curriculum_rank", "doc_id", "band")
        .orderBy("curriculum_rank")
    )


@register(
    "text_bigram_logprob",
    category="pipeline",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             string_split_regex(TRIM(LOWER(text)), '\s+') AS toks
      FROM documents
    ),
    bg AS (
      SELECT doc_id,
             toks[i] AS prev, toks[i + 1] AS cur
      FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i) r
      WHERE toks[i] <> '' AND toks[i + 1] <> ''
    ),
    uni AS (
      SELECT w, CAST(COUNT(*) AS DOUBLE) AS cu FROM (
        SELECT unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
        FROM documents
      ) WHERE w <> '' GROUP BY w
    ),
    vsize AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
    bgc AS (
      SELECT prev, cur, CAST(COUNT(*) AS DOUBLE) AS cb
      FROM bg GROUP BY prev, cur
    ),
    per_doc_bg AS (
      SELECT doc_id, prev, cur, CAST(COUNT(*) AS DOUBLE) AS m
      FROM bg GROUP BY doc_id, prev, cur
    ),
    scored AS (
      SELECT d.doc_id, d.m,
             LN((c.cb + 1) / (u.cu + vsize.v)) AS lp
      FROM per_doc_bg d
      JOIN bgc c ON d.prev = c.prev AND d.cur = c.cur
      JOIN uni u ON d.prev = u.w, vsize
    )
    SELECT doc_id,
           CAST(SUM(m) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(m * lp AS DECIMAL(18,6))) AS DOUBLE) / SUM(m)
             AS avg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Bigram language-model quality score: per-document mean "
    "log P(w_i | w_(i-1)) with add-1 smoothing over the corpus's own "
    "bigram counts (P = (c(prev,cur)+1) / (c(prev)+V)) — the "
    "conditional upgrade of text_unigram_logprob and the shape of the "
    "KenLM-style perplexity filters production corpora use (token "
    "salad scores far below fluent text even when its unigrams look "
    "normal). Plan: one tokenize pass feeds per-doc bigram "
    "multiplicities (bounded by doc length) and global bigram counts "
    "(map-side combined); scoring joins at the (doc,bigram) grain — "
    "never re-scanning text — with the unigram table broadcast and "
    "the smoothed LN evaluated identically per row in both engines. "
    "At 100 TB cap the bigram table at top-K with an OOV floor, same "
    "plan. Per-doc means go through the decimal cast so a 1-ulp libm "
    "LN difference is absorbed, not accumulated.",
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks")
    )
    bg = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(toks, 1, size(toks) - 1), "
                    "slice(toks, 2, size(toks) - 1), "
                    "(p, c) -> struct(p AS prev, c AS cur))"
                )
            ).alias("pc"),
        )
        .select("doc_id", F.col("pc.prev").alias("prev"), F.col("pc.cur").alias("cur"))
        .filter((F.col("prev") != "") & (F.col("cur") != ""))
    )
    # the Zipf-bounded unigram table feeds two consumers (the vsize
    # total and the broadcast smoothing join); checkpointing it stops
    # each from re-tokenizing the corpus (guide §3.3)
    uni = (
        d.select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("cu"))
        .localCheckpoint()
    )
    vsize = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    # per-doc multiplicities first, then the corpus bigram table as
    # their partial-aggregated rollup: cb = sum of m over docs — the
    # identical count, computed WITHOUT a second tokenize/explode pass
    # over the corpus (the old bgc aggregated the raw bigram stream a
    # second time; per_doc is the compressed grain). per_doc is
    # checkpointed because both the rollup and the scoring join read it.
    per_doc = (
        bg.groupBy("doc_id", "prev", "cur")
        .agg(F.count(F.lit(1)).cast("double").alias("m"))
        .localCheckpoint()
    )
    bgc = per_doc.groupBy("prev", "cur").agg(
        F.sum("m").alias("cb")
    )
    lp = F.log((F.col("cb") + 1) / (F.col("cu") + F.col("v")))
    scored = (
        per_doc.join(bgc, ["prev", "cur"])
        .join(F.broadcast(uni.withColumnRenamed("w", "prev")), "prev")
        .crossJoin(F.broadcast(vsize))
        .select("doc_id", "m", lp.alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("m").cast("bigint").alias("n_bigrams"),
            (dsum(F.col("m") * F.col("lp")) / F.sum("m")).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "sample_balanced_labels",
    category="pipeline",
    oracle="""
    WITH counts AS (
      SELECT label, COUNT(*) AS c FROM embeddings GROUP BY label
    ),
    m AS (SELECT MIN(c) AS m FROM counts),
    kept AS (
      SELECT e.label,
             CASE WHEN CAST('0x' || SUBSTR(md5(CAST(e.vec_id AS VARCHAR)),
                                           1, 4) AS BIGINT) * c.c
                       < 65536 * m.m
                  THEN 1 ELSE 0 END AS keep
      FROM embeddings e JOIN counts c USING (label), m
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(keep) AS BIGINT) AS n_kept
    FROM kept GROUP BY label ORDER BY label
    """,
    doc="Class-balanced downsampling: every label kept at rate "
    "min_class_count / class_count via the RNG-free md5 hash threshold "
    "(integer cross-multiplied comparison — exact in both engines, no "
    "float rate), so expected kept counts equalize across labels — the "
    "standard eval-set / probe-set balancing step before training a "
    "classifier on embeddings. Deterministic and append-stable: a "
    "vector's keep verdict never changes as the corpus grows (only the "
    "rates do), the same property as split_train_test. Plan: one "
    "count-per-label aggregate (label-sized) broadcast back onto the "
    "stream with the min as a one-row cross join; verdicts are "
    "map-side; the final rollup is label-sized.",
)
def sample_balanced_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("c"))
    m = counts.agg(F.min("c").alias("m"))
    frac = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string").cast("binary")), 1, 4),
        16,
        10,
    ).cast("bigint")
    keep = F.when(frac * F.col("c") < 65536 * F.col("m"), 1).otherwise(0)
    return (
        e.join(F.broadcast(counts), "label")
        .crossJoin(F.broadcast(m))
        .select("label", keep.alias("keep"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("keep").cast("bigint").alias("n_kept"),
        )
        .orderBy("label")
    )


@register(
    "pipeline_dataset_card",
    category="pipeline",
    oracle=r"""
    WITH base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(SUM(LEN(string_split_regex(TRIM(text), '\s+'))) AS BIGINT)
               AS total_tokens,
             CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
      FROM documents
    ),
    top AS (
      SELECT lang AS top_lang, CAST(COUNT(*) AS BIGINT) AS top_cnt
      FROM documents GROUP BY lang
      ORDER BY COUNT(*) DESC, lang ASC LIMIT 1
    )
    SELECT n_docs, n_sources, n_langs, total_tokens,
           CAST((1000 * total_tokens) // n_docs AS BIGINT) AS avg_tokens_milli,
           top_lang,
           CAST((1000000 * top_cnt) // n_docs AS BIGINT) AS top_lang_share_ppm,
           CAST((1000000 * (n_docs - n_unique_texts)) // n_docs AS BIGINT)
             AS exact_dup_ppm
    FROM base CROSS JOIN top
    """,
    doc="Dataset card: the one-row release summary every corpus ships "
    "with — document/source/language counts, total and mean token "
    "volume, the dominant language's share, and the exact-duplicate "
    "rate (ppm, via distinct md5) — the numbers a training run's data "
    "sheet quotes, produced by the engine instead of a notebook. All "
    "ratios are integer ppm/milli (integer division — no float "
    "nondeterminism). Scale: one map-side-combinable aggregation pass "
    "plus two count-distincts (16-byte md5 keys shuffle once) and a "
    "1-row TakeOrdered for the top language; the cross-joins are "
    "one-row broadcasts. At 100 TB this is exactly the shape of the "
    "existing audit aggregates — nothing row-grained survives the "
    "first exchange.",
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    base = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint")
        .alias("total_tokens"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("n_unique_texts"),
    )
    top = (
        d.groupBy(F.col("lang").alias("top_lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("top_cnt"))
        .orderBy(F.col("top_cnt").desc(), F.col("top_lang").asc())
        .limit(1)
    )
    return base.crossJoin(F.broadcast(top)).select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_tokens",
        F.expr("CAST((1000 * total_tokens) DIV n_docs AS BIGINT)").alias(
            "avg_tokens_milli"
        ),
        "top_lang",
        F.expr("CAST((1000000 * top_cnt) DIV n_docs AS BIGINT)").alias(
            "top_lang_share_ppm"
        ),
        F.expr(
            "CAST((1000000 * (n_docs - n_unique_texts)) DIV n_docs AS BIGINT)"
        ).alias("exact_dup_ppm"),
    )


# ---------------------------------------------------------------------------
# Semantic (embedding-level) train/test contamination
# ---------------------------------------------------------------------------

#: every 10th vector is "held out" — the same deterministic hash-split
#: convention split_train_test uses, applied to the embedding corpus
_SEMCON_TEST_MOD = 10
#: cross-split cosine at or above this flags a semantic leak (the
#: corpus's max pair cosine is ~0.48, so 0.4 demonstrates real matches;
#: production leak scans run at 0.95+ where paraphrase-level dups live)
_SEMCON_THRESHOLD = 0.4


_SEMCON_COS = _semcon_cos("t.embedding", "r.embedding")


@register(
    "contamination_semantic",
    category="pipeline",
    oracle=f"""
    WITH corpus AS (
      SELECT * FROM embeddings
      WHERE vec_id % (SELECT GREATEST(1,
              CAST(CEIL(COUNT(*) / {_SEMCON_MV}.0) AS BIGINT))
            FROM embeddings) = 0
    ),
    test AS (SELECT * FROM corpus WHERE vec_id % {_SEMCON_TEST_MOD} = 0),
    train AS (SELECT * FROM corpus WHERE vec_id % {_SEMCON_TEST_MOD} <> 0),
    leaks AS (
      SELECT t.vec_id AS test_id, r.vec_id AS train_id,
             {_SEMCON_COS} AS cosine
      FROM test t JOIN train r ON {_SEMCON_COS} >= {_SEMCON_THRESHOLD}
    ),
    tots AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM test) AS n_test_total,
             (SELECT CAST(COUNT(DISTINCT test_id) AS BIGINT) FROM leaks)
               AS n_leaked_total
    )
    SELECT l.test_id, l.train_id, l.cosine,
           tots.n_test_total, tots.n_leaked_total
    FROM leaks l, tots
    ORDER BY l.cosine DESC, l.test_id, l.train_id
    LIMIT 20
    """,
)
def contamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic train/test contamination scan — the embedding-level
    sibling of contamination_check (exact fingerprints) and
    contamination_ngram_overlap (surface n-grams): a held-out vector
    whose cosine against ANY training vector exceeds the threshold is a
    leak the surface checks can't see (paraphrases, translations,
    re-encodings land nearby in embedding space; Yang et al. 2023
    "rephrased samples" is exactly this failure). Output: the top
    leaked pairs plus corpus totals (held-out count, leaked count).

    Scale: the registered form stride-samples the corpus to the shared
    COSINE_MAX_VECTORS gate (oracle-mirrored, inert at shipped sfs) —
    the exact cross join is the labeled baseline; at real scale this
    runs as the SemDeDup-style capped-centroid cell compare
    (dedup.semdedup_centroid) or an ANN probe (similarity.sim_topk_*)
    with the same split predicate, both already in-repo. Norms fold
    once per vector before the pair join; the fixed-point kernel keeps
    cross-engine bit parity."""
    from .dedup import COSINE_MAX_VECTORS
    from ..functions.vector import dot_fixed

    e = t(spark, sf_dir, "embeddings")
    n_total = e.count()
    stride = max(1, -(-n_total // COSINE_MAX_VECTORS))
    corpus = e.filter(F.col("vec_id") % stride == 0)
    withnorm = corpus.select(
        "vec_id",
        "embedding",
        F.sqrt(dot_fixed(F.col("embedding"), F.col("embedding"))).alias("norm"),
    ).localCheckpoint()
    test = withnorm.filter(F.col("vec_id") % _SEMCON_TEST_MOD == 0)
    train = withnorm.filter(F.col("vec_id") % _SEMCON_TEST_MOD != 0)
    a, b = test.alias("a"), train.alias("b")
    cos = dot_fixed(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    leaks = (
        a.join(b, cos >= _SEMCON_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("test_id"),
            F.col("b.vec_id").alias("train_id"),
            cos.alias("cosine"),
        )
        .localCheckpoint()
    )
    tots = test.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_total")
    ).crossJoin(
        leaks.agg(
            F.count_distinct("test_id").cast("bigint").alias("n_leaked_total")
        )
    )
    return (
        leaks.crossJoin(tots)
        .orderBy(F.col("cosine").desc(), "test_id", "train_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Fractional-epoch repetition sampling (per-source epoch weights)
# ---------------------------------------------------------------------------

#: per-source epoch weight in milli-epochs, derived deterministically
#: from the source name's md5 (stand-in for the curated recipe table a
#: real run broadcasts): 1000 + 500 * (first hex digit % 4) → 1.0, 1.5,
#: 2.0 or 2.5 epochs. Fractional epochs are the norm in pretraining
#: recipes (wiki ~3.3 epochs, web ~1.1 in the published LLaMA mix).
_EPOCH_BASE_MILLI = 1000
_EPOCH_STEP_MILLI = 500
_EPOCH_BUCKETS = 4


@register(
    "sample_epoch_repetition",
    category="pipeline",
    oracle=f"""
    WITH wts AS (
      SELECT source,
             {_EPOCH_BASE_MILLI} + {_EPOCH_STEP_MILLI} *
               (CAST('0x' || SUBSTR(md5(source), 1, 1) AS BIGINT)
                % {_EPOCH_BUCKETS}) AS w_milli
      FROM (SELECT DISTINCT source FROM documents)
    ),
    perdoc AS (
      SELECT d.doc_id, d.source, w.w_milli,
             w.w_milli // 1000
             + CASE WHEN CAST('0x' || SUBSTR(md5(CAST(d.doc_id AS VARCHAR)), 1, 3)
                         AS BIGINT) * 1000 < (w.w_milli % 1000) * 4096
                    THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN wts w USING (source)
    ),
    exploded AS (
      SELECT p.doc_id, p.source, p.w_milli, g.epoch
      FROM perdoc p, UNNEST(generate_series(1, p.n_copies)) AS g(epoch)
    )
    SELECT source, MIN(w_milli) AS w_milli,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST((1000 * COUNT(*)) // COUNT(DISTINCT doc_id) AS BIGINT)
             AS achieved_milli
    FROM exploded
    GROUP BY source
    ORDER BY source
    """,
)
def sample_epoch_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch repetition sampling: each source carries an
    epoch weight in milli-epochs (e.g. 2.5 epochs = every doc appears
    twice, half the docs — chosen by a deterministic md5 threshold —
    appear a third time). This is the repetition step of a pretraining
    data recipe (LLaMA's wiki 3.3 / web 1.1 mix; Muennighoff et al.
    2023 on repeating constrained data): up-weighting curated sources
    by REPLAYING their docs, with the fractional remainder drawn
    RNG-free so the realized rate is exact and append-stable. Output
    per source: target weight, doc count, emitted copies, and the
    achieved milli-rate (copies/doc), which the oracle pins exactly.

    Scale: the weight table is per-source (tiny, broadcast); copy
    counts are per-row expression work (md5 threshold, integer
    compare); the replication is sequence+explode — map-side row
    generation, the same mechanics a shuffle-shard writer consumes
    downstream — and the summary is one map-side-combinable groupBy on
    source. No corpus self-joins, no skew (explode factor ≤ 3)."""
    d = t(spark, sf_dir, "documents")
    srcw = (
        d.select("source")
        .distinct()
        .select(
            "source",
            (
                _EPOCH_BASE_MILLI
                + _EPOCH_STEP_MILLI
                * (
                    F.conv(
                        F.substring(F.md5(F.col("source").cast("binary")), 1, 1),
                        16,
                        10,
                    ).cast("bigint")
                    % _EPOCH_BUCKETS
                )
            ).alias("w_milli"),
        )
    )
    h3 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 3),
        16,
        10,
    ).cast("bigint")
    perdoc = d.join(F.broadcast(srcw), "source").select(
        "doc_id",
        "source",
        "w_milli",
        (
            F.expr("w_milli DIV 1000")
            + F.when(h3 * 1000 < (F.col("w_milli") % 1000) * 4096, 1).otherwise(0)
        ).alias("n_copies"),
    )
    exploded = perdoc.select(
        "doc_id",
        "source",
        "w_milli",
        F.explode(F.sequence(F.lit(1), F.col("n_copies").cast("int"))).alias(
            "epoch"
        ),
    )
    return (
        exploded.groupBy("source")
        .agg(
            F.min("w_milli").alias("w_milli"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.expr(
                "CAST((1000 * count(1)) DIV count(DISTINCT doc_id) AS BIGINT)"
            ).alias("achieved_milli"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/test split

_SQL_SPLIT_LEAKAGE_SAFE = f"""
    WITH RECURSIVE {_LS_SHINGLES},
    p0 AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_shared
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT id1, id2 FROM p0
      JOIN sizes s1 ON p0.id1 = s1.doc_id
      JOIN sizes s2 ON p0.id2 = s2.doc_id
      WHERE CAST(n_shared AS DOUBLE) / (s1.n + s2.n - n_shared) >= {_LS_JT}
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
    ),
    assign AS (
      SELECT doc_id, cluster_id,
             CASE WHEN CAST('0x' || SUBSTR(
                      md5(CAST(cluster_id AS VARCHAR)), 1, 13) AS BIGINT)
                  % 10 < 8
                  THEN 'train' ELSE 'test' END AS split
      FROM labels
    ),
    leak AS (
      SELECT COUNT(*) AS leakage_pairs
      FROM pairs p
      JOIN assign a1 ON p.id1 = a1.doc_id
      JOIN assign a2 ON p.id2 = a2.doc_id
      WHERE a1.split <> a2.split
    )
    SELECT split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT cluster_id) AS n_clusters,
           (SELECT leakage_pairs FROM leak) AS leakage_pairs
    FROM assign GROUP BY split ORDER BY split
"""


@register(
    "split_leakage_safe",
    category="pipeline",
    oracle=_SQL_SPLIT_LEAKAGE_SAFE,
    doc="Near-dup-aware train/test split: hash the CLUSTER id (connected "
    "components over verified near-dup pairs), not the doc id, so every "
    "near-duplicate family lands wholly in one split — per-split doc and "
    "cluster counts plus the cross-split near-dup pair count, which is "
    "structurally zero and the oracle recomputes it independently.",
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split that plain split_train_test cannot give you: hashing
    doc_id sends two 0.99-Jaccard near-duplicates to opposite sides
    about 2·p·(1-p) of the time, and the eval split then scores the
    model on near-copies of its own training data. Here the split key
    is the near-dup CLUSTER id (min doc_id of the component, from the
    same large-star/small-star CC as dedup_clusters), so membership is
    still a pure deterministic hash — append-stable, engine-stable —
    but the leakage unit is the whole family. leakage_pairs counts
    verified near-dup pairs whose endpoints disagree on split: zero BY
    CONSTRUCTION (cluster members share cluster_id, hence split); the
    column exists because the oracle derives it from ITS OWN closure +
    assignment, making the guarantee cross-checked rather than assumed.

    Scale: cluster_labels is the measured CC path (out_norm 0.09 at the
    sf1 replica — see SCALE.md); the assignment adds one md5 per
    cluster and the rollup is split-sized. The leakage audit reuses the
    REPRESENTATIVE pair list the components were built from (returned
    by cluster_labels(with_pairs=True), checkpointed — the LSH/verify
    pass runs ONCE, not twice) and joins it against the assignment
    twice on doc_id. Representative pairs suffice for the audit:
    exact-duplicate twins carry their representative's cluster_id, so a
    member-level pair straddles splits iff its representative pair
    does — and the oracle independently recomputes the count over ALL
    exact-Jaccard pairs from its own closure."""
    labels, pairs = _ls_cluster_labels(spark, sf_dir, with_pairs=True)
    split = F.when(
        h13(F.col("cluster_id").cast("string")) % 10 < 8,
        F.lit("train"),
    ).otherwise(F.lit("test"))
    assign = labels.select("doc_id", "cluster_id", split.alias("split"))

    a1 = assign.select(
        F.col("doc_id").alias("id1"), F.col("split").alias("split1")
    )
    a2 = assign.select(
        F.col("doc_id").alias("id2"), F.col("split").alias("split2")
    )
    leak = (
        pairs.join(a1, "id1")
        .join(a2, "id2")
        .filter(F.col("split1") != F.col("split2"))
        .agg(F.count(F.lit(1)).alias("leakage_pairs"))
    )
    return (
        assign.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("cluster_id").cast("bigint").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leak))
        .orderBy("split")
    )
