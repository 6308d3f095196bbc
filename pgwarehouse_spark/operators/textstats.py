"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface (language ID, quality scoring, token
counting, document fingerprinting).

No anchor in the reference (it syncs text columns verbatim); these are
the first-class large-scale pipeline operators layered on top. Every
expression is built-in Spark SQL (JVM codegen, no Python UDFs) and each
has a DuckDB oracle using the identical arithmetic, so results are
bit-deterministic cross-engine:

- counts via the replace-trick or regexp splits (integer-exact);
- ratios as double divisions of identical integers (bit-identical);
- fingerprints via md5 of whitespace-normalized text.

At 100 TB all of these are embarrassingly parallel single-pass column
expressions — no shuffle at all until an aggregation is requested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import t

# Stopword marker sets per language for the n-gram/stopword heuristic.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "a", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "y", "los", "es"],
}


def _count_token(col: Column, word: str) -> Column:
    """Occurrences of a whole word via the replace trick (portable to any
    SQL engine, integer-exact): pad the text with spaces, remove every
    ' word ' occurrence, divide the length delta."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    removed = F.replace(padded, F.lit(f" {word} "), F.lit(" "))
    return (F.length(padded) - F.length(removed)) / (len(word) + 1)


def _sql_count_token(expr: str, word: str) -> str:
    return (
        f"(LENGTH(' ' || {expr} || ' ') - "
        f"LENGTH(REPLACE(' ' || {expr} || ' ', ' {word} ', ' '))) / {len(word) + 1}"
    )


def token_count(col: Column) -> Column:
    """Whitespace token count (engine function, reused by quality score)."""
    return F.size(F.split(F.trim(col), r"\s+"))


@register(
    "text_token_count",
    category="text",
    oracle=r"""
    SELECT doc_id,
           CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS INT) AS n_tokens,
           CAST(LENGTH(text) AS INT) AS n_chars_measured,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS INT) AS n_nonspace_chars
    FROM documents ORDER BY doc_id
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokenization (the BPE-ish regex variant is
    in text_quality_score's word-length stats)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tokens"),
            F.length("text").alias("n_chars_measured"),
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias(
                "n_nonspace_chars"
            ),
        )
        .orderBy("doc_id")
    )


_QUALITY_ORACLE = r"""
    WITH base AS (
      SELECT doc_id,
             CAST(LENGTH(text) AS INT) AS n_chars,
             CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS INT) AS n_tokens,
             CAST({the_count} AS INT) AS n_the,
             CAST({a_count} AS INT) AS n_a
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
           CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len,
           CAST(n_the + n_a AS DOUBLE) / n_tokens AS stopword_ratio,
           CASE WHEN n_tokens BETWEEN 20 AND 1000
                 AND CAST(n_chars AS DOUBLE) / n_tokens BETWEEN 3.0 AND 12.0
                 AND CAST(n_the + n_a AS DOUBLE) / n_tokens > 0.01
                THEN 1 ELSE 0 END AS quality_pass
    FROM base ORDER BY doc_id
""".format(
    the_count=_sql_count_token("text", "the"),
    a_count=_sql_count_token("text", "a"),
)


@register("text_quality_score", category="text", oracle=_QUALITY_ORACLE)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, average token length, stopword ratio, and a
    boolean gate — the standard pretraining-data heuristics (C4-style),
    as pure column expressions."""
    d = t(spark, sf_dir, "documents")
    text = F.col("text")
    base = d.select(
        "doc_id",
        F.length(text).alias("n_chars"),
        token_count(text).alias("n_tokens"),
        _count_token(text, "the").cast("int").alias("n_the"),
        _count_token(text, "a").cast("int").alias("n_a"),
    )
    avg_tok = F.col("n_chars").cast("double") / F.col("n_tokens")
    stop_ratio = (F.col("n_the") + F.col("n_a")).cast("double") / F.col("n_tokens")
    return (
        base.select(
            "doc_id",
            "n_chars",
            "n_tokens",
            avg_tok.alias("avg_token_len"),
            stop_ratio.alias("stopword_ratio"),
            F.when(
                F.col("n_tokens").between(20, 1000)
                & avg_tok.between(3.0, 12.0)
                & (stop_ratio > 0.01),
                1,
            )
            .otherwise(0)
            .alias("quality_pass"),
        )
        .orderBy("doc_id")
    )


_LANGID_SCORES_SQL = ",\n".join(
    "CAST({} AS INT) AS score_{}".format(
        " + ".join(_sql_count_token("text", w) for w in words), lang
    )
    for lang, words in _LANG_MARKERS.items()
)

_LANGID_ORACLE = f"""
    WITH scored AS (
      SELECT doc_id, lang AS lang_actual, {_LANGID_SCORES_SQL}
      FROM documents
    )
    SELECT doc_id, lang_actual,
           CASE
             WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es
                  AND score_en > 0 THEN 'en'
             WHEN score_de >= score_fr AND score_de >= score_es AND score_de > 0 THEN 'de'
             WHEN score_fr >= score_es AND score_fr > 0 THEN 'fr'
             WHEN score_es > 0 THEN 'es'
             ELSE 'unknown'
           END AS lang_predicted,
           score_en, score_de, score_fr, score_es
    FROM scored ORDER BY doc_id
"""


def _langid_scored(d) -> "tuple":
    """(scored_frame, prediction_column): per-language stopword-marker
    scores plus the fixed-precedence (en>de>fr>es) argmax — THE
    classifier, defined once so text_langid and its confusion-matrix
    evaluation cannot drift (r4 self-review: the score dict and the
    when-chain existed twice; the SQL side already half-extracted
    _LANGID_PRED_SQL)."""
    text = F.col("text")
    scores = {
        lang: sum(
            (_count_token(text, w) for w in words), F.lit(0)
        ).cast("int")
        for lang, words in _LANG_MARKERS.items()
    }
    scored = d.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        *[scores[lang].alias(f"score_{lang}") for lang in _LANG_MARKERS],
    )
    en, de, fr, es = (F.col(f"score_{x}") for x in ("en", "de", "fr", "es"))
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
        .when((de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("unknown")
    )
    return scored, pred


@register("text_langid", category="text", oracle=_LANGID_ORACLE)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-marker scoring (n-gram heuristic family).
    Deterministic argmax with a fixed precedence order (en>de>fr>es) so
    ties resolve identically everywhere."""
    scored, pred = _langid_scored(t(spark, sf_dir, "documents"))
    return (
        scored.select(
            "doc_id",
            "lang_actual",
            pred.alias("lang_predicted"),
            "score_en",
            "score_de",
            "score_fr",
            "score_es",
        )
        .orderBy("doc_id")
    )


def fingerprint_expr(col: Column) -> Column:
    """Normalized md5 fingerprint: lowercase, collapse whitespace, trim."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")).cast("binary")
    )


@register(
    "text_fingerprint",
    category="text",
    oracle=r"""
    SELECT doc_id,
           md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS fp,
           SUBSTRING(md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))), 1, 8) AS fp_short
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized text — the
    exact-dedup key. (The rolling/shingle variant lives in the MinHash
    pipeline, operators/dedup.py.)"""
    d = t(spark, sf_dir, "documents")
    fp = fingerprint_expr(F.col("text"))
    return (
        d.select(
            "doc_id",
            fp.alias("fp"),
            F.substring(fp, 1, 8).alias("fp_short"),
        )
        .orderBy("doc_id")
    )


_REPETITION_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS l FROM documents
    ),
    stats AS (
      SELECT doc_id,
             CAST(LEN(l) AS INT) AS n_tokens,
             CAST(LEN(list_distinct(l)) AS INT) AS n_distinct_tokens,
             CAST(list_max(list_transform(list_distinct(l),
                  x -> LEN(list_filter(l, y -> y = x)))) AS INT) AS top_token_count,
             CAST(LEN(l) - 1 AS INT) AS n_bigrams,
             CAST(LEN(list_distinct(list_transform(generate_series(1, LEN(l) - 1),
                  i -> l[i] || ' ' || l[i+1]))) AS INT) AS n_distinct_bigrams
      FROM toks
    )
    SELECT doc_id, n_tokens, n_distinct_tokens, top_token_count,
           n_bigrams, n_distinct_bigrams,
           CAST(top_token_count AS DOUBLE) / n_tokens AS top_token_frac,
           CASE WHEN n_bigrams > 0
                THEN 1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams
           END AS dup_bigram_frac,
           CASE WHEN CAST(top_token_count AS DOUBLE) / n_tokens > 0.2
                  OR (n_bigrams > 0
                      AND 1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams > 0.3)
                THEN 1 ELSE 0 END AS repetitive
    FROM stats ORDER BY doc_id
"""


@register("text_repetition_stats", category="text", oracle=_REPETITION_ORACLE)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: most-common-token fraction and
    duplicate-bigram fraction per document, plus the boolean gate a
    pretraining pipeline applies (top-token > 20% or dup-bigrams > 30%).

    Everything is array higher-order functions over the tokenized row —
    single-pass, zero shuffle, JVM-side lambdas (no Python). The per-row
    cost of the top-token scan is O(distinct x tokens), bounded by
    document length — at 100 TB this stays embarrassingly parallel and
    the integer ratios keep the oracle hash exact."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("l")
    )
    stats = toks.select(
        "doc_id",
        F.size("l").alias("n_tokens"),
        F.size(F.array_distinct("l")).alias("n_distinct_tokens"),
        F.expr(
            "array_max(transform(array_distinct(l),"
            " x -> size(filter(l, y -> y = x))))"
        ).alias("top_token_count"),
        (F.size("l") - 1).alias("n_bigrams"),
        F.size(
            F.array_distinct(
                F.expr(
                    "zip_with(slice(l, 1, size(l) - 1), slice(l, 2, size(l) - 1),"
                    " (a, b) -> concat(a, ' ', b))"
                )
            )
        ).alias("n_distinct_bigrams"),
    )
    top_frac = F.col("top_token_count").cast("double") / F.col("n_tokens")
    dup_frac = F.lit(1.0) - F.col("n_distinct_bigrams").cast("double") / F.col(
        "n_bigrams"
    )
    return (
        stats.select(
            "doc_id",
            "n_tokens",
            "n_distinct_tokens",
            "top_token_count",
            "n_bigrams",
            "n_distinct_bigrams",
            top_frac.alias("top_token_frac"),
            F.when(F.col("n_bigrams") > 0, dup_frac).alias("dup_bigram_frac"),
            F.when(
                (top_frac > 0.2)
                | ((F.col("n_bigrams") > 0) & (dup_frac > 0.3)),
                1,
            )
            .otherwise(0)
            .alias("repetitive"),
        )
        .orderBy("doc_id")
    )


@register(
    "split_train_test",
    category="pipeline",
    oracle="""
    SELECT doc_id,
           CASE WHEN SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                THEN 'train' ELSE 'test' END AS split
    FROM documents
    ORDER BY doc_id
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/20 train/test assignment by hashing the key, not
    by RNG: md5 hex prefix < 'cd' (205/256 = 80.08%). Unlike
    df.randomSplit, the assignment is a pure function of doc_id —
    reproducible across engines, runs, partitionings, and cluster sizes,
    and stable under incremental appends (new docs don't reshuffle old
    assignments — the property a training pipeline actually needs)."""
    d = t(spark, sf_dir, "documents")
    prefix = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    return (
        d.select(
            "doc_id",
            F.when(prefix < "cd", "train").otherwise("test").alias("split"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_redact",
    category="text",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[0-9]+(\.[0-9]+)?', '<NUM>', 'g'),
             '\b[a-z]+@[a-z]+\.[a-z]{2,}\b', '<EMAIL>', 'g'
           ) AS redacted,
           CAST(LENGTH(text)
                - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS INT)
             AS n_digit_chars
    FROM documents ORDER BY doc_id
    """,
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction transform: numbers and email-shaped tokens
    replaced with placeholder tags, plus a digit-density count (a common
    quality/PII risk signal). Pure regexp_replace — single-pass JVM
    expressions, embarrassingly parallel; the pattern set is where a
    production pipeline would plug its PII rule pack."""
    d = t(spark, sf_dir, "documents")
    step1 = F.regexp_replace(F.col("text"), r"[0-9]+(\.[0-9]+)?", "<NUM>")
    redacted = F.regexp_replace(step1, r"\b[a-z]+@[a-z]+\.[a-z]{2,}\b", "<EMAIL>")
    return (
        d.select(
            "doc_id",
            redacted.alias("redacted"),
            (
                F.length("text")
                - F.length(F.regexp_replace(F.col("text"), "[0-9]", ""))
            ).alias("n_digit_chars"),
        )
        .orderBy("doc_id")
    )


# Gopher-style document-quality rule pack (Rae et al. 2021, "Scaling
# Language Models: ... Gopher" §A.1.1): hard bounds on length, mean word
# length, symbol density, alpha-word fraction, and stopword presence.
# Thresholds follow the paper where the synthetic corpus makes them
# meaningful; each rule is a named flag so downstream can re-weight
# instead of hard-dropping.
_GOPHER_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")

# Shared SQL CTE chain: per-document Gopher features + keep verdict
# (used by filter_gopher_rules' oracle and source_quality_report's).
GOPHER_FEAT_SQL = r"""
    gopher_base AS (
      SELECT doc_id, lang, source,
             string_split_regex(TRIM(text), '\s+') AS l,
             CAST(LENGTH(regexp_replace(text, '\s', '', 'g')) AS INT)
               AS n_word_chars,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, '#', '')) AS INT)
               + CAST((LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) / 3 AS INT)
               AS n_symbols,
             {stop_hits} AS stopword_hits
      FROM documents
    ),
    gopher_feat AS (
      SELECT doc_id, lang, source,
             CAST(LEN(l) AS INT) AS n_tokens,
             CAST(n_word_chars AS DOUBLE) / LEN(l) AS mean_word_len,
             CAST(n_symbols AS DOUBLE) / LEN(l) AS symbol_ratio,
             CAST(LEN(list_filter(l, x -> regexp_matches(x, '[a-z]')))
                  AS DOUBLE) / LEN(l) AS alpha_word_frac,
             stopword_hits
      FROM gopher_base
    ),
    gopher AS (
      SELECT *,
             CAST(n_tokens BETWEEN 50 AND 100000 AS INT) AS pass_len,
             CAST(mean_word_len BETWEEN 3.0 AND 10.0 AS INT) AS pass_mean_len,
             CAST(symbol_ratio <= 0.1 AS INT) AS pass_symbol,
             CAST(alpha_word_frac >= 0.8 AS INT) AS pass_alpha,
             CAST(stopword_hits >= 2 AS INT) AS pass_stopword,
             CAST(n_tokens BETWEEN 50 AND 100000
                  AND mean_word_len BETWEEN 3.0 AND 10.0
                  AND symbol_ratio <= 0.1
                  AND alpha_word_frac >= 0.8
                  AND stopword_hits >= 2 AS INT) AS keep
      FROM gopher_feat
    )
""".format(
    stop_hits="CAST("
    + " + ".join(
        f"CASE WHEN {_sql_count_token('text', w)} > 0 THEN 1 ELSE 0 END"
        for w in _GOPHER_STOPWORDS
    )
    + " AS INT)"
)

_GOPHER_ORACLE = f"""
    WITH {GOPHER_FEAT_SQL}
    SELECT doc_id, lang, n_tokens, mean_word_len, symbol_ratio,
           alpha_word_frac, stopword_hits,
           pass_len, pass_mean_len, pass_symbol, pass_alpha,
           pass_stopword, keep
    FROM gopher ORDER BY doc_id
"""


def gopher_flags(d: DataFrame) -> DataFrame:
    """Per-document Gopher features + rule flags + keep verdict, keyed
    by (doc_id, lang, source) — the Spark twin of GOPHER_FEAT_SQL."""
    text = F.col("text")
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / 3
    stop_hits = sum(
        (
            F.when(_count_token(text, w) > 0, 1).otherwise(0)
            for w in _GOPHER_STOPWORDS
        ),
        F.lit(0),
    ).cast("int")
    base = d.select(
        "doc_id",
        "lang",
        "source",
        F.split(F.trim(text), r"\s+").alias("l"),
        F.length(F.regexp_replace(text, r"\s", "")).cast("int").alias("n_word_chars"),
        (n_hash + n_ellipsis).cast("int").alias("n_symbols"),
        stop_hits.alias("stopword_hits"),
    )
    n_tokens = F.size("l")
    feat = base.select(
        "doc_id",
        "lang",
        "source",
        n_tokens.cast("int").alias("n_tokens"),
        (F.col("n_word_chars").cast("double") / n_tokens).alias("mean_word_len"),
        (F.col("n_symbols").cast("double") / n_tokens).alias("symbol_ratio"),
        F.expr(
            "CAST(size(filter(l, x -> x rlike '[a-z]')) AS DOUBLE) / size(l)"
        ).alias("alpha_word_frac"),
        "stopword_hits",
    )
    p_len = F.col("n_tokens").between(50, 100000)
    p_mean = F.col("mean_word_len").between(3.0, 10.0)
    p_sym = F.col("symbol_ratio") <= 0.1
    p_alpha = F.col("alpha_word_frac") >= 0.8
    p_stop = F.col("stopword_hits") >= 2
    return feat.select(
        "*",
        p_len.cast("int").alias("pass_len"),
        p_mean.cast("int").alias("pass_mean_len"),
        p_sym.cast("int").alias("pass_symbol"),
        p_alpha.cast("int").alias("pass_alpha"),
        p_stop.cast("int").alias("pass_stopword"),
        (p_len & p_mean & p_sym & p_alpha & p_stop).cast("int").alias("keep"),
    )


@register("filter_gopher_rules", category="text", oracle=_GOPHER_ORACLE)
def filter_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality gate (Rae et al. 2021 §A.1.1): per-document
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (#/ellipsis density), alphabetic-word fraction, and minimum distinct
    stopword hits — each emitted as a named pass flag plus the combined
    keep verdict, so a pipeline can either hard-filter (`WHERE keep = 1`)
    or log per-rule trip rates (the `filter_pipeline_gates` aggregate
    shape, which this rule pack extends).

    Scale: pure single-pass column expressions over the tokenized row —
    no shuffle, embarrassingly parallel, whole-stage codegen; the ratios
    divide identical integers so the oracle hash is exact. Complements
    text_repetition_stats (Gopher's repetition rules) and
    text_quality_score (C4-style heuristics)."""
    d = t(spark, sf_dir, "documents")
    return (
        gopher_flags(d)
        .drop("source")
        .orderBy("doc_id")
    )


@register(
    "text_token_entropy",
    category="text",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS l FROM documents
    ),
    counts AS (
      SELECT doc_id, LEN(l) AS n,
             list_transform(list_distinct(l),
                            x -> LEN(list_filter(l, y -> y = x))) AS cs
      FROM toks
    )
    SELECT doc_id, CAST(n AS INT) AS n_tokens,
           CAST(ROUND(-list_sum(list_transform(cs,
                c -> (CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n))), 8)
             AS DOUBLE) AS token_entropy
    FROM counts ORDER BY doc_id
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the token distribution per document — the
    information-density quality signal (low entropy = repetitive /
    boilerplate, the continuous form of text_repetition_stats' gates).
    Pure array lambdas, single pass, no shuffle; entropy is a sum over
    the distinct-token histogram so float accumulation order differences
    across engines sit ~1e-14, far under the 8-decimal rounding."""
    d = t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("l")
    ).select(
        "doc_id",
        F.size("l").alias("n"),
        F.expr(
            "transform(array_distinct(l), x -> size(filter(l, y -> y = x)))"
        ).alias("cs"),
    )
    entropy = F.expr(
        "aggregate(cs, 0D, (acc, c) ->"
        " acc - (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n))"
    )
    return (
        base.select(
            "doc_id",
            F.col("n").cast("int").alias("n_tokens"),
            F.round(entropy, 8).alias("token_entropy"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Corpus n-gram counts, PMI collocations, heavy hitters
# ---------------------------------------------------------------------------

_BIGRAM_MIN_COUNT = 5
_PMI_TOP = 100

# Shared CTE chain: lower-cased whitespace tokens -> per-doc word arrays
# -> corpus bigram counts (identical tokenization to the unigram-LM ops).
_BIGRAM_SQL = r"""
    bg_docs AS (
      SELECT string_split_regex(TRIM(LOWER(text)), '\s+') AS l FROM documents
    ),
    bg_z AS (
      -- DuckDB slice bounds are INCLUSIVE (l[:-1] is the whole list):
      -- elements 1..n-1 zip elements 2..n
      SELECT unnest(list_zip(l[1:len(l)-1], l[2:])) AS p
      FROM bg_docs WHERE len(l) >= 2
    ),
    bg_pairs AS (SELECT p[1] AS w1, p[2] AS w2 FROM bg_z),
    bg_counts AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM bg_pairs GROUP BY w1, w2
    )
"""


def _bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram counts: one zip_with per document builds adjacent
    pairs in place (no positional self-join), then a single map-side-
    combined groupBy. The shuffle moves (bigram, partial_count) rows —
    Zipf-bounded far below token volume."""
    d = t(spark, sf_dir, "documents")
    l = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    pairs = F.zip_with(
        F.slice(l, 1, F.greatest(F.size(l) - 1, F.lit(0))),
        F.slice(l, 2, F.greatest(F.size(l) - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
    )
    return (
        d.select(F.explode(pairs).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )


@register(
    "text_ngram_counts",
    category="text",
    oracle=f"""
    WITH {_BIGRAM_SQL}
    SELECT w1, w2, n_pair FROM bg_counts
    WHERE n_pair >= {_BIGRAM_MIN_COUNT}
    ORDER BY n_pair DESC, w1, w2
    """,
    doc="Corpus bigram counting with a min-count floor — the n-gram LM /"
    " tokenizer-training primitive (BPE pair statistics, Kneser-Ney "
    "counts, collocation mining all start from this table).",
)
def text_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair construction is per-row array work (zip_with on the
    token array — no explode-then-positional-self-join, which would
    shuffle the full token stream on (doc_id, pos)). At 100 TB the only
    shuffle is the (bigram, count) partial aggregate; a production run
    adds the same hot-key cap as the shingle ops for degenerate
    single-token corpora."""
    return (
        _bigram_counts(spark, sf_dir)
        .filter(F.col("n_pair") >= _BIGRAM_MIN_COUNT)
        .orderBy(F.col("n_pair").desc(), "w1", "w2")
    )


@register(
    "text_pmi_collocations",
    category="text",
    oracle=f"""
    WITH {_BIGRAM_SQL},
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT unnest(l) AS w FROM bg_docs
      ) WHERE w <> '' GROUP BY w
    ),
    tots AS (
      SELECT (SELECT CAST(SUM(c) AS DOUBLE) FROM uni) AS tu,
             (SELECT CAST(SUM(n_pair) AS DOUBLE) FROM bg_counts) AS tb
    )
    SELECT w1, w2, n_pair,
           ROUND(LN((CAST(n_pair AS DOUBLE) * tu * tu)
                    / (CAST(u1.c AS DOUBLE) * u2.c * tb)), 6) AS pmi
    FROM bg_counts
    JOIN uni u1 ON w1 = u1.w
    JOIN uni u2 ON w2 = u2.w
    CROSS JOIN tots
    WHERE n_pair >= {_BIGRAM_MIN_COUNT}
    ORDER BY pmi DESC, w1, w2
    LIMIT {_PMI_TOP}
    """,
    doc="Pointwise mutual information collocations: PMI = "
    "ln(p(xy)/(p(x)p(y))) over corpus bigrams with a count floor — the "
    "classic phrase-mining / tokenizer-merge scoring function.",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI from one bigram table + one unigram table. The unigram vocab
    (Zipf-bounded) broadcasts onto the bigram counts, the totals ride
    in a 1-row broadcast cross join, so scoring is map-side; the double
    arithmetic is the same left-associated expression in both engines
    (exact integer counts widen to IEEE doubles), and the single LN per
    row is rounded to 6 decimals, absorbing any 1-ulp libm difference
    (the tfidf precedent)."""
    d = t(spark, sf_dir, "documents")
    # one bigram-count frame, cached: the filtered collocation set and
    # the corpus total both read it — without the cache Catalyst plans
    # two independent subtrees that each re-tokenize and re-shuffle the
    # corpus (the most expensive stage, twice).
    bgc = _bigram_counts(spark, sf_dir).localCheckpoint()
    bg = bgc.filter(F.col("n_pair") >= _BIGRAM_MIN_COUNT)
    # the unigram table feeds THREE consumers (u1 broadcast, u2
    # broadcast, the tu total) — without the checkpoint each one
    # re-tokenizes and re-aggregates the whole corpus, because a
    # Project inside each broadcast subtree defeats exchange reuse
    # (guide §3.3 — materialize a reused intermediate; the Zipf-bounded
    # vocab is tiny, so this trades three corpus passes for one)
    uni = (
        d.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    tots = uni.agg(F.sum("c").cast("double").alias("tu")).crossJoin(
        bgc.agg(F.sum("n_pair").cast("double").alias("tb"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log(
            (F.col("n_pair").cast("double") * F.col("tu") * F.col("tu"))
            / (F.col("c1").cast("double") * F.col("c2") * F.col("tb"))
        ),
        6,
    )
    return (
        bg.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tots))
        .select("w1", "w2", "n_pair", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(_PMI_TOP)
    )


_HH_SUPPORT = 0.02  # phi-frequent floor: > 2% of all tokens


@register(
    "text_heavy_hitters",
    category="text",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split_regex(TRIM(LOWER(text)), '\\s+')) AS w
      FROM documents
    ),
    tok2 AS (SELECT w FROM tok WHERE w <> ''),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok2),
    counts AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok2 GROUP BY w)
    SELECT w, c, TRUE AS in_sketch
    FROM counts CROSS JOIN tot
    WHERE c > {_HH_SUPPORT} * n
    ORDER BY c DESC, w
    """,
    doc="Phi-frequent heavy hitters over the token stream, with a "
    "single-pass sketch verdict: the exact counts (one map-side-combined "
    "groupBy + broadcast total) are hash-matched cross-engine, and "
    "in_sketch pins the Misra-Gries guarantee of Spark's freqItems — "
    "every true phi-frequent item MUST appear in the one-pass sketch's "
    "candidate set — to literal TRUE in the oracle.",
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi-frequent tokens + freqItems containment verdict.

    Scale: the exact path is the two-aggregate shape (counts, then
    filter against a broadcast scalar total); the sketch path
    (DataFrame.stat.freqItems — Karp/Misra-Gries) is single-pass with
    O(1/support) state and is how the first pass of a 100 TB run finds
    the candidate set without a full shuffle. The sketch's one-row
    candidate frame stays INSIDE the plan (broadcast cross join +
    array_contains) — plan construction is lazy like every other
    registered query, nothing executes at build/audit time."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    sketch = tok.stat.freqItems(["w"], _HH_SUPPORT)  # lazy 1-row frame
    tot = tok.agg(F.count(F.lit(1)).cast("double").alias("n"))
    counts = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter(F.col("c") > F.lit(_HH_SUPPORT) * F.col("n"))
        .crossJoin(F.broadcast(sketch))
        .select(
            "w",
            "c",
            F.array_contains(F.col("w_freqItems"), F.col("w")).alias(
                "in_sketch"
            ),
        )
        .orderBy(F.col("c").desc(), "w")
    )


# ---------------------------------------------------------------------------
# BPE training step: corpus-wide adjacent-symbol pair counts
# ---------------------------------------------------------------------------

_BPE_TOPN = 50

_SQL_BPE_PAIRS = f"""
    WITH words AS (
      SELECT unnest(string_split_regex(TRIM(text), '\\s+')) AS w
      FROM documents
    ),
    wfreq AS (SELECT w, COUNT(*) AS freq FROM words WHERE w <> '' GROUP BY w),
    chars AS (
      SELECT w, freq, string_split(w, '') AS cs FROM wfreq
    ),
    pairs AS (
      SELECT x[1] AS left_sym, x[2] AS right_sym, freq
      FROM chars, unnest(list_zip(cs, cs[2:])) AS u(x)
      WHERE x[2] IS NOT NULL
    )
    SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM pairs GROUP BY left_sym, right_sym
    ORDER BY pair_count DESC, left_sym, right_sym
    LIMIT {_BPE_TOPN}
"""


@register(
    "tokenizer_bpe_pair_counts",
    category="text",
    oracle=_SQL_BPE_PAIRS,
    doc="One BPE-training merge step at corpus scale: the frequency of "
    "every adjacent character pair, weighted by word frequency — the op "
    "a distributed BPE/WordPiece trainer runs once per merge. The "
    "corpus first collapses to its word-frequency table (the classic "
    "BPE preprocessing step: pair counting is then O(vocab · word_len), "
    "not O(corpus)), so the expensive explode runs over the TINY "
    "distinct-word frame and the only data-sized work is the word "
    "count — a map-side-combinable groupBy. Adjacent pairs come from a "
    "zip of the char array with its shift (JVM-side, no UDF); the "
    "final top-N is a TakeOrderedAndProject, no global sort.",
)
def tokenizer_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    wfreq = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    cs = F.split(F.col("w"), "")
    n = F.size(cs)
    zipped = F.arrays_zip(
        F.slice(cs, 1, F.greatest(n - 1, F.lit(0))).alias("l"),
        F.slice(cs, 2, F.greatest(n - 1, F.lit(0))).alias("r"),
    )
    pairs = wfreq.select(
        F.explode(zipped).alias("p"), "freq"
    ).select(
        F.col("p.l").alias("left_sym"),
        F.col("p.r").alias("right_sym"),
        "freq",
    )
    return (
        pairs.groupBy("left_sym", "right_sym")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(_BPE_TOPN)
    )



_BPE_APPLY_MERGES = 8  # unrolled greedy merge rounds (BPE training loop)


def _sql_bpe_round(prev: str, pair: str, nxt: str) -> str:
    """One BPE training round as DuckDB CTEs: count adjacent symbol
    pairs over the current segmentation, pick the (count desc, pair
    asc) winner, merge it everywhere. Mirrors the Spark loop exactly —
    same ordering, same non-overlapping left-to-right replace."""
    return f"""
    {pair} AS (
      SELECT l, r, cnt FROM (
        SELECT x[1] AS l, x[2] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (
          SELECT freq, string_split(TRIM(seg), ' ') AS syms FROM {prev}
        ), unnest(list_zip(syms, syms[2:])) AS u(x)
        WHERE x[2] IS NOT NULL
        GROUP BY l, r
      ) ORDER BY cnt DESC, l, r LIMIT 1
    ),
    {nxt} AS (
      SELECT w, freq,
             CASE WHEN p.l IS NULL THEN seg
                  ELSE replace(seg, ' ' || p.l || ' ' || p.r || ' ',
                               ' ' || p.l || p.r || ' ')
             END AS seg
      FROM {prev} LEFT JOIN {pair} p ON TRUE
    )"""


_SQL_BPE_APPLY = f"""
    WITH words AS (
      SELECT unnest(string_split_regex(TRIM(text), '\\s+')) AS w
      FROM documents
    ),
    wfreq AS (SELECT w, COUNT(*) AS freq FROM words WHERE w <> '' GROUP BY w),
    seg0 AS (
      SELECT w, freq,
             ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS seg
      FROM wfreq
    ),
    {",".join(_sql_bpe_round(f"seg{i}", f"pair{i + 1}", f"seg{i + 1}")
              for i in range(_BPE_APPLY_MERGES))}
    SELECT * FROM (
      {" UNION ALL ".join(
          f"SELECT CAST({i + 1} AS BIGINT) AS merge_rank, l AS left_sym, "
          f"r AS right_sym, l || r AS merged, cnt AS pair_count "
          f"FROM pair{i + 1}"
          for i in range(_BPE_APPLY_MERGES))}
    ) ORDER BY merge_rank
"""


@register(
    "tokenizer_bpe_apply",
    category="text",
    oracle=_SQL_BPE_APPLY,
    doc="The full greedy BPE training loop, not just one step: "
    f"{_BPE_APPLY_MERGES} merge rounds — each counts adjacent symbol "
    "pairs over the current segmentation of the word-frequency table, "
    "takes the (count desc, pair asc) winner as a driver scalar (the "
    "watermark pattern: one tiny collect per round, never corpus-"
    "sized), and merges it everywhere with a literal non-overlapping "
    "replace. The result is the MERGE TABLE itself — (rank, left, "
    "right, merged, pair count at merge time), the artifact a "
    "tokenizer trainer ships. The oracle replays every round as "
    "chained CTEs with the identical ordering and replace semantics, "
    "so the learned merges match cross-engine exactly.",
)
def tokenizer_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: all rounds run over the DISTINCT-WORD frame (the classic
    BPE preprocessing collapse — vocab-sized, not corpus-sized), so the
    only data-sized work is the initial word count. Each round is one
    combinable pair aggregation + a `first()` driver scalar + one
    map-side replace; the vocab frame is localCheckpointed once so the
    per-round lineage stays flat. Application to the corpus is implicit
    in the freq weights (token_count = sum of word freqs), exactly as a
    tokenizer-training job consumes it."""
    d = t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    wfreq = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    seg = wfreq.select(
        "w",
        "freq",
        F.concat(
            F.lit(" "), F.concat_ws(" ", F.split(F.col("w"), "")), F.lit(" ")
        ).alias("seg"),
    ).localCheckpoint()
    merges: list = []
    for _ in range(_BPE_APPLY_MERGES):
        syms = F.split(F.trim(F.col("seg")), " ")
        n = F.size(syms)
        zipped = F.arrays_zip(
            F.slice(syms, 1, F.greatest(n - 1, F.lit(0))).alias("l"),
            F.slice(syms, 2, F.greatest(n - 1, F.lit(0))).alias("r"),
        )
        top = (
            seg.select(F.explode(zipped).alias("p"), "freq")
            .filter(F.col("p.r").isNotNull())
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .first()
        )
        if top is None:  # pairs exhausted (empty/degenerate corpus)
            break
        merges.append(
            (len(merges) + 1, top["l"], top["r"], top["l"] + top["r"],
             top["cnt"])
        )
        seg = seg.withColumn(
            "seg",
            F.replace(
                F.col("seg"),
                F.lit(f" {top['l']} {top['r']} "),
                F.lit(f" {top['l']}{top['r']} "),
            ),
        ).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "merge_rank bigint, left_sym string, right_sym string, "
        "merged string, pair_count bigint",
    ).orderBy("merge_rank")


_LANGID_PRED_SQL = """
           CASE
             WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es
                  AND score_en > 0 THEN 'en'
             WHEN score_de >= score_fr AND score_de >= score_es AND score_de > 0 THEN 'de'
             WHEN score_fr >= score_es AND score_fr > 0 THEN 'fr'
             WHEN score_es > 0 THEN 'es'
             ELSE 'unknown'
           END
"""


@register(
    "text_langid_confusion",
    category="text",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS lang_actual, {_LANGID_SCORES_SQL}
      FROM documents
    ),
    pred AS (
      SELECT lang_actual, {_LANGID_PRED_SQL} AS lang_predicted FROM scored
    ),
    cells AS (
      SELECT lang_actual, lang_predicted, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY lang_actual, lang_predicted
    ),
    actual_totals AS (
      SELECT lang_actual, SUM(n) AS row_total FROM cells GROUP BY lang_actual
    )
    SELECT c.lang_actual, c.lang_predicted, c.n,
           CAST(c.n AS DOUBLE) / a.row_total AS recall_share,
           CASE WHEN c.lang_actual = c.lang_predicted THEN 1 ELSE 0 END
             AS is_correct
    FROM cells c JOIN actual_totals a USING (lang_actual)
    ORDER BY lang_actual, lang_predicted
    """,
    doc="Classifier-evaluation confusion matrix for the language-ID "
    "heuristic against the labeled lang column: per (actual, predicted) "
    "cell the count, its share of the actual-language row (per-class "
    "recall on the diagonal), and a correctness flag — the model-eval "
    "aggregation every labeled-data pipeline runs, here entirely "
    "JVM-side over the same marker scores text_langid emits. Plan: one "
    "scan computing the scores, one combinable groupBy to cells "
    "(≤ |langs|² rows), and the row-total join runs on that constant-"
    "size frame — a single data-sized shuffle.",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored, pred = _langid_scored(t(spark, sf_dir, "documents"))
    cells = (
        scored.select("lang_actual", pred.alias("lang_predicted"))
        .groupBy("lang_actual", "lang_predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_actual = W.partitionBy("lang_actual")
    return (
        cells.select(
            "lang_actual",
            "lang_predicted",
            "n",
            (
                F.col("n").cast("double") / F.sum("n").over(w_actual)
            ).alias("recall_share"),
            F.when(
                F.col("lang_actual") == F.col("lang_predicted"), 1
            )
            .otherwise(0)
            .alias("is_correct"),
        )
        .orderBy("lang_actual", "lang_predicted")
    )


@register(
    "text_length_histogram_log2",
    category="text",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS INT) AS n_tokens
      FROM documents
    ),
    bucketed AS (
      SELECT CAST(FLOOR(LN(GREATEST(n_tokens, 1)) / LN(2)) AS BIGINT)
               AS log2_bucket,
             n_tokens
      FROM toks
    )
    SELECT log2_bucket,
           CAST(POW(2, log2_bucket) AS BIGINT) AS bucket_min_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM toks) AS doc_share
    FROM bucketed GROUP BY log2_bucket ORDER BY log2_bucket
    """,
    doc="Log2-bucketed document-length histogram (token counts): the "
    "length profile every pretraining-data report leads with — bucket "
    "[2^k, 2^(k+1)) doc counts, token mass, and share. LN(x)/LN(2) on "
    "integer inputs is the same double on both engines (single "
    "libm-identical op on an exact integer; FLOOR only flips at exact "
    "powers of two, where ln(2^k)/ln(2) is computed identically), and "
    "everything after is integer-exact. One scan + one combinable "
    "groupBy to ~20 buckets; the share join runs on the constant-size "
    "bucket frame.",
)
def text_length_histogram_log2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = d.select(token_count(F.col("text")).alias("n_tokens"))
    bucket = F.floor(
        F.log(F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"))
        / F.log(F.lit(2.0))
    ).cast("bigint")
    bucketed = toks.select(bucket.alias("log2_bucket"), "n_tokens")
    total = bucketed.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        bucketed.groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "log2_bucket",
            F.pow(F.lit(2.0), F.col("log2_bucket")).cast("bigint").alias(
                "bucket_min_tokens"
            ),
            "n_docs",
            "total_tokens",
            (F.col("n_docs").cast("double") / F.col("n_total")).alias(
                "doc_share"
            ),
        )
        .orderBy("log2_bucket")
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage / OOV rate (round 3)
# ---------------------------------------------------------------------------

_VOCAB_V = 500  # tokenizer vocabulary size for the coverage probe


@register(
    "text_vocab_coverage",
    category="text",
    oracle=rf"""
    WITH tokens AS (
      SELECT d.source, x.word
      FROM documents d,
           LATERAL (SELECT unnest(string_split_regex(TRIM(LOWER(d.text)),
                                                     '\s+')) AS word) x
      WHERE x.word <> ''
    ),
    vocab AS (
      SELECT word FROM (
        SELECT word,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word ASC) AS rk
        FROM tokens GROUP BY word
      ) WHERE rk <= {_VOCAB_V}
    )
    SELECT t.source,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov_tokens,
           CAST((SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) * 1000)
                // COUNT(*) AS BIGINT) AS oov_permille
    FROM tokens t LEFT JOIN vocab v ON t.word = v.word
    GROUP BY t.source ORDER BY t.source
    """,
    doc="Tokenizer-vocabulary coverage probe: build the top-"
    f"{_VOCAB_V}-term frequency vocabulary over the corpus, then "
    "measure per-source out-of-vocabulary token rates — the standard "
    "pre-training check that a tokenizer's vocab (or a fixed term "
    "list) covers each data source before committing to it (high OOV "
    "= wasted context on byte-fallback). The vocab is hundreds of "
    "rows → broadcast to the token stream (no shuffle of the corpus); "
    "token counts partial-aggregate map-side; the OOV ratio is exact "
    "integer permille (floor division) so both engines agree bit-for-"
    "bit. At 100 TB: one corpus scan for vocab (word-sized shuffle), "
    "one for coverage, vocab broadcast — nothing doc-sized moves.",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tokens = d.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    # top-V selection as orderBy+limit → TakeOrderedAndProject
    # (per-partition heaps), NOT a global row_number window — at scale
    # the distinct vocabulary is millions of words and a single-
    # partition rank exchange would bottleneck exactly like the RFM
    # windows r1 removed
    vocab = (
        tokens.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(_VOCAB_V)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    return (
        tokens.join(F.broadcast(vocab), "word", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov_tokens"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov_tokens",
            F.expr("CAST((n_oov_tokens * 1000) DIV n_tokens AS BIGINT)").alias(
                "oov_permille"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Hashed linear quality classifier (fasttext-shaped train + inference)
# ---------------------------------------------------------------------------

#: hashing-trick dimensionality — token -> md5 hex prefix % D
_QCLS_D = 64
#: deterministic supervision: sources curated by the (stand-in) data
#: team vs known-raw sources; every other source is scored, not trained on
_QCLS_GOOD = ("src0", "src1", "src2", "src3", "src4")
_QCLS_BAD = ("src15", "src16", "src17", "src18", "src19")


def _qcls_sql_list(vals: tuple) -> str:
    return ", ".join(f"'{v}'" for v in vals)


_QCLS_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(string_split_regex(TRIM(LOWER(text)), '\\s+')) AS tok
      FROM documents
    ),
    bt AS (
      SELECT doc_id, source,
             CAST('0x' || SUBSTR(md5(tok), 1, 2) AS BIGINT) % {_QCLS_D}
               AS bucket
      FROM toks
    ),
    g AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS gb FROM bt
      WHERE source IN ({_qcls_sql_list(_QCLS_GOOD)}) GROUP BY bucket
    ),
    b AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS bb FROM bt
      WHERE source IN ({_qcls_sql_list(_QCLS_BAD)}) GROUP BY bucket
    ),
    tot AS (
      SELECT (SELECT COALESCE(SUM(gb), 0) FROM g) AS gt,
             (SELECT COALESCE(SUM(bb), 0) FROM b) AS bt_
    ),
    w AS (
      SELECT buckets.bucket,
             CAST(FLOOR(LN(
               ((COALESCE(g.gb, 0) + 1.0) * (tot.bt_ + {_QCLS_D}))
               / ((COALESCE(b.bb, 0) + 1.0) * (tot.gt + {_QCLS_D}))
             ) * 1000000) AS BIGINT) AS w_micro
      FROM (SELECT UNNEST(range(0, {_QCLS_D})) AS bucket) buckets
      LEFT JOIN g ON g.bucket = buckets.bucket
      LEFT JOIN b ON b.bucket = buckets.bucket
      CROSS JOIN tot
    )
    SELECT bt.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(w.w_micro) AS BIGINT) AS sum_w_micro,
           CAST(SUM(w.w_micro) // COUNT(*) AS BIGINT) AS score_micro
    FROM bt JOIN w ON w.bucket = bt.bucket
    GROUP BY bt.doc_id
    ORDER BY bt.doc_id
"""


@register("text_quality_classifier", category="text", oracle=_QCLS_ORACLE)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality classifier — the fasttext-shaped filter
    every production pretraining pipeline runs (CCNet / LLaMA use
    exactly this: a cheap linear model over hashed token features
    scoring every crawled doc against a curated reference). TRAIN and
    INFERENCE both live in the plan: training is one aggregate over the
    labeled sources (curated vs known-raw) producing {d} Laplace-
    smoothed log-odds weights; inference joins the broadcast weight
    table onto every token and averages — per-doc quality =
    mean log-odds, positive means curated-like.

    Scale: the hashing trick (md5 prefix % {d}) makes the feature space
    FIXED-WIDTH — the weight table is {d} rows whatever the corpus, the
    classic way to bound model state for a broadcast join. Training is
    one map-side-combinable groupBy over the labeled slice; scoring is
    a broadcast hash join + one groupBy(doc_id) — no shuffle carries
    more than one row per (doc, bucket) partial. The single LN per
    bucket lands in a FLOOR(·1e6) micro-int, so per-doc sums are
    integer arithmetic — order-independent and bit-identical
    cross-engine (the PMI convention, hardened for summation)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 2), 16, 10)
        .cast("bigint")
        % _QCLS_D
    )
    bt = toks.select("doc_id", "source", bucket.alias("bucket"))
    g = (
        bt.filter(F.col("source").isin(*_QCLS_GOOD))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("gb"))
    )
    b = (
        bt.filter(F.col("source").isin(*_QCLS_BAD))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bb"))
    )
    tot = g.agg(F.coalesce(F.sum("gb"), F.lit(0)).alias("gt")).crossJoin(
        b.agg(F.coalesce(F.sum("bb"), F.lit(0)).alias("bt_"))
    )
    buckets = spark.range(_QCLS_D).select(F.col("id").alias("bucket"))
    w = (
        buckets.join(g, "bucket", "left")
        .join(b, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.floor(
                F.log(
                    (
                        (F.coalesce(F.col("gb"), F.lit(0)) + F.lit(1.0))
                        * (F.col("bt_") + _QCLS_D)
                    )
                    / (
                        (F.coalesce(F.col("bb"), F.lit(0)) + F.lit(1.0))
                        * (F.col("gt") + _QCLS_D)
                    )
                )
                * 1000000
            )
            .cast("bigint")
            .alias("w_micro"),
        )
    )
    return (
        bt.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("w_micro").cast("bigint").alias("sum_w_micro"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_w_micro",
            F.expr("CAST(sum_w_micro DIV n_tokens AS BIGINT)").alias(
                "score_micro"
            ),
        )
        .orderBy("doc_id")
    )


text_quality_classifier.__doc__ = text_quality_classifier.__doc__.replace(
    "{d}", str(_QCLS_D)
)
