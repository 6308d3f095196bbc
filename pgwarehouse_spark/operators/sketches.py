"""Mergeable-sketch operators: Bloom-filter membership, Count-Min-Sketch
frequency estimation, and histogram-based quantiles.

The reference delegates analytic sketching to its warehouses (DuckDB /
ClickHouse / Snowflake all ship bloom/approx aggregates the reference's
users can reach through plain SQL once data is synced — see
`/root/reference/README.md:15-25` for the "sync then query in the
warehouse" contract). Here the sketches are native DataFrame plans, and
— like the rest of the surface — engineered to be bit-deterministic
cross-engine so the DuckDB oracle can pin EXACT values, not just shapes:
all hashes are md5-derived int64s, all outputs are integers/booleans.

Why these three shapes matter at 100 TB:

* **Bloom** is the broadcast-membership workhorse: a benchmark /
  blocklist / tombstone set of millions compresses to a few KB-MB of
  bits that ride to every executor, turning "is this row in the set?"
  into a map-side bitwise AND — no shuffle, no join against the big
  side. (Spark itself uses the same trick in runtime row-group skipping;
  here the filter is a first-class, mergeable value.)
* **Count-Min** bounds the state of frequency counting: exact token
  counts need a vocabulary-sized shuffle; the CMS needs a CONSTANT
  d×w cell grid per partition (map-side combine caps each partition's
  shuffle contribution at d·w rows) and merges by cell-wise SUM.
* **Histogram quantiles** replace a global sort with a fixed-width bin
  count: per-partition histograms merge by bin-wise SUM, and the final
  CDF walk touches only the (tiny) merged histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import h13 as _h13
from ..registry import register
from ._helpers import t
from .textstats import fingerprint_expr


# ---------------------------------------------------------------------------
# Bloom-filter contamination
#
# Geometry: 256 words × 63 usable bits = 16 128 bits, 4 hashes. Only 63
# bits per int64 word are used so no mask ever touches the sign bit —
# keeps `<<`/bit_or semantics identical (and overflow-free) in Spark and
# DuckDB. With |bench| ≈ n/97 distinct fingerprints the fill keeps the
# false-positive rate (1-e^{-kn/m})^k low but non-degenerate at test
# scale, which is what the n_false_pos column is for.

_BLOOM_K = 4
_BLOOM_WORDS = 256
_WORD_BITS = 63
_BLOOM_M = _BLOOM_WORDS * _WORD_BITS

_SQL_BLOOM = rf"""
    WITH fpt AS (
      SELECT doc_id, lang,
             md5(TRIM(regexp_replace(LOWER(text), '\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    bench AS (SELECT DISTINCT fp FROM fpt WHERE doc_id % 97 = 0),
    bpos AS (
      SELECT DISTINCT
        CAST('0x' || SUBSTR(md5(fp || ':' || CAST(j AS VARCHAR)), 1, 13)
             AS BIGINT) % {_BLOOM_M} AS pos
      FROM bench, generate_series(1, {_BLOOM_K}) AS g(j)
    ),
    bloom AS (
      SELECT pos // {_WORD_BITS} AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % {_WORD_BITS} AS INT)) AS bits
      FROM bpos GROUP BY 1
    ),
    probe AS (
      SELECT f.doc_id, f.lang, f.fp,
             CAST('0x' || SUBSTR(md5(f.fp || ':' || CAST(j AS VARCHAR)), 1, 13)
                  AS BIGINT) % {_BLOOM_M} AS pos
      FROM fpt f, generate_series(1, {_BLOOM_K}) AS g(j)
      WHERE f.doc_id % 97 <> 0
    ),
    perdoc AS (
      SELECT p.doc_id, p.lang, p.fp,
             bool_and(
               (COALESCE(b.bits, 0)
                & (CAST(1 AS BIGINT) << CAST(p.pos % {_WORD_BITS} AS INT)))
               = (CAST(1 AS BIGINT) << CAST(p.pos % {_WORD_BITS} AS INT))
             ) AS bloom_hit
      FROM probe p LEFT JOIN bloom b ON p.pos // {_WORD_BITS} = b.word
      GROUP BY 1, 2, 3
    ),
    flagged AS (
      SELECT d.lang, d.bloom_hit, (bn.fp IS NOT NULL) AS exact_hit
      FROM perdoc d LEFT JOIN bench bn ON d.fp = bn.fp
    ),
    digest AS (
      SELECT bit_xor(CAST('0x' || SUBSTR(
               md5(CAST(word AS VARCHAR) || '=' || CAST(bits AS VARCHAR)),
               1, 13) AS BIGINT)) AS filter_digest
      FROM bloom
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_hits,
           CAST(SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_hits,
           CAST(SUM(CASE WHEN bloom_hit AND NOT exact_hit THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           bool_and(bloom_hit OR NOT exact_hit) AS no_false_neg,
           (SELECT filter_digest FROM digest) AS filter_digest
    FROM flagged
    GROUP BY lang ORDER BY lang
"""


@register(
    "sketch_bloom_contamination",
    category="sketch",
    oracle=_SQL_BLOOM,
    doc="Bloom-filter benchmark contamination screen: build a 16128-bit/"
    "4-hash filter over the benchmark fingerprints, probe every corpus "
    "doc map-side, and reconcile against exact membership — per-language "
    "bloom hits, exact hits, false positives, and a no-false-negative "
    "verdict the oracle pins TRUE (Bloom filters cannot miss).",
)
def sketch_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination screening with a Bloom filter instead of a set join
    (the scale path when even the benchmark fingerprint set is too big
    to broadcast raw: 1B fingerprints × 32B blow a broadcast, but a
    1e-4-FPR bloom over them is ~2.3 GB and shards trivially; at this
    fixture's geometry the whole filter is 2 KB).

    Plan shape: the filter BUILD aggregates (word → bit_or(mask)) over
    k·|bench| rows into ≤256 rows — map-side combine makes the shuffle
    per-partition-bounded, and the merged filter is itself mergeable
    across corpora (bit_or is associative/commutative). The PROBE side
    never shuffles the corpus: each doc computes its k positions, the
    ≤256-row filter broadcast-joins on word index, and the all-bits-set
    test folds per doc. The exact reconciliation columns (n_exact_hits /
    n_false_pos) are the evaluation harness — production keeps only the
    bloom verdict, which is why the false-positive count is surfaced as
    a first-class measurement rather than hidden. At this fixture's
    geometry (a handful of benchmark fingerprints in 16128 bits) the
    measured FPR is 0 — the honest reading of n_false_pos, not a bug;
    production sizes m = 1.44·n·log2(1/fpr).

    Cross-engine determinism: positions are md5-derived int64s; masks
    use 63 bits/word so no sign-bit semantics differ; the verdict
    column no_false_neg is structurally TRUE (a Bloom filter has no
    false negatives) and the oracle computes it independently. Because
    each engine probes the filter IT built, hit counts alone are only
    self-consistent — filter_digest (order-independent xor over the
    filter's (word, bits) cells) pins the filter CONTENTS cross-engine,
    so a hash-spelling or bit-layout divergence fails the oracle even
    when every hit count happens to agree."""
    d = t(spark, sf_dir, "documents")
    fpt = d.select(
        "doc_id", "lang", fingerprint_expr(F.col("text")).alias("fp")
    )
    bench = fpt.filter(F.col("doc_id") % 97 == 0).select("fp").distinct()

    js = F.explode(F.sequence(F.lit(1), F.lit(_BLOOM_K))).alias("j")
    pos = (
        _h13(F.concat(F.col("fp"), F.lit(":"), F.col("j").cast("string")))
        % _BLOOM_M
    ).alias("pos")

    bloom = (
        bench.select("fp", js)
        .select(pos)
        .distinct()
        .select(
            F.expr(f"pos DIV {_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )

    probe = (
        fpt.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", "lang", "fp", js)
        .select("doc_id", "lang", "fp", pos)
        .select(
            "doc_id",
            "lang",
            "fp",
            F.expr(f"pos DIV {_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD_BITS} AS INT))"
            ).alias("mask"),
        )
    )
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
        == F.col("mask")
    )
    perdoc = (
        probe.join(F.broadcast(bloom), "word", "left")
        .withColumn("hit", hit)
        .groupBy("doc_id", "lang", "fp")
        .agg(F.bool_and("hit").alias("bloom_hit"))
    )
    flagged = perdoc.join(
        F.broadcast(bench.withColumn("is_bench", F.lit(True))), "fp", "left"
    ).select(
        "lang",
        "bloom_hit",
        F.col("is_bench").isNotNull().alias("exact_hit"),
    )
    digest = bloom.agg(
        F.bit_xor(
            _h13(
                F.concat(
                    F.col("word").cast("string"),
                    F.lit("="),
                    F.col("bits").cast("string"),
                )
            )
        ).alias("filter_digest")
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_bloom_hits"),
            F.sum(F.when(F.col("exact_hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_exact_hits"),
            F.sum(
                F.when(F.col("bloom_hit") & ~F.col("exact_hit"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_false_pos"),
            F.bool_and(F.col("bloom_hit") | ~F.col("exact_hit")).alias(
                "no_false_neg"
            ),
        )
        .crossJoin(F.broadcast(digest))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Count-Min-Sketch heavy hitters

_CMS_D = 4
# Width 8 is deliberately undersized for the fixture's 31-word
# vocabulary so bucket collisions — the thing a CMS trades away — are
# GUARANTEED present and measurable (with w=8, a word sits alone in its
# bucket in at least one of the 4 rows with probability ~0.07, so most
# estimates visibly overcount). Production sizes w = ceil(e/eps) for an
# eps·N additive bound; the geometry knob is the same.
_CMS_W = 8
_CMS_TOPK = 15

_SQL_CMS = rf"""
    WITH tok AS (
      SELECT w FROM (
        SELECT unnest(string_split_regex(TRIM(LOWER(text)), '\s+')) AS w
        FROM documents
      ) x WHERE w <> ''
    ),
    cells AS (
      SELECT r,
             CAST('0x' || SUBSTR(md5(w || '#' || CAST(r AS VARCHAR)), 1, 13)
                  AS BIGINT) % {_CMS_W} AS b,
             COUNT(*) AS c
      FROM tok, generate_series(0, {_CMS_D - 1}) AS g(r)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT w, COUNT(*) AS exact_c FROM tok GROUP BY w
      ORDER BY exact_c DESC, w LIMIT {_CMS_TOPK}
    ),
    est AS (
      SELECT e.w, e.exact_c, MIN(COALESCE(c.c, 0)) AS est_c
      FROM exact e
      CROSS JOIN generate_series(0, {_CMS_D - 1}) AS g(r)
      LEFT JOIN cells c
        ON c.r = g.r
       AND c.b = CAST('0x' || SUBSTR(md5(e.w || '#' || CAST(g.r AS VARCHAR)),
                                     1, 13) AS BIGINT) % {_CMS_W}
      GROUP BY e.w, e.exact_c
    )
    SELECT w AS word, exact_c, est_c, est_c >= exact_c AS over_ok
    FROM est ORDER BY exact_c DESC, word
"""


@register(
    "sketch_cms_heavy_hitters",
    category="sketch",
    oracle=_SQL_CMS,
    doc=f"Count-Min-Sketch ({_CMS_D}x{_CMS_W}) over the corpus token "
    "stream, probed at the true top-15 terms: estimated vs exact counts "
    "plus the CMS one-sided-error verdict (estimate never undercounts), "
    "which the oracle pins TRUE.",
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency estimation with constant state: exact token counting
    shuffles a vocabulary-sized key space; the CMS shuffles at most
    d·w cells PER PARTITION (32 at this fixture's deliberately
    undersized 4×8 geometry — see _CMS_W) regardless of vocabulary
    (the map-side partial aggregate collapses each partition's token
    stream into its local cell grid before any exchange), and sketches
    from disjoint corpora merge by cell-wise SUM. The probe side here
    takes the true top-k terms as its candidate set — that's the
    evaluation harness (exact counts exist to measure the sketch
    against); production probes whatever candidate stream it has (a
    prior round's heavy hitters, a watchlist) with a broadcast join
    against the d·w-row sketch, never re-scanning the corpus.

    The over_ok column is the CMS guarantee made testable: every
    estimate is min over d cells that each count a SUPERSET of the
    term's occurrences, so est ≥ exact always — the oracle computes the
    same verdict from its own sketch. Because the width is undersized
    on purpose (see _CMS_W), est_c > exact_c for most probes, which
    also makes the estimates LAYOUT-sensitive: both engines must place
    every vocabulary word in identical cells to produce identical
    minima, so a hash-spelling divergence fails the value comparison
    rather than hiding behind collision-free equality."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    ).filter(F.col("w") != "")

    rs = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("r")
    bucket = (
        _h13(F.concat(F.col("w"), F.lit("#"), F.col("r").cast("string")))
        % _CMS_W
    ).alias("b")

    cells = (
        tok.select("w", rs)
        .select("r", bucket)
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("exact_c"))
        .orderBy(F.desc("exact_c"), "w")
        .limit(_CMS_TOPK)
    )
    probe = exact.select("w", "exact_c", rs).select(
        "w", "exact_c", "r", bucket
    )
    return (
        probe.join(F.broadcast(cells), ["r", "b"], "left")
        .groupBy("w", "exact_c")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_c"))
        .select(
            F.col("w").alias("word"),
            "exact_c",
            "est_c",
            (F.col("est_c") >= F.col("exact_c")).alias("over_ok"),
        )
        .orderBy(F.desc("exact_c"), "word")
    )


# ---------------------------------------------------------------------------
# Histogram quantiles

_HQ_BIN = 10_000  # cents per bin ($100)
_HQ_PCTS = (25, 50, 75, 95)

_SQL_HQ = f"""
    WITH c AS (
      SELECT CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ),
    hist AS (
      SELECT cents // {_HQ_BIN} AS bin, COUNT(*) AS cnt
      FROM c GROUP BY 1
    ),
    cum AS (
      SELECT bin, cnt,
             SUM(cnt) OVER (ORDER BY bin) AS cum,
             SUM(cnt) OVER (ORDER BY bin) - cnt AS cumb
      FROM hist
    ),
    n AS (SELECT COUNT(*) AS n FROM c),
    pct AS (
      SELECT p, (p * n + 99) // 100 AS r
      FROM n, (VALUES {", ".join(f"({p})" for p in _HQ_PCTS)}) AS v(p)
    ),
    est AS (
      -- CAST: DuckDB's SUM window returns HUGEINT, which would
      -- propagate decimal128 into the output; Spark side is int64
      SELECT pct.p, pct.r,
             CAST(cum.bin * {_HQ_BIN}
               + ((pct.r - cum.cumb) * {_HQ_BIN}) // cum.cnt
               AS BIGINT) AS est_cents
      FROM pct JOIN cum ON cum.cumb < pct.r AND cum.cum >= pct.r
    ),
    vals AS (
      SELECT cents, SUM(cnt2) OVER (ORDER BY cents) AS vcum
      FROM (SELECT cents, COUNT(*) AS cnt2 FROM c GROUP BY cents) v
    ),
    exact AS (
      SELECT pct.p, MIN(vals.cents) AS exact_cents
      FROM pct JOIN vals ON vals.vcum >= pct.r
      GROUP BY pct.p
    )
    SELECT est.p, est.est_cents, exact.exact_cents,
           ABS(est.est_cents - exact.exact_cents) <= {_HQ_BIN} AS err_ok
    FROM est JOIN exact ON est.p = exact.p
    ORDER BY est.p
"""


@register(
    "sketch_quantile_histogram",
    category="sketch",
    oracle=_SQL_HQ,
    doc="Mergeable histogram quantiles over l_extendedprice (integer "
    "cents, $100 bins): p25/p50/p75/p95 estimated from the merged bin "
    "histogram with in-bin linear interpolation, reconciled against the "
    "exact order statistics with a within-one-bin error verdict the "
    "oracle pins TRUE.",
)
def sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles without a global sort: per-partition fixed-width bin
    counts merge by bin-wise SUM (one bounded-key shuffle — the key
    space is the ~1000 occupied bins, not the row count), then the CDF
    walk and interpolation run on the merged histogram only. The
    estimate for rank r in bin [lo, lo+W) with c rows and `cumb` rows
    below is lo + W·(r-cumb)/c — pure int64 arithmetic, so the value is
    bit-identical across engines and cluster layouts. The exact order
    statistics (and the err_ok ≤ one-bin-width verdict, which holds
    structurally: rank r's true value lies in the same bin the estimate
    interpolates) are the evaluation harness; production emits only the
    histogram path. The exact arm's prefix sums are two-level (per-bin
    cumulative over the bounded bin space, then within the single
    target bin per percentile) so neither arm ever runs a window over
    an unbounded domain. Spark's own approx_percentile covers the
    one-engine case (see agg_approx_percentile); this operator is the
    CROSS-ENGINE-exact mergeable formulation."""
    li = t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents")
    )
    hist = li.groupBy(F.expr(f"cents DIV {_HQ_BIN}").alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wb = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = hist.select(
        "bin",
        "cnt",
        F.sum("cnt").over(wb).alias("cum"),
        (F.sum("cnt").over(wb) - F.col("cnt")).alias("cumb"),
    )
    n = li.agg(F.count(F.lit(1)).alias("n"))
    pct = (
        n.select(
            F.explode(F.array(*[F.lit(p) for p in _HQ_PCTS])).alias("p"), "n"
        )
        .select("p", F.expr("(p * n + 99) DIV 100").alias("r"))
    )
    est = (
        F.broadcast(pct)
        .join(cum, (F.col("cumb") < F.col("r")) & (F.col("cum") >= F.col("r")))
        .select(
            "p",
            "r",
            F.expr(
                f"bin * {_HQ_BIN} + ((r - cumb) * {_HQ_BIN}) DIV cnt"
            ).alias("est_cents"),
        )
    )
    # Exact order statistics via a TWO-LEVEL prefix sum, so no window
    # ever spans the (unbounded-at-scale) distinct-cents domain
    # (ADVICE r6): level 1 runs over the ~1000 occupied bins (bounded
    # key space, same scale argument as `wb` above); level 2 runs only
    # inside each percentile's target bin, whose distinct-cents count
    # is bounded by the bin width. Semantics are unchanged: vcum(c) =
    # rows-below-bin + within-bin prefix = rows ≤ c, and rank r is
    # guaranteed to resolve inside the bin where bbelow < r ≤ bcum.
    vb = li.groupBy("cents").agg(F.count(F.lit(1)).alias("cnt2")).withColumn(
        "vbin", F.expr(f"cents DIV {_HQ_BIN}")
    )
    wv = W.orderBy("vbin").rowsBetween(W.unboundedPreceding, W.currentRow)
    bcum = vb.groupBy("vbin").agg(F.sum("cnt2").alias("bcnt")).select(
        "vbin",
        (F.sum("bcnt").over(wv) - F.col("bcnt")).alias("bbelow"),
        F.sum("bcnt").over(wv).alias("bcum"),
    )
    target = (
        F.broadcast(pct)
        .join(bcum, (F.col("bbelow") < F.col("r")) & (F.col("bcum") >= F.col("r")))
        .select("p", "r", "vbin", "bbelow")
    )
    win = W.partitionBy("p").orderBy("cents").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    exact = (
        F.broadcast(target)
        .join(vb, "vbin")
        .withColumn("vcum", F.sum("cnt2").over(win) + F.col("bbelow"))
        .filter(F.col("vcum") >= F.col("r"))
        .groupBy("p")
        .agg(F.min("cents").alias("exact_cents"))
    )
    return (
        est.join(exact, "p")
        .select(
            "p",
            "est_cents",
            "exact_cents",
            (
                F.abs(F.col("est_cents") - F.col("exact_cents")) <= _HQ_BIN
            ).alias("err_ok"),
        )
        .orderBy("p")
    )
