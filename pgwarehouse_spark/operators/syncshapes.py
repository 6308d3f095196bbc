"""The reference's sync-engine operators (SURVEY.md §2-A) expressed as
oracle-checkable queries over the testdata.

The actual engine lives in ``pgwarehouse_spark.sync``; these queries pin
down the *semantics* of each incremental strategy so the driver's DuckDB
oracle can verify them:

- watermark read        (A11, clickhouse_backend.py:210-227)
- incremental delta     (A12, filter pushed into the source scan)
- upsert dedup-latest   (A17, duckdb INSERT OR REPLACE ≡ row_number()=1)
- merge anti-join+union (A15/A16, snowflake MERGE / clickhouse
                         delete-then-insert ≡ left-anti + union all)
- catalog listing       (A19/A22, pg_class size query ≡ per-table stats)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import md5_int64
from ..registry import register
from ._helpers import t

# Cutoff splitting orders into "already synced" target vs "new/changed"
# delta — mirrors the reference's high-watermark split.
_CUTOFF = "2001-01-01"


def canon_row_digest(*components) -> F.Column:
    """Engine-portable per-row digest: md5 of a '|'-joined canonical
    string, first 15 hex chars as a bigint (xor-foldable per group).

    Each component is coalesced to the sentinel '<NULL>' BEFORE joining:
    concat_ws silently drops NULLs (NULL and absent collide) while SQL
    ``||`` nulls the whole string (md5(NULL)=NULL, silently skipped by
    BIT_XOR) — coalescing on both engines makes the canonical form
    defined and identical for NULL-bearing rows, and keeps '<NULL>'
    distinct from ''. The DuckDB mirror is
    ``COALESCE(CAST(c AS VARCHAR), '<NULL>') || '|' || ...``.
    """
    canon = F.concat_ws(
        "|", *[F.coalesce(c, F.lit("<NULL>")) for c in components]
    )
    return md5_int64(canon, 15)


def canon_float_component(col: F.Column) -> F.Column:
    """Engine-portable canonical STRING for a float/double value — the
    exact IEEE-754 decomposition ``sign exponent ':' mantissa`` computed
    with only exactly-rounded FP operations, NOT a decimal rendering.

    Why not CAST(x AS STRING): Java 17's legacy ``Double.toString``
    emits non-shortest digit strings for ~2% of doubles (JDK-4511638;
    e.g. 5.101019214421436e18 renders "...4364E18") while DuckDB's Ryu
    emits true shortest — so no string or string-parsed-decimal form
    can agree across the two engines, and DuckDB's VARCHAR→DECIMAL
    parse additionally mis-rounds sub-scale e-notation values
    ('5.5e-13' → 0.000000001 at scale 9). The bit decomposition is
    engine-independent: LOG2 (±1 ulp, corrected by two exact power-of-2
    comparisons) finds the exponent, two power-of-2 multiplies (exact:
    they only shift the exponent) scale the 53-bit mantissa to an
    integer, and every branch (NaN, ±Inf, ±0 — collapsed, they compare
    equal) is pinned. Parity with the DuckDB mirror
    (``sql_canon_float``) is property-tested over random bit patterns
    in tests/test_properties.py.
    """
    v = col.cast("double")
    a = F.abs(v)
    e0 = F.floor(F.log2(a)).cast("int")
    e = e0 + (
        F.when(a >= F.pow(F.lit(2.0), (e0 + 1).cast("double")), 1)
        .when(a < F.pow(F.lit(2.0), e0.cast("double")), -1)
        .otherwise(0)
    )
    shift = F.lit(52) - e
    a1 = F.least(shift, F.lit(1000))
    a2 = shift - a1
    m = (
        a
        * F.pow(F.lit(2.0), a1.cast("double"))
        * F.pow(F.lit(2.0), a2.cast("double"))
    ).cast("bigint")
    sign = F.when(v < 0, F.lit("n")).otherwise(F.lit("p"))
    return (
        F.when(F.isnan(v), F.lit("NaN"))
        .when(a > F.lit(1.7976931348623157e308), F.concat(sign, F.lit("Inf")))
        .when(v == 0, F.lit("0"))
        .otherwise(F.concat(sign, e.cast("string"), F.lit(":"), m.cast("string")))
    )


def sql_canon_float(x: str) -> str:
    """DuckDB mirror of :func:`canon_float_component` as one inline
    expression (`x` must be a double-typed SQL expression; wrap REAL
    columns in CAST(... AS DOUBLE) first)."""
    e0 = f"CAST(FLOOR(LOG2(ABS({x}))) AS INT)"
    e = (
        f"({e0} + CASE WHEN ABS({x}) >= POW(2.0, {e0} + 1) THEN 1 "
        f"WHEN ABS({x}) < POW(2.0, {e0}) THEN -1 ELSE 0 END)"
    )
    m = (
        f"CAST(ABS({x}) * POW(2.0, LEAST(52 - {e}, 1000)) "
        f"* POW(2.0, (52 - {e}) - LEAST(52 - {e}, 1000)) AS BIGINT)"
    )
    sign = f"(CASE WHEN {x} < 0 THEN 'n' ELSE 'p' END)"
    return (
        f"CASE WHEN isnan({x}) THEN 'NaN' "
        f"WHEN ABS({x}) > 1.7976931348623157e308 THEN {sign} || 'Inf' "
        f"WHEN {x} = 0 THEN '0' "
        f"ELSE {sign} || CAST({e} AS VARCHAR) || ':' || CAST({m} AS VARCHAR) "
        f"END"
    )


@register(
    "sync_watermark_max",
    category="sync",
    oracle="""
    SELECT 'orders' AS table_name,
           MAX(o_orderkey) AS max_pk,
           MAX(o_orderdate) AS max_last_modified,
           COUNT(*) AS n_rows
    FROM orders
    """,
)
def sync_watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: the high-watermark read. At 100 TB this is a parquet-footer
    min/max aggregate — Spark answers it from statistics without a full
    scan when the table is sorted/partitioned on the key."""
    return t(spark, sf_dir, "orders").agg(
        F.lit("orders").alias("table_name"),
        F.max("o_orderkey").alias("max_pk"),
        F.max("o_orderdate").alias("max_last_modified"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "sync_incremental_delta",
    category="sync",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
    ORDER BY o_orderkey
    """,
)
def sync_incremental_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: the delta extract `where last_modified >= watermark`. The
    predicate reaches the parquet scan (PushedFilters) exactly as the
    reference pushes its filter into `psql \\copy (select ... where ...)`."""
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_CUTOFF).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    )


@register(
    "sync_upsert_dedup_latest",
    category="sync",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_totalprice AS latest_price
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def sync_upsert_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17: keep-latest-per-key — the DataFrame form of DuckDB
    `INSERT OR REPLACE` (duckdb_backend.py:192). Scales as one shuffle on
    the key; Spark pushes a group-limit below the exchange."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_totalprice").alias("latest_price"),
        )
        .orderBy("o_custkey")
    )


@register(
    "sync_merge_upsert",
    category="sync",
    oracle=f"""
    WITH target AS (
      SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
      WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'
    ), delta AS (
      SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, o_orderdate
      FROM orders WHERE o_orderdate >= TIMESTAMP '2000-06-01'
    )
    SELECT o_orderkey, CAST(ROUND(o_totalprice, 4) AS DOUBLE) AS o_totalprice, o_orderdate
    FROM (
      SELECT t.* FROM target t
      WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.o_orderkey = t.o_orderkey)
      UNION ALL
      SELECT * FROM delta
    )
    ORDER BY o_orderkey
    """,
)
def sync_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15/A16: MERGE upsert as left-anti join + union-all. This is the
    engine's merge primitive (sync/merge.py); expressed here as a query so
    the oracle pins its semantics (updated rows replace, new rows append,
    untouched rows survive)."""
    o = t(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderdate") < F.lit(_CUTOFF).cast("timestamp")).select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    delta = o.filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    ).select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        "o_orderdate",
    )
    merged = target.join(delta, "o_orderkey", "left_anti").unionByName(delta)
    return merged.select(
        "o_orderkey",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        "o_orderdate",
    ).orderBy("o_orderkey")


@register(
    "sync_catalog_list",
    category="sync",
    oracle="""
    SELECT table_name, n_rows FROM (
      SELECT 'orders' AS table_name, COUNT(*) AS n_rows FROM orders
      UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
      UNION ALL SELECT 'customer', COUNT(*) FROM customer
      UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
      UNION ALL SELECT 'part', COUNT(*) FROM part
      UNION ALL SELECT 'nation', COUNT(*) FROM nation
      UNION ALL SELECT 'region', COUNT(*) FROM region
    ) ORDER BY n_rows DESC, table_name
    """,
)
def sync_catalog_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19/A22: catalog listing with sizes, sorted descending — the shape of
    the reference's pg_class size query (pgwarehouse.py:218-237). Counts
    come from parquet metadata, so this is O(footers) not O(data)."""
    parts = []
    for name in ["orders", "lineitem", "customer", "supplier", "part", "nation", "region"]:
        parts.append(
            t(spark, sf_dir, name).agg(
                F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy(F.col("n_rows").desc(), "table_name")


@register(
    "sync_snapshot_cdc",
    category="sync",
    oracle="""
    WITH old AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice - 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
    ),
    new AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 11 <> 0
    )
    SELECT COALESCE(new.o_orderkey, old.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'I'
                WHEN new.o_orderkey IS NULL THEN 'D'
                ELSE 'U' END AS change_type
    FROM old FULL OUTER JOIN new USING (o_orderkey)
    WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.o_totalprice <> new.o_totalprice
    ORDER BY o_orderkey
    """,
)
def sync_snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture by snapshot diff: classify every key as
    insert / update / delete between two table snapshots with one
    full-outer join — the CDC the reference cannot do (its watermark
    strategies never detect deletes, README.md:150-176; this is the
    missing fourth strategy). The two snapshots are derived
    deterministically from orders (old = keys %7!=0 with a price drift on
    %5==0; new = keys %11!=0) so the oracle sees identical inputs.

    Scale: the join shuffles both snapshots on the key once; with both
    sides bucketed by PK (as the sync engine writes them) it is
    shuffle-free. Unchanged rows — the overwhelming majority — are
    filtered before any downstream work."""
    orders = t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") - 1.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("old_price"),
    )
    new = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("new_price")
    )
    joined = old.join(new, "o_orderkey", "full_outer")
    return (
        joined.filter(
            F.col("old_price").isNull()
            | F.col("new_price").isNull()
            | (F.col("old_price") != F.col("new_price"))
        )
        .select(
            "o_orderkey",
            F.when(F.col("old_price").isNull(), "I")
            .when(F.col("new_price").isNull(), "D")
            .otherwise("U")
            .alias("change_type"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "scd2_intervals",
    category="sync",
    oracle="""
    WITH changes AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    transitions AS (
      SELECT user_id, event_type, ts AS valid_from
      FROM changes
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (
             PARTITION BY user_id ORDER BY valid_from) AS valid_to,
           CASE WHEN LEAD(valid_from) OVER (
             PARTITION BY user_id ORDER BY valid_from) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM transitions
    ORDER BY user_id, valid_from
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse a change
    stream into validity intervals — keep rows where the tracked
    attribute differs from its predecessor, then close each interval with
    the next transition's timestamp (LEAD), leaving the last open
    (is_current). Two window passes over the same (user_id, time)
    partitioning — Catalyst reuses one sort/exchange for both, so the
    whole history build is a single shuffle at entity grain."""
    e = t(spark, sf_dir, "events")
    w_ev = W.partitionBy("user_id").orderBy("ts", "event_id")
    transitions = (
        e.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lag("event_type").over(w_ev).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .drop("prev_type")
    )
    w_tr = W.partitionBy("user_id").orderBy("valid_from")
    valid_to = F.lead("valid_from").over(w_tr)
    return (
        transitions.select(
            "user_id",
            "event_type",
            "valid_from",
            valid_to.alias("valid_to"),
            F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
        )
        .orderBy("user_id", "valid_from")
    )


@register(
    "profile_columns",
    category="sync",
    oracle="""
    WITH a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS nn_key,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd_key,
             CAST(MIN(o_orderkey) AS VARCHAR) AS mn_key,
             CAST(MAX(o_orderkey) AS VARCHAR) AS mx_key,
             CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS nn_cust,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd_cust,
             CAST(MIN(o_custkey) AS VARCHAR) AS mn_cust,
             CAST(MAX(o_custkey) AS VARCHAR) AS mx_cust,
             CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) AS nn_stat,
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd_stat,
             MIN(o_orderstatus) AS mn_stat,
             MAX(o_orderstatus) AS mx_stat,
             CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT) AS nn_price,
             CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS nd_price,
             CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn_price,
             CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx_price
      FROM orders
    )
    SELECT 'o_orderkey' AS col_name, n_rows, nn_key AS n_nulls,
           nd_key AS n_distinct, mn_key AS min_str, mx_key AS max_str FROM a
    UNION ALL
    SELECT 'o_custkey', n_rows, nn_cust, nd_cust, mn_cust, mx_cust FROM a
    UNION ALL
    SELECT 'o_orderstatus', n_rows, nn_stat, nd_stat, mn_stat, mx_stat FROM a
    UNION ALL
    SELECT 'o_totalprice', n_rows, nn_price, nd_price, mn_price, mx_price FROM a
    ORDER BY col_name
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the warehouse ANALYZE / data-quality pass): per
    column — null count, distinct count, min, max — computed in ONE scan
    as a single multi-aggregate row, then unpivoted to a row per column.
    Numeric min/max normalize through DECIMAL(18,2) so the string forms
    are engine-independent.

    Scale: one pass however many columns are profiled (the oracle's
    UNION-ALL form would scan once per column); distinct counts are the
    expensive part — swap approx_count_distinct in when exactness isn't
    required, same plan otherwise. Output is O(columns), never
    data-sized. Reference analogue: the row-count/existence probes
    (pgwarehouse.py:114-116) grown into a real profiler."""
    o = t(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    a = o.agg(
        n.cast("bigint").alias("n_rows"),
        (n - F.count("o_orderkey")).cast("bigint").alias("nn_key"),
        F.countDistinct("o_orderkey").cast("bigint").alias("nd_key"),
        F.min("o_orderkey").cast("string").alias("mn_key"),
        F.max("o_orderkey").cast("string").alias("mx_key"),
        (n - F.count("o_custkey")).cast("bigint").alias("nn_cust"),
        F.countDistinct("o_custkey").cast("bigint").alias("nd_cust"),
        F.min("o_custkey").cast("string").alias("mn_cust"),
        F.max("o_custkey").cast("string").alias("mx_cust"),
        (n - F.count("o_orderstatus")).cast("bigint").alias("nn_stat"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("nd_stat"),
        F.min("o_orderstatus").alias("mn_stat"),
        F.max("o_orderstatus").alias("mx_stat"),
        (n - F.count("o_totalprice")).cast("bigint").alias("nn_price"),
        F.countDistinct("o_totalprice").cast("bigint").alias("nd_price"),
        F.min("o_totalprice").cast("decimal(18,2)").cast("string").alias("mn_price"),
        F.max("o_totalprice").cast("decimal(18,2)").cast("string").alias("mx_price"),
    )
    rows = [
        ("o_orderkey", "nn_key", "nd_key", "mn_key", "mx_key"),
        ("o_custkey", "nn_cust", "nd_cust", "mn_cust", "mx_cust"),
        ("o_orderstatus", "nn_stat", "nd_stat", "mn_stat", "mx_stat"),
        ("o_totalprice", "nn_price", "nd_price", "mn_price", "mx_price"),
    ]
    stack = F.expr(
        "stack({}, {}) as (col_name, n_nulls, n_distinct, min_str, max_str)".format(
            len(rows),
            ", ".join(f"'{c}', {nn}, {nd}, {mn}, {mx}" for c, nn, nd, mn, mx in rows),
        )
    )
    return a.select(stack, "n_rows").select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str"
    ).orderBy("col_name")


@register(
    "audit_group_checksums",
    category="sync",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           BIT_XOR(CAST('0x' || SUBSTR(md5(
             COALESCE(CAST(o_orderkey AS VARCHAR), '<NULL>') || '|' ||
             COALESCE(CAST(o_custkey AS VARCHAR), '<NULL>') || '|' ||
             COALESCE(o_orderstatus, '<NULL>') || '|' ||
             COALESCE(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), '<NULL>')
           ), 1, 15) AS BIGINT)) AS digest
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def audit_group_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content checksum per group: xor-fold of a canonical-string md5 per
    row — the order-independent digest that lets two engines (or a source
    and a warehouse copy) assert byte-level agreement without moving
    data. This is the registered-query form of `SyncEngine.verify`'s
    per-bucket audit; a mismatch in one group pinpoints WHERE the copies
    diverge.

    Scale: xor is associative/commutative, so the digest partial-
    aggregates map-side and is independent of partitioning — the same
    digest at local[1] and 1000 executors. Canonicalization (explicit
    casts, '|' separators, md5 prefix → bigint) is what makes the digest
    engine-portable, unlike engine-native hash() functions."""
    o = t(spark, sf_dir, "orders")
    h = canon_row_digest(
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderdate").cast("date").cast("string"),
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(h).alias("digest"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Incremental join-view maintenance (sync/ivm.py as a registered query)
# ---------------------------------------------------------------------------

# deterministic delta split: orders with o_orderkey % 7 == 3 and lineitem
# rows with l_orderkey % 5 == 2 are "the new batch"
_IVM_A_MOD, _IVM_A_REM = 7, 3
_IVM_B_MOD, _IVM_B_REM = 5, 2


@register(
    "sync_ivm_join_delta",
    category="sync",
    oracle=f"""
    WITH a_old AS (SELECT o_orderkey, o_custkey FROM orders
                   WHERE o_orderkey % {_IVM_A_MOD} <> {_IVM_A_REM}),
    da AS (SELECT o_orderkey, o_custkey FROM orders
           WHERE o_orderkey % {_IVM_A_MOD} = {_IVM_A_REM}),
    b_old AS (SELECT l_orderkey AS o_orderkey, l_extendedprice, l_discount
              FROM lineitem WHERE l_orderkey % {_IVM_B_MOD} <> {_IVM_B_REM}),
    db AS (SELECT l_orderkey AS o_orderkey, l_extendedprice, l_discount
           FROM lineitem WHERE l_orderkey % {_IVM_B_MOD} = {_IVM_B_REM}),
    dv AS (
      SELECT da.o_custkey, b_old.l_extendedprice, b_old.l_discount
      FROM da JOIN b_old USING (o_orderkey)
      UNION ALL
      SELECT a_old.o_custkey, db.l_extendedprice, db.l_discount
      FROM a_old JOIN db USING (o_orderkey)
      UNION ALL
      SELECT da.o_custkey, db.l_extendedprice, db.l_discount
      FROM da JOIN db USING (o_orderkey)
    )
    SELECT o_custkey, COUNT(*) AS delta_rows,
           {{dsum}} AS delta_revenue
    FROM dv GROUP BY o_custkey
    ORDER BY o_custkey
    """.replace(
        "{dsum}",
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) "
        "AS DOUBLE)",
    ),
    doc="Incremental JOIN-view maintenance delta (sync/ivm.py): for the "
    "orders⋈lineitem revenue view and a deterministic insert batch on "
    "both base tables, emit the exact three-term view delta "
    "dV = dA⋈B_old ∪ A_old⋈dB ∪ dA⋈dB, aggregated per customer — the "
    "rows a continuously-maintained join view merges per batch without "
    "ever recomputing A_old⋈B_old.",
)
def sync_ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of `pgwarehouse_spark.sync.ivm.join_view_delta`.
    Per-batch cost is O(|delta| + matched base rows): the two cross
    terms broadcast the delta against the base (at 100 TB the base is
    the bucketed layout, so only buckets holding delta keys are read),
    and the dA⋈dB term is delta-sized on both sides. The aggregate on
    top partial-combines map-side — this is exactly the delta a
    downstream rollup (sync/rollup.py) merges additively."""
    from ..sync.ivm import join_view_delta

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice", "l_discount"
    )
    a_old = o.filter(F.col("o_orderkey") % _IVM_A_MOD != _IVM_A_REM)
    da = o.filter(F.col("o_orderkey") % _IVM_A_MOD == _IVM_A_REM)
    b_old = l.filter(F.col("o_orderkey") % _IVM_B_MOD != _IVM_B_REM)
    db = l.filter(F.col("o_orderkey") % _IVM_B_MOD == _IVM_B_REM)
    dv = join_view_delta(a_old, da, b_old, db, "o_orderkey")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        dv.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("delta_rows"),
            F.sum(revenue.cast("decimal(18,6)"))
            .cast("double")
            .alias("delta_revenue"),
        )
        .orderBy("o_custkey")
    )


@register(
    "scd2_point_in_time_join",
    category="sync",
    oracle="""
    WITH changes AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    transitions AS (
      SELECT user_id, event_type, ts AS valid_from
      FROM changes
      WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    intervals AS (
      SELECT user_id, event_type, valid_from,
             LEAD(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from) AS valid_to
      FROM transitions
    ),
    probes AS (
      SELECT event_id AS probe_id, user_id, ts AS probe_ts
      FROM events WHERE event_id % 5 = 0
    )
    SELECT p.probe_id, p.user_id, p.probe_ts,
           i.event_type AS type_as_of, i.valid_from
    FROM probes p JOIN intervals i
      ON p.user_id = i.user_id
     AND p.probe_ts >= i.valid_from
     AND (i.valid_to IS NULL OR p.probe_ts < i.valid_to)
    ORDER BY probe_id
    """,
    doc="Point-in-time (temporal) join against the SCD2 history: each "
    "probe timestamp resolves to the attribute version valid THEN — "
    "the reproducible-training-snapshot / feature-store lookup that "
    "plain joins against a mutable dimension get wrong. Intervals are "
    "half-open [from, to), so a probe exactly on a transition sees the "
    "new version in both engines.",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join on the entity key + in-row interval predicate: each
    probe meets only ITS user's few intervals (per-entity version count,
    not history size), so the join is hash-partitioned on user_id with
    a cheap range filter — never a time-banded blowup. At 100 TB the
    SCD2 table is this engine's bucketed layout on the same key, making
    the probe join bucket-local."""

    e = t(spark, sf_dir, "events")
    intervals = scd2_intervals(spark, sf_dir).select(
        "user_id",
        F.col("event_type").alias("type_as_of"),
        "valid_from",
        "valid_to",
    )
    probes = e.filter(F.col("event_id") % 5 == 0).select(
        F.col("event_id").alias("probe_id"),
        "user_id",
        F.col("ts").alias("probe_ts"),
    )
    return (
        probes.join(intervals, "user_id")
        .filter(
            (F.col("probe_ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("probe_ts") < F.col("valid_to")))
        )
        .select("probe_id", "user_id", "probe_ts", "type_as_of", "valid_from")
        .orderBy("probe_id")
    )


@register(
    "sync_early_arriving_facts",
    category="sync",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_name FROM customer WHERE c_custkey % 10 <> 7
    )
    SELECT CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END AS is_placeholder,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue
    FROM orders o LEFT JOIN dim d ON o.o_custkey = d.c_custkey
    GROUP BY 1 ORDER BY is_placeholder
    """,
    doc="Early-arriving facts: orders referencing dimension keys that "
    "have not arrived yet (a tenth of customers withheld) LEFT-join the "
    "dim and fall back to a placeholder member instead of being dropped "
    "or failing — the standard late-dimension warehouse pattern. The "
    "backfill step is exactly sync/merge.py::merge_upsert once the dim "
    "row lands: placeholder rows resolve by key, no fact rewrite.",
)
def sync_early_arriving_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    dim = c.filter(F.col("c_custkey") % 10 != 7).select("c_custkey", "c_name")
    return (
        o.join(dim, o.o_custkey == dim.c_custkey, "left")
        .groupBy(
            F.when(F.col("c_custkey").isNull(), 1).otherwise(0).alias(
                "is_placeholder"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("is_placeholder")
    )


@register(
    "sync_cdc_apply_opcodes",
    category="sync",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
    ),
    log AS (
      SELECT l_orderkey AS o_orderkey,
             l_linenumber AS seq,
             CASE WHEN l_quantity < 3 THEN 'D'
                  WHEN l_orderkey % 2 = 0 THEN 'U'
                  ELSE 'I' END AS op,
             l_extendedprice AS new_price
      FROM lineitem WHERE l_orderkey % 3 = 0
    ),
    net AS (
      SELECT o_orderkey, op, new_price FROM (
        SELECT o_orderkey, op, new_price,
               ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                  ORDER BY seq DESC, new_price DESC, op DESC) AS rn
        FROM log
      ) WHERE rn = 1
    )
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice, 4) AS DOUBLE) AS o_totalprice
    FROM (
      SELECT t.o_orderkey, t.o_totalprice FROM target t
      WHERE NOT EXISTS (SELECT 1 FROM net n WHERE n.o_orderkey = t.o_orderkey)
      UNION ALL
      SELECT n.o_orderkey, n.new_price AS o_totalprice
      FROM net n WHERE n.op <> 'D'
    )
    ORDER BY o_orderkey
    """,
    doc="CDC opcode-log apply: the warehouse-side APPLY step for a "
    "Debezium/wal2json-style change feed carrying explicit I/U/D opcodes "
    "per key — the fourth sync strategy the reference cannot express "
    "(its watermark strategies never delete; README.md:150-176 documents "
    "the gap, sync_snapshot_cdc detects deletes by diffing, this one "
    "APPLIES them from a log). Semantics: per key, only the LAST opcode "
    "in sequence order matters (net-effect collapse); D removes the key "
    "even if earlier ops inserted it, I/U upsert the newest value, "
    "untouched target rows survive. The net-effect collapse is one "
    "shuffle on the key with a group-limit pushed below the exchange; "
    "the apply is the engine's merge primitive (left-anti + union) plus "
    "an opcode filter — identical plan shape to sync_merge_upsert, so a "
    "billion-row log costs one shuffle + one co-partitioned join.",
)
def sync_cdc_apply_opcodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    log = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 3 == 0)
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.col("l_linenumber").alias("seq"),
            F.when(F.col("l_quantity") < 3, "D")
            .when(F.col("l_orderkey") % 2 == 0, "U")
            .otherwise("I")
            .alias("op"),
            F.col("l_extendedprice").alias("new_price"),
        )
    )
    # (seq, new_price, op) — the testdata carries duplicate
    # (orderkey, linenumber) pairs, so seq alone is not a total order;
    # the value tiebreaks make last-writer-wins deterministic cross-engine.
    w = W.partitionBy("o_orderkey").orderBy(
        F.col("seq").desc(), F.col("new_price").desc(), F.col("op").desc()
    )
    net = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "op", "new_price")
    )
    survivors = target.join(net, "o_orderkey", "left_anti")
    applied = net.filter(F.col("op") != "D").select(
        "o_orderkey", F.col("new_price").alias("o_totalprice")
    )
    return (
        survivors.unionByName(applied)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "audit_order_line_totals",
    category="audit",
    oracle="""
    WITH line_sums AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
               AS line_total,
             COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
      SELECT o.o_orderkey,
             CAST(FLOOR(o.o_totalprice / ls.line_total * 10) AS BIGINT)
               AS ratio_bucket
      FROM orders o JOIN line_sums ls ON o.o_orderkey = ls.l_orderkey
    ),
    orphan_orders AS (
      SELECT COUNT(*) AS n FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey)
    )
    SELECT CAST(ratio_bucket AS BIGINT) AS ratio_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM joined GROUP BY ratio_bucket
    UNION ALL
    SELECT -999, n FROM orphan_orders
    ORDER BY ratio_bucket
    """,
    doc="Header/detail consistency audit: per order, the ratio of the "
    "header total to the decimal-exact sum of its line prices, bucketed "
    "at 0.1 grain (FLOOR fixed-point — no rounding tie), plus a "
    "sentinel row (-999) counting header rows with NO detail rows — "
    "the reconciliation report every finance warehouse runs after a "
    "sync, and a direct consumer of the engine's own A18 row-count "
    "audits. Plan: line sums are one map-side-combinable groupBy; the "
    "header join is key-to-key against the pre-collapsed frame (never "
    "raw lineitem); the orphan check is a broadcast-able anti-join "
    "count. One data-sized shuffle each side.",
)
def audit_order_line_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    line_sums = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
        .cast("double")
        .alias("line_total"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    joined = o.join(
        line_sums, o.o_orderkey == line_sums.l_orderkey
    ).select(
        F.floor(F.col("o_totalprice") / F.col("line_total") * 10)
        .cast("bigint")
        .alias("ratio_bucket")
    )
    buckets = joined.groupBy("ratio_bucket").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    orphans = (
        o.join(li.select("l_orderkey").distinct(),
               o.o_orderkey == F.col("l_orderkey"), "left_anti")
        .agg(
            F.lit(-999).cast("bigint").alias("ratio_bucket"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return buckets.unionByName(orphans).orderBy("ratio_bucket")


# ---------------------------------------------------------------------------
# Incremental view maintenance for aggregates (round 3)
# ---------------------------------------------------------------------------


@register(
    "sync_ivm_agg_delta",
    category="sync",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Incremental view maintenance for an AGGREGATE view (the "
    "groupBy-sum sibling of sync_ivm_join_delta): the materialized "
    "view's partial state (count + decimal sum per key over the "
    "pre-1997 'base') is merged with the delta batch's partials "
    "(1997+) by a full-outer coalesce-and-add — NO rescan of the base "
    "fact table. The ORACLE is the full recompute over all of orders, "
    "so a green row proves the algebraic merge is exactly equivalent "
    "to recomputation (count and decimal-sum are commutative "
    "monoids; AVG derives as sum/count downstream). At 100 TB this is "
    "the nightly-refresh pattern: the view state is key-sized, the "
    "delta partial-aggregates map-side, and the merge shuffles only "
    "|keys| rows — the base table is never touched again.",
)
def sync_ivm_agg_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._helpers import dsum

    o = t(spark, sf_dir, "orders")
    base = (
        o.filter(F.col("o_orderdate") < "1997-01-01")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_base"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("s_base"),
        )
    )
    delta = (
        o.filter(F.col("o_orderdate") >= "1997-01-01")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_delta"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("s_delta"),
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        base.join(delta, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            (
                F.coalesce(F.col("n_base"), F.lit(0))
                + F.coalesce(F.col("n_delta"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("s_base"), zero)
                + F.coalesce(F.col("s_delta"), zero)
            )
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "audit_temporal_contracts",
    category="audit",
    oracle="""
    SELECT 'lineitem_ship_after_order' AS rule,
           (SELECT COUNT(*) FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey) AS n_checked,
           (SELECT COUNT(*) FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate < o.o_orderdate) AS n_violations
    UNION ALL
    SELECT 'lineitem_ship_within_180d',
           (SELECT COUNT(*) FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey),
           (SELECT COUNT(*) FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate > o.o_orderdate + INTERVAL 180 DAY)
    UNION ALL
    SELECT 'orders_date_in_epoch',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders
            WHERE o_orderdate < DATE '1992-01-01'
               OR o_orderdate > DATE '1998-12-31')
    ORDER BY rule
    """,
    doc="CROSS-TABLE temporal contract audit — the dimension the "
    "single-table audits can't express (audit_value_constraints covers "
    "in-row range/enum/null rules, audit_fk_orphans referential "
    "integrity): a child fact's timestamp must respect its parent's "
    "(shipdate >= orderdate), stay within a business horizon of it "
    "(<= +180 days), and the parent's own dates must fall in the "
    "feed's epoch. Emits (rule, n_checked, n_violations); violations "
    "= 0 gates promotion. Plan: the two join rules share ONE "
    "lineitem-orders join (conditional aggregates over it), orders "
    "broadcast at dim scale; the epoch rule is a single-scan "
    "conditional count. At 100 TB nothing shuffles wider than the "
    "join keys.",
)
def audit_temporal_contracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    joined = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == o.o_orderkey,
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
        ).alias("v_before"),
        F.sum(
            F.when(
                F.col("l_shipdate")
                > F.date_add(F.col("o_orderdate"), 180),
                1,
            ).otherwise(0)
        ).alias("v_horizon"),
    )
    epoch = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
                | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date")),
                1,
            ).otherwise(0)
        ).alias("v"),
    )

    def row(rule, n_col, v_col, src):
        return src.select(
            F.lit(rule).alias("rule"),
            F.col(n_col).cast("bigint").alias("n_checked"),
            F.col(v_col).cast("bigint").alias("n_violations"),
        )

    return (
        row("lineitem_ship_after_order", "n", "v_before", joined)
        .unionByName(row("lineitem_ship_within_180d", "n", "v_horizon", joined))
        .unionByName(row("orders_date_in_epoch", "n", "v", epoch))
        .orderBy("rule")
    )


_K_ANON = 5


@register(
    "audit_k_anonymity",
    category="audit",
    oracle=f"""
    WITH groups AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS acctbal_band,
             COUNT(*) AS group_size
      FROM customer
      GROUP BY c_nationkey, c_mktsegment, acctbal_band
    )
    SELECT CAST({_K_ANON} AS INT) AS k,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN group_size < {_K_ANON} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violating_groups,
           CAST(SUM(CASE WHEN group_size < {_K_ANON} THEN group_size
                         ELSE 0 END) AS BIGINT) AS n_exposed_rows,
           CAST(MIN(group_size) AS BIGINT) AS min_group_size
    FROM groups
    """,
    doc="k-anonymity audit over a quasi-identifier tuple (nation, "
    "market segment, coarse account-balance band): counts equivalence "
    "classes smaller than k — rows in them are re-identifiable by the "
    "quasi-identifiers alone, the standard privacy gate before a "
    "dataset export or a training-data release. Output is one row "
    "(k, group count, violating groups, exposed rows, min group size); "
    "n_exposed_rows = 0 certifies the release. One map-side-combinable "
    "groupBy on the QI tuple + a 5-value rollup — at 100 TB the shuffle "
    "carries |QI-combinations| rows, never the table. Generalization "
    "ladders (coarser bands until k holds) re-run the same plan with a "
    "wider FLOOR divisor.",
)
def audit_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    groups = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias(
                "acctbal_band"
            ),
        )
        .groupBy("c_nationkey", "c_mktsegment", "acctbal_band")
        .agg(F.count(F.lit(1)).alias("group_size"))
    )
    small = F.col("group_size") < _K_ANON
    return groups.agg(
        F.lit(_K_ANON).cast("int").alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(small, 1).otherwise(0)).cast("bigint").alias(
            "n_violating_groups"
        ),
        F.sum(F.when(small, F.col("group_size")).otherwise(0))
        .cast("bigint")
        .alias("n_exposed_rows"),
        F.min("group_size").cast("bigint").alias("min_group_size"),
    )


_L_DIV = 3


@register(
    "audit_l_diversity",
    category="audit",
    oracle=f"""
    WITH per_sensitive AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS sensitive_band,
             COUNT(*) AS n_rows
      FROM customer
      GROUP BY c_nationkey, c_mktsegment, sensitive_band
    ),
    groups AS (
      SELECT c_nationkey, c_mktsegment,
             COUNT(*) AS n_distinct_sensitive,
             SUM(n_rows) AS group_size
      FROM per_sensitive
      GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST({_L_DIV} AS INT) AS l,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN n_distinct_sensitive < {_L_DIV} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violating_groups,
           CAST(SUM(CASE WHEN n_distinct_sensitive < {_L_DIV} THEN group_size
                         ELSE 0 END) AS BIGINT) AS n_exposed_rows,
           CAST(MIN(n_distinct_sensitive) AS BIGINT) AS min_distinct_sensitive
    FROM groups
    """,
    doc="l-diversity audit — k-anonymity's stronger sibling: a "
    "quasi-identifier group can be large (k-anonymous) yet still leak "
    "if every member shares the SAME sensitive value, so each "
    "(nation, market-segment) group must contain at least l distinct "
    "sensitive values (coarse account-balance band stands in for the "
    "sensitive attribute). Output is one certification row; "
    "n_exposed_rows = 0 passes the release gate, and the pair of "
    "audits (this + audit_k_anonymity) is the standard pre-export "
    "privacy check. Scale: exact distinct via two stacked "
    "map-side-combinable groupBys (QI+sensitive, then QI) — the "
    "shuffle carries one row per (QI, sensitive) combination, never "
    "the table, the same count-distinct shape as "
    "agg_count_distinct.",
)
def audit_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    per_sensitive = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias(
                "sensitive_band"
            ),
        )
        .groupBy("c_nationkey", "c_mktsegment", "sensitive_band")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    groups = per_sensitive.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_distinct_sensitive"),
        F.sum("n_rows").alias("group_size"),
    )
    low = F.col("n_distinct_sensitive") < _L_DIV
    return groups.agg(
        F.lit(_L_DIV).cast("int").alias("l"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(low, 1).otherwise(0)).cast("bigint").alias(
            "n_violating_groups"
        ),
        F.sum(F.when(low, F.col("group_size")).otherwise(0))
        .cast("bigint")
        .alias("n_exposed_rows"),
        F.min("n_distinct_sensitive").cast("bigint").alias(
            "min_distinct_sensitive"
        ),
    )


#: Benford expected leading-digit shares, integer ppm of log10(1+1/d).
#: Rounded independently per digit yet summing to exactly 1_000_000 —
#: embedded as the SAME literal table in both engines so the fixed-point
#: chi-square below is bit-exact.
_BENFORD_PPM = [
    (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
    (6, 66947), (7, 57992), (8, 51153), (9, 45757),
]


@register(
    "audit_benford_digits",
    category="audit",
    oracle=f"""
    WITH v AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS cents
      FROM orders
    ),
    d AS (
      SELECT CAST(SUBSTR(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM v
    ),
    obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit
    ),
    expd AS (
      SELECT * FROM (VALUES
        {', '.join(f'({d}, {p})' for d, p in _BENFORD_PPM)}
      ) e(digit, exp_ppm)
    ),
    j AS (
      SELECT e.digit,
             COALESCE(o.n_obs, 0) AS n_obs,
             CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
             CAST((COALESCE(o.n_obs, 0) * 1000000)
                  // (SELECT SUM(n_obs) FROM obs) AS BIGINT) AS obs_ppm
      FROM expd e LEFT JOIN obs o ON o.digit = e.digit
    ),
    chi AS (
      SELECT CAST(SUM(
               ((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) * 1000)
               // exp_ppm) AS BIGINT) AS chi2_nano
      FROM j
    )
    SELECT j.digit, j.n_obs, j.obs_ppm, j.exp_ppm, c.chi2_nano
    FROM j, chi c ORDER BY j.digit
    """,
)
def audit_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on order totals: observed leading-digit
    distribution vs the log10(1+1/d) expectation, with a fixed-point
    chi-square fit statistic — the forensic-accounting / fraud-detection
    audit (fabricated amounts rarely match Benford; a synthetic-uniform
    column like TPC-H's totalprice fails loudly, which is itself the
    demonstration). Output: per-digit observed counts and ppm shares
    beside the expectation, plus the total chi2 (nano-units) on every
    row. All arithmetic is int64 — the leading digit comes from the
    exact cents value via string head, not log10 (float log at a power-
    of-ten boundary is an engine-dependent coin flip), and shares use
    integer DIV — so Spark and DuckDB agree bit-for-bit.

    Scale: one map-side-combinable groupBy to a ≤9-row digit table; the
    expectation is a 9-row literal broadcast; the chi-square folds 9
    rows. The only data-sized work is the scan."""
    o = t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    obs = (
        o.select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = obs.agg(F.sum("n_obs").alias("_n"))
    expd = spark.createDataFrame(_BENFORD_PPM, "digit int, exp_ppm bigint")
    j = (
        F.broadcast(expd)
        .join(obs, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
            F.expr("COALESCE(n_obs, 0) * 1000000 DIV _n").cast("bigint").alias(
                "obs_ppm"
            ),
            "exp_ppm",
        )
    )
    chi = j.agg(
        F.sum(
            F.expr(
                "(obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) * 1000 DIV exp_ppm"
            )
        ).cast("bigint").alias("chi2_nano")
    )
    return (
        j.crossJoin(F.broadcast(chi))
        .select("digit", "n_obs", "obs_ppm", "exp_ppm", "chi2_nano")
        .orderBy("digit")
    )


@register(
    "sync_table_diff",
    category="sync",
    oracle="""
    WITH oldv AS (
      SELECT o_orderkey AS k,
             md5(concat_ws('|',
                 CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                      AS VARCHAR),
                 o_orderstatus, o_orderpriority)) AS dig
      FROM orders WHERE o_orderkey % 17 <> 0
    ),
    newv AS (
      SELECT o_orderkey AS k,
             md5(concat_ws('|',
                 CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                      + CASE WHEN o_orderkey % 11 = 0 THEN 100 ELSE 0 END
                      AS VARCHAR),
                 o_orderstatus, o_orderpriority)) AS dig
      FROM orders WHERE o_orderkey % 13 <> 0
    ),
    j AS (
      SELECT COALESCE(o.k, n.k) AS k,
             CASE WHEN o.k IS NULL THEN 'added'
                  WHEN n.k IS NULL THEN 'removed'
                  WHEN o.dig <> n.dig THEN 'changed'
                  ELSE 'unchanged' END AS diff_class
      FROM oldv o FULL OUTER JOIN newv n ON o.k = n.k
    )
    SELECT diff_class, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(k) AS min_key, MAX(k) AS max_key
    FROM j GROUP BY diff_class ORDER BY diff_class
    """,
)
def sync_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the added/removed/changed/unchanged census between
    two table versions, the reconciliation primitive behind 'did the
    incremental sync land exactly the delta?' (the reference answers
    this only with whole-table row counts; a class-wise diff localizes
    WHERE a sync drifted). Two snapshots are derived deterministically
    from orders: the old version lacks keys ≡0 (mod 17) (these become
    adds), the new version drops keys ≡0 (mod 13) (removes) and bumps
    the price one dollar on keys ≡0 (mod 11) (changes).

    Rows compare by PK + row DIGEST (md5 over a canonical rendering —
    prices as exact cents, so double-formatting divergence can't fake a
    diff), which is what makes the shape scale: the full-outer join
    shuffles (key, 32-byte digest) pairs, never row width, and both
    sides hash-partition on the same PK so a bucketed layout co-locates
    them without exchange. Output: per-class row counts and key ranges.
    The oracle replays the same digests — md5 over identical canonical
    strings — in SQL."""
    o = t(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")

    def dig(cents_col):
        return F.md5(
            F.concat_ws(
                "|",
                cents_col.cast("string"),
                F.col("o_orderstatus"),
                F.col("o_orderpriority"),
            )
        )

    oldv = o.filter(key % 17 != 0).select(key.alias("k"), dig(cents).alias("dig"))
    bump = F.when(key % 11 == 0, F.lit(100)).otherwise(F.lit(0))
    newv = o.filter(key % 13 != 0).select(
        key.alias("k"), dig(cents + bump).alias("dig")
    )
    j = oldv.alias("o").join(
        newv.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer"
    )
    cls = (
        F.when(F.col("o.k").isNull(), F.lit("added"))
        .when(F.col("n.k").isNull(), F.lit("removed"))
        .when(F.col("o.dig") != F.col("n.dig"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.coalesce(F.col("o.k"), F.col("n.k")).alias("k"),
            cls.alias("diff_class"),
        )
        .groupBy("diff_class")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .orderBy("diff_class")
    )
