"""Z-order (Morton-curve) layout — multi-dimensional clustering for
data skipping, the plain-parquet analogue of Delta's OPTIMIZE ZORDER.

A single-column sort gives perfect file-level min/max pruning on ONE
predicate column and none on any other; interleaving the bits of two
key columns gives useful pruning on BOTH (each file covers a small
rectangle of the 2-D key space instead of a thin stripe). No anchor in
the reference (its MergeTree ORDER BY is single-axis, clickhouse_
backend.py:149-153); this is the 100 TB extension surface: lay a fact
table out once by z-value, and parquet row-group min/max statistics
prune scans filtered on either dimension.

Each dimension is RANGE-NORMALIZED to the full Z_BITS width before
interleaving — norm = (v - min) * 2^bits DIV (max - min + 1), exact
integer arithmetic — because raw-bit interleaving of keys with unequal
magnitudes lets the wider key monopolize the high z-bits and the curve
degenerates into a single-column sort (Delta's OPTIMIZE samples ranges
for the same reason). The normalization scalars are two global min/max
aggregates: broadcast-joined in the registered query (fully
declarative), driver scalars in the layout writer (control-plane, same
category as the sync watermark reads).

Everything is JVM-side integer arithmetic (shiftright/&/shiftleft
composed into one expression) — no UDFs — and the layout write is one
repartitionByRange(z) + sortWithinPartitions(z): a single range
shuffle, the same cost as any global sort, amortized over every future
pruned scan.

The registered query pins the normalized curve cross-engine: the DuckDB
oracle recomputes the identical normalization and 32-term interleave
with its own integer operators, so the bit math is verified bit-for-
bit, not just statistically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import t

Z_BITS = 16  # bits per dimension after range normalization → 32-bit z


def _spark_z_terms(a: str, b: str, bits: int) -> str:
    """One Spark-SQL expression interleaving the low `bits` of a and b:
    bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1})")
    return " + ".join(terms)


def _duck_z_terms(a: str, b: str, bits: int) -> str:
    """The identical interleave in DuckDB's operator syntax."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def z_value(a, b, bits: int = Z_BITS):
    """Spark Column: Morton interleave of the low `bits` of integer
    columns/expressions a and b (pass column-name strings or SQL
    sub-expressions; inputs must already be range-normalized to
    [0, 2^bits))."""
    return F.expr(_spark_z_terms(a, b, bits))


def _norm_expr(col: str, lo: str, span: str, bits: int = Z_BITS) -> str:
    """Exact-integer range normalization to [0, 2^bits): the same text
    parses in Spark SQL (DIV) — DuckDB uses // via _norm_sql."""
    return f"CAST(((({col}) - ({lo})) * {1 << bits}) DIV ({span}) AS BIGINT)"


def _norm_sql(col: str, lo: str, span: str, bits: int = Z_BITS) -> str:
    return f"CAST(((({col}) - ({lo})) * {1 << bits}) // ({span}) AS BIGINT)"


def _z_key_expr(df: DataFrame, col: str) -> str:
    """SQL expression projecting `col` onto the integer curve axis:
    integers pass through, DATE becomes a day offset from epoch and
    TIMESTAMP an epoch-day (day-granular curve locality — the layout
    clusters by day, which is what date-range pruning reads). Anything
    else is rejected UP FRONT with a clear error (ADVICE r03: the
    previous code advertised date support but crashed in int())."""
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return col
    if isinstance(dt, T.DateType):
        return f"DATEDIFF({col}, DATE '1970-01-01')"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return f"CAST(FLOOR(UNIX_SECONDS(CAST({col} AS TIMESTAMP)) / 86400) AS BIGINT)"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        # fractional keys quantize onto a micro-unit integer grid (1e-6
        # granularity, order-preserving) — fine for price/measure-like
        # business values; |col| beyond ~9e12 would overflow the bigint
        # axis, at which point the caller should pre-bin explicitly
        return f"CAST(FLOOR({col} * 1000000) AS BIGINT)"
    raise TypeError(
        f"z-order column {col!r} has type {dt.simpleString()}; "
        "integer, date, timestamp, and fractional columns are supported"
    )


def write_zorder_layout(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    n_files: int = 32,
    bits: int = Z_BITS,
) -> None:
    """Materialize df z-ordered on integer/date/timestamp columns
    (a, b): project each key onto an integer axis (dates → day
    offsets), range-normalize both dimensions, one range shuffle on the
    z-value, rows sorted by z within each output file so parquet
    row-group min/max stats prune on EITHER column. At 100 TB, n_files
    scales with data (files of ~1 GB); the range partitioner samples
    z-value quantiles so skewed key regions still split evenly. The
    min/max scalars are one driver-side aggregate (control-plane)."""
    ka, kb = _z_key_expr(df, a), _z_key_expr(df, b)
    lo_a, hi_a, lo_b, hi_b = df.selectExpr(
        f"MIN({ka})", f"MAX({ka})", f"MIN({kb})", f"MAX({kb})"
    ).collect()[0]
    if lo_a is None or lo_b is None:  # empty input: nothing to order
        df.write.mode("overwrite").parquet(path)
        return
    span_a = max(1, int(hi_a) - int(lo_a) + 1)
    span_b = max(1, int(hi_b) - int(lo_b) + 1)
    z = z_value(
        _norm_expr(f"({ka})", str(int(lo_a)), str(span_a), bits),
        _norm_expr(f"({kb})", str(int(lo_b)), str(span_b), bits),
        bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


# bucket shift: z >> _ZSHIFT keeps the top 8 z-bits → up to 256 coarse
# buckets, 4 normalized bits per dimension (each bucket covers 1/16 of
# each key's range) — granularity is sf-independent because the curve
# runs over NORMALIZED coordinates.
_ZSHIFT = 2 * Z_BITS - 8

_ZORDER_ORACLE = f"""
    WITH bounds AS (
      SELECT MIN(o_custkey) AS ck_lo,
             MAX(o_custkey) - MIN(o_custkey) + 1 AS ck_span,
             MIN(date_diff('day', DATE '1992-01-01', o_orderdate)) AS dd_lo,
             MAX(date_diff('day', DATE '1992-01-01', o_orderdate))
               - MIN(date_diff('day', DATE '1992-01-01', o_orderdate)) + 1
               AS dd_span
      FROM orders
    ),
    keyed AS (
      SELECT {_norm_sql('o.o_custkey', 'b.ck_lo', 'b.ck_span')} AS ck,
             {_norm_sql("date_diff('day', DATE '1992-01-01', o.o_orderdate)",
                        'b.dd_lo', 'b.dd_span')} AS dd
      FROM orders o CROSS JOIN bounds b
    ),
    zed AS (
      SELECT ck, dd, ({_duck_z_terms('ck', 'dd', Z_BITS)}) AS z FROM keyed
    )
    SELECT CAST(z >> {_ZSHIFT} AS BIGINT) AS z_bucket,
           COUNT(*) AS n_rows,
           CAST(MIN(ck) AS BIGINT) AS ck_min, CAST(MAX(ck) AS BIGINT) AS ck_max,
           CAST(MIN(dd) AS BIGINT) AS dd_min, CAST(MAX(dd) AS BIGINT) AS dd_max
    FROM zed GROUP BY z_bucket ORDER BY z_bucket
"""


@register(
    "layout_zorder_stats",
    category="layout",
    oracle=_ZORDER_ORACLE,
    doc="Z-order locality report over orders keyed on (o_custkey, "
    "order date): range-normalize both keys to 16 bits, Morton-"
    "interleave, bucket rows by the top 8 z-bits, and report each "
    "bucket's min/max extent on BOTH normalized dimensions — the exact "
    "statistics a z-ordered file layout exposes to min/max pruning "
    "(every bucket covers a ~1/16-of-range rectangle of the key plane, "
    "so a predicate on EITHER key skips most buckets; a single-column "
    "sort would give one dimension full extents — pinned in "
    "tests/test_zorder.py). The oracle recomputes the identical "
    "normalization + 32-term interleave with DuckDB's integer "
    "operators, pinning the curve bit-for-bit. The min/max bounds ride "
    "a broadcast one-row cross join; everything else is one codegen "
    "stage + a groupBy on a 256-value key. At 100 TB the same "
    "expression drives write_zorder_layout's range shuffle.",
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("bigint").alias("raw_ck"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("raw_dd"),
    )
    bounds = o.agg(
        F.min("raw_ck").alias("ck_lo"),
        (F.max("raw_ck") - F.min("raw_ck") + 1).alias("ck_span"),
        F.min("raw_dd").alias("dd_lo"),
        (F.max("raw_dd") - F.min("raw_dd") + 1).alias("dd_span"),
    )
    keyed = o.crossJoin(F.broadcast(bounds)).selectExpr(
        f"{_norm_expr('raw_ck', 'ck_lo', 'ck_span')} AS ck",
        f"{_norm_expr('raw_dd', 'dd_lo', 'dd_span')} AS dd",
    )
    zed = keyed.withColumn("z", z_value("ck", "dd"))
    return (
        zed.select(
            F.shiftright(F.col("z"), _ZSHIFT).cast("bigint").alias("z_bucket"),
            "ck",
            "dd",
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ck").cast("bigint").alias("ck_min"),
            F.max("ck").cast("bigint").alias("ck_max"),
            F.min("dd").cast("bigint").alias("dd_min"),
            F.max("dd").cast("bigint").alias("dd_max"),
        )
        .orderBy("z_bucket")
    )


def rowgroup_stats(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Distributed parquet-FOOTER inspection: per (file, row group,
    column) the row count and the footer's min/max statistics — the
    exact metadata engines use for row-group/file skipping, read
    WITHOUT touching data pages. This is the diagnostic a layout job
    (compact, z-order) runs to prove its clustering landed: tight
    per-row-group min/max rectangles == effective pruning.

    Scale design: file listing rides Spark's `binaryFile` reader with a
    footer-only projection (`path`/`length`, content column never
    selected so data bytes don't ship), then footers parse
    EXECUTOR-side via pyarrow `mapInPandas` — one task per batch of
    files, no driver-side loop, no full-file reads (pyarrow seeks the
    footer). DuckDB's `parquet_metadata()` is the cross-engine check
    (pinned in tests/test_zorder.py); values are stringified exactly as
    pyarrow reports them, keeping the schema generic across column
    types."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path")
    wanted = list(columns) if columns else None

    def _read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for uri in pdf["path"]:
                local = uri[len("file:"):] if uri.startswith("file:") else uri
                meta = pq.ParquetFile(local).metadata
                for rg in range(meta.num_row_groups):
                    g = meta.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        name = col.path_in_schema
                        if wanted is not None and name not in wanted:
                            continue
                        st = col.statistics
                        out.append(
                            {
                                "file": local,
                                "row_group": rg,
                                "n_rows": g.num_rows,
                                "col_name": name,
                                "min_val": None
                                if st is None or not st.has_min_max
                                else str(st.min),
                                "max_val": None
                                if st is None or not st.has_min_max
                                else str(st.max),
                            }
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "file", "row_group", "n_rows",
                    "col_name", "min_val", "max_val",
                ],
            )

    return files.mapInPandas(
        _read_footers,
        schema="file string, row_group int, n_rows bigint, "
        "col_name string, min_val string, max_val string",
    )
