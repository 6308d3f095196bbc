"""Z-order (Morton-curve) clustering for multi-dimension file pruning.

Single-key range clustering (`sources/tables.py::_ensure_compacted`,
`merge.py::write_bucketed`) gives each output file a tight min/max band
on ONE key — predicates on that key skip whole files, predicates on any
other column read everything. Z-ordering interleaves the bits of two or
more normalized keys into one sort value, so each file covers a small
*rectangle* of the key space: every z-ordered dimension gets a usefully
narrow min/max band in the parquet footer, and filters on ANY of them
prune files/row-groups (the lakehouse OPTIMIZE ZORDER BY, rebuilt from
public bit-twiddling — no Delta/engine dependency).

The z-value is pure JVM expression work (shiftleft/or folds), so the
clustering write is one range-exchange + local sort, exactly like the
single-key compaction; nothing about the write path changes except the
sort key. The trade: each dimension's band is ~sqrt of what a dedicated
single-key sort would give (for 2 dims) — z-order when queries filter on
several columns, single-key when one column dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension resolution; 2 dims × 16 bits = 32-bit z-value


def _scale_to_bits(c: Column, mn: Column, mx: Column, bits: int = Z_BITS) -> Column:
    """Normalize a numeric column to an integer in [0, 2^bits): linear
    min/max scaling — rank-free, so it needs only two scalars, not a
    global sort. Skewed distributions still prune (cells are uneven but
    monotone); use a quantile-based CDF scale if skew gets extreme."""
    span = F.greatest((mx - mn).cast("double"), F.lit(1e-12))
    frac = (c.cast("double") - mn.cast("double")) / span
    top = F.lit((1 << bits) - 1)
    return F.least(F.floor(frac * (1 << bits)).cast("long"), top.cast("long"))


def zvalue(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low `bits` bits of two non-negative longs
    (a→even positions, b→odd): the Morton index of the (a, b) cell."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            )
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: Column | str,
    col_b: Column | str,
    num_files: int,
    bits: int = Z_BITS,
) -> None:
    """Rewrite `df` as `num_files` files clustered on the z-value of
    (col_a, col_b). One stats pass (4 scalars), one range exchange, one
    local sort — same cost shape as single-key compaction."""
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    stats = df.agg(
        F.min(a).alias("amn"),
        F.max(a).alias("amx"),
        F.min(b).alias("bmn"),
        F.max(b).alias("bmx"),
    )
    z = zvalue(
        _scale_to_bits(a, F.col("amn"), F.col("amx"), bits),
        _scale_to_bits(b, F.col("bmn"), F.col("bmx"), bits),
        bits,
    )
    (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "amn", "amx", "bmn", "bmx")
        .write.mode("overwrite")
        .parquet(path)
    )
