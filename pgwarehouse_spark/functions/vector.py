"""Vector column expressions (dot product, cosine) — JVM-side folds over
array<float> columns, no Python UDFs.

Cross-engine determinism: per-element products are computed in double
(bit-identical in any engine), cast to DECIMAL(28,12) (exact, identical
rounding), summed exactly, then cast back to double. The decimal fold
keeps the accumulator at DECIMAL(30,12) with an explicit re-cast each
step — Spark's decimal `+` would otherwise promote to (38,11) and
silently drop the 12th scale digit. Values stay < 1e18 so the re-cast
is lossless.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ACC_TYPE = "decimal(30,12)"


def dot_exact(u: Column, v: Column) -> Column:
    """Order-independent exact dot product of two float-array columns."""
    return F.aggregate(
        F.zip_with(
            u,
            v,
            lambda x, y: (x.cast("double") * y.cast("double")).cast("decimal(28,12)"),
        ),
        F.lit(0).cast(_ACC_TYPE),
        lambda acc, z: (acc + z).cast(_ACC_TYPE),
    ).cast("double")


def cosine_expr(a: Column, b: Column) -> Column:
    """Exact cosine similarity (for precomputed-norm paths build it from
    dot_exact directly)."""
    return dot_exact(a, b) / (
        F.sqrt(dot_exact(a, a)) * F.sqrt(dot_exact(b, b))
    )


# DuckDB-side equivalents (list_sum over decimal is exact).
def sql_dot(u: str, v: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({u}, {v}), "
        "x -> CAST(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE) AS DECIMAL(28,12)))) AS DOUBLE)"
    )


def sql_cosine(u: str, v: str) -> str:
    return (
        f"({sql_dot(u, v)} / (SQRT({sql_dot(u, u)}) * SQRT({sql_dot(v, v)})))"
    )


# Fixed-point variants: FLOOR(product · 1e12) summed as BIGINT. Unlike the
# decimal cast above, FLOOR has no rounding tie to break, so engines whose
# decimal rounding modes differ (Spark HALF_UP vs DuckDB HALF_EVEN — a
# product landing EXACTLY on a .5 boundary at scale 12 diverges by 1 ulp)
# still agree bit-for-bit. Use for raw float32 dot products compared
# cross-engine (the covariance/PCA/kNN-graph family); the decimal form
# remains for decimal-valued business data. Bound: |x·y|·1e12 per element
# and the summed total must stay < 2^63 (~9.2e18) — unit-norm-ish
# embeddings at any realistic dim are orders of magnitude below.


def dot_fixed(u: Column, v: Column) -> Column:
    """Order-independent fixed-point dot product (scale 1e-12), double."""
    return (
        F.aggregate(
            F.zip_with(
                u,
                v,
                lambda x, y: F.floor(
                    x.cast("double") * y.cast("double") * F.lit(1e12)
                ).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, z: acc + z,
        ).cast("double")
        / F.lit(1e12)
    )


def sql_dot_fixed(u: str, v: str) -> str:
    return (
        f"(CAST(list_sum(list_transform(list_zip({u}, {v}), "
        "x -> CAST(FLOOR(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE) * 1e12) AS BIGINT))) "
        "AS DOUBLE) / 1e12)"
    )


def sql_cosine_fixed(u: str, v: str) -> str:
    return (
        f"({sql_dot_fixed(u, v)} / "
        f"(SQRT({sql_dot_fixed(u, u)}) * SQRT({sql_dot_fixed(v, v)})))"
    )


def l2sq_fixed(u: Column, v: Column) -> Column:
    """Order-independent fixed-point squared L2 distance (scale 1e-12)."""
    return (
        F.aggregate(
            F.zip_with(
                u,
                v,
                lambda x, y: F.floor(
                    (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double"))
                    * F.lit(1e12)
                ).cast("bigint"),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, z: acc + z,
        ).cast("double")
        / F.lit(1e12)
    )


def sql_l2sq_fixed(u: str, v: str) -> str:
    return (
        f"(CAST(list_sum(list_transform(list_zip({u}, {v}), "
        "x -> CAST(FLOOR((CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) "
        "* (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * 1e12) AS BIGINT))) "
        "AS DOUBLE) / 1e12)"
    )
