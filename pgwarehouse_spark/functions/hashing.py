"""Engine-portable md5-prefix integer hashes.

Single source of truth for the md5→hex-prefix→int64 spelling that the
sampling/dedup/sketch/split families all rely on for RNG-free,
cross-engine-deterministic bucketing (the DuckDB oracle mirrors the
same spelling as ``CAST('0x' || SUBSTR(md5(...), 1, k) AS BIGINT)`` /
``pg`` conv). Divergence in any private copy would silently break
Spark↔oracle parity, so every consumer imports from here (ADVICE r6:
sketches/pipeline/syncshapes each carried their own spelling).

Width notes: 13 hex chars < 2^52 — exact in a double AND in DuckDB's
int64 conv, the default for keep-rate thresholds and hash-mod routing;
15 hex chars < 2^60 — still sign-bit-free in int64, used for row
digests where more collision headroom matters and no engine ever
round-trips the value through a double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int64(col: Column, hex_chars: int = 13) -> Column:
    """First `hex_chars` hex chars of md5(col) as a non-negative int64."""
    if not 1 <= hex_chars <= 15:
        raise ValueError(f"hex_chars must be in [1, 15], got {hex_chars}")
    return F.conv(
        F.substring(F.md5(col.cast("binary")), 1, hex_chars), 16, 10
    ).cast("bigint")


def h13(col: Column) -> Column:
    """md5-prefix int64 in [0, 2^52): safe in doubles and in every
    engine's int64 — the standard hash for deterministic sampling and
    hash-mod routing."""
    return md5_int64(col, 13)
