"""Multimodal-column plumbing: opaque ``binary`` payload columns with
typed metadata, decoded / feature-extracted via Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic STUB (`_decode_stub`) — but everything
Spark-side is real and tested: the binary column construction, the
metadata schema, the Pandas-UDF batch iterator signature, partitioning,
and the downstream aggregation. Swapping `_decode_stub` for a real
PIL/ffmpeg call changes no plumbing.

Scale design: binary payloads ride in parquet as byte arrays; decode is
mapInPandas (Arrow batches, zero-copy into pandas), so a 100 TB media
table decodes at full executor parallelism with bounded memory
(`spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch size).
Frame-sampling/resize compose the same way — per-batch vectorized calls.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import t

_MODALITIES = ["image", "audio", "video"]

DECODED_SCHEMA = (
    "doc_id bigint, modality string, n_bytes int, "
    "width int, height int, duration_ms int, checksum bigint"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from documents: payload = utf-8 bytes of
    the text (a stand-in for real image/audio/video bytes), modality
    assigned deterministically from doc_id."""
    d = t(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in _MODALITIES]),
        (F.col("doc_id") % len(_MODALITIES) + 1).cast("int"),
    )
    return d.select(
        "doc_id",
        modality.alias("modality"),
        F.col("text").cast("binary").alias("payload"),
    )


def _decode_stub(payload: bytes, modality: str) -> dict:
    """STUB decode: deterministic fake metadata derived from the bytes.

    A real deployment replaces this body with PIL.Image.open /
    soundfile.read / av.open — signature and output schema stay as-is.
    Raises NotImplementedError for unknown modalities (the contract a
    real decoder would enforce).
    """
    if modality not in _MODALITIES:
        raise NotImplementedError(f"no decoder for modality {modality!r}")
    n = len(payload)
    checksum = 0
    for b in payload[:64]:  # bounded deterministic checksum
        checksum = (checksum * 131 + b) % (1 << 31)
    if modality == "image":
        return {"width": 64 + n % 512, "height": 64 + (n // 2) % 512, "duration_ms": 0, "checksum": checksum}
    if modality == "audio":
        return {"width": 0, "height": 0, "duration_ms": 1000 + n % 60000, "checksum": checksum}
    return {"width": 320, "height": 240, "duration_ms": 5000 + n % 120000, "checksum": checksum}


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow-batched iterator, one output row per
    payload with typed metadata."""

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _decode_stub(payload, modality)
                for payload, modality in zip(pdf["payload"], pdf["modality"])
            ]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "modality": pdf["modality"].values,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                    "checksum": [m["checksum"] for m in metas],
                }
            )
            yield out

    return df.mapInPandas(_decode_batches, schema=DECODED_SCHEMA)


@register(
    "multimodal_decode_stats",
    category="multimodal",
    oracle=None,  # decode is a stub; plumbing checked rows-only + in tests
    doc="Binary-column decode pipeline: synthesize payload+modality, "
    "mapInPandas decode (stubbed), aggregate per modality. Rows-only "
    "driver check; schema/partitioning/batch plumbing asserted in "
    "tests/test_multimodal.py.",
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    decoded = decode_media(media)
    return (
        decoded.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("width").alias("max_width"),
            F.max("duration_ms").alias("max_duration_ms"),
        )
        .orderBy("modality")
    )


@register(
    "multimodal_payload_stats",
    category="multimodal",
    oracle="""
    SELECT CAST(doc_id % 3 AS INT) AS modality_id,
           COUNT(*) AS n_files,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS INT) AS max_bytes
    FROM documents GROUP BY modality_id ORDER BY modality_id
    """,
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JVM-side half of the media pipeline (oracle-checkable): binary
    payload sizes per modality bucket without touching Python."""
    media = media_table(spark, sf_dir)
    return (
        media.select(
            (F.col("doc_id") % 3).cast("int").alias("modality_id"),
            F.length("payload").alias("nb"),
        )
        .groupBy("modality_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("nb").cast("bigint").alias("total_bytes"),
            F.max("nb").cast("int").alias("max_bytes"),
        )
        .orderBy("modality_id")
    )
