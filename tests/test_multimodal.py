"""Multimodal plumbing: binary column construction, mapInPandas decode
stub, schema and batch behavior."""

from __future__ import annotations

import pytest


def test_media_table_schema(spark, sf_dir):
    from pgwarehouse_spark.operators.multimodal import media_table

    m = media_table(spark, sf_dir)
    assert dict(m.dtypes) == {
        "doc_id": "bigint",
        "modality": "string",
        "payload": "binary",
    }
    mods = {r.modality for r in m.select("modality").distinct().collect()}
    assert mods == {"image", "audio", "video"}


def test_decode_produces_typed_metadata(spark, sf_dir):
    from pgwarehouse_spark.operators.multimodal import decode_media, media_table

    decoded = decode_media(media_table(spark, sf_dir))
    assert dict(decoded.dtypes) == {
        "doc_id": "bigint",
        "modality": "string",
        "n_bytes": "int",
        "width": "int",
        "height": "int",
        "duration_ms": "int",
        "checksum": "bigint",
    }
    rows = decoded.collect()
    assert len(rows) == media_table(spark, sf_dir).count()
    for r in rows[:20]:
        assert r.n_bytes > 0
        if r.modality == "image":
            assert r.width > 0 and r.duration_ms == 0
        if r.modality == "audio":
            assert r.duration_ms > 0 and r.width == 0


def test_decode_deterministic(spark, sf_dir):
    from pgwarehouse_spark.operators.multimodal import decode_media, media_table

    a = {r.doc_id: r.checksum for r in decode_media(media_table(spark, sf_dir)).collect()}
    b = {r.doc_id: r.checksum for r in decode_media(media_table(spark, sf_dir)).collect()}
    assert a == b


def test_decode_stub_rejects_unknown_modality():
    from pgwarehouse_spark.operators.multimodal import _decode_stub

    with pytest.raises(NotImplementedError):
        _decode_stub(b"bytes", "hologram")
