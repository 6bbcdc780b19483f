"""Multimodal plumbing tests: schema, mapInPandas batch shape, stub
gating, deterministic fakes, frame-sampling fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_extensions_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark, documents):
    return M.docs_as_media(documents.limit(50))


def test_media_schema(media):
    assert media.schema == M.MEDIA_SCHEMA or set(media.columns) == {
        "media_id",
        "kind",
        "payload",
        "mime",
        "source_uri",
    }


def test_decode_requires_decoder(media):
    with pytest.raises(NotImplementedError, match="decoder"):
        M.decode_images(media)  # no codec in this container, fake not requested


def test_decode_fake_deterministic(media):
    a = {r.media_id: (r.width, r.height, r.channels) for r in M.decode_images(media, fake=True).collect()}
    b = {r.media_id: (r.width, r.height, r.channels) for r in M.decode_images(media, fake=True).collect()}
    assert a == b
    assert len(a) == 50
    assert all(w >= 16 and h >= 16 and c == 3 for (w, h, c) in a.values())


def test_decode_handles_null_payload(spark):
    df = spark.createDataFrame(
        [(1, "image", None, None, None)], schema=M.MEDIA_SCHEMA
    )
    row = M.decode_images(df, fake=True).collect()[0]
    assert row.decode_error == "null payload"
    assert row.width is None


def test_decode_error_column_not_task_failure(spark):
    M.set_image_decoder(lambda b: (_ for _ in ()).throw(ValueError("boom")))
    try:
        df = spark.createDataFrame(
            [(1, "image", b"xx", None, None)], schema=M.MEDIA_SCHEMA
        )
        row = M.decode_images(df).collect()[0]
        assert "boom" in row.decode_error
    finally:
        M._image_decoder = None  # restore stub state


def test_installed_decoder_used(spark):
    M.set_image_decoder(lambda b: (len(b), len(b) * 2, 1))
    try:
        df = spark.createDataFrame(
            [(7, "image", b"abcd", None, None)], schema=M.MEDIA_SCHEMA
        )
        row = M.decode_images(df).collect()[0]
        assert (row.width, row.height, row.channels) == (4, 8, 1)
    finally:
        M._image_decoder = None


def test_frame_sampling_bounded(media):
    frames = M.sample_frames(media, every_n_bytes=64, max_frames=5)
    per_media = (
        frames.groupBy("media_id").count().select(F.max("count")).collect()[0][0]
    )
    assert per_media <= 5
    row = frames.filter(F.col("frame_no") == 1).first()
    assert row.offset == 64


def test_resize_images_plumbing(spark, sf_dir):
    from ballista_extensions_spark.io import load_table
    from ballista_extensions_spark.operators.multimodal import (
        docs_as_media,
        resize_images,
    )

    media = docs_as_media(load_table(spark, sf_dir, "documents"))
    out = resize_images(media, 64, 48, fake=True)
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert (r.width, r.height) == (64, 48)
        assert r.byte_len == len(r.payload)
        # fake header encodes the dims — deterministic contract
        assert int.from_bytes(bytes(r.payload[:8]), "big") == 64
    # gate: without a real resizer, fake=False fails at plan time
    import pytest as _pt

    with _pt.raises(NotImplementedError):
        resize_images(media, 64, 48)


def test_extract_features_feeds_ann(spark, sf_dir):
    """Fake-embedded media flows straight into the exact ANN operator
    (schema-compatible with the embeddings table)."""
    from pyspark.sql import functions as F
    from ballista_extensions_spark.io import load_table
    from ballista_extensions_spark.operators.multimodal import (
        docs_as_media,
        extract_features,
    )
    from ballista_extensions_spark.operators.similarity import (
        brute_force_topk,
    )

    media = docs_as_media(load_table(spark, sf_dir, "documents"))
    emb = extract_features(media, dim=16, fake=True)
    a = {r.vec_id: r.embedding for r in emb.collect()}
    b = {r.vec_id: r.embedding for r in extract_features(media, dim=16, fake=True).collect()}
    assert a == b  # deterministic
    assert all(len(v) == 16 for v in a.values())
    topk = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 3), k=5
    )
    got = topk.groupBy("q_id").count().collect()
    assert all(r["count"] == 5 for r in got)
