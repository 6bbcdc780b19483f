"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

The Spark-side machinery — schema, partition sizing, mapInPandas batch
shape, deterministic fakes — is real and tested; the actual media codecs
(PIL/librosa/ffmpeg) are NOT in this container, so the decode kernels are
stubbed behind clearly-marked hooks: `set_image_decoder()` installs a
real one; the default raises NotImplementedError unless
``fake=True`` (deterministic fake used by tests and demos).

Scale notes: media blobs make rows heavy — the ops repartition by blob
budget (`target_rows_per_batch`) and rely on
spark.sql.execution.arrow.maxRecordsPerBatch (set by the session factory)
to keep Arrow batches bounded; decode is embarrassingly parallel and
stays off the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal row: opaque payload + typed metadata. Matches the
#: "binary column + metadata struct" pattern for media at scale.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("source_uri", StringType(), True),
    ]
)

DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("byte_len", LongType(), True),
        StructField("decode_error", StringType(), True),
    ]
)

# Decoder hook: (payload bytes) -> (width, height, channels). Installed by
# deployments that ship a real codec; None = not available.
_image_decoder: Callable[[bytes], tuple[int, int, int]] | None = None


def set_image_decoder(fn: Callable[[bytes], tuple[int, int, int]]) -> None:
    """Install a real image decoder, e.g.
    ``set_image_decoder(lambda b: PIL.Image.open(io.BytesIO(b)).size + (3,))``."""
    global _image_decoder
    _image_decoder = fn


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake: derives plausible dimensions from the payload
    bytes (stable across runs/engines). STUB — stands in for a codec the
    container doesn't ship."""
    n = len(payload)
    w = 16 + (n * 2654435761 % 1024)
    h = 16 + (n * 40503 % 768)
    return int(w), int(h), 3


def docs_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: expose the driver's documents table in MEDIA_SCHEMA shape
    (payload = utf-8 bytes) so the multimodal plumbing is exercisable
    with real driver data."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.concat(F.lit("mem://doc/"), F.col("doc_id")).alias("source_uri"),
    )


def decode_images(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode image payloads to (width, height, channels) metadata via
    mapInPandas (Arrow-batched; one python worker per partition, no
    driver involvement).

    With no real decoder installed and fake=False this raises
    NotImplementedError at *plan* time — fail fast, not per-task.
    """
    decoder = _image_decoder
    if decoder is None:
        if not fake:
            raise NotImplementedError(
                "no image decoder installed in this container; call "
                "set_image_decoder(...) or pass fake=True for the "
                "deterministic stub"
            )
        decoder = _fake_decode

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {
                "media_id": [],
                "width": [],
                "height": [],
                "channels": [],
                "byte_len": [],
                "decode_error": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                if payload is None:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                    out["byte_len"].append(None)
                    out["decode_error"].append("null payload")
                    continue
                b = bytes(payload)
                out["byte_len"].append(len(b))
                try:
                    w, h, c = decoder(b)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(c)
                    out["decode_error"].append(None)
                except Exception as e:  # noqa: BLE001 — per-row error column
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                    out["decode_error"].append(str(e)[:200])
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        _decode, schema=DECODED_IMAGE_SCHEMA
    )


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits up to max_frames
    (media_id, frame_no, offset) rows per payload. The byte-offset stride
    stands in for timestamp seeking (STUB: a real build would call an
    ffmpeg-style keyframe index); the explode/fan-out shape — one input
    row becoming bounded-many frame rows — is the part that matters for
    the Spark plan and is real."""
    return (
        df.select(
            "media_id",
            F.length("payload").cast("long").alias("byte_len"),
        )
        .select(
            "media_id",
            F.posexplode(
                F.expr(
                    f"slice(sequence(0L, byte_len, {every_n_bytes}L), 1, {max_frames})"
                )
            ).alias("frame_no", "offset"),
        )
    )
