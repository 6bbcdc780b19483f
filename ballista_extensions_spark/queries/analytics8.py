"""Round-10 audio-modality queries: the REAL pure-stdlib WAV codec
(operators/audiocodec.py) extends the decode→features→dedup loop to a
third modality — decode metadata, integer energy fingerprints, banded
Hamming near-dup over audio, and a nearest-floor resampler, each with
a bit-exact SQL oracle replaying the fixture arithmetic
(operators/multimodal.py:docs_as_wav_media).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballista_extensions_spark.io import ensure_parallelism, load_table
from ballista_extensions_spark.queries.registry import register

#: Shared oracle preamble: the WAV fixture geometry (rate/channels/
#: frames from the utf-8 byte length) and the per-sample affine
#: (byte - 128) * 256 — the exact arithmetic docs_as_wav_media encodes
#: and decode_wav recovers losslessly (16-bit PCM roundtrips exactly).
_WAV_DIMS = """
    d AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n,
             8000 + (octet_length(encode(text)) % 5) * 2000 AS rate,
             1 + octet_length(encode(text)) % 2 AS ch,
             130 + octet_length(encode(text)) % 391 AS fr
      FROM documents)
"""

#: Channel-0 energy-window CTE on top of _WAV_DIMS: frame f's sample
#: is flat index f*ch (interleaved PCM), window of frame f is
#: f*65 // fr (floor partition; fr >= 130 so all 65 windows are
#: nonempty), energy = integer sum of squares, and the 64 adjacent
#: strictly-greater comparisons assemble the BIGINT fingerprint with
#: bit 63 entering as the signed minimum — the audiocodec.audio_dhash64
#: convention.
_AUDIO_HASH_CTE = f"""
    {_WAV_DIMS},
    wv AS (
      -- constant series bound (fixture max fr = 520) + WHERE filter:
      -- DuckDB's table-function generate_series rejects lateral
      -- column bounds
      SELECT doc_id, (f * 65) // fr AS k,
             CASE WHEN n = 0 THEN 0 ELSE
               (CAST('0x' || substring(hx, (((f * ch) % n) + 1) * 2 - 1, 2) AS INT) - 128) * 256
             END AS v
      FROM d, generate_series(0, 519) t(f) WHERE f < fr),
    e AS (
      SELECT doc_id, k, SUM(CAST(v AS BIGINT) * v) AS en
      FROM wv GROUP BY doc_id, k),
    bits AS (
      SELECT l.doc_id, l.k AS k,
             CASE WHEN r.en > l.en THEN 1 ELSE 0 END AS bit
      FROM e l JOIN e r ON r.doc_id = l.doc_id AND r.k = l.k + 1
      WHERE l.k <= 63),
    ah AS (
      SELECT doc_id, CAST(SUM(CASE WHEN bit = 1 THEN
          CASE WHEN k = 63 THEN -9223372036854775808
               ELSE (CAST(1 AS BIGINT) << k) END
          ELSE 0 END) AS BIGINT) AS energy_hash
      FROM bits GROUP BY doc_id)
"""


@register(
    "audio_decode_meta",
    oracle=f"""
    WITH {_WAV_DIMS},
    s AS (
      SELECT doc_id, i,
             CASE WHEN n = 0 THEN 0 ELSE
               (CAST('0x' || substring(hx, ((i % n) + 1) * 2 - 1, 2) AS INT) - 128) * 256
             END AS v,
             ch
      FROM d, generate_series(0, 1039) t(i) WHERE i < fr * ch),
    agg AS (
      SELECT doc_id,
             MAX(ABS(CAST(v AS BIGINT))) AS peak_abs,
             SUM(CAST(v AS BIGINT) * v) AS sumsq
      FROM s GROUP BY doc_id),
    zc AS (
      SELECT doc_id,
             COALESCE(SUM(CASE WHEN (v < 0) <> (pv < 0)
                          THEN 1 ELSE 0 END), 0) AS zero_crossings
      FROM (SELECT doc_id, v,
                   LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
            FROM s WHERE i % ch = 0)
      WHERE pv IS NOT NULL
      GROUP BY doc_id)
    SELECT d.doc_id AS media_id,
           CAST(rate AS INT) AS sample_rate,
           CAST(ch AS INT) AS channels,
           CAST(fr AS INT) AS n_frames,
           CAST(fr * 1000 // rate AS BIGINT) AS duration_ms,
           CAST(agg.peak_abs AS BIGINT) AS peak_abs,
           CAST(agg.sumsq AS BIGINT) AS sumsq,
           CAST(zc.zero_crossings AS BIGINT) AS zero_crossings
    FROM d JOIN agg ON agg.doc_id = d.doc_id
           JOIN zc ON zc.doc_id = d.doc_id
    """,
)
def audio_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: documents become genuine 16-bit
    PCM RIFF/WAVE files (multimodal.docs_as_wav_media), the shipped
    pure-stdlib codec parses them back (RIFF chunk walk, fmt/data,
    interleaved int16 — operators/audiocodec.py:decode_wav), and every
    reported feature is integer arithmetic the oracle replays per
    sample: duration (floor ms), peak amplitude, sum of squares and
    channel-0 zero crossings. A hash match proves the container
    roundtrip AND the feature math sample-exactly on every row. Scale:
    one Arrow-batched mapInPandas pass, no shuffle, no driver state."""
    from ballista_extensions_spark.operators.audiocodec import (
        audio_meta_stats,
    )
    from ballista_extensions_spark.operators.multimodal import (
        docs_as_wav_media,
    )

    media = docs_as_wav_media(
        ensure_parallelism(load_table(spark, sf_dir, "documents"))
    )
    return audio_meta_stats(media).select(
        "media_id", "sample_rate", "channels", "n_frames",
        "duration_ms", "peak_abs", "sumsq", "zero_crossings",
    )


@register(
    "audio_energy_fingerprints",
    oracle=f"""
    WITH {_AUDIO_HASH_CTE}
    SELECT doc_id AS media_id, energy_hash FROM ah
    """,
)
def audio_energy_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip 64-bit energy fingerprint over REAL WAV payloads: the
    time-axis dHash (65 contiguous channel-0 energy windows, 64
    strictly-greater adjacent comparisons —
    operators/audiocodec.py:audio_dhash64), computed by the SAME
    Arrow-batched hashing operator the image path uses
    (operators/imagedup.py:image_dhash with a pluggable hasher). The
    oracle recomputes every clip's hash from the fixture arithmetic,
    so a match proves decode → windowing → energy → bit assembly
    bit-for-bit on every row — the full-coverage complement of
    audio_near_dup_energy. Scale: narrow pass, 8 B of state per clip,
    no shuffle."""
    from ballista_extensions_spark.operators.audiocodec import audio_dhash64
    from ballista_extensions_spark.operators.imagedup import image_dhash
    from ballista_extensions_spark.operators.multimodal import (
        docs_as_wav_media,
    )

    media = docs_as_wav_media(
        ensure_parallelism(load_table(spark, sf_dir, "documents"))
    )
    return image_dhash(media, hasher=audio_dhash64).select(
        F.col("id").alias("media_id"),
        F.col("dhash").alias("energy_hash"),
    )


@register(
    "audio_near_dup_energy",
    oracle=f"""
    WITH {_AUDIO_HASH_CTE}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.energy_hash, b.energy_hash)) AS BIGINT)
             AS hamming
    FROM ah a JOIN ah b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.energy_hash, b.energy_hash)) <= 5
    """,
)
def audio_near_dup_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs by energy fingerprint — the third
    modality through the SAME banded multi-index Hamming join the
    image path proved (operators/imagedup.py:phash_near_dup_pairs,
    pigeonhole recall exactly 1.0 for threshold < bands): real WAV
    payloads → codec decode → 64-bit energy dHash → all pairs within
    Hamming distance 5. The oracle runs the corpus² brute force; the
    Spark plan never builds it. Scale: 8 B hash state per clip,
    only DISTINCT hashes enter the banded join (round-11 hot-bucket
    discipline), so a degenerate population sharing one fingerprint
    costs one banded row per band, never member count²."""
    from ballista_extensions_spark.operators.audiocodec import audio_dhash64
    from ballista_extensions_spark.operators.imagedup import (
        image_dhash,
        phash_near_dup_pairs,
    )
    from ballista_extensions_spark.operators.multimodal import (
        docs_as_wav_media,
    )

    media = docs_as_wav_media(
        ensure_parallelism(load_table(spark, sf_dir, "documents"))
    )
    hashes = image_dhash(media, hasher=audio_dhash64)
    return phash_near_dup_pairs(hashes, threshold=5, bands=8)


@register(
    "audio_resample_checksum",
    oracle=f"""
    WITH {_WAV_DIMS},
    o AS (
      SELECT doc_id, fr, rate,
             CASE WHEN n = 0 THEN 0 ELSE
               (CAST('0x' || substring(hx, (((((j * rate) // 4000) * ch + c) % n) + 1) * 2 - 1, 2) AS INT) - 128)
               * 256
             END AS v
      FROM d,
           generate_series(0, 259) t(j),
           generate_series(0, 1) u(c)
      WHERE c < ch AND j < fr * 4000 // rate)
    SELECT doc_id AS media_id,
           CAST(fr * 4000 // rate AS INT) AS out_frames,
           CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS out_sumsq
    FROM o GROUP BY doc_id, fr, rate
    """,
)
def audio_resample_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-floor resample to 4 kHz with an integer checksum of the
    resampled stream (operators/audiocodec.py:resample_nearest —
    output frame j takes input frame j*rate//4000, output length
    fr*4000//rate): the deterministic decimation baseline of an audio
    feature pipeline, proven sample-exactly because the oracle replays
    the two floor divisions per output sample against the fixture
    bytes. Scale: one Arrow-batched pass, output co-partitioned with
    the input, no shuffle."""
    from ballista_extensions_spark.operators.audiocodec import (
        audio_resample_stats,
    )
    from ballista_extensions_spark.operators.multimodal import (
        docs_as_wav_media,
    )

    media = docs_as_wav_media(
        ensure_parallelism(load_table(spark, sf_dir, "documents"))
    )
    return audio_resample_stats(media, dst_rate=4000).select(
        "media_id", "out_frames", "out_sumsq"
    )
