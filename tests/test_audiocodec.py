"""WAV codec + audio feature operator tests: container roundtrip,
RIFF chunk-walk tolerance, 8-bit widening, integer feature replays,
energy-fingerprint properties, nearest-floor resample contract, and
the Spark-side decode/fingerprint/near-dup composition."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ballista_extensions_spark.operators.audiocodec import (
    audio_dhash64,
    audio_meta_stats,
    audio_resample_stats,
    decode_wav,
    encode_wav,
    resample_nearest,
    wav_meta,
    window_energies,
)


def _clip(seed: int, frames: int = 200, channels: int = 2) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(-32768, 32768, size=(frames, channels)).astype(
        np.int16
    )


def test_roundtrip_exact_across_shapes():
    for frames, ch, rate in [(1, 1, 8000), (130, 1, 44100), (521, 2, 16000)]:
        s = _clip(frames * ch, frames, ch)
        out, r = decode_wav(encode_wav(s, rate))
        assert r == rate
        assert np.array_equal(out, s)


def test_mono_1d_input_and_odd_data_pad():
    # odd data length (1 frame of 8-bit would be odd; 16-bit mono with
    # odd frame count has even data, so force oddness via the pad rule:
    # 1 frame mono = 2 bytes, even — craft a payload with a trailing
    # odd-size junk chunk instead to exercise the pad-byte walk.
    s = _clip(3, 5, 1)[:, 0]  # 1-D mono input
    p = encode_wav(s, 8000)
    out, _ = decode_wav(p)
    assert np.array_equal(out[:, 0], s)


def test_unknown_chunks_skipped_with_pad():
    s = _clip(1, 4, 1)
    p = encode_wav(s, 8000)
    # splice a 3-byte LIST chunk (odd size -> 1 pad byte) before fmt
    junk = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    body = p[12:]  # chunks after the WAVE tag
    spliced = b"RIFF" + struct.pack("<I", 4 + len(junk) + len(body)) \
        + b"WAVE" + junk + body
    out, rate = decode_wav(spliced)
    assert rate == 8000
    assert np.array_equal(out, s)


def test_8bit_unsigned_widens_to_int16():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = bytes([0, 128, 255, 64])
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    p = b"RIFF" + struct.pack("<I", len(body)) + body
    out, _ = decode_wav(p)
    assert out[:, 0].tolist() == [-32768, 0, 32512, -16384]


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"", "not a RIFF"),
        (b"RIFX" + b"\x00" * 40, "not a RIFF"),
        (b"RIFF" + struct.pack("<I", 4) + b"AIFF", "not WAVE"),
        (b"RIFF" + struct.pack("<I", 4) + b"WAVE", "no fmt chunk"),
    ],
)
def test_malformed_payloads_fail_loud(payload, msg):
    with pytest.raises(ValueError, match=msg):
        decode_wav(payload)


def test_non_pcm_and_bad_bits_rejected():
    s = _clip(9, 4, 1)
    p = bytearray(encode_wav(s, 8000))
    # fmt chunk starts at offset 20 (RIFF8 + WAVE4 + id4 + size4)
    p[20:22] = struct.pack("<H", 3)  # IEEE float
    with pytest.raises(ValueError, match="audio_format=3"):
        decode_wav(bytes(p))
    p[20:22] = struct.pack("<H", 1)
    p[34:36] = struct.pack("<H", 24)
    with pytest.raises(ValueError, match="bits_per_sample=24"):
        decode_wav(bytes(p))


def test_wav_meta_matches_numpy_replay():
    s = _clip(11, 173, 2)
    m = wav_meta(encode_wav(s, 12000))
    s64 = s.astype(np.int64)
    assert m["sample_rate"] == 12000
    assert m["channels"] == 2
    assert m["n_frames"] == 173
    assert m["duration_ms"] == 173 * 1000 // 12000
    assert m["peak_abs"] == int(np.abs(s64).max())
    assert m["sumsq"] == int((s64 * s64).sum())
    c0 = s64[:, 0] < 0
    assert m["zero_crossings"] == int((c0[1:] != c0[:-1]).sum())


def test_window_energies_floor_partition_replay():
    s = _clip(13, 331, 1)
    p = encode_wav(s, 8000)
    e = window_energies(p)
    ref = [0] * 65
    for i in range(331):
        ref[i * 65 // 331] += int(s[i, 0]) ** 2
    assert e == ref


def test_window_energies_short_clip_empty_windows_are_zero():
    s = _clip(17, 3, 1)  # 3 frames -> 62 empty windows
    e = window_energies(encode_wav(s, 8000))
    assert len(e) == 65
    assert sum(1 for v in e if v != 0) <= 3
    assert sum(e) == int((s[:, 0].astype(np.int64) ** 2).sum())


def test_dhash_channel_dup_invariant_and_signed():
    s = _clip(19, 200, 1)
    mono = encode_wav(s, 8000)
    stereo = encode_wav(np.repeat(s, 2, axis=1), 8000)
    h = audio_dhash64(mono)
    assert audio_dhash64(stereo) == h
    assert -(1 << 63) <= h < (1 << 63)


def test_resample_identity_and_nearest_floor():
    s = _clip(23, 100, 2)
    assert np.array_equal(resample_nearest(s, 8000, 8000), s)
    down = resample_nearest(s, 8000, 3000)
    assert down.shape == (100 * 3000 // 8000, 2)
    for j in range(down.shape[0]):
        assert np.array_equal(down[j], s[j * 8000 // 3000])
    up = resample_nearest(s, 8000, 16000)
    assert up.shape[0] == 200
    assert np.array_equal(up[::2], s)  # even output frames hit inputs


def test_spark_decode_fingerprint_near_dup_composition(spark):
    from ballista_extensions_spark.operators.imagedup import (
        image_dhash,
        phash_near_dup_pairs,
    )

    base = _clip(29, 150, 1)
    near = base.copy()
    near[0, 0] = -near[0, 0]  # perturb one sample: energies barely move
    far = _clip(31, 150, 1)
    rows = [
        (1, bytearray(encode_wav(base, 8000))),
        (2, bytearray(encode_wav(near, 8000))),
        (3, bytearray(encode_wav(far, 8000))),
        (4, None),  # undecodable: must not pair
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    meta = {r["media_id"]: r for r in audio_meta_stats(media).collect()}
    assert meta[1]["n_frames"] == 150 and meta[1]["decode_error"] is None
    assert meta[4]["decode_error"] is not None
    hashes = image_dhash(media, hasher=audio_dhash64)
    got = {(r["id_a"], r["id_b"]) for r in
           phash_near_dup_pairs(hashes, threshold=5, bands=8).collect()}
    # brute-force replay over the decodable clips
    hv = {r["id"]: r["dhash"] for r in hashes.collect()
          if r["dhash"] is not None}
    want = {(a, b) for a in hv for b in hv if a < b
            and bin((hv[a] ^ hv[b]) & ((1 << 64) - 1)).count("1") <= 5}
    assert got == want and (1, 2) in got


def test_spark_resample_stats_matches_local(spark):
    s = _clip(37, 90, 2)
    rows = [(7, bytearray(encode_wav(s, 12000)))]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    r = audio_resample_stats(media, dst_rate=4000).collect()[0]
    local = resample_nearest(s, 12000, 4000).astype(np.int64)
    assert r["out_frames"] == local.shape[0]
    assert r["out_sumsq"] == int((local * local).sum())


def test_truncated_chunk_fails_in_valueerror():
    """Regression: a fmt chunk whose declared size overruns the
    payload must raise ValueError (the documented contract), not leak
    struct.error from the truncated unpack."""
    p = (
        b"RIFF" + struct.pack("<I", 30) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + b"\x01\x00\x01"  # cut short
    )
    with pytest.raises(ValueError, match="overruns container"):
        decode_wav(p)


def test_resample_stats_isolates_bad_rows(spark):
    """Regression: audio_resample_stats must quarantine null and
    undecodable payloads into decode_error instead of failing the
    whole mapInPandas task."""
    s = _clip(51, 40, 1)
    rows = [
        (1, bytearray(encode_wav(s, 8000))),
        (2, None),
        (3, bytearray(b"not a wav at all")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in
           audio_resample_stats(media, dst_rate=4000).collect()}
    assert got[1]["out_frames"] == 20 and got[1]["decode_error"] is None
    for bad in (2, 3):
        assert got[bad]["out_frames"] is None
        assert got[bad]["decode_error"] is not None
