"""Audio binary-column operators: real WAV decode/encode, Arrow-batched
feature extraction, clip sampling. Compressed codecs stay gated."""

from __future__ import annotations

import numpy as np
import pytest

from etl_bigquery_pipeline_spark.multimodal import audio_ops


def _sine(freq: float, dur_s: float, sr: int = 8000, ch: int = 1) -> np.ndarray:
    t = np.arange(int(dur_s * sr)) / sr
    x = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
    return np.stack([x] * ch, axis=1)


def test_wav_roundtrip_and_header():
    x = _sine(440, 0.5, sr=8000, ch=2)
    payload = audio_ops.encode_wav(x, 8000)
    fmt, sr, ch, bits, n_frames, n_bytes = audio_ops.parse_wav_header(payload)
    assert (fmt, sr, ch, bits) == ("wav", 8000, 2, 16)
    assert n_frames == len(x)
    y, sr2 = audio_ops.decode_wav(payload)
    assert sr2 == 8000 and y.shape == x.shape
    assert np.allclose(y, x, atol=2 / 32768)


def test_decode_8bit_and_float32():
    import struct

    x = _sine(100, 0.1, sr=4000)[:, 0]
    # float32 WAV (audio_format=3)
    pcm = x.astype("<f4").tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 3, 1, 4000, 16000, 4, 32)
        + b"data" + struct.pack("<I", len(pcm))
    )
    y, sr = audio_ops.decode_wav(hdr + pcm)
    assert sr == 4000 and np.allclose(y[:, 0], x, atol=1e-6)
    # 8-bit unsigned PCM
    pcm8 = ((np.clip(x, -1, 1) * 127) + 128).astype(np.uint8).tobytes()
    hdr8 = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm8)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 4000, 4000, 1, 8)
        + b"data" + struct.pack("<I", len(pcm8))
    )
    y8, _ = audio_ops.decode_wav(hdr8 + pcm8)
    # 8-bit carries ~1/128 quantization plus the 127-vs-128 scale skew
    assert np.allclose(y8[:, 0], x, atol=2 / 127)


def test_gated_codecs_raise_with_dependency_named():
    for magic in (b"ID3\x03rest", b"OggS junk", b"fLaC junk", b"\xff\xfb junk"):
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            audio_ops.decode_wav(magic)
    fmt, *_ = audio_ops.parse_wav_header(b"OggS junk")
    assert fmt == "ogg"
    assert audio_ops.parse_wav_header(b"garbage!")[0] == "unknown"


def test_with_audio_meta_mapinpandas(spark):
    rows = [
        (1, audio_ops.encode_wav(_sine(440, 0.25), 8000)),
        (2, b"OggS junk"),
        (3, b"not audio"),
    ]
    df = spark.createDataFrame(rows, "audio_id int, payload binary")
    out = {r.audio_id: r.meta for r in audio_ops.with_audio_meta(df).collect()}
    assert out[1].format == "wav" and out[1].sample_rate == 8000
    assert out[1].n_frames == 2000
    assert out[2].format == "ogg" and out[2].sample_rate is None
    assert out[3].format == "unknown"


def test_audio_features_real_signal(spark):
    quiet = audio_ops.encode_wav(_sine(440, 0.5) * 0.1, 8000)
    loud = audio_ops.encode_wav(_sine(440, 0.5), 8000)
    df = spark.createDataFrame(
        [(1, quiet), (2, loud), (3, b"fLaC junk")],
        "audio_id int, payload binary",
    )
    out = {r.audio_id: r for r in audio_ops.audio_features(df).collect()}
    assert out[1].ok and out[2].ok and not out[3].ok
    assert abs(out[2].duration_s - 0.5) < 1e-6
    # sine RMS = amplitude / sqrt(2); quiet is 10% of loud
    assert abs(out[2].rms - 0.5 / np.sqrt(2)) < 0.01
    assert abs(out[1].rms * 10 - out[2].rms * 1) < 0.01 * out[2].rms * 10
    # 440 Hz sine crosses zero ~880 times/s -> zcr ~ 880/8000
    assert abs(out[2].zcr - 880 / 8000) < 0.02
    assert out[3].duration_s is None


def test_sample_clips_contract(spark):
    payload = audio_ops.encode_wav(_sine(220, 2.5), 8000)
    df = spark.createDataFrame([(7, payload)], "audio_id int, payload binary")
    clips = audio_ops.sample_clips(
        df, clip_s=1.0, stride_s=1.0
    ).orderBy("clip_idx").collect()
    assert [c.clip_idx for c in clips] == [0, 1, 2]
    assert [c.start_s for c in clips] == [0.0, 1.0, 2.0]
    # every clip is itself a decodable WAV of <= 1s
    for c in clips:
        y, sr = audio_ops.decode_wav(bytes(c.clip))
        assert sr == 8000 and len(y) <= 8000
    assert len(audio_ops.decode_wav(bytes(clips[2].clip))[0]) == 4000


def test_g711_mulaw_alaw_decode_matches_audioop():
    """G.711 companded WAV decodes for real: the closed-form table must
    match CPython's audioop reference byte-for-byte over all 256 codes,
    and a mu-law WAV payload must decode through decode_wav."""
    import struct
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    allb = bytes(range(256))
    for mu, fn in ((True, audioop.ulaw2lin), (False, audioop.alaw2lin)):
        table = audio_ops._g711_table(mu=mu)
        ref = np.frombuffer(fn(allb, 2), dtype="<i2").astype(np.int32)
        assert np.array_equal(table, ref), f"mu={mu}"

    # mu-law WAV end-to-end: compress a sine with audioop, decode natively
    x = _sine(200, 0.05, sr=8000)[:, 0]
    lin = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    ulaw = audioop.lin2ulaw(lin, 2)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(ulaw)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 7, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", len(ulaw))
    )
    y, sr = audio_ops.decode_wav(hdr + ulaw)
    assert sr == 8000 and y.shape == (len(x), 1)
    # mu-law is ~14-bit log PCM: generous but meaningful tolerance
    assert np.abs(y[:, 0] - x).max() < 0.02
