"""Audio branch: real RIFF/WAVE PCM16 decode + signal features."""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np

from web_content_extractor_spark.operators.multimodal import (
    _decode_wav,
    extract_audio_features,
)


def _wav_bytes(samples: np.ndarray, rate: int = 8000, channels: int = 1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _media_df(spark, rows):
    return spark.createDataFrame(
        [
            (str(i), str(i), "audio", "audio/wav", payload, None)
            for i, payload in enumerate(rows)
        ],
        "media_id string, doc_id string, media_type string, mime string, "
        "payload binary, meta struct<width:int,height:int,duration_ms:int,"
        "n_bytes:bigint>",
    )


def test_sine_wave_features(spark):
    # 8 kHz mono sine at 1 kHz, amplitude 1000, 80 samples (10 ms)
    t = np.arange(80)
    s = np.round(1000 * np.sin(2 * math.pi * 1000 * t / 8000)).astype(
        np.int64
    )
    out = extract_audio_features(
        _media_df(spark, [_wav_bytes(s)])
    ).collect()[0]
    assert out.decoded and out.sample_rate == 8000
    assert out.n_channels == 1 and out.n_samples == 80
    assert abs(out.duration_ms - 10.0) < 1e-9
    want_rms = math.sqrt(float((s * s).sum()) / s.size)
    assert abs(out.rms - want_rms) < 1e-9
    neg = s < 0
    assert out.zcr == int(np.count_nonzero(neg[1:] != neg[:-1]))


def test_stereo_frames_and_silence(spark):
    stereo = np.array([100, -100, 200, -200, 300, -300], dtype=np.int64)
    silence = np.zeros(16, dtype=np.int64)
    rows = extract_audio_features(
        _media_df(
            spark,
            [_wav_bytes(stereo, rate=16000, channels=2),
             _wav_bytes(silence)],
        )
    ).collect()
    by = {r.media_id: r for r in rows}
    st = by["0"]
    assert st.n_channels == 2 and st.n_samples == 3  # frames, not samples
    assert abs(st.duration_ms - 3 / 16000 * 1000) < 1e-9
    assert st.zcr == 5  # interleaved stream alternates sign every step
    si = by["1"]
    assert si.decoded and si.rms == 0.0 and si.zcr == 0


def test_garbage_and_truncated_payloads(spark):
    good = _wav_bytes(np.array([1, 2, 3, 4], dtype=np.int64))
    rows = extract_audio_features(
        _media_df(
            spark,
            [
                b"not a wav at all",
                good[:20],  # truncated mid-header
                b"",
                None,
                good,
            ],
        )
    ).collect()
    by = {r.media_id: r for r in rows}
    for mid in ("0", "1", "2", "3"):
        assert not by[mid].decoded
        assert by[mid].rms == 0.0 and by[mid].n_samples == 0
    assert by["4"].decoded and by["4"].n_samples == 4


def test_decode_walks_extra_chunks_and_word_alignment():
    # LIST chunk with odd size (word-aligned pad byte) before fmt/data
    samples = np.array([10, -10, 20], dtype="<i2")
    fmt = struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    data = samples.tobytes()
    odd = b"x" * 3
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
        + b"fmt " + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    dec = _decode_wav(payload)
    assert dec is not None
    rate, ch, s = dec
    assert rate == 8000 and ch == 1 and list(s) == [10, -10, 20]


def test_non_pcm_rejected():
    fmt = struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)  # float
    body = b"WAVE" + b"fmt " + fmt + b"data" + struct.pack("<I", 0)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert _decode_wav(payload) is None
