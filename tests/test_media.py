"""Real stdlib media codecs (functions/media.py): bit-exact container
round-trips (RIFF PCM WAV, binary netpbm), the decoder-contract forms,
and the registered-decoder path through the multimodal operator —
proving the extension point (operators/multimodal.py register_decoder)
with a genuine decoder, not the deterministic fake."""

import numpy as np
import pytest

from vearch_spark.functions.media import (
    decode_image,
    decode_pgm,
    decode_wav,
    decode_wav_pcm,
    pgm_bytes,
    wav_bytes,
    wav_info,
)


def test_wav_roundtrip_mono_16bit():
    rng = np.random.default_rng(5)
    samples = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    blob = wav_bytes(samples, sample_rate=16000)
    info = wav_info(blob)
    assert info == {
        "sample_rate": 16000, "channels": 1, "sampwidth": 2,
        "n_frames": 777, "duration_ms": 48,
    }
    pcm = decode_wav_pcm(blob)
    assert pcm.shape == (777, 1)
    assert (pcm[:, 0] == samples.astype(np.int32)).all()  # bit-exact
    wave = decode_wav(blob)
    assert wave.shape == (777,)
    assert abs(wave).max() <= 1.0
    assert np.allclose(wave, samples.astype(np.float64) / 32768.0)


def test_wav_stereo_mixdown():
    left = np.array([1000, -2000, 30000], dtype=np.int16)
    right = np.array([3000, 2000, -30000], dtype=np.int16)
    inter = np.empty(6, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    blob = wav_bytes(inter, sample_rate=8000, channels=2)
    assert wav_info(blob)["channels"] == 2
    pcm = decode_wav_pcm(blob)
    assert (pcm[:, 0] == left).all() and (pcm[:, 1] == right).all()
    assert np.allclose(decode_wav(blob), (left + right) / 2.0 / 32768.0)


def test_wav_8bit_and_24bit():
    import io
    import wave as _wave

    # 8-bit unsigned PCM: 128 is silence → 0 after re-centering
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
        w.writeframes(bytes([0, 128, 255]))
    pcm = decode_wav_pcm(buf.getvalue())
    assert pcm[:, 0].tolist() == [-128, 0, 127]

    # 24-bit: sign extension must hold at both extremes
    vals = [-(1 << 23), -1, 0, 1, (1 << 23) - 1]
    frames = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(3); w.setframerate(8000)
        w.writeframes(frames)
    pcm = decode_wav_pcm(buf.getvalue())
    assert pcm[:, 0].tolist() == vals


def test_pgm_roundtrip_gray_and_rgb():
    gray = np.arange(24, dtype=np.uint8).reshape(4, 6)
    back = decode_pgm(pgm_bytes(gray))
    assert back.shape == (4, 6) and (back == gray).all()
    rgb = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    back3 = decode_pgm(pgm_bytes(rgb))
    assert back3.shape == (3, 4, 3) and (back3 == rgb).all()
    img = decode_image(pgm_bytes(gray))
    assert img.dtype == np.float64 and img.max() <= 1.0
    assert np.allclose(img * 255.0, gray)


def test_pgm_header_comments_and_rejects():
    gray = np.array([[7, 9], [11, 13]], dtype=np.uint8)
    blob = b"P5\n# a comment\n2 2\n# another\n255\n" + gray.tobytes()
    assert (decode_pgm(blob) == gray).all()
    with pytest.raises(ValueError):
        decode_pgm(b"P1\n2 2\n0 1 1 0")  # ASCII pbm: not supported
    with pytest.raises(ValueError):
        decode_pgm(b"P5\n2 2\n65535\n" + b"\x00" * 8)  # 16-bit maxval
    with pytest.raises(ValueError):
        pgm_bytes(np.zeros((2, 2, 4), dtype=np.uint8))  # RGBA shape


def test_registered_decoder_through_multimodal_operator(spark):
    """The register_decoder extension point with a REAL codec: WAV
    bytes flow through extract_features' Arrow batches and come out as
    the true waveform prefix, not the sha256 fake."""
    from vearch_spark.operators import multimodal as mm
    from vearch_spark.functions.media import register_media_decoders

    register_media_decoders()
    try:
        samples = np.arange(-50, 50, dtype=np.int16) * 300
        rows = [("a1", "audio", bytearray(wav_bytes(samples, 8000)), None, None, None, None)]
        df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
        out = mm.extract_features(df, kind="audio", feature_dim=8).collect()
        want = (samples.astype(np.float64) / 32768.0)[:8]
        assert np.allclose(np.array(out[0].feature, dtype=np.float64), want)
    finally:
        # other tests exercise the documented fake-decoder default
        mm._DECODERS.pop("audio", None)
        mm._DECODERS.pop("image", None)
