"""Real (stdlib-only) media codecs for the multimodal column.

The multimodal operator plumbing (operators/multimodal.py) is
decoder-pluggable; heavyweight image/audio libraries are not in this
container, so these are the two formats a pure stdlib+numpy
implementation can decode FOR REAL — no fake, no stub:

- **WAV (RIFF PCM)** via the stdlib ``wave`` module: 8/16/24/32-bit
  PCM, any channel count; decode returns the mono-mixed float waveform
  in [-1, 1). The reference treats media as opaque bytes end-to-end
  (BINARY fields, doc_parse.go); decoding is this engine's
  training-data-pipeline extension.
- **PGM/PPM (netpbm P5/P6)** hand-parsed: binary grayscale/RGB with
  maxval ≤ 255; decode returns the (H, W) / (H, W, 3) uint8 pixel
  array.

``register_media_decoders()`` plugs both into the multimodal
extract_features path ('audio' → WAV, 'image' → netpbm). Encoders
(``wav_bytes`` / ``pgm_bytes``) exist so pipelines and tests can
round-trip real containers deterministically.
"""

from __future__ import annotations

import io
import wave

import numpy as np

# ------------------------------------------------------------------ WAV


def wav_bytes(
    samples: np.ndarray | list[int], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Encode int16 PCM samples as a real RIFF/WAVE container
    (interleaved when ``channels`` > 1; frame count = len/channels)."""
    arr = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(int(channels))
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(arr.astype("<i2").tobytes())
    return buf.getvalue()


def wav_info(content: bytes) -> dict:
    """Container metadata without decoding the payload: sample_rate,
    channels, sampwidth (bytes), n_frames, duration_ms."""
    with wave.open(io.BytesIO(content), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        return {
            "sample_rate": rate,
            "channels": w.getnchannels(),
            "sampwidth": w.getsampwidth(),
            "n_frames": n,
            "duration_ms": int(n * 1000 / rate) if rate else 0,
        }


def decode_wav_pcm(content: bytes) -> np.ndarray:
    """Decode RIFF PCM to the raw integer sample matrix
    (n_frames, channels) — exact, no float rounding: 8-bit unsigned is
    re-centered to signed, 16/32-bit are native little-endian, 24-bit
    is sign-extended manually (numpy has no int24)."""
    with wave.open(io.BytesIO(content), "rb") as w:
        ch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 1:
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.int32) - 128
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.int32)
    elif width == 3:
        raw = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        x = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        x = np.where(x >= 1 << 23, x - (1 << 24), x)
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.int64)
    else:
        raise ValueError(f"unsupported PCM sample width: {width}")
    return x.reshape(-1, ch)


def decode_wav(content: bytes) -> np.ndarray:
    """Decoder-contract form (register_decoder: bytes → (samples,)):
    mono-mixed waveform as float64 in [-1, 1) — channel mean divided by
    the format's full scale."""
    with wave.open(io.BytesIO(content), "rb") as w:
        width = w.getsampwidth()
    pcm = decode_wav_pcm(content)
    scale = float(1 << (8 * width - 1))
    return pcm.mean(axis=1) / scale


# ---------------------------------------------------------------- netpbm


def pgm_bytes(pixels: np.ndarray | list[list[int]]) -> bytes:
    """Encode a uint8 array as binary netpbm: (H, W) → P5 grayscale,
    (H, W, 3) → P6 RGB."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        magic = b"P5"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"expected (H,W) or (H,W,3), got {arr.shape}")
    h, w = arr.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def _pbm_tokens(content: bytes, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated header tokens after the magic,
    honoring '#' comments (netpbm spec); returns (tokens, payload_pos)."""
    pos = 2  # past magic
    out: list[int] = []
    while len(out) < n:
        # skip whitespace and comment lines
        while pos < len(content):
            c = content[pos : pos + 1]
            if c == b"#":
                nl = content.find(b"\n", pos)
                pos = len(content) if nl < 0 else nl + 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        out.append(int(content[start:pos]))
    return out, pos + 1  # exactly ONE whitespace byte before the payload


def decode_pgm(content: bytes) -> np.ndarray:
    """Decode binary netpbm (P5 grayscale → (H, W); P6 RGB →
    (H, W, 3)) with maxval ≤ 255. Exact uint8 pixels."""
    magic = content[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    (w, h, maxval), pos = _pbm_tokens(content, 3)
    if maxval > 255:
        raise ValueError(f"16-bit netpbm not supported (maxval={maxval})")
    ch = 1 if magic == b"P5" else 3
    need = w * h * ch
    data = np.frombuffer(content, dtype=np.uint8, count=need, offset=pos)
    return data.reshape((h, w) if ch == 1 else (h, w, 3))


def decode_image(content: bytes) -> np.ndarray:
    """Decoder-contract form (bytes → (H, W[, C]) floats in [0, 1])."""
    return decode_pgm(content).astype(np.float64) / 255.0


def register_media_decoders() -> None:
    """Plug the real codecs into the multimodal operator: 'audio' →
    RIFF PCM WAV, 'image' → netpbm. Other formats still require an
    external decoder via register_decoder (documented extension
    point, operators/multimodal.py)."""
    from vearch_spark.operators.multimodal import register_decoder

    register_decoder("audio", decode_wav)
    register_decoder("image", decode_image)
