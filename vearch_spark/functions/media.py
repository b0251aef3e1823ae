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
- **PNG** hand-parsed on stdlib ``zlib``: 8-bit gray / gray+alpha /
  RGB / RGBA, all five scanline filters (None/Sub/Up/Average/Paeth,
  RFC 2083 §6), CRC-verified chunks, multi-IDAT; decode returns the
  (H, W[, C]) uint8 pixel array. Palette / 16-bit / interlaced
  variants raise a typed error (JPEG/MP3 stay sanctioned out — no
  stdlib DCT/entropy codecs).

``register_media_decoders()`` plugs them into the multimodal
extract_features path ('audio' → WAV, 'image' → PNG or netpbm by
magic). Encoders (``wav_bytes`` / ``pgm_bytes`` / ``png_bytes``) exist
so pipelines and tests can round-trip real containers
deterministically.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

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


# ------------------------------------------------------------------- PNG
#
# RFC 2083: signature + length-tagged CRC'd chunks; IHDR fixes the
# geometry, IDAT chunks concatenate into one zlib stream whose
# decompressed form is H scanlines, each a 1-byte filter tag + the
# filtered bytes. Only non-interlaced 8-bit depth is supported — that
# covers gray (color type 0), gray+alpha (4), RGB (2) and RGBA (6).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples/pixel


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PaethPredictor (RFC 2083 §6.6) vectorized over a scanline
    position: nearest of left/up/up-left to p = a + b − c, ties
    breaking left, then up."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Apply filter ``ftype`` to a raw scanline (encode direction)."""
    r32 = row.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), r32[:-bpp]])
    up = prev.astype(np.int32)
    upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
    if ftype == 0:
        out = r32
    elif ftype == 1:  # Sub
        out = r32 - left
    elif ftype == 2:  # Up
        out = r32 - up
    elif ftype == 3:  # Average
        out = r32 - (left + up) // 2
    elif ftype == 4:  # Paeth
        out = r32 - _paeth(left.astype(np.uint8), prev, upleft)
    else:
        raise ValueError(f"PNG filter type out of range: {ftype}")
    return (out % 256).astype(np.uint8)


def _unfilter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Invert filter ``ftype`` in place over one scanline. Sub /
    Average / Paeth recurse on the just-reconstructed left pixel, so
    they run a per-position loop over the row (rows are short; the
    batch axis is Arrow's)."""
    if ftype == 0:
        return row
    if ftype == 2:  # Up — no left-dependence, fully vectorized
        return (row.astype(np.int32) + prev).astype(np.uint8)
    out = row.astype(np.int32)
    prev32 = prev.astype(np.int32)
    if ftype == 1:  # Sub
        for i in range(bpp, len(out)):
            out[i] = (out[i] + out[i - bpp]) % 256
    elif ftype == 3:  # Average
        for i in range(len(out)):
            left = out[i - bpp] if i >= bpp else 0
            out[i] = (out[i] + (left + prev32[i]) // 2) % 256
    elif ftype == 4:  # Paeth
        for i in range(len(out)):
            a = out[i - bpp] if i >= bpp else 0
            b = prev32[i]
            c = prev32[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out[i] = (out[i] + pred) % 256
    else:
        raise ValueError(f"PNG filter type out of range: {ftype}")
    return out.astype(np.uint8)


def png_bytes(pixels: np.ndarray | list, filters: int | list[int] | None = None) -> bytes:
    """Encode a uint8 array as a real PNG: (H, W) → gray, (H, W, 2) →
    gray+alpha, (H, W, 3) → RGB, (H, W, 4) → RGBA. ``filters`` picks
    the per-scanline filter type (int for all rows, list per row,
    default row-index mod 5 so every filter is exercised) — any choice
    decodes to the same pixels, which is exactly what the round-trip
    tests pin."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, ch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        ch = arr.shape[2]
        color_type = {2: 4, 3: 2, 4: 6}[ch]
    else:
        raise ValueError(f"expected (H,W[,2|3|4]) uint8, got {arr.shape}")
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * ch)
    if filters is None:
        ftypes = [r % 5 for r in range(h)]
    elif isinstance(filters, int):
        ftypes = [filters] * h
    else:
        ftypes = list(filters)
        if len(ftypes) != h:
            raise ValueError(f"filters: expected {h} row entries, got {len(ftypes)}")
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for r in range(h):
        raw.append(ftypes[r])
        raw += _filter_row(ftypes[r], flat[r], prev, ch).tobytes()
        prev = flat[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _png_chunk(b"IEND", b"")
    )


def png_info(content: bytes) -> dict:
    """IHDR metadata without inflating the payload."""
    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    if content[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", content[16:29]
    )
    return {
        "width": w,
        "height": h,
        "bit_depth": depth,
        "color_type": color_type,
        "channels": _PNG_CHANNELS.get(color_type),
        "interlace": interlace,
    }


def decode_png(content: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to exact uint8 pixels:
    (H, W) for gray, (H, W, C) for gray+alpha / RGB / RGBA. Chunk CRCs
    are verified; palette (type 3), 16-bit and interlaced images raise
    ValueError rather than decode approximately."""
    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        tag = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated PNG chunk {tag!r}")
        (crc,) = struct.unpack(">I", content[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (bit depth {depth})")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type} (palette?)")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"PNG payload size mismatch: {len(raw)} != {h}*({stride}+1)"
        )
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        )
        prev = _unfilter_row(raw[r * (stride + 1)], line.copy(), prev, ch)
        out[r] = prev
    return out.reshape((h, w) if ch == 1 else (h, w, ch))


def decode_image(content: bytes) -> np.ndarray:
    """Decoder-contract form (bytes → (H, W[, C]) floats in [0, 1]);
    dispatches PNG vs netpbm on the container magic."""
    if content[:8] == _PNG_SIG:
        return decode_png(content).astype(np.float64) / 255.0
    return decode_pgm(content).astype(np.float64) / 255.0


def register_media_decoders() -> None:
    """Plug the real codecs into the multimodal operator: 'audio' →
    RIFF PCM WAV, 'image' → PNG or netpbm (by magic). Other formats
    still require an external decoder via register_decoder (documented
    extension point, operators/multimodal.py)."""
    from vearch_spark.operators.multimodal import register_decoder

    register_decoder("audio", decode_wav)
    register_decoder("image", decode_image)
