"""Pure-python (stdlib-only) media codecs: PNG and WAV.

The multimodal column contract (operators/multimodal.py) treats media as
opaque binary + typed metadata, with decode as a pandas-UDF kernel.  The
container ships no PIL/ffmpeg, so these decoders make the decode seam
REAL for the two formats that need nothing beyond ``zlib``/``struct``:

- PNG (RFC 2083): 8-bit greyscale / RGB / RGBA, non-interlaced, all five
  scanline filter types (None/Sub/Up/Average/Paeth) — the complete
  baseline-truecolor subset a feature-extraction pipeline meets in
  practice.  Palette, interlace, and 16-bit raise NotImplementedError
  (the documented seam for a full codec).
- WAV (RIFF): PCM 16-bit little-endian, any channel count/rate.

Encoders exist so tests and datagen can synthesize REAL files
deterministically (per-row filter type cycles 0..4, exercising every
unfilter path); they are not a pipeline stage.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> PNG color type
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec 6.6), vectorized over a scanline."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_encode(pixels: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 -> PNG bytes.  Scanline r uses filter
    type r % 5, so a round-trip proves every unfilter branch."""
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in _COLOR_TYPE:
        raise NotImplementedError(f"png_encode: {ch} channels unsupported")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * ch, np.uint8)
    for r in range(h):
        line = px[r].reshape(-1)
        f = r % 5
        left = np.concatenate([np.zeros(ch, np.uint8), line[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.uint8), prev[:-ch]])
        if f == 0:
            enc = line
        elif f == 1:
            enc = line - left
        elif f == 2:
            enc = line - prev
        elif f == 3:
            enc = line - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8)
        else:
            enc = line - _paeth(left, prev, upleft)
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8.  8-bit grey/RGB/RGBA,
    non-interlaced; every scanline filter type."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    w = h = None
    ch = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"png_decode: bit depth {depth}")
            if color not in _CHANNELS:
                raise NotImplementedError(f"png_decode: color type {color}")
            if interlace:
                raise NotImplementedError("png_decode: interlaced PNG")
            ch = _CHANNELS[color]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("not a PNG: missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for r in range(h):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, offset=r * (stride + 1) + 1
        ).copy()
        if f == 0:
            pass
        elif f == 2:  # Up — vectorizable
            line += prev
        elif f == 3:  # Average — left-dependence forces the pixel scan
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (int(line[i]) + ((int(a) + int(prev[i])) >> 1)) & 0xFF
        elif f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (int(line[i]) + int(line[i - ch])) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {f}")
        out[r] = line
        prev = out[r]
    return out.reshape(h, w, ch)


WAV_MAGIC = b"RIFF"


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> PCM WAV bytes."""
    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 WAV bytes -> ((n, channels) int16, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    rate = None
    ch = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, ch, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"wav_decode: format {audio_fmt}/{bits}-bit (PCM-16 only)"
                )
        elif tag == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    s = np.frombuffer(data, "<i2")
    return s.reshape(-1, ch), rate
