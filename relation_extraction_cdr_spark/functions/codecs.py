"""Pure-python (stdlib-only) media codecs: PNG, WAV, and baseline JPEG.

The multimodal column contract (operators/multimodal.py) treats media as
opaque binary + typed metadata, with decode as a pandas-UDF kernel.  The
container ships no PIL/ffmpeg, so these decoders make the decode seam
REAL for the formats that need nothing beyond ``zlib``/``struct``/numpy:

- PNG (RFC 2083): 8-bit greyscale / RGB / RGBA, non-interlaced, all five
  scanline filter types (None/Sub/Up/Average/Paeth) — the complete
  baseline-truecolor subset a feature-extraction pipeline meets in
  practice.  Palette, interlace, and 16-bit raise NotImplementedError
  (the documented seam for a full codec).
- WAV (RIFF): PCM 16-bit little-endian, any channel count/rate.
- JPEG (ITU-T T.81 baseline sequential): 8-bit, greyscale or 4:4:4
  YCbCr, canonical Annex K huffman tables, byte stuffing, zigzag, DC
  prediction, real float DCT/IDCT.  Progressive, subsampled chroma,
  restart intervals, and 16-bit quant tables raise NotImplementedError.

Encoders exist so tests and datagen can synthesize REAL files
deterministically (PNG rows cycle all 5 filter types; JPEG emits a real
entropy-coded scan); they are not a pipeline stage.
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
        elif f == 1:  # Sub — per-channel-lane prefix sum mod 256
            line = line.reshape(-1, ch).cumsum(axis=0, dtype=np.int64)
            line = (line & 0xFF).astype(np.uint8).reshape(-1)
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


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81): pure-python encoder + decoder.
#
# Scope (documented seam boundaries, like PNG's): baseline sequential
# DCT, 8-bit, 1 component (greyscale) or 3 components YCbCr with 4:4:4
# sampling, interleaved single scan, standard Annex K huffman tables.
# Progressive (SOF2), extended/lossless SOFs, subsampled chroma,
# restart intervals (DRI), and 16-bit quant tables raise
# NotImplementedError.  The encoder exists so tests/datagen synthesize
# REAL bitstreams deterministically (headers, canonical huffman,
# byte-stuffing, zigzag, DC prediction all on the hash path).
# ---------------------------------------------------------------------------

JPEG_MAGIC = b"\xff\xd8\xff"

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

# Annex K.3 typical huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
assert len(_AC_LUMA[1]) == sum(_AC_LUMA[0]) == 162
assert len(_AC_CHROMA[1]) == sum(_AC_CHROMA[0]) == 162

# flat-8 default quant tables: near-lossless at 8-bit inputs AND exact
# for flat blocks (DC = 8*(v-128) / 8 = v-128; see q94's closed form)
_Q_FLAT8 = np.full(64, 8, np.int64)


def _dct_basis() -> np.ndarray:
    """C[u, x] = a(u)/2 * cos((2x+1) u pi / 16); F = C f C^T, f = C^T F C."""
    u = np.arange(8)[:, None].astype(np.float64)
    x = np.arange(8)[None, :].astype(np.float64)
    c = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    c[0] /= np.sqrt(2.0)
    return c


_DCT_C = _dct_basis()


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits), canonical JPEG assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for n in range(1, 17):
        for _ in range(bits[n - 1]):
            out[huffval[k]] = (code, n)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(nbits, code) -> symbol, inverse of _canonical_codes."""
    return {(n, c): s for s, (c, n) in _canonical_codes(bits, huffval).items()}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (code & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 7 - ((self.n - 1) % 8) + 1)  # pad with 1-bits
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, prev_dc: int, dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - prev_dc
    size = _category(diff)
    code, n = dc_codes[size]
    bw.put(code, n)
    if size:
        bw.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, n = ac_codes[0xF0]  # ZRL
            bw.put(code, n)
            run -= 16
        size = _category(v)
        code, n = ac_codes[(run << 4) | size]
        bw.put(code, n)
        bw.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, n = ac_codes[0x00]  # EOB
        bw.put(code, n)
    return int(zz[0])


def _component_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(h, w) uint8 plane -> [bh, bw, 64] zigzagged quantized coeffs."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.empty((bh * 8, bw * 8), np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]  # edge-replicate pad
    padded[:, w:] = padded[:, w - 1 : w]
    padded -= 128.0
    out = np.empty((bh, bw, 64), np.int64)
    qz = q.reshape(8, 8)
    for by in range(bh):
        for bx in range(bw):
            f = _DCT_C @ padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] @ _DCT_C.T
            out[by, bx] = np.rint(f / qz).astype(np.int64).reshape(-1)[_ZIGZAG]
    return out


def jpeg_encode(
    pixels: np.ndarray,
    quant_luma: np.ndarray | None = None,
    quant_chroma: np.ndarray | None = None,
) -> bytes:
    """(h, w) grey or (h, w, 3) RGB uint8 -> baseline JPEG bytes
    (4:4:4, Annex K huffman tables, flat-8 quant by default)."""
    px = np.asarray(pixels, np.uint8)
    grey = px.ndim == 2
    if not grey and px.shape[2] != 3:
        raise NotImplementedError(f"jpeg_encode: {px.shape[2]} channels")
    h, w = px.shape[:2]
    ql = (_Q_FLAT8 if quant_luma is None else np.asarray(quant_luma, np.int64)).reshape(-1)
    qc = (_Q_FLAT8 if quant_chroma is None else np.asarray(quant_chroma, np.int64)).reshape(-1)
    if grey:
        planes = [px.astype(np.float64)]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = np.clip(np.rint(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        cb = np.clip(np.rint(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0), 0, 255)
        cr = np.clip(np.rint(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0), 0, 255)
        planes = [y, cb, cr]
    comps = [_component_blocks(p, ql if i == 0 else qc) for i, p in enumerate(planes)]

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (8-bit precision)
    for tq, q in ([(0, ql)] if grey else [(0, ql), (1, qc)]):
        body = bytes([tq]) + bytes(int(q[_ZIGZAG[k]]) for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    # SOF0
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not grey:
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tcth, (bits, vals) in tables:
        body = bytes([tcth]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    # interleaved entropy-coded scan (one block per component per MCU)
    dc_codes = [_canonical_codes(*(_DC_LUMA if i == 0 else _DC_CHROMA)) for i in range(ncomp)]
    ac_codes = [_canonical_codes(*(_AC_LUMA if i == 0 else _AC_CHROMA)) for i in range(ncomp)]
    bw_ = comps[0].shape[1]
    bh_ = comps[0].shape[0]
    bwriter = _BitWriter()
    prev = [0] * ncomp
    for by in range(bh_):
        for bx in range(bw_):
            for ci in range(ncomp):
                prev[ci] = _encode_block(
                    bwriter, comps[ci][by, bx], prev[ci], dc_codes[ci], ac_codes[ci]
                )
    out += bwriter.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: entropy data exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for n in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((n, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode_coeffs(payload: bytes):
    """Parse a baseline JPEG down to its quantized coefficient blocks:
    returns (h, w, [per-component [bh, bw, 64] zigzag coeff arrays],
    [per-component dequant tables]).  Split from jpeg_decode so tests
    can pin the bitstream layer (huffman/zigzag/DC-prediction/stuffing)
    EXACTLY against the encoder's coefficients, independent of IDCT
    float tolerance."""
    if payload[:3] != JPEG_MAGIC[:3] or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (id, tq, sampling)
    scan: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        m = payload[pos + 1]
        if m == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if m == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("jpeg_decode: 16-bit quant table")
                zz = np.frombuffer(body[o + 1 : o + 65], np.uint8).astype(np.int64)
                q = np.zeros(64, np.int64)
                q[_ZIGZAG] = zz
                qt[tq] = q
                o += 65
        elif m == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                huff[(tc, th)] = _decode_table(bits, vals)
                o += 17 + nv
        elif m == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError(
                        "jpeg_decode: subsampled chroma (4:4:4 only)"
                    )
                comps.append((cid, tq, samp))
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"jpeg_decode: SOF marker 0xFF{m:02X} (baseline SOF0 only)")
        elif m == 0xDD:  # DRI
            raise NotImplementedError("jpeg_decode: restart intervals")
        elif m == 0xDA:  # SOS
            ns = body[0]
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                idx = next(i for i, c in enumerate(comps) if c[0] == cid)
                scan.append((idx, tabs >> 4, tabs & 0xF))
            data_start = pos
            break
        # APPn / COM / others: skipped
    if h is None or data_start is None:
        raise ValueError("JPEG: missing SOF0/SOS")
    # unstuff entropy data up to EOI
    raw = bytearray()
    p = data_start
    while p < len(payload):
        b = payload[p]
        if b == 0xFF:
            nxt = payload[p + 1] if p + 1 < len(payload) else 0xD9
            if nxt == 0x00:
                raw.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                raise NotImplementedError("jpeg_decode: restart markers")
            break  # EOI or next marker
        raw.append(b)
        p += 1
    br = _BitReader(bytes(raw))
    bh, bw = -(-h // 8), -(-w // 8)
    blocks = [np.zeros((bh, bw, 64), np.int64) for _ in comps]
    prev = [0] * len(comps)
    for by in range(bh):
        for bx in range(bw):
            for idx, tdc, tac in scan:
                zz = blocks[idx][by, bx]
                size = _read_symbol(br, huff[(0, tdc)])
                diff = _extend(br.bits(size), size) if size else 0
                prev[idx] += diff
                zz[0] = prev[idx]
                k = 1
                while k < 64:
                    sym = _read_symbol(br, huff[(1, tac)])
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += sym >> 4
                    size = sym & 0xF
                    if k > 63:
                        raise ValueError("JPEG: AC index overflow")
                    zz[k] = _extend(br.bits(size), size)
                    k += 1
    return h, w, blocks, [qt[c[1]] for c in comps]


def jpeg_decode(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, channels) uint8 (1 or 3 channels;
    3-component output is RGB via the JFIF YCbCr transform)."""
    h, w, blocks, quants = jpeg_decode_coeffs(payload)
    bh, bw = -(-h // 8), -(-w // 8)
    planes = []
    for coeffs, q in zip(blocks, quants):
        plane = np.empty((bh * 8, bw * 8), np.float64)
        qz = q.reshape(8, 8)
        for by in range(bh):
            for bx in range(bw):
                f = np.zeros(64, np.float64)
                f[_ZIGZAG] = coeffs[by, bx].astype(np.float64)
                f = f.reshape(8, 8) * qz
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT_C.T @ f @ _DCT_C
                )
        planes.append(plane[:h, :w] + 128.0)
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
