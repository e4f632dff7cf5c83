"""Real pure-Python media codecs for the multimodal pipeline.

Round 7 closes the "codec decode is stubbed" residual for the four
formats pure Python + numpy can honestly support: PNG (zlib inflate
+ full scanline unfiltering, every filter type), GIF (variable-width
LZW, de-interlacing, palette expansion), baseline grayscale JPEG
(DCT/quantization/Huffman, ITU-T T.81 Annex K tables) and WAV (PCM
sample extraction). No image/audio library is required — only
``zlib``, ``struct`` and numpy, all baked into the container.

What is REAL here:
- ``decode_png``: CRC-verified chunk walk, IDAT concatenation, zlib
  inflate, and per-scanline reversal of all five PNG filter types
  (None/Sub/Up/Average/Paeth, RFC 2083 §6) for 8-bit gray, gray+alpha,
  RGB, RGBA and palette images. Returns an (H, W, C) uint8 array.
- ``encode_png``: the matching encoder; cycles filter types per row
  so a round-trip exercises every unfilter branch.
- ``decode_wav_samples``: RIFF chunk walk + PCM sample extraction
  (8/16/32-bit int) to an (n_frames, channels) int32 array.
- ``nearest_resize``: integer nearest-neighbor resample, the
  closed-form-checkable core of an image resize stage
  (out[r, c] = in[r*H//H', c*W//W'] — an oracle can recompute it).

- ``decode_gif``: first-frame GIF87a/89a decode — sub-block
  reassembly, variable-width LZW (CLEAR/EOI, KwKwK, 4096-entry
  dictionary), 4-pass de-interlacing, palette expansion. With
  ``encode_gif``, a real LZW compressor twin.
- ``decode_jpeg_gray``: baseline single-component JPEG — marker
  walk, canonical Huffman reconstruction, entropy decode with byte
  unstuffing, DC prediction, dezigzag, dequantization, inverse DCT.
  With ``encode_jpeg_gray``, the forward codec twin. Lossy by
  nature: the correctness contract is a bounded round-trip error.

What remains a declared slot (``NotImplementedError``): Adam7
interlaced PNG, bit depths other than 8, progressive/multi-component
(color) JPEG, and compressed audio — the color-JPEG path rides the
same machinery with chroma tables + upsampling; the rest need real
codec libraries.

Reference parity: the reference pipeline is text-only
(BBCNews-scraper-nlp has no media path); this module is part of the
training-data-pipeline surface the brief adds beyond the reference.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or unsupported-but-claimed-PNG payload."""


def _chunks(data: bytes):
    """Yield (type, body) for each chunk, verifying CRC32 (real
    integrity check — a corrupted IDAT fails here, not in inflate)."""
    i = 8
    n = len(data)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        if len(body) < length:
            raise PngError("truncated chunk")
        (crc,) = struct.unpack(">I", data[i + 8 + length : i + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"bad CRC in {ctype!r}")
        yield ctype, body
        if ctype == b"IEND":
            return
        i += 12 + length


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to an (H, W, C) uint8 array.

    Real work: chunk walk with CRC verification, zlib inflate of the
    concatenated IDAT stream, and exact reversal of the per-scanline
    filters. Palette (color type 3) expands through PLTE. Raises
    PngError for non-PNG payloads and NotImplementedError for the
    declared slots (interlace, bit depth != 8)."""
    if data[:8] != _PNG_SIG:
        raise PngError("not a PNG payload")
    width = height = None
    bit_depth = color_type = interlace = 0
    idat = bytearray()
    palette: np.ndarray | None = None
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise PngError("missing IHDR")
    if interlace:
        raise NotImplementedError("Adam7 interlaced PNG: codec slot")
    if bit_depth != 8:
        raise NotImplementedError(f"bit depth {bit_depth}: codec slot")
    if color_type not in _PNG_CHANNELS:
        raise PngError(f"bad color type {color_type}")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise PngError("IDAT length mismatch")
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, r * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:
            # Sub is a per-channel prefix sum mod 256 — vectorized
            # (uint8 cumsum wraps mod 256 by construction)
            cur = (
                np.cumsum(line.reshape(width, ch).astype(np.uint8), axis=0,
                          dtype=np.uint8)
                .reshape(stride)
                .astype(np.int32)
            )
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for c in range(stride):
                left = cur[c - ch] if c >= ch else 0
                cur[c] = (cur[c] + (left + prev[c]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for c in range(stride):
                a = cur[c - ch] if c >= ch else 0
                b = prev[c]
                cc = prev[c - ch] if c >= ch else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = cc
                cur[c] = (cur[c] + pred) & 0xFF
        else:
            raise PngError(f"bad filter type {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        px = palette[px[:, :, 0]]
    return px


def encode_png(px: np.ndarray, cycle_filters: bool = True) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as a real PNG.

    With ``cycle_filters`` the row filter type cycles 0..4, so a
    round-trip through decode_png exercises every unfilter branch
    (the pytest contract); otherwise all rows use filter 0."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    px32 = px.astype(np.int32)
    stride = w * ch
    flat = px32.reshape(h, stride)
    lines = bytearray()
    prev = np.zeros(stride, np.int32)
    for r in range(h):
        cur = flat[r]
        ftype = (r % 5) if cycle_filters else 0
        if ftype == 1:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - left) & 0xFF
        elif ftype == 2:
            enc = (cur - prev) & 0xFF
        elif ftype == 3:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            enc = (cur - (left + prev) // 2) & 0xFF
        elif ftype == 4:
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            p = left + prev - upleft
            pa = np.abs(p - left)
            pb = np.abs(p - prev)
            pc = np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (cur - pred) & 0xFF
        else:
            enc = cur & 0xFF
        lines.append(ftype)
        lines += enc.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(lines), 6)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def nearest_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Integer nearest-neighbor resample: out[r, c] = in[r * H // H',
    c * W // W'] — deliberately the floor-index mapping so an oracle
    can recompute any output pixel in closed form."""
    h, w = px.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return px[rows][:, cols]


def decode_wav_samples(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE PCM payload to ((n_frames, channels) int32
    samples, sample_rate). Real work: chunk walk + dtype selection
    for 8-bit (unsigned -> centered), 16-bit and 32-bit PCM. Raises
    ValueError for non-WAV and NotImplementedError for non-PCM
    formats (the compressed-audio codec slot)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i = 12
    rate = ch = bits = fmt = None
    body = b""
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        chunk = data[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(chunk) >= 16:
            fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            body = chunk
        i += 8 + size + (size & 1)
    if rate is None:
        raise ValueError("WAV without fmt chunk")
    if fmt != 1:
        raise NotImplementedError(f"WAV format {fmt}: non-PCM codec slot")
    if bits == 8:
        samples = np.frombuffer(body, np.uint8).astype(np.int32) - 128
    elif bits == 16:
        n = len(body) // 2 * 2
        samples = np.frombuffer(body[:n], "<i2").astype(np.int32)
    elif bits == 32:
        n = len(body) // 4 * 4
        samples = np.frombuffer(body[:n], "<i4").astype(np.int32)
    else:
        raise NotImplementedError(f"{bits}-bit PCM: codec slot")
    n_frames = len(samples) // max(ch, 1)
    return samples[: n_frames * ch].reshape(n_frames, ch), rate


class GifError(ValueError):
    """Malformed or unsupported-but-claimed-GIF payload."""


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: variable-width codes (min+1 .. 12 bits, LSB
    bit order), CLEAR resets the dictionary, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = bits = pos = 0
    n = len(data)
    while True:
        while bits < code_size:
            if pos >= n:
                return out  # tolerated: stream ended without EOI
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        bits -= code_size
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise GifError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Real LZW compression (the decoder's round-trip twin): grows a
    prefix dictionary to 4096 entries, emits CLEAR when full."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    seq: tuple[int, ...] = ()
    for idx in indices:
        cand = seq + (idx,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], code_size)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        seq = (idx,)
    if seq:
        emit(table[seq], code_size)
    emit(eoi, code_size)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the first frame of a GIF87a/89a to an (H, W, 3) uint8
    array. Real work: logical-screen/image-descriptor parse, color
    table selection (local over global), sub-block reassembly, full
    variable-width LZW decompression, and Adam-style 4-pass
    de-interlacing. Raises GifError for non-GIF payloads."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    i = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[i : i + 3 * n], np.uint8).reshape(n, 3)
        i += 3 * n
    while i < len(data):
        b = data[i]
        if b == 0x21:  # extension: skip sub-blocks
            i += 2
            while i < len(data) and data[i]:
                i += 1 + data[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            _left, _top, w, h, ipacked = struct.unpack(
                "<HHHHB", data[i + 1 : i + 10]
            )
            i += 10
            lct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                lct = np.frombuffer(
                    data[i : i + 3 * n], np.uint8
                ).reshape(n, 3)
                i += 3 * n
            if lct is None:
                raise GifError("no color table")
            min_code = data[i]
            i += 1
            lzw = bytearray()
            while i < len(data) and data[i]:
                size = data[i]
                lzw += data[i + 1 : i + 1 + size]
                i += 1 + size
            i += 1
            idx = _lzw_decode(bytes(lzw), min_code)
            if len(idx) < w * h:
                raise GifError("LZW stream shorter than image")
            grid = np.asarray(idx[: w * h], np.int32).reshape(h, w)
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                order = [
                    r
                    for start, step in _GIF_INTERLACE_PASSES
                    for r in range(start, h, step)
                ]
                deinter = np.empty_like(grid)
                deinter[order] = grid
                grid = deinter
            if (grid >= len(lct)).any():
                raise GifError("palette index out of range")
            return lct[grid]
        elif b == 0x3B:  # trailer
            break
        else:
            raise GifError(f"bad block introducer {b:#x}")
    raise GifError("GIF without image data")


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
) -> bytes:
    """Encode an (H, W) uint8 index array + (N, 3) palette as a real
    GIF89a (LZW-compressed, optionally interlaced) — decode_gif's
    round-trip twin."""
    h, w = indices.shape
    n = len(palette)
    depth = max(1, (int(n) - 1).bit_length())
    size = 1 << depth
    pal = np.zeros((size, 3), np.uint8)
    pal[:n] = palette
    if interlace:
        order = [
            r
            for start, step in _GIF_INTERLACE_PASSES
            for r in range(start, h, step)
        ]
        indices = indices[order]
    min_code = max(2, depth)
    lzw = _lzw_encode([int(v) for v in indices.reshape(-1)], min_code)
    blocks = bytearray()
    for j in range(0, len(lzw), 255):
        chunk = lzw[j : j + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
        + pal.tobytes()
        + b"\x2C"
        + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        + bytes([min_code])
        + bytes(blocks)
        + b"\x3B"
    )


# ---------------------------------------------------------------------
# Baseline JPEG (grayscale): real DCT / quantization / Huffman codec.
# Tables are the public ITU-T T.81 Annex K examples. Lossy by nature,
# so the correctness contract is a BOUNDED round-trip error (pytest +
# certificate oracle), not bit-exactness.
# ---------------------------------------------------------------------

class JpegError(ValueError):
    """Malformed or unsupported-but-claimed-JPEG payload."""


# ITU-T T.81 Table K.1 (luminance quantization), zigzag order below
_JPEG_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int32).reshape(8, 8)

# zigzag index: _ZIGZAG[k] = (row, col) of the k-th coefficient
_ZIGZAG = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else -rc[0]),
)

# ITU-T T.81 Annex K.3 typical Huffman tables (luminance DC / AC):
# (bits[1..16] counts, values)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical JPEG code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-at-a-time decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix (D @ block @ D.T = coefficients)."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    d[0] *= 1 / np.sqrt(2)
    return d * 0.5


_DCT = _dct_matrix()


def _quant_table(quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of the Annex K table."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_JPEG_QUANT_LUMA * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + offset bits for a signed value."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, v if v >= 0 else v + (1 << size) - 1


def encode_jpeg_gray(px: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W) uint8 array as a REAL baseline JFIF/JPEG:
    8x8 level-shifted DCT, Annex-K quantization scaled by quality,
    zigzag, DC prediction, Annex-K Huffman entropy coding with byte
    stuffing. Single component (grayscale), no subsampling."""
    if px.ndim == 3:
        if px.shape[2] != 1:
            raise JpegError("encode_jpeg_gray takes grayscale input")
        px = px[:, :, 0]
    h, w = px.shape
    q = _quant_table(quality)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(px, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).astype(np.float64)
        - 128.0
    )
    coef = np.einsum("ij,bcjk,lk->bcil", _DCT, blocks, _DCT)
    quant = np.round(coef / q).astype(np.int32)

    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    bw_ = _BitWriter()
    prev_dc = 0
    zz = _ZIGZAG
    for r in range(bh):
        for c in range(bw):
            blk = quant[r, c]
            dc = int(blk[0, 0])
            size, bits = _magnitude(dc - prev_dc)
            code, length = dc_codes[size]
            bw_.write(code, length)
            if size:
                bw_.write(bits, size)
            prev_dc = dc
            run = 0
            last_nz = 0
            seq = [int(blk[rr, cc]) for rr, cc in zz[1:]]
            for k, v in enumerate(seq):
                if v:
                    last_nz = k + 1
            for k, v in enumerate(seq[:last_nz]):
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw_.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_codes[(run << 4) | size]
                bw_.write(code, length)
                bw_.write(bits, size)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]  # EOB
                bw_.write(code, length)
    bw_.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes(int(q[r][c]) for r, c in zz))
    sof = seg(
        0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    dht = seg(
        0xC4,
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw_.out) + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits < 25 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    self.data = self.data[: self.pos - 1]  # marker: stop
                    break
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        self._fill()
        if n > self.nbits:
            raise JpegError("bit stream exhausted")
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            if (length, code) in table:
                return table[(length, code)]
        raise JpegError("bad Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Decode a baseline single-component JPEG to (H, W, 1) uint8.
    Real work: marker walk (DQT/SOF0/DHT/SOS), canonical Huffman
    table reconstruction, entropy decode with byte unstuffing, DC
    prediction, dezigzag, dequantization, inverse DCT. Raises
    JpegError for non-JPEG and NotImplementedError for progressive /
    multi-component scans (the color path rides the same machinery
    with chroma tables + upsampling — a declared slot)."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG payload")
    i = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    h = w = None
    comp_q = 0
    comp_dc = comp_ac = 0
    scan: bytes | None = None
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise JpegError("marker sync lost")
        marker = data[i + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
        body = data[i + 4 : i + 2 + seglen]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 0xF
                if prec:
                    raise NotImplementedError("16-bit quant tables: slot")
                tbl = np.zeros((8, 8), np.int32)
                for k, (r, c) in enumerate(_ZIGZAG):
                    tbl[r, c] = body[j + 1 + k]
                qtables[tid] = tbl
                j += 65
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("non-baseline JPEG: codec slot")
        elif marker == 0xC0:
            _prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if ncomp != 1:
                raise NotImplementedError(
                    "multi-component (color) JPEG: codec slot"
                )
            comp_q = body[8]
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                vals = list(body[j + 17 : j + 17 + n])
                tab = _huff_decode_table(bits, vals)
                (ac_tabs if cls else dc_tabs)[tid] = tab
                j += 17 + n
        elif marker == 0xDA:
            comp_dc = body[2] >> 4
            comp_ac = body[2] & 0xF
            scan = data[i + 2 + seglen :]
            break
        i += 2 + seglen
    if h is None or scan is None:
        raise JpegError("missing SOF/SOS")
    q = qtables[comp_q]
    dct = dc_tabs[comp_dc]
    act = ac_tabs[comp_ac]
    bh, bw_n = (h + 7) // 8, (w + 7) // 8
    out = np.zeros((bh * 8, bw_n * 8), np.float64)
    rd = _BitReader(scan)
    prev_dc = 0
    for r in range(bh):
        for c in range(bw_n):
            blk = np.zeros(64, np.int32)
            size = rd.huff(dct)
            prev_dc += _extend(rd.read(size), size)
            blk[0] = prev_dc
            k = 1
            while k < 64:
                rs = rd.huff(act)
                run, size = rs >> 4, rs & 0xF
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += run
                if k > 63:
                    raise JpegError("AC index overflow")
                blk[k] = _extend(rd.read(size), size)
                k += 1
            grid = np.zeros((8, 8), np.int32)
            for kk, (rr, cc) in enumerate(_ZIGZAG):
                grid[rr, cc] = blk[kk]
            coef = grid * q
            out[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] = (
                _DCT.T @ coef @ _DCT + 128.0
            )
    px = np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)
    return px[:, :, None]


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode (n_frames, channels) int16-range samples as a real
    RIFF/WAVE PCM container (the decode_wav_samples round-trip twin)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, ch = samples.shape
    body = samples.astype("<i2").tobytes()
    block = ch * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(body))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * block, block, 16)
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
