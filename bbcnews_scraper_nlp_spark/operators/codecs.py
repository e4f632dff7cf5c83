"""Real pure-Python media codecs for the multimodal pipeline.

Round 7 closes the "codec decode is stubbed" residual for the two
formats the standard library can honestly support: PNG (zlib inflate
+ full scanline unfiltering, every filter type) and WAV (PCM sample
extraction). No image/audio library is required — only ``zlib``,
``struct`` and numpy, all baked into the container.

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

What remains a declared slot (``NotImplementedError``): Adam7
interlaced PNG, bit depths other than 8, JPEG/GIF pixel decode, and
compressed audio — formats whose decoders need real codec libraries.

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
