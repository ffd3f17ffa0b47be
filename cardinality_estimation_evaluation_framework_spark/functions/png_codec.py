"""Pure-stdlib PNG codec (zlib + struct) — activates the REAL image-decode
path of the multimodal operators in environments without PIL.

Decoder: non-interlaced 8-bit greyscale / grey+alpha / RGB / RGBA PNGs
(the overwhelming share of ML training corpora after normalization), all
five scanline filters (None/Sub/Up/Average/Paeth) per the PNG spec
(RFC 2083 / ISO 15948 §9). Multiple IDAT chunks are concatenated per spec.
Encoder: minimal filter-0 writer used for deterministic test fixtures and
synthetic media tables.

This is a clean implementation from the published spec — not a port of
any imaging library. PIL remains the preferred decoder when importable
(it covers palette/16-bit/interlaced and non-PNG formats); the operators
fall back to this codec for PNG payloads so the real-decode seam is
exercised end-to-end even on codec-less cluster images.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(payload: bytes | None) -> bool:
    return bool(payload) and payload[:8] == PNG_MAGIC


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over one scanline (spec §9.4)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(payload: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array.

    Raises ValueError for non-PNG payloads or unsupported variants
    (palette, 16-bit, interlaced) so callers can fall through to another
    decoder or the documented seam error.
    """
    if not is_png(payload):
        raise ValueError("not a PNG payload (bad magic)")
    pos, idat, ihdr = 8, [], None
    try:
        while pos + 8 <= len(payload):
            (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + length]
            pos += 12 + length  # length + type + data + crc
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
    except (struct.error, zlib.error) as e:  # corrupt chunk framing
        raise ValueError(f"corrupt PNG structure: {e}") from e
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={color} "
            f"interlace={interlace}); 8-bit non-interlaced G/GA/RGB/RGBA only")
    ch = _CHANNELS[color]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG pixel stream: {e}") from e
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    zero_line = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f, cur = int(filters[y]), lines[y].copy()
        prior = out[y - 1] if y else zero_line
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub: left-to-right running sum per channel offset
            for x in range(stride):
                cur[x] = (int(cur[x]) + (int(cur[x - ch]) if x >= ch else 0)) & 0xFF
            out[y] = cur
        elif f == 2:  # Up
            out[y] = cur + prior  # uint8 wraps, per spec mod-256
        elif f == 3:  # Average
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + (left + int(prior[x])) // 2) & 0xFF
            out[y] = cur
        elif f == 4:  # Paeth
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                up_left = int(prior[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + int(_paeth(
                    np.uint8(left), prior[x], np.uint8(up_left)))) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"bad PNG filter byte {f} on line {y}")
    return out.reshape(height, width, ch)


def png_encode(arr: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 array -> PNG bytes (filter 0, one IDAT)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scanlines = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines))
            + chunk(b"IEND", b""))


def to_grayscale(arr: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 -> (H, W) float64 luma (ITU-R 601-2, the same
    weights PIL's convert("L") documents); alpha is ignored."""
    a = arr.astype(np.float64)
    if arr.shape[2] == 1:
        return a[:, :, 0]
    if arr.shape[2] == 2:  # grey + alpha
        return a[:, :, 0]
    return a[:, :, 0] * 0.299 + a[:, :, 1] * 0.587 + a[:, :, 2] * 0.114


def _resize_rows(a: np.ndarray, out_n: int) -> np.ndarray:
    """Resize axis 0 of a 2-D array to out_n rows. Downsampling bins by
    floor(i * out / in) and block-means (exact, every bin owns >= 1 input
    row because the floor map is monotone surjective when out <= in);
    upsampling gathers by floor(j * in / out) (nearest-neighbor) so every
    output row carries a real input row — never a zero fill."""
    n = a.shape[0]
    if n == 0:
        return np.zeros((out_n, a.shape[1]))
    if out_n >= n:
        return a[(np.arange(out_n) * n) // out_n].astype(np.float64, copy=True)
    bins = (np.arange(n) * out_n) // n
    sums = np.zeros((out_n, a.shape[1]))
    np.add.at(sums, bins, a)
    cnt = np.bincount(bins, minlength=out_n)[:, None]
    return sums / cnt


def block_mean_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-mean resize of a 2-D array to (out_h, out_w):
    separable (rows then columns); each direction block-means when
    shrinking and nearest-neighbor-gathers when growing, so every output
    cell averages at least one real input pixel (no zero-filled bins for
    inputs smaller than the target — ADVICE r4)."""
    rows = _resize_rows(gray.astype(np.float64), out_h)
    return _resize_rows(rows.T, out_w).T
