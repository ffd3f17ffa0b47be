"""Pure-stdlib baseline JPEG codec (ITU-T T.81 / ISO 10918-1) — closes the
last common-real-payload gap in the multimodal decode seam: JPEG is the
dominant image format in crawled corpora, and this environment ships no
imaging library.

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or 3-component
YCbCr with any of the common sampling factors (4:4:4, 4:2:2, 4:2:0),
stream-defined quantization and Huffman tables, restart intervals (DRI /
RSTn), 0xFF00 byte stuffing. Progressive (SOF2), arithmetic coding,
12-bit and hierarchical variants raise ValueError so the operators'
documented seam error applies.

Encoder: minimal baseline writer (grayscale or YCbCr 4:2:0 / 4:4:4,
Annex-K quantization tables scaled by the libjpeg quality curve, Annex-K
Huffman tables, JFIF APP0) used for deterministic test fixtures and
synthetic media tables. Roundtrip fidelity is the usual JPEG lossy
contract; tests pin PSNR bounds plus exact structural behavior.

Clean implementation from the published spec (same provenance rule as
png_codec.py / y4m_codec.py — the reference repo has no media handling;
this operator family is brief-driven). The 2-D DCT runs as two dense
8-point matrix multiplies in numpy; entropy decode is per-payload Python,
acceptable for a per-payload Arrow-batched UDF seam.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Spec constants (T.81 Annex K — published example tables)
# --------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (BITS[1..16], HUFFVAL) per Annex K
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: FDCT X = C x Cᵀ, IDCT x = Cᵀ X C
_C = np.array([
    [np.sqrt((1.0 if k == 0 else 2.0) / 8.0)
     * np.cos((2 * n + 1) * k * np.pi / 16.0) for n in range(8)]
    for k in range(8)
])


def is_jpeg(payload: bytes | None) -> bool:
    return bool(payload) and len(payload) >= 3 and payload[:3] == b"\xff\xd8\xff"


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------

def _build_huff(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman code assignment (T.81 C.2): (length, code)
    -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _inv_huff(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code), for the encoder."""
    return {v: k for k, v in _build_huff(bits, vals).items()}


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker (leaves position on the 0xFF)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Drop partial bits, read a 2-byte marker, return its low byte."""
        self.buf, self.n = 0, 0
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1]
        self.pos += 2
        return m


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    """Signed magnitude extension (T.81 F.2.2.1)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def jpeg_decode(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (height, width, components) uint8 array
    (components = 1 grayscale or 3 RGB).

    Raises ValueError for non-JPEG payloads and unsupported variants
    (progressive, arithmetic, 12-bit) so callers can fall through to the
    documented seam error.
    """
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload (bad magic)")
    data = payload
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) where comps = [(cid, hs, vs, tq)]
    dri = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them rather than parsing one as a length
        while pos + 2 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            # standalone (length-less) markers: TEM, RSTn, stray SOI/EOI
            pos += 2
            continue
        if pos + 4 > len(data):
            # fill-byte skip may have consumed the loop guard's margin: a
            # truncated tail must stay a ValueError, not a struct.error
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                tbl = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = tbl  # stored in zigzag order
                qt[tq] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                huff[(tc, th)] = _build_huff(bits, vals)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid = body[6 + c * 3]
                hv = body[7 + c * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + c * 3]))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0/SOF1) supported")
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tabs = {}
            for c in range(ns):
                cs = body[1 + c * 2]
                td_ta = body[2 + c * 2]
                scan_tabs[cs] = (td_ta >> 4, td_ta & 0x0F)
            return _decode_scan(
                data, pos + 2 + seglen, frame, scan_tabs, qt, huff, dri)
        # APPn / COM / anything else: skip
        pos += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan_tabs, qt, huff, dri) -> np.ndarray:
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("zero-dimension JPEG")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, hs, vs, _tq in comps:
        # the integer-factor upsample below requires divisibility; a legal
        # but exotic combination (e.g. 3:2) must fail cleanly, not with an
        # opaque stack shape error
        if hs == 0 or vs == 0 or hmax % hs or vmax % vs:
            raise ValueError("unsupported sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for (_cid, hs, vs, _tq) in comps:
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8)))
    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_index and mcu_index % dri == 0:
                m = r.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected RSTn at restart interval")
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                td, ta = scan_tabs[cid]
                dc_tab = huff.get((0, td))
                ac_tab = huff.get((1, ta))
                q = qt.get(tq)
                if dc_tab is None or ac_tab is None or q is None:
                    raise ValueError("scan references undefined table")
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _decode_symbol(r, dc_tab)
                        pred[ci] += _extend(r.bits(s), s)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(r, ac_tab)
                            rrrr, ssss = rs >> 4, rs & 0x0F
                            if ssss == 0:
                                if rrrr == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrrr
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(r.bits(ssss), ssss)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz
                        spat = _C.T @ (blk.reshape(8, 8) * q) @ _C + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spat
            mcu_index += 1
    # upsample each component to the full-res grid, crop to (h, w)
    full = []
    for ci, (_cid, hs, vs, _tq) in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = full[0][:, :, None]
    elif len(full) == 3:
        y, cb, cr = full
        rr = y + 1.402 * (cr - 128.0)
        gg = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bb = y + 1.772 * (cb - 128.0)
        out = np.stack([rr, gg, bb], axis=2)
    else:
        raise ValueError(f"{len(full)}-component JPEG unsupported")
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder (fixtures / synthetic media)
# --------------------------------------------------------------------------

def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality curve: 1..100 -> scaled Annex-K table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.out)

    def restart(self, idx: int) -> None:
        """Byte-align and emit RST(idx % 8) — raw marker, not stuffed."""
        if self.n:
            self.write(0x7F, 8 - self.n)
        self.out += bytes([0xFF, 0xD0 + (idx % 8)])


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                  pred: int, dc_inv, ac_inv) -> int:
    coef = _C @ (block - 128.0) @ _C.T
    # zigzag-ordered coefficients: zigzag position i holds flat[ZIGZAG[i]]
    zz = np.rint(coef / q).astype(np.int64).reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred

    def magnitude(v: int) -> tuple[int, int]:
        size = int(v).bit_length() if v > 0 else int(-v).bit_length()
        code = v if v >= 0 else v + (1 << size) - 1
        return size, code

    s, c = magnitude(diff)
    ln, cd = dc_inv[s]
    bw.write(cd, ln)
    if s:
        bw.write(c, s)
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                ln, cd = ac_inv[0x00]  # EOB
                bw.write(cd, ln)
                break
            run += 1
            continue
        while run > 15:
            ln, cd = ac_inv[0xF0]  # ZRL
            bw.write(cd, ln)
            run -= 16
        s, c = magnitude(v)
        ln, cd = ac_inv[(run << 4) | s]
        bw.write(cd, ln)
        bw.write(c, s)
        run = 0
    return int(zz[0])


def _pad_edge(p: np.ndarray, mh: int, mw: int) -> np.ndarray:
    ph = -(-p.shape[0] // mh) * mh
    pw = -(-p.shape[1] // mw) * mw
    return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")


def jpeg_encode(arr: np.ndarray, quality: int = 90,
                subsampling: str = "420",
                restart_interval: int = 0) -> bytes:
    """(H, W) or (H, W, 1|3) uint8 -> baseline JFIF JPEG bytes.

    Color images encode as YCbCr with 4:2:0 (default) or 4:4:4 sampling;
    grayscale as one component. ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every N MCUs (exercises the decoder's
    restart path). Deterministic (pure integer/float math, fixed
    tables)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if h == 0 or w == 0:
        raise ValueError("cannot encode empty image")
    if ch not in (1, 3):
        raise ValueError("jpeg_encode takes 1- or 3-channel arrays")
    if subsampling not in ("420", "444"):
        raise ValueError("subsampling must be '420' or '444'")
    ql = _scaled_quant(QUANT_LUMA.reshape(8, 8), quality)
    qc = _scaled_quant(QUANT_CHROMA.reshape(8, 8), quality)
    f = a.astype(np.float64)
    if ch == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            sampling = [(2, 2), (1, 1), (1, 1)]
            yp = _pad_edge(y, 16, 16)
            # 2x2 block-mean chroma downsample on the padded grid
            cbp = _pad_edge(cb, 16, 16)
            crp = _pad_edge(cr, 16, 16)
            cbp = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            crp = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
            planes = [yp, cbp, crp]
        else:
            sampling = [(1, 1), (1, 1), (1, 1)]
            planes = [_pad_edge(p, 8, 8) for p in (y, cb, cr)]
        qmap = [0, 1, 1]
        tabmap = [0, 1, 1]
    else:
        sampling = [(1, 1)]
        planes = [_pad_edge(f[:, :, 0], 8, 8)]
        qmap = [0]
        tabmap = [0]

    dc_inv = [_inv_huff(DC_LUMA_BITS, DC_LUMA_VALS),
              _inv_huff(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_inv = [_inv_huff(AC_LUMA_BITS, AC_LUMA_VALS),
              _inv_huff(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    qtabs = [ql, qc]

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    bw = _BitWriter()
    pred = [0] * len(planes)
    mcu_index = 0
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.restart(n_rst)
                n_rst += 1
                pred = [0] * len(planes)
            mcu_index += 1
            for ci, p in enumerate(planes):
                hs, vs = sampling[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(
                            bw, blk, qtabs[qmap[ci]], pred[ci],
                            dc_inv[tabmap[ci]], ac_inv[tabmap[ci]])
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq in sorted(set(qmap)):
        zz = qtabs[tq].reshape(64)[ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([tq]) + zz.tobytes())
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hs, vs = sampling[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qmap[ci]])
    out += seg(0xC0, sof)
    huff_defs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS),
                 (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if ncomp == 3:
        huff_defs += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                      (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc_th, bits, vals in huff_defs:
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (tabmap[ci] << 4) | tabmap[ci]])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
