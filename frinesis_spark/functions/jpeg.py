"""Baseline-JPEG codec in stdlib + numpy — the last real-codec notch
this container permits (r13 verdict item 8; PIL/cv2/ffmpeg absent,
verified r11).

Same loud-failure contract as the PNG codec (``functions/png.py``):
anything this codec cannot decode EXACTLY as the spec requires raises
``ValueError`` naming the unsupported field — progressive scans,
12-bit precision, arithmetic coding, restart intervals, truncated
streams. Baseline sequential DCT (SOF0), 8-bit, huffman, interleaved
single-scan only: the format the overwhelming majority of web JPEGs
use, and the one a training-data pipeline must at minimum read.

Public-spec provenance: ITU-T T.81 (the JPEG standard) — marker
layout §B, huffman entropy coding §F.2, the EXTEND sign procedure
F.2.2.1, the Annex K example quantization/huffman tables (K.1, K.3),
quality scaling per the widely published IJG formula. The encoder
emits 4:4:4 JFIF baseline (one block per component per MCU); the
decoder handles arbitrary h/v sampling factors in {1, 2} (so 4:2:0 /
4:2:2 web JPEGs decode too). All math is numpy; entropy coding is
plain Python over fixture-scale inputs.

No reference-repo counterpart: the reference (a Go Kinesis producer)
has no image path at all — this module exists for the multimodal
mandate's decode discipline, not for parity.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K.1 example quantization tables (natural order) ----------
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# --- Annex K.3 example huffman tables: (bits[1..16], values) --------
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Zigzag scan order: _ZIGZAG[k] = (row, col) of the k-th coefficient.
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Orthonormal 8-point DCT-II basis: _DCT_M @ block @ _DCT_M.T is the
# forward transform with the spec's scaling folded in.
_DCT_M = np.array([
    [
        (np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0))
        * np.cos((2 * x + 1) * u * np.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
])


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → tables as-is, 1 worst, 100 lossless-ish."""
    if not 1 <= quality <= 100:
        raise ValueError(f"JPEG quality {quality} outside 1-100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255).astype(np.int32)


def _build_huffman(bits: list[int], vals: list[int]):
    """(value -> (code, length)) encode map and the nested decode map
    {length: {code: value}} from a T.81 (BITS, HUFFVAL) spec."""
    enc: dict[int, tuple[int, int]] = {}
    dec: dict[int, dict[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            dec.setdefault(length, {})[code] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return enc, dec


_ENC_TABLES = {
    ("dc", 0): _build_huffman(_DC_LUMA_BITS, _DC_LUMA_VALS)[0],
    ("ac", 0): _build_huffman(_AC_LUMA_BITS, _AC_LUMA_VALS)[0],
    ("dc", 1): _build_huffman(_DC_CHROMA_BITS, _DC_CHROMA_VALS)[0],
    ("ac", 1): _build_huffman(_AC_CHROMA_BITS, _AC_CHROMA_VALS)[0],
}


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per F.1.2.3
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, low-order bits) of a DC diff / AC coefficient —
    T.81 F.1.2.1.1/F.1.2.2.1 (negative values stored one's-complement)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def jpeg_encode(
    width: int, height: int, rgb: bytes, quality: int = 75
) -> bytes:
    """Encode packed 8-bit RGB to a baseline JFIF JPEG (4:4:4)."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb payload {len(rgb)} bytes != {width}x{height}x3"
        )
    ql = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    img = np.frombuffer(rgb, np.uint8).reshape(height, width, 3)
    ycc = _rgb_to_ycbcr(img.astype(np.float64))
    # Pad to 8×8 blocks by edge replication
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    ycc = np.pad(
        ycc, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge"
    )

    w = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(3):
                tid = 0 if ci == 0 else 1
                block = ycc[by : by + 8, bx : bx + 8, ci] - 128.0
                coef = _DCT_M @ block @ _DCT_M.T
                qt = ql if ci == 0 else qc
                quant = np.round(coef / qt).astype(np.int64)
                zz = quant.ravel()[_ZIGZAG]
                dct = _ENC_TABLES[("dc", tid)]
                act = _ENC_TABLES[("ac", tid)]
                diff = int(zz[0]) - prev_dc[ci]
                prev_dc[ci] = int(zz[0])
                size, bits = _magnitude(diff)
                code, length = dct[size]
                w.write(code, length)
                if size:
                    w.write(bits, size)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = act[0xF0]  # ZRL
                        w.write(code, length)
                        run -= 16
                    size, bits = _magnitude(v)
                    code, length = act[(run << 4) | size]
                    w.write(code, length)
                    w.write(bits, size)
                    run = 0
                if run:
                    code, length = act[0x00]  # EOB
                    w.write(code, length)
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(
            0xFFDB, bytes([tid]) + bytes(int(x) for x in q.ravel()[_ZIGZAG])
        )

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        )

    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x11, 0])  # Y: h1v1, qtable 0
        + bytes([2, 0x11, 1])  # Cb
        + bytes([3, 0x11, 1]),  # Cr
    )
    sos = seg(
        0xFFDA,
        bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]),
    )
    app0 = seg(0xFFE0, b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0]))
    return (
        b"\xff\xd8"  # SOI
        + app0
        + dqt(0, ql)
        + dqt(1, qc)
        + sof
        + dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
        + sos
        + scan
        + b"\xff\xd9"  # EOI
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError(
                "truncated JPEG: entropy stream ended mid-symbol"
            )
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG: dangling 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError(
                    "JPEG restart marker in scan is unsupported "
                    "(encoder never emits DRI; see module contract)"
                )
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict[int, dict[int, int]]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            row = table.get(length)
            if row is not None and code in row:
                return row[code]
        raise ValueError("invalid JPEG huffman code (corrupt stream)")


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map low-order bits back to a signed value."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def jpeg_decode(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline JPEG to (width, height, packed RGB bytes).

    Raises ``ValueError`` on anything non-baseline — progressive
    (SOF2), extended sequential (SOF1), arithmetic coding, 12-bit
    samples, restart intervals, sampling factors > 2, truncation —
    and on the two silent-wrong-output shapes the r14 ADVICE flagged:
    a single-component scan of a subsampled component (T.81 A.2 makes
    ns=1 scans non-interleaved raster order, not the MCU-cluster
    order this decoder walks) and Adobe/component-ID-tagged RGB color
    space (applying the YCbCr inverse would decode wrong colors)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI marker")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    comps: list[dict] = []
    scan_map: list[tuple[int, int]] = []
    scan_start = None
    adobe_transform = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xFFD9:
            raise ValueError("JPEG has no scan before EOI")
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        if len(body) != length - 2:
            raise ValueError("truncated JPEG: segment overruns the data")
        if marker == 0xFFDB:  # DQT
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = np.frombuffer(body[b + 1 : b + 65], np.uint8)
                if len(zz) != 64:
                    raise ValueError("truncated DQT segment")
                q = np.zeros(64, np.int32)
                q[_ZIGZAG] = zz
                qtables[tid] = q.reshape(8, 8)
                b += 65
        elif marker == 0xFFC4:  # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT segment")
                htables[(cls, tid)] = _build_huffman(bits, vals)[1]
                b += 17 + n
        elif marker == 0xFFC0:  # SOF0 baseline
            prec, h, w_, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG samples unsupported")
            comps = []
            for i in range(nc):
                cid, hv, qid = body[6 + 3 * i : 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0xF
                if ch not in (1, 2) or cv not in (1, 2):
                    raise ValueError(
                        f"sampling factor {ch}x{cv} unsupported (1-2 only)"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "q": qid})
            frame = (w_, h)
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            kind = "progressive" if marker == 0xFFC2 else "non-baseline"
            raise ValueError(
                f"{kind} JPEG (SOF marker 0x{marker:04X}) unsupported — "
                "baseline sequential (SOF0) only"
            )
        elif marker == 0xFFDD:  # DRI
            (interval,) = struct.unpack(">H", body[:2])
            if interval:
                raise ValueError("JPEG restart intervals unsupported")
        elif marker == 0xFFEE and body[:5] == b"Adobe":  # APP14
            # Byte 11 of the Adobe segment is the color transform:
            # 1 = YCbCr, 2 = YCCK, 0 = none (RGB or CMYK by channel
            # count) — transform 0 on a 3-component frame means the
            # scan data IS RGB and the YCbCr inverse must not run.
            if len(body) >= 12:
                adobe_transform = body[11]
        elif marker == 0xFFDA:  # SOS
            ns = body[0]
            scan_map = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan_map.append((cs, tt))
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    if frame is None or scan_start is None:
        raise ValueError("truncated JPEG: missing SOF0 or SOS")
    width, height = frame
    if len(scan_map) != len(comps):
        raise ValueError("scan component count != frame component count")
    # r14 ADVICE: T.81 A.2 — a single-component scan is NON-interleaved
    # (raster order over the component's own ceil(w/8)×ceil(h/8)
    # blocks, MCU = one data unit). This decoder walks interleaved
    # 2×2-cluster MCU order, which for a subsampled ns=1 component
    # silently scrambles blocks whenever the block counts happen to
    # match; refuse loudly instead of decoding wrong.
    if len(scan_map) == 1 and (comps[0]["h"] > 1 or comps[0]["v"] > 1):
        raise ValueError(
            f"single-component scan of a {comps[0]['h']}x{comps[0]['v']}-"
            "sampled component decodes non-interleaved (T.81 A.2) — "
            "unsupported by this interleaved baseline decoder"
        )
    # r14 ADVICE: 3-component frames are only YCbCr when nothing says
    # otherwise — Adobe APP14 transform=0 or R/G/B component IDs mark
    # the scan data as stored RGB, and running the YCbCr inverse would
    # silently decode wrong colors.
    if len(comps) == 3:
        ids = tuple(c["id"] for c in comps)
        if adobe_transform == 0 or ids == (ord("R"), ord("G"), ord("B")):
            raise ValueError(
                "RGB-colorspace JPEG (Adobe APP14 transform=0 or R/G/B "
                "component IDs) unsupported — this decoder applies the "
                "YCbCr inverse only to YCbCr scan data"
            )

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # Trim the trailing EOI if present; _BitReader raises on any other
    # in-scan marker.
    scan_bytes = data[scan_start:]
    eoi = scan_bytes.rfind(b"\xff\xd9")
    if eoi != -1:
        scan_bytes = scan_bytes[:eoi]
    r = _BitReader(scan_bytes)

    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        )
    prev_dc = [0] * len(comps)
    by_id = {c["id"]: (i, c) for i, c in enumerate(comps)}
    order = []
    for cs, tt in scan_map:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        i, c = by_id[cs]
        order.append((i, c, tt >> 4, tt & 0xF))

    for my in range(mcuy):
        for mx in range(mcux):
            for i, c, dct_id, act_id in order:
                dct = htables.get((0, dct_id))
                act = htables.get((1, act_id))
                if dct is None or act is None:
                    raise ValueError(
                        "scan references an undefined huffman table"
                    )
                qt = qtables.get(c["q"])
                if qt is None:
                    raise ValueError(
                        "frame references an undefined quantization table"
                    )
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        size = r.huff(dct)
                        diff = _extend(r.bits(size), size) if size else 0
                        prev_dc[i] += diff
                        zz = np.zeros(64, np.int64)
                        zz[0] = prev_dc[i]
                        k = 1
                        while k < 64:
                            rs = r.huff(act)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC run overflows the block"
                                )
                            zz[k] = _extend(r.bits(size), size)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[_ZIGZAG] = zz * qt.ravel()[_ZIGZAG]
                        block = (
                            _DCT_M.T @ coef.reshape(8, 8) @ _DCT_M + 128.0
                        )
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[i][y0 : y0 + 8, x0 : x0 + 8] = block

    # Upsample each plane to full resolution and crop
    full = []
    for i, c in enumerate(comps):
        p = planes[i]
        p = np.repeat(np.repeat(p, vmax // c["v"], 0), hmax // c["h"], 1)
        full.append(p[:height, :width])
    if len(comps) == 1:
        y = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        rgb = np.stack([y, y, y], axis=-1)
    elif len(comps) == 3:
        ycc = np.stack(full, axis=-1)
        rgb = np.clip(np.round(_ycbcr_to_rgb(ycc)), 0, 255).astype(np.uint8)
    else:
        raise ValueError(f"{len(comps)}-component JPEG unsupported")
    return width, height, rgb.tobytes()
