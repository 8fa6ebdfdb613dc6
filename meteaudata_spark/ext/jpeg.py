"""Baseline JPEG (JFIF) codec in pure numpy + stdlib — no imaging
libraries.

Scope: sequential baseline DCT, 8-bit, YCbCr 4:4:4 (no chroma
subsampling), standard Annex-K quantization and huffman tables on the
encode side; the decoder additionally handles arbitrary quant/huffman
tables from the stream, restart markers, and 4:2:0 / 4:2:2 chroma
upsampling, so externally-produced baseline JPEGs decode too.
Progressive, arithmetic-coded, and 12-bit variants raise ValueError.

This closes the "JPEG decode needs external libs" gap for the
multimodal pipeline: the byte path (entropy decode → dequantize →
IDCT → upsample → color convert) is executed for real inside the
Arrow-batched executors, exactly like the PPM/PNG/WAV codecs.

JPEG is lossy, so unlike PPM/PNG there is no exact digest-derived SQL
oracle; the contract is round-trip PSNR and exact re-decode
determinism (encode→decode→encode→decode is a fixed point of integer
math), both pinned in tests/test_jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------
# Annex K tables (ITU-T T.81) — the interchange defaults
# ---------------------------------------------------------------------
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# zig-zag scan order: ZIGZAG[i] = linear index into the 8x8 block of
# the i-th zig-zag coefficient
_z = np.arange(64).reshape(8, 8)
_idx = []
for s in range(15):
    d = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
    _idx += [(y, x) for (x, y) in (d if s % 2 == 0 else d[::-1])]
ZIGZAG = np.array([_z[y][x] for (y, x) in _idx], dtype=np.int64)
del _z, _idx

# standard huffman tables: (bits[1..16] counts, values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)

# 8-point DCT-II basis matrix (orthonormal); DCT = C @ block @ C.T
_k = np.arange(8)
_C = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0)
_C[0, :] = np.sqrt(1.0 / 8.0)
del _k


def _build_code_table(bits, values):
    """(bits, values) → {symbol: (code, length)} per T.81 Annex C."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _build_decode_table(bits, values):
    """(bits, values) → {(length, code): symbol} for the decoder."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[i]
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{marker:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG stream")

    def align(self) -> None:
        self.nbits = 0


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits to a signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v: int):
    """Signed value → (size, magnitude-bit pattern)."""
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


# ---------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------
def _scale_quant(q: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(bw, block, q, dc_tab, ac_tab, pred_dc):
    """DCT → quantize → zig-zag → huffman one 8×8 block; returns the
    new DC predictor."""
    dct = _C @ block @ _C.T
    coef = np.round(dct / q).astype(np.int64)
    zz = coef.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred_dc
    size, mag = _magnitude(diff) if diff else (0, 0)
    code, length = dc_tab[size]
    bw.write(code, length)
    if size:
        bw.write(mag, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            code, length = ac_tab[0x00]  # EOB
            bw.write(code, length)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, mag = _magnitude(v)
        code, length = ac_tab[(run << 4) | size]
        bw.write(code, length)
        bw.write(mag, size)
        run = 0
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode ``(h, w, 3)`` uint8 RGB as a baseline JFIF JPEG
    (standard tables scaled by ``quality``; 4:4:4 by default,
    ``subsample=True`` writes 4:2:0 with 2×2-averaged chroma;
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every N MCUs — the independently-decodable stripes a parallel
    decoder splits on)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)

    # RGB → YCbCr (JFIF, full range)
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2]
    cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2]

    hs = vs = 2 if subsample else 1  # luma sampling factors
    mcu = 8 * hs
    ph, pw = -h % mcu, -w % mcu
    y, cb, cr = (
        np.pad(p, ((0, ph), (0, pw)), mode="edge") for p in (y, cb, cr)
    )
    if subsample:
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
    y, cb, cr = y - 128.0, cb - 128.0, cr - 128.0

    dc_l = _build_code_table(*_DC_LUMA)
    ac_l = _build_code_table(*_AC_LUMA)
    dc_c = _build_code_table(*_DC_CHROMA)
    ac_c = _build_code_table(*_AC_CHROMA)

    bw = _BitWriter()
    pred = [0, 0, 0]
    scan_parts: list[bytes] = []
    mcu_count = 0
    rst = 0
    for my in range(0, y.shape[0], mcu):
        for mx in range(0, y.shape[1], mcu):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                scan_parts.append(bw.flush())
                scan_parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                bw = _BitWriter()
                pred = [0, 0, 0]
            mcu_count += 1
            for sy in range(vs):
                for sx in range(hs):
                    by, bx = my + 8 * sy, mx + 8 * sx
                    pred[0] = _encode_block(
                        bw, y[by : by + 8, bx : bx + 8], ql, dc_l, ac_l, pred[0]
                    )
            cy, cx = my // vs, mx // hs
            pred[1] = _encode_block(
                bw, cb[cy : cy + 8, cx : cx + 8], qc, dc_c, ac_c, pred[1]
            )
            pred[2] = _encode_block(
                bw, cr[cy : cy + 8, cx : cx + 8], qc, dc_c, ac_c, pred[2]
            )
    scan_parts.append(bw.flush())
    scan = b"".join(scan_parts)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(int(x) for x in q.reshape(-1)[ZIGZAG]))

    def dht(cls: int, tid: int, table) -> bytes:
        bits, values = table
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values))

    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    sof = seg(
        0xFFC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3])
        + bytes([1, (hs << 4) | vs, 0])  # Y: id 1, sampling, q-table 0
        + bytes([2, 0x11, 1])  # Cb
        + bytes([3, 0x11, 1]),  # Cr
    )
    sos = seg(
        0xFFDA,
        bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]),
    )
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, ql)
        + dqt(1, qc)
        + dht(0, 0, _DC_LUMA)
        + dht(1, 0, _AC_LUMA)
        + dht(0, 1, _DC_CHROMA)
        + dht(1, 1, _AC_CHROMA)
        + sof
        + dri
        + sos
        + scan
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------
def _parse_jpeg_headers(payload: bytes) -> dict:
    """Shared marker-segment walk for both decoders: quant tables,
    huffman tables (decode dict + raw (bits, values) for the LUT
    path), frame/scan layout, restart interval, scan offset."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos, end = 2, len(payload)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    hraw: dict[tuple[int, int], tuple[list, list]] = {}
    comps = None  # list of (comp_id, hs, vs, qid)
    h = w = None
    restart_interval = 0
    scan_comps = None
    scan_start = None

    while pos + 4 <= end:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        data = payload[pos + 4 : pos + 2 + seglen]
        if len(data) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(data):
                pq, tid = data[p] >> 4, data[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(data[p + 1 : p + 65], dtype=np.uint8)
                qtables[tid] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(data):
                cls, tid = data[p] >> 4, data[p] & 0x0F
                bits = list(data[p + 1 : p + 17])
                n = sum(bits)
                if len(bits) < 16 or p + 17 + n > len(data):
                    raise ValueError("truncated DHT segment")
                values = list(data[p + 17 : p + 17 + n])
                htables[(cls, tid)] = _build_decode_table(bits, values)
                hraw[(cls, tid)] = (bits, values)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if data[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack(">HH", data[1:5])
            ncomp = data[5]
            comps = []
            for i in range(ncomp):
                cid = data[6 + 3 * i]
                samp = data[7 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, data[8 + 3 * i]))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            ns = data[0]
            scan_comps = []
            for i in range(ns):
                cid, tabs = data[1 + 2 * i], data[2 + 2 * i]
                scan_comps.append((cid, tabs >> 4, tabs & 0x0F))
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen

    if comps is None or scan_comps is None or h is None:
        raise ValueError("missing SOF/SOS segment")
    if len(comps) not in (1, 3):
        raise ValueError("only 1- or 3-component JPEG supported")
    return {
        "qtables": qtables,
        "htables": htables,
        "hraw": hraw,
        "comps": comps,
        "h": h,
        "w": w,
        "restart_interval": restart_interval,
        "scan_comps": scan_comps,
        "scan_start": scan_start,
    }


def _planes_to_rgb(full: list, n_comps: int) -> np.ndarray:
    """Shared tail: upsampled (level-shifted) planes → uint8 RGB."""
    if n_comps == 1:
        yv = np.clip(full[0], 0, 255)
        return np.round(np.stack([yv] * 3, axis=-1)).astype(np.uint8)
    yv, cb, cr = full
    r = yv + 1.402 * (cr - 128.0)
    g = yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = yv + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.round(np.clip(rgb, 0, 255)).astype(np.uint8)


def _decode_jpeg_reference(payload: bytes) -> np.ndarray:
    """The per-bit oracle decoder (T.81 F.2 followed literally): the
    ground truth the vectorized path is differential-tested against.
    Fine for metadata-scale sampling; ~10× slower than
    ``_decode_jpeg_lut`` on real assets."""
    hd = _parse_jpeg_headers(payload)
    qtables, htables = hd["qtables"], hd["htables"]
    comps, h, w = hd["comps"], hd["h"], hd["w"]
    restart_interval = hd["restart_interval"]
    scan_comps, scan_start = hd["scan_comps"], hd["scan_start"]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    comp_by_id = {c[0]: c for c in comps}
    planes = {
        cid: np.zeros(
            (mcus_y * 8 * vs, mcus_x * 8 * hs), dtype=np.float64
        )
        for cid, hs, vs, _ in comps
    }

    br = _BitReader(payload[scan_start:])
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align()
                # skip RSTn marker
                while br.pos + 1 < len(br.data) and br.data[br.pos] == 0xFF \
                        and 0xD0 <= br.data[br.pos + 1] <= 0xD7:
                    br.pos += 2
                pred = {cid: 0 for cid in pred}
            for cid, dc_tid, ac_tid in scan_comps:
                _, hs, vs, qid = comp_by_id[cid]
                dc_tab = htables.get((0, dc_tid))
                ac_tab = htables.get((1, ac_tid))
                q = qtables.get(qid)
                if dc_tab is None or ac_tab is None or q is None:
                    raise ValueError("scan references undefined table")
                for sub_y in range(vs):
                    for sub_x in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        size = br.read_symbol(dc_tab)
                        diff = _extend(br.read_bits(size), size) if size else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        i = 1
                        while i < 64:
                            rs = br.read_symbol(ac_tab)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:
                                    i += 16  # ZRL
                                    continue
                                break  # EOB
                            i += run
                            if i > 63:
                                raise ValueError("AC run overflows block")
                            zz[i] = _extend(br.read_bits(size), size)
                            i += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz
                        block = _C.T @ (coef.reshape(8, 8) * q) @ _C
                        py = (my * vs + sub_y) * 8
                        px = (mx * hs + sub_x) * 8
                        planes[cid][py : py + 8, px : px + 8] = block
            mcu_count += 1

    # upsample each component to full resolution and crop
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w] + 128.0)
    return _planes_to_rgb(full, len(comps))


_POW2_16 = (1 << np.arange(15, -1, -1, dtype=np.int64))


def _build_lut(bits, values):
    """Canonical huffman table → full 16-bit-window lookup arrays
    (symbol, code length); length 0 marks an invalid prefix.  Every
    symbol decode becomes two list indexings instead of a per-bit
    walk.  Memoized on the table content — the 2×65536 ``tolist`` is
    the dominant per-image cost for small assets, and real corpora
    reuse a handful of (usually the Annex-K) tables across millions of
    images."""
    return _build_lut_cached(tuple(bits), tuple(values))


from functools import lru_cache  # noqa: E402  (module-scope helper)


@lru_cache(maxsize=64)
def _build_lut_cached(bits: tuple, values: tuple):
    sym = np.zeros(65536, dtype=np.int16)
    ln = np.zeros(65536, dtype=np.uint8)
    code, i = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            span = 1 << (16 - length)
            sym[base : base + span] = values[i]
            ln[base : base + span] = length
            code += 1
            i += 1
        code <<= 1
    return sym.tolist(), ln.tolist()


def _entropy_segments(raw: np.ndarray) -> list[np.ndarray]:
    """Scan byte stream → per-restart-interval unstuffed byte arrays:
    0xFF00 → literal 0xFF, RSTn → segment boundary, anything else
    (EOI or the next header marker) ends the scan."""
    segments: list[np.ndarray] = []
    seg_start = 0
    drops: list[int] = []
    end = len(raw)
    terminated = False
    ff_positions = np.nonzero(raw == 0xFF)[0]
    for i in map(int, ff_positions):
        if i < seg_start:
            continue  # consumed as part of a previous RST marker
        if i + 1 >= len(raw):
            end = i
            break
        nxt = int(raw[i + 1])
        if nxt == 0x00:
            drops.append(i + 1)  # stuffed zero after literal 0xFF
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            seg = np.delete(
                raw[seg_start:i], [d - seg_start for d in drops]
            )
            segments.append(seg)
            drops = []
            seg_start = i + 2
        else:
            end = i
            terminated = True
            break
    else:
        end = len(raw)
    if not terminated:
        # the spec requires the scan to end at a marker (EOI or the
        # next header); running off the buffer means the stream was
        # cut — and a byte-truncated Huffman stream can otherwise
        # decode "successfully" to garbage when the stray tail bits
        # happen to form valid codes.
        raise ValueError("truncated JPEG entropy stream (no terminating marker)")
    seg = np.delete(raw[seg_start:end], [d - seg_start for d in drops])
    segments.append(seg)
    return segments


def _decode_jpeg_lut(payload: bytes) -> np.ndarray:
    """Vectorized twin of ``_decode_jpeg_reference`` (differential-
    tested byte-identical): the accelerated path when no native
    decoder is importable.

    Three numpy passes replace the per-bit Python loop:
      1. the entropy stream is unstuffed and unpacked to a bit array
         ONCE, with a sliding 16-bit window precomputed for every bit
         position — each huffman symbol then decodes via one full-width
         table lookup (``_build_lut``) instead of a bit-at-a-time tree
         walk, and magnitude bits come from the same window by shift;
      2. coefficients accumulate into one (n_blocks, 64) matrix —
         de-zigzag, dequantize, and the 2-D IDCT run as BATCHED 8×8
         matmuls over all blocks at once;
      3. plane scatter/upsample/color-convert reuse the shared tail.
    """
    hd = _parse_jpeg_headers(payload)
    qtables = hd["qtables"]
    comps, h, w = hd["comps"], hd["h"], hd["w"]
    restart_interval = hd["restart_interval"]
    scan_comps, scan_start = hd["scan_comps"], hd["scan_start"]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    comp_by_id = {c[0]: c for c in comps}
    # per-MCU block template (scan order), and per-block LUTs
    luts: dict[tuple[int, int], tuple[list, list]] = {}
    for key, (bits, values) in hd["hraw"].items():
        luts[key] = _build_lut(bits, values)
    template = []  # (cid, sym_dc, ln_dc, sym_ac, ln_ac) — LUTs hoisted
    q_ids = []
    for cid, dc_tid, ac_tid in scan_comps:
        _, hs, vs, qid = comp_by_id[cid]
        if (0, dc_tid) not in luts or (1, ac_tid) not in luts \
                or qid not in qtables:
            raise ValueError("scan references undefined table")
        sym_dc, ln_dc = luts[(0, dc_tid)]
        sym_ac, ln_ac = luts[(1, ac_tid)]
        for _ in range(hs * vs):
            template.append((cid, sym_dc, ln_dc, sym_ac, ln_ac))
            q_ids.append(qid)
    bpm = len(template)

    coefs = np.zeros((n_mcus * bpm, 64), dtype=np.int64)
    # coefficients accumulate in plain lists (ndarray item-writes are
    # ~10× a list append) and scatter in ONE fancy-index assignment
    b_idx: list[int] = []
    c_idx: list[int] = []
    c_val: list[int] = []
    segments = _entropy_segments(
        np.frombuffer(payload, np.uint8)[scan_start:]
    )
    mcu_index = 0
    bi = 0
    for seg in segments:
        if mcu_index >= n_mcus:
            break
        bits = np.unpackbits(seg)
        padded = np.concatenate([bits, np.zeros(16, np.uint8)])
        win = np.lib.stride_tricks.sliding_window_view(padded, 16)
        vals = (win[: len(bits)] @ _POW2_16).tolist()
        n_bits = len(vals)
        pos = 0
        pred = {cid: 0 for cid, *_ in comps}
        seg_mcus = restart_interval or n_mcus
        for _ in range(min(seg_mcus, n_mcus - mcu_index)):
            for cid, sym_dc, ln_dc, sym_ac, ln_ac in template:
                if pos >= n_bits:
                    raise ValueError("truncated JPEG entropy stream")
                v = vals[pos]
                length = ln_dc[v]
                if length == 0:
                    raise ValueError("invalid huffman code in JPEG stream")
                size = sym_dc[v]
                pos += length
                if size:
                    if pos + size > n_bits:
                        raise ValueError("truncated JPEG entropy stream")
                    m = vals[pos] >> (16 - size)
                    pos += size
                    pred[cid] += (
                        m if m >= (1 << (size - 1)) else m - (1 << size) + 1
                    )
                b_idx.append(bi)
                c_idx.append(0)
                c_val.append(pred[cid])
                i = 1
                while i < 64:
                    if pos >= n_bits:
                        raise ValueError("truncated JPEG entropy stream")
                    v = vals[pos]
                    length = ln_ac[v]
                    if length == 0:
                        raise ValueError("invalid huffman code in JPEG stream")
                    rs = sym_ac[v]
                    pos += length
                    run, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if run == 15:
                            i += 16  # ZRL
                            continue
                        break  # EOB
                    i += run
                    if i > 63:
                        raise ValueError("AC run overflows block")
                    if pos + size > n_bits:
                        raise ValueError("truncated JPEG entropy stream")
                    m = vals[pos] >> (16 - size)
                    pos += size
                    b_idx.append(bi)
                    c_idx.append(i)
                    c_val.append(
                        m if m >= (1 << (size - 1)) else m - (1 << size) + 1
                    )
                    i += 1
                bi += 1
            mcu_index += 1
    coefs[b_idx, c_idx] = c_val

    if mcu_index < n_mcus:
        raise ValueError("truncated JPEG entropy stream")

    # batched de-zigzag → dequantize → IDCT (same op order per block
    # as the reference: C.T @ (coef*q) @ C, so results are identical)
    cf = np.zeros((n_mcus * bpm, 64), dtype=np.float64)
    cf[:, ZIGZAG] = coefs
    cf = cf.reshape(n_mcus, bpm, 8, 8)
    q_stack = np.stack(
        [qtables[qid].astype(np.float64) for qid in q_ids]
    )
    blocks = np.matmul(np.matmul(_C.T, cf * q_stack[None]), _C)

    planes = {
        cid: np.zeros((mcus_y * 8 * vs, mcus_x * 8 * hs), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    # scatter: reshape the per-component block grid in one go
    t_off = 0
    for cid, dc_tid, ac_tid in scan_comps:
        _, hs, vs, _ = comp_by_id[cid]
        nb = hs * vs
        sub = blocks[:, t_off : t_off + nb]  # (n_mcus, hs*vs, 8, 8)
        sub = sub.reshape(mcus_y, mcus_x, vs, hs, 8, 8)
        # (my, sub_y, 8row) × (mx, sub_x, 8col)
        plane = sub.transpose(0, 2, 4, 1, 3, 5).reshape(
            mcus_y * vs * 8, mcus_x * hs * 8
        )
        planes[cid][:, :] = plane
        t_off += nb

    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        if hs < hmax or vs < vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w] + 128.0)
    return _planes_to_rgb(full, len(comps))


def _pil_decode(payload: bytes):
    """Native-decoder probe: PIL if importable (not shipped in this
    container; the seam is for real deployments), else None."""
    try:
        import io

        from PIL import Image  # type: ignore
    except Exception:
        return None
    with Image.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"))


def decode_jpeg(payload: bytes, accel: str | None = None) -> np.ndarray:
    """Decode a baseline sequential JFIF JPEG → ``(h, w, 3)`` uint8
    RGB.  Handles stream-defined quant/huffman tables, 4:4:4 / 4:2:2 /
    4:2:0 sampling, and restart markers; progressive or
    arithmetic-coded streams raise ValueError.

    ``accel`` selects the implementation seam:
      * ``None`` (default) — a native decoder when importable (PIL),
        else the vectorized-huffman numpy path (``_decode_jpeg_lut``,
        ~10× the reference's throughput);
      * ``"lut"`` — force the vectorized numpy path;
      * ``"reference"`` — the per-bit T.81 oracle decoder
        (differential ground truth; slow).
    Note a native decoder's IDCT may differ from the numpy paths by
    ±1 LSB — the numpy paths themselves are byte-identical to each
    other (pinned by test)."""
    if accel == "reference":
        return _decode_jpeg_reference(payload)
    if accel == "lut":
        return _decode_jpeg_lut(payload)
    if accel not in (None, "auto"):
        raise ValueError(f"unknown accel mode {accel!r}")
    native = _pil_decode(payload) if payload[:2] == b"\xff\xd8" else None
    if native is not None:
        return native
    return _decode_jpeg_lut(payload)
