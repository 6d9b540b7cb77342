"""Real stdlib baseline JPEG codec — ITU-T T.81 sequential DCT, Huffman.

Same policy as the xlsx/Avro/BMP/WAV/GIF/PNG codecs (reference repo has no
image handling at all — EXT tier per SURVEY.md §2.11 L7): the container has
no PIL, so the honest move is a REAL spec-derived codec for the common
subset, with LOUD rejection of everything else — never a silent stub.

Supported: baseline DCT (SOF0, and SOF1 which shares the baseline decode
path), 8-bit precision, grayscale and 3-component YCbCr at 4:4:4 or 4:2:0,
the Annex-K quantization and Huffman tables on encode (any spec-legal
tables on decode), restart intervals (DRI + RST0-7), multi-table DQT/DHT
segments, APPn/COM skip. Rejected loudly: progressive (SOF2) and every
other non-baseline frame type, arithmetic coding (DAC/SOF9-11), 12-bit
precision, 16-bit quantization tables, 4-component (CMYK) scans.

Encoder exists so tests and the m5 query can synthesize real JPEG bytes
deterministically; decoder is the production path. Exactness contract used
by the m5 oracle: an image whose 8x8 blocks are constant EVEN gray values
survives the round-trip bit-exactly — a constant block has only a DC
coefficient 8*(v-128), and with the Annex-K DC quantum of 16 an even v
makes quantization lossless; the entropy stage is lossless by construction.

Scale note: decode cost is per-file Python (bit-serial Huffman); at
deployment libjpeg-turbo replaces this hot loop behind the same
``decode_image`` dispatch. The Spark contract — binary column in,
Arrow-batched feature rows out — is identical either way (the m5 query
pins it), and EOB-heavy images (the common web thumbnail) decode in a few
symbols per block.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# --- Annex K.1/K.2 quantization tables (row-major 8x8) ---------------------
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# --- zigzag scan order (T.81 figure 5): zigzag position -> row-major index -
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# --- Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL) ------------------
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
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
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
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

# Orthonormal 8-point DCT-II matrix; T.81's (1/4)C(u)C(v) double-sum is the
# same transform, so fdct/idct below match the spec's scaling exactly.
_C = np.array(
    [
        [
            np.sqrt((1.0 if k == 0 else 2.0) / 8.0)
            * np.cos((2 * j + 1) * k * np.pi / 16.0)
            for j in range(8)
        ]
        for k in range(8)
    ]
)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length).

    Memoized on the table content — encode/decode call this per component
    per file, and the Annex-K tables never change."""
    return _build_huffman_codes_cached(tuple(bits), tuple(vals))


@functools.lru_cache(maxsize=64)
def _build_huffman_codes_cached(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> dict[int, tuple[int, int]]:
    if len(bits) != 16 or sum(bits) != len(vals):
        raise ValueError("corrupt JPEG: Huffman BITS/HUFFVAL count mismatch")
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
        if code > (1 << (length + 1)):
            raise ValueError("corrupt JPEG: over-subscribed Huffman table")
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return _decode_table_cached(tuple(bits), tuple(vals))


@functools.lru_cache(maxsize=64)
def _decode_table_cached(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> dict[tuple[int, int], int]:
    # keyed (length, code) to match _BitReader.read_symbol's probe order
    return {(ln, code): sym for sym, (code, ln) in build_huffman_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self._nbits -= 8
            self._acc &= (1 << self._nbits) - 1
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Bit-serial reader over one entropy-coded segment (stuffing removed)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte_i = self.pos >> 3
        if byte_i >= len(self.data):
            raise ValueError("corrupt JPEG: entropy data exhausted mid-block")
        bit = (self.data[byte_i] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: invalid Huffman code (>16 bits)")


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - ((1 << cat) - 1)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def _pad_to(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % bh
    pw = (-w) % bw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _encode_block(
    coefq: np.ndarray,
    dc_pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    bw: _BitWriter,
) -> int:
    zz = coefq.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - dc_pred
    cat = _category(diff)
    code, length = dc_codes[cat]
    bw.write(code, length)
    if cat:
        bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            code, length = ac_codes[0x00]  # EOB
            bw.write(code, length)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        cat = _category(v)
        code, length = ac_codes[(run << 4) | cat]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    return dc


def encode_jpeg(
    pixels: np.ndarray, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode a uint8 image (h,w) grayscale or (h,w,3) RGB to baseline JPEG.

    Annex-K quantization + Huffman tables; ``subsampling`` is '444' or
    '420' (ignored for grayscale); ``restart_interval`` > 0 emits DRI and
    RST0-7 markers every that many MCUs.
    """
    pixels = np.asarray(pixels)
    if pixels.dtype != np.uint8 or pixels.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects a uint8 (h,w) or (h,w,3) array")
    gray = pixels.ndim == 2
    if not gray and pixels.shape[2] != 3:
        raise ValueError(f"encode_jpeg: unsupported channel count {pixels.shape[2]}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"encode_jpeg: unsupported subsampling {subsampling!r}")
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")

    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
        hsel = [0]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        if subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            planes = [ycc[..., 0]]
            for c in (1, 2):
                p = _pad_to(ycc[..., c], 2, 2)
                planes.append((p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0)
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
            planes = [ycc[..., c] for c in range(3)]
        qsel = [0, 1, 1]
        hsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    quants = [QUANT_LUMA, QUANT_CHROMA]
    dc_codes = [build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                build_huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                build_huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    # Pad each component plane to whole MCUs, pre-quantize all blocks.
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_blocks = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        # pad to full-MCU coverage: (8*mcuy*vi) x (8*mcux*hi) exactly
        plane = _pad_to(plane, 8 * mcuy * vi, 8 * mcux * hi)
        q = quants[qsel[ci]].astype(np.float64)
        nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = np.empty((nby, nbx, 8, 8), dtype=np.int32)
        shifted = plane - 128.0
        for by in range(nby):
            for bx in range(nbx):
                coef = _fdct(shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8])
                blocks[by, bx] = np.round(coef / q).astype(np.int32)
        comp_blocks.append(blocks)

    # Entropy-coded scan: MCU-interleaved, restart-aware.
    bw = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for ci in range(len(planes)):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        preds[ci] = _encode_block(
                            comp_blocks[ci][my * vi + by, mx * hi + bx],
                            preds[ci],
                            dc_codes[hsel[ci]],
                            ac_codes[hsel[ci]],
                            bw,
                        )
            mcu_i += 1
    bw.flush()

    # --- marker stream ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(quants[: (1 if gray else 2)]):
        zz = q.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    for tc, specs in ((0, (DC_LUMA_BITS, DC_LUMA_VALS, DC_CHROMA_BITS, DC_CHROMA_VALS)),
                      (1, (AC_LUMA_BITS, AC_LUMA_VALS, AC_CHROMA_BITS, AC_CHROMA_VALS))):
        for th in range(1 if gray else 2):
            bits, vals = specs[2 * th], specs[2 * th + 1]
            out += (b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
                    + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, (hsel[ci] << 4) | hsel[ci]])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0 (baseline)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_NON_BASELINE_SOF = {
    0xC2: "progressive DCT (SOF2)",
    0xC3: "lossless sequential (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to uint8 (h,w) grayscale or (h,w,3) RGB."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI marker")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) where comps = [(id, hi, vi, tq)]

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:  # EOI before any scan
            raise ValueError("corrupt JPEG: EOI before SOS")
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG: segment cut short")
        if marker in _NON_BASELINE_SOF:
            raise ValueError(f"unsupported JPEG: {_NON_BASELINE_SOF[marker]}")
        if marker == 0xCC:
            raise ValueError("unsupported JPEG: arithmetic coding conditioning (DAC)")
        if marker == 0xDB:  # DQT — may hold several tables
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported JPEG: 16-bit quantization table")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[o + 1 : o + 65], dtype=np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT — may hold several tables
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1 : o + 17])
                n = sum(bits)
                vals = list(seg[o + 17 : o + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                o += 17 + n
        elif marker == 0xDD:  # DRI
            if len(seg) != 2:
                raise ValueError("corrupt JPEG: DRI segment must be 4 bytes")
            (restart_interval,) = struct.unpack(">H", seg)
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended sequential
            if len(seg) < 6:
                raise ValueError("corrupt JPEG: SOF segment truncated")
            prec, fh, fw, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if len(seg) < 6 + 3 * nc:
                raise ValueError("corrupt JPEG: SOF component specs truncated")
            if prec != 8:
                raise ValueError(f"unsupported JPEG: {prec}-bit precision")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG: {nc}-component frame (CMYK?)")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            sel = {}
            for si in range(ns):
                cs, tt = seg[1 + 2 * si : 3 + 2 * si]
                sel[cs] = (tt >> 4, tt & 0x0F)
            scan_start = pos + 2 + seglen
            return _decode_scan(
                data, scan_start, frame, sel, quant, huff_dc, huff_ac, restart_interval
            )
        # APPn / COM / anything else with a length: skip
        pos += 2 + seglen
    raise ValueError("truncated JPEG: no SOS marker found")


def _entropy_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Split the scan's entropy data at RST markers, stripping byte stuffing.

    Returns (segments, pos_after_scan)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("truncated JPEG: dangling 0xFF at end of scan")
        m = data[i + 1]
        if m == 0x00:  # stuffed 0xFF data byte
            cur.append(0xFF)
            i += 2
        elif m == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            i += 1
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # next real marker ends the scan
            segs.append(bytes(cur))
            return segs, i
    raise ValueError("truncated JPEG: scan data ran past end of file")


def _decode_scan(data, start, frame, sel, quant, huff_dc, huff_ac, restart_interval):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(comps) == 1 and (hmax != 1 or vmax != 1):
        # T.81 A.2.2: a single-component scan is NON-interleaved — one 8x8
        # data unit per MCU regardless of the frame's declared sampling
        # factors. This decoder only implements the interleaved MCU rule,
        # so a legal grayscale baseline declaring e.g. 2x2 sampling would
        # mis-decode (or surface as a misleading 'corrupt JPEG'). Loud
        # rejection per the codec's policy (ADVICE r8).
        raise ValueError(
            "unsupported JPEG: sampled single-component scan "
            f"(sampling {comps[0][1]}x{comps[0][2]}; T.81 decodes these "
            "non-interleaved, which this baseline decoder does not implement)"
        )
    for cid, hi, vi, tq in comps:
        if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
            raise ValueError(
                f"unsupported JPEG: non-integer sampling ratio {hi}x{vi} vs {hmax}x{vmax}"
            )
        if tq not in quant:
            raise ValueError(f"corrupt JPEG: component {cid} references missing DQT {tq}")
        if cid not in sel:
            raise ValueError("unsupported JPEG: multi-scan frames (non-interleaved)")
        td, ta = sel[cid]
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError(f"corrupt JPEG: component {cid} references missing DHT")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = [
        np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for _, hi, vi, _ in comps
    ]

    segs, _ = _entropy_segments(data, start)
    expected_segs = (
        -(-mcux * mcuy // restart_interval) if restart_interval else 1
    )
    if len(segs) != expected_segs:
        raise ValueError(
            f"corrupt JPEG: {len(segs)} entropy segments, expected {expected_segs}"
        )

    # Hoist everything loop-invariant out of the per-block hot path: the
    # zigzag-ordered dequant vector, Huffman tables, and sampling factors
    # per component (the inner loop previously rebuilt the 64-entry
    # dequant vector with a reshape + fancy-index per 8x8 block).
    comp_ctx = []
    for cid, hi, vi, tq in comps:
        td, ta = sel[cid]
        qvec = quant[tq].reshape(64)[ZIGZAG].astype(np.int32)
        comp_ctx.append((hi, vi, huff_dc[td], huff_ac[ta], qvec))

    seg_i = 0
    reader = _BitReader(segs[0])
    preds = [0] * len(comps)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                seg_i += 1
                reader = _BitReader(segs[seg_i])
                preds = [0] * len(comps)
            for ci, (hi, vi, dc_tbl, ac_tbl, qvec) in enumerate(comp_ctx):
                for by in range(vi):
                    for bx in range(hi):
                        # int64: a corrupt-but-category-valid stream can
                        # random-walk the DC predictor past int32 on large
                        # frames; int64 keeps the overflow impossible (the
                        # fuzz contract is ValueError-or-decode, never an
                        # OverflowError out of numpy)
                        zz = np.zeros(64, dtype=np.int64)
                        cat = reader.read_symbol(dc_tbl)
                        if cat > 11:
                            # T.81 F.1.2.1.1: baseline DC categories are
                            # 0..11 — a larger symbol is a corrupt table or
                            # stream, and blindly reading `cat` bits lets
                            # the predictor overflow arbitrarily (fuzz)
                            raise ValueError(
                                f"corrupt JPEG: DC category {cat} out of range"
                            )
                        diff = _extend(reader.read_bits(cat), cat)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = reader.read_symbol(ac_tbl)
                            r, s = sym >> 4, sym & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC run past block end")
                            if s > 10:
                                # T.81 F.1.2.2.1: baseline AC sizes are 1..10
                                raise ValueError(
                                    f"corrupt JPEG: AC size {s} out of range"
                                )
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * qvec
                        blk = _idct(coef.reshape(8, 8)) + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_i += 1

    out_planes = []
    for ci, (_, hi, vi, _) in enumerate(comps):
        p = planes[ci]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(p[:fh, :fw])
    if len(comps) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    rgb = _ycbcr_to_rgb(np.stack(out_planes, axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
