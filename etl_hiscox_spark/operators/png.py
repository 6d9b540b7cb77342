"""Real stdlib PNG codec — zlib inflate/deflate + the five scanline filters.

Same policy as the xlsx/Avro/BMP/WAV/GIF codecs (reference repo has no
image handling at all — EXT tier per SURVEY.md §2.11 L7): the container
has no PIL, so the honest move is a REAL spec-derived decoder for the
common subset, with LOUD rejection of everything else — never a silent
stub. Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+
alpha), 6 (RGBA), all five filter types (None/Sub/Up/Average/Paeth),
multiple IDAT chunks, CRC-verified. Rejected loudly: Adam7 interlace,
palette (color type 3), 1/2/4/16-bit depths, truncated/corrupt streams.

Scale note: decode cost is per-file Python (a per-row loop for the
sequential Sub/Average/Paeth recurrences); at deployment PIL/libpng
replaces this hot loop behind the same ``decode_image`` dispatch. The
Spark contract — binary column in, Arrow-batched feature rows out — is
identical either way, which is what the m4 query pins.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunks(content: bytes):
    pos = 8
    while pos < len(content):
        if pos + 8 > len(content):
            raise ValueError("truncated PNG: chunk header past end of data")
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if pos + 12 + length > len(content):
            raise ValueError(f"truncated PNG: {ctype!r} chunk cut short")
        (crc,) = struct.unpack(">I", content[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG: CRC mismatch in {ctype.decode('latin1')} chunk")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("truncated PNG: no IEND chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"corrupt PNG: decompressed {len(raw)} bytes, expected {h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ftype = raw[r * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1)
        prev = out[r - 1] if r > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[r] = line
        elif ftype == 2:  # Up — vectorizable, no intra-row dependence
            out[r] = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            cur = out[r]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + int(prev[x])) >> 1
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    pred = _paeth(a, int(prev[x]), c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter type {ftype} on row {r}")
    return out


def decode_png(content: bytes) -> np.ndarray:
    """Decode to an (h, w, channels) uint8 array (channels per color type:
    gray 1, RGB 3, gray+alpha 2, RGBA 4)."""
    if content[:8] != _SIGNATURE:
        raise ValueError("not a PNG (missing \\x89PNG signature)")
    w = h = None
    bpp = channels = 0
    idat = bytearray()
    for ctype, data in _chunks(content):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if interlace:
                raise NotImplementedError("png codec does not support Adam7 interlace")
            if color == 3:
                raise NotImplementedError("png codec does not support palette (color type 3)")
            if color not in _CHANNELS:
                raise ValueError(f"corrupt PNG: unknown color type {color}")
            if depth != 8:
                raise NotImplementedError(f"png codec supports 8-bit depth only, got {depth}")
            if comp != 0 or filt != 0:
                raise ValueError("corrupt PNG: nonzero compression/filter method")
            channels = _CHANNELS[color]
            bpp = channels
        elif ctype == b"IDAT":
            idat += data
        # ancillary chunks (tEXt, gAMA, ...) are skipped; IEND stops _chunks
    if w is None:
        raise ValueError("corrupt PNG: no IHDR chunk")
    if not idat:
        raise ValueError("corrupt PNG: no IDAT chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG: IDAT inflate failed ({e})") from e
    return _unfilter(raw, w, h, bpp).reshape(h, w, channels)


def _filter_row(ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    left = np.zeros_like(line)
    left[bpp:] = line[:-bpp]
    if ftype == 0:
        return line.copy()
    if ftype == 1:
        return line - left
    if ftype == 2:
        return line - prev
    if ftype == 3:
        return line - ((left.astype(np.int16) + prev.astype(np.int16)) >> 1).astype(np.uint8)
    if ftype == 4:
        ul = np.zeros_like(prev)
        ul[bpp:] = prev[:-bpp]
        a, b, c = (x.astype(np.int16) for x in (left, prev, ul))
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
        return line - pred.astype(np.uint8)
    raise ValueError(f"unknown filter type {ftype}")


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (h, w) or (h, w, channels) uint8 array. ``filter_type``
    applies one filter to every row (0-4) — exercising each decode path is
    the point; a production encoder would pick per-row adaptively."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, channels = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"cannot encode {channels}-channel array as PNG")
    if arr.dtype != np.uint8:
        raise ValueError("encode_png requires uint8 pixels")
    bpp = channels
    flat = arr.reshape(h, w * channels)
    body = bytearray()
    zero = np.zeros(w * channels, dtype=np.uint8)
    for r in range(h):
        prev = flat[r - 1] if r > 0 else zero
        body.append(filter_type)
        body += _filter_row(filter_type, flat[r], prev, bpp).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body)))
        + chunk(b"IEND", b"")
    )
