"""Pure-stdlib GIF87a/89a codec (L7 multimodal tier).

Same rationale as the BMP/WAV codecs in :mod:`multimodal`: the container
has no image libraries, so the one animation format that is tractable in
pure Python gets a REAL decode path — which upgrades video frame-sampling
from a length-derived stub to actual pixels for GIF inputs. True video
codecs (H.264 etc.) remain honestly gated on external libraries.

Supported: global color table, multiple image frames (animated GIFs),
graphic-control transparency (transparent pixels keep the previous canvas
value — disposal method 1 semantics), sub-block data streams, variable-
width LZW with CLEAR/END codes. Rejected explicitly (NotImplementedError,
never silently wrong): interlaced frames and local color tables.

The encoder exists to make decode testable end-to-end without fixtures:
it emits literal-only LZW with a CLEAR every 253 codes, which pins the
code width at 9 bits — the classic "uncompressed GIF" technique.
"""

from __future__ import annotations

import struct

import numpy as np


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        size = buf[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        out += buf[pos : pos + size]
        pos += size


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear_code = 1 << min_code_size
    end_code = clear_code + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear_code)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            bits -= code_size
            if code == clear_code:
                table = [[i] for i in range(clear_code)] + [[], []]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end_code:
                return out
            if prev is None:
                # First code after a CLEAR must be a literal root. A code
                # beyond the table would raise a bare IndexError and a code
                # hitting the empty clear/end placeholder slots would emit
                # nothing silently — both are the same corruption, so both
                # get the documented loud error.
                if code >= len(table) or not table[code]:
                    raise ValueError(
                        f"corrupt LZW stream: first code {code} after clear "
                        "is not a literal"
                    )
                entry = table[code]
            elif code < len(table) and table[code]:
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise ValueError(f"corrupt LZW stream: code {code} beyond table")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def decode_gif(content: bytes) -> list[np.ndarray]:
    """Decode every frame to an (h, w, 3) uint8 RGB array (full canvas,
    later frames composited over earlier ones)."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing GIF87a/GIF89a signature)")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(content[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    if gct is None:
        raise NotImplementedError("GIF without a global color table")

    frames: list[np.ndarray] = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    transparent: int | None = None
    next_disposal = 0  # GCE disposal for the UPCOMING frame
    prev_disposal = 0  # disposal of the most recently DECODED frame
    while pos < len(content):
        b = content[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = content[pos]
            pos += 1
            data, pos = _read_subblocks(content, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                next_disposal = (data[0] >> 2) & 0x07
                transparent = data[3] if data[0] & 0x01 else None
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        if frames and prev_disposal in (2, 3):
            # restore-to-background / restore-to-previous change what THIS
            # frame composites over — silently treating them as
            # "draw over previous" would decode wrong pixels (module
            # policy: loud, never wrong). Checked here, not at the GCE, on
            # purpose: a disposal flag on the FINAL (or only) frame
            # affects nothing and real still-image encoders do emit it.
            raise NotImplementedError(
                f"GIF disposal method {prev_disposal} (restore to "
                "background/previous) before a subsequent frame; only "
                "none/keep supported"
            )
        fx, fy, fw, fh, fflags = struct.unpack("<HHHHB", content[pos : pos + 9])
        pos += 9
        if fflags & 0x80:
            raise NotImplementedError("GIF local color tables")
        if fflags & 0x40:
            raise NotImplementedError("interlaced GIF frames")
        min_code = content[pos]
        pos += 1
        data, pos = _read_subblocks(content, pos)
        idx = np.array(_lzw_decode(data, min_code), dtype=np.int32)
        if idx.size != fw * fh:
            raise ValueError(f"frame pixel count {idx.size} != {fw}x{fh}")
        idx = idx.reshape(fh, fw)
        rgb = gct[np.clip(idx, 0, len(gct) - 1)]
        region = canvas[fy : fy + fh, fx : fx + fw]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        transparent = None
        prev_disposal = next_disposal  # the GCE governs the frame just drawn
        next_disposal = 0
    return frames


def encode_gif(frames: list[np.ndarray], palette: np.ndarray | None = None) -> bytes:
    """Encode grayscale-quantized frames as an animated GIF (literal-only
    LZW, CLEAR every 253 codes → code width pinned at 9 bits)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if palette is None:
        palette = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)  # gray ramp
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # 256-entry GCT
    out += palette.astype(np.uint8).tobytes()

    for frame in frames:
        if frame.shape[:2] != (h, w):
            raise ValueError("all frames must share the canvas size")
        if frame.ndim == 3:
            idx = frame.mean(axis=2).astype(np.uint8)  # quantize via gray ramp
        else:
            idx = frame.astype(np.uint8)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
        out.append(8)  # LZW min code size
        # Vectorized literal-only LZW: CLEAR(256) inserted every 253
        # pixels, END(257) appended, each 9-bit code expanded LSB-first
        # and packed little-endian — byte-identical to the accumulator
        # loop it replaced (np.packbits zero-pads the final partial byte,
        # matching the trailing `acc & 0xFF` flush), ~10x faster: the
        # per-pixel Python loop dominated clip synthesis in the m3/m10
        # media queries (20M iterations per sf1 bench pass).
        pixels = idx.ravel().astype(np.uint16)
        codes = np.insert(pixels, np.arange(0, pixels.size, 253), np.uint16(256))
        codes = np.append(codes, np.uint16(257))
        codebits = ((codes[:, None] >> np.arange(9, dtype=np.uint16)) & 1).astype(np.uint8)
        payload = np.packbits(codebits.ravel(), bitorder="little").tobytes()
        for i in range(0, len(payload), 255):
            chunk = payload[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)
    return bytes(out)
