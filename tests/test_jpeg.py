"""Stdlib baseline JPEG codec: DC-lattice exactness, lossy-bounded round
trips, restart intervals, marker parsing, loud non-baseline rejection, and
the Spark decode dispatch. No libjpeg/PIL in the container, so correctness
rests on spec-derived constants + internal round-trips (the GIF/PNG test
strategy), plus canonical-Huffman checks against values printed in the
public T.81 Annex K tables."""

from __future__ import annotations

import numpy as np
import pytest

from etl_hiscox_spark.operators.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    ZIGZAG,
    build_huffman_codes,
    decode_jpeg,
    encode_jpeg,
)


def _lattice(bh, bw, seed=0):
    """Image of constant EVEN-valued 8x8 blocks — bit-exact through the codec."""
    rng = np.random.default_rng(seed)
    vals = (rng.integers(0, 128, size=(bh, bw)) * 2).astype(np.uint8)
    return np.kron(vals, np.ones((8, 8), dtype=np.uint8))


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return ((y * 3 + x * 2) % 256).astype(np.uint8)


# --- exactness on the DC lattice -------------------------------------------


@pytest.mark.parametrize("bh,bw", [(1, 1), (2, 3), (4, 4)])
def test_gray_lattice_bit_exact(bh, bw):
    img = _lattice(bh, bw, seed=bh * 10 + bw)
    assert np.array_equal(decode_jpeg(encode_jpeg(img)), img)


def test_odd_lattice_still_close():
    # odd values miss the DC quantization lattice: not exact, but within
    # the DC quantum (16/8 = 2 levels of gray)
    img = np.kron(
        np.array([[101, 103], [105, 107]], dtype=np.uint8),
        np.ones((8, 8), dtype=np.uint8),
    )
    dec = decode_jpeg(encode_jpeg(img))
    assert int(np.max(np.abs(dec.astype(int) - img.astype(int)))) <= 2


# --- lossy-bounded round trips ---------------------------------------------


def test_gray_gradient_bounded_loss_and_crop():
    img = _gradient(37, 45)  # non-multiple-of-8 dims exercise edge padding
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (37, 45)
    assert int(np.max(np.abs(dec.astype(int) - img.astype(int)))) <= 8


@pytest.mark.parametrize("subsampling", ["444", "420"])
def test_color_roundtrip(subsampling):
    y, x = np.mgrid[0:21, 0:19]
    img = np.stack(
        [(y * 2 + x) % 256, (y + x * 3) % 256, (y * 4) % 256], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, subsampling=subsampling))
    assert dec.shape == (21, 19, 3)
    bound = 16 if subsampling == "444" else 64  # chroma box-filter loss
    assert int(np.max(np.abs(dec.astype(int) - img.astype(int)))) <= bound
    assert float(np.mean(np.abs(dec.astype(float) - img.astype(float)))) <= 8.0


def test_noise_roundtrip_runs():
    # high-frequency noise maximizes AC activity (ZRL, long runs, stuffing)
    rng = np.random.default_rng(11)
    for seed in range(4):
        img = rng.integers(0, 256, size=(24, 16)).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img))
        assert dec.shape == img.shape


def test_byte_stuffing_path_hit():
    # at least one seeded noise image must produce a stuffed 0xFF00 in the
    # entropy stream, proving the un-stuffing path is really exercised
    rng = np.random.default_rng(3)
    for _ in range(300):
        img = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
        enc = encode_jpeg(img)
        scan = enc[enc.find(b"\xff\xda") :]
        if b"\xff\x00" in scan:
            decode_jpeg(enc)  # and it must still decode
            return
    pytest.fail("no seeded image produced a stuffed 0xFF00 byte")


# --- restart intervals ------------------------------------------------------


def test_restart_interval_identical_output():
    img = _gradient(24, 40)
    plain = decode_jpeg(encode_jpeg(img))
    for interval in (1, 3, 7):
        enc = encode_jpeg(img, restart_interval=interval)
        assert b"\xff\xdd" in enc  # DRI marker present
        assert np.array_equal(decode_jpeg(enc), plain)


def test_restart_markers_cycle():
    enc = encode_jpeg(_gradient(8, 8 * 20), restart_interval=1)
    scan = enc[enc.find(b"\xff\xda") :]
    # 20 MCUs, interval 1 -> RST0..RST7 then wrap RST0.. (19 markers)
    for m in range(8):
        assert bytes([0xFF, 0xD0 + m]) in scan


# --- canonical Huffman construction vs published Annex K values ------------


def test_annex_k_code_counts():
    for bits, vals in ((DC_LUMA_BITS, DC_LUMA_VALS), (AC_LUMA_BITS, AC_LUMA_VALS)):
        codes = build_huffman_codes(bits, vals)
        by_len = [0] * 17
        for _, (code, ln) in codes.items():
            by_len[ln] += 1
        assert by_len[1:] == list(bits)


def test_annex_k_known_codes():
    # published canonical assignments: luma DC cat 0 = '00' (2 bits);
    # luma AC EOB (0x00) = '1010' (4 bits), ZRL (0xF0) = '11111111001' (11)
    dc = build_huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    assert dc[0] == (0b00, 2)
    assert ac[0x00] == (0b1010, 4)
    assert ac[0xF0] == (0b11111111001, 11)


def test_zigzag_is_a_permutation_with_spec_anchors():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec figure 5 anchors: positions 0..5 and the final corner
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[63] == 63


# --- loud rejection of everything non-baseline ------------------------------


def _seg(marker, payload):
    import struct

    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def test_reject_progressive():
    data = b"\xff\xd8" + _seg(0xC2, bytes([8, 0, 16, 0, 16, 1, 1, 0x11, 0]))
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(data)


def test_reject_arithmetic():
    data = b"\xff\xd8" + _seg(0xC9, bytes([8, 0, 16, 0, 16, 1, 1, 0x11, 0]))
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(data)


def test_reject_12_bit_precision():
    data = b"\xff\xd8" + _seg(0xC0, bytes([12, 0, 16, 0, 16, 1, 1, 0x11, 0]))
    with pytest.raises(ValueError, match="12-bit"):
        decode_jpeg(data)


def test_reject_16_bit_quant_table():
    data = b"\xff\xd8" + _seg(0xDB, bytes([0x10]) + bytes(128))
    with pytest.raises(ValueError, match="16-bit quantization"):
        decode_jpeg(data)


def test_reject_not_a_jpeg_and_truncation():
    with pytest.raises(ValueError, match="missing SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    enc = encode_jpeg(_lattice(1, 2))
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) // 2])


def test_reject_missing_tables():
    # SOF referencing quant table 3 that no DQT defined
    img = _lattice(1, 1)
    enc = bytearray(encode_jpeg(img))
    # SOF0: FF C0 len(2) prec(1) h(2) w(2) nc(1) [id hv tq] -> tq at i+12
    i = enc.find(b"\xff\xc0")
    enc[i + 12] = 3
    with pytest.raises(ValueError, match="missing DQT"):
        decode_jpeg(bytes(enc))


# --- Spark dispatch ---------------------------------------------------------


def test_decode_image_dispatch_jpeg_channel_contract():
    from etl_hiscox_spark.operators.multimodal import decode_image

    img = _lattice(2, 2, seed=5)
    arr = decode_image(encode_jpeg(img))
    assert arr.shape == (16, 16, 1)
    assert np.array_equal(arr[:, :, 0], img)

    y, x = np.mgrid[0:8, 0:8]
    rgb = np.stack([y * 9 % 256, x * 9 % 256, (y + x) * 5 % 256], axis=-1).astype(
        np.uint8
    )
    arr3 = decode_image(encode_jpeg(rgb))
    assert arr3.shape == (8, 8, 3)


def test_m5_query_matches_synthesis(spark, sf_dir):
    # the m5 plumbing end-to-end on the real session: one row per doc,
    # means equal to the planted block means
    from etl_hiscox_spark.queries.llm import m5_jpeg_features

    out = m5_jpeg_features(spark, sf_dir).collect()
    assert len(out) > 0
    for row in out[:20]:
        i = int(row["path"])
        bw, bh = 2 + i % 3, 1 + i % 2
        vals = 2 * ((i * 13 + np.arange(bh * bw) * 29) % 128)
        assert row["width"] == bw * 8 and row["height"] == bh * 8
        assert row["n_channels"] == 1
        assert abs(row["mean_intensity"] - round(float(vals.mean()), 6)) < 1e-9


# --- property fuzz (hypothesis): total robustness of the decode path -------


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    color=st.booleans(),
    interval=st.integers(min_value=0, max_value=3),
)
def test_fuzz_roundtrip_never_crashes(h, w, seed, color, interval):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, size=shape).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, restart_interval=interval))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    # quantization noise is zero-mean-ish: the global mean survives
    assert abs(float(dec.mean()) - float(img.mean())) < 24.0


@settings(max_examples=60, deadline=None)
@given(junk=st.binary(min_size=0, max_size=300))
def test_fuzz_garbage_bytes_raise_value_error(junk):
    # arbitrary bytes (with and without a forced SOI prefix) must raise
    # ValueError — never IndexError/struct.error/KeyError or a hang
    for data in (junk, b"\xff\xd8" + junk):
        try:
            decode_jpeg(data)
        except ValueError:
            pass


@settings(max_examples=40, deadline=None)
@given(pos=st.integers(min_value=2, max_value=10_000), delta=st.integers(min_value=1, max_value=255))
def test_fuzz_single_byte_corruption_contained(pos, delta):
    # flipping one byte of a valid stream either still decodes to the right
    # shape or raises ValueError — no other exception class escapes
    img = _gradient(16, 24)
    enc = bytearray(encode_jpeg(img))
    pos %= len(enc) - 2
    enc[2 + pos] = (enc[2 + pos] + delta) % 256
    try:
        out = decode_jpeg(bytes(enc))
        assert isinstance(out, np.ndarray)
    except ValueError:
        pass


def test_sampled_single_component_scan_rejected():
    """T.81 A.2.2: a single-component scan is non-interleaved — one 8x8
    unit per MCU regardless of declared sampling. The baseline decoder
    only implements the interleaved rule, so a grayscale frame declaring
    2x2 sampling must be rejected LOUDLY, not mis-decoded or surfaced as
    a misleading 'corrupt JPEG' (ADVICE r8)."""
    import numpy as np
    import pytest

    from etl_hiscox_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = ((np.arange(64).reshape(8, 8) * 3) % 256).astype(np.uint8)
    data = bytearray(encode_jpeg(img))
    # locate SOF0 and rewrite the single component's sampling byte 0x11 -> 0x22
    i = 2
    patched = False
    while i + 4 <= len(data):
        assert data[i] == 0xFF
        marker, seglen = data[i + 1], (data[i + 2] << 8) | data[i + 3]
        if marker == 0xC0:
            nc = data[i + 9]
            assert nc == 1
            assert data[i + 11] == 0x11  # grayscale encodes 1x1
            data[i + 11] = 0x22
            patched = True
            break
        i += 2 + seglen
    assert patched, "no SOF0 segment found to patch"
    with pytest.raises(ValueError, match="sampled single-component"):
        decode_jpeg(bytes(data))
