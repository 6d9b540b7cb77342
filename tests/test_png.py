"""Stdlib PNG codec: filter-by-filter round-trips, color types, chunk-level
corruption detection, and the Spark decode path. No PIL in the container, so
correctness rests on spec-derived fixtures + exhaustive internal round-trips
(the GIF/Avro test strategy)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from etl_hiscox_spark.operators.png import decode_png, encode_png


def _gradient(h, w, channels, base=0):
    # per-channel gradients make Sub/Up/Average/Paeth deltas all nontrivial
    idx = np.arange(h * w).reshape(h, w)
    return np.stack(
        [((idx + base + c * 17) % 256).astype(np.uint8) for c in range(channels)], axis=2
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_each_filter(filter_type):
    arr = _gradient(7, 11, 3, base=filter_type * 13)
    assert np.array_equal(decode_png(encode_png(arr, filter_type)), arr)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_each_color_type(channels):
    arr = _gradient(5, 6, channels, base=channels)
    got = decode_png(encode_png(arr, filter_type=4))
    assert got.shape == (5, 6, channels)
    assert np.array_equal(got, arr)


def test_roundtrip_random_pixels_all_filters():
    rng = np.random.default_rng(42)
    for ft in range(5):
        arr = rng.integers(0, 256, size=(9, 4, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(arr, ft)), arr), ft


def test_single_pixel_and_single_row():
    one = np.array([[[200]]], dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(one, 4)), one)
    row = _gradient(1, 13, 3)
    assert np.array_equal(decode_png(encode_png(row, 1)), row)


def test_multiple_idat_chunks():
    # split the IDAT stream across two chunks — decoders must concatenate
    arr = _gradient(6, 6, 3)
    raw = encode_png(arr)
    sig, rest = raw[:8], raw[8:]
    (ihdr_len,) = struct.unpack(">I", rest[:4])
    ihdr = rest[: 12 + ihdr_len]
    rest = rest[12 + ihdr_len :]
    (idat_len,) = struct.unpack(">I", rest[:4])
    idat_data = rest[8 : 8 + idat_len]
    iend = rest[12 + idat_len :]

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF
        )

    split = len(idat_data) // 2
    two = sig + ihdr + chunk(b"IDAT", idat_data[:split]) + chunk(b"IDAT", idat_data[split:]) + iend
    assert np.array_equal(decode_png(two), arr)


def test_ancillary_chunks_skipped():
    arr = _gradient(3, 3, 3)
    raw = encode_png(arr)
    sig, rest = raw[:8], raw[8:]
    (ihdr_len,) = struct.unpack(">I", rest[:4])
    text = b"comment\x00hello"
    extra = struct.pack(">I", len(text)) + b"tEXt" + text + struct.pack(
        ">I", zlib.crc32(b"tEXt" + text) & 0xFFFFFFFF
    )
    patched = sig + rest[: 12 + ihdr_len] + extra + rest[12 + ihdr_len :]
    assert np.array_equal(decode_png(patched), arr)


def test_rejections_are_loud():
    arr = _gradient(4, 4, 3)
    raw = bytearray(encode_png(arr))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + bytes(raw))
    # interlace byte is the last of the 13 IHDR data bytes (offset 8+8+12)
    bad = raw.copy()
    bad[8 + 8 + 12] = 1
    bad[8 + 8 + 13 : 8 + 8 + 17] = struct.pack(
        ">I", zlib.crc32(bytes(bad[8 + 4 : 8 + 8 + 13])) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(bytes(bad))
    # palette color type
    bad = raw.copy()
    bad[8 + 8 + 9] = 3
    bad[8 + 8 + 13 : 8 + 8 + 17] = struct.pack(
        ">I", zlib.crc32(bytes(bad[8 + 4 : 8 + 8 + 13])) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError, match="palette"):
        decode_png(bytes(bad))
    # 16-bit depth
    bad = raw.copy()
    bad[8 + 8 + 8] = 16
    bad[8 + 8 + 13 : 8 + 8 + 17] = struct.pack(
        ">I", zlib.crc32(bytes(bad[8 + 4 : 8 + 8 + 13])) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(bytes(bad))
    # flipped pixel byte without fixing the CRC
    bad = raw.copy()
    bad[-20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch|truncated"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(bytes(raw[:30]))
    with pytest.raises(ValueError, match="cannot encode"):
        encode_png(np.zeros((2, 2, 5), dtype=np.uint8))


def test_corrupt_filter_and_length_are_loud():
    arr = _gradient(3, 3, 3)
    raw = encode_png(arr)
    # rebuild IDAT with a bogus filter type 9 on row 0
    sig, rest = raw[:8], raw[8:]
    (ihdr_len,) = struct.unpack(">I", rest[:4])
    ihdr = rest[: 12 + ihdr_len]
    body = bytearray(zlib.decompress(rest[12 + ihdr_len + 8 : -12 - 4]))
    body[0] = 9

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF
        )

    bad = sig + ihdr + chunk(b"IDAT", zlib.compress(bytes(body))) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unknown filter type 9"):
        decode_png(bad)
    short = sig + ihdr + chunk(b"IDAT", zlib.compress(bytes(body[:-4]))) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="decompressed"):
        decode_png(short)


def test_decode_image_dispatches_png(spark):
    # PNG binaries flow through the same Arrow image_features pipeline as BMP
    import pandas as pd

    from etl_hiscox_spark.operators.multimodal import image_features

    rows = [
        ("p0", encode_png(_gradient(4, 6, 3, base=7), filter_type=4)),
        ("p1", encode_png(np.full((2, 3, 3), 9, dtype=np.uint8))),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["path", "content"]))
    got = {r["path"]: r for r in image_features(df).collect()}
    assert (got["p0"]["width"], got["p0"]["height"], got["p0"]["n_channels"]) == (6, 4, 3)
    expect = float(_gradient(4, 6, 3, base=7).mean())
    assert abs(got["p0"]["mean_intensity"] - expect) < 1e-9
    assert got["p1"]["mean_intensity"] == 9.0


def test_channel_stats_gray_alpha_reports_gray_not_alpha(spark):
    # review fix: padding the raw means list reported the ALPHA mean as
    # mean_g for 2-channel gray+alpha images
    import pandas as pd

    from etl_hiscox_spark.operators.multimodal import image_channel_stats

    ga = np.zeros((2, 2, 2), dtype=np.uint8)
    ga[:, :, 0] = 128  # gray
    ga[:, :, 1] = 255  # alpha, fully opaque
    df = spark.createDataFrame(
        pd.DataFrame([("g", encode_png(ga))], columns=["path", "content"])
    )
    row = image_channel_stats(df).first()
    assert row["n_channels"] == 2
    assert row["mean_r"] == row["mean_g"] == row["mean_b"] == 128.0


def test_image_features_excludes_alpha_from_intensity(spark):
    import pandas as pd

    from etl_hiscox_spark.operators.multimodal import image_features

    ga = np.zeros((2, 2, 2), dtype=np.uint8)
    ga[:, :, 0] = 128
    ga[:, :, 1] = 255  # opaque alpha must not lift the intensity
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[:, :, :3] = 10
    rgba[:, :, 3] = 255
    df = spark.createDataFrame(
        pd.DataFrame(
            [("ga", encode_png(ga)), ("rgba", encode_png(rgba))],
            columns=["path", "content"],
        )
    )
    got = {r["path"]: r["mean_intensity"] for r in image_features(df).collect()}
    assert got["ga"] == 128.0
    assert got["rgba"] == 10.0
