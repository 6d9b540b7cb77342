"""Pure-stdlib GIF codec (operators/gif.py): encode->decode round-trip,
animation, transparency compositing, and the honest rejections."""

from __future__ import annotations

import numpy as np
import pytest

from etl_hiscox_spark.operators.gif import decode_gif, encode_gif


def _gray(idx: np.ndarray) -> np.ndarray:
    return np.stack([idx] * 3, axis=2).astype(np.uint8)


def test_roundtrip_single_frame():
    idx = (np.arange(7 * 5).reshape(5, 7) * 13 % 256).astype(np.uint8)
    frames = decode_gif(encode_gif([idx]))
    assert len(frames) == 1
    np.testing.assert_array_equal(frames[0], _gray(idx))


def test_roundtrip_animated_multiframe():
    rng = np.random.default_rng(3)
    idxs = [rng.integers(0, 256, size=(9, 11), dtype=np.uint8) for _ in range(4)]
    frames = decode_gif(encode_gif(idxs))
    assert len(frames) == 4
    for got, idx in zip(frames, idxs):
        np.testing.assert_array_equal(got, _gray(idx))


def test_roundtrip_large_enough_to_need_multiple_clears():
    idx = (np.arange(40 * 30).reshape(30, 40) % 256).astype(np.uint8)  # 1200 px > 253
    np.testing.assert_array_equal(decode_gif(encode_gif([idx]))[0], _gray(idx))


_BODY = 13 + 768  # header + 256-entry global color table: first block offset


def _second_descriptor_pos(raw: bytes) -> int:
    # walk the block stream structurally (0x2c can appear inside the color
    # table or pixel payload, so searching bytes is wrong)
    pos = _BODY
    assert raw[pos] == 0x2C
    pos += 11  # 0x2C + 9-byte descriptor + LZW min-code byte
    while raw[pos] != 0:
        pos += 1 + raw[pos]
    pos += 1  # sub-block terminator
    assert raw[pos] == 0x2C
    return pos


def test_transparency_composites_over_previous_frame():
    import struct

    base = np.full((4, 4), 100, dtype=np.uint8)
    overlay = np.full((4, 4), 200, dtype=np.uint8)
    overlay[0, 0] = 7  # will be declared transparent
    raw = bytearray(encode_gif([base, overlay]))
    # splice a graphic-control extension (transparent index 7) before the
    # SECOND image descriptor
    second = _second_descriptor_pos(bytes(raw))
    gce = struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x01, 0, 7, 0)
    patched = bytes(raw[:second]) + gce + bytes(raw[second:])
    frames = decode_gif(patched)
    assert frames[1][0, 0, 0] == 100  # transparent pixel kept frame-1 value
    assert frames[1][1, 1, 0] == 200


def test_rejections_are_loud():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG....")
    idx = np.zeros((2, 2), dtype=np.uint8)
    raw = bytearray(encode_gif([idx]))
    assert raw[_BODY] == 0x2C
    raw[_BODY + 9] |= 0x40  # set interlace flag on the image descriptor
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(raw))


def test_gif_frame_features_spark(spark):
    from etl_hiscox_spark.operators.multimodal import gif_frame_features

    clips = []
    for d in range(4):
        idxs = [
            ((np.arange(6 * 4) + d * 31 + f * 7) % 256).reshape(4, 6).astype(np.uint8)
            for f in range(3)
        ]
        clips.append((f"clip{d}.gif", bytearray(encode_gif(idxs))))
    df = spark.createDataFrame(clips, "path string, content binary")
    out = gif_frame_features(df, every_n=2).collect()
    assert len(out) == 4 * 2  # frames 0 and 2 of 3
    r = {(x["path"], x["frame_index"]): x for x in out}
    for d in range(4):
        for f in (0, 2):
            row = r[(f"clip{d}.gif", f)]
            assert (row["height"], row["width"]) == (4, 6)
            expected = float(np.mean((np.arange(24) + d * 31 + f * 7) % 256))
            assert abs(row["mean_intensity"] - expected) < 1e-9


def test_disposal_methods_2_and_3_rejected_only_when_consequential():
    import struct

    gce2 = struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 2 << 2, 0, 0, 0)
    base = np.full((3, 3), 50, dtype=np.uint8)
    top = np.full((3, 3), 90, dtype=np.uint8)

    # disposal=2 on the FIRST frame changes what the second composites
    # over -> loud rejection at the second descriptor
    raw = bytearray(encode_gif([base, top]))
    patched = gce_before_first = bytes(raw[:_BODY]) + gce2 + bytes(raw[_BODY:])
    with pytest.raises(NotImplementedError, match="disposal method 2"):
        decode_gif(patched)

    # disposal=2 on the FINAL (or only) frame affects nothing — real
    # still-image encoders emit it; must decode normally
    single = bytearray(encode_gif([base]))
    ok = bytes(single[:_BODY]) + gce2 + bytes(single[_BODY:])
    np.testing.assert_array_equal(decode_gif(ok)[0], _gray(base))
    two = bytearray(encode_gif([base, top]))
    second = _second_descriptor_pos(bytes(two))
    ok2 = bytes(two[:second]) + gce2 + bytes(two[second:])
    assert len(decode_gif(ok2)) == 2


def test_gif_frame_features_fails_loudly_on_non_gif(spark):
    from etl_hiscox_spark.operators.multimodal import gif_frame_features

    df = spark.createDataFrame(
        [("a.gif", bytearray(encode_gif([np.zeros((2, 2), dtype=np.uint8)]))),
         ("b.png", bytearray(b"\x89PNG not a gif"))],
        "path string, content binary",
    )
    with pytest.raises(Exception, match="not a GIF"):
        gif_frame_features(df).collect()


def test_corrupt_first_code_after_clear_is_loud():
    """ADVICE r6: with prev=None (first code after CLEAR) a code beyond the
    table raised a bare IndexError instead of the documented corrupt-stream
    ValueError. min_code_size=2 -> table has 6 slots (4 roots + clear/end);
    code 7 as the very first code is corruption either way."""
    from etl_hiscox_spark.operators.gif import _lzw_decode

    with pytest.raises(ValueError, match="corrupt LZW"):
        _lzw_decode(bytes([0b00000111]), 2)  # 3-bit code 7, prev=None
