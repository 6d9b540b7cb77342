"""avro_lite container codec: binary-encoding edge cases, codecs, schema
support boundaries, and corruption detection. No fastavro/avro in the
container, so correctness rests on spec-derived fixtures plus exhaustive
internal round-trips — the hand-checked varint fixtures below pin the wire
format against the published Avro spec examples."""

from __future__ import annotations

import pytest

from etl_hiscox_spark.sources.avro_lite import (
    _Reader,
    _write_long,
    read_container,
    read_container_schema,
    write_container,
)


def test_zigzag_varint_spec_fixtures():
    # Avro spec, "Binary encoding / long": published example encodings.
    fixtures = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
                -64: b"\x7f", 64: b"\x80\x01", 8192: b"\x80\x80\x01"}
    for n, wire in fixtures.items():
        out = bytearray()
        _write_long(n, out)
        assert bytes(out) == wire, n
        assert _Reader(wire).read_long() == n


def test_zigzag_extremes_roundtrip():
    for n in (2**62, -(2**62), 2**63 - 1, -(2**63), 123456789012345):
        out = bytearray()
        _write_long(n, out)
        assert _Reader(bytes(out)).read_long() == n


SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "flags", "type": {"type": "array", "items": "boolean"}},
        {"name": "tags", "type": {"type": "map", "values": "long"}},
    ],
}
ROWS = [
    {"i": 1, "s": "héllo", "d": 2.5, "flags": [True, False], "tags": {"a": 1, "b": -7}},
    {"i": -9, "s": None, "d": -0.0, "flags": [], "tags": {}},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    data = write_container(ROWS, SCHEMA, codec=codec)
    schema, records = read_container(data)
    assert schema == SCHEMA
    assert records == ROWS
    assert read_container_schema(data) == SCHEMA


def test_multiblock_container():
    rows = [{"i": n, "s": str(n), "d": n / 2, "flags": [n % 2 == 0], "tags": {}} for n in range(1000)]
    data = write_container(rows, SCHEMA, block_records=128)
    _, records = read_container(data)
    assert records == rows


def test_corruption_detected():
    data = bytearray(write_container(ROWS, SCHEMA, codec="null"))
    with pytest.raises(ValueError, match="bad magic"):
        read_container(b"PAR1" + bytes(data[4:]))
    data[-3] ^= 0xFF  # flip a byte inside the trailing sync marker
    with pytest.raises(ValueError, match="sync marker"):
        read_container(bytes(data))


def test_unsupported_loud():
    with pytest.raises(NotImplementedError, match="enum"):
        write_container([], {"type": "enum", "name": "e", "symbols": ["A"]})
    with pytest.raises(NotImplementedError, match="snappy"):
        write_container([], SCHEMA, codec="snappy")


def test_container_roundtrip_fuzz():
    """Hypothesis: arbitrary records over the supported type lattice
    round-trip bit-exactly through both codecs."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    schema = {
        "type": "record",
        "name": "fz",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "bytes"},
            {"name": "flags", "type": {"type": "array", "items": "boolean"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
        ],
    }
    rec = st.fixed_dictionaries(
        {
            "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "s": st.one_of(st.none(), st.text(max_size=40)),
            "d": st.floats(allow_nan=False),  # NaN != NaN breaks equality, not codec
            "b": st.binary(max_size=30),
            "flags": st.lists(st.booleans(), max_size=5),
            "m": st.dictionaries(st.text(max_size=8), st.integers(-1000, 1000), max_size=4),
        }
    )

    @settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(rec, max_size=12), st.sampled_from(["null", "deflate"]))
    def run(rows, codec):
        got_schema, got = read_container(write_container(rows, schema, codec=codec))
        assert got_schema == schema and got == rows

    run()


def test_multi_nonnull_union_rejected():
    """ADVICE r6: _encode picks a union branch solely by null-ness, so a
    ["string","long"] union would silently encode 5 as "5". Both read and
    write paths must reject multi-non-null unions loudly instead."""
    schema = {
        "type": "record",
        "name": "u",
        "fields": [{"name": "x", "type": ["string", "long"]}],
    }
    with pytest.raises(NotImplementedError, match="non-null branch"):
        write_container([{"x": 5}], schema)
    # ["null", T] in either order stays supported
    ok = {
        "type": "record",
        "name": "u2",
        "fields": [{"name": "x", "type": ["long", "null"]}],
    }
    _, got = read_container(write_container([{"x": 5}, {"x": None}], ok))
    assert got == [{"x": 5}, {"x": None}]
