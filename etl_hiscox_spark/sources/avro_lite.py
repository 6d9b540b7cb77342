"""Minimal Avro Object Container File codec — stdlib only.

Same policy as :mod:`xlsx_lite` (and the BMP/WAV/GIF codecs): the
spark-avro jar is not deployable in this container, so the Avro surface
gets a REAL fallback instead of a gate. Implements the public Avro 1.x
spec subset that row-interchange pipelines (Kafka Connect landings)
actually produce:

- container framing: ``Obj\\x01`` magic, metadata map (``avro.schema``
  JSON + ``avro.codec``), 16-byte sync marker, blocks of
  (count, byte-size, payload, sync);
- codecs: ``null`` and ``deflate`` (raw zlib, wbits=-15);
- binary encoding: zigzag-varint int/long, IEEE LE float/double,
  length-prefixed string/bytes, boolean, null, records (fields in schema
  order), unions (varint branch index + value), arrays and maps in
  count-prefixed blocks with empty-block terminators;
- logical types: ``timestamp-micros``/``timestamp-millis`` surface as
  datetimes; others decode as their underlying primitive.

Not implemented (loud errors, never silent corruption): enums, fixed,
recursive schemas, snappy/zstd codecs.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from datetime import datetime, timezone

_MAGIC = b"Obj\x01"


# -- varint / zigzag ---------------------------------------------------------


def _write_long(n: int, out: bytearray) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # un-zigzag

    def at_end(self) -> bool:
        return self.pos >= len(self.data)


# -- schema ------------------------------------------------------------------

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "string", "bytes"}


def _type_of(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _check_supported(schema) -> None:
    t = _type_of(schema)
    if t in _PRIMITIVES:
        return
    if t == "union":
        # Only ["null", T] (either order) maps onto a nullable Spark column,
        # and _encode selects the branch purely by null-ness — a union with
        # two non-null branches (e.g. ["string","long"]) would silently
        # funnel every non-null value through the first branch (5 -> "5"),
        # exactly the silent corruption this module's policy forbids.
        non_null = [s for s in schema if _type_of(s) != "null"]
        if len(non_null) > 1:
            raise NotImplementedError(
                "avro_lite does not support unions with more than one "
                f"non-null branch (got {schema!r}); no Spark column type "
                "maps to a multi-type union and branch selection by "
                "null-ness would corrupt values silently"
            )
        for s in schema:
            _check_supported(s)
    elif t == "record":
        for f in schema["fields"]:
            _check_supported(f["type"])
    elif t == "array":
        _check_supported(schema["items"])
    elif t == "map":
        _check_supported(schema["values"])
    else:
        raise NotImplementedError(f"avro_lite does not support type {t!r}")


# -- decode ------------------------------------------------------------------


def _decode(schema, r: _Reader):
    t = _type_of(schema)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        v = r.read_long()
        lt = schema.get("logicalType") if isinstance(schema, dict) else None
        if lt == "timestamp-micros":
            return datetime.fromtimestamp(v / 1_000_000, tz=timezone.utc).replace(tzinfo=None)
        if lt == "timestamp-millis":
            return datetime.fromtimestamp(v / 1_000, tz=timezone.utc).replace(tzinfo=None)
        return v
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "string":
        return r.read(r.read_long()).decode("utf-8")
    if t == "bytes":
        return r.read(r.read_long())
    if t == "union":
        return _decode(schema[r.read_long()], r)
    if t == "record":
        return {f["name"]: _decode(f["type"], r) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block with explicit byte size
                n = -n
                r.read_long()
            out.extend(_decode(schema["items"], r) for _ in range(n))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read(r.read_long()).decode("utf-8")
                out[k] = _decode(schema["values"], r)
    raise NotImplementedError(f"avro_lite cannot decode type {t!r}")


# -- encode ------------------------------------------------------------------


def _encode(schema, val, out: bytearray) -> None:
    t = _type_of(schema)
    if t == "null":
        if val is not None:
            raise ValueError(f"non-null value {val!r} for null schema")
        return
    if t == "boolean":
        out.append(1 if val else 0)
    elif t in ("int", "long"):
        lt = schema.get("logicalType") if isinstance(schema, dict) else None
        if lt == "timestamp-micros" and isinstance(val, datetime):
            val = int(val.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
        elif lt == "timestamp-millis" and isinstance(val, datetime):
            val = int(val.replace(tzinfo=timezone.utc).timestamp() * 1_000)
        _write_long(int(val), out)
    elif t == "float":
        out += struct.pack("<f", float(val))
    elif t == "double":
        out += struct.pack("<d", float(val))
    elif t == "string":
        b = str(val).encode("utf-8")
        _write_long(len(b), out)
        out += b
    elif t == "bytes":
        b = bytes(val)
        _write_long(len(b), out)
        out += b
    elif t == "union":
        for i, branch in enumerate(schema):
            if (val is None) == (_type_of(branch) == "null"):
                _write_long(i, out)
                _encode(branch, val, out)
                return
        raise ValueError(f"no union branch for {val!r} in {schema}")
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], val.get(f["name"]), out)
    elif t == "array":
        if val:
            _write_long(len(val), out)
            for item in val:
                _encode(schema["items"], item, out)
        _write_long(0, out)
    elif t == "map":
        if val:
            _write_long(len(val), out)
            for k, v in val.items():
                kb = str(k).encode("utf-8")
                _write_long(len(kb), out)
                out += kb
                _encode(schema["values"], v, out)
        _write_long(0, out)
    else:
        raise NotImplementedError(f"avro_lite cannot encode type {t!r}")


# -- container ---------------------------------------------------------------


def read_container(data: bytes) -> tuple[dict, list[dict]]:
    """Parse one Object Container File; returns (schema, records)."""
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    r = _Reader(data)
    r.pos = 4
    meta = _decode({"type": "map", "values": "bytes"}, r)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} (null/deflate supported)")
    _check_supported(schema)
    sync = r.read(16)
    records: list[dict] = []
    while not r.at_end():
        count = r.read_long()
        size = r.read_long()
        payload = r.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        br = _Reader(payload)
        for _ in range(count):
            records.append(_decode(schema, br))
        if r.read(16) != sync:
            raise ValueError("avro block sync marker mismatch")
    return schema, records


def read_container_schema(path_or_bytes) -> dict:
    """Read ONLY the schema from a container header (no block decode)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        head = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            head = f.read(1 << 20)
    if head[:4] != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    r = _Reader(head)
    r.pos = 4
    meta = _decode({"type": "map", "values": "bytes"}, r)
    return json.loads(meta["avro.schema"])


def write_container(
    records: list[dict], schema: dict, codec: str = "deflate", block_records: int = 4096
) -> bytes:
    _check_supported(schema)
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} (null/deflate supported)")
    out = bytearray(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    _encode({"type": "map", "values": "bytes"}, meta, out)
    # deterministic sync marker (content-independent constant is fine: the
    # marker only needs to be consistent WITHIN one file)
    sync = b"etl_hiscox_sync!"
    out += sync
    for start in range(0, len(records), block_records):
        chunk = records[start : start + block_records]
        payload = bytearray()
        for rec in chunk:
            _encode(schema, rec, payload)
        body = bytes(payload)
        if codec == "deflate":
            body = zlib.compress(body, 6)[2:-4]  # raw deflate (strip zlib wrapper)
        _write_long(len(chunk), out)
        _write_long(len(body), out)
        out += body
        out += sync
    if not records:  # header-only file is still a valid container
        pass
    return bytes(out)
