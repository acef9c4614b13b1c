"""Minimal pure-Python Avro Object Container File (OCF) writer/reader.

Implements exactly the subset of the public Avro 1.x specification
(https://avro.apache.org/docs/current/specification/) that Iceberg
manifest and manifest-list files need: records, the primitives
null/boolean/int/long/float/double/bytes/string, unions (used only as
``["null", T]`` optionals), arrays, maps, and fixed — with the "null"
codec (no compression; spec-compliant and self-describing).

Written because the sandbox ships no python Avro implementation
(pyiceberg/fastavro/avro all absent) while Iceberg REQUIRES manifests
in Avro.  Conformance is pinned by tests that read files produced here
with the Java reference implementation (avro-1.12 on Spark's JVM
classpath, driven over py4j) — see tests/test_iceberg_meta.py.

Encoding summary (binary encoding, spec §"Binary encoding"):
- int/long: zigzag then little-endian base-128 varint;
- bytes/string: long length prefix + raw/UTF-8 bytes;
- boolean: one byte; float/double: IEEE-754 little-endian;
- union: long branch index, then the branch value;
- record: field values in schema order, no framing;
- array/map: one or more blocks of (count, items...) ending with 0;
- file: magic ``Obj\\x01`` + metadata map (avro.schema, avro.codec) +
  16-byte sync marker, then data blocks of
  (object count, byte size, objects, sync marker).
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Any, Iterable, Iterator

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker (any 16 bytes is valid)


# ------------------------------------------------------------ encoding


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & ((1 << 64) - 1)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def write_string(buf: io.BytesIO, s: str) -> None:
    write_bytes(buf, s.encode("utf-8"))


def _resolve(schema: Any, named: dict) -> Any:
    """Follow named-type references ("manifest_entry" → its record)."""
    if isinstance(schema, str) and schema in named:
        return named[schema]
    return schema


def write_datum(buf: io.BytesIO, schema: Any, value: Any, named: dict) -> None:
    schema = _resolve(schema, named)
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            bt = _resolve(branch, named)
            tname = bt if isinstance(bt, str) else bt.get("type")
            if value is None and tname == "null":
                write_long(buf, i)
                return
            if value is not None and tname != "null":
                write_long(buf, i)
                write_datum(buf, bt, value, named)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        write_bytes(buf, bytes(value))
    elif t == "string":
        write_string(buf, value)
    elif t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(bytes(value))
    elif t == "record":
        if schema.get("name"):
            named[schema["name"]] = schema
        for f in schema["fields"]:
            write_datum(buf, f["type"], value.get(f["name"]), named)
    elif t == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                write_datum(buf, schema["items"], item, named)
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                write_string(buf, k)
                write_datum(buf, schema["values"], v, named)
        write_long(buf, 0)
    else:
        raise ValueError(f"unsupported avro type: {t}")


# ------------------------------------------------------------ decoding


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return out

    def read_long(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return _unzigzag(acc)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")


def read_datum(r: _Reader, schema: Any, named: dict) -> Any:
    schema = _resolve(schema, named)
    if isinstance(schema, list):  # union
        return read_datum(r, schema[r.read_long()], named)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_string()
    if t == "fixed":
        return r.read(schema["size"])
    if t == "record":
        if schema.get("name"):
            named[schema["name"]] = schema
        return {f["name"]: read_datum(r, f["type"], named) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                r.read_long()
                n = -n
            for _ in range(n):
                out.append(read_datum(r, schema["items"], named))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                r.read_long()
                n = -n
            for _ in range(n):
                k = r.read_string()
                out[k] = read_datum(r, schema["values"], named)
    raise ValueError(f"unsupported avro type: {t}")


# ------------------------------------------------------------ container


def write_ocf(
    path: str,
    schema: dict,
    records: Iterable[dict],
    metadata: dict[str, str] | None = None,
) -> int:
    """Write an Avro OCF with the null codec; returns file length in
    bytes.  ``metadata`` entries land in the file-metadata map beside
    avro.schema/avro.codec (Iceberg stores its manifest schema/spec
    keys there)."""
    buf = io.BytesIO()
    buf.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema), "avro.codec": "null"}
    meta.update(metadata or {})
    write_long(buf, len(meta))
    for k, v in meta.items():
        write_string(buf, k)
        write_bytes(buf, v.encode("utf-8"))
    write_long(buf, 0)
    buf.write(SYNC)

    body = io.BytesIO()
    n = 0
    named: dict = {}
    for rec in records:
        write_datum(body, schema, rec, named)
        n += 1
    if n:
        write_long(buf, n)
        write_bytes(buf, body.getvalue())
        buf.write(SYNC)

    data = buf.getvalue()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return len(data)


def read_ocf(path: str) -> tuple[dict, dict[str, bytes], list[dict]]:
    """Read an OCF (null or deflate codec): returns
    (writer schema, file metadata, records)."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    if r.read(4) != MAGIC:
        raise ValueError(f"{path}: not an avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            r.read_long()
            n = -n
        for _ in range(n):
            k = r.read_string()
            meta[k] = r.read_bytes()
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    records: list[dict] = []
    named: dict = {}
    while r.pos < len(r.data):
        count = r.read_long()
        block = r.read_bytes()
        if codec == "deflate":
            import zlib

            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        br = _Reader(block)
        for _ in range(count):
            records.append(read_datum(br, schema, named))
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, meta, records
