"""Minimal Apache Avro object-container-file reader/writer — just
enough of the PUBLIC Avro 1.11 spec (avro.apache.org/docs/1.11.1/
specification) to read and write Apache Iceberg metadata (manifest
lists and manifest files are Avro), with no Avro library dependency.

Scale posture: Avro here is METADATA — manifest files are KBs-to-MBs
regardless of table size, and Iceberg readers everywhere process them
driver-side while the data files (parquet) go through the engine's
distributed scan. These functions are deliberately plain Python.

Reader: schema-driven decode using the WRITER schema embedded in the
container header (no schema resolution — the container always carries
the schema its blocks were written with). Codecs: ``null`` and
``deflate`` (raw RFC-1951, zlib wbits=-15 per spec); anything else
refuses loudly. Decoded records are plain dicts keyed by field name;
unions decode to the branch value (the ``null`` branch to ``None``) —
exactly the shape the Iceberg layer wants.

Writer: ``null`` codec only, primitives + record/array/map/union/fixed/
enum — enough to produce spec-valid manifest files (pinned by the
reader-side spec fixtures in tests, which are hand-assembled bytes, NOT
written by this writer)."""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string",
}


# ---------------------------------------------------------------- decode

class _Reader:
    def __init__(self, data: bytes):
        self.b = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.b):
            raise ValueError("avro: truncated input")
        out = self.b[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        """Zigzag varint (spec: int and long share this encoding)."""
        shift, acc = 0, 0
        while True:
            byte = self.read(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("avro: varint too long")
        return (acc >> 1) ^ -(acc & 1)

    def decode(self, schema):
        if isinstance(schema, str):
            name = schema
        elif isinstance(schema, list):  # union: long index, then value
            idx = self.long()
            if not 0 <= idx < len(schema):
                raise ValueError(f"avro: union index {idx} out of range")
            return self.decode(schema[idx])
        else:
            name = schema["type"]
        if name == "null":
            return None
        if name == "boolean":
            return self.read(1)[0] != 0
        if name in ("int", "long"):
            return self.long()
        if name == "float":
            return struct.unpack("<f", self.read(4))[0]
        if name == "double":
            return struct.unpack("<d", self.read(8))[0]
        if name == "bytes":
            return bytes(self.read(self.long()))
        if name == "string":
            return self.read(self.long()).decode("utf-8")
        if name == "fixed":
            return bytes(self.read(schema["size"]))
        if name == "enum":
            return schema["symbols"][self.long()]
        if name == "record":
            return {
                f["name"]: self.decode(f["type"]) for f in schema["fields"]
            }
        if name == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:  # negative count: abs(n) items after a byte size
                    n = -n
                    self.long()
                for _ in range(n):
                    out.append(self.decode(schema["items"]))
        if name == "map":
            out = {}
            while True:
                n = self.long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    self.long()
                for _ in range(n):
                    k = self.read(self.long()).decode("utf-8")
                    out[k] = self.decode(schema["values"])
        raise ValueError(f"avro: unsupported schema type {name!r}")


def read_container(data: bytes) -> tuple[dict, list]:
    """Parse a whole container file: returns (file metadata dict with
    'avro.schema' parsed to JSON, list of decoded records)."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError("avro: bad magic (not an object container file)")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = r.decode(meta_schema)
    sync = r.read(16)
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(
            f"avro: codec {codec!r} not supported (null/deflate only)"
        )
    schema = json.loads(meta["avro.schema"])
    records = []
    while r.pos < len(r.b):
        count = r.long()
        size = r.long()
        block = r.read(size)
        if codec == "deflate":  # raw RFC-1951 per spec
            block = zlib.decompress(block, -15)
        br = _Reader(block)
        for _ in range(count):
            records.append(br.decode(schema))
        if br.pos != len(block):
            raise ValueError("avro: trailing bytes in block")
        if r.read(16) != sync:
            raise ValueError("avro: sync marker mismatch")
    out_meta = {k: v for k, v in meta.items()}
    out_meta["avro.schema"] = schema
    return out_meta, records


def read_file(path: str) -> tuple[dict, list]:
    with open(path, "rb") as fh:
        return read_container(fh.read())


# ---------------------------------------------------------------- encode

def _zigzag(n: int) -> bytes:
    acc = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        byte = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _encode(schema, value, out: io.BytesIO) -> None:
    if isinstance(schema, list):  # union: pick the first matching branch
        for idx, branch in enumerate(schema):
            if _matches(branch, value):
                out.write(_zigzag(idx))
                _encode(branch, value, out)
                return
        raise ValueError(f"avro: no union branch for {value!r}")
    name = schema if isinstance(schema, str) else schema["type"]
    if name == "null":
        return
    if name == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif name in ("int", "long"):
        out.write(_zigzag(int(value)))
    elif name == "float":
        out.write(struct.pack("<f", value))
    elif name == "double":
        out.write(struct.pack("<d", value))
    elif name == "bytes":
        out.write(_zigzag(len(value)))
        out.write(value)
    elif name == "string":
        raw = value.encode("utf-8")
        out.write(_zigzag(len(raw)))
        out.write(raw)
    elif name == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("avro: fixed size mismatch")
        out.write(value)
    elif name == "enum":
        out.write(_zigzag(schema["symbols"].index(value)))
    elif name == "record":
        for f in schema["fields"]:
            _encode(f["type"], value[f["name"]], out)
    elif name == "array":
        if value:
            out.write(_zigzag(len(value)))
            for item in value:
                _encode(schema["items"], item, out)
        out.write(_zigzag(0))
    elif name == "map":
        if value:
            out.write(_zigzag(len(value)))
            for k, v in value.items():
                raw = k.encode("utf-8")
                out.write(_zigzag(len(raw)))
                out.write(raw)
                _encode(schema["values"], v, out)
        out.write(_zigzag(0))
    else:
        raise ValueError(f"avro: unsupported schema type {name!r}")


def _matches(branch, value) -> bool:
    name = branch if isinstance(branch, str) else branch["type"]
    if name == "null":
        return value is None
    if value is None:
        return False
    if name == "boolean":
        return isinstance(value, bool)
    if name in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if name in ("float", "double"):
        return isinstance(value, float)
    if name in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if name in ("string", "enum"):
        return isinstance(value, str)
    if name == "record":
        return isinstance(value, dict)
    if name == "array":
        return isinstance(value, list)
    if name == "map":
        return isinstance(value, dict)
    return False


def write_container(schema: dict, records: list, *, sync: bytes = b"\x00" * 16) -> bytes:
    """Spec-valid container bytes, null codec, one block."""
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
    }
    _encode({"type": "map", "values": "bytes"}, meta, out)
    out.write(sync)
    body = io.BytesIO()
    for rec in records:
        _encode(schema, rec, body)
    out.write(_zigzag(len(records)))
    out.write(_zigzag(len(body.getvalue())))
    out.write(body.getvalue())
    out.write(sync)
    return out.getvalue()


def write_file(path: str, schema: dict, records: list) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(write_container(schema, records))
