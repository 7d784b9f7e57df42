"""Delta deletion-vector codec — Z85, 32-bit Roaring bitmaps, the
64-bit RoaringBitmapArray, and the DV file framing, all from the PUBLIC
specs (Delta PROTOCOL.md "Deletion Vectors" + the RoaringFormatSpec at
github.com/RoaringBitmap/RoaringFormatSpec + ZeroMQ RFC 32/Z85), no
library dependency.

Scale posture: a deletion vector is per-file tombstone METADATA —
bounded by the engine's rewrite policy (files with too many deletes get
compacted), read driver-side by every Delta client during planning.
The row filtering itself happens distributed (anti-join on
``_metadata.row_index`` — see ``deltalog._scan_adds``).

Framing implemented here (PROTOCOL.md "Deletion Vector Format"):

- DV FILE (storageType "u"/"p"): 1-byte version (=1), then per stored
  DV at its add-action ``offset``: [dataSize: 4-byte big-endian]
  [data: dataSize bytes][CRC-32 of data: 4-byte big-endian].
- data = [magic 1681511377: 4-byte little-endian][RoaringBitmapArray].
- INLINE (storageType "i"): ``pathOrInlineDv`` is the Z85 encoding of
  ``data``; no framing, ``sizeInBytes`` = len(data).
- RoaringBitmapArray "portable": [number of 32-bit bitmaps: 8-byte
  little-endian][each bitmap's standard 32-bit serialization, in
  order]; bitmap i covers values [i·2³², (i+1)·2³²).
- 32-bit Roaring standard: cookie 12346 (no runs: +4-byte container
  count, offsets always) or 12347 (runs: count-1 packed in the cookie's
  upper 16 bits, run bitset, offsets only when count ≥ 4); then (key,
  cardinality-1) descriptors and array (2-byte values) / bitmap (8 KiB)
  / run (n_runs, start/len-1 pairs) containers.

The writer emits the no-run form (always spec-valid); the reader
accepts both cookies and all three container types — pinned by
hand-assembled byte fixtures in tests, independent of the writer.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

DV_MAGIC = 1681511377
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 encodes 4-byte groups")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 decodes 5-char groups")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for ch in text[i : i + 5]:
            if ch not in _Z85_INDEX:
                raise ValueError(f"invalid z85 character {ch!r}")
            v = v * 85 + _Z85_INDEX[ch]
        if v > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------------------- 32-bit roaring

def roaring32_serialize(values) -> bytes:
    """Standard no-run serialization (cookie 12346) of a set of uint32s."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        if not 0 <= v <= 0xFFFFFFFF:
            raise ValueError(f"value {v} out of uint32 range")
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    out = bytearray()
    out += struct.pack("<II", _COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    # container payloads (offsets need their sizes first)
    payloads = []
    for k in keys:
        vals = by_key[k]
        if len(vals) <= 4096:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            bits = bytearray(8192)
            for lo in vals:
                bits[lo >> 3] |= 1 << (lo & 7)
            payloads.append(bytes(bits))
    pos = len(out) + 4 * len(keys)
    for p in payloads:
        out += struct.pack("<I", pos)
        pos += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def roaring32_deserialize(buf: bytes, pos: int = 0) -> tuple[set[int], int]:
    """Decode one standard 32-bit roaring bitmap starting at ``pos``;
    returns (values, next position)."""
    (first,) = struct.unpack_from("<I", buf, pos)
    cookie = first & 0xFFFF
    run_flags = b""
    if cookie == _COOKIE_RUN:
        size = (first >> 16) + 1
        pos += 4
        nbytes = (size + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    descr = []
    for i in range(size):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        descr.append((k, cm1 + 1))
    if has_offsets:
        pos += 4 * size  # offsets are redundant for sequential decode
    values: set[int] = set()
    for i, (k, card) in enumerate(descr):
        base = k << 16
        is_run = bool(run_flags) and bool(run_flags[i >> 3] & (1 << (i & 7)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, lm1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.update(base + x for x in range(start, start + lm1 + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.update(base + v for v in vals)
        else:
            chunk = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, byte in enumerate(chunk):
                while byte:
                    low = byte & -byte
                    values.add(base + byte_i * 8 + low.bit_length() - 1)
                    byte ^= low
    return values, pos


# -------------------------------------------- 64-bit bitmap array

def bitmap_array_serialize(values) -> bytes:
    """RoaringBitmapArray portable bytes for a set of uint64 row
    indexes (bitmap i covers [i·2³², (i+1)·2³²); trailing bitmaps up to
    the max key are DENSE — absent middle keys serialize as empty)."""
    by_hi: dict[int, set[int]] = {}
    for v in values:
        if v < 0:
            raise ValueError("row indexes are non-negative")
        by_hi.setdefault(v >> 32, set()).add(v & 0xFFFFFFFF)
    n = (max(by_hi) + 1) if by_hi else 0
    out = bytearray(struct.pack("<Q", n))
    for i in range(n):
        out += roaring32_serialize(by_hi.get(i, set()))
    return bytes(out)


def bitmap_array_deserialize(buf: bytes) -> set[int]:
    (n,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    values: set[int] = set()
    for i in range(n):
        vals, pos = roaring32_deserialize(buf, pos)
        values.update((i << 32) | v for v in vals)
    if pos != len(buf):
        raise ValueError("trailing bytes after bitmap array")
    return values


# ------------------------------------------------- DV file framing

def dv_data(values) -> bytes:
    """The checksummed payload: magic + bitmap array."""
    return struct.pack("<I", DV_MAGIC) + bitmap_array_serialize(values)


def decode_dv_data(data: bytes) -> set[int]:
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    return bitmap_array_deserialize(data[4:])


def write_dv_file(path: str, values) -> dict:
    """Write a single-DV file; returns the add-action descriptor fields
    (offset / sizeInBytes / cardinality)."""
    return write_dv_multi(path, {"_": values})["_"]


def write_dv_multi(path: str, items: dict) -> dict:
    """Pack several DVs into ONE file (how Delta writers amortize a
    multi-file DELETE): sequential [size][data][crc] frames after the
    version byte. Returns {key: descriptor-fields} with each DV's
    offset."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    out = {}
    with open(path, "wb") as fh:
        fh.write(b"\x01")  # format version
        pos = 1
        for key, values in items.items():
            data = dv_data(values)
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
            out[key] = {
                "offset": pos,
                "sizeInBytes": len(data),
                "cardinality": len(set(values)),
            }
            pos += 4 + len(data) + 4
    return out


def read_dv_file(path: str, offset: int, size_in_bytes: int) -> set[int]:
    with open(path, "rb") as fh:
        raw = fh.read()
    if not raw or raw[0] != 1:
        raise ValueError(f"unsupported DV file version {raw[:1]!r}")
    (n,) = struct.unpack_from(">i", raw, offset)
    if n != size_in_bytes:
        raise ValueError(
            f"DV size mismatch: framed {n}, add action says {size_in_bytes}"
        )
    data = raw[offset + 4 : offset + 4 + n]
    (crc,) = struct.unpack_from(">I", raw, offset + 4 + n)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError("DV checksum mismatch")
    return decode_dv_data(data)


def resolve_dv(table_path: str, descriptor: dict) -> set[int]:
    """Deleted row indexes for one add action's ``deletionVector``."""
    st = descriptor["storageType"]
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])
        if len(data) < descriptor.get("sizeInBytes", 0):
            raise ValueError("inline DV shorter than sizeInBytes")
        return decode_dv_data(data[: descriptor["sizeInBytes"]])
    if st == "p":
        path = descriptor["pathOrInlineDv"]
        path = path[5:] if path.startswith("file:") else path
    elif st == "u":
        enc = descriptor["pathOrInlineDv"]
        prefix, tail = enc[:-20], enc[-20:]
        u = _uuid.UUID(bytes=z85_decode(tail))
        rel = f"deletion_vector_{u}.bin"
        path = os.path.join(table_path, prefix, rel) if prefix else os.path.join(
            table_path, rel
        )
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    return read_dv_file(
        path, descriptor["offset"], descriptor["sizeInBytes"]
    )
