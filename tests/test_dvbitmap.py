"""Deletion-vector codec (sources/dvbitmap.py): byte-level spec pins
independent of the writer, plus roundtrips across container types."""

from __future__ import annotations

import struct

import pytest

from global_seismic_data_pipeline_spark.sources import dvbitmap as dv


def test_z85_spec_vector():
    """The ZeroMQ RFC 32 published test vector."""
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert dv.z85_encode(raw) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == raw
    with pytest.raises(ValueError):
        dv.z85_decode("~~~~~")  # ~ is not in the z85 alphabet


def test_roaring_roundtrip_all_container_types():
    import random

    random.seed(11)
    cases = [
        set(),
        {0},
        {65535, 65536},                      # bucket boundary
        set(range(5000)),                    # bitmap container (>4096)
        {random.randrange(1 << 20) for _ in range(3000)},
        {(1 << 32) + 5, 7, (3 << 32) + 1},   # sparse 64-bit buckets
    ]
    for c in cases:
        assert dv.bitmap_array_deserialize(dv.bitmap_array_serialize(c)) == c


def test_roaring_run_container_handassembled():
    """Reader decodes the RUN-container form (cookie 12347) from bytes
    assembled by hand off the RoaringFormatSpec — the writer never emits
    runs, so this pins the reader to the spec, not to the writer."""
    # one container, key 0, cardinality 6, runs: [3..5], [9..11]
    buf = (
        struct.pack("<I", 12347 | (0 << 16))  # cookie, size-1=0
        + bytes([0b1])                        # run bitset: container 0 runs
        + struct.pack("<HH", 0, 5)            # key 0, card-1 = 5
        # size < 4 -> no offsets
        + struct.pack("<H", 2)                # 2 runs
        + struct.pack("<HH", 3, 2)            # 3..3+2
        + struct.pack("<HH", 9, 2)            # 9..9+2
    )
    vals, pos = dv.roaring32_deserialize(buf)
    assert vals == {3, 4, 5, 9, 10, 11}
    assert pos == len(buf)


def test_dv_file_framing_and_checksum(tmp_path):
    p = str(tmp_path / "dv.bin")
    vals = {0, 3, 5, 100_000}
    desc = dv.write_dv_file(p, vals)
    assert desc["cardinality"] == 4
    assert dv.read_dv_file(p, desc["offset"], desc["sizeInBytes"]) == vals
    # flip one payload byte: the CRC must catch it
    raw = bytearray(open(p, "rb").read())
    raw[10] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum|magic|cookie"):
        dv.read_dv_file(p, desc["offset"], desc["sizeInBytes"])


def test_resolve_dv_storage_types(tmp_path):
    import os
    import uuid

    vals = {1, 2, 65536}
    u = uuid.uuid4()
    p = os.path.join(str(tmp_path), f"deletion_vector_{u}.bin")
    desc = dv.write_dv_file(p, vals)
    by_uuid = {
        "storageType": "u",
        "pathOrInlineDv": dv.z85_encode(u.bytes),
        "offset": desc["offset"],
        "sizeInBytes": desc["sizeInBytes"],
        "cardinality": 3,
    }
    assert dv.resolve_dv(str(tmp_path), by_uuid) == vals
    by_path = dict(by_uuid, storageType="p", pathOrInlineDv=p)
    assert dv.resolve_dv(str(tmp_path), by_path) == vals
    data = dv.dv_data(vals)
    pad = (4 - len(data) % 4) % 4
    inline = dict(
        by_uuid,
        storageType="i",
        pathOrInlineDv=dv.z85_encode(data + b"\x00" * pad),
        offset=0,
        sizeInBytes=len(data),
    )
    assert dv.resolve_dv(str(tmp_path), inline) == vals
    with pytest.raises(ValueError, match="storageType"):
        dv.resolve_dv(str(tmp_path), dict(by_uuid, storageType="x"))
