"""MP4 / MP3 metadata parsers on hand-crafted minimal fixtures, and the
Arrow-batched Spark stage over mixed payloads."""

from __future__ import annotations

import struct

import pytest

from global_seismic_data_pipeline_spark.operators import codecs, mediameta


# -- fixture builders -------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mp4(timescale=600, duration=3000, tracks=("avc1", "mp4a"), large=False):
    mvhd = b"\x00" + b"\x00\x00\x00"          # version 0 + flags
    mvhd += struct.pack(">II", 0, 0)           # ctime, mtime
    mvhd += struct.pack(">II", timescale, duration)
    mvhd += b"\x00" * 80                       # rate/volume/matrix padding
    traks = b""
    for fourcc in tracks:
        entry = struct.pack(">I", 16) + fourcc.encode() + b"\x00" * 8
        stsd = _box(b"stsd", b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry)
        traks += _box(b"trak", _box(b"mdia", _box(b"minf", _box(b"stbl", stsd))))
    moov_payload = _box(b"mvhd", mvhd) + traks
    if large:
        # 64-bit largesize form: size=1, then 8-byte size
        moov = (
            struct.pack(">I", 1) + b"moov"
            + struct.pack(">Q", 16 + len(moov_payload)) + moov_payload
        )
    else:
        moov = _box(b"moov", moov_payload)
    return _box(b"ftyp", b"isom" + b"\x00\x00\x00\x01" + b"mp41") + moov


def _mp3_frame(bitrate_idx=9, sr_idx=0, padding=0) -> bytes:
    # MPEG1 Layer III: 0xFF 0xFB, bitrate/sr/padding in byte 2
    hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1), 0xC4])
    bitrate = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320][bitrate_idx]
    sr = [44100, 48000, 32000][sr_idx]
    nbytes = 144 * bitrate * 1000 // sr + padding
    return hdr + b"\x00" * (nbytes - 4)


def _mp3(n_frames=3, with_id3=True, **kw) -> bytes:
    body = b"".join(_mp3_frame(**kw) for _ in range(n_frames))
    if not with_id3:
        return body
    # ID3v2.4 header with a 10-byte syncsafe tag body
    return b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10 + body


# -- parser unit tests ------------------------------------------------------


def test_mp4_box_walk():
    m = mediameta.parse_mp4_meta(_mp4())
    assert m["major_brand"] == "isom"
    assert (m["timescale"], m["duration_units"]) == (600, 3000)
    assert m["duration_s"] == pytest.approx(5.0)
    assert m["track_count"] == 2
    assert m["codecs"] == ["avc1", "mp4a"]


def test_mp4_largesize_box():
    m = mediameta.parse_mp4_meta(_mp4(large=True))
    assert m["duration_s"] == pytest.approx(5.0) and m["track_count"] == 2


def test_mp4_rejects_non_bmff():
    with pytest.raises(ValueError, match="ftyp"):
        mediameta.parse_mp4_meta(b"\x00" * 64)


def test_mp3_frame_walk_cbr():
    m = mediameta.parse_mp3_meta(_mp3(n_frames=3))
    assert m["sample_rate"] == 44100
    assert m["frame_count"] == 3 and m["total_samples"] == 3 * 1152
    assert m["duration_s"] == pytest.approx(3 * 1152 / 44100)
    assert m["bitrate_kbps"] == pytest.approx(128, rel=0.01)
    assert m["has_id3"]


def test_mp3_vbr_average_bitrate():
    body = _mp3_frame(bitrate_idx=9) + _mp3_frame(bitrate_idx=14)  # 128 + 320
    m = mediameta.parse_mp3_meta(body)
    assert m["frame_count"] == 2
    assert 128 < m["bitrate_kbps"] < 320  # byte-weighted average
    assert not m["has_id3"]


def test_mp3_truncated_final_frame_ignored():
    full = _mp3(n_frames=2, with_id3=False)
    m = mediameta.parse_mp3_meta(full + _mp3_frame()[:100])
    assert m["frame_count"] == 2


def test_mp3_rejects_garbage():
    with pytest.raises(ValueError, match="no valid MP3"):
        mediameta.parse_mp3_meta(b"\x01\x02\x03" * 50)


def test_sniff_recognizes_mp4_and_mp3():
    assert codecs.sniff(_mp4()) == "mp4"
    assert codecs.sniff(_mp3()) == "mp3"               # ID3-tagged
    assert codecs.sniff(_mp3(with_id3=False)) == "mp3"  # bare sync word
    assert codecs.sniff(b"\xff\xd8\xff\xe0JFIF") == "jpeg"  # not mp3


# -- Spark stage ------------------------------------------------------------


def test_mp4_truncated_mvhd_yields_nulls_not_raise():
    """A valid ftyp with an UNDERSIZED mvhd (fewer bytes than the version's
    fixed layout) must not raise struct.error — the reads are bounds-checked
    against box_end and the metadata stays NULL."""
    bad = _box(b"ftyp", b"isom" + b"\x00" * 8) + _box(
        b"moov", _box(b"mvhd", b"\x00\x00\x00\x00" + b"\x00" * 6)
    )
    m = mediameta.parse_mp4_meta(bad)
    assert m["timescale"] is None and m["duration_s"] is None


def test_media_metadata_stage_corrupt_mp4_payload(spark):
    """docstring contract: 'never a per-row raise on mixed corpora' — a
    corrupt-but-ftyp payload (undersized stsz-style garbage inside moov)
    maps to a NULL row instead of failing the Spark stage."""
    corrupt = (
        _box(b"ftyp", b"isom" + b"\x00" * 8)
        + _box(b"moov", _box(b"mvhd", b"\x01" + b"\x00" * 3))  # v1, truncated
    )
    rows = [(0, bytearray(_mp4())), (1, bytearray(corrupt))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in mediameta.media_metadata(df).collect()}
    assert got[0].kind == "mp4"
    # the corrupt payload is still BMFF-shaped → kind=mp4, NULL metrics
    assert got[1].duration_s is None and got[1].codec is None


def test_media_metadata_stage_mixed_payloads(spark):
    rows = [
        (0, bytearray(_mp4())),
        (1, bytearray(_mp3(n_frames=5))),
        (2, bytearray(b"not media at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in mediameta.media_metadata(df).collect()}
    assert got[0].kind == "mp4" and got[0].track_count == 2
    assert got[0].codec == "avc1,mp4a"
    assert got[1].kind == "mp3" and got[1].sample_rate == 44100
    assert got[1].duration_s == pytest.approx(5 * 1152 / 44100)
    assert got[2].kind is None and got[2].duration_s is None


def test_extract_audio_features_mp3_metadata_level(spark):
    """MP3 no longer raises: exact header-derived sample counts, NULL for
    the sample-dependent features; WAV keeps its full decode."""
    import numpy as np

    from global_seismic_data_pipeline_spark.operators import multimodal

    wav = codecs.encode_wav(
        np.array([0, 1000, -1000, 500], dtype=np.int16), 8000
    )
    df = spark.createDataFrame(
        [(0, bytearray(_mp3(n_frames=4))), (1, bytearray(wav))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in multimodal.extract_audio_features(df).collect()}
    assert got[0].sample_rate == 44100
    assert got[0].num_samples == 4 * 1152
    assert got[0].duration_s == pytest.approx(4 * 1152 / 44100)
    assert got[0].rms is None and got[0].peak is None
    assert got[1].sample_rate == 8000 and got[1].peak == 1000


# -- MP4 sample-table demux -------------------------------------------------


def _mp4_with_samples(sizes=(3, 4, 5, 6, 7), chunks=((1, 2), (2, 3)),
                      co64=False, uniform=0):
    """ftyp + mdat(samples) + moov(trak with stsz/stsc/stco tables whose
    offsets point into the mdat)."""
    samples = [bytes([65 + i]) * s for i, s in enumerate(sizes)]
    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 8)
    mdat = _box(b"mdat", b"".join(samples))
    data_start = len(ftyp) + 8  # mdat body offset in the file

    # assign samples to chunks by walking the stsc runs
    chunk_sizes, si, ci = [], 0, 1
    while si < len(sizes):
        spc = None
        for j, (first, s) in enumerate(chunks):
            nxt = chunks[j + 1][0] if j + 1 < len(chunks) else 10**9
            if first <= ci < nxt:
                spc = s
        take = min(spc, len(sizes) - si)
        chunk_sizes.append(sum(sizes[si:si + take]))
        si += take
        ci += 1
    offs, acc = [], data_start
    for cs in chunk_sizes:
        offs.append(acc)
        acc += cs

    if uniform:
        stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">II", uniform, len(sizes)))
    else:
        stsz = _box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, len(sizes))
                    + b"".join(struct.pack(">I", s) for s in sizes))
    stsc = _box(b"stsc", b"\x00" * 4 + struct.pack(">I", len(chunks))
                + b"".join(struct.pack(">III", c, s, 1) for c, s in chunks))
    if co64:
        stco = _box(b"co64", b"\x00" * 4 + struct.pack(">I", len(offs))
                    + b"".join(struct.pack(">Q", o) for o in offs))
    else:
        stco = _box(b"stco", b"\x00" * 4 + struct.pack(">I", len(offs))
                    + b"".join(struct.pack(">I", o) for o in offs))
    entry = struct.pack(">I", 16) + b"avc1" + b"\x00" * 8
    stsd = _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
    stbl = _box(b"stbl", stsd + stsz + stsc + stco)
    trak = _box(b"trak", _box(b"mdia", _box(b"minf", stbl)))
    moov = _box(b"moov", trak)
    return ftyp + mdat + moov, samples


def test_mp4_sample_table_demux():
    payload, samples = _mp4_with_samples()
    got = mediameta.mp4_extract_samples(payload)
    assert got == samples  # byte-exact demux across two chunks


def test_mp4_sample_table_co64_and_cap():
    payload, samples = _mp4_with_samples(co64=True)
    assert mediameta.mp4_extract_samples(payload, max_samples=2) == samples[:2]


def test_mp4_sample_table_uniform_sizes():
    payload, samples = _mp4_with_samples(
        sizes=(4, 4, 4), chunks=((1, 3),), uniform=4
    )
    assert mediameta.mp4_extract_samples(payload) == samples


def test_mp4_out_of_range_offset_raises():
    payload, _ = _mp4_with_samples()
    # point the last chunk offset past the end of the file
    idx = payload.index(b"stco")
    n_off = struct.unpack_from(">I", payload, idx + 8)[0]
    last_off_pos = idx + 12 + 4 * (n_off - 1)
    bad = (payload[:last_off_pos] + struct.pack(">I", len(payload) + 100)
           + payload[last_off_pos + 4:])
    with pytest.raises(ValueError, match="exceeds payload"):
        mediameta.mp4_extract_samples(bad)


def test_mp4_missing_tables_raises():
    with pytest.raises(ValueError, match="stsz|no track"):
        mediameta.mp4_sample_table(_mp4())  # metadata-only fixture


def test_sample_frames_demuxes_mp4(spark):
    """sample_frames over an MP4 payload emits the raw track samples as
    frame rows — container demux through the Spark stage."""
    from global_seismic_data_pipeline_spark.operators import multimodal

    payload, samples = _mp4_with_samples()
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    got = sorted(
        (r.doc_id, r.frame_idx, bytes(r.frame))
        for r in multimodal.sample_frames(df, max_frames=4).collect()
    )
    assert got == [(7, i, s) for i, s in enumerate(samples[:4])]
