"""Metadata-level MP4 (ISO-BMFF) and MP3 parsing — pure stdlib ``struct``
byte-walking, no ffmpeg.

Full sample DECODE of MP4/MP3 legitimately needs ffmpeg (absent in this
environment; :mod:`.multimodal` keeps honest guards there). But the
CONTAINER metadata a curation pipeline filters on — duration, track
count, codec fourcc, bitrate, sample rate — is plain spec-defined byte
layout, the same spec-only approach that produced the built-in PNG/JPEG
codecs:

- **MP4 / ISO base media file format** (ISO/IEC 14496-12): the file is a
  tree of length-prefixed boxes. :func:`parse_mp4_meta` walks the tree —
  ``ftyp`` (major brand), ``moov/mvhd`` (timescale + duration, version 0
  and 1 layouts), ``moov/trak`` (track count), and each track's
  ``stbl/stsd`` first sample-entry fourcc (codec id). 64-bit largesize
  and size-to-EOF boxes handled.
- **MP3** (ISO/IEC 11172-3 / 13818-3): a sequence of self-describing
  frames. :func:`parse_mp3_meta` skips an ID3v2 tag (syncsafe length),
  finds the first sync word, then walks frame headers — version, layer,
  bitrate/sample-rate table lookups, padding — summing exact per-frame
  durations (samples-per-frame / sample rate). VBR streams therefore get
  a true duration, not a first-frame-bitrate guess; the reported
  bitrate_kbps is the byte-weighted average.

Spark-side, :func:`media_metadata` runs these per payload inside one
Arrow-batched ``mapInPandas`` stage with the payload column pruned
afterwards — identical shape to :func:`.multimodal.extract_metadata`.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

# -- MP4 / ISO-BMFF ---------------------------------------------------------

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in b[start:end]."""
    off = start
    while off + 8 <= end:
        size = int.from_bytes(b[off : off + 4], "big")
        btype = b[off + 4 : off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize follows the type
            if off + 16 > end:
                return
            size = int.from_bytes(b[off + 8 : off + 16], "big")
            body = off + 16
            if size < 16:
                return
        elif size == 0:  # box extends to end of enclosing scope
            size = end - off
        elif size < 8:
            return  # corrupt — stop rather than loop
        box_end = off + size
        if box_end > end:
            return
        yield btype, body, box_end
        off = box_end


def parse_mp4_meta(b: bytes) -> dict:
    """Container metadata of an ISO-BMFF (MP4/MOV/M4A) payload:
    {major_brand, timescale, duration_units, duration_s, track_count,
    codecs (list of sample-entry fourccs, one per track)}.
    Raises ValueError when the payload is not ISO-BMFF."""
    b = bytes(b)
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload (no ftyp box)")
    meta = {
        "major_brand": b[8:12].decode("latin-1"),
        "timescale": None,
        "duration_units": None,
        "duration_s": None,
        "track_count": 0,
        "codecs": [],
    }

    def visit(start: int, end: int) -> None:
        for btype, body, box_end in _walk_boxes(b, start, end):
            if btype == b"mvhd":
                if body >= box_end:
                    continue  # truncated box — skip, don't raise
                version = b[body]
                # version 1: creation/modification are 64-bit (16 bytes
                # after version+flags), then timescale:4 + duration:8;
                # version 0: 32-bit times (8 bytes), timescale:4 +
                # duration:4. Bounds-check against box_end so a valid
                # ftyp with a truncated mvhd yields NULLs, not a raise.
                at = body + 4 + (16 if version == 1 else 8)
                need = 12 if version == 1 else 8
                if at + need > box_end:
                    continue
                if version == 1:
                    ts, dur = struct.unpack_from(">IQ", b, at)
                else:
                    ts, dur = struct.unpack_from(">II", b, at)
                meta["timescale"] = ts
                meta["duration_units"] = dur
                meta["duration_s"] = dur / ts if ts else None
            elif btype == b"trak":
                meta["track_count"] += 1
                visit(body, box_end)
            elif btype == b"stsd":
                # version+flags (4), entry_count (4), then sample entries:
                # [size:4][fourcc:4]...
                if body + 16 <= box_end:
                    meta["codecs"].append(
                        b[body + 12 : body + 16].decode("latin-1")
                    )
            elif btype in _CONTAINERS:
                visit(body, box_end)

    visit(0, len(b))
    return meta


def mp4_sample_table(b: bytes, track_index: int = 0) -> list[tuple[int, int]]:
    """(offset, size) of every sample (frame) of one track, from the
    ISO-BMFF sample tables — the DEMUX step, no codec needed:

    - ``stsz``: per-sample sizes (or one uniform size),
    - ``stco``/``co64``: chunk byte offsets (32/64-bit),
    - ``stsc``: sample→chunk run-length map (first_chunk,
      samples_per_chunk runs; last run extends to the final chunk).

    Samples are laid consecutively within each chunk, so offsets are the
    chunk offset plus the running size of earlier samples in that chunk
    (ISO/IEC 14496-12 §8.7). Raises ValueError when the track or its
    tables are absent."""
    b = bytes(b)
    tracks: list[dict] = []

    def visit(start: int, end: int, cur: dict | None) -> None:
        for btype, body, box_end in _walk_boxes(b, start, end):
            if btype == b"trak":
                tracks.append({})
                visit(body, box_end, tracks[-1])
            elif btype in _CONTAINERS:
                visit(body, box_end, cur)
            elif cur is not None and btype in (b"stsz", b"stco", b"co64", b"stsc"):
                cur[btype.decode()] = (body, box_end)

    visit(0, len(b), None)
    if track_index >= len(tracks):
        raise ValueError(f"no track {track_index} (found {len(tracks)})")
    t = tracks[track_index]
    if "stsz" not in t or "stsc" not in t or ("stco" not in t and "co64" not in t):
        raise ValueError("track lacks stsz/stsc/stco sample tables")

    # stsz: version+flags(4), sample_size(4), sample_count(4)[, sizes...]
    body, _ = t["stsz"]
    uniform, n_samples = struct.unpack_from(">II", b, body + 4)
    if uniform:
        sizes = [uniform] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", b, body + 12))

    # chunk offsets
    if "stco" in t:
        body, _ = t["stco"]
        (n_chunks,) = struct.unpack_from(">I", b, body + 4)
        offsets = list(struct.unpack_from(f">{n_chunks}I", b, body + 8))
    else:
        body, _ = t["co64"]
        (n_chunks,) = struct.unpack_from(">I", b, body + 4)
        offsets = list(struct.unpack_from(f">{n_chunks}Q", b, body + 8))

    # stsc runs: (first_chunk 1-based, samples_per_chunk, desc_index)
    body, _ = t["stsc"]
    (n_runs,) = struct.unpack_from(">I", b, body + 4)
    runs = [
        struct.unpack_from(">III", b, body + 8 + 12 * i)[:2]
        for i in range(n_runs)
    ]
    per_chunk = []
    for i, (first, spc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else len(offsets)
        per_chunk += [spc] * (last - first + 1)

    out, si = [], 0
    for ci, chunk_off in enumerate(offsets):
        off = chunk_off
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= n_samples:
                break
            out.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(
            f"sample tables inconsistent: placed {si} of {n_samples} samples"
        )
    return out


def mp4_extract_samples(
    b: bytes, *, track_index: int = 0, max_samples: int | None = None
) -> list[bytes]:
    """Raw (undecoded) sample payloads of one track, in decode order —
    genuine container demux; DECODING the samples (h264/aac...) is where
    ffmpeg would start. Out-of-range entries raise (truncated file)."""
    b = bytes(b)
    table = mp4_sample_table(b, track_index)
    if max_samples is not None:
        table = table[:max_samples]
    out = []
    for off, size in table:
        if off + size > len(b):
            raise ValueError(
                f"sample at {off}+{size} exceeds payload ({len(b)} bytes)"
            )
        out.append(b[off : off + size])
    return out


# -- MP3 --------------------------------------------------------------------

# bitrate tables in kbps, index 1-14 (0 = free, 15 = bad)
_BR_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BR_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SR_V1 = [44100, 48000, 32000]


def _mp3_frame(b: bytes, off: int):
    """Parse one frame header at ``off``; returns (frame_bytes,
    samples_per_frame, sample_rate, bitrate_kbps) or None if invalid."""
    if off + 4 > len(b) or b[off] != 0xFF or (b[off + 1] & 0xE0) != 0xE0:
        return None
    b1, b2 = b[off + 1], b[off + 2]
    ver_bits = (b1 >> 3) & 0x3   # 0=MPEG2.5, 2=MPEG2, 3=MPEG1
    layer_bits = (b1 >> 1) & 0x3  # 1=III, 2=II, 3=I
    if ver_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits  # 1, 2, 3
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    padding = (b2 >> 1) & 0x1
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    if ver_bits == 3:  # MPEG1
        bitrate = _BR_V1[layer][br_idx]
        sr = _SR_V1[sr_idx]
        spf = 384 if layer == 1 else 1152
    else:  # MPEG2 (ver_bits=2, sr/2) or MPEG2.5 (ver_bits=0, sr/4)
        bitrate = _BR_V2[layer][br_idx]
        sr = _SR_V1[sr_idx] // (2 if ver_bits == 2 else 4)
        spf = 384 if layer == 1 else (1152 if layer == 2 else 576)
    if layer == 1:
        nbytes = (12 * bitrate * 1000 // sr + padding) * 4
    else:
        nbytes = spf // 8 * bitrate * 1000 // sr + padding
    if nbytes < 4:
        return None
    return nbytes, spf, sr, bitrate


def parse_mp3_meta(b: bytes) -> dict:
    """Frame-walk metadata of an MP3 payload: {sample_rate, frame_count,
    total_samples, duration_s, bitrate_kbps (byte-weighted average — exact
    for CBR, honest for VBR), has_id3}. Raises ValueError when no valid
    frame sequence is found."""
    b = bytes(b)
    off = 0
    has_id3 = b[:3] == b"ID3" and len(b) >= 10
    if has_id3:
        syncsafe = b[6:10]
        size = (
            (syncsafe[0] & 0x7F) << 21
            | (syncsafe[1] & 0x7F) << 14
            | (syncsafe[2] & 0x7F) << 7
            | (syncsafe[3] & 0x7F)
        )
        off = 10 + size
    # find the first sync word (tolerate leading junk)
    start = off
    while start + 4 <= len(b) and _mp3_frame(b, start) is None:
        start += 1
    frames, samples, byte_sum, sr = 0, 0, 0, None
    pos = start
    while True:
        fr = _mp3_frame(b, pos)
        if fr is None:
            break
        nbytes, spf, fsr, _br = fr
        if pos + nbytes > len(b):
            break  # truncated final frame
        frames += 1
        samples += spf
        byte_sum += nbytes
        sr = sr or fsr
        pos += nbytes
    if not frames:
        raise ValueError("no valid MP3 frames found")
    duration = samples / sr
    return {
        "sample_rate": sr,
        "frame_count": frames,
        "total_samples": samples,
        "duration_s": duration,
        "bitrate_kbps": (byte_sum * 8 / 1000) / duration if duration else 0.0,
        "has_id3": has_id3,
    }


# -- Spark stage ------------------------------------------------------------

MEDIA_META_SCHEMA = (
    "doc_id long, kind string, duration_s double, track_count long, "
    "codec string, sample_rate long, bitrate_kbps double"
)


def media_metadata(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Container-level metadata for MP4/MP3 payloads via one Arrow-batched
    ``mapInPandas`` stage (payload pruned afterwards). Rows whose payload
    is neither get kind=NULL and NULL metrics — filterable, never a
    per-row raise on mixed corpora."""
    pruned = df.select(id_col, "payload")

    def one(b) -> tuple:
        b = bytes(b)
        if len(b) >= 12 and b[4:8] == b"ftyp":
            # struct.error covers corrupt-but-ftyp payloads (e.g. an
            # undersized stsz/stsc) — the docstring's never-raise
            # contract must hold for every malformed shape, not just
            # the ones parse_mp4_meta bounds-checks itself.
            try:
                m = parse_mp4_meta(b)
            except (ValueError, struct.error):
                return (None, None, None, None, None, None)
            return (
                "mp4", m["duration_s"], m["track_count"],
                ",".join(m["codecs"]) or None, None, None,
            )
        try:
            m = parse_mp3_meta(b)
            return (
                "mp3", m["duration_s"], 1, "mp3",
                m["sample_rate"], m["bitrate_kbps"],
            )
        except ValueError:
            return (None, None, None, None, None, None)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [
                (int(i), *one(b))
                for i, b in zip(pdf[id_col].astype("int64"), pdf["payload"])
            ]
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "kind", "duration_s", "track_count",
                    "codec", "sample_rate", "bitrate_kbps",
                ],
            )

    return pruned.mapInPandas(gen, schema=MEDIA_META_SCHEMA)
