"""Real, dependency-free media codecs for the multimodal operators.

The container ships no image/audio libraries (no PIL, no ffmpeg), but
four formats are fully decodable with the standard library + numpy alone:

- **BMP** (Windows bitmap, uncompressed 24-bit): fixed 54-byte header with
  little-endian size fields, bottom-up BGR rows padded to 4 bytes. Encode
  and decode are pure numpy.
- **PNG**: zlib (stdlib) deflate over filtered scanlines. The decoder
  implements all five scanline filters (None/Sub/Up/Average/Paeth) for
  8-bit gray/RGB/RGBA, the encoder writes filter-0 RGB with correct CRCs
  — round-trips through any standards-compliant reader.
- **WAV** (RIFF PCM): the stdlib ``wave`` module parses the container;
  samples land in a numpy int16 array.

- **JPEG** (baseline sequential DCT): full spec-table codec in
  :mod:`.jpegcodec` — canonical Huffman entropy coding, matrix IDCT,
  chroma subsampling, restart markers. Progressive/arithmetic variants
  raise NotImplementedError.

These give :mod:`.multimodal` a *real* codec path — decode, resize,
feature-extract, frame-slice on actual pixel/sample data — while MP4/MP3
stay behind the documented NotImplementedError guards (video/audio
entropy stacks legitimately need ffmpeg; reference parity: the reference
pipeline treats media as opaque blobs + metadata; see SURVEY.md §2
multimodal extension rows).

Everything here is per-payload Python called from Arrow-batched
``mapInPandas`` stages — the distributed contract (pruned columns, batch
iteration, schema) lives in :mod:`.multimodal`; this module is only the
innermost decode kernel, exactly the part a real PIL/ffmpeg build would
replace.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

BMP_HEADER_SIZE = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def sniff(payload: bytes) -> str | None:
    """Identify a payload by magic bytes: 'bmp', 'wav', 'png', 'jpeg',
    'mp4', 'mp3', or None."""
    b = bytes(payload[:12])
    if b[:2] == b"BM":
        return "bmp"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return "mp4"
    if b[:3] == b"ID3":
        return "mp3"
    if (
        len(b) >= 3
        and b[0] == 0xFF
        and (b[1] & 0xE0) == 0xE0          # frame sync (jpeg caught above)
        and (b[1] >> 3) & 0x3 != 1         # valid MPEG version
        and (b[1] >> 1) & 0x3 != 0         # valid layer
        and (b[2] >> 4) & 0xF != 0xF       # valid bitrate index
        and (b[2] >> 2) & 0x3 != 3         # valid sample-rate index
    ):
        return "mp3"
    return None


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {pixels.shape}")
    h, w = pixels.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * h
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", BMP_HEADER_SIZE + img_size, 0, 0, BMP_HEADER_SIZE,
        40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    # BMP stores rows bottom-up in BGR order
    bgr = pixels[::-1, :, ::-1].astype(np.uint8)
    if pad:
        rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return header + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP into an (h, w, 3) uint8 RGB array.

    Supports the common BITMAPINFOHEADER layout (positive height =
    bottom-up rows). Compressed or non-24-bit BMPs raise ValueError.
    """
    b = bytes(payload)
    if len(b) < BMP_HEADER_SIZE or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_stride = (w * 3 + 3) // 4 * 4
    need = data_offset + row_stride * h
    if len(b) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(b, dtype=np.uint8, count=row_stride * h, offset=data_offset)
    rows = rows.reshape(h, row_stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def decode_image(payload: bytes) -> tuple[str, np.ndarray]:
    """Sniff + decode an image payload with the built-in codecs.

    Returns (kind, (h, w, 3) uint8 RGB). JPEG (entropy coding needs a real
    library) and unknown formats raise NotImplementedError — the guard the
    multimodal operators surface verbatim."""
    b = bytes(payload)
    kind = sniff(b)
    if kind == "bmp":
        return "bmp", decode_bmp(b)
    if kind == "png":
        return "png", decode_png(b)
    if kind == "jpeg":
        from . import jpegcodec

        return "jpeg", jpegcodec.decode_jpeg(b)
    raise NotImplementedError(
        f"decoding {kind or 'unknown'} payloads requires PIL/libvips — "
        "built-in codecs cover BMP, PNG and baseline JPEG; pass fake=True "
        "for the deterministic stand-in"
    )


def encode_image(kind: str, pixels: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB back into ``kind`` ('bmp', 'png', 'jpeg')."""
    if kind == "bmp":
        return encode_bmp(pixels)
    if kind == "png":
        return encode_png(pixels)
    if kind == "jpeg":
        from . import jpegcodec

        return jpegcodec.encode_jpeg(pixels)
    raise NotImplementedError(f"no built-in encoder for {kind!r}")


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, 3) array to (height, width, 3).

    Uses the standard pixel-center mapping src = floor((dst + 0.5) * scale),
    the same grid PIL's NEAREST uses, so a future PIL drop-in matches.
    """
    src_h, src_w = pixels.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * src_h / height).astype(np.int64), src_h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * src_w / width).astype(np.int64), src_w - 1)
    return pixels[ys][:, xs]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG
    (filter 0 scanlines, one zlib stream, correct chunk CRCs)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {pixels.shape}")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    px = np.ascontiguousarray(pixels.astype(np.uint8))
    # prepend the filter byte (0 = None) to each scanline
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = px.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit gray/RGB/RGBA PNG into an (h, w, 3) uint8 RGB array
    (gray replicated, alpha dropped). Implements all five scanline filters;
    interlaced or non-8-bit images raise ValueError.
    """
    b = bytes(payload)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        tag = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG (depth={depth}, color={color})")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            ch = _PNG_CHANNELS[color]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG deflate stream: {e}") from e
    stride = 1 + w * ch
    if len(raw) < stride * h:
        raise ValueError("truncated PNG pixel data")
    lines = raw[: stride * h].reshape(h, stride)
    out = np.zeros((h, w * ch), dtype=np.uint8)
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        ftype, row = int(lines[y, 0]), lines[y, 1:].copy()
        if ftype == 0:
            rec = row
        elif ftype == 1:  # Sub: + recon[x - ch] — per-channel prefix sum
            rec = row.reshape(w, ch)
            np.add.accumulate(rec, axis=0, out=rec)  # uint8 wraps mod 256
            rec = rec.reshape(-1)
        elif ftype == 2:  # Up
            rec = row + prev
        elif ftype == 3:  # Average: sequential in x (left is reconstructed)
            rec = row
            for x in range(len(rec)):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(rec[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:  # Paeth: sequential in x
            rec = row
            for x in range(len(rec)):
                a = int(rec[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                rec[x] = (int(rec[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec
        prev = out[y]
    px = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode a 1-D int16 sample array as a mono 16-bit PCM WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM WAV into (int16 samples interleaved, sample_rate)."""
    with wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(f"unsupported WAV sample width {wf.getsampwidth()}")
        raw = wf.readframes(wf.getnframes())
        return np.frombuffer(raw, dtype="<i2"), wf.getframerate()
