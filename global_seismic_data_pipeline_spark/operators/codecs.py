"""Real, dependency-free media codecs for the multimodal operators.

The container ships no image/audio libraries (no PIL, no ffmpeg), but two
formats are fully decodable with the standard library + numpy alone:

- **BMP** (Windows bitmap, uncompressed 24-bit): fixed 54-byte header with
  little-endian size fields, bottom-up BGR rows padded to 4 bytes. Encode
  and decode are pure numpy.
- **WAV** (RIFF PCM): the stdlib ``wave`` module parses the container;
  samples land in a numpy int16 array.

These give :mod:`.multimodal` a *real* codec path — decode, resize,
feature-extract, frame-slice on actual pixel/sample data — while JPEG/PNG/
MP4 stay behind the documented NotImplementedError guards (reference
parity: the reference pipeline treats media as opaque blobs + metadata;
see SURVEY.md §2 multimodal extension rows).

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

import numpy as np

BMP_HEADER_SIZE = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def sniff(payload: bytes) -> str | None:
    """Identify a payload by magic bytes: 'bmp', 'wav', 'png', 'jpeg', or None."""
    b = bytes(payload[:12])
    if b[:2] == b"BM":
        return "bmp"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:3] == b"\xff\xd8\xff":
        return "jpeg"
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


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, 3) array to (height, width, 3).

    Uses the standard pixel-center mapping src = floor((dst + 0.5) * scale),
    the same grid PIL's NEAREST uses, so a future PIL drop-in matches.
    """
    src_h, src_w = pixels.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * src_h / height).astype(np.int64), src_h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * src_w / width).astype(np.int64), src_w - 1)
    return pixels[ys][:, xs]


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
