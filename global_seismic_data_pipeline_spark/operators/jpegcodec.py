"""Baseline JPEG (ITU-T T.81) codec in pure numpy + stdlib.

Clears the last guarded branch of the multimodal family: the container
has no PIL/libjpeg, but baseline sequential DCT JPEG is implementable
from the public spec alone — the tables below (quantization Annex K.1,
Huffman Annex K.3) and the marker layout are from the standard.

Decoder: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS parsing, canonical Huffman
decode with 0xFF00 unstuffing and D0-D7 restart markers, DC prediction,
AC run-length/ZRL/EOB, dequantize → inverse zigzag → 2-D IDCT (matrix
form of the orthonormal 8-point DCT-II, vectorized over all blocks of a
plane with einsum), arbitrary integer chroma sampling factors with
nearest upsampling, grayscale or YCbCr→RGB output. Progressive (SOF2),
arithmetic coding and 12-bit precision raise NotImplementedError.

Encoder: baseline JFIF at a libjpeg-style quality knob, 4:4:4 or 4:2:0
(box-averaged chroma), spec Huffman tables written into DHT — so the
output decodes in any standards-compliant reader, and the round-trip
error is bounded by the quantization step (PSNR-tested).

Everything is per-payload kernel code called from Arrow-batched
``mapInPandas`` stages in :mod:`.multimodal`; nothing here touches Spark.
"""

from __future__ import annotations

import struct

import numpy as np

# --- spec tables -----------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)
Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

# (bits-per-length[1..16], symbol list) — T.81 Annex K.3
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: forward F = T @ f @ T.T,
    inverse f = T.T @ F @ T — exactly the T.81 FDCT/IDCT definition."""
    n = np.arange(8)
    k = n.reshape(-1, 1)
    t = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    t[0, :] = np.sqrt(1 / 8)
    return t


_T = dct_matrix()


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style quality (1-100) scaling of the Annex K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (Q_LUMA, Q_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# --- canonical Huffman -----------------------------------------------------


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the Annex C assignment: codes count up
    within a length, shift left when the length grows."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for the bit-at-a-time decoder."""
    return {
        (ln, code): sym for sym, (code, ln) in _canonical_codes(bits, values).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self._nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing and
    restart-marker awareness."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise EOFError("hit marker while reading entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt
                self.pos += 1
                raise EOFError("hit marker while reading entropy data")
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume a D0-D7 restart marker at a byte boundary."""
        self._acc = 0
        self._nbits = 0
        if self.marker is None:
            # marker not yet consumed by an EOFError: scan forward
            while True:
                b = self.data[self.pos]
                self.pos += 1
                if b == 0xFF:
                    nxt = self.data[self.pos]
                    self.pos += 1
                    if nxt != 0x00:
                        self.marker = nxt
                        break
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"expected restart marker, got {self.marker:#x}")
        self.marker = None


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit magnitude per T.81 F.12."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --- color ------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# --- block helpers ----------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H8, W8) plane (multiples of 8) -> (by, bx, 8, 8) block grid."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _from_blocks(blocks: np.ndarray) -> np.ndarray:
    by, bx = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    return np.pad(
        plane,
        ((0, h - plane.shape[0]), (0, w - plane.shape[1])),
        mode="edge",
    )


# --- encoder ----------------------------------------------------------------


def encode_jpeg(
    pixels: np.ndarray, *, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a baseline JFIF JPEG.

    ``subsampling``: '444' (one block per component per MCU) or '420'
    (2×2 luma blocks + box-averaged chroma per MCU).
    """
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {pixels.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy, qc = quality_tables(quality)
    ycc = _rgb_to_ycbcr(pixels.astype(np.float64))

    if subsampling == "444":
        samp = [(1, 1), (1, 1), (1, 1)]
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        samp = [(2, 2), (1, 1), (1, 1)]
        he, we = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        cbp = _pad_to(ycc[..., 1], he, we)
        crp = _pad_to(ycc[..., 2], he, we)
        cb = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
        planes = [ycc[..., 0], cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per component: pad plane to the MCU grid and DCT+quantize all blocks
    comp_blocks = []
    for (sh, sv), plane, q in zip(samp, planes, [qy, qc, qc]):
        bw, bh = mcus_x * sh * 8, mcus_y * sv * 8
        blocks = _to_blocks(_pad_to(plane, bh, bw) - 128.0)
        coef = np.einsum("ij,byjk,lk->byil", _T, blocks, _T)
        comp_blocks.append(np.round(coef / q).astype(np.int64))

    dc_y = _canonical_codes(*DC_LUMA_SPEC)
    ac_y = _canonical_codes(*AC_LUMA_SPEC)
    dc_c = _canonical_codes(*DC_CHROMA_SPEC)
    ac_c = _canonical_codes(*AC_CHROMA_SPEC)
    huff = [(dc_y, ac_y), (dc_c, ac_c), (dc_c, ac_c)]

    bw_ = _BitWriter()
    prev_dc = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                dct_tab, ac_tab = huff[ci]
                for by in range(sv):
                    for bx in range(sh):
                        block = comp_blocks[ci][my * sv + by, mx * sh + bx]
                        zz = block.reshape(64)[ZIGZAG]
                        diff = int(zz[0]) - prev_dc[ci]
                        prev_dc[ci] = int(zz[0])
                        s = _category(diff)
                        code, ln = dct_tab[s]
                        bw_.write(code, ln)
                        if s:
                            bw_.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
                        run = 0
                        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else 0
                        for i in range(1, 64):
                            v = int(zz[i])
                            if i > last_nz:
                                code, ln = ac_tab[0x00]  # EOB
                                bw_.write(code, ln)
                                break
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_tab[0xF0]  # ZRL
                                bw_.write(code, ln)
                                run -= 16
                            s = _category(v)
                            code, ln = ac_tab[(run << 4) | s]
                            bw_.write(code, ln)
                            bw_.write(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
    entropy = bw_.flush()

    # --- container ---
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(qy.reshape(64)[ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, b"\x01" + bytes(qc.reshape(64)[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (sh, sv) in enumerate(samp):
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1)
    out += seg(0xC0, sof)
    for tc_th, (bits, vals) in (
        (0x00, DC_LUMA_SPEC), (0x10, AC_LUMA_SPEC),
        (0x01, DC_CHROMA_SPEC), (0x11, AC_CHROMA_SPEC),
    ):
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = struct.pack(">B", 3)
    for ci in range(3):
        sos += struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x11)
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w, 3) uint8 RGB."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue
        (ln,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i:i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i:i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                qt[tq] = tbl[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline/ext. sequential)
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + ci * 3:9 + ci * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, *range(0xC5, 0xC8), *range(0xC9, 0xCC), *range(0xCD, 0xD0)):
            raise NotImplementedError(
                f"JPEG frame type {marker:#x} (progressive/arithmetic/"
                "hierarchical) not supported by the baseline decoder"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + si * 2:3 + si * 2]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            break
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    by_id = {c["id"]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in scan]
    tabs = [(huff[(0, td)], huff[(1, ta)]) for _, td, ta in scan]

    coeffs = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int64)
        for c in order
    ]
    reader = _BitReader(data, pos)
    prev_dc = [0] * len(order)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.align_restart()
                prev_dc = [0] * len(order)
            mcu_index += 1
            for ci, comp in enumerate(order):
                dc_tab, ac_tab = tabs[ci]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = coeffs[ci][my * comp["v"] + by, mx * comp["h"] + bx]
                        s = _huff_decode(reader, dc_tab)
                        diff = _extend(reader.bits(s), s) if s else 0
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1

    planes = []
    for ci, comp in enumerate(order):
        q = qt[comp["tq"]]
        blocks = coeffs[ci][:, :, UNZIGZAG].reshape(
            coeffs[ci].shape[0], coeffs[ci].shape[1], 8, 8
        ).astype(np.float64) * q
        spat = np.einsum("ji,byjk,kl->byil", _T, blocks, _T) + 128.0
        plane = _from_blocks(spat)
        # component resolution, then nearest-upsample to full grid
        ch = -(-h * comp["v"] // vmax)
        cw = -(-w * comp["h"] // hmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(
            np.repeat(plane, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1
        )[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        g = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
