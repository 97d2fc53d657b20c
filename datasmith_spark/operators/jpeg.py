"""Pure-python baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Closes the last multimodal codec stub (VERDICT r3 "What's missing" #3): the
sandbox has no PIL/libjpeg, so this implements the baseline process from the
public spec directly — canonical Huffman tables built from (BITS, HUFFVAL)
pairs, the Annex K example quantization/Huffman tables, zigzag order,
8x8 DCT-II via an orthonormal matrix product, and JFIF YCbCr color.

Decoder profile: baseline SOF0, 8-bit, 1 or 3 components, any sampling
factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals (DRI/RSTn),
byte-stuffed entropy stream. Progressive (SOF2) and arithmetic coding are
out of profile and return None. Per-symbol python loops are fine for the
thumbnail-sized payloads this lane carries; a real cluster deployment swaps
in libjpeg-turbo behind the same decode_image() seam, which these tests
then pin.

Ancestry: the multimodal lane mirrors the audio decode stage
(operators/scan_decode.py) — opaque bytes + typed metadata in, small
numeric features out, all inside Arrow-batched mapInPandas.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- spec constants

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1 example quantization tables (quality ~50)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_LUMA_VALS = tuple(range(12))
DC_CHROMA_BITS = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
DC_CHROMA_VALS = tuple(range(12))
AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)
AC_CHROMA_BITS = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
AC_CHROMA_VALS = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
)


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 Annex C."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """(BITS, HUFFVAL) -> {(length, code): symbol} for bitwise decoding."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# orthonormal 8-point DCT-II matrix: forward D = M @ X @ M.T, inverse M.T @ D @ M
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_M[_u, _x] = c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


# ------------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            # keep only the live low bits — see _BitReader.read_bit
            self.acc &= (1 << self.nbits) - 1
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, size-bit code) per F.1.2.1 (negatives use
    the one's-complement form)."""
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw, zz, dc_prev, dc_codes, ac_codes) -> int:
    diff = int(zz[0]) - dc_prev
    size, bits = _magnitude(diff)
    code, ln = dc_codes[size]
    bw.write(code, ln)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _zigzag_blocks(qblocks: np.ndarray) -> np.ndarray:
    return qblocks.reshape(qblocks.shape[0], qblocks.shape[1], 64)[..., ZIGZAG]


def _pad_to8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.float64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_jpeg(
    img: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """HxWx3 uint8 RGB -> baseline JFIF bytes (Annex K tables).

    subsample=True emits 4:2:0 (2x2 luma sampling, box-averaged chroma);
    restart_interval>0 emits DRI + byte-aligned RSTn markers every that many
    MCUs — both exist chiefly so the decoder's general MCU-interleave and
    restart-sync paths are testable without external encoders. A 2-D HxW
    uint8 input encodes as a single-component (grayscale) frame."""
    if img.ndim == 2:
        return _encode_gray(img, restart_interval)
    h, w, _ = img.shape
    ycc = rgb_to_ycbcr(img)
    if subsample:
        # luma padded to 16 so the half-resolution chroma grid stays 8-aligned
        y = np.pad(ycc[..., 0], ((0, -h % 16), (0, -w % 16)), mode="edge")
        cb = np.pad(ycc[..., 1], ((0, -h % 16), (0, -w % 16)), mode="edge")
        cr = np.pad(ycc[..., 2], ((0, -h % 16), (0, -w % 16)), mode="edge")
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
        samplings = ((2, 2), (1, 1), (1, 1))
    else:
        planes = [_pad_to8(ycc[..., c]) for c in range(3)]
        samplings = ((1, 1), (1, 1), (1, 1))
    qts = (QT_LUMA, QT_CHROMA, QT_CHROMA)
    dc_codes = (
        _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    )
    ac_codes = (
        _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    )

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, QT_LUMA), (1, QT_CHROMA)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(qt.reshape(-1)[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for (cid, qid), (hs, vs) in zip(((1, 0), (2, 1), (3, 1)), samplings):
        out += struct.pack(">BBB", cid, (hs << 4) | vs, qid)
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        payload = bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">HB", 3 + len(payload), (cls << 4) | tid) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tids in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack(">BB", cid, tids)
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl

    bw = _BitWriter()
    zz = [_zigzag_blocks(_quant_blocks(planes[c], qts[c])) for c in range(3)]
    mcuy = zz[0].shape[0] // samplings[0][1]
    mcux = zz[0].shape[1] // samplings[0][0]
    dc_prev = [0, 0, 0]
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.buf + bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                bw = _BitWriter()
                dc_prev = [0, 0, 0]
            for c, (hs, vs) in enumerate(samplings):
                t = 0 if c == 0 else 1
                for by in range(vs):
                    for bx in range(hs):
                        dc_prev[c] = _encode_block(
                            bw,
                            zz[c][my * vs + by, mx * hs + bx],
                            dc_prev[c],
                            dc_codes[t],
                            ac_codes[t],
                        )
            mcu_count += 1
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _quant_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Level-shift, FDCT, quantize. Returns (by, bx, 8, 8) int64."""
    h, w = plane.shape
    x = plane.astype(np.float64) - 128.0
    by, bx = h // 8, w // 8
    blocks = x.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ux,abxy,vy->abuv", _DCT_M, blocks, _DCT_M)
    return np.rint(coef / qt).astype(np.int64)


def _encode_gray(img: np.ndarray, restart_interval: int = 0) -> bytes:
    """HxW uint8 -> single-component baseline JFIF (luma tables only)."""
    h, w = img.shape
    plane = _pad_to8(img.astype(np.float64))
    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)
    out += bytes(int(QT_LUMA.reshape(-1)[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += struct.pack(">BBB", 1, 0x11, 0)
    for cls, bits, vals in (
        (0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, AC_LUMA_BITS, AC_LUMA_VALS),
    ):
        payload = bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">HB", 3 + len(payload), cls << 4) + payload
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + struct.pack(">BB", 1, 0x00)
    out += b"\x00\x3f\x00"
    bw = _BitWriter()
    zz = _zigzag_blocks(_quant_blocks(plane, QT_LUMA))
    dc = 0
    mcu_count = 0
    rst_n = 0
    for my in range(zz.shape[0]):
        for mx in range(zz.shape[1]):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.buf + bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                bw = _BitWriter()
                dc = 0
            dc = _encode_block(bw, zz[my, mx], dc, dc_codes, ac_codes)
            mcu_count += 1
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------------ decoder


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        d = self.data
        while self.nbits < 25:
            if self.pos >= len(d):
                return self.nbits > 0
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via marker
                    self.marker = nxt
                    return self.nbits > 0
                else:
                    self.marker = nxt
                    return self.nbits > 0
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise EOFError
        if self.nbits == 0:
            raise EOFError
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        # Truncate to the live bits: without this the accumulator grows into
        # an unbounded bignum and every shift is O(stream length), making
        # entropy decode O(n^2) overall.
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Discard pad bits and consume the RSTn marker at the boundary.

        Whole bytes are only ever consumed atomically into the accumulator,
        so at a restart boundary pos sits on the 0xFF of RSTn (the encoder
        byte-aligns before emitting it); pending accumulator bits are pad."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None and (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.marker = self.data[self.pos + 1]
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(buf: bytes | None) -> np.ndarray | None:
    """Baseline JFIF bytes -> HxWx3 uint8 RGB, or None if out of profile."""
    if buf is None or len(buf) < 4 or buf[:2] != b"\xff\xd8":
        return None
    try:
        return _decode_jpeg_inner(buf)
    except Exception:
        return None


def _decode_jpeg_inner(buf: bytes) -> np.ndarray | None:
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            return None
        marker = buf[pos + 1]
        pos += 2
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", buf[pos : pos + 2])[0]
        seg = buf[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec != 0:
                    return None  # 16-bit tables out of profile
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = np.frombuffer(seg[p : p + 64], dtype=np.uint8)
                qts[tid] = q.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = tuple(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = tuple(seg[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            depth, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if depth != 8 or nc not in (1, 3):
                return None
            comps = []
            for i in range(nc):
                cid, sampling, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, sampling >> 4, sampling & 0x0F, qid))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # extended/progressive/arithmetic out of profile
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            scan_tables = {}
            for i in range(ns):
                cid, tids = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tables[cid] = (tids >> 4, tids & 0x0F)
            return _decode_scan(
                buf, pos + seglen, frame, qts, huff, scan_tables, restart_interval
            )
        pos += seglen
    return None


def _decode_scan(buf, pos, frame, qts, huff, scan_tables, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for cid, hs, vs, qid in comps:
        planes[cid] = np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
    br = _BitReader(buf, pos)
    dc_prev = {c[0]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                dc_prev = {c[0]: 0 for c in comps}
            for cid, hs, vs, qid in comps:
                dct_id, act_id = scan_tables[cid]
                dc_tab = huff[(0, dct_id)]
                ac_tab = huff[(1, act_id)]
                qt = qts[qid]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _read_symbol(br, dc_tab)
                        diff = _extend(br.read_bits(size), size)
                        dc_prev[cid] += diff
                        zz[0] = dc_prev[cid]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, ac_tab)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC overflow")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * qt.reshape(-1)[ZIGZAG]
                        pix = _DCT_M.T @ block.reshape(8, 8) @ _DCT_M + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # upsample subsampled components to full MCU grid, crop, combine
    full_h, full_w = mcuy * vmax * 8, mcux * hmax * 8
    out_planes = []
    for cid, hs, vs, qid in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out_planes.append(p[:full_h, :full_w][:h, :w])
    if len(out_planes) == 1:
        y = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    return ycbcr_to_rgb(np.stack(out_planes, axis=-1))
