"""Pure-stdlib baseline-JFIF JPEG codec (ITU T.81 sequential DCT).

The reference decodes JPEG on every inference path via PIL
(reference clip_inference/reader.py:101,163); PIL is absent in this
container, and baseline JPEG is public knowledge: canonical Huffman
entropy coding + 8x8 DCT + zigzag quantization. This module implements
exactly the subset web thumbnails overwhelmingly use — baseline
(SOF0), 8-bit, 1 or 3 components, 4:4:4 / 4:2:2 / 4:2:0 sampling,
optional restart markers — so JPEG payloads in the multimodal operators
yield REAL pixels, mirroring functions/png.py.

Unsupported variants raise NotImplementedError explicitly: progressive
(SOF2), arithmetic coding, 12-bit depth, hierarchical. Malformed input
raises ValueError (the corrupt-row contract of the multimodal
operators).

Performance note: entropy decode is a per-bit Python loop — fine for
the thumbnail-sized fixtures the tests and Pandas-UDF batches handle;
the operators' contract documents swapping in a native codec on a real
cluster (operators/multimodal.py module docstring).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> raster index within an 8x8 block (T.81 fig. A.6)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# T.81 Annex K quantization tables (quality 50 anchors)
QUANT_LUMA = np.array(
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
)
QUANT_CHROMA = np.array(
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
)

# T.81 Annex K typical Huffman tables: (bits[1..16], huffval). Both
# sides of this codec read tables from the DHT segments in the file, so
# these constants only pin what the ENCODER emits.
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = (
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
AC_CHROMA = (
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


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: F = C @ f @ C.T, f = C.T @ F @ C."""
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    c[0, :] = np.sqrt(1 / 8)
    return c


_C = _dct_basis()


# ---------------------------------------------------------------------------
# Huffman machinery (canonical codes from (bits, huffval), T.81 C.2)


def _canonical_codes(bits: list[int], huffval: list[int]):
    """[(length, code, symbol)] in canonical order."""
    out = []
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code, huffval[i]))
            code += 1
            i += 1
        code <<= 1
    return out


class _HuffDecoder:
    """(length, code) -> symbol lookup for bitwise decode."""

    def __init__(self, bits: list[int], huffval: list[int]):
        if sum(bits) != len(huffval):
            raise ValueError("DHT counts disagree with symbol list")
        self.lut = {
            (ln, code): sym for ln, code, sym in _canonical_codes(bits, huffval)
        }

    def decode(self, br: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing.

    Stops at any non-stuffing marker; ``at_marker()`` exposes it so the
    MCU loop can consume RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        if self.marker is not None:
            raise ValueError("entropy data ended at marker")
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy data")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed 0xFF
            else:
                self.marker = nxt
                self.pos += 1
                raise ValueError("entropy data ended at marker")
        # _fill only runs at nbits == 0, so the buffer is exactly one
        # byte — assigning (not accumulating) keeps the int small and
        # decode O(n) in entropy-stream length
        self.bitbuf = b
        self.nbits = 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_to_marker(self) -> int:
        """Discard pad bits, consume the next marker, return its code."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is None:
            while self.pos + 1 < len(self.data):
                if (
                    self.data[self.pos] == 0xFF
                    and self.data[self.pos + 1] != 0x00
                ):
                    self.marker = self.data[self.pos + 1]
                    self.pos += 2
                    break
                self.pos += 1
            else:
                raise ValueError("expected marker in entropy data")
        m, self.marker = self.marker, None
        return m


def _extend(v: int, size: int) -> int:
    """T.81 F.12: magnitude bits -> signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------------------
# Decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 pixel array (H, W, C), C = 1 or 3 (RGB).

    Raises ValueError on malformed input, NotImplementedError on
    non-baseline variants (progressive, arithmetic, 12-bit)."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("not bytes")
    data = bytes(data)
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")

    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None  # (height, width, components)
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional 0xFF fill bytes
            pos += 1
            continue
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (SOI / TEM / stray RSTn): no segment
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(
                    seg[s + 1 : s + 65], dtype=np.uint8
                ).astype(np.int64)
                if len(tbl) != 64:
                    raise ValueError("short DQT")
                dq = np.zeros(64, dtype=np.int64)
                dq[ZIGZAG] = tbl
                qt[tq] = dq.reshape(8, 8)
                s += 65
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1 : s + 17])
                nsym = sum(bits)
                huffval = list(seg[s + 17 : s + 17 + nsym])
                dec = _HuffDecoder(bits, huffval)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                s += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline frame type SOF{marker - 0xC0}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_sel[cs] = (tt >> 4, tt & 0xF)
            return _decode_scan(
                data, pos + 2 + seglen, frame, scan_sel, qt,
                huff_dc, huff_ac, restart_interval,
            )
        elif marker == 0xD9:
            break
        pos += 2 + seglen
    raise ValueError("missing SOS")


def _decode_scan(data, pos, frame, scan_sel, qt, huff_dc, huff_ac,
                 restart_interval):
    height, width, comps = frame
    if not comps or height == 0 or width == 0:
        raise ValueError("empty frame")
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    if max_h not in (1, 2) or max_v not in (1, 2):
        raise NotImplementedError("sampling factors beyond 2x2")
    mcus_x = -(-width // (8 * max_h))
    mcus_y = -(-height // (8 * max_v))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]),
                     dtype=np.float64)
        )
        if c["id"] not in scan_sel:
            raise NotImplementedError("multi-scan (progressive-style) SOS")

    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                m = br.sync_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RST marker, got {m:#x}")
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_sel[c["id"]]
                dq = qt.get(c["tq"])
                dc = huff_dc.get(td)
                ac = huff_ac.get(ta)
                if dq is None or dc is None or ac is None:
                    raise ValueError("missing quant/Huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(br, dc, ac, preds, ci)
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = blk
                        pix = (
                            _C.T @ (coef.reshape(8, 8) * dq) @ _C
                        ) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu += 1

    out_planes = []
    for c, pl in zip(comps, planes):
        ry, rx = max_v // c["v"], max_h // c["h"]
        if ry > 1 or rx > 1:
            pl = np.repeat(np.repeat(pl, ry, axis=0), rx, axis=1)
        out_planes.append(pl[:height, :width])
    if len(comps) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(br, dc, ac, preds, ci) -> np.ndarray:
    blk = np.zeros(64, dtype=np.int64)
    size = dc.decode(br)
    if size > 11:
        raise ValueError("DC size out of range")
    preds[ci] += _extend(br.receive(size), size)
    blk[0] = preds[ci]
    k = 1
    while k < 64:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        blk[k] = _extend(br.receive(s), s)
        k += 1
    return blk


# ---------------------------------------------------------------------------
# Encoder (baseline JFIF; fixture generator + re-encode path)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, table) -> bytes:
    bits, huffval = table
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(huffval)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex-K table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _encode_value(v: int):
    """(size, magnitude-bits) for a signed coefficient."""
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (H, W), (H, W, 1) or (H, W, 3) -> baseline JFIF bytes.

    ``subsampling``: "444", "422", or "420" (3-component only).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart path)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError("expected (H, W), (H, W, 1) or (H, W, 3)")
    if arr.dtype != np.uint8:
        raise ValueError("expected uint8")
    h, w, nc = arr.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("444", "422", "420"):
        raise ValueError(f"unknown subsampling {subsampling!r}")
    if nc == 1:
        samp = [(1, 1)]
    else:
        samp = {
            "444": [(1, 1), (1, 1), (1, 1)],
            "422": [(2, 1), (1, 1), (1, 1)],
            "420": [(2, 2), (1, 1), (1, 1)],
        }[subsampling]
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)

    # color transform
    f = arr.astype(np.float64)
    if nc == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        full = [y, cb, cr]
    else:
        full = [f[:, :, 0]]

    # per-component planes at their sampling resolution, padded to MCU grid
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    planes = []
    for (sh, sv), pf in zip(samp, full):
        ry, rx = max_v // sv, max_h // sh
        if ry > 1 or rx > 1:  # box-average downsample
            ph = -(-pf.shape[0] // ry) * ry
            pw = -(-pf.shape[1] // rx) * rx
            pad = np.pad(pf, ((0, ph - pf.shape[0]), (0, pw - pf.shape[1])),
                         mode="edge")
            pf = pad.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        th_, tw_ = mcus_y * 8 * sv, mcus_x * 8 * sh
        pf = np.pad(
            pf,
            ((0, th_ - pf.shape[0]), (0, tw_ - pf.shape[1])),
            mode="edge",
        )
        planes.append(pf - 128.0)

    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    quants = [ql] + ([qc, qc] if nc == 3 else [])
    qids = [0] + ([1, 1] if nc == 3 else [])

    enc_dc = [
        {s: (ln, code) for ln, code, s in _canonical_codes(*t)}
        for t in ((DC_LUMA, DC_CHROMA) if nc == 3 else (DC_LUMA,))
    ]
    enc_ac = [
        {s: (ln, code) for ln, code, s in _canonical_codes(*t)}
        for t in ((AC_LUMA, AC_CHROMA) if nc == 3 else (AC_LUMA,))
    ]
    tids = [0] + ([1, 1] if nc == 3 else [])

    bw = _BitWriter()
    preds = [0] * nc
    mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * nc
            for ci, (sh, sv) in enumerate(samp):
                dq = quants[qids[ci]].reshape(8, 8)
                dct = enc_dc[tids[ci]]
                act = enc_ac[tids[ci]]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        coef = _C @ block @ _C.T
                        q = np.round(coef / dq).astype(np.int64)
                        zz = q.reshape(-1)[ZIGZAG]
                        # DC
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        size, bitsv = _encode_value(diff)
                        ln, code = dct[size]
                        bw.write(code, ln)
                        if size:
                            bw.write(bitsv, size)
                        # AC
                        run = 0
                        last = np.nonzero(zz[1:])[0]
                        last_k = int(last[-1]) + 1 if len(last) else 0
                        for k in range(1, last_k + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ln, code = act[0xF0]  # ZRL
                                bw.write(code, ln)
                                run -= 16
                            size, bitsv = _encode_value(v)
                            ln, code = act[run << 4 | size]
                            bw.write(code, ln)
                            bw.write(bitsv, size)
                            run = 0
                        if last_k < 63:
                            ln, code = act[0x00]  # EOB
                            bw.write(code, ln)
            mcu += 1
    bw.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    # ql is raster-order; DQT stores zigzag order: tbl_zz[i] = ql[ZIGZAG[i]]
    out += _seg(0xDB, bytes([0x00]) + bytes(int(ql[z]) for z in ZIGZAG))
    if nc == 3:
        out += _seg(0xDB, bytes([0x01]) + bytes(int(qc[z]) for z in ZIGZAG))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i, (sh, sv) in enumerate(samp):
        sof += bytes([i + 1, sh << 4 | sv, qids[i]])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0, 0, DC_LUMA))
    out += _seg(0xC4, _dht_payload(1, 0, AC_LUMA))
    if nc == 3:
        out += _seg(0xC4, _dht_payload(0, 1, DC_CHROMA))
        out += _seg(0xC4, _dht_payload(1, 1, AC_CHROMA))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, tids[i] << 4 | tids[i]])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


JPEG_SOI = b"\xff\xd8"


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 2 and bytes(data[:2]) == JPEG_SOI
