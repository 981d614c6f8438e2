"""Baseline JPEG codec on the stdlib + numpy — closes the "entropy-coded
image formats are stubbed" gap (reference scope: the multimodal decode
stage; cf. sdl-core's file-ref pipelines feeding binary columns, which leave
codec choice to the deployment).

Scope: ITU-T T.81 baseline sequential DCT, 8-bit, Huffman coding —
SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI, 1- or 3-component scans,
arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0), restart intervals,
byte stuffing. Progressive (SOF2) and arithmetic coding raise a clear
ValueError and `decode_media` falls back to the declared stub.

The encoder exists primarily so the decoder is testable without external
libraries (round-trip + cross-verification against the JVM's javax.imageio
via py4j — the same cross-implementation pattern as the Avro OCF codec);
it writes baseline JFIF with the Annex-K tables.

Scale posture: decode runs inside mapInPandas batches (`decode_media`
dispatch), payload never on the driver. The per-pixel work is numpy-
vectorized (block IDCT as one matmul over all blocks); only the Huffman
bit-walk is Python — fine for metadata/feature extraction, and a real
deployment swaps `decode_media`'s dispatch to libjpeg-turbo behind the
same schema.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Annex K reference tables
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: forward F = C @ x @ C.T,
    inverse x = C.T @ F @ C."""
    c = np.zeros((8, 8))
    for k in range(8):
        scale = np.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            c[k, n] = scale * np.cos((2 * n + 1) * k * np.pi / 16)
    return c


_C = _dct_matrix()


# ---------------------------------------------------------------- huffman

class _HuffTable:
    """Canonical Huffman table (T.81 Annex C): codes assigned in
    (length, symbol-order); decode looks up (length, code)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.bits = list(bits)
        self.vals = list(vals)
        self.decode_map: dict[tuple[int, int], int] = {}
        self.encode_map: dict[int, tuple[int, int]] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                sym = vals[k]
                self.decode_map[(length, code)] = sym
                self.encode_map[sym] = (length, code)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-stuffing marker (RSTn handled by caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker: T.81 F.2.2.5 — feed 1-bits (the spec pads with 1s);
                # well-formed streams never actually consume past EOB here
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.decode_map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align_to_marker(self) -> None:
        """Discard buffered bits and skip to the next marker boundary
        (past any 0xFF fill bytes, T.81 B.1.1.2, so data[pos+1] is the
        marker code itself)."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while d[self.pos] != 0xFF or d[self.pos + 1] in (0x00, 0xFF):
            self.pos += 1


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------- decoder

def _parse(payload: bytes):
    """Marker walk up to (and including) SOS; returns everything the scan
    decoder needs. Raises ValueError on progressive/arithmetic/12-bit."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        if payload[pos + 1] == 0xFF:  # fill byte (T.81 B.1.1.2): skip one
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI/RSTn: bare marker
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (8- or 16-bit precision)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    qt[tq] = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    bits, list(seg[i + 17 : i + 17 + nvals])
                )
                i += 17 + nvals
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            if seg[0] != 8:
                raise ValueError(f"JPEG precision {seg[0]} unsupported")
            height, width = struct.unpack_from(">HH", seg, 1)
            if seg[5] not in (1, 3):
                # 2-component and CMYK (4) streams are outside the declared
                # scope — raise so decode_media falls back to the stub
                # instead of silently emitting wrong channel metadata
                raise ValueError(f"JPEG with {seg[5]} components unsupported")
            comps = []
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": width, "h": height, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG frame marker 0x{marker:02x} unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            scan = {}
            for c in range(seg[0]):
                scan[seg[1 + 2 * c]] = (seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0x0F)
            return frame, scan, qt, huff_dc, huff_ac, restart_interval, pos + 2 + seglen
        pos += 2 + seglen
    raise ValueError("JPEG without SOS scan")


def _scan_planes(data, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    """Entropy decode + dequantize + batched IDCT + chroma upsample;
    returns full-resolution (cropped) float component planes."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    blocks: list[list[tuple[int, int, np.ndarray]]] = [[] for _ in comps]
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_marker()
                if 0xD0 <= reader.data[reader.pos + 1] <= 0xD7:
                    reader.pos += 2
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = reader.decode_symbol(huff_dc[dc_t])
                        pred[ci] += _extend(reader.read_bits(t), t)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(huff_ac[ac_t])
                            r, s_ = rs >> 4, rs & 0x0F
                            if s_ == 0:
                                if r == 15:  # ZRL: sixteen zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zz[k] = _extend(reader.read_bits(s_), s_)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q
                        blocks[ci].append(
                            ((my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8, block.reshape(8, 8))
                        )
            mcu_count += 1
    out = []
    for ci, c in enumerate(comps):
        plane = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        if blocks[ci]:
            stack = np.stack([b for _, _, b in blocks[ci]])
            spatial = _C.T @ stack @ _C + 128.0  # one batched matmul, all blocks
            for (y0, x0, _), sp in zip(blocks[ci], spatial):
                plane[y0 : y0 + 8, x0 : x0 + 8] = sp
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:  # nearest-neighbor chroma upsample
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        out.append(plane[:h, :w])
    return out


def _planes_to_rgb(planes: list[np.ndarray]) -> list[np.ndarray]:
    """JFIF YCbCr -> RGB (BT.601 constants), clipped to [0, 255]."""
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return [np.clip(p, 0, 255) for p in (r, g, b)]


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline JPEG; returns the `decode_bmp`/`decode_png`-shaped
    dict (width/height/channels/format + exact per-channel means).

    Truncated/corrupt streams surface as ValueError (never IndexError/
    KeyError/struct.error) so `decode_media` can fall back to the declared
    stub instead of failing the whole mapInPandas batch."""
    try:
        frame, scan, qt, hdc, hac, ri, pos = _parse(payload)
        planes = _scan_planes(payload, pos, frame, scan, qt, hdc, hac, ri)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error) as exc:
        raise ValueError(f"malformed JPEG stream: {type(exc).__name__}") from exc
    out = {
        "width": frame["w"],
        "height": frame["h"],
        "format": "jpeg",
        "channels": len(frame["comps"]),
    }
    if len(planes) == 3:
        out["mean_rgb"] = [round(float(p.mean()), 3) for p in _planes_to_rgb(planes)]
    else:
        out["mean_channels"] = [round(float(np.clip(planes[0], 0, 255).mean()), 3)]
    return out


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Full pixel decode to (H, W, 3|1) uint8 — the array the tests compare
    pixel-for-pixel against javax.imageio's reference decode."""
    try:
        frame, scan, qt, hdc, hac, ri, pos = _parse(payload)
        planes = _scan_planes(payload, pos, frame, scan, qt, hdc, hac, ri)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error) as exc:
        raise ValueError(f"malformed JPEG stream: {type(exc).__name__}") from exc
    if len(planes) == 3:
        return np.round(np.stack(_planes_to_rgb(planes), axis=-1)).astype(np.uint8)
    return np.round(np.clip(planes[0], 0, 255)).astype(np.uint8)[..., None]


# ---------------------------------------------------------------- encoder

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg jpeg_quality_scaling)."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """(bit length, magnitude bits) for T.81 F.1.2.1 coding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as baseline JFIF. Supports 4:4:4
    and 4:2:0 (box-filtered chroma) and optional restart markers (DRI).
    Built for decoder verification and as a real sink for the multimodal
    pipeline's thumbnail stage."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_jpeg expects (H, W, 3) RGB")
    h, w = pixels.shape[:2]
    px = pixels.astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsample == "4:2:0":
        sampling = [(2, 2), (1, 1), (1, 1)]
    elif subsample == "4:4:4":
        sampling = [(1, 1), (1, 1), (1, 1)]
    else:
        raise ValueError(f"unsupported subsampling {subsample}")
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # T.81 B.2.4.1: DQT stores elements in ZIGZAG order, and the scan
    # quantizes zigzag-ordered coefficients — reorder the raster Annex-K
    # tables once here (the decoder scatters zz*q back through ZIGZAG)
    zig = np.array(ZIGZAG)
    qluma = _scale_quant(QUANT_LUMA, quality)[zig]
    qchroma = _scale_quant(QUANT_CHROMA, quality)[zig]
    qtables = [qluma, qchroma, qchroma]
    # pad (edge-replicate) each component plane to its MCU grid, downsampling
    # chroma by box mean where subsampled
    comp_planes = []
    for ci, plane in enumerate((y, cb, cr)):
        sh, sv = sampling[ci]
        ry, rx = vmax // sv, hmax // sh
        if ry > 1 or rx > 1:
            ph = -(-h // ry) * ry
            pw = -(-w // rx) * rx
            padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = padded.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        th, tw = mcuy * sv * 8, mcux * sh * 8
        plane = np.pad(
            plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])), mode="edge"
        )
        comp_planes.append(plane - 128.0)

    dc_tabs = [_HuffTable(DC_LUMA_BITS, DC_LUMA_VALS), _HuffTable(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_tabs = [_HuffTable(AC_LUMA_BITS, AC_LUMA_VALS), _HuffTable(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    writer = _BitWriter()
    pred = [0, 0, 0]
    inv_zigzag = np.array(ZIGZAG)
    mcu_count = 0
    rst_no = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # close the entropy segment with 1-padding, emit RSTn, reset
                # the DC predictors (T.81 F.1.2.3)
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst_no % 8)])
                rst_no += 1
                pred = [0, 0, 0]
            mcu_count += 1
            for ci in range(3):
                sh, sv = sampling[ci]
                tabsel = 0 if ci == 0 else 1
                dct_q = qtables[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = comp_planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                        coef = _C @ blk @ _C.T
                        zz = np.round(coef.reshape(64)[inv_zigzag] / dct_q).astype(int)
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t, bits = _magnitude(diff)
                        length, code = dc_tabs[tabsel].encode_map[t]
                        writer.write(code, length)
                        if t:
                            writer.write(bits, t)
                        # AC run-length
                        run = 0
                        last_nz = 0
                        nz = np.nonzero(zz[1:])[0]
                        last_nz = nz[-1] + 1 if len(nz) else 0
                        for k in range(1, 64):
                            if k > last_nz:
                                break
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                length, code = ac_tabs[tabsel].encode_map[0xF0]
                                writer.write(code, length)
                                run -= 16
                            t, bits = _magnitude(v)
                            length, code = ac_tabs[tabsel].encode_map[(run << 4) | t]
                            writer.write(code, length)
                            writer.write(bits, t)
                            run = 0
                        if last_nz < 63:
                            length, code = ac_tabs[tabsel].encode_map[0x00]
                            writer.write(code, length)
    writer.flush()

    # ---- assemble the stream
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tbl in ((0, qluma), (1, qchroma)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(int(v) for v in tbl)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * 3) + bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci in range(3):
        sh, sv = sampling[ci]
        out += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    for tc, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for th, tab in enumerate(tabs):
            payload_t = bytes([(tc << 4) | th]) + bytes(tab.bits) + bytes(tab.vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload_t)) + payload_t
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * 3) + bytes([3])
    for ci in range(3):
        td = 0 if ci == 0 else 1
        out += bytes([ci + 1, (td << 4) | td])
    out += bytes([0, 63, 0])
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
