"""Pure-Python baseline JPEG codec (ITU-T T.81 / ISO 10918-1, the
sequential-DCT Huffman "baseline" process) — closes the multimodal
layer's last documented decode gap without any third-party dependency.

Scope (documented, enforced with clear errors):

* DECODE: baseline SOF0/SOF1 AND progressive SOF2 (spectral selection
  + successive approximation per T.81 Annex G — the dominant encoding
  for real web JPEGs), 8-bit, 1 (grayscale) or 3 (YCbCr JFIF)
  components, any sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0),
  restart intervals (DRI/RSTn), APPn/COM skipped.  Lossless /
  hierarchical / arithmetic-coded processes raise ``ValueError``
  naming the unsupported process — gates then fall back to
  header-only dims, or install PIL whose ``image/*`` codec takes
  precedence.
* ENCODE: baseline 4:4:4 (or grayscale) with the T.81 Annex K
  quantization tables (libjpeg quality scaling) and the spec's typical
  Huffman tables — primarily the round-trip test harness for the
  decoder (this container has no PIL to make fixtures with), exposed
  as :func:`encode_jpeg` since a deterministic encoder is also what
  the synthetic-media test fixtures want.

Performance note: entropy decode is a per-block Python loop — JPEG's
Huffman stream is inherently sequential within a scan.  The multimodal
pipeline's contract keeps this off the hot path: resolution/metadata
gates read header-only dims (~30 bytes) and only SURVIVORS pay the
decoder, inside Arrow ``mapInPandas`` batches where each asset decodes
once.  The IDCT/FDCT are exact orthonormal matrix products in numpy.

Public knowledge only: the marker layout, Annex K tables, and typical
Huffman tables are from the published T.81 spec.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# ------------------------------------------------------------------ tables

#: zig-zag index order (T.81 figure A.6): zigzag position -> block index
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

#: T.81 Annex K.1 base quantization tables
_STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# T.81 Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II basis: IDCT(X) = C.T @ X @ C, FDCT = C @ x @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.25) if _k else np.sqrt(0.125))


def _build_decode_table(bits, huffval):
    """(code, length) -> symbol map per T.81 C.2 canonical assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, huffval):
    """symbol -> (code, length)."""
    dec = _build_decode_table(bits, huffval)
    return {sym: (code, length) for (length, code), sym in dec.items()}


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    unstuffing; RSTn markers are consumed by ``restart()``.

    ``pad_at_marker``: a progressive frame has MORE markers after each
    scan's entropy data (DHT/SOS/EOI), and the 32-bit lookahead can
    legitimately touch the next one while the scan's final blocks are
    still being served — pad zero bits there (T.81 F.2.2.5 semantics)
    instead of treating it as in-scan corruption the way the baseline
    single-scan reader does."""

    def __init__(self, data: bytes, pos: int, pad_at_marker: bool = False):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.pad_at_marker = pad_at_marker

    def _fill(self):
        # Drop already-consumed high bits: without this mask the Python
        # bignum grows with the whole stream and every shift is O(n),
        # making decode O(n^2) on real-size images.
        self.buf &= (1 << self.nbits) - 1
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.buf = (self.buf << 8) | 0  # pad past EOI, T.81 F.2.2.5
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(
                    self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif (0xD0 <= nxt <= 0xD7 or nxt == 0xD9
                      or self.pad_at_marker):
                    # restart/EOI (or, between progressive scans, ANY)
                    # marker: stop feeding real bytes
                    self.buf = (self.buf << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside scan")
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def restart(self):
        """Byte-align and consume an RSTn marker."""
        self.buf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and \
                    0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected RST marker")


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: map t low bits to a signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline or progressive JPEG to ``(width, height,
    uint8[h, w, c])`` (c = 3 RGB for YCbCr streams, 1 for grayscale).
    See module docstring for the supported-process boundary."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    comps = None  # list of dicts: id, h, v, tq
    width = height = 0
    restart_interval = 0
    progressive = False
    coefs = None        # per-component zigzag coefficient grids (SOF2)
    got_scan = False
    hmax = vmax = mcus_x = mcus_y = 0
    data = payload
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        if pos + 1 >= len(data):
            raise ValueError("truncated stream: lone 0xFF at end")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and got_scan:
                return _reconstruct_progressive(
                    comps, coefs, qt, width, height, hmax, vmax)
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise ValueError(
                f"truncated stream: marker 0xFF{marker:02X} has no "
                "length field")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p:p + 128],
                                         dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p:p + 64],
                                         dtype=np.uint8).astype(np.int32)
                    p += 64
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = vals
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated DHT segment")
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            if len(seg) < 6:
                raise ValueError("truncated SOF segment")
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            height, width = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if len(seg) < 6 + 3 * nc:
                raise ValueError("truncated SOF component list")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process SOF{marker - 0xC0} "
                "(baseline sequential and progressive Huffman are "
                "implemented; install PIL for lossless/hierarchical/"
                "arithmetic streams)")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if comps is None:
                raise ValueError("SOS before SOF")
            if len(seg) < 1 or len(seg) < 1 + 2 * seg[0]:
                raise ValueError("truncated SOS segment")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(
                    (c for c in comps if c["id"] == cs), None)
                if comp is None:
                    raise ValueError(
                        f"SOS references undefined component {cs}")
                scan.append((comp, tables >> 4, tables & 0x0F))
            if not progressive:
                pos += seglen
                return _decode_scan(data, pos, width, height, comps,
                                    scan, qt, huff, restart_interval)
            if len(seg) < 4 + 2 * ns:
                raise ValueError("truncated SOS segment")
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if coefs is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
                    raise ValueError(
                        f"unsupported sampling {hmax}x{vmax} (max 2x2)")
                mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
                coefs = [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64),
                                  dtype=np.int64) for c in comps]
            pos = _decode_progressive_sos(
                data, pos + seglen, width, height, comps, scan,
                ss, se, ah, al, huff, restart_interval, coefs,
                hmax, vmax, mcus_x, mcus_y)
            got_scan = True
            continue
        pos += seglen
    if progressive and got_scan:
        raise ValueError("truncated progressive stream (no EOI)")
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, width, height, comps, scan, qt, huff,
                 restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError(f"unsupported sampling {hmax}x{vmax} (max 2x2)")
    # Scan order need not equal SOF order (T.81 B.2.3) — map each scan
    # entry to its plane by component id, never by SOS position.
    plane_idx = {c["id"]: i for i, c in enumerate(comps)}
    # T.81 A.2.2: a single-component scan is NON-interleaved — one data
    # unit per MCU over the component's own block grid, regardless of the
    # sampling factors it carries in SOF.
    single = len(scan) == 1
    if single:
        c0 = scan[0][0]
        cw = -(-width * c0["h"] // hmax)
        ch = -(-height * c0["v"] // vmax)
        mcus_x = (cw + 7) // 8
        mcus_y = (ch + 7) // 8
    else:
        mcu_w, mcu_h = 8 * hmax, 8 * vmax
        mcus_x = (width + mcu_w - 1) // mcu_w
        mcus_y = (height + mcu_h - 1) // mcu_h
    planes = []
    for c in comps:
        if single and c["id"] == scan[0][0]["id"]:
            pw, ph = mcus_x * 8, mcus_y * 8
        else:
            pw, ph = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, (comp, dc_id, ac_id) in enumerate(scan):
                pi = plane_idx[comp["id"]]
                bh = 1 if single else comp["h"]
                bv = 1 if single else comp["v"]
                if comp["tq"] not in qt:
                    raise ValueError(
                        f"undefined quantization table {comp['tq']}")
                if (0, dc_id) not in huff or (1, ac_id) not in huff:
                    raise ValueError(
                        f"undefined Huffman table (dc={dc_id}, "
                        f"ac={ac_id})")
                dq = qt[comp["tq"]]
                dct = huff[(0, dc_id)]
                act = huff[(1, ac_id)]
                for by in range(bv):
                    for bx in range(bh):
                        # int64: corrupted streams can run the DC
                        # predictor far past int32 before any other
                        # check fires — decode must fail with
                        # ValueError, never OverflowError
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dct)
                        if t > 16:
                            raise ValueError(
                                f"invalid DC category {t}")
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overrun")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz
                        block = block.reshape(8, 8) * dq
                        pix = _C.T @ block @ _C + 128.0
                        y0 = (my * bv + by) * 8
                        x0 = (mx * bh + bx) * 8
                        planes[pi][y0:y0 + 8, x0:x0 + 8] = pix
    return _assemble_image(comps, planes, width, height, hmax, vmax)


def _assemble_image(comps, planes, width, height, hmax, vmax):
    """Upsample component planes to full resolution, crop, and
    color-convert (shared by the baseline and progressive paths)."""
    full = []
    for c, plane in zip(comps, planes):
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        full.append(plane[:height, :width])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return width, height, out[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return width, height, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------- progressive (T.81 G)

def _comp_block_grid(comp, width, height, hmax, vmax):
    """Non-interleaved block grid of one component (T.81 A.2.2): the
    component's own sample grid, ceil'd to whole blocks."""
    cw = -(-width * comp["h"] // hmax)
    ch = -(-height * comp["v"] // vmax)
    return (ch + 7) // 8, (cw + 7) // 8


def _decode_progressive_sos(data, pos, width, height, comps, scan,
                            ss, se, ah, al, huff, restart_interval,
                            coefs, hmax, vmax, mcus_x, mcus_y):
    """Decode ONE progressive scan (T.81 Annex G) into the
    per-component zigzag coefficient grids, returning the stream
    position of the next marker.

    Four scan kinds: DC first (Ss=0, Ah=0 — Huffman diffs shifted left
    by Al), DC refinement (Ah>0 — one appended magnitude bit per
    block), AC first (Ss>0, Ah=0 — runs + EOBn end-of-band runs), AC
    refinement (correction bits for already-nonzero coefficients
    interleaved with ±1<<Al insertions).  DC scans may interleave
    components over the MCU grid; AC scans are single-component
    non-interleaved by spec.  Restart markers reset DC predictors and
    the EOB run."""
    plane_idx = {c["id"]: i for i, c in enumerate(comps)}
    reader = _BitReader(data, pos, pad_at_marker=True)
    ns = len(scan)
    if ss == 0:
        if se != 0:
            raise ValueError("DC progressive scan must have Se=0")
        if ah == 0:
            for comp, dc_id, _ in scan:
                if (0, dc_id) not in huff:
                    raise ValueError(
                        f"undefined Huffman table (dc={dc_id})")
        pred = [0] * ns
        if ns == 1:
            comp, dc_id, _ = scan[0]
            by, bx = _comp_block_grid(comp, width, height, hmax, vmax)
            units = ((0, y, x) for y in range(by) for x in range(bx))
        else:
            units = ((my, mx) for my in range(mcus_y)
                     for mx in range(mcus_x))
        count = 0
        for unit in units:
            if restart_interval and count and \
                    count % restart_interval == 0:
                reader.restart()
                pred = [0] * ns
            count += 1
            for ci, (comp, dc_id, _) in enumerate(scan):
                grid = coefs[plane_idx[comp["id"]]]
                if ns == 1:
                    blocks = [(unit[1], unit[2])]
                else:
                    my, mx = unit
                    blocks = [(my * comp["v"] + byy, mx * comp["h"] + bxx)
                              for byy in range(comp["v"])
                              for bxx in range(comp["h"])]
                for yy, xx in blocks:
                    blk = grid[yy, xx]
                    if ah == 0:
                        t = reader.decode_symbol(huff[(0, dc_id)])
                        if t > 16:
                            raise ValueError(f"invalid DC category {t}")
                        pred[ci] += _extend(reader.read_bits(t), t)
                        blk[0] = pred[ci] << al
                    elif reader.read_bit():
                        # appended magnitude bit: two's-complement OR,
                        # valid for negative values too (G.1.2.1)
                        blk[0] = int(blk[0]) | (1 << al)
    else:
        if ns != 1:
            raise ValueError(
                "progressive AC scan must be single-component")
        if se < ss or se > 63:
            raise ValueError(f"bad spectral selection {ss}..{se}")
        comp, _, ac_id = scan[0]
        if (1, ac_id) not in huff:
            raise ValueError(f"undefined Huffman table (ac={ac_id})")
        act = huff[(1, ac_id)]
        grid = coefs[plane_idx[comp["id"]]]
        by, bx = _comp_block_grid(comp, width, height, hmax, vmax)
        eobrun = 0
        p1, m1 = 1 << al, -1 << al
        count = 0
        for yy in range(by):
            for xx in range(bx):
                if restart_interval and count and \
                        count % restart_interval == 0:
                    reader.restart()
                    eobrun = 0
                count += 1
                blk = grid[yy, xx]
                if ah == 0:  # AC first scan (G.1.2.2)
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = reader.decode_symbol(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r < 15:  # EOBn
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.read_bits(r)
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > se:
                            raise ValueError("AC index overrun")
                        blk[k] = _extend(reader.read_bits(s), s) << al
                        k += 1
                else:  # AC refinement scan (G.1.2.3)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0x0F
                            newval = 0
                            if s == 0:
                                if r < 15:  # EOBn (counts this block)
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += reader.read_bits(r)
                                    break
                                # r == 15: ZRL — pass 16 zero-history
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "invalid AC refinement "
                                        f"magnitude {s}")
                                newval = p1 if reader.read_bit() else m1
                            # advance past r zero-history coefficients,
                            # emitting correction bits for nonzero ones
                            while k <= se:
                                v = int(blk[k])
                                if v != 0:
                                    if reader.read_bit() and \
                                            not (v & p1):
                                        blk[k] = v + (p1 if v >= 0
                                                      else m1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if newval and k <= se:
                                blk[k] = newval
                            k += 1
                    if eobrun:
                        # remainder of the band: correction bits only
                        while k <= se:
                            v = int(blk[k])
                            if v != 0 and reader.read_bit() and \
                                    not (v & p1):
                                blk[k] = v + (p1 if v >= 0 else m1)
                            k += 1
                        eobrun -= 1
    # resync: the next marker (skipping pad bits, stuffed FF00 and RSTn)
    p = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00 and \
                not (0xD0 <= data[p + 1] <= 0xD7):
            return p
        p += 1
    raise ValueError("truncated progressive stream")


def _reconstruct_progressive(comps, coefs, qt, width, height, hmax,
                             vmax):
    """Dequantize + batched IDCT of the accumulated coefficient grids
    (one einsum per component — the per-block Python loop stays in the
    entropy decode where it is unavoidable)."""
    planes = []
    for c, cz in zip(comps, coefs):
        if c["tq"] not in qt:
            raise ValueError(
                f"undefined quantization table {c['tq']}")
        dq = qt[c["tq"]].astype(np.float64)
        by, bx, _ = cz.shape
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[:, :, _ZIGZAG] = cz
        blocks = nat.reshape(by, bx, 8, 8) * dq
        pix = np.einsum("ij,abjk,kl->abil", _C.T, blocks, _C) + 128.0
        planes.append(pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8))
    return _assemble_image(comps, planes, width, height, hmax, vmax)


# ------------------------------------------------------------------ encoder

def _quality_tables(quality: int):
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_STD_LUMA_Q, _STD_CHROMA_Q):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out  # flat 64, natural (row-major) order


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
        # Truncate drained high bits so the accumulator stays a small int
        # (otherwise every shift is O(bytes emitted) and encode is O(n^2)).
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _encode_block(bw, block, q, dc_tbl, ac_tbl, pred):
    coef = _C @ (block - 128.0) @ _C.T
    zz = np.round(coef.reshape(-1)[_ZIGZAG] / q.reshape(-1)[_ZIGZAG]
                  ).astype(np.int32)
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff else 0
    code, ln = dc_tbl[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = ac_tbl[0x00]  # EOB
                bw.write(code, ln)
                break
            run += 1
            if run == 16:
                code, ln = ac_tbl[0xF0]  # ZRL
                bw.write(code, ln)
                run = 0
            continue
        s = abs(v).bit_length()
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    return int(zz[0])


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsampling: str = "444") -> bytes:
    """Encode ``uint8[h, w]``, ``[h, w, 1]`` or ``[h, w, 3]`` RGB to a
    baseline JFIF JPEG; ``subsampling`` is ``"444"`` (default) or
    ``"420"`` (2x2 luma sampling, chroma at quarter resolution — the
    web's dominant layout, and the fixture that exercises the
    decoder's multi-block MCU + upsample path)."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444 or 420, got "
                         f"{subsampling!r}")
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError(f"need 1 or 3 channels, got {nc}")
    lq, cq = _quality_tables(quality)
    if nc == 3:
        rgb = px.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
             + 0.114 * rgb[..., 2])
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        chans = [y, cb, cr]
        qsel = [0, 1, 1]
    else:
        chans = [px[..., 0].astype(np.float64)]
        qsel = [0]

    sub = subsampling == "420" and nc == 3
    hv = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nc

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, tbl in ([(0, lq)] + ([(1, cq)] if nc == 3 else [])):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(tbl.reshape(-1)[z]) for z in _ZIGZAG)
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc) + b"\x08" \
        + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        out += bytes([i + 1, (hv[i][0] << 4) | hv[i][1], qsel[i]])
    tables = ([(_DC_LUMA, 0x00), (_AC_LUMA, 0x10)]
              + ([(_DC_CHROMA, 0x01), (_AC_CHROMA, 0x11)]
                 if nc == 3 else []))
    for (bits, vals), tclass in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([tclass]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for i in range(nc):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_l = _build_encode_table(*_DC_LUMA)
    ac_l = _build_encode_table(*_AC_LUMA)
    dc_c = _build_encode_table(*_DC_CHROMA)
    ac_c = _build_encode_table(*_AC_CHROMA)
    qtabs = [lq.reshape(8, 8), cq.reshape(8, 8)]

    def pad_to(ch, bh, bw_):
        p = np.empty((bh, bw_))
        ch_h, ch_w = ch.shape
        p[:ch_h, :ch_w] = ch
        p[ch_h:, :ch_w] = ch[ch_h - 1:ch_h, :]   # edge-replicate padding
        p[:, ch_w:] = p[:, ch_w - 1:ch_w]
        return p

    hmax, vmax = max(x[0] for x in hv), max(x[1] for x in hv)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for ci, ch in enumerate(chans):
        if sub and ci > 0:
            # chroma at quarter resolution: 2x2 mean over the padded
            # full-res plane (pad first so odd dims average cleanly)
            p = pad_to(ch, mcus_y * 16, mcus_x * 16)
            ch = (p[0::2, 0::2] + p[1::2, 0::2]
                  + p[0::2, 1::2] + p[1::2, 1::2]) / 4.0
        padded.append(pad_to(ch, mcus_y * 8 * hv[ci][1],
                             mcus_x * 8 * hv[ci][0]))
    bw = _BitWriter()
    preds = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                dc_t = dc_l if ci == 0 else dc_c
                ac_t = ac_l if ci == 0 else ac_c
                ch_h, ch_v = hv[ci]
                for vb in range(ch_v):      # T.81 interleave: v-major
                    for hb in range(ch_h):
                        y0 = (my * ch_v + vb) * 8
                        x0 = (mx * ch_h + hb) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, qtabs[qsel[ci]], dc_t, ac_t,
                            preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
