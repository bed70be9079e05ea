"""Baseline JPEG ENCODER (test fixture builder) — pure numpy + stdlib.

Produces real, spec-conformant baseline JPEGs (T.81 Annex K quant +
Huffman tables) so the decoder in multimodal/jpeg.py is exercised against
genuine entropy-coded streams: grayscale, 4:4:4, and 4:2:0 subsampling,
optional restart markers. Written independently from the decoder (forward
DCT + canonical code construction from the spec tables), so a shared-bug
false pass would need the same mistake made twice in opposite directions.
"""

from __future__ import annotations

import numpy as np

from etl_bigquery_pipeline_spark.multimodal.jpeg import ZIGZAG, _A

# T.81 Annex K.1/K.2 quantization tables (quality 50), natural order
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# T.81 Annex K.3 typical Huffman tables: (bits[16], values)
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


# Complete AC symbol table for progressive scans: Annex K baseline AC
# tables lack the EOBn (0x10..0xE0) symbols progressive EOB runs need.
# 255 symbols at 8 bits + 1 at 9 bits (Kraft 0.998, all-ones pattern
# unused per T.81 C.2).
FLAT_AC = (
    [0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def _codes(bits, values):
    """Canonical codes: symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, coded bits) for a DC diff / AC coefficient (F.1.2.1)."""
    if v == 0:
        return 0, 0
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _zigzag_quant(block: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """8x8 spatial block (level-shifted) -> stream-order quantized coefs."""
    f = (_A @ block @ _A.T).reshape(64)
    natural = np.round(f / qt.reshape(64)).astype(np.int64)
    return natural[ZIGZAG]  # stream order k -> natural index ZIGZAG[k]


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    diff = int(zz[0]) - pred
    s, bits = _magnitude(diff)
    c, ln = dc_codes[s]
    w.write(c, ln)
    if s:
        w.write(bits, s)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        s, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | s]
        w.write(c, ln)
        w.write(bits, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]  # EOB
        w.write(c, ln)
    return int(zz[0])


def _pad_to(arr: np.ndarray, mult_h: int, mult_w: int) -> np.ndarray:
    h, w = arr.shape
    ph = (-h) % mult_h
    pw = (-w) % mult_w
    return np.pad(arr, ((0, ph), (0, pw)), mode="edge")


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def encode_baseline_jpeg(
    arr: np.ndarray,
    *,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """ndarray(h, w, 3) or (h, w) uint8 -> baseline JFIF bytes.

    subsampling: "444", "420", or "gray" (ignores chroma of RGB input).
    """
    arr = np.asarray(arr, dtype=np.float64)
    gray = subsampling == "gray" or arr.ndim == 2
    h, w = arr.shape[0], arr.shape[1]

    if arr.ndim == 2:
        y = arr
        cb = cr = None
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if gray:
        comps = [(1, 1, 1, 0, y)]  # (id, hi, vi, tq, plane)
    elif subsampling == "444":
        comps = [(1, 1, 1, 0, y), (2, 1, 1, 1, cb), (3, 1, 1, 1, cr)]
    elif subsampling == "420":
        cbp = _pad_to(cb, 2, 2)
        crp = _pad_to(cr, 2, 2)
        cb2 = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
        cr2 = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
        comps = [(1, 2, 2, 0, y), (2, 1, 1, 1, cb2), (3, 1, 1, 1, cr2)]
    elif subsampling == "422":
        cbp = _pad_to(cb, 1, 2)
        crp = _pad_to(cr, 1, 2)
        cb2 = cbp.reshape(cbp.shape[0], cbp.shape[1] // 2, 2).mean(2)
        cr2 = crp.reshape(crp.shape[0], crp.shape[1] // 2, 2).mean(2)
        comps = [(1, 2, 1, 0, y), (2, 1, 1, 1, cb2), (3, 1, 1, 1, cr2)]
    else:
        raise ValueError(f"unknown subsampling {subsampling!r}")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad every plane to its own MCU-aligned size
    planes = []
    for cid, hi, vi, tq, plane in comps:
        planes.append(
            (cid, hi, vi, tq,
             _pad_to(plane, mcus_y * vi * 8, mcus_x * hi * 8)[
                 : mcus_y * vi * 8, : mcus_x * hi * 8
             ] - 128.0)
        )

    qts = [QT_LUMA] + ([] if gray else [QT_CHROMA])
    dc_codes = [_codes(*DC_LUMA), _codes(*DC_CHROMA)]
    ac_codes = [_codes(*AC_LUMA), _codes(*AC_CHROMA)]

    out = bytearray(b"\xff\xd8")  # SOI
    for tq, qt in enumerate(qts):
        out += _seg(0xDB, bytes([tq]) + bytes(int(qt[z]) for z in ZIGZAG))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(planes)])
    for cid, hi, vi, tq, _ in planes:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xC0, sof)
    for tc, tables in ((0, (DC_LUMA, DC_CHROMA)), (1, (AC_LUMA, AC_CHROMA))):
        for th in range(1 if gray else 2):
            bits, values = tables[th]
            out += _seg(
                0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
            )
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(planes)])
    for cid, _, _, tq, _ in planes:
        sos += bytes([cid, (tq << 4) | tq])  # table id == component class
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    wtr = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                wtr.flush()
                out += wtr.buf
                wtr = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = [0] * len(planes)
            for ci, (cid, hi, vi, tq, plane) in enumerate(planes):
                for by in range(vi):
                    for bx in range(hi):
                        r0 = (my * vi + by) * 8
                        c0 = (mx * hi + bx) * 8
                        blk = plane[r0 : r0 + 8, c0 : c0 + 8]
                        zz = _zigzag_quant(blk, qts[min(tq, len(qts) - 1)])
                        pred[ci] = _encode_block(
                            wtr, zz, pred[ci],
                            dc_codes[min(ci, 1)], ac_codes[min(ci, 1)],
                        )
            mcu_count += 1
    wtr.flush()
    out += wtr.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _component_coefs(arr: np.ndarray, subsampling: str):
    """Shared front half of encoding: color transform, subsampling, MCU
    padding, per-block quantized stream-order coefficients. Returns
    (h, w, comps=[(cid, hi, vi, tq)], coefs=[ndarray(by,bx,64)], qts)."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = subsampling == "gray" or arr.ndim == 2
    h, w = arr.shape[0], arr.shape[1]
    if arr.ndim == 2:
        y = arr
        cb = cr = None
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    if gray:
        comps = [(1, 1, 1, 0, y)]
    elif subsampling == "444":
        comps = [(1, 1, 1, 0, y), (2, 1, 1, 1, cb), (3, 1, 1, 1, cr)]
    elif subsampling == "420":
        cbp = _pad_to(cb, 2, 2)
        crp = _pad_to(cr, 2, 2)
        cb2 = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
        cr2 = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
        comps = [(1, 2, 2, 0, y), (2, 1, 1, 1, cb2), (3, 1, 1, 1, cr2)]
    elif subsampling == "422":
        cbp = _pad_to(cb, 1, 2)
        crp = _pad_to(cr, 1, 2)
        cb2 = cbp.reshape(cbp.shape[0], cbp.shape[1] // 2, 2).mean(2)
        cr2 = crp.reshape(crp.shape[0], crp.shape[1] // 2, 2).mean(2)
        comps = [(1, 2, 1, 0, y), (2, 1, 1, 1, cb2), (3, 1, 1, 1, cr2)]
    else:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    qts = [QT_LUMA] + ([] if gray else [QT_CHROMA])
    meta = []
    coefs = []
    for cid, hi, vi, tq, plane in comps:
        p = _pad_to(plane, mcus_y * vi * 8, mcus_x * hi * 8)[
            : mcus_y * vi * 8, : mcus_x * hi * 8
        ] - 128.0
        by, bx = mcus_y * vi, mcus_x * hi
        zz = np.zeros((by, bx, 64), dtype=np.int64)
        for r0 in range(by):
            for c0 in range(bx):
                zz[r0, c0] = _zigzag_quant(
                    p[r0 * 8 : r0 * 8 + 8, c0 * 8 : c0 * 8 + 8],
                    qts[min(tq, len(qts) - 1)],
                )
        meta.append((cid, hi, vi, tq))
        coefs.append(zz)
    return h, w, meta, coefs, qts


class _EobState:
    """Cross-block EOB-run state for progressive AC scans (the encoder
    half of libjpeg's EOBRUN/BE machinery)."""

    def __init__(self, w: "_BitWriter", ac_codes: dict):
        self.w = w
        self.ac = ac_codes
        self.eobrun = 0
        self.run_bits: list[int] = []

    def flush(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            c, ln = self.ac[r << 4]
            self.w.write(c, ln)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
            for b in self.run_bits:
                self.w.write(b, 1)
            self.run_bits = []


def _ac_first_block_enc(st: _EobState, zz, Ss, Se, Al) -> None:
    t = [
        (1 if zz[k] > 0 else -1) * (abs(int(zz[k])) >> Al)
        for k in range(Ss, Se + 1)
    ]
    last = max((i for i, v in enumerate(t) if v), default=None)
    if last is None:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush()
        return
    st.flush()
    r = 0
    for i in range(last + 1):
        v = t[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            c, ln = st.ac[0xF0]
            st.w.write(c, ln)
            r -= 16
        s, bits = _magnitude(v)
        c, ln = st.ac[(r << 4) | s]
        st.w.write(c, ln)
        st.w.write(bits, s)
        r = 0
    if last < Se - Ss:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush()


def _ac_refine_block_enc(st: _EobState, zz, Ss, Se, Al) -> None:
    t = [abs(int(zz[k])) >> Al for k in range(Ss, Se + 1)]
    eob = max((i for i, v in enumerate(t) if v == 1), default=-1)
    bits_cur: list[int] = []
    r = 0
    for i in range(len(t)):
        temp = t[i]
        if temp == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            st.flush()
            c, ln = st.ac[0xF0]
            st.w.write(c, ln)
            r -= 16
            for b in bits_cur:
                st.w.write(b, 1)
            bits_cur = []
        if temp > 1:  # already significant: correction bit only
            bits_cur.append(temp & 1)
            continue
        st.flush()
        c, ln = st.ac[(r << 4) | 1]
        st.w.write(c, ln)
        st.w.write(1 if zz[Ss + i] >= 0 else 0, 1)
        for b in bits_cur:
            st.w.write(b, 1)
        bits_cur = []
        r = 0
    if r > 0 or bits_cur:
        st.eobrun += 1
        st.run_bits += bits_cur
        if st.eobrun == 0x7FFF:
            st.flush()


def encode_progressive_jpeg(
    arr: np.ndarray,
    *,
    subsampling: str = "444",
    script: str = "sa",
) -> bytes:
    """Real progressive (SOF2) encoder. ``script``:

    - "spectral": spectral selection only — DC scan then one full AC band
      per component (Al=0 everywhere; exercises SOF2 + EOB runs).
    - "sa": successive approximation — DC at Al=1 + refinement, AC in two
      luma bands at Al=2 refined twice, chroma at Al=1 refined once
      (exercises DC/AC refinement incl. the buffered-correction-bit
      machinery).

    Both scripts deliver every coefficient at full precision, so the
    decoded pixels must EQUAL the baseline encoding's decode.
    """
    h, w, comps, coefs, qts = _component_coefs(arr, subsampling)
    gray = len(comps) == 1
    dc_codes = [_codes(*DC_LUMA), _codes(*DC_CHROMA)]
    flat = _codes(*FLAT_AC)
    ac_codes = [flat, flat]

    out = bytearray(b"\xff\xd8")
    for tq, qt in enumerate(qts):
        out += _seg(0xDB, bytes([tq]) + bytes(int(qt[z]) for z in ZIGZAG))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += _seg(0xC2, sof)
    for tc, tables in ((0, (DC_LUMA, DC_CHROMA)), (1, (FLAT_AC, FLAT_AC))):
        for th in range(1 if gray else 2):
            bits, values = tables[th]
            out += _seg(
                0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
            )

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    def sos_header(comp_ids, Ss, Se, Ah, Al) -> bytes:
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            cid = comps[ci][0]
            t = min(ci, 1)
            sos += bytes([cid, (t << 4) | t])
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        return _seg(0xDA, sos)

    def dc_scan(Ah, Al) -> bytes:
        wtr = _BitWriter()
        pred = [0] * len(comps)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (_cid, hi, vi, _tq) in enumerate(comps):
                    for by in range(vi):
                        for bx in range(hi):
                            v = int(coefs[ci][my * vi + by, mx * hi + bx, 0])
                            if Ah == 0:  # initial: diff of v >> Al
                                d = (v >> Al) - pred[ci]
                                pred[ci] = v >> Al
                                s, bits = _magnitude(d)
                                c, ln = dc_codes[min(ci, 1)][s]
                                wtr.write(c, ln)
                                if s:
                                    wtr.write(bits, s)
                            else:  # refinement: the Al bit
                                wtr.write((v >> Al) & 1, 1)
        wtr.flush()
        return bytes(wtr.buf)

    def ac_scan(ci, Ss, Se, Ah, Al) -> bytes:
        _cid, hi, vi, _tq = comps[ci]
        comp_w = -((-w * hi) // hmax)
        comp_h = -((-h * vi) // vmax)
        wb = -((-comp_w) // 8)
        hb = -((-comp_h) // 8)
        wtr = _BitWriter()
        st = _EobState(wtr, ac_codes[min(ci, 1)])
        for by in range(hb):
            for bx in range(wb):
                zz = coefs[ci][by, bx]
                if Ah == 0:
                    _ac_first_block_enc(st, zz, Ss, Se, Al)
                else:
                    _ac_refine_block_enc(st, zz, Ss, Se, Al)
        st.flush()
        wtr.flush()
        return bytes(wtr.buf)

    all_comps = list(range(len(comps)))
    if script == "spectral":
        out += sos_header(all_comps, 0, 0, 0, 0) + dc_scan(0, 0)
        for ci in all_comps:
            out += sos_header([ci], 1, 63, 0, 0) + ac_scan(ci, 1, 63, 0, 0)
    elif script == "sa":
        out += sos_header(all_comps, 0, 0, 0, 1) + dc_scan(0, 1)
        out += sos_header([0], 1, 5, 0, 2) + ac_scan(0, 1, 5, 0, 2)
        out += sos_header([0], 6, 63, 0, 2) + ac_scan(0, 6, 63, 0, 2)
        for ci in all_comps[1:]:
            out += sos_header([ci], 1, 63, 0, 1) + ac_scan(ci, 1, 63, 0, 1)
        out += sos_header(all_comps, 0, 0, 1, 0) + dc_scan(1, 0)
        out += sos_header([0], 1, 5, 2, 1) + ac_scan(0, 1, 5, 2, 1)
        out += sos_header([0], 6, 63, 2, 1) + ac_scan(0, 6, 63, 2, 1)
        out += sos_header([0], 1, 5, 1, 0) + ac_scan(0, 1, 5, 1, 0)
        out += sos_header([0], 6, 63, 1, 0) + ac_scan(0, 6, 63, 1, 0)
        for ci in all_comps[1:]:
            out += sos_header([ci], 1, 63, 1, 0) + ac_scan(ci, 1, 63, 1, 0)
    else:
        raise ValueError(f"unknown script {script!r}")
    out += b"\xff\xd9"
    return bytes(out)
