"""JPEG (ITU-T T.81 / JFIF) decode in pure numpy + stdlib.

Converts the largest codec-gated multimodal surface into real behavior:
``decode_image`` (binary_ops) routes ``\\xff\\xd8``-signature payloads
here instead of raising NotImplementedError. Scope: the baseline
sequential DCT process (SOF0/1) AND the progressive DCT process (SOF2 —
spectral selection, successive approximation with DC/AC refinement and
EOB runs, per T.81 Annex G) — 8-bit samples, Huffman entropy coding,
1 or 3 components, any sampling factors in 1..2 (4:4:4 / 4:2:2 /
4:2:0), restart markers, byte stuffing, per-scan Huffman table
redefinition. Arithmetic coding, lossless/hierarchical processes, and
12-bit precision raise NotImplementedError naming the variant, the same
contract the PIL-backed path would slot into.

Design for the Spark pipeline it serves: this runs inside Arrow-batched
``mapInPandas`` workers (binary_ops.with_image_meta / resize_images), so
the per-image work is one Python entropy-decode loop (inherently
sequential bit stream) followed by fully vectorized numpy for everything
batchable — dequantization, the 2-D IDCT over all blocks at once
(einsum), plane assembly, chroma upsampling, and the YCbCr->RGB matrix.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag index: position k in the coded stream -> (row*8 + col)
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

# orthonormal 8-point DCT-III basis: pixels = A.T @ coefs @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _build_huffman(counts: list[int], symbols: bytes) -> dict:
    """Canonical Huffman: (length, code) -> symbol (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            # past the end: T.81 fills with 1-bits (F.2.2.5); harmless at
            # the tail of a correctly-coded segment
            return 1
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """DIFF/coefficient magnitude decode (T.81 F.2.2.1 EXTEND)."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _destuff(data: bytes) -> bytes:
    return data.replace(b"\xff\x00", b"\xff")


def _split_segments(entropy: bytes, restart_interval: int) -> list[bytes]:
    """Split entropy data at RSTn markers; each segment restarts the DC
    prediction (and, progressive, the EOB run)."""
    if not restart_interval:
        return [_destuff(entropy)]
    segments = []
    cur = bytearray()
    i = 0
    m = len(entropy)
    while i < m:
        if (
            entropy[i] == 0xFF
            and i + 1 < m
            and 0xD0 <= entropy[i + 1] <= 0xD7
        ):
            segments.append(_destuff(bytes(cur)))
            cur = bytearray()
            i += 2
        else:
            cur.append(entropy[i])
            i += 1
    segments.append(_destuff(bytes(cur)))
    return segments


def _decode_block_baseline(reader, blk, ci, pred, dc_tbl, ac_tbl) -> None:
    s = reader.decode_symbol(dc_tbl)
    pred[ci] += _extend(reader.read_bits(s), s)
    blk[0] = pred[ci]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        blk[k] = _extend(reader.read_bits(s), s)
        k += 1


def _ac_first_block(reader, ac_tbl, blk, Ss, Se, Al, eobrun) -> int:
    """Progressive AC initial scan for one block (T.81 G.2.2); returns
    the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = reader.decode_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            # EOBn: run of 2^r + bits blocks ending here (this block
            # is one of them)
            return (1 << r) + (reader.read_bits(r) if r else 0) - 1
        k += r
        if k > Se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(reader.read_bits(s), s) << Al
        k += 1
    return 0


def _ac_refine_block(reader, ac_tbl, blk, Ss, Se, Al, eobrun) -> int:
    """Progressive AC refinement for one block (T.81 G.2.2 / libjpeg
    decode_mcu_AC_refine): newly-significant coeffs arrive as ±1<<Al;
    every already-nonzero coeff passed on the way reads one correction
    bit. Returns the updated EOB run."""
    p1 = 1 << Al
    m1 = -p1
    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = reader.decode_symbol(ac_tbl)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:  # EOBn: refine the rest of the band below
                    eobrun = (1 << r) + (reader.read_bits(r) if r else 0)
                    break
                val = 0  # ZRL: skip 16 zero-history coeffs
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if reader.read_bit() else m1
            while k <= Se:
                if blk[k] != 0:
                    if reader.read_bit():
                        if (int(blk[k]) & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= Se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= Se:
            if blk[k] != 0:
                if reader.read_bit():
                    if (int(blk[k]) & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential or progressive (SOF0/1/2) JPEG to
    ndarray(h, w, 3) uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")

    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    progressive = False
    frame = None  # (h, w, [(comp_id, hi, vi, tq)])
    # scans: (scomps, Ss, Se, Ah, Al, entropy, ri, dc_tables, ac_tables)
    scans: list[tuple] = []

    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1 : i + 17])
                total = sum(counts)
                symbols = seg[i + 17 : i + 17 + total]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    counts, symbols
                )
                i += 17 + total
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog.
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(
                    f"{precision}-bit JPEG not supported (8-bit only)"
                )
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            comps = []
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} (arithmetic/lossless/"
                "hierarchical) not supported — sequential + progressive"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                idx = next(
                    i for i, f in enumerate(frame[2]) if f[0] == cs
                )
                scomps.append((idx, tdta >> 4, tdta & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            # entropy-coded data runs from here to the next real marker
            e = pos + seg_len
            start = e
            while e + 1 < n:
                if payload[e] == 0xFF and payload[e + 1] not in (
                    0x00, *range(0xD0, 0xD8)
                ):
                    break
                e += 1
            # huffman tables may be redefined between scans: snapshot
            scans.append(
                (scomps, ss, se, ahal >> 4, ahal & 0x0F,
                 payload[start:e], restart_interval,
                 dict(huff_dc), dict(huff_ac))
            )
            pos = e
            continue
        pos += seg_len

    if frame is None or not scans:
        raise ValueError("no frame/scan in JPEG")

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # coefficient storage per component, indexed [block_y, block_x, 64]
    coef = []
    for _, hi, vi, _tq in comps:
        coef.append(
            np.zeros((mcus_y * vi, mcus_x * hi, 64), dtype=np.int32)
        )

    for scomps, Ss, Se, Ah, Al, entropy, ri, dct, act in scans:
        if progressive:
            # T.81 G.1: DC scans carry exactly band [0,0]; AC scans are
            # single-component with 1 <= Ss <= Se <= 63 (catches baseline
            # streams relabeled SOF2 and truncated scan headers)
            if (Ss == 0) != (Se == 0):
                raise ValueError(
                    f"bad progressive band [{Ss},{Se}] (DC scans are "
                    "[0,0]; AC bands start at 1)"
                )
            if Ss > 0 and len(scomps) != 1:
                raise ValueError("progressive AC scan must be 1 component")
        segments = _split_segments(entropy, ri)
        interleaved = len(scomps) > 1
        # the unit sequence: (ci, block_y, block_x) in coded order —
        # MCU-interleaved for multi-component scans, the component's own
        # data-unit raster (NOT the MCU-padded grid) otherwise
        units: list[tuple[int, int, int]] = []
        if interleaved:
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci, _td, _ta in scomps:
                        _, hi, vi, _tq = comps[ci]
                        for by in range(vi):
                            for bx in range(hi):
                                units.append(
                                    (ci, my * vi + by, mx * hi + bx)
                                )
            # a restart interval counts MCUs; the loop below counts units
            per_restart = ri * sum(
                comps[c][1] * comps[c][2] for c, _t, _a in scomps
            )
        else:
            ci = scomps[0][0]
            _, hi, vi, _tq = comps[ci]
            comp_w = -((-w * hi) // hmax)  # ceil(w*hi/hmax)
            comp_h = -((-h * vi) // vmax)
            wb = -((-comp_w) // 8)
            hb = -((-comp_h) // 8)
            for by in range(hb):
                for bx in range(wb):
                    units.append((ci, by, bx))
            per_restart = ri
        tables = {ci: (dct.get(td), act.get(ta)) for ci, td, ta in scomps}

        seg_idx = 0
        reader = _BitReader(segments[0])
        pred = [0] * len(comps)
        eobrun = 0
        unit_count = 0
        for ci, by, bx in units:
            if ri and unit_count and unit_count % per_restart == 0:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                pred = [0] * len(comps)
                eobrun = 0
            blk = coef[ci][by, bx]
            dc_tbl, ac_tbl = tables[ci]
            if not progressive:
                _decode_block_baseline(reader, blk, ci, pred, dc_tbl, ac_tbl)
            elif Ss == 0 and Ah == 0:  # DC initial
                s = reader.decode_symbol(dc_tbl)
                pred[ci] += _extend(reader.read_bits(s), s)
                blk[0] = pred[ci] << Al
            elif Ss == 0:  # DC refinement: one bit per block
                if reader.read_bit():
                    blk[0] |= 1 << Al
            elif Ah == 0:  # AC initial
                eobrun = _ac_first_block(
                    reader, ac_tbl, blk, Ss, Se, Al, eobrun
                )
            else:  # AC refinement
                eobrun = _ac_refine_block(
                    reader, ac_tbl, blk, Ss, Se, Al, eobrun
                )
            unit_count += 1

    # vectorized: dequantize, dezigzag, IDCT every block at once
    planes = []
    for ci, (_, hi, vi, tq) in enumerate(comps):
        c = coef[ci].astype(np.float64) * qt[tq][np.newaxis, np.newaxis, :]
        blocks = np.zeros_like(c)
        blocks[..., ZIGZAG] = c
        by, bx = blocks.shape[0], blocks.shape[1]
        f = blocks.reshape(by, bx, 8, 8)
        # 2-D IDCT of every block at once: pix = A^T F A per block
        pix = np.einsum("ui,ybuv,vj->ybij", _A, f, _A)  # (by,bx,8,8)
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.clip(np.round(plane) + 128, 0, 255)
        # upsample to full resolution and crop
        plane = np.repeat(np.repeat(plane, vmax // vi, 0), hmax // hi, 1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        g = planes[0].astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# kept name: binary_ops and existing callers route through this
decode_baseline_jpeg = decode_jpeg
