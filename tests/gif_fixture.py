"""Real GIF encoder for fixtures: LZW with variable-width codes (spec
width rules: widen when the NEXT assignable code would not fit, cap 12
bits, clear-and-reset on a full table), sub-block packing, optional
4-pass interlace. Exercises the decoder on genuine dictionary growth,
width boundaries, and the KwKwK pattern."""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


def lzw_encode(indices: bytes, mcs: int) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = 0
    nacc = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = mcs + 1
    put(clear, width)
    buf = (indices[0],)
    for sym in indices[1:]:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        put(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:  # table full: clear (at the current width), reset
            put(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
        buf = (sym,)
    put(table[buf], width)
    put(end, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    rows: np.ndarray,
    palette: np.ndarray,
    *,
    interlace: bool = False,
    version: bytes = b"GIF89a",
    with_extension: bool = False,
) -> bytes:
    """rows: (h, w) uint8 palette indices; palette: (n, 3) uint8."""
    h, w = rows.shape
    k = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal = np.zeros((1 << k, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    mcs = max(2, k)
    out = bytearray()
    out += version
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((k - 1) & 0x07))  # GCT present, size 2^k
    out += b"\x00\x00"
    out += pal.tobytes()
    if with_extension:  # graphics-control extension: decoder must skip
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out.append(0x2C)
    out += struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0x00)
    if interlace:  # emit rows in pass order
        seq = np.concatenate([rows[s::t] for s, t in _INTERLACE])
    else:
        seq = rows
    out.append(mcs)
    data = lzw_encode(seq.tobytes(), mcs)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)
