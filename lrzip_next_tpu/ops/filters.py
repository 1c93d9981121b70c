"""Pre-compression filters: delta + BCJ branch converters.

The reference applies these to stream-1 (literal) blocks before the
backend codec (src/stream.c:1586-1628 encode, 1936-1990 decode), using
the LZMA SDK implementations (src/lzma/C/Bra.c, Bra86.c, Delta.c).

These are pure byte-level transforms, re-implemented here as vectorised
numpy ops (they are embarrassingly parallel except for the x86 filter's
small sequential state, handled with a scan).
"""

from __future__ import annotations

import numpy as np

from ..format.constants import (FILTER_ARM, FILTER_ARM64, FILTER_ARMT,
                                FILTER_DELTA, FILTER_IA64, FILTER_PPC,
                                FILTER_RISCV, FILTER_SPARC, FILTER_X86)


# ---------------------------------------------------------------- delta

def delta_encode(data: bytes, offset: int) -> bytes:
    """out[i] = in[i] - in[i-offset] (mod 256); first `offset` bytes raw.

    Matches Delta_Encode (reference src/lzma/C/Delta.c:16-113) with a
    zero-initialised state buffer.
    """
    a = np.frombuffer(data, dtype=np.uint8)
    out = a.copy()
    if len(a) > offset:
        out[offset:] = a[offset:] - a[:-offset]
    return out.tobytes()


def delta_decode(data: bytes, offset: int) -> bytes:
    """Inverse of delta_encode: prefix-sum with stride ``offset``."""
    a = np.frombuffer(data, dtype=np.uint8).copy()
    n = len(a)
    if n > offset:
        # per-residue-class cumulative sum (wraps mod 256)
        for r in range(offset):
            lane = a[r::offset]
            np.cumsum(lane, dtype=np.uint8, out=lane)
    return a.tobytes()


# ------------------------------------------------------------ BCJ: ARM

def _arm_conv(data: bytes, ip: int, encoding: bool) -> bytes:
    """ARM BL: 4-byte words with byte3 == 0xEB get their 24-bit word
    offset converted between relative and absolute (Bra.c ARM path)."""
    a = np.frombuffer(data, dtype=np.uint8).copy()
    n = len(a) & ~3
    if n < 4:
        return data
    w = a[:n].view("<u4").copy()
    mask = (w >> 24) == 0xEB
    idx = np.flatnonzero(mask)
    if len(idx):
        src = (w[idx] & 0x00FFFFFF) << 2
        pc = (ip + idx.astype(np.uint64) * 4 + 8).astype(np.uint32)
        dest = (src + pc) if encoding else (src - pc)
        w[idx] = (0xEB << 24) | ((dest >> 2) & 0x00FFFFFF)
    a[:n] = w.view(np.uint8)
    return a.tobytes()


def _armt_conv(data: bytes, ip: int, encoding: bool) -> bytes:
    """ARM Thumb BL: pairs of 16-bit words (0xF0xx, 0xF8xx) (Bra.c ARMT)."""
    a = bytearray(data)
    n = len(a)
    i = 0
    while i + 4 <= n:
        if (a[i + 1] & 0xF8) == 0xF0 and (a[i + 3] & 0xF8) == 0xF8:
            src = (((a[i + 1] & 0x7) << 19) | (a[i] << 11)
                   | ((a[i + 3] & 0x7) << 8) | a[i + 2]) << 1
            pc = ip + i + 4
            dest = (src + pc if encoding else src - pc) & 0xFFFFFFFF
            dest >>= 1
            a[i + 1] = 0xF0 | ((dest >> 19) & 0x7)
            a[i] = (dest >> 11) & 0xFF
            a[i + 3] = 0xF8 | ((dest >> 8) & 0x7)
            a[i + 2] = dest & 0xFF
            i += 2
        i += 2
    return bytes(a)


def _arm64_conv(data: bytes, ip: int, encoding: bool) -> bytes:
    """ARM64: BL (imm26) and ADRP (imm21, +-512MB window) conversion
    (Bra.c z7_BranchConv_ARM64 path)."""
    a = np.frombuffer(data, dtype=np.uint8).copy()
    n = len(a) & ~3
    if n < 4:
        return data
    w = a[:n].view("<u4").copy()
    pos = np.arange(len(w), dtype=np.uint32) * 4
    pc2 = ((np.uint32(ip) + pos) >> 2).astype(np.uint32)

    # BL: top 6 bits == 0x25 (opcode 100101)
    bl = (w >> 26) == 0x25
    idx = np.flatnonzero(bl)
    if len(idx):
        src = w[idx] & 0x03FFFFFF
        dest = (src + pc2[idx]) if encoding else (src - pc2[idx])
        w[idx] = (np.uint32(0x25) << 26) | (dest & 0x03FFFFFF)

    # ADRP: (w & 0x9F000000) == 0x90000000, with range filter on imm
    adrp = (w & 0x9F000000) == 0x90000000
    idx = np.flatnonzero(adrp)
    if len(idx):
        v = w[idx]
        imm = ((v >> 29) & 3) | ((v >> 3) & 0x001FFFFC)
        # only convert +-512MB immediates (kept as the SDK does)
        sel = ((imm + 0x00020000) & 0x001C0000) == 0
        vi = v[sel]
        immi = imm[sel]
        pci = (pc2[idx][sel] >> 10).astype(np.uint32)
        dest = (immi + pci) if encoding else (immi - pci)
        dest &= 0x0003FFFF
        sign = (dest >> 17) & 1
        dest = dest | (sign * np.uint32(0x001C0000))
        nv = (vi & 0x9000001F) | ((dest & 3) << 29) \
            | ((dest & 0x001FFFFC) << 3)
        v[sel] = nv
        w[idx] = v
    a[:n] = w.view(np.uint8)
    return a.tobytes()


def _ppc_conv(data: bytes, ip: int, encoding: bool) -> bytes:
    """PPC bl: big-endian words matching (w & 0xFC000003) == 0x48000001."""
    a = np.frombuffer(data, dtype=np.uint8).copy()
    n = len(a) & ~3
    if n < 4:
        return data
    w = a[:n].view(">u4").copy()
    mask = (w & 0xFC000003) == 0x48000001
    idx = np.flatnonzero(mask)
    if len(idx):
        src = w[idx] & 0x03FFFFFC
        pc = (np.uint32(ip) + idx.astype(np.uint32) * 4)
        dest = (src + pc) if encoding else (src - pc)
        w[idx] = np.uint32(0x48000001) | (dest & 0x03FFFFFC)
    a[:n] = w.view(np.uint8)
    return a.tobytes()


def _sparc_conv(data: bytes, ip: int, encoding: bool) -> bytes:
    """SPARC call: big-endian words 0x40000000..0x7FFFFFFF window
    (Bra.c SPARC path: top bits 0x40000000 with sign window)."""
    a = np.frombuffer(data, dtype=np.uint8).copy()
    n = len(a) & ~3
    if n < 4:
        return data
    w = a[:n].view(">u4").copy()
    mask = ((w >> 22) == 0x100) | ((w >> 22) == 0x1FF)
    idx = np.flatnonzero(mask)
    if len(idx):
        src = (w[idx] << 2).astype(np.uint32)
        pc = (np.uint32(ip) + idx.astype(np.uint32) * 4)
        dest = (src + pc) if encoding else (src - pc)
        dest >>= 2
        dest = ((np.uint32(0x40000000) - (dest & 0x400000))
                | np.uint32(0x40000000) | (dest & 0x3FFFFF))
        w[idx] = dest
    a[:n] = w.view(np.uint8)
    return a.tobytes()


# ------------------------------------------------------------- BCJ: x86

_X86_ALLOWED = np.array(
    [True, True, True, False, True, False, False, False], dtype=bool)


def _x86_conv(data: bytes, ip: int, encoding: bool) -> bytes:
    """x86 CALL/JMP rel32 conversion with the SDK's mask-state machine
    (reference src/lzma/C/Bra86.c).  Sequential state, scalar loop."""
    a = bytearray(data)
    size = len(a)
    if size < 5:
        return data
    mask = 0
    prev_pos = -1
    p = 0
    limit = size - 4
    while p < limit:
        if a[p] & 0xFE != 0xE8:
            p += 1
            continue
        d = p - prev_pos
        prev_pos = p
        if d > 3:
            mask = 0
        else:
            mask = (mask << (d - 1)) & 7
            if mask != 0:
                b = a[p + 4 - _mask_to_bit_number(mask)]
                if not _X86_ALLOWED[mask >> 1] or b == 0 or b == 0xFF:
                    mask = ((mask >> 1) | 4) & 7
                    p += 1
                    continue
        if a[p + 4] in (0, 0xFF):
            src = (a[p + 1] | (a[p + 2] << 8) | (a[p + 3] << 16)
                   | (a[p + 4] << 24))
            while True:
                if encoding:
                    dest = (src + (ip + p + 5)) & 0xFFFFFFFF
                else:
                    dest = (src - (ip + p + 5)) & 0xFFFFFFFF
                if mask == 0:
                    break
                i = _mask_to_bit_number(mask) * 8
                b = (dest >> (24 - i)) & 0xFF
                if b != 0 and b != 0xFF:
                    break
                src = dest ^ (((1 << (32 - i)) - 1) & 0xFFFFFFFF)
            a[p + 4] = 0xFF if ((dest >> 24) & 1) else 0
            a[p + 3] = (dest >> 16) & 0xFF
            a[p + 2] = (dest >> 8) & 0xFF
            a[p + 1] = dest & 0xFF
            p += 5
            mask = 0
            prev_pos = p - 1
        else:
            mask = ((mask >> 1) | 4) & 7
            p += 1
    return bytes(a)


def _mask_to_bit_number(mask: int) -> int:
    return {0: 0, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3, 6: 3, 7: 3}[mask]


# ------------------------------------------------------------- dispatch

_BCJ = {
    FILTER_X86: _x86_conv,
    FILTER_ARM: _arm_conv,
    FILTER_ARMT: _armt_conv,
    FILTER_ARM64: _arm64_conv,
    FILTER_PPC: _ppc_conv,
    FILTER_SPARC: _sparc_conv,
}


def apply_filter(data: bytes, filter_flag: int, delta_offset: int = 1,
                 ip: int = 0) -> bytes:
    if filter_flag == FILTER_DELTA:
        return delta_encode(data, delta_offset)
    fn = _BCJ.get(filter_flag)
    if fn is None:
        raise NotImplementedError(
            f"BCJ filter {filter_flag} encode not implemented yet")
    return fn(data, ip, encoding=True)


def undo_filter(data: bytes, filter_flag: int, delta_offset: int = 1,
                minor_version: int = 14, ip: int = 0) -> bytes:
    if filter_flag == FILTER_DELTA:
        return delta_decode(data, delta_offset)
    fn = _BCJ.get(filter_flag)
    if fn is None:
        raise NotImplementedError(
            f"BCJ filter {filter_flag} decode not implemented yet")
    return fn(data, ip, encoding=False)
