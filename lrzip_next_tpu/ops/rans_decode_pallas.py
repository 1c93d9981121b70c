"""Pallas rANS decode scan: the entropy-decoder hot loop in VMEM.

Mirror of ops/rans_pallas (encode): the XLA decode (ops/rans._decode_scan)
spends its time materializing per-step (K, 256) fetched table rows and
the 3x14-stage word-routing expand through HBM; at 64MB chunks it runs
~250 MB/s.  This kernel keeps the decoder state machine on-chip:

- **Lane state as (8, K/8) tiles** - the K lane states, contexts and
  per-row symbols live as (8, K/8) VMEM arrays (full 8x128 vreg
  utilization; the flat row-major order IS the lane order, so the
  wire-format word-consumption order matches with no relayouts).
- **Two-level table search** - finding ``s`` with cum[s] <= slot <
  cum[s+1] uses a coarse 4-entry row (cum[ctx][j*64], one small MXU
  one-hot fetch + 4 compares) to pick a 64-symbol block, then fetches
  the block's packed (cum*M + f-1) values with the same (192, C*4)
  three-plane bf16 table the encode kernel uses (ops/rans_pallas.
  _packed_table) and reduces 64-wide.  All exact: one-term bf16
  products accumulate in f32, values < 2^24.
- **Streamed word window** - the wire stream lives in HBM as (rows,
  K/8) int32; each grid step DMAs a 66-row window at the current word
  pointer (a kernel-carried SMEM scalar - consumption is
  data-dependent), and each scan row dynamically slices + flat-shifts
  a 9-row sub-window so window[j] sits at flat position j.
- **Flat log-shift expand** - words route to renormalizing lanes with
  the proven 3-phase expand (exclusive prefix rank, route-left the
  flag indices, route-right the words: ops/rans._expand_to_flags), on
  (8, K/8) tiles via linear shifts (concat ops only, no gathers).

Bit-identical to ops/rans._decode_scan on MAGIC=1 payloads (same wire
format, same per-step arithmetic); the final per-lane states must equal
L, which the caller checks.

Reference role: replaces the serial entropy-decode loops the reference
runs in native code (src/lzma/C/LzmaDec.c:510-880, libzpaq decoder),
dispatched from src/stream.c:167-554.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rans_pallas import _packed_table, _srl

M_BITS = 12
M = 1 << M_BITS
_L_INIT = 1 << 16

_ROWS = 8       # scan rows per grid step
_WIN = 72       # stream window rows: 1 (offset) + 8*K words / (K/8) + 1,
#                 rounded up so 8-aligned 16-row loads stay in bounds
_SUBW = 16      # per-scan-row sub-window rows: 8-aligned load covering
#                 1 (offset) + K/(K/8) rows + up to 7 alignment rows


def _flat_shift_left(x: jnp.ndarray, s: int, kc: int) -> jnp.ndarray:
    """y[j] = x[j + s] in row-major linear order of an (R, kc) tile,
    zero-filled past the end.  s is a power of two (so either s < kc,
    or s is a whole number of rows)."""
    rows, lanes = divmod(s, kc)
    if rows:
        x = jnp.concatenate(
            [x[rows:], jnp.zeros((rows, kc), x.dtype)], axis=0)
    if lanes:
        nxt = jnp.concatenate(
            [x[1:], jnp.zeros((1, kc), x.dtype)], axis=0)
        x = jnp.concatenate([x[:, lanes:], nxt[:, :lanes]], axis=1)
    return x


def _flat_shift_right(x: jnp.ndarray, s: int, kc: int) -> jnp.ndarray:
    """y[j] = x[j - s] linear row-major, zero-filled before the start."""
    rows, lanes = divmod(s, kc)
    if rows:
        x = jnp.concatenate(
            [jnp.zeros((rows, kc), x.dtype), x[:-rows]], axis=0)
    if lanes:
        prv = jnp.concatenate(
            [jnp.zeros((1, kc), x.dtype), x[:-1]], axis=0)
        x = jnp.concatenate([prv[:, kc - lanes:], x[:, :-lanes]], axis=1)
    return x


def _excl_cumsum_flat(x: jnp.ndarray, kc: int) -> jnp.ndarray:
    """Exclusive cumsum over row-major linear order of an (8, kc) int32
    tile: log-shift adds along lanes + log-shift sublane adds (concat
    shifts) for the cross-row prefix - NOT a triangular matmul; see the
    miscompile note below."""
    inc = x
    s = 1
    while s < kc:
        inc = inc + jnp.pad(inc, ((0, 0), (s, 0)))[:, :kc]
        s <<= 1
    # cross-row prefix WITHOUT the (8,8)@(8,kc) triangular matmul: on
    # real v5e Mosaic miscompiled that contraction for some operand
    # values (row 5's total read one short -> every rank in rows 6-7
    # short by one -> routing collision -> dropped stream word; found
    # vs the XLA scan at 4MB, grid step 127 - tools/_dbg_decode.py).
    # Log-shift sublane adds use only concats, the construct the
    # window machinery already proves on hardware.
    row_tot = jnp.broadcast_to(jnp.sum(x, axis=1, keepdims=True), (8, kc))
    rp = row_tot
    for s in (1, 2, 4):
        rp = rp + jnp.concatenate(
            [jnp.zeros((s, kc), jnp.int32), rp[:-s]], axis=0)
    return inc - x + rp - row_tot


def _route_left_flat(v, d, m, nbits: int, kc: int):
    """Move v[j] left by d[j] (LSB-first; monotone distances over
    occupied slots are congestion-free - ops/rans._route_left)."""
    for b in range(nbits):
        s = 1 << b
        lv = _flat_shift_left(v, s, kc)
        ld = _flat_shift_left(d, s, kc)
        lm = _flat_shift_left(m, s, kc)
        take = (lm > 0) & (((ld >> b) & 1) > 0)
        moving = (m > 0) & (((d >> b) & 1) > 0)
        m = jnp.where(take, 1, jnp.where(moving, 0, m))
        d = jnp.where(take, ld - s, d)
        v = jnp.where(take, lv, v)
    return v


def _route_right_flat(v, d, m, nbits: int, kc: int):
    """Move v[j] right by d[j] (MSB-first mirror - ops/rans._route_right)."""
    for b in reversed(range(nbits)):
        s = 1 << b
        rv = _flat_shift_right(v, s, kc)
        rd = _flat_shift_right(d, s, kc)
        rm = _flat_shift_right(m, s, kc)
        take = (rm > 0) & (((rd >> b) & 1) > 0)
        moving = (m > 0) & (((d >> b) & 1) > 0)
        m = jnp.where(take, 1, jnp.where(moving, 0, m))
        d = jnp.where(take, rd - s, d)
        v = jnp.where(take, rv, v)
    return v


def _expand_flat_tile(window, e, idx, rank, cnt, nbits: int, kc: int):
    """window[j] -> j-th flagged flat position (ops/rans.
    _expand_to_flags on (8, kc) tiles)."""
    ei = e.astype(jnp.int32)
    dist_l = jnp.where(e, idx - rank, 0)
    tgt = _route_left_flat(idx, dist_l, ei, nbits, kc)
    j_ok = idx < cnt
    dist_r = jnp.where(j_ok, tgt - idx, 0)
    return _route_right_flat(window, dist_r, j_ok.astype(jnp.int32),
                             nbits, kc)


def _coarse_table(freqs: jnp.ndarray) -> jnp.ndarray:
    """(C, 256) freqs -> (8, C) bf16 two-plane packed coarse cums:
    cum[ctx][64*j] for j in 0..3 (values < 4096: hi < 16, lo < 256)."""
    cum = jnp.cumsum(freqs, axis=-1) - freqs
    coarse = cum[:, ::64]                         # (C, 4) - tiny
    return jnp.concatenate(
        [(coarse >> 8).T, (coarse & 255).T],
        axis=0).astype(jnp.bfloat16)              # (8, C)


def _make_decode_kernel(t_len: int, k: int, c: int, ctx_bits: int,
                        g_cnt: int):
    kc = k // 8
    ch = c * 4
    nbits = max(int(k - 1).bit_length(), 1)
    shift = 8 - ctx_bits

    def kernel(n_ref, states_ref, ctab_ref, tab_ref, stream_ref,
               out_ref, st_out_ref, x_ref, cq_ref, win_ref, ptr_ref,
               sem_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _init():
            x_ref[...] = states_ref[...]
            cq_ref[...] = jnp.zeros((8, kc), jnp.int32)
            ptr_ref[0] = 0

        n = n_ref[0]
        ptr0 = ptr_ref[0]
        # HBM refs are (8, 128)-tiled: the window start must be 8-row
        # aligned; the in-row remainder folds into each scan row's
        # roff/o offsets below
        wrow = pl.multiple_of(
            (jax.lax.div(ptr0, kc * 8)) * 8, 8)
        dma = pltpu.make_async_copy(
            stream_ref.at[pl.ds(wrow, _WIN)], win_ref, sem_ref)
        dma.start()

        ctab = ctab_ref[...]                      # (8, C) bf16
        tab = tab_ref[...]                        # (192, CH) bf16
        lane = (jax.lax.broadcasted_iota(jnp.int32, (8, kc), 0) * kc
                + jax.lax.broadcasted_iota(jnp.int32, (8, kc), 1))
        idx = lane                                # flat linear index
        x = x_ref[...]
        cq = cq_ref[...]
        ptr = ptr0

        dma.wait()

        for i in range(_ROWS):
            t = b * _ROWS + i
            slot = x & (M - 1)
            slot_f = slot.astype(jnp.float32)
            s_rows = []
            v_rows = []
            for r in range(8):
                cq_r = cq[r:r + 1]                # (1, kc)
                iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, kc), 0)
                ohc = (iota_c == cq_r).astype(jnp.bfloat16)
                crow = jax.lax.dot_general(
                    ctab, ohc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (8, kc)
                coarse = crow[0:4] * 256.0 + crow[4:8]    # (4, kc) f32
                blk = jnp.sum((coarse <= slot_f[r:r + 1]).astype(
                    jnp.int32), axis=0, keepdims=True) - 1
                chi = cq_r * 4 + blk
                iota_h = jax.lax.broadcasted_iota(jnp.int32, (ch, kc), 0)
                ohx = (iota_h == chi).astype(jnp.bfloat16)
                rows = jax.lax.dot_general(
                    tab, ohx, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (192, kc)
                val = (rows[0:64] * 65536.0 + rows[64:128] * 256.0
                       + rows[128:192]).astype(jnp.int32)  # (64, kc)
                le = _srl(val, M_BITS) <= slot[r:r + 1]
                cnt32 = jnp.sum(le.astype(jnp.int32), axis=0,
                                keepdims=True)
                vsel = jnp.max(jnp.where(le, val, 0), axis=0,
                               keepdims=True)
                s_rows.append(blk * 64 + cnt32 - 1)
                v_rows.append(vsel)
            s = jnp.concatenate(s_rows, axis=0)   # (8, kc)
            vsel = jnp.concatenate(v_rows, axis=0)
            cs = _srl(vsel, M_BITS)
            f = (vsel & (M - 1)) + 1
            x2 = f * _srl(x, M_BITS) + (slot - cs)
            valid = (t < t_len) & ((lane * t_len + t) < n)
            x2v = jnp.where(valid, x2, x)
            e = valid & (x2v >= 0) & (x2v < _L_INIT)
            # word window: flat positions [ptr, ptr + K) of the stream
            loc = ptr - wrow * kc
            roff = jax.lax.div(loc, kc)
            o = jax.lax.rem(loc, kc)
            # Mosaic requires sublane offsets provably 8-aligned: load
            # at the aligned row below, then row-shift by the remainder
            roff8 = pl.multiple_of((roff // 8) * 8, 8)
            dr = roff - roff8                     # 0..7
            sub = win_ref[pl.ds(roff8, _SUBW), :]
            for bb in range(3):
                s_r = 1 << bb
                sh = jnp.concatenate(
                    [sub[s_r:], jnp.zeros((s_r, kc), jnp.int32)], axis=0)
                sub = jnp.where(((dr >> bb) & 1) > 0, sh, sub)
            for bb in range(kc.bit_length() - 1):
                sh = _flat_shift_left(sub, 1 << bb, kc)
                sub = jnp.where(((o >> bb) & 1) > 0, sh, sub)
            window = sub[:8]                      # (8, kc) int32
            ei = e.astype(jnp.int32)
            rank = _excl_cumsum_flat(ei, kc)
            cnt = jnp.sum(ei)
            wv = _expand_flat_tile(window, e, idx, rank, cnt, nbits, kc)
            x3 = jnp.where(e, (x2v << 16) | (wv & 0xFFFF), x2v)
            x = jnp.where(valid, x3, x)
            if ctx_bits:
                cq = jnp.where(valid, _srl(s, shift), cq)
            out_ref[0, i] = jnp.where(valid, s, 0)
            ptr = ptr + cnt

        x_ref[...] = x
        cq_ref[...] = cq
        ptr_ref[0] = ptr
        st_out_ref[...] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("ctx_bits", "t_len",
                                              "interpret"))
def decode_scan_fused(stream_pad: jnp.ndarray, states: jnp.ndarray,
                      freqs: jnp.ndarray, n: jnp.ndarray, ctx_bits: int,
                      t_len: int, interpret: bool = False):
    """Pallas decode scan.  stream_pad: (>= n_words,) int32 u16 words in
    consumption order; states: (K,) uint32; freqs: (C, 256) int32.
    Returns (syms (T, K) uint8, final states (K,) uint32) bit-identical
    to ops/rans._decode_scan.
    """
    k = states.shape[0]
    kc = k // 8
    c = freqs.shape[0]
    g_cnt = (t_len + _ROWS - 1) // _ROWS
    # stream rows: enough that every window read [wrow, wrow + _WIN)
    # stays in bounds (wrow <= total consumed / kc <= t_len * 8)
    sr = (stream_pad.shape[0] + kc - 1) // kc + _WIN
    need = sr * kc - stream_pad.shape[0]
    w2 = jnp.concatenate(
        [stream_pad.astype(jnp.int32),
         jnp.zeros((need,), jnp.int32)]).reshape(sr, kc)
    st8 = jax.lax.bitcast_convert_type(states, jnp.int32).reshape(8, kc)
    tab = _packed_table(freqs)                    # (96, C*8) bf16
    ctab = _coarse_table(freqs)                   # (16, C) bf16
    n_arr = jnp.asarray(n, jnp.int32).reshape(1)

    syms, xf = pl.pallas_call(
        _make_decode_kernel(t_len, k, c, ctx_bits, g_cnt),
        grid=(g_cnt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, kc), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((192, c * 4), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, _ROWS, 8, kc), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kc), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g_cnt, _ROWS, 8, kc), jnp.int32),
            jax.ShapeDtypeStruct((8, kc), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, kc), jnp.int32),       # states
            pltpu.VMEM((8, kc), jnp.int32),       # contexts
            pltpu.VMEM((_WIN, kc), jnp.int32),    # stream window
            pltpu.SMEM((1,), jnp.int32),          # word pointer
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(n_arr, st8, ctab, tab, w2)
    syms = syms.reshape(g_cnt * _ROWS, k)[:t_len].astype(jnp.uint8)
    return syms, jax.lax.bitcast_convert_type(xf.reshape(k), jnp.uint32)
