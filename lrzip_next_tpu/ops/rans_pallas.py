"""Pallas rANS encode scan: the entropy-coder hot loop in VMEM.

The XLA form of the interleaved-rANS encode (ops/rans._encode_scan)
spends ~65us per scan step at K=16384 lanes - not in compute, but in
HBM materialization: the per-step one-hot operands and fetched model
rows ((K, 256)/(K, 512) f32 arrays) round-trip through HBM on every
step, ~3.5KB of traffic per encoded symbol.

This kernel keeps the entire coder state machine on-chip:

- **States in VMEM scratch** - the (1, K) u32 lane states persist
  across the sequential grid (one grid step per span position, reverse
  order), never touching HBM until the final flush.
- **Packed-table MXU lookup in VMEM** - the per-symbol (freq, cumfreq)
  pair is packed into one 24-bit value cs*4096 + (f-1), exactly
  representable in f32, split into three 8-bit planes for exact bf16
  one-hot matmuls.  The lookup index is two-level: chi = ctx*4 +
  (sym>>6) selects a 64-symbol row block via a (192, CH) @ (CH, S)
  matmul; sym&63 selects within the block via a 64-wide masked
  sublane reduction.  All operands live in VMEM - zero HBM traffic.
- **HBM traffic = the data itself** - per symbol: 4B symbol row read
  (int32 plane) + 4B fused word|flag write.  ~8B/symbol vs ~3.5KB.

The arithmetic is bit-identical to ops/rans._encode_scan (the f32
floor-divisions carry a +-1 fixup that makes them exact regardless of
rounding mode), so payloads are byte-identical to the XLA path's.

Reference role: the serial entropy-coder loops this replaces run in
native code in the reference (src/lzma/C/LzmaEnc.c:631-786 range
coder; libzpaq arithmetic coder), dispatched at src/stream.c:167-554.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_BITS = 12
M = 1 << M_BITS
_L_INIT = 1 << 16


def _div_exact(a, f):
    """floor(a / f), exact for 0 <= a < 2^24, 1 <= f <= 2^12."""
    z = jnp.floor(a.astype(jnp.float32) / f.astype(jnp.float32))
    q = z.astype(jnp.int32)
    r = a - q * f
    return q + (r >= f).astype(jnp.int32) - (r < 0).astype(jnp.int32)


def _ge_u(a, b):
    """Unsigned >= on int32 bit patterns (sign-flip trick)."""
    s = jnp.int32(-2147483648)
    return (a ^ s) >= (b ^ s)


def _srl(x, s: int):
    return jax.lax.shift_right_logical(x, s)


_ROWS = 8  # span positions per grid step (amortizes per-step overhead)


def _make_hist_kernel(r: int, k: int, t_len: int, c: int, shift: int,
                      rows_per: int, g_cnt: int):
    # lane sub-blocks keep the (256, SUB) one-hot operands ~2MB: the
    # full-K (256, 16384) bf16 pair pushed past VMEM and spilled
    # (~40x slowdown measured)
    sub = min(4096, k)

    def kernel(n_ref, prev_ref, cur_ref, out_ref, acc_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _init():
            acc_ref[...] = jnp.zeros((c, 256), jnp.int32)

        n = n_ref[0]
        acc = acc_ref[...]
        for i in range(rows_per):
            ridx = b * rows_per + i
            for s0 in range(0, k, sub):
                sym = cur_ref[0, i][:, s0:s0 + sub]      # (1, SUB)
                cq = (prev_ref[0, i][:, s0:s0 + sub] >> shift) \
                    if shift < 8 else jnp.zeros((1, sub), jnp.int32)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (1, sub), 1) + s0
                valid = (ridx < r) & ((lane * t_len + ridx) < n)
                iota_c = jax.lax.broadcasted_iota(
                    jnp.int32, (c, sub), 0)
                oh_ctx = ((iota_c == cq) & valid).astype(jnp.bfloat16)
                # symbol one-hot built transposed - (256, SUB) from a
                # (1, SUB) broadcast compare - so no relayout is
                # needed; the dot contracts the lane dim of both.
                iota_s = jax.lax.broadcasted_iota(
                    jnp.int32, (256, sub), 0)
                oh_sym_t = (iota_s == sym).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    oh_ctx, oh_sym_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + part.astype(jnp.int32)
        acc_ref[...] = acc

        @pl.when(b == g_cnt - 1)
        def _flush():
            out_ref[...] = acc_ref[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("ctx_bits", "srate",
                                              "interpret"))
def joint_histogram_pallas(s8: jnp.ndarray, n: jnp.ndarray, ctx_bits: int,
                           srate: int, interpret: bool = False):
    """Sampled (context, symbol) joint counts, VMEM-resident.

    Bit-identical to ops/rans.joint_histogram (same leading-rows sample,
    same validity rule, exact integer counts) at ~10x less HBM traffic:
    the one-hot operands live only in VMEM.
    """
    t_len, k = s8.shape
    c = 1 << ctx_bits
    r = max(t_len // srate, 1)
    rows_per = 8
    g_cnt = (r + rows_per - 1) // rows_per
    pad_rows = g_cnt * rows_per - r
    body = s8[:r].astype(jnp.int32)
    prev = jnp.concatenate(
        [jnp.zeros((1, k), jnp.int32), body[:-1]], axis=0)
    if pad_rows:
        z = jnp.zeros((pad_rows, k), jnp.int32)
        body = jnp.concatenate([body, z], axis=0)
        prev = jnp.concatenate([prev, z], axis=0)
    body = body.reshape(g_cnt, rows_per, 1, k)
    prev = prev.reshape(g_cnt, rows_per, 1, k)
    n_arr = jnp.asarray(n, jnp.int32).reshape(1)
    blk = pl.BlockSpec((1, rows_per, 1, k), lambda b: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    counts = pl.pallas_call(
        _make_hist_kernel(r, k, t_len, c, 8 - ctx_bits, rows_per, g_cnt),
        grid=(g_cnt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), blk, blk],
        out_specs=pl.BlockSpec((c, 256), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 256), jnp.int32),
        scratch_shapes=[pltpu.VMEM((c, 256), jnp.int32)],
        interpret=interpret,
    )(n_arr, prev, body)
    return counts


def _make_kernel(t_len: int, k: int, ch: int, ctx_bits: int, sub: int,
                 g_cnt: int):
    nsub = k // sub
    shift = 8 - ctx_bits

    def lookup(sym, cq, tab):
        """Packed (cumfreq*M + freq-1) per lane via two-level one-hot
        MXU matmuls; all operands VMEM-resident.  64-symbol blocks:
        the (CH, SUB) one-hot build is the kernel's dominant VPU cost,
        so CH = 4*C beats the original 8*C split."""
        chi = cq * 4 + (sym >> 6)
        lo = sym & 63
        parts = []
        for s in range(nsub):
            chi_s = chi[:, s * sub:(s + 1) * sub]
            lo_s = lo[:, s * sub:(s + 1) * sub]
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (ch, sub), 0)
            oh = (iota_c == chi_s).astype(jnp.bfloat16)       # (CH, SUB)
            rows = jax.lax.dot_general(
                tab, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # (192, SUB)
            val = (rows[0:64] * 65536.0 + rows[64:128] * 256.0
                   + rows[128:192])                           # (64, SUB)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (64, sub), 0)
            sel = jnp.where(iota_l == lo_s, val, 0.0)
            parts.append(jnp.sum(sel, axis=0, keepdims=True))
        v = parts[0] if nsub == 1 else jnp.concatenate(parts, axis=1)
        return v.astype(jnp.int32)

    def kernel(n_ref, prev_ref, cur_ref, tab_ref, st_ref, out_ref, x_ref):
        b = pl.program_id(0)
        g = g_cnt - 1 - b                        # row-group index

        @pl.when(b == 0)
        def _init():
            x_ref[...] = jnp.full((1, k), _L_INIT, jnp.int32)

        n = n_ref[0]
        tab = tab_ref[...]                       # (192, CH) bf16
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
        x = x_ref[...]
        for i in reversed(range(_ROWS)):
            t = g * _ROWS + i
            sym = cur_ref[0, i]                  # (1, K) int32 in [0,256)
            if ctx_bits:
                prevb = prev_ref[0, _ROWS - 1] if i == 0 \
                    else cur_ref[0, i - 1]
                cq = prevb >> shift
            else:
                cq = jnp.zeros((1, k), jnp.int32)
            v = lookup(sym, cq, tab)
            f = (v & (M - 1)) + 1
            cs = _srl(v, M_BITS)
            # rows past t_len are grid padding; lane*t_len + t < n also
            # masks the block's own tail padding
            valid = (t < t_len) & ((lane * t_len + t) < n)
            # renormalize: emit low 16 bits when x >= f << 20 (f <=
            # 3841 so f << 20 < 2^32; int32 wrap = uint32 bit pattern)
            e = valid & _ge_u(x, f << 20)
            w = jnp.where(e, x & 0xFFFF, 0)
            x1 = jnp.where(e, _srl(x, 16), x)
            # x2 = (x1 // f)*M + cs + (x1 % f), two exact f32 divides
            xh = _srl(x1, M_BITS)                # < 2^20
            xl = x1 & (M - 1)
            q1 = _div_exact(xh, f)
            r1 = xh - q1 * f
            y = (r1 << M_BITS) | xl              # < 2^24
            q0 = _div_exact(y, f)
            r = y - q0 * f
            q = q1 * M + q0
            x2 = q * M + (cs + r)                # wraps as uint32
            x = jnp.where(valid, x2, x1)
            out_ref[0, i] = w | (e.astype(jnp.int32) << 16)
        x_ref[...] = x
        st_ref[0] = x

    return kernel


def _packed_table(freqs: jnp.ndarray) -> jnp.ndarray:
    """(C, 256) int32 freq table -> (192, C*4) bf16 three-plane packed
    lookup operand (64-symbol blocks); val = cumfreq * M + (freq - 1)
    < 2^24."""
    cum = jnp.cumsum(freqs, axis=-1) - freqs
    val = cum * M + (freqs - 1)                  # (C, 256)
    v2 = val.reshape(-1, 64)                     # (C*4, 64)
    return jnp.concatenate(
        [(v2 >> 16).T, ((v2 >> 8) & 255).T, (v2 & 255).T],
        axis=0).astype(jnp.bfloat16)             # (192, C*4)


@functools.partial(jax.jit, static_argnames=("ctx_bits", "interpret"))
def encode_scan_fused(s8: jnp.ndarray, n: jnp.ndarray, freqs: jnp.ndarray,
                      ctx_bits: int, interpret: bool = False):
    """Pallas encode scan over (T, K) uint8 planes.

    Returns (states (K,) uint32, plane (T, K) int32) where plane fuses
    the emission: word | (flag << 16).  Bit-identical to
    ops/rans._encode_scan's (words, flags).
    """
    t_len, k = s8.shape
    ch = (1 << ctx_bits) * 4
    # fewest MXU calls per step that keep the one-hot operand + fetched
    # rows within VMEM: oh (CH, SUB) bf16 + rows (192, SUB) f32
    sub = min(4096 if ch <= 256 else 2048, k)
    assert k % sub == 0, (k, sub)
    g_cnt = (t_len + _ROWS - 1) // _ROWS

    # layout: [_ROWS zero rows | s8 rows | zero pad to a multiple of
    # _ROWS].  The leading zero block supplies t=0's context row; the
    # grid reads _ROWS-row blocks, cur at block g+1 and prev at block g
    # (the anchor_pallas neighbour-ref idiom).  Tail pad rows process
    # first in the reverse scan with valid=false (states untouched) and
    # land past t_len in the emission plane, which is sliced off.
    sp = jnp.concatenate(
        [jnp.zeros((_ROWS, k), jnp.int32), s8.astype(jnp.int32),
         jnp.zeros((g_cnt * _ROWS - t_len, k), jnp.int32)],
        axis=0).reshape(g_cnt + 1, _ROWS, 1, k)
    tab = _packed_table(freqs)
    n_arr = jnp.asarray(n, jnp.int32).reshape(1)

    # (G, R, 1, K) planes: Mosaic requires the last two block dims be
    # (8, 128)-aligned or array-equal; (R, 1, K) blocks satisfy that.
    blk = lambda imap: pl.BlockSpec((1, _ROWS, 1, k), imap,
                                    memory_space=pltpu.VMEM)
    states, plane = pl.pallas_call(
        _make_kernel(t_len, k, ch, ctx_bits, sub, g_cnt),
        grid=(g_cnt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(lambda b: (g_cnt - 1 - b, 0, 0, 0)),  # prev row block
            blk(lambda b: (g_cnt - b, 0, 0, 0)),      # current rows
            pl.BlockSpec((192, ch), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, k), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),    # final states
            blk(lambda b: (g_cnt - 1 - b, 0, 0, 0)),  # word|flag plane
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1, k), jnp.int32),
            jax.ShapeDtypeStruct((g_cnt, _ROWS, 1, k), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, k), jnp.int32)],
        interpret=interpret,
    )(n_arr, sp, sp, tab)
    return (jax.lax.bitcast_convert_type(
        states.reshape(k), jnp.uint32),
        plane.reshape(g_cnt * _ROWS, k)[:t_len])
