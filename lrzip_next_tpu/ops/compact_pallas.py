"""Pallas stream-compaction kernel for chain-run extraction.

XLA's `jnp.nonzero`/scatter compaction costs ~1.7s per 64MB chunk on
TPU v5e - it dominates the matcher pipeline.  This kernel compacts run
(start, end, cand) triples with two ideas:

1. **Log-shift compaction** - inside a T-element tile, every set element
   must move left by ``d = position - rank`` (d is non-decreasing across
   a tile, so bit-serial routing is congestion-free).  Ten rounds of
   "shift left by 2^k where bit k of the remaining distance is set",
   built purely from static slices/concats and selects - no gathers, no
   matmuls, no unsupported layout casts.
2. **Sequential grid + ordered overlapping writes** - each tile DMAs a
   full T-element window to its global offset (prefix sum of per-tile
   counts) and waits; the next tile's window starts exactly after this
   tile's valid entries, overwriting the garbage tail.  TPU grid steps
   execute in order, so the output ends up densely packed.

Tiles are (8, 128) sublane x lane blocks (the int32 tiling minimum);
linear order within a tile is row-major.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 1024   # tile length = 8 sublanes x 128 lanes
_R, _L = 8, 128


def _linear_shift_left(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """y[i] = x[i + s] in row-major linear order of an (8, 128) tile,
    zero-filled past the end.  Static slices/concats only."""
    rows, lanes = divmod(s, _L)
    if rows:
        pad = jnp.zeros((rows, _L), x.dtype)
        x = jnp.concatenate([x[rows:, :], pad], axis=0)
    if lanes:
        nxt = jnp.concatenate(
            [x[1:, :], jnp.zeros((1, _L), x.dtype)], axis=0)
        x = jnp.concatenate([x[:, lanes:], nxt[:, :lanes]], axis=1)
    return x


def _linear_exclusive_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumsum over row-major linear order of an (8, 128) int32
    tile via log-step shifted adds."""
    inc = x
    shift = 1
    while shift < _L:
        inc = inc + jnp.pad(inc, ((0, 0), (shift, 0)))[:, :_L]
        shift <<= 1
    row_tot = inc[:, _L - 1:_L]
    rp = row_tot
    shift = 1
    while shift < _R:
        rp = rp + jnp.pad(rp, ((shift, 0), (0, 0)))[:rp.shape[0], :]
        shift <<= 1
    return inc - x + (rp - row_tot)


def _compact_tile(mask: jnp.ndarray, vals):
    """Pack set elements of an (8,128) tile to the front (linear order).

    Returns packed value arrays aligned with ranks; slots past the
    count hold garbage.
    """
    rank = _linear_exclusive_cumsum(mask)
    lin = (jax.lax.broadcasted_iota(jnp.int32, (_R, _L), 0) * _L
           + jax.lax.broadcasted_iota(jnp.int32, (_R, _L), 1))
    d = jnp.where(mask > 0, lin - rank, 0)
    m = mask
    vs = list(vals)
    for k in range(10):  # log2(T)
        s = 1 << k
        rm = _linear_shift_left(m, s)
        rd = _linear_shift_left(d, s)
        take = (rm > 0) & (((rd >> k) & 1) > 0)
        moving = (m > 0) & (((d >> k) & 1) > 0)
        new_m = jnp.where(take, 1, jnp.where(moving, 0, m))
        new_d = jnp.where(take, rd - s, d)
        new_vs = []
        for v in vs:
            rv = _linear_shift_left(v, s)
            new_vs.append(jnp.where(take, rv, v))
        m, d, vs = new_m, new_d, new_vs
    return vs


def _compact_kernel(offs_s_ref, offs_e_ref, start_ref, end_ref, cand_ref,
                    out_s_ref, out_e_ref, out_c_ref,
                    scratch_s, scratch_e, scratch_c, sem):
    b = pl.program_id(0)
    start = start_ref[0].astype(jnp.int32)            # (8, 128)
    end = end_ref[0].astype(jnp.int32)
    cand = cand_ref[0]                                # (8, 128) int32
    lin = (jax.lax.broadcasted_iota(jnp.int32, (_R, _L), 0) * _L
           + jax.lax.broadcasted_iota(jnp.int32, (_R, _L), 1))
    pos = lin + b * T

    s_pos, s_cand = _compact_tile(start, [pos, cand])
    (e_pos,) = _compact_tile(end, [pos])
    # flatten (8,128) results into 1-D scratch row by row (static stores)
    for r in range(_R):
        scratch_s[pl.ds(r * _L, _L)] = s_pos[r, :]
        scratch_e[pl.ds(r * _L, _L)] = e_pos[r, :]
        scratch_c[pl.ds(r * _L, _L)] = s_cand[r, :]

    off_s = offs_s_ref[b]
    off_e = offs_e_ref[b]
    cp1 = pltpu.make_async_copy(scratch_s,
                                out_s_ref.at[pl.ds(off_s, T)], sem.at[0])
    cp2 = pltpu.make_async_copy(scratch_e,
                                out_e_ref.at[pl.ds(off_e, T)], sem.at[1])
    cp3 = pltpu.make_async_copy(scratch_c,
                                out_c_ref.at[pl.ds(off_s, T)], sem.at[2])
    cp1.start()
    cp2.start()
    cp3.start()
    cp1.wait()
    cp2.wait()
    cp3.wait()


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def compact_runs_pallas(cand: jnp.ndarray, ok: jnp.ndarray,
                        limit: jnp.ndarray, cap: int,
                        interpret: bool = False):
    """Drop-in device-side replacement for matcher.compact_runs:
    returns (starts, ends, srcs, n_runs) with k-th start paired to the
    k-th end (runs cannot nest)."""
    m = cand.shape[0]
    mb = ((m + T - 1) // T) * T
    idx = jnp.arange(m, dtype=jnp.int32)
    valid = ok & (idx < limit)
    cont = jnp.concatenate([
        jnp.zeros((1,), bool),
        valid[1:] & valid[:-1] & (cand[1:] == cand[:-1] + 1)])
    start = valid & ~cont
    is_end = valid & jnp.concatenate([~cont[1:], jnp.ones((1,), bool)])
    n_runs = jnp.sum(start.astype(jnp.int32))

    pad = mb - m
    nb = mb // T
    start_m = jnp.pad(start, (0, pad)).astype(jnp.int8).reshape(
        nb, _R, _L)
    end_m = jnp.pad(is_end, (0, pad)).astype(jnp.int8).reshape(
        nb, _R, _L)
    cand_p = jnp.pad(cand, (0, pad)).reshape(nb, _R, _L)
    counts_s = jnp.sum(start_m.astype(jnp.int32), axis=(1, 2))
    counts_e = jnp.sum(end_m.astype(jnp.int32), axis=(1, 2))
    offs_s = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts_s)[:-1]])
    offs_e = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts_e)[:-1]])
    # clamp so every tile's T-wide window stays in bounds (overflow past
    # cap is detected by the caller via n_runs > cap)
    offs_s = jnp.minimum(offs_s, cap)
    offs_e = jnp.minimum(offs_e, cap)

    out_len = cap + T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, _R, _L), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _R, _L), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _R, _L), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((T,), jnp.int32),
            pltpu.VMEM((T,), jnp.int32),
            pltpu.VMEM((T,), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    starts, ends, cands = pl.pallas_call(
        _compact_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((out_len,), jnp.int32)] * 3,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(offs_s, offs_e, start_m, end_m, cand_p)
    return starts, ends, cands, n_runs
