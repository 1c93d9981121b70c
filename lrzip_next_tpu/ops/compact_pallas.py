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

Tiles are (128, 128) sublane x lane blocks (grid-step overhead amortises
best here; 8x128 minimum tiles ran 2.5x slower);
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

T = 16384  # tile length = 128 sublanes x 128 lanes
_R, _L = 128, 128


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
    """Exclusive cumsum over row-major linear order of an (R, 128) int32
    tile: log-step shifted adds along lanes, and a strictly-lower-
    triangular matmul for the cross-row prefix (narrow sublane
    concats/pads are not Mosaic-lowerable; full-width ops are)."""
    rows = x.shape[0]
    inc = x
    shift = 1
    while shift < _L:
        inc = inc + jnp.pad(inc, ((0, 0), (shift, 0)))[:, :_L]
        shift <<= 1
    row_tot = jnp.broadcast_to(inc[:, _L - 1:_L], (rows, _L))
    tri = (jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
           < jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
           ).astype(jnp.float32)
    # counts are <= rows * 128 <= 2^17 so f32 accumulation is exact
    row_prefix = jax.lax.dot_general(
        tri, row_tot.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    return inc - x + row_prefix


def _compact_tile(mask: jnp.ndarray, vals):
    """Pack set elements of an (R, 128) tile to the front (linear order).

    Returns packed value arrays aligned with ranks; slots past the
    count hold garbage.
    """
    rows = mask.shape[0]
    rank = _linear_exclusive_cumsum(mask)
    lin = (jax.lax.broadcasted_iota(jnp.int32, (rows, _L), 0) * _L
           + jax.lax.broadcasted_iota(jnp.int32, (rows, _L), 1))
    d = jnp.where(mask > 0, lin - rank, 0)
    m = mask
    vs = list(vals)
    for k in range(int(rows * _L - 1).bit_length()):  # log2(tile)
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


def _compact_kernel2(start_ref, pos_ref, cand_ref, out_s_ref, out_c_ref):
    """Starts-only variant: compacts (pos, cand) at start positions in
    a single log-shift pass - used by the anchor/seed path, where the
    host greedy re-derives true match spans by byte verification and
    never needs chain end positions."""
    start = start_ref[0].astype(jnp.int32)
    pos = pos_ref[0]
    cand = cand_ref[0]
    s_pos, s_cand = _compact_tile(start, [pos, cand])
    out_s_ref[0] = s_pos
    out_c_ref[0] = s_cand


def _compact_kernel(start_ref, end_ref, pos_ref, cand_ref,
                    out_s_ref, out_e_ref, out_c_ref):
    start = start_ref[0].astype(jnp.int32)            # (8, 128)
    end = end_ref[0].astype(jnp.int32)
    pos = pos_ref[0]                                  # (8, 128) int32
    cand = cand_ref[0]                                # (8, 128) int32

    s_pos, s_cand = _compact_tile(start, [pos, cand])
    (e_pos,) = _compact_tile(end, [pos])
    out_s_ref[0] = s_pos
    out_e_ref[0] = e_pos
    out_c_ref[0] = s_cand


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def compact_runs_pallas(cand: jnp.ndarray, ok: jnp.ndarray,
                        limit: jnp.ndarray, cap: int,
                        interpret: bool = False):
    """Drop-in device-side replacement for matcher.compact_runs:
    returns (starts, ends, srcs, n_runs) with k-th start paired to the
    k-th end (runs cannot nest)."""
    m = cand.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    valid = ok & (idx < limit)
    cont = jnp.concatenate([
        jnp.zeros((1,), bool),
        valid[1:] & valid[:-1] & (cand[1:] == cand[:-1] + 1)])
    start = valid & ~cont
    is_end = valid & jnp.concatenate([~cont[1:], jnp.ones((1,), bool)])
    return compact_masked_pallas(start, is_end, idx, cand, cap,
                                 interpret=interpret)


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def compact_masked_pallas(start: jnp.ndarray, is_end: jnp.ndarray,
                          pos: jnp.ndarray, cand: jnp.ndarray, cap: int,
                          interpret: bool = False):
    """General masked compaction: pack pos[start], pos[is_end], and
    cand[start] into dense cap-sized arrays (k-th start pairs with the
    k-th end).  Returns (starts, ends, srcs, n_runs)."""
    m = cand.shape[0]
    mb = ((m + T - 1) // T) * T
    n_runs = jnp.sum(start.astype(jnp.int32))

    pad = mb - m
    nb = mb // T
    start_m = jnp.pad(start, (0, pad)).astype(jnp.int8).reshape(
        nb, _R, _L)
    end_m = jnp.pad(is_end, (0, pad)).astype(jnp.int8).reshape(
        nb, _R, _L)
    pos_p = jnp.pad(pos, (0, pad)).reshape(nb, _R, _L)
    cand_p = jnp.pad(cand, (0, pad)).reshape(nb, _R, _L)
    counts_s = jnp.sum(start_m.astype(jnp.int32), axis=(1, 2))
    counts_e = jnp.sum(end_m.astype(jnp.int32), axis=(1, 2))
    cum_s = jnp.cumsum(counts_s)
    cum_e = jnp.cumsum(counts_e)

    spec = pl.BlockSpec((1, _R, _L), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    tile_shape = jax.ShapeDtypeStruct((nb, _R, _L), jnp.int32)
    ts, te, tc = pl.pallas_call(
        _compact_kernel,
        grid=(nb,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[tile_shape] * 3,
        interpret=interpret,
    )(start_m, end_m, pos_p, cand_p)

    # merge per-tile prefixes with one k-sized gather: run j lives in
    # tile b = first cum > j, at slot j - cum[b-1].  tile-of-run comes
    # from a tiny scatter + cap-sized cumsum (cheaper than binary-search
    # gathers on TPU).
    j = jnp.arange(cap, dtype=jnp.int32)

    def merge(tiles, cum):
        marks = jnp.zeros((cap + 1,), jnp.int32).at[
            jnp.minimum(cum, cap)].add(1, mode="drop")
        bc = jnp.minimum(jnp.cumsum(marks[:cap]), nb - 1)
        prev = jnp.where(bc > 0, cum[jnp.maximum(bc - 1, 0)], 0)
        slot = jnp.clip(j - prev, 0, T - 1)
        return tiles[bc, slot // _L, slot % _L]

    starts = merge(ts, cum_s)
    ends = merge(te, cum_e)
    cands = merge(tc, cum_s)
    return starts, ends, cands, n_runs


def _compact_kernel3(start_ref, a_ref, b_ref, c_ref,
                     out_a_ref, out_b_ref, out_c_ref):
    """Starts-only compaction of THREE int32 payloads in one pass -
    used by the dual-chain matcher path, whose chain ends arrive as a
    per-start payload (dense segmented-end scan) instead of a second
    mask, halving the kernel passes and collapsing the cross-tile
    merge to a single stacked gather."""
    start = start_ref[0].astype(jnp.int32)
    a = a_ref[0]
    b = b_ref[0]
    c = c_ref[0]
    pa, pb, pc = _compact_tile(start, [a, b, c])
    out_a_ref[0] = pa
    out_b_ref[0] = pb
    out_c_ref[0] = pc


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def compact_starts3_pallas(start: jnp.ndarray, a: jnp.ndarray,
                           b: jnp.ndarray, c: jnp.ndarray, cap: int,
                           interpret: bool = False):
    """Masked compaction of three payload arrays at ``start`` positions
    -> (a_c, b_c, c_c, n) dense cap-sized arrays.  The cross-tile merge
    stacks the three tile outputs and performs ONE row gather (measured
    2x cheaper than three element gathers at cap 512K on v5e)."""
    m = a.shape[0]
    mb = ((m + T - 1) // T) * T
    n = jnp.sum(start.astype(jnp.int32))

    pad = mb - m
    nb = mb // T
    start_m = jnp.pad(start, (0, pad)).astype(jnp.int8).reshape(
        nb, _R, _L)
    a_p = jnp.pad(a, (0, pad)).reshape(nb, _R, _L)
    b_p = jnp.pad(b, (0, pad)).reshape(nb, _R, _L)
    c_p = jnp.pad(c, (0, pad)).reshape(nb, _R, _L)
    counts = jnp.sum(start_m.astype(jnp.int32), axis=(1, 2))
    cum = jnp.cumsum(counts)

    spec = pl.BlockSpec((1, _R, _L), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    tile_shape = jax.ShapeDtypeStruct((nb, _R, _L), jnp.int32)
    ta, tb, tc = pl.pallas_call(
        _compact_kernel3,
        grid=(nb,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[tile_shape] * 3,
        interpret=interpret,
    )(start_m, a_p, b_p, c_p)

    stacked = jnp.stack([ta, tb, tc], axis=-1)  # (nb, R, L, 3)
    j = jnp.arange(cap, dtype=jnp.int32)
    marks = jnp.zeros((cap + 1,), jnp.int32).at[
        jnp.minimum(cum, cap)].add(1, mode="drop")
    bc = jnp.minimum(jnp.cumsum(marks[:cap]), nb - 1)
    prev = jnp.where(bc > 0, cum[jnp.maximum(bc - 1, 0)], 0)
    slot = jnp.clip(j - prev, 0, T - 1)
    merged = stacked[bc, slot // _L, slot % _L, :]  # one row gather
    return merged[:, 0], merged[:, 1], merged[:, 2], n


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def compact_starts_pallas(start: jnp.ndarray, pos: jnp.ndarray,
                          cand: jnp.ndarray, cap: int,
                          interpret: bool = False):
    """Starts-only compaction: (starts, srcs, n_runs).  Half the VPU
    work of compact_masked_pallas - for consumers that re-derive match
    spans themselves (the verified host greedy)."""
    m = cand.shape[0]
    mb = ((m + T - 1) // T) * T
    n_runs = jnp.sum(start.astype(jnp.int32))

    pad = mb - m
    nb = mb // T
    start_m = jnp.pad(start, (0, pad)).astype(jnp.int8).reshape(
        nb, _R, _L)
    pos_p = jnp.pad(pos, (0, pad)).reshape(nb, _R, _L)
    cand_p = jnp.pad(cand, (0, pad)).reshape(nb, _R, _L)
    counts_s = jnp.sum(start_m.astype(jnp.int32), axis=(1, 2))
    cum_s = jnp.cumsum(counts_s)

    spec = pl.BlockSpec((1, _R, _L), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    tile_shape = jax.ShapeDtypeStruct((nb, _R, _L), jnp.int32)
    ts, tc = pl.pallas_call(
        _compact_kernel2,
        grid=(nb,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[tile_shape] * 2,
        interpret=interpret,
    )(start_m, pos_p, cand_p)

    j = jnp.arange(cap, dtype=jnp.int32)

    def merge(tiles, cum):
        marks = jnp.zeros((cap + 1,), jnp.int32).at[
            jnp.minimum(cum, cap)].add(1, mode="drop")
        bc = jnp.minimum(jnp.cumsum(marks[:cap]), nb - 1)
        prev = jnp.where(bc > 0, cum[jnp.maximum(bc - 1, 0)], 0)
        slot = jnp.clip(j - prev, 0, T - 1)
        return tiles[bc, slot // _L, slot % _L]

    starts = merge(ts, cum_s)
    cands = merge(tc, cum_s)
    return starts, cands, n_runs
