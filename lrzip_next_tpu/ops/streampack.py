"""Pallas dense stream compaction for the rANS emission planes.

The rANS encoder (ops/rans.py) produces a (T, K) plane of candidate
u16 words with ~25-35% of slots flagged; the wire stream is the flagged
words in flat row-major order.  XLA's scatter compaction costs ~40ns
per element on TPU - far too slow for a multi-GB/s codec - so this
kernel packs the stream in two O(n) passes:

1. **Per-tile log-shift compaction** (reuses ops/compact_pallas's
   proven (128, 128) tile kernel machinery): each 16384-element tile
   packs its flagged words to the tile front entirely in VMEM.
2. **Ordered overlapping placement**: tile offsets are the prefix sum
   of tile counts; a `lax.scan` of dynamic-update-slices writes each
   packed tile at its offset, in order, so each tile's garbage tail is
   overwritten by the next tile's data (the same sequential-overwrite
   idea compact_pallas uses with DMA grid steps, expressed at the XLA
   level where update sizes stay static).

Output matches ops/rans._pack_words_xla bit for bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compact_pallas import _R, _L, _compact_tile


def _pack_kernel(flag_ref, val_ref, out_ref):
    flag = flag_ref[0].astype(jnp.int32)
    val = val_ref[0]
    (packed,) = _compact_tile(flag, [val])
    out_ref[0] = packed


def _pack_fused_kernel(plane_ref, out_ref):
    """Tile compaction straight off the scan's fused word|flag<<16
    plane (ops/rans_pallas): no XLA slice passes over the 64MB plane."""
    v = plane_ref[0]
    flag = (v >> 16) & 1
    word = v & 0xFFFF
    (packed,) = _compact_tile(flag, [word])
    out_ref[0] = packed


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def pack_plane_pallas(plane: jnp.ndarray, cap: int,
                      interpret: bool = False):
    """Compact a fused word|flag<<16 int32 plane (flat row-major order)
    into a dense cap-sized u16 stream.  Returns (packed, n_words).

    Tiles are 8x the compaction default (1024 x 128): grid-step overhead
    and the placement scan's per-step dynamic-update-slices dominated
    pack time at 128-row tiles (33ms -> ~10ms per 24M-word plane at
    512 rows; 1024 halves the placement steps again).  The in-kernel
    log-shift intermediates stay ~3MB - well inside VMEM."""
    rr = 8 * _R
    tile = rr * _L
    m = plane.size
    mb = ((m + tile - 1) // tile) * tile
    nb = mb // tile
    flat = plane.reshape(-1)
    if mb != m:
        flat = jnp.pad(flat, (0, mb - m))
    p_t = flat.reshape(nb, rr, _L)
    spec = pl.BlockSpec((1, rr, _L), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    tiles = pl.pallas_call(
        _pack_fused_kernel,
        grid=(nb,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nb, rr, _L), jnp.int32),
        interpret=interpret,
    )(p_t)
    counts = jnp.sum(p_t >> 16, axis=(1, 2))
    offs = jnp.cumsum(counts) - counts
    n_words = jnp.sum(counts)
    tiles_flat = tiles.reshape(nb, tile)
    out0 = jnp.zeros((cap + tile,), jnp.int32)

    def place(buf, inp):
        t, off = inp
        return jax.lax.dynamic_update_slice(buf, t, (off,)), None

    out, _ = jax.lax.scan(place, out0, (tiles_flat, offs), unroll=8)
    idx = jax.lax.iota(jnp.int32, cap)
    packed = jnp.where(idx < n_words, out[:cap], 0).astype(jnp.uint16)
    return packed, n_words


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def pack_stream_pallas(words: jnp.ndarray, flags: jnp.ndarray, cap: int,
                       interpret: bool = False):
    """Compact flagged words (flat row-major order) into a dense
    ``cap``-sized u16 array.  Returns (packed, n_words)."""
    rr = 8 * _R          # 1024-row tiles: fewer placement steps (the
    tile = rr * _L       # per-step DUS overhead dominates at 128 rows)
    w = words.reshape(-1).astype(jnp.int32)
    e = flags.reshape(-1)
    m = w.shape[0]
    mb = ((m + tile - 1) // tile) * tile
    pad = mb - m
    nb = mb // tile
    e_t = jnp.pad(e, (0, pad)).astype(jnp.int8).reshape(nb, rr, _L)
    w_t = jnp.pad(w, (0, pad)).reshape(nb, rr, _L)
    counts = jnp.sum(e_t.astype(jnp.int32), axis=(1, 2))
    offs = jnp.cumsum(counts) - counts
    n_words = jnp.sum(counts)

    spec = pl.BlockSpec((1, rr, _L), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    tiles = pl.pallas_call(
        _pack_kernel,
        grid=(nb,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nb, rr, _L), jnp.int32),
        interpret=interpret,
    )(e_t, w_t)
    tiles_flat = tiles.reshape(nb, tile)

    # ordered overlapping placement: tile b's window starts at offs[b];
    # later tiles overwrite this tile's garbage tail because
    # offs[b+1] = offs[b] + counts[b] and the scan runs in order.
    out0 = jnp.zeros((cap + tile,), jnp.int32)

    def place(buf, inp):
        t, off = inp
        return jax.lax.dynamic_update_slice(buf, t, (off,)), None

    out, _ = jax.lax.scan(place, out0, (tiles_flat, offs), unroll=8)
    # zero the tail past n_words (the last tile leaves garbage there),
    # so padding reads during decode stay deterministic
    idx = jax.lax.iota(jnp.int32, cap)
    packed = jnp.where(idx < n_words, out[:cap], 0).astype(jnp.uint16)
    return packed, n_words
