"""Fused anchor-fingerprint Pallas kernel.

One pass over the chunk computes, per window position, the two 32-bit
tree-hash fingerprints (ops/matcher._window_fps_pair) and the
local-minimum anchor mask (anchor_candidates' centered window min) -
the masked fingerprint pair comes out in a single kernel instead of
~8 XLA passes that each round-trip 256MB through HBM.

Layout: the chunk is viewed as (nb, R, L) row-major tiles; each grid
step reads its tile plus one neighbour row on each side (3 block refs
into a one-block-padded copy), so the 31-byte hash lookahead and the
±h local-min window never cross a hard boundary.  All shifts are the
static concat/slice forms Mosaic lowers (compact_pallas's trick).

Order note: min-selection here uses *signed* int32 comparisons (the
hash bits reinterpreted).  Any consistent order is content-defined -
both copies of duplicated data pick the same anchors - so this is
interchangeable with the unsigned order of the XLA fallback path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compact_pallas import _R, _L, T

_MAX = 0x7FFFFFFF

_M1 = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)


def _shl(x, s: int, fill):
    """y[i] = x[i+s] in row-major linear order (shift toward index 0)."""
    rows, lanes = divmod(s, _L)
    r = x.shape[0]
    if rows:
        pad = jnp.full((rows, _L), fill, x.dtype)
        x = jnp.concatenate([x[rows:, :], pad], axis=0)
    if lanes:
        nxt = jnp.concatenate(
            [x[1:, :], jnp.full((1, _L), fill, x.dtype)], axis=0)
        x = jnp.concatenate([x[:, lanes:], nxt[:, :lanes]], axis=1)
    return x


def _shr(x, s: int, fill):
    """y[i] = x[i-s] (shift toward higher indices)."""
    rows, lanes = divmod(s, _L)
    if rows:
        pad = jnp.full((rows, _L), fill, x.dtype)
        x = jnp.concatenate([pad, x[:-rows, :]], axis=0)
    if lanes:
        prv = jnp.concatenate(
            [jnp.full((1, _L), fill, x.dtype), x[:-1, :]], axis=0)
        x = jnp.concatenate([prv[:, -lanes:], x[:, :-lanes]], axis=1)
    return x


def _window_min(x, length: int):
    """min over [p, p+length) by doubling shifts (MAX fill)."""
    y = x
    cover = 1
    while cover < length:
        step = min(cover, length - cover)
        y = jnp.minimum(y, _shl(y, step, _MAX))
        cover += step
    return y


def _make_kernel(h: int):
    def kernel(prev_ref, cur_ref, next_ref, fpa_ref, fpb_ref):
        x = jnp.concatenate([
            prev_ref[0][-1:, :], cur_ref[0], next_ref[0][:1, :]],
            axis=0).astype(jnp.int32)                    # (R+2, L)
        # shared 4-level tree-hash prefix (16-byte windows), then two
        # top-level combinations of the same (lo, hi) pair.  M5 - M5^1
        # is odd (invertible mod 2^32), so a simultaneous collision of
        # both outputs forces the full 64-bit (lo, hi) pair to collide:
        # as strong as two independent hashes at ~60% of the multiplies.
        a = x
        for k in range(4):
            half = 1 << k
            m1 = jnp.int32(np.int32(np.uint32(_M1[k])))
            a = a * m1 + _shl(a, half, 0)
        hi = _shl(a, 16, 0)
        m5 = jnp.int32(np.int32(np.uint32(_M1[4])))
        m5b = jnp.int32(np.int32(np.uint32(_M1[4] ^ 1)))
        fa = a * m5 + hi
        fb = a * m5b + hi
        # centered local-min of fa over [p-h, p+h]
        fwd = _window_min(fa, h + 1)
        centered = jnp.minimum(_shr(fwd, h, _MAX), fwd)
        masked = jnp.where(fa == centered, fa, jnp.int32(_MAX))
        fpa_ref[0] = masked[1:-1, :]
        fpb_ref[0] = fb[1:-1, :]
    return kernel


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def anchor_fps_pallas(data: jnp.ndarray, stride: int,
                      interpret: bool = False):
    """(masked_fpa, fpb) int32 arrays of length len(data), anchors
    marked by fpa != INT32_MAX.  Entries within HASH_W-1 of the end are
    garbage (callers slice to m = n - HASH_W + 1 anyway)."""
    n = data.shape[0]
    nb = (n + T - 1) // T
    total = nb * T
    # one zero tile on each side for the neighbour refs
    padded = jnp.pad(data, (T, total - n + T)).reshape(nb + 2, _R, _L)

    spec_prev = pl.BlockSpec((1, _R, _L), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    spec_cur = pl.BlockSpec((1, _R, _L), lambda b: (b + 1, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec((1, _R, _L), lambda b: (b + 2, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, _R, _L), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((nb, _R, _L), jnp.int32)
    h = max(stride // 2, 1)
    fpa, fpb = pl.pallas_call(
        _make_kernel(h),
        grid=(nb,),
        in_specs=[spec_prev, spec_cur, spec_next],
        out_specs=[out_spec, out_spec],
        out_shape=[shape, shape],
        interpret=interpret,
    )(padded, padded, padded)
    return fpa.reshape(total)[:n], fpb.reshape(total)[:n]
