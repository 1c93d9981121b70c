#!/usr/bin/env python3
"""Pipelined (overhead-amortised) stage timings of the anchor matcher.

Queues DEPTH iterations of each sub-pipeline and syncs once: the ~30ms
axon dispatch+readback latency amortises away, leaving real device
time per 64MB chunk.
"""

import sys
import time

sys.path.insert(0, "/root/repo")
from lrzip_next_tpu.utils import jaxcache

jaxcache.enable()

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_corpus
from lrzip_next_tpu.ops import matcher
from lrzip_next_tpu.ops.anchor_pallas import anchor_fps_pallas

CHUNK_MB = 64
STRIDE = 8
DEPTH = 4
REPS = 3


def timeit(name, fn):
    int(jnp.asarray(fn()).ravel()[0])  # compile + sync
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        outs = [fn() for _ in range(DEPTH)]
        int(jnp.asarray(outs[-1]).ravel()[0])
        ts.append((time.time() - t0) / DEPTH)
    dt = sorted(ts)[len(ts) // 2]
    print(f"{name:40s} {dt*1e3:8.1f} ms  ({(CHUNK_MB<<20)/1e6/dt:6.0f} MB/s)",
          flush=True)
    return dt


def main():
    n = CHUNK_MB << 20
    data = np.frombuffer(build_corpus(n), dtype=np.uint8)
    dev = jnp.asarray(data)
    int(jnp.sum(dev[:1]))
    m = n - matcher.HASH_W + 1
    k = m // STRIDE
    cap = max(min(k, 4096), k // 64)

    timeit("A kernel only", lambda: anchor_fps_pallas(dev, STRIDE)[0])

    @functools.partial(jax.jit, static_argnames=("stride",))
    def ab_nosort(d, stride):
        # anchor_candidates minus the two sorts (current MXU-extract
        # selection; mirror of ops/matcher.anchor_candidates)
        from lrzip_next_tpu.ops.matcher import (_I32_BIG,
                                                _extract_strided_i32,
                                                _extract_strided_u16)
        n = d.shape[0]
        m = n - matcher.HASH_W + 1
        k = m // stride
        ma = k * stride
        big = jnp.int32(0x7FFFFFFF)
        fpa_m, fpb = anchor_fps_pallas(d, stride)
        fpa_m, fpb = fpa_m[:ma], fpb[:ma]
        idx = jax.lax.iota(jnp.int32, ma)
        col = jax.lax.rem(idx, jnp.int32(stride))
        bc = ((fpb & jnp.int32(255)) << 5) | col
        v, c = fpa_m, bc
        step = 1
        while step < stride:
            vs = jnp.concatenate([v[step:],
                                  jnp.full((step,), big, v.dtype)])
            cs = jnp.concatenate([c[step:], jnp.zeros((step,), c.dtype)])
            take = (col + step < stride) & (vs < v)
            v = jnp.where(take, vs, v)
            c = jnp.where(take, cs, c)
            step <<= 1
        pad = (-ma) % 128
        if pad:
            v = jnp.concatenate([v, jnp.full((pad,), big, v.dtype)])
            c = jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
        row_min = _extract_strided_i32(v, stride)[:k]
        bc_k = _extract_strided_u16(c, stride)[:k]
        a_fpb8 = (bc_k >> 5).astype(jnp.uint8)
        a_pos = (jnp.arange(k, dtype=jnp.int32) * stride
                 + (bc_k & jnp.int32(31)))
        a_pos = jnp.where(row_min != big, a_pos, _I32_BIG)
        return row_min, a_pos, a_fpb8

    timeit("A+B' kernel + row select (no sorts)",
           lambda: ab_nosort(dev, STRIDE)[1])

    @functools.partial(jax.jit, static_argnames=("stride",))
    def ab_sort1(d, stride):
        row_min, a_pos, a_fpb8 = ab_nosort(d, stride)
        s1, s2, s3 = jax.lax.sort((row_min, a_pos, a_fpb8), num_keys=2)
        return s2

    timeit("A+B'' + sort1", lambda: ab_sort1(dev, STRIDE))

    timeit("A+B anchor_candidates (both sorts)",
           lambda: matcher.anchor_candidates(dev, STRIDE)[0])

    compact = matcher._seed_compact_impl()

    def full():
        pos, cand, ok = matcher.anchor_candidates(dev, STRIDE)
        return compact(pos, cand, ok, jnp.int32(m), cap, STRIDE)[3]

    timeit("FULL (pipelined)", full)


if __name__ == "__main__":
    main()
