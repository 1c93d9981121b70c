#!/usr/bin/env python3
"""Per-stage timing of the anchor matcher pipeline on the real TPU.

Times each stage of the 64MB stride-8 path separately (the bench
headline), so optimization work targets the real bottleneck.  Sync is a
scalar readback (block_until_ready is a no-op under axon).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from lrzip_next_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from bench import build_corpus
from lrzip_next_tpu.ops import matcher
from lrzip_next_tpu.ops.anchor_pallas import anchor_fps_pallas

CHUNK_MB = 64
STRIDE = 8
REPS = 3


def sync(x):
    return int(jnp.asarray(x).ravel()[0])


def timeit(name, fn):
    fn()  # compile / warm
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(f"{name:34s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def main():
    n = CHUNK_MB << 20
    data = np.frombuffer(build_corpus(n), dtype=np.uint8)
    dev = jnp.asarray(data)
    sync(dev[:1])

    m = n - matcher.HASH_W + 1
    k = m // STRIDE
    cap = max(min(k, 4096), k // 64)

    # stage A: fused fingerprint+anchor-mask kernel
    def st_a():
        fpa, fpb = anchor_fps_pallas(dev, STRIDE)
        return sync(fpa[:1])
    timeit("A fused fp+anchor kernel", st_a)

    # stage A+B: + row-min reduction + anchor selection + 2 sorts
    def st_ab():
        pos, cand, ok = matcher.anchor_candidates(dev, STRIDE)
        return sync(pos[:1])
    t_ab = timeit("A+B anchor_candidates (incl sorts)", st_ab)

    pos, cand, ok = matcher.anchor_candidates(dev, STRIDE)
    sync(pos[:1])

    # stage C: chain masks + pallas seed compaction
    compact = matcher._seed_compact_impl()

    def st_c():
        s, e, src, nr = compact(pos, cand, ok, jnp.int32(m), cap, STRIDE)
        return int(nr)
    timeit("C chain-mask + seed compaction", st_c)

    # C sub-stages: raw pallas tile compaction without the merge
    from lrzip_next_tpu.ops.compact_pallas import (
        compact_starts_pallas, T, _R, _L)
    from lrzip_next_tpu.ops.matcher import _anchor_chain_masks

    @jax.jit
    def chain_only(pos, cand, ok):
        start, _ = _anchor_chain_masks(pos, cand, ok, jnp.int32(m), STRIDE)
        return jnp.sum(start.astype(jnp.int32))

    def st_cm():
        return int(chain_only(pos, cand, ok))
    timeit("  chain masks only", st_cm)

    # isolate: the two sorts alone at k elements
    row_min = jnp.asarray(np.random.randint(0, 2**31, k, dtype=np.int32))
    a_fpb = jnp.asarray(np.random.randint(0, 2**31, k, dtype=np.int32))
    a_pos = jnp.arange(k, dtype=jnp.int32)
    sync(row_min[:1])

    @jax.jit
    def two_sorts(rm, fb, ap):
        s1, s2, sp = jax.lax.sort((rm, fb, ap), num_keys=3)
        cs = jnp.where(s1 > 0, sp, -1)
        p2, c2 = jax.lax.sort((sp, cs), num_keys=1)
        return p2

    def st_s():
        return sync(two_sorts(row_min, a_fpb, a_pos)[:1])
    timeit("  sort1(3key)+sort2(1key) k-sized", st_s)

    @jax.jit
    def sort1_2key(rm, ap):
        s1, sp = jax.lax.sort((rm, ap), num_keys=2)
        return sp

    def st_s2():
        return sync(sort1_2key(row_min, a_pos)[:1])
    timeit("  sort1 2-key only", st_s2)

    @jax.jit
    def sort1_3key(rm, fb, ap):
        s1, s2, sp = jax.lax.sort((rm, fb, ap), num_keys=3)
        return sp

    def st_s3():
        return sync(sort1_3key(row_min, a_fpb, a_pos)[:1])
    timeit("  sort1 3-key only", st_s3)

    @jax.jit
    def sort2_only(ap, cs):
        p2, c2 = jax.lax.sort((ap, cs), num_keys=1)
        return p2

    cs = jnp.where(row_min > 0, a_pos, -1)
    sync(cs[:1])

    def st_s4():
        return sync(sort2_only(a_pos, cs)[:1])
    timeit("  sort2 1-key only", st_s4)

    # full current step (what bench times)
    def full():
        pos, cand, ok = matcher.anchor_candidates(dev, STRIDE)
        s, e, src, nr = compact(pos, cand, ok, jnp.int32(m), cap, STRIDE)
        return int(nr)
    dt = timeit("FULL step", full)
    print(f"=> {n/1e6/dt:.1f} MB/s")


if __name__ == "__main__":
    main()
