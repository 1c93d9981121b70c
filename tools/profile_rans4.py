#!/usr/bin/env python3
"""Measure the Pallas encode scan vs the XLA scan on the real chip."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from lrzip_next_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from lrzip_next_tpu.ops import rans, rans_pallas

MB = 1 << 20
N = int(sys.argv[1]) * MB if len(sys.argv) > 1 else 16 * MB

rng = np.random.default_rng(7)
probs = 1.0 / np.arange(1, 257) ** 1.2
probs /= probs.sum()
base = rng.choice(256, size=MB, p=probs).astype(np.uint8)
data = np.tile(base, N // MB)

dev = jnp.asarray(data)
int(jnp.sum(dev[:1]))
print(f"n={N//MB}MB platform={jax.devices()[0].platform}", flush=True)


def timeit(fn, reps=3):
    t0 = time.time()
    fn()
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return tc, sorted(ts)[len(ts) // 2]


for cb in (0, 6):
    s8, ctxq, k, t_len = rans._plan(dev, N, cb)
    srate = max(1, (t_len * k) // rans._SAMPLE_TARGET)
    counts = rans.joint_histogram(s8, ctxq, jnp.int32(N), cb, srate)
    freqs = rans.quantize_freqs(counts)

    def pal():
        st, plane = rans_pallas.encode_scan_fused(
            s8, jnp.int32(N), freqs, cb)
        return int(st[0])

    tc, dt = timeit(pal)
    print(f"ctx{cb} pallas: K={k} T={t_len} compile {tc:.1f}s steady "
          f"{dt*1e3:.1f}ms ({dt/t_len*1e6:.1f}us/step) "
          f"-> {N/1e6/dt:.0f} MB/s", flush=True)

    # cross-check vs XLA on-chip
    st_x, w_x, f_x = rans._encode_scan(s8, ctxq, jnp.int32(N), freqs, cb)
    st_p, plane = rans_pallas.encode_scan_fused(s8, jnp.int32(N), freqs, cb)
    same_st = bool(jnp.all(st_x == st_p))
    wp = (plane & 0xFFFF).astype(jnp.uint16)
    fp = (plane >> 16) != 0
    same_w = bool(jnp.all(w_x == wp))
    same_f = bool(jnp.all(f_x == fp))
    print(f"ctx{cb} bit-identical on chip: states={same_st} "
          f"words={same_w} flags={same_f}", flush=True)
