#!/usr/bin/env python3
"""Break down device rANS cost: ctx_bits, lane count, stage timings.
Uses tiled (wire-compressible) data so the tunnel upload is fast."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from lrzip_next_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

from lrzip_next_tpu.ops import rans

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
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


for cb in (0, 6, 8):
    s8, ctxq, k, t_len = rans._plan(dev, N, cb)
    srate = max(1, (t_len * k) // rans._SAMPLE_TARGET)

    def hist():
        c = rans.joint_histogram(s8, ctxq, jnp.int32(N), cb, srate)
        f = rans.quantize_freqs(c)
        return int(f[0, 0])

    dt_h = timeit(hist)
    counts = rans.joint_histogram(s8, ctxq, jnp.int32(N), cb, srate)
    freqs = rans.quantize_freqs(counts)

    def scan():
        st, w, fl = rans._encode_scan(s8, ctxq, jnp.int32(N), freqs, cb)
        return int(st[0])

    dt_s = timeit(scan)
    states, words, flags = rans._encode_scan(
        s8, ctxq, jnp.int32(N), freqs, cb)

    def pack():
        p, nw = rans._pack_words_impl()(words, flags, t_len * k)
        return int(nw)

    dt_p = timeit(pack)
    tot = dt_h + dt_s + dt_p
    print(f"ctx{cb}: K={k} T={t_len} hist {dt_h*1e3:.1f}ms "
          f"scan {dt_s*1e3:.1f}ms ({dt_s/t_len*1e6:.1f}us/step) "
          f"pack {dt_p*1e3:.1f}ms total {tot*1e3:.1f}ms "
          f"-> {N/1e6/tot:.0f} MB/s", flush=True)
