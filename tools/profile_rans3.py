#!/usr/bin/env python3
"""Experiment: encode-scan unroll factors on the real chip."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from lrzip_next_tpu.utils import jaxcache

jaxcache.enable()

import functools

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


def make_scan(ctx_bits, unroll):
    @functools.partial(jax.jit, static_argnames=())
    def run(s8, ctxq, n, freqs):
        t_len, k = s8.shape
        c_ctx = 1 << ctx_bits
        cum = rans._cumfreqs(freqs)
        fc = rans._split_hi_lo(jnp.concatenate([freqs, cum], axis=1))
        f0 = freqs[0].astype(jnp.float32)
        c0 = cum[0].astype(jnp.float32)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        lane = jax.lax.iota(jnp.int32, k)

        def step(x, inp):
            sym, cq, t = inp
            sym = sym.astype(jnp.int32)
            valid = (lane * t_len + t) < n
            oh_sym = (sym[:, None] == iota_s).astype(jnp.float32)
            if c_ctx == 1:
                f = jnp.sum(oh_sym * f0[None, :], axis=1).astype(jnp.int32)
                cs = jnp.sum(oh_sym * c0[None, :], axis=1).astype(jnp.int32)
            else:
                rows = rans._fetch_rows(cq.astype(jnp.int32), fc, c_ctx)
                f = jnp.sum(rows[:, :256] * oh_sym, axis=1).astype(jnp.int32)
                cs = jnp.sum(rows[:, 256:] * oh_sym, axis=1).astype(jnp.int32)
            f_u = f.astype(jnp.uint32)
            e = valid & (x >= (f_u << 20))
            w = jnp.where(e, x & 0xFFFF, 0).astype(jnp.uint16)
            x1 = jnp.where(e, x >> 16, x)
            xh = (x1 >> rans.M_BITS).astype(jnp.int32)
            xl = (x1 & (rans.M - 1)).astype(jnp.int32)
            q1 = rans._div_exact(xh, f)
            r1 = xh - q1 * f
            y = (r1 << rans.M_BITS) | xl
            q0 = rans._div_exact(y, f)
            r = y - q0 * f
            q = q1.astype(jnp.uint32) * jnp.uint32(rans.M) \
                + q0.astype(jnp.uint32)
            x2 = q * jnp.uint32(rans.M) + (cs + r).astype(jnp.uint32)
            x_new = jnp.where(valid, x2, x1)
            return x_new, (w, e)

        t_iota = jax.lax.iota(jnp.int32, t_len)
        init = jnp.full((k,), rans.L, jnp.uint32)
        states, (words, flags) = jax.lax.scan(
            step, init, (s8, ctxq, t_iota), reverse=True, unroll=unroll)
        return states, words, flags
    return run


for cb in (6,):
    s8, ctxq, k, t_len = rans._plan(dev, N, cb)
    srate = max(1, (t_len * k) // rans._SAMPLE_TARGET)
    counts = rans.joint_histogram(s8, ctxq, jnp.int32(N), cb, srate)
    freqs = rans.quantize_freqs(counts)
    for unroll in (1, 4, 8, 16):
        fn = make_scan(cb, unroll)

        def go():
            st, w, fl = fn(s8, ctxq, jnp.int32(N), freqs)
            return int(st[0])

        t0 = time.time()
        go()
        tc = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            go()
            ts.append(time.time() - t0)
        dt = sorted(ts)[1]
        print(f"ctx{cb} unroll{unroll}: compile {tc:.1f}s steady "
              f"{dt*1e3:.1f}ms ({dt/t_len*1e6:.1f}us/step) "
              f"-> {N/1e6/dt:.0f} MB/s", flush=True)
