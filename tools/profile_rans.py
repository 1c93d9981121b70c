#!/usr/bin/env python3
"""Measure device rANS encode/decode throughput on the real chip."""
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
N = int(sys.argv[1]) * MB if len(sys.argv) > 1 else 64 * MB
CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 6

rng = np.random.default_rng(7)
# text-like: zipf over a byte alphabet
probs = 1.0 / np.arange(1, 257) ** 1.2
probs /= probs.sum()
data = rng.choice(256, size=N, p=probs).astype(np.uint8)

dev = jnp.asarray(data)
int(jnp.sum(dev[:1]))
print(f"n={N//MB}MB ctx_bits={CTX} platform={jax.devices()[0].platform}",
      file=sys.stderr)

t0 = time.time()
freqs, states, packed, n_words, t_len = rans.encode_arrays(dev, N, CTX)
nw = int(n_words)
t1 = time.time()
print(f"encode compile+run: {t1-t0:.2f}s, n_words={nw}", file=sys.stderr)

times = []
for _ in range(3):
    t0 = time.time()
    freqs, states, packed, n_words, t_len = rans.encode_arrays(dev, N, CTX)
    nw = int(n_words)
    times.append(time.time() - t0)
enc_dt = sorted(times)[1]
print(f"encode steady: {enc_dt*1000:.1f}ms -> {N/1e6/enc_dt:.1f} MB/s",
      file=sys.stderr)

k = states.shape[0]
# decode from device arrays
stream_dev = packed[:].astype(jnp.int32)
t0 = time.time()
plane, xf = rans.decode_arrays(stream_dev, states, freqs, N, CTX, k, t_len)
ok = bool(jnp.all(xf == rans.L))
t1 = time.time()
print(f"decode compile+run: {t1-t0:.2f}s ok={ok}", file=sys.stderr)
times = []
for _ in range(3):
    t0 = time.time()
    plane, xf = rans.decode_arrays(stream_dev, states, freqs, N, CTX, k,
                                   t_len)
    ok = bool(jnp.all(xf == rans.L))
    times.append(time.time() - t0)
dec_dt = sorted(times)[1]
print(f"decode steady: {dec_dt*1000:.1f}ms -> {N/1e6/dec_dt:.1f} MB/s "
      f"ok={ok}", file=sys.stderr)
ratio = N / (2.0 * nw + 4 * k)
print(f"ratio ~{ratio:.2f}x (words only)", file=sys.stderr)
