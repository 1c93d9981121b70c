#!/usr/bin/env python3
"""Stage breakdown of the device-resident e2e compress at 64MB."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from lrzip_next_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

import bench
from lrzip_next_tpu.format import constants as FC
from lrzip_next_tpu.format.tokens import encode_token_stream, \
    split_long_runs
from lrzip_next_tpu.models.device_path import DeviceLiteralEncode
from lrzip_next_tpu.ops.matcher import TpuMatchJob, _bucket_size
from lrzip_next_tpu.utils.hashing import stored_crc_int

MB = 1 << 20
N = int(sys.argv[1]) * MB if len(sys.argv) > 1 else 64 * MB

data = bench.build_corpus(N)
arr = np.frombuffer(data, dtype=np.uint8)
nb = _bucket_size(N)
padded = np.zeros(nb, np.uint8)
padded[:N] = arr
dev = jnp.asarray(padded)
int(jnp.sum(dev[:1]))
w = FC.chunk_byte_width(N)
print(f"n={N//MB}MB platform={jax.devices()[0].platform}", flush=True)


def stage(label, fn, reps=3):
    out = fn()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        ts.append(time.time() - t0)
    dt = sorted(ts)[len(ts) // 2]
    print(f"{label}: {dt*1e3:.1f}ms", flush=True)
    return out, dt


job, dt0 = stage("matcher dispatch", lambda: TpuMatchJob(arr, stride=8,
                                                         dev=dev))
tokens, dt1 = stage("collect (readback+greedy)",
                    lambda: TpuMatchJob(arr, stride=8, dev=dev).collect())
kinds, lengths, dists = tokens
print(f"tokens: {len(kinds)}", flush=True)
tokens2, dt2 = stage("split_long_runs",
                     lambda: split_long_runs(kinds, lengths, dists))
k2, l2, d2 = tokens2


def lit_encode():
    enc = DeviceLiteralEncode(dev, k2, l2, 6)
    return enc, enc.payload()


(enc, payload), dt3 = stage("device literal encode+payload", lit_encode)
print(f"n_lit={enc.n_lit} payload={len(payload or b'')}", flush=True)
import zlib

crc = zlib.crc32(arr) & 0xFFFFFFFF
_, dt4 = stage("token stream encode (host)",
               lambda: encode_token_stream(k2, l2, d2, w,
                                           stored_crc_int(crc)))
_, dt5 = stage("crc32 (host)", lambda: zlib.crc32(arr))
tot = dt1 + dt2 + dt3 + dt4 + dt5
print(f"total {tot*1e3:.0f}ms -> {N/1e6/tot:.0f} MB/s", flush=True)
