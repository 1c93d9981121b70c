#!/usr/bin/env python3
"""Wall-clock split of bench.py's pipelined compress loop (the headline
path): per-chunk time inside collect / split / rans dispatch / token
encode / n_words sync, measured in the same DEPTH-4 interleave the
bench runs.  The sum of buckets equals the per-chunk wall time, so this
shows what the 64MB headline actually waits on."""
import sys
import time
import zlib

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

from concurrent.futures import ThreadPoolExecutor
crc_pool = ThreadPoolExecutor(1)

T = {}


def tick(key, t0):
    t1 = time.time()
    T[key] = T.get(key, 0.0) + (t1 - t0)
    return t1


def compress_once(job, queue_next=None):
    t = time.time()
    crc_fut = crc_pool.submit(lambda: zlib.crc32(arr) & 0xFFFFFFFF)
    kinds, lengths, dists = job.collect()
    t = tick("collect", t)
    kinds, lengths, dists = split_long_runs(kinds, lengths, dists)
    t = tick("split", t)
    enc = DeviceLiteralEncode(dev, kinds, lengths, 6)
    t = tick("rans_dispatch", t)
    if queue_next is not None:
        queue_next()
    t = tick("queue_next", t)
    stream0 = encode_token_stream(kinds, lengths, dists, w,
                                  stored_crc_int(crc_fut.result()))
    t = tick("token_encode", t)
    return enc, stream0


compress_once(TpuMatchJob(arr, stride=8, dev=dev))  # warm
DEPTH = 6
for rep in range(3):
    T.clear()
    jobs = [TpuMatchJob(arr, stride=8, dev=dev)]
    created = 1
    t0 = time.time()
    prev_enc = None
    for i in range(DEPTH):
        # production order (models/pipeline lookahead=1): keep TWO
        # matcher graphs queued ahead so the device never idles while
        # the host fetches/finalizes the current chunk
        t = time.time()
        while created < min(DEPTH, i + 3):
            jobs.append(TpuMatchJob(arr, stride=8, dev=dev))
            created += 1
        tick("lookahead", t)
        enc, _ = compress_once(jobs.pop(0))
        # chunk i-1's rans completion is awaited here (one-deferred,
        # the way production's finish_chunk pipelines payload assembly)
        t = time.time()
        if prev_enc is not None:
            int(prev_enc.n_words)
        prev_enc = enc
        tick("nw_sync_prev", t)
    t = time.time()
    int(prev_enc.n_words)
    tick("nw_sync_prev", t)
    dt = (time.time() - t0) / DEPTH
    parts = " ".join(f"{k}={v*1e3/DEPTH:.1f}ms"
                     for k, v in T.items())
    print(f"rep{rep}: {dt*1e3:.1f}ms/chunk -> {N/1e6/dt:.1f} MB/s | "
          f"{parts}", flush=True)
