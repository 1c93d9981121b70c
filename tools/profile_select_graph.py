#!/usr/bin/env python3
"""Device occupancy of the full TpuMatchJob select dispatch graph
(anchor+dual+select+coverage+pack16), batched DEPTH deep, one sync."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from lrzip_next_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

import bench
from lrzip_next_tpu.ops.matcher import TpuMatchJob, _bucket_size

MB = 1 << 20
N = int(sys.argv[1]) * MB if len(sys.argv) > 1 else 64 * MB

data = bench.build_corpus(N)
arr = np.frombuffer(data, dtype=np.uint8)
nb = _bucket_size(N)
padded = np.zeros(nb, np.uint8)
padded[:N] = arr
dev = jnp.asarray(padded)
int(jnp.sum(dev[:1]))
print(f"n={N//MB}MB platform={jax.devices()[0].platform}", flush=True)

job = TpuMatchJob(arr, stride=8, dev=dev)
int(job._packed[0])
DEPTH = 4
for rep in range(3):
    t0 = time.time()
    jobs = [TpuMatchJob(arr, stride=8, dev=dev) for _ in range(DEPTH)]
    int(jobs[-1]._packed[0])
    dt = (time.time() - t0) / DEPTH
    print(f"select graph: {dt*1e3:.1f}ms/chunk", flush=True)
# and the collect tail alone (packed already on host)
job = TpuMatchJob(arr, stride=8, dev=dev)
int(job._packed[0])
time.sleep(1.0)
t0 = time.time()
job.collect()
print(f"collect after graph done: {(time.time()-t0)*1e3:.1f}ms",
      flush=True)
