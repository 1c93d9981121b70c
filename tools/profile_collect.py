#!/usr/bin/env python3
"""Stage breakdown of TpuMatchJob.collect() at 64MB on the real TPU."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from lrzip_next_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

import bench
from lrzip_next_tpu.ops.matcher import (TpuMatchJob, _bucket_size,
                                        _fetch_seeds_counted,
                                        _fetch_selected_counted,
                                        finalize_selected,
                                        greedy_cover_from_runs)

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

# warm
job = TpuMatchJob(arr, stride=8, dev=dev)
job.collect()

for rep in range(3):
    # --- select path (round 5 production default)
    t0 = time.time()
    job = TpuMatchJob(arr, stride=8, dev=dev, select=True)
    t1 = time.time()
    ss, sl, sd, n_sel = job.selected
    _, n_raw = job.compacted
    k, kraw, covs, s, ln, d = _fetch_selected_counted(
        ss, sl, sd, n_sel, n_raw, job.cov_w, job.fetch_cap)
    t2 = time.time()
    holes = []
    kinds, lengths, dists = finalize_selected(
        s[:k], ln[:k], d[:k], job.n, job.data, hole_out=holes)
    t3 = time.time()
    mb = int(lengths[kinds == 1].sum())
    print(f"rep{rep} SELECT: dispatch {1e3*(t1-t0):.1f}ms"
          f" | n_sel={k} kraw={kraw} covs={covs}"
          f" fetch(+wait) {1e3*(t2-t1):.1f}ms"
          f" | finalize {1e3*(t3-t2):.1f}ms holes="
          f"{holes[0] if holes else 0} matched={mb}"
          f" | total {1e3*(t3-t0):.1f}ms", flush=True)

    # --- walk path (round 4) for comparison
    t0 = time.time()
    job = TpuMatchJob(arr, stride=8, dev=dev, select=False)
    t1 = time.time()
    records, n_raw = job.compacted
    t2 = time.time()
    k, rs, re, src = _fetch_seeds_counted(*records, n_raw, 262144)
    rl = re - rs + 1
    t3 = time.time()
    holes = []
    kinds, lengths, dists = greedy_cover_from_runs(
        rs, rl, src, job.n, data=job.data, hole_out=holes,
        gap_merged=True)
    t5 = time.time()
    mb = int(lengths[kinds == 1].sum())
    msg = (f"rep{rep} WALK  : dispatch {1e3*(t1-t0):.1f}ms | sync {1e3*(t2-t1):.1f}ms"
           f" | k={k} fetch {1e3*(t3-t2):.1f}ms"
           f" | greedy {1e3*(t5-t3):.1f}ms holes={holes[0] if holes else 0}"
           f" matched={mb}"
           f" | total {1e3*(t5-t0):.1f}ms")
    print(msg, flush=True)

