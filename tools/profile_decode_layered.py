#!/usr/bin/env python3
"""Stage split of the LAYERED decode path at 64MB on the real TPU:
rans decode scan, host layered planning, pass-0 ragged kernel, layered
passes, small-cell pass.  Stage syncs use scalar readbacks; each stage
is also dispatched DEPTH times back-to-back with one sync to separate
device occupancy from tunnel RTT."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from lrzip_next_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

import bench
from lrzip_next_tpu import runtime
from lrzip_next_tpu.format.tokens import split_long_runs
from lrzip_next_tpu.models.device_path import DeviceLiteralEncode
from lrzip_next_tpu.ops import rans
from lrzip_next_tpu.ops import replay_ragged as rr
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
kinds, lengths, dists = split_long_runs(*job.collect())
enc = DeviceLiteralEncode(dev, kinds, lengths, 6)
int(enc.n_words)

lengths64 = np.asarray(lengths, np.int64)
out_len = int(lengths64.sum())
d64 = np.asarray(dists, np.int64)

DEPTH = 4


def devtime(label, fn, sync):
    int(sync(fn()))
    best = None
    for _ in range(2):
        t0 = time.time()
        outs = [fn() for _ in range(DEPTH)]
        int(sync(outs[-1]))
        dt = (time.time() - t0) / DEPTH
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best*1e3:.1f}ms", flush=True)


# 1. rans decode scan
klanes = rans.pick_lanes(enc.n_lit)
devtime("rans decode", lambda: rans.decode_arrays(
    enc.words[:].astype(jnp.int32), enc.states, enc.freqs,
    enc.n_lit, 6, klanes, enc.t_len), lambda r: r[0][0])
plane, _xf = rans.decode_arrays(
    enc.words[:].astype(jnp.int32), enc.states, enc.freqs,
    enc.n_lit, 6, klanes, enc.t_len)

# 2. host layered planning
t0 = time.time()
for _ in range(3):
    lay = runtime.flatten_replay_layered(kinds, lengths, d64)
print(f"flatten_replay_layered (host): {(time.time()-t0)/3*1e3:.1f}ms",
      flush=True)
pl_, ps_, py_, nl = lay
print(f"pieces={len(pl_)} layers={nl} "
      f"l0={int((py_==0).sum())} small="
      f"{int(((pl_<=rr._SHORT_LEN)).sum())}", flush=True)

# lit_dev: the flat uint8 literal plane exactly as bench passes it
lit_dev = plane

# 3. full layered replay (production decode replay stage)
devtime("replay layered (full)", lambda: rr.replay_pieces_layered(
    pl_, ps_, py_, nl, lit_dev, out_len), lambda o: o[0])

# 4. pass-0 only (ragged big kernel incl. small pass, as_rows)
l0 = py_ == 0
d_mask = ~l0
if d_mask.any():
    reps = np.where(d_mask, -(-pl_ // rr.CELL), 1)
    idx = np.repeat(np.arange(len(pl_)), reps)
    kk = (np.arange(int(reps.sum()))
          - np.repeat(np.cumsum(reps) - reps, reps))
    p0_len = np.where(d_mask[idx],
                      np.minimum(pl_[idx] - kk * rr.CELL, rr.CELL),
                      pl_[idx])
    p0_lit = np.where(d_mask[idx], 0, ps_[idx])
else:
    p0_len, p0_lit = pl_, ps_
devtime("pass0 ragged+small", lambda: rr.replay_pieces_ragged(
    p0_len, p0_lit, lit_dev, out_len, as_rows=True, checked=True),
    lambda o: o[0, 0])

# 5. pass-0 big kernel only (without the small-cell pass)
small = np.asarray(p0_len) <= rr._SHORT_LEN
pb_len = np.where(small, 0, p0_len)
# replace small pieces with dummy len-0 (dropped) - big-kernel cost only
nzz = pb_len > 0
devtime("pass0 big kernel only", lambda: rr.replay_pieces_ragged(
    pb_len[nzz], p0_lit[nzz], lit_dev, out_len, as_rows=True,
    checked=True), lambda o: o[0, 0])

