#!/usr/bin/env python3
"""True device occupancy of the rANS literal-encode stages: dispatch
each jitted stage DEPTH times back-to-back and sync once (scalar
readback), so tunnel RTT amortises and the number is device time."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from lrzip_next_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp

import bench
from lrzip_next_tpu.format.tokens import split_long_runs
from lrzip_next_tpu.models.device_path import DeviceLiteralEncode
from lrzip_next_tpu.ops import rans
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
kinds, lengths, dists = job.collect()
kinds, lengths, dists = split_long_runs(kinds, lengths, dists)

enc = DeviceLiteralEncode(dev, kinds, lengths, 6)
int(enc.n_words)
print(f"n_lit={enc.n_lit/1e6:.1f}MB", flush=True)

DEPTH = 4


def devtime(label, fn, sync):
    fn()
    int(sync(fn()))  # warm + sync
    for rep in range(2):
        t0 = time.time()
        outs = [fn() for _ in range(DEPTH)]
        int(sync(outs[-1]))
        dt = (time.time() - t0) / DEPTH
        if rep:
            print(f"{label}: {dt*1e3:.1f}ms", flush=True)


# full literal-encode graph (mask+compact+hist+scan+pack)
devtime("full DeviceLiteralEncode",
        lambda: DeviceLiteralEncode(dev, kinds, lengths, 6),
        lambda e: e.n_words)

# stage pieces on the same literal plane (rebuild lit_dev the way
# DeviceLiteralEncode does, then _plan it)
from lrzip_next_tpu.models.device_path import (_literal_mask_fn,
                                               _pack_impl,
                                               _token_bucket,
                                               literal_spans)

ls, le, n_lit = literal_spans(kinds, lengths)
npos = int(dev.shape[0])
tb = _token_bucket(len(ls))
ls_p = np.full(tb, npos, np.int32)
le_p = np.full(tb, npos, np.int32)
ls_p[:len(ls)] = ls
le_p[:len(le)] = le
mask = _literal_mask_fn(npos)(jnp.asarray(ls_p), jnp.asarray(le_p))
cap = rans._bucket(n_lit, rans.pick_lanes(n_lit))
packed0, _cnt = _pack_impl()(dev, mask, cap)
lit_dev = packed0.astype(jnp.uint8)
s8, _ctxq, k, t_len = rans._plan(lit_dev, n_lit, 6)
nlit = jnp.int32(n_lit)
from lrzip_next_tpu.ops.rans_pallas import (encode_scan_fused,
                                            joint_histogram_pallas)
from lrzip_next_tpu.ops.streampack import pack_plane_pallas

srate = max(t_len * k // rans._SAMPLE_TARGET, 1)
devtime("hist", lambda: joint_histogram_pallas(s8, nlit, 6, srate),
        lambda c: c[0, 0])
counts = joint_histogram_pallas(s8, nlit, 6, srate)
freqs = rans.quantize_freqs(counts)
int(freqs[0, 0])
devtime("scan", lambda: encode_scan_fused(s8, nlit, freqs, 6),
        lambda r: r[1][0, 0])
_, plane = encode_scan_fused(s8, nlit, freqs, 6)
int(plane[0, 0])
devtime("pack", lambda: pack_plane_pallas(plane, t_len * k),
        lambda r: r[1])
