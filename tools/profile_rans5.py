#!/usr/bin/env python3
"""Bisect the Pallas encode-scan step cost: lookup vs state update."""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from lrzip_next_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lrzip_next_tpu.ops import rans
from lrzip_next_tpu.ops.rans_pallas import (_div_exact, _ge_u, _srl,
                                            _packed_table, M, M_BITS,
                                            _L_INIT)

MB = 1 << 20
N = 16 * MB

rng = np.random.default_rng(7)
probs = 1.0 / np.arange(1, 257) ** 1.2
probs /= probs.sum()
base = rng.choice(256, size=MB, p=probs).astype(np.uint8)
data = np.tile(base, N // MB)
dev = jnp.asarray(data)
int(jnp.sum(dev[:1]))
print(f"platform={jax.devices()[0].platform}", flush=True)

CB = 6
s8, ctxq, K, T = rans._plan(dev, N, CB)
srate = max(1, (T * K) // rans._SAMPLE_TARGET)
counts = rans.joint_histogram(s8, ctxq, jnp.int32(N), CB, srate)
freqs = rans.quantize_freqs(counts)
CH = (1 << CB) * 8
SUB = 8192


def make(mode):
    shift = 8 - CB

    def kernel(n_ref, prev_ref, cur_ref, tab_ref, st_ref, out_ref, x_ref):
        b = pl.program_id(0)
        t = T - 1 - b

        @pl.when(b == 0)
        def _init():
            x_ref[...] = jnp.full((1, K), _L_INIT, jnp.int32)

        n = n_ref[0]
        sym = cur_ref[0]
        cq = prev_ref[0] >> shift
        chi = cq * 8 + (sym >> 5)
        lo = sym & 31
        tab = tab_ref[...]

        if mode == "nolookup":
            f = (sym & 1023) + 1024
            cs = sym * 8
        else:
            parts = []
            for s in range(K // SUB):
                chi_s = chi[:, s * SUB:(s + 1) * SUB]
                lo_s = lo[:, s * SUB:(s + 1) * SUB]
                iota_c = jax.lax.broadcasted_iota(jnp.int32, (CH, SUB), 0)
                oh = (iota_c == chi_s).astype(jnp.bfloat16)
                rows = jax.lax.dot_general(
                    tab, oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                val = (rows[0:32] * 65536.0 + rows[32:64] * 256.0
                       + rows[64:96])
                iota_l = jax.lax.broadcasted_iota(jnp.int32, (32, SUB), 0)
                sel = jnp.where(iota_l == lo_s, val, 0.0)
                parts.append(jnp.sum(sel, axis=0, keepdims=True))
            v = jnp.concatenate(parts, axis=1).astype(jnp.int32)
            f = (v & (M - 1)) + 1
            cs = _srl(v, M_BITS)

        x = x_ref[...]
        if mode == "nostate":
            x_new = x + f + cs
            e = x_new > 0
            w = x_new & 0xFFFF
        else:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
            valid = (lane * T + t) < n
            e = valid & _ge_u(x, f << 20)
            w = jnp.where(e, x & 0xFFFF, 0)
            x1 = jnp.where(e, _srl(x, 16), x)
            xh = _srl(x1, M_BITS)
            xl = x1 & (M - 1)
            q1 = _div_exact(xh, f)
            r1 = xh - q1 * f
            y = (r1 << M_BITS) | xl
            q0 = _div_exact(y, f)
            r = y - q0 * f
            q = q1 * M + q0
            x2 = q * M + (cs + r)
            x_new = jnp.where(valid, x2, x1)
        x_ref[...] = x_new
        st_ref[0] = x_new
        out_ref[0] = w | (e.astype(jnp.int32) << 16)

    return kernel


def run(mode):
    sp = jnp.concatenate(
        [jnp.zeros((1, K), jnp.int32), s8.astype(jnp.int32)],
        axis=0).reshape(T + 1, 1, K)
    tab = _packed_table(freqs)
    n_arr = jnp.asarray(N, jnp.int32).reshape(1)
    row = lambda imap: pl.BlockSpec((1, 1, K), imap,
                                    memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        make(mode),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row(lambda b: (T - 1 - b, 0, 0)),
            row(lambda b: (T - b, 0, 0)),
            pl.BlockSpec((96, CH), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row(lambda b: (0, 0, 0)),
                   row(lambda b: (T - 1 - b, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((1, 1, K), jnp.int32),
                   jax.ShapeDtypeStruct((T, 1, K), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((1, K), jnp.int32)],
    )
    st, plane = fn(n_arr, sp, sp, tab)
    return int(st.reshape(-1)[0])


for mode in ("full", "nolookup", "nostate"):
    try:
        run(mode)
        ts = []
        for _ in range(3):
            t0 = time.time()
            run(mode)
            ts.append(time.time() - t0)
        dt = sorted(ts)[1]
        print(f"{mode}: {dt*1e3:.1f}ms ({dt/T*1e6:.1f}us/step)", flush=True)
    except Exception as ex:
        print(f"{mode}: FAILED {type(ex).__name__}: {str(ex)[:200]}",
              flush=True)
