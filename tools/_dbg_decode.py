"""Debug harness for the Pallas rANS decode kernel (TPU miscompile hunt).

Modes:
  gen   - CPU: build inputs (stream/states/freqs) via the XLA encode
          path, save /tmp/dbg_decode_in.npz
  tpu   - axon: run the instrumented kernel under Mosaic, save
          /tmp/dbg_decode_tpu.npz
  interp- CPU: run the same instrumented kernel in interpret mode,
          save /tmp/dbg_decode_interp.npz
  cmp   - compare the two dumps
"""
import sys, os
sys.path.insert(0, "/root/repo")
import numpy as np

MODE = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else (4 << 20)

if MODE in ("gen", "interp", "cmp"):
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax, jax.numpy as jnp
from lrzip_next_tpu.utils import jaxcache; jaxcache.enable()

IN = "/tmp/dbg_decode_in.npz"

if MODE == "gen":
    from lrzip_next_tpu.ops.rans import (_plan, quantize_freqs,
                                         joint_histogram, _encode_scan,
                                         _pack_words_xla, _SAMPLE_TARGET)
    base = np.frombuffer(open('/root/reference/src/rzip.c', 'rb').read(),
                         np.uint8)
    data = np.tile(base, N // len(base) + 1)[:N]
    dev = jnp.asarray(data)
    s8, ctxq, k, t_len = _plan(dev, N, 6)
    srate = max(1, (t_len * k) // _SAMPLE_TARGET)
    counts = joint_histogram(s8, ctxq, jnp.int32(N), 6, srate)
    freqs = quantize_freqs(counts)
    st, words, flags = _encode_scan(s8, ctxq, jnp.int32(N), freqs, 6)
    cap = t_len * k
    pk, nw = _pack_words_xla(words, flags, cap)
    np.savez(IN, data=data, stream=np.asarray(pk), states=np.asarray(st),
             freqs=np.asarray(freqs), n=N, k=k, t_len=t_len,
             n_words=int(nw))
    print("gen ok", k, t_len, int(nw))
    sys.exit(0)

z = np.load(IN)
stream, states, freqs = z["stream"], z["states"], z["freqs"]
n, k, t_len = int(z["n"]), int(z["k"]), int(z["t_len"])

if MODE == "cmp":
    a = np.load("/tmp/dbg_decode_tpu.npz")
    b = np.load("/tmp/dbg_decode_interp.npz")
    for key in ("cnt", "xs", "syms", "xf"):
        if key not in a or key not in b:
            continue
        same = (a[key] == b[key]).all()
        print(key, "ok" if same else "DIFF")
        if not same:
            d = np.nonzero(a[key] != b[key])
            print("  first idx:", [x[:4] for x in d])
            print("  tpu:", a[key][tuple(x[:4] for x in d)])
            print("  itp:", b[key][tuple(x[:4] for x in d)])
    sys.exit(0)

# ---- instrumented kernel ----
import functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import lrzip_next_tpu.ops.rans_decode_pallas as D

M_BITS, M, _L_INIT = D.M_BITS, D.M, D._L_INIT
_ROWS, _WIN, _SUBW = D._ROWS, D._WIN, D._SUBW
_srl = D._srl


def make_kernel(t_len, k, c, ctx_bits, g_cnt):
    kc = k // 8
    ch = c * 4
    nbits = max(int(k - 1).bit_length(), 1)
    shift = 8 - ctx_bits

    def kernel(n_ref, states_ref, ctab_ref, tab_ref, stream_ref,
               out_ref, st_out_ref, cnt_out_ref, x_out_ref,
               x_ref, cq_ref, win_ref, ptr_ref, sem_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _init():
            x_ref[...] = states_ref[...]
            cq_ref[...] = jnp.zeros((8, kc), jnp.int32)
            ptr_ref[0] = 0

        n = n_ref[0]
        ptr0 = ptr_ref[0]
        wrow = pl.multiple_of((jax.lax.div(ptr0, kc * 8)) * 8, 8)
        dma = pltpu.make_async_copy(
            stream_ref.at[pl.ds(wrow, _WIN)], win_ref, sem_ref)
        dma.start()

        ctab = ctab_ref[...]
        tab = tab_ref[...]
        lane = (jax.lax.broadcasted_iota(jnp.int32, (8, kc), 0) * kc
                + jax.lax.broadcasted_iota(jnp.int32, (8, kc), 1))
        idx = lane
        x = x_ref[...]
        cq = cq_ref[...]
        ptr = ptr0

        dma.wait()

        for i in range(_ROWS):
            t = b * _ROWS + i
            slot = x & (M - 1)
            slot_f = slot.astype(jnp.float32)
            s_rows = []
            v_rows = []
            for r in range(8):
                cq_r = cq[r:r + 1]
                iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, kc), 0)
                ohc = (iota_c == cq_r).astype(jnp.bfloat16)
                crow = jax.lax.dot_general(
                    ctab, ohc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                coarse = crow[0:4] * 256.0 + crow[4:8]
                blk = jnp.sum((coarse <= slot_f[r:r + 1]).astype(
                    jnp.int32), axis=0, keepdims=True) - 1
                chi = cq_r * 4 + blk
                iota_h = jax.lax.broadcasted_iota(jnp.int32, (ch, kc), 0)
                ohx = (iota_h == chi).astype(jnp.bfloat16)
                rows = jax.lax.dot_general(
                    tab, ohx, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                val = (rows[0:64] * 65536.0 + rows[64:128] * 256.0
                       + rows[128:192]).astype(jnp.int32)
                le = _srl(val, M_BITS) <= slot[r:r + 1]
                cnt32 = jnp.sum(le.astype(jnp.int32), axis=0,
                                keepdims=True)
                vsel = jnp.max(jnp.where(le, val, 0), axis=0,
                               keepdims=True)
                s_rows.append(blk * 64 + cnt32 - 1)
                v_rows.append(vsel)
            s = jnp.concatenate(s_rows, axis=0)
            vsel = jnp.concatenate(v_rows, axis=0)
            cs = _srl(vsel, M_BITS)
            f = (vsel & (M - 1)) + 1
            x2 = f * _srl(x, M_BITS) + (slot - cs)
            valid = (t < t_len) & ((lane * t_len + t) < n)
            x2v = jnp.where(valid, x2, x)
            e = valid & (x2v >= 0) & (x2v < _L_INIT)
            loc = ptr - wrow * kc
            roff = jax.lax.div(loc, kc)
            o = jax.lax.rem(loc, kc)
            roff8 = pl.multiple_of((roff // 8) * 8, 8)
            dr = roff - roff8
            sub = win_ref[pl.ds(roff8, _SUBW), :]
            for bb in range(3):
                s_r = 1 << bb
                sh = jnp.concatenate(
                    [sub[s_r:], jnp.zeros((s_r, kc), jnp.int32)], axis=0)
                sub = jnp.where(((dr >> bb) & 1) > 0, sh, sub)
            for bb in range(kc.bit_length() - 1):
                sh = D._flat_shift_left(sub, 1 << bb, kc)
                sub = jnp.where(((o >> bb) & 1) > 0, sh, sub)
            window = sub[:8]
            ei = e.astype(jnp.int32)
            rank = D._excl_cumsum_flat(ei, kc)
            cnt = jnp.sum(ei)
            wv = D._expand_flat_tile(window, e, idx, rank, cnt, nbits, kc)
            x3 = jnp.where(e, (x2v << 16) | (wv & 0xFFFF), x2v)
            x = jnp.where(valid, x3, x)
            if ctx_bits:
                cq = jnp.where(valid, _srl(s, shift), cq)
            out_ref[0, i] = jnp.where(valid, s, 0)
            cnt_out_ref[0, i] = jnp.broadcast_to(
                cnt.reshape(1, 1), (1, kc)).reshape(kc)
            x_out_ref[0, i] = x
            ptr = ptr + cnt

        x_ref[...] = x
        cq_ref[...] = cq
        ptr_ref[0] = ptr
        st_out_ref[...] = x

    return kernel


def run(stream_pad, states, freqs, n, ctx_bits, t_len, interpret):
    k = states.shape[0]
    kc = k // 8
    c = freqs.shape[0]
    g_cnt = (t_len + _ROWS - 1) // _ROWS
    sr = (stream_pad.shape[0] + kc - 1) // kc + _WIN
    need = sr * kc - stream_pad.shape[0]
    w2 = jnp.concatenate(
        [stream_pad.astype(jnp.int32),
         jnp.zeros((need,), jnp.int32)]).reshape(sr, kc)
    st8 = jax.lax.bitcast_convert_type(
        jnp.asarray(states), jnp.int32).reshape(8, kc)
    tab = D._packed_table(jnp.asarray(freqs))
    ctab = D._coarse_table(jnp.asarray(freqs))
    n_arr = jnp.asarray(n, jnp.int32).reshape(1)

    outs = pl.pallas_call(
        make_kernel(t_len, k, c, ctx_bits, g_cnt),
        grid=(g_cnt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, kc), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, c), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((192, c * 4), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, _ROWS, 8, kc), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kc), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, kc), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, 8, kc), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g_cnt, _ROWS, 8, kc), jnp.int32),
            jax.ShapeDtypeStruct((8, kc), jnp.int32),
            jax.ShapeDtypeStruct((g_cnt, _ROWS, kc), jnp.int32),
            jax.ShapeDtypeStruct((g_cnt, _ROWS, 8, kc), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, kc), jnp.int32),
            pltpu.VMEM((8, kc), jnp.int32),
            pltpu.VMEM((_WIN, kc), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(n_arr, st8, ctab, tab, w2)
    return outs


interp = (MODE == "interp")
outs = run(jnp.asarray(stream), states, freqs, n, 6, t_len, interp)
syms, xf, cntkc, xs = [np.asarray(o) for o in outs]
cnt = cntkc[:, :, 0]
out = "/tmp/dbg_decode_interp.npz" if interp else "/tmp/dbg_decode_tpu.npz"
np.savez(out, syms=syms, xf=xf, cnt=cnt, xs=xs)
print("saved", out, "total_cnt=", cnt.sum(), flush=True)
