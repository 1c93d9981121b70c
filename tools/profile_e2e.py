#!/usr/bin/env python3
"""Stage breakdown of the device-resident e2e path (encode AND decode).

Usage: profile_e2e.py [size_mb] [--decode-only|--encode-only]

Consolidates the former profile_rans*.py scratch profilers: one tool,
every stage, real-TPU timings with scalar-readback syncs (axon's
block_until_ready is async - see CLAUDE.md).
"""
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
from lrzip_next_tpu import runtime
from lrzip_next_tpu.format import constants as FC
from lrzip_next_tpu.format.tokens import encode_token_stream, \
    split_long_runs
from lrzip_next_tpu.models.device_path import DeviceLiteralEncode
from lrzip_next_tpu.ops import rans
from lrzip_next_tpu.ops.matcher import TpuMatchJob, _bucket_size
from lrzip_next_tpu.ops.replay import replay_flat_tpu
from lrzip_next_tpu.utils.hashing import stored_crc_int

MB = 1 << 20
N = int(sys.argv[1]) * MB if len(sys.argv) > 1 else 64 * MB
MODE = sys.argv[2] if len(sys.argv) > 2 else ""

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


tokens, dt1 = stage("matcher+collect (dispatch+readback+greedy)",
                    lambda: TpuMatchJob(arr, stride=8, dev=dev).collect())
kinds, lengths, dists = tokens
print(f"tokens: {len(kinds)}", flush=True)
tokens2, dt2 = stage("split_long_runs (host)",
                     lambda: split_long_runs(kinds, lengths, dists))
k2, l2, d2 = tokens2

if MODE != "--decode-only":
    def lit_sync():
        e = DeviceLiteralEncode(dev, k2, l2, 6)
        if e.n_lit:
            int(e.n_words)
        return e

    enc_t, dt3 = stage("device literal encode (mask+pack+rans, sync)",
                       lit_sync)
    _, dt3b = stage("payload readback+assemble", lambda: enc_t.payload())
    _, dt4 = stage("token stream encode (host)",
                   lambda: encode_token_stream(
                       k2, l2, d2, w, stored_crc_int(
                           zlib.crc32(arr) & 0xFFFFFFFF)))
    _, dt5 = stage("crc32 (host)", lambda: zlib.crc32(arr))
    tot = dt1 + dt2 + dt3 + dt4 + dt5
    print(f"encode total {tot*1e3:.0f}ms -> {N/1e6/tot:.0f} MB/s",
          flush=True)

    # rans-internal stages on the literal plane
    from lrzip_next_tpu.models.device_path import literal_spans, \
        _literal_mask_fn, _pack_impl, _token_bucket
    ls, le, n_lit = literal_spans(k2, l2)
    print(f"n_lit={n_lit//MB}MB", flush=True)
    npos = int(dev.shape[0])
    tb = _token_bucket(len(ls))
    ls_p = np.full(tb, npos, np.int32)
    le_p = np.full(tb, npos, np.int32)
    ls_p[:len(ls)] = ls
    le_p[:len(le)] = le
    mask, _ = stage("  mask", lambda: _literal_mask_fn(npos)(
        jnp.asarray(ls_p), jnp.asarray(le_p)))
    kk = rans.pick_lanes(n_lit)
    cap = rans._bucket(n_lit, kk)

    def pack_lits():
        p, c = _pack_impl()(dev, mask, cap)
        return p.astype(jnp.uint8)

    lit_dev, _ = stage("  literal compaction", pack_lits)

    def rans_enc():
        f, s, p, nw, tl = rans.encode_arrays(lit_dev, n_lit, 6)
        int(nw)
        return f, s, p, nw, tl

    (freqs, states, packed, n_words, t_len), _ = stage(
        "  rans encode_arrays (hist+scan+pack, sync)", rans_enc)
    s8, ctxq, kk2, tl2 = rans._plan(lit_dev, n_lit, 6)
    srate = max(1, (tl2 * kk2) // rans._SAMPLE_TARGET)
    from lrzip_next_tpu.ops.rans_pallas import encode_scan_fused, \
        joint_histogram_pallas
    from lrzip_next_tpu.ops.streampack import pack_plane_pallas
    _, _ = stage("    hist", lambda: int(joint_histogram_pallas(
        s8, jnp.int32(n_lit), 6, srate)[0, 0]))

    def scan_only():
        st, pl = encode_scan_fused(s8, jnp.int32(n_lit), freqs, 6)
        return int(pl[0, 0])

    _, _ = stage("    encode scan", scan_only)
    st2, plane2 = encode_scan_fused(s8, jnp.int32(n_lit), freqs, 6)

    def pack_only():
        p, nw2 = pack_plane_pallas(plane2, tl2 * kk2)
        return int(nw2)

    _, _ = stage("    pack plane", pack_only)

if MODE != "--encode-only":
    enc = DeviceLiteralEncode(dev, k2, l2, 6)
    nw = int(enc.n_words)
    flat = runtime.flatten_replay(k2, l2, d2)
    k_lanes = enc.states.shape[0]
    n_lit = enc.n_lit

    def rans_dec():
        plane, xf = rans.decode_arrays(
            enc.words[:].astype(jnp.int32), enc.states, enc.freqs,
            n_lit, enc.ctx_bits, k_lanes, enc.t_len)
        int(plane[0])
        return plane

    plane, ddt1 = stage("rans decode scan (sync)", rans_dec)
    print(f"plan pieces: {len(flat[0])}", flush=True)

    from lrzip_next_tpu.ops.replay_ragged import (plan_ragged,
                                                  replay_pieces_ragged)

    def plan_only():
        return plan_ragged(flat[0], flat[1], N, n_lit)

    plan, ddt2a = stage("ragged plan (host)", plan_only)
    print(f"plan: {plan.n_frags} frags, {len(plan.calls)} calls",
          flush=True)
    lit_plane = plane[:max(n_lit, 1)]

    def replay_ragged():
        out = replay_pieces_ragged(flat[0], flat[1], lit_plane, N)
        return int(out[0])

    _, ddt2b = stage("replay (ragged-concat kernel)", replay_ragged)
    tot = ddt1 + ddt2b
    print(f"decode total {tot*1e3:.0f}ms -> {N/1e6/tot:.0f} MB/s",
          flush=True)
