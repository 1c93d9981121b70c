"""Cross-validate every Pallas rANS kernel against its bit-identical
XLA twin ON REAL HARDWARE.

The CPU test suite runs these kernels in interpret mode, which lowers
differently from Mosaic; a real-chip miscompile (like the cross-row
prefix bug fixed in ops/rans_decode_pallas._excl_cumsum_flat) is
invisible to it.  Run this after any kernel change, on any new jax
version, and at any new size bucket:

    python tools/tpu_kernel_check.py [MB]

Exit is nonzero on any mismatch.  See also tools/_dbg_decode.py (the
instrumented per-row trace harness used to bisect inside the decode
kernel) and tools/_dbg_ref.py (its numpy reference trajectory).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, traceback
import numpy as np, jax, jax.numpy as jnp
from lrzip_next_tpu.utils import jaxcache; jaxcache.enable()
from lrzip_next_tpu.ops import rans
from lrzip_next_tpu.ops.rans import (_plan, quantize_freqs, _SAMPLE_TARGET,
                                     joint_histogram, _encode_scan,
                                     _pack_words_xla, _decode_scan)

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 4
n = MB << 20
base = np.frombuffer(open('/root/reference/src/rzip.c','rb').read(), np.uint8)
data = np.tile(base, n // len(base) + 1)[:n]
dev = jnp.asarray(data)
int(jnp.sum(dev[:1]))
print(f"n={n} platform={jax.devices()[0].platform}", flush=True)

s8, ctxq, k, t_len = _plan(dev, n, 6)
print(f"k={k} t_len={t_len}", flush=True)
srate = max(1, (t_len * k) // _SAMPLE_TARGET)

FAILED = []

def eq(name, a, b):
    a = np.asarray(a); b = np.asarray(b)
    same = a.shape == b.shape and bool((a == b).all())
    print(f"[{'ok' if same else 'DIFF'}] {name}", flush=True)
    if not same:
        FAILED.append(name)
    if not same and a.shape == b.shape:
        d = np.nonzero(a != b)
        print(f"   first diffs at {[tuple(x[:5]) for x in d]}"
              f" a={a[tuple(x[:5] for x in d)][:5]} b={b[tuple(x[:5] for x in d)][:5]}", flush=True)
    return same

from lrzip_next_tpu.ops.rans_pallas import encode_scan_fused, joint_histogram_pallas
from lrzip_next_tpu.ops.streampack import pack_plane_pallas

# 1. histogram
c_p = joint_histogram_pallas(s8, jnp.int32(n), 6, srate)
c_x = joint_histogram(s8, ctxq, jnp.int32(n), 6, srate)
eq("histogram", c_p, c_x)
freqs = quantize_freqs(c_x)

# 2. encode scan
st_p, plane = encode_scan_fused(s8, jnp.int32(n), freqs, 6)
st_x, words_x, flags_x = _encode_scan(s8, ctxq, jnp.int32(n), freqs, 6)
eq("encode states", st_p, st_x)
eq("encode words", np.asarray(plane) & 0xFFFF, np.asarray(words_x).astype(np.int32))
eq("encode flags", (np.asarray(plane) >> 16) & 1, np.asarray(flags_x).astype(np.int32))

# 3. pack
cap = t_len * k
pk_p, nw_p = pack_plane_pallas(plane, cap)
pk_x, nw_x = _pack_words_xla(jnp.asarray(np.asarray(words_x)), jnp.asarray(np.asarray(flags_x)), cap)
eq("pack words", pk_p, pk_x)
eq("pack count", np.asarray(nw_p), np.asarray(nw_x))

# 4. decode: XLA scan on the XLA-packed stream (ground truth)
pad = t_len * k + k - pk_x.shape[0]
spx = jnp.concatenate([pk_x.astype(jnp.int32), jnp.zeros((max(pad,0),), jnp.int32)])
syms_x, xf_x = _decode_scan(spx, st_x, freqs, jnp.int32(n), 6, t_len)
ok_x = bool((np.asarray(syms_x).T.reshape(-1)[:n] == data).all())
print(f"[{'ok' if ok_x else 'DIFF'}] XLA decode roundtrip; xf==L: {bool((np.asarray(xf_x)==rans.L).all())}", flush=True)
if not ok_x:
    # the XLA twin is the ground truth every Pallas-vs-XLA eq leans
    # on; if it regresses, wrong-but-equal pairs must still fail
    FAILED.append("xla decode roundtrip")

# 5. Pallas decode on the same stream
from lrzip_next_tpu.ops.rans_decode_pallas import decode_scan_fused
syms_p, xf_p = decode_scan_fused(pk_x.astype(jnp.int32), st_x, freqs, jnp.int32(n), 6, t_len)
eq("pallas decode syms", syms_p, np.asarray(syms_x))
eq("pallas decode xf", xf_p, xf_x)

# 6. ragged literal-concat replay kernel vs its numpy twin, on plans
# stressing every rotation path (tiny pieces, cell-crossers, all
# misalignments) at real size
from lrzip_next_tpu.ops import replay_ragged as rr
rng = np.random.default_rng(0xA11C)
lit_len = n
out_len = n + (n >> 2)
lens = []
left = out_len
while left > 0:
    r = rng.random()
    if r < 0.3:
        l = int(rng.integers(1, 16))
    elif r < 0.8:
        l = int(rng.integers(16, 1500))
    else:
        l = int(rng.integers(1500, 30000))
    l = min(l, left)
    lens.append(l)
    left -= l
lens = np.asarray(lens, np.int64)
srcs = np.asarray([rng.integers(0, lit_len - l + 1) for l in lens], np.int64)
print(f"ragged plan: {len(lens)} pieces, out {out_len}", flush=True)
want = rr.replay_pieces_reference(lens, srcs, data, out_len)
got = np.asarray(jax.device_get(
    rr.replay_pieces_ragged(lens, srcs, dev, out_len)))
eq("ragged replay", got, want)

# 7. starts3 compaction kernel (dual-chain matcher) vs its XLA twin:
# masked 3-payload compaction must agree element-for-element on the
# real chip (the merge gather and log-shift routing are exactly the
# code paths Mosaic has miscompiled before).
from lrzip_next_tpu.ops.compact_pallas import compact_starts3_pallas
rngc = np.random.default_rng(5)
for mlen, density in ((1 << 20, 0.02), (1 << 22, 0.3)):
    mask = jnp.asarray(rngc.random(mlen) < density)
    a = jnp.asarray(rngc.integers(0, 1 << 30, mlen).astype(np.int32))
    b = jnp.asarray(rngc.integers(0, 1 << 30, mlen).astype(np.int32))
    c = jnp.asarray(rngc.integers(0, 1 << 30, mlen).astype(np.int32))
    cap = int(np.asarray(mask).sum()) + 128
    ga, gb, gc, gn = compact_starts3_pallas(mask, a, b, c, cap)
    k = int(gn)
    idxs = np.flatnonzero(np.asarray(mask))
    eq(f"starts3 n (m={mlen})", np.array([k]), np.array([len(idxs)]))
    eq(f"starts3 a (m={mlen})", np.asarray(ga)[:k], np.asarray(a)[idxs])
    eq(f"starts3 b (m={mlen})", np.asarray(gb)[:k], np.asarray(b)[idxs])
    eq(f"starts3 c (m={mlen})", np.asarray(gc)[:k], np.asarray(c)[idxs])



# 8. MXU selection-matmul extraction: must reproduce x[::stride]
# EXACTLY on the real chip.  The TPU default matmul precision lowers
# f32 to bf16 passes whose 8-bit significand rounds 16-bit operands -
# this silently corrupted extracted anchor columns for four rounds
# until pinned to Precision.HIGHEST (round 5).
from lrzip_next_tpu.ops.matcher import _extract_strided_i32
rngx = np.random.default_rng(9)
xs = jnp.asarray(rngx.integers(-(1 << 31), 1 << 31, 1 << 20,
                               dtype=np.int64).astype(np.int32))
for st in (2, 8, 32):
    got = np.asarray(jax.device_get(_extract_strided_i32(xs, st)))
    want = np.asarray(xs)[::st]
    eq(f"strided extract x{st}", got[:len(want)], want)

# 9. layered replay (output-sourced passes) vs its numpy twin on the
# real chip: deferred copies + translation + RLE chunk stacking.
from lrzip_next_tpu import runtime as _rt
from lrzip_next_tpu.ops.replay_ragged import replay_pieces_layered
if _rt.available():
    rngl = np.random.default_rng(13)
    lit = rngl.integers(0, 256, 200_000, dtype=np.uint8)
    kinds, lens, dists = [], [], []
    out_parts = [lit[:50_000]]
    kinds.append(0); lens.append(50_000); dists.append(0)
    pos, lp = 50_000, 50_000
    # fragmented stretch: literal/match alternation
    cur = np.concatenate(out_parts)
    for i in range(200):
        L = 64 + int(rngl.integers(0, 200))
        kinds.append(0); lens.append(L); dists.append(0)
        out_parts.append(lit[lp:lp + L]); lp += L; pos += L
        ml = 40 + int(rngl.integers(0, 120))
        d = int(rngl.integers(ml, min(pos - 1, 30_000)))
        kinds.append(1); lens.append(ml); dists.append(d)
        cur = np.concatenate(out_parts)
        out_parts = [np.concatenate([cur, cur[pos - d:pos - d + ml]])]
        pos += ml
    cur = out_parts[0]
    # long deferred copy over the fragmented region + match into it
    n0 = len(cur)
    kinds.append(1); lens.append(n0); dists.append(n0)
    cur = np.concatenate([cur, cur])
    kinds.append(1); lens.append(4000); dists.append(7000)
    cur = np.concatenate([cur, cur[len(cur) - 7000:len(cur) - 7000 + 4000]])
    lay = _rt.flatten_replay_layered(
        np.asarray(kinds, np.uint8), np.asarray(lens, np.int64),
        np.asarray(dists, np.int64))
    if lay is None:
        print("[DIFF] layered plan unavailable", flush=True)
        FAILED = True
    else:
        pl_, ps_, py_, nl = lay
        got = np.asarray(jax.device_get(replay_pieces_layered(
            pl_, ps_, py_, nl, jnp.asarray(lit[:lp]), len(cur))))
        eq(f"layered replay ({nl} layers)", got, cur)
sys.exit(1 if FAILED else 0)
