"""Numpy reference trajectory for the rANS decode (bit-exact mirror of
ops/rans._decode_scan): dumps syms, xf, per-step ptr, per-row cnt, and
per-grid-step states to /tmp/dbg_decode_interp.npz (the cmp target)."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np

z = np.load("/tmp/dbg_decode_in.npz")
stream, states, freqs = z["stream"], z["states"], z["freqs"]
n, k, t_len = int(z["n"]), int(z["k"]), int(z["t_len"])

M_BITS = 12
M = 1 << M_BITS
L = 1 << 16
ROWS = 8
c = freqs.shape[0]
ctx_bits = 6
shift = 8 - ctx_bits

cum = np.cumsum(freqs, axis=1) - freqs          # (C, 256)
x = states.astype(np.uint32).copy()             # (K,)
cq = np.zeros(k, np.int64)
lane = np.arange(k, dtype=np.int64)
ptr = 0
g_cnt = (t_len + ROWS - 1) // ROWS
syms = np.zeros((t_len, k), np.uint8)
cnts = np.zeros((g_cnt, ROWS), np.int32)
ptrs = np.zeros(g_cnt, np.int32)
xs = np.zeros((t_len, k), np.uint32)

# symbol search tables: for each ctx, symbol lookup by slot
slot2sym = np.zeros((c, M), np.int32)
for ci in range(c):
    slot2sym[ci] = np.repeat(np.arange(256), freqs[ci])

sp = stream.astype(np.uint32)

for t in range(t_len):
    slot = (x & (M - 1)).astype(np.int64)
    s = slot2sym[cq, slot]
    f = freqs[cq, s].astype(np.uint32)
    cs = cum[cq, s].astype(np.uint32)
    valid = (lane * t_len + t) < n
    x2 = f * (x >> M_BITS) + (x & (M - 1)) - cs
    x2 = np.where(valid, x2, x)
    e = valid & (x2 < L)
    ecnt = int(e.sum())
    if ecnt:
        w = np.zeros(k, np.uint32)
        w[e] = sp[ptr:ptr + ecnt]
        x2 = np.where(e, (x2 << 16) | (w & 0xFFFF), x2)
        ptr += ecnt
    x = np.where(valid, x2, x)
    cq = np.where(valid, s >> shift, cq)
    syms[t] = np.where(valid, s, 0).astype(np.uint8)
    cnts[t // ROWS, t % ROWS] = ecnt
    xs[t] = x
    if t % ROWS == ROWS - 1:
        ptrs[t // ROWS] = ptr

np.savez("/tmp/dbg_decode_interp.npz",
         syms=syms.reshape(g_cnt, ROWS, 8, k // 8).astype(np.int32),
         xf=x.view(np.int32).reshape(8, k // 8),
         ptr=ptrs.reshape(-1, 1), cnt=cnts,
         xs=xs.view(np.int32).reshape(g_cnt, ROWS, 8, k // 8))
print("ref ok ptr=", ptr, "xf==L:", bool((x == L).all()))
