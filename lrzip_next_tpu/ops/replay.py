"""TPU token replay: rzip decode as a parallel pointer-jumping kernel.

The reference replays tokens strictly sequentially through the history
fd (src/runzip.c:129-241).  Here the whole chunk resolves in parallel:

1. token expansion - scatter token boundaries, segment-id via cummax,
   per-byte source index ``src[i] = i - dist`` for match bytes and a
   self-loop for literal bytes (whose values are known);
2. pointer doubling - ``src = src[src]`` until fixpoint: every byte's
   chain bottoms out at a literal byte in O(log max-chain) gathers
   (cf. the parallel LZ decoding literature - ACEAPEX/Massively-Parallel
   Lossless Data Decompression, see PAPERS.md).

Overlapping matches (dist < len) are chains of depth len/dist and
resolve in log of that; typical archives finish in a handful of rounds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("out_len",))
def expand_tokens(starts: jnp.ndarray, is_match: jnp.ndarray,
                  dists: jnp.ndarray, lit_base: jnp.ndarray,
                  out_len: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-byte (src, lit_idx) maps from columnar tokens.

    starts: int32[T] output offset of each token (sorted ascending).
    is_match: bool[T]; dists: int32[T]; lit_base: int32[T] cumulative
    literal offset per token.  Returns (src, lit_idx) of length out_len:
    src[i] self-loop for literal bytes, i - dist for match bytes;
    lit_idx[i] the literal-stream index for literal bytes (else 0).
    """
    t = starts.shape[0]
    # segment id per byte: scatter token index at starts, then cummax
    seg = jnp.zeros((out_len,), jnp.int32).at[starts].max(
        jnp.arange(t, dtype=jnp.int32), mode="drop")
    seg = jax.lax.cummax(seg)
    pos = jnp.arange(out_len, dtype=jnp.int32)
    within = pos - starts[seg]
    m = is_match[seg]
    src = jnp.where(m, pos - dists[seg], pos)
    lit_idx = jnp.where(m, 0, lit_base[seg] + within)
    return src, lit_idx


@jax.jit
def resolve_bytes(src: jnp.ndarray, lit_idx: jnp.ndarray,
                  literals: jnp.ndarray) -> jnp.ndarray:
    """Pointer-double src to literal roots, then gather literal values."""
    def cond(state):
        s, changed = state
        return changed

    def body(state):
        s, _ = state
        ns = s[s]
        return ns, jnp.any(ns != s)

    src, _ = jax.lax.while_loop(cond, body, (src, jnp.bool_(True)))
    return literals[lit_idx[src]]


_EF_BLOCK = 8192


def _scan_maxkey_rows(k2: jnp.ndarray, v2: jnp.ndarray):
    """Row-wise inclusive max-by-key carry via log-shifted combines.

    Plain contiguous slice+concat shifts only: both lax.associative_scan
    (odd/even strided recursion) and a flat formulation over 64M+
    elements produce programs that OOM-kill the TPU compiler process;
    this Hillis-Steele form compiles to ~log2(block) cheap stages."""
    lb = k2.shape[1]
    s = 1
    while s < lb:
        pk = jnp.concatenate(
            [jnp.full(k2.shape[:1] + (s,), -1, jnp.int32), k2[:, :-s]],
            axis=1)
        pv = jnp.concatenate(
            [jnp.zeros(v2.shape[:1] + (s,), jnp.int32), v2[:, :-s]],
            axis=1)
        take = pk > k2
        k2 = jnp.where(take, pk, k2)
        v2 = jnp.where(take, pv, v2)
        s <<= 1
    return k2, v2


@functools.partial(jax.jit, static_argnames=("out_len",))
def expand_flat(starts: jnp.ndarray, lit_base: jnp.ndarray,
                out_len: int) -> jnp.ndarray:
    """Per-byte literal index from an all-literal piece plan - NO
    gathers: the per-piece constant (lit_base - start) is scattered at
    piece starts and carried forward by a max-by-key carry scan
    (key = piece index, so later pieces win); lit_idx[i] = const + i.

    starts must be strictly ascending with starts[0] == 0 (pad entries
    must use a sentinel >= 2^29 so the scatter drops them); int32 pairs
    keep this x64-free (chunks are < 2^31 bytes).

    The carry runs blocked (within 8K-element blocks, then across block
    summaries) with shift-based scans - see _scan_maxkey_rows.
    """
    t = starts.shape[0]
    starts32 = starts.astype(jnp.int32)
    enc = (lit_base.astype(jnp.int32) - starts32 + out_len)  # >= 0
    nb = -(-out_len // _EF_BLOCK)
    m = nb * _EF_BLOCK
    keys = jnp.full((m,), -1, jnp.int32).at[starts32].max(
        jnp.arange(t, dtype=jnp.int32), mode="drop")
    vals = jnp.zeros((m,), jnp.int32).at[starts32].max(
        enc, mode="drop")

    k2 = keys.reshape(nb, _EF_BLOCK)
    v2 = vals.reshape(nb, _EF_BLOCK)
    ks, vs = _scan_maxkey_rows(k2, v2)
    bk, bv = _scan_maxkey_rows(ks[:, -1][None, :], vs[:, -1][None, :])
    ck = jnp.concatenate([jnp.full((1,), -1, jnp.int32), bk[0, :-1]])
    cv = jnp.concatenate([jnp.zeros((1,), jnp.int32), bv[0, :-1]])
    take = ks >= ck[:, None]
    carried = jnp.where(take, vs, cv[:, None]).reshape(-1)[:out_len]
    pos = jnp.arange(out_len, dtype=jnp.int32)
    return carried - out_len + pos


@jax.jit
def gather_by_sort(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[i] = values[idx[i]] without per-element gathers (~40ns/elem
    on TPU): merge-sort the dense value keys with the request keys,
    carry each key's value forward across its run with one carry scan,
    and unsort.  Two O((L+n) log) device sorts - the same trade the
    matcher makes for permutation inversion.

    Operands are packed to minimize sorted bytes: the value/request
    flag rides in the key's low bit (value rows sort first within a
    key) and the carried byte rides with its own presence flag in one
    int32 (hv = 256 + byte for value rows, 0 for requests), so the
    first sort moves 3 int32 lanes and the carry is a single-array
    last-set-wins scan.  The blocked carry mirrors expand_flat's (a
    flat 64M+ associative_scan OOMs the TPU compiler process).
    """
    vals_i32 = values.astype(jnp.int32)
    l = values.shape[0]
    n = idx.shape[0]
    key = jnp.concatenate([jnp.arange(l, dtype=jnp.int32) * 2,
                           idx.astype(jnp.int32) * 2 + 1])
    hv = jnp.concatenate([vals_i32 + 256, jnp.zeros((n,), jnp.int32)])
    pos = jnp.concatenate([jnp.arange(l, dtype=jnp.int32) + n,
                           jnp.arange(n, dtype=jnp.int32)])
    _, h1, p1 = jax.lax.sort((key, hv, pos), num_keys=1)

    m = l + n
    nb = -(-m // _EF_BLOCK)
    pad = nb * _EF_BLOCK - m
    h2 = jnp.concatenate([h1, jnp.zeros((pad,), jnp.int32)])
    h2 = h2.reshape(nb, _EF_BLOCK)

    def scan_lastset(x):  # Hillis-Steele "last set value wins" carry
        lb = x.shape[1]
        s = 1
        while s < lb:
            p = jnp.concatenate(
                [jnp.zeros(x.shape[:1] + (s,), jnp.int32), x[:, :-s]],
                axis=1)
            x = jnp.where(x >= 256, x, p)
            s <<= 1
        return x

    hs = scan_lastset(h2)
    bc = scan_lastset(hs[:, -1][None, :])
    carry = jnp.concatenate([jnp.zeros((1,), jnp.int32), bc[0, :-1]])
    vv = (jnp.where(hs >= 256, hs, carry[:, None])
          .reshape(-1)[:m] & 255)
    _, out = jax.lax.sort((p1, vv), num_keys=1)
    return out[:n].astype(jnp.uint8)


_COPY_BLOCK = 1 << 20
_COPY_MAX_STEPS = 768


def _bucket_pow2(t: int, lo: int = 256) -> int:
    b = lo
    while b < t:
        b <<= 1
    return b


@functools.partial(jax.jit, static_argnames=("out_len",))
def _replay_copy(src: jnp.ndarray, dst: jnp.ndarray,
                 literals: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Piece-granular replay: every flattened piece is a contiguous
    slice of the literal plane, so a large-piece plan is a short scan
    of fixed-size block copies.  Each step copies a full _COPY_BLOCK;
    tail garbage past a piece's end is overwritten by the next piece's
    blocks (the ordered overlapping-placement idiom of
    ops/streampack.py), and the final spill lands in the buffer's pad
    tail.  Pad steps use dst == out_len (the pad tail) as a no-op."""
    lit = jnp.concatenate(
        [literals, jnp.zeros((_COPY_BLOCK,), literals.dtype)])
    buf0 = jnp.zeros((out_len + _COPY_BLOCK,), jnp.uint8)

    def step(buf, inp):
        s, d = inp
        blk = jax.lax.dynamic_slice(lit, (s,), (_COPY_BLOCK,))
        return jax.lax.dynamic_update_slice(
            buf, blk.astype(jnp.uint8), (d,)), None

    buf, _ = jax.lax.scan(step, buf0, (src, dst))
    return buf[:out_len]


def replay_flat_tpu(plan_len: np.ndarray, plan_lit: np.ndarray,
                    literals_dev: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Device replay of a flattened (all-literal-source) piece plan.

    Plans whose pieces cover the chunk in few 1MB blocks (long matches,
    e.g. VM images / repeated trees - the reference's own headline
    inputs, doc/README.benchmarks) replay as block copies at HBM copy
    speed; fragmented plans fall back to the sort-merge gather.  Both
    paths bucket their shape inputs so jit caches stay warm across
    chunks (data-dependent shapes recompile per value under axon)."""
    plan_len = np.asarray(plan_len, np.int64)
    plan_lit = np.asarray(plan_lit, np.int64)
    # merge pieces whose literal sources are contiguous: token streams
    # chop runs at 0xFFFF (format/tokens.split_long_runs, the
    # reference's put_match length chunking src/rzip.c:211-225), so
    # long literal runs / long matches arrive as thousands of adjacent
    # pieces that replay as one
    if len(plan_len) > 1:
        keep = np.empty(len(plan_len), bool)
        keep[0] = True
        keep[1:] = plan_lit[1:] != plan_lit[:-1] + plan_len[:-1]
        if not keep.all():
            gs = np.nonzero(keep)[0]
            plan_lit = plan_lit[gs]
            csum = np.concatenate([[0], np.cumsum(plan_len)])
            ge = np.concatenate([gs[1:], [len(plan_len)]])
            plan_len = csum[ge] - csum[gs]
    ends = np.cumsum(plan_len)
    starts = (ends - plan_len).astype(np.int64)
    reps = (plan_len + _COPY_BLOCK - 1) // _COPY_BLOCK
    nsteps = int(reps.sum())
    if nsteps <= _COPY_MAX_STEPS:
        idx = np.repeat(np.arange(len(plan_len)), reps)
        k = np.arange(nsteps) - np.repeat(np.cumsum(reps) - reps, reps)
        src = (plan_lit[idx] + k * _COPY_BLOCK).astype(np.int32)
        dst = (starts[idx] + k * _COPY_BLOCK).astype(np.int32)
        nb = _bucket_pow2(nsteps)
        src_p = np.zeros(nb, np.int32)
        dst_p = np.full(nb, out_len, np.int32)
        src_p[:nsteps] = src
        dst_p[:nsteps] = dst
        return _replay_copy(jnp.asarray(src_p), jnp.asarray(dst_p),
                            literals_dev, out_len)
    if jax.devices()[0].platform != "cpu":
        # fragmented plans on real accelerators: the ragged literal-
        # concat kernel (aligned-window DMA + dynamic roll) replays at
        # ~us/fragment; the 2x(n+L)-element sort-merge below costs
        # ~1.2s per 64MB (docs/BENCHMARKS.md) and remains only as the
        # CPU/test path.
        from .replay_ragged import replay_pieces_ragged
        return replay_pieces_ragged(plan_len, plan_lit, literals_dev,
                                    out_len)
    t = len(starts)
    tb = _bucket_pow2(t)
    st = np.full(tb, 1 << 30, np.int64)  # sentinel: dropped by scatter
    st[:t] = starts
    lb = np.zeros(tb, np.int64)
    lb[:t] = plan_lit
    lit_idx = expand_flat(jnp.asarray(st.astype(np.int32)),
                          jnp.asarray(lb.astype(np.int32)), out_len)
    return gather_by_sort(literals_dev, lit_idx)


def replay_tokens_tpu(kinds: np.ndarray, lengths: np.ndarray,
                      dists: np.ndarray, literals: np.ndarray) -> np.ndarray:
    """Full TPU-path replay of one chunk (no cross-chunk history:
    in-archive distances are chunk-local, see models/pipeline.py)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    out_len = int(lengths.sum())
    if out_len == 0:
        return np.zeros(0, dtype=np.uint8)
    ends = np.cumsum(lengths)
    starts = (ends - lengths).astype(np.int32)
    is_match = np.asarray(kinds) == 1
    lit_lens = np.where(is_match, 0, lengths)
    lit_base = (np.cumsum(lit_lens) - lit_lens).astype(np.int32)
    literals = np.asarray(literals, dtype=np.uint8)
    if len(literals) == 0:
        literals = np.zeros(1, dtype=np.uint8)
    src, lit_idx = expand_tokens(
        jnp.asarray(starts), jnp.asarray(is_match),
        jnp.asarray(np.asarray(dists, dtype=np.int64).astype(np.int32)),
        jnp.asarray(lit_base), out_len)
    out = resolve_bytes(src, lit_idx, jnp.asarray(literals))
    return np.asarray(jax.device_get(out))
