"""DMA-planned token replay: rzip decode as batched interval copies.

The reference replays tokens byte-serially through the history fd
(src/runzip.c:129-241).  The sort-merge gather (ops/replay.
gather_by_sort) is the fully-vectorized TPU answer, but its two
~(n+L)-element device sorts cost ~1.2s per 64MB chunk when the piece
plan is fragmented.  This module exploits that the *plan* is host-known
(tokens arrive on host): replay is a sequence of interval copies whose
sources are final by token order, which a Pallas kernel executes as
batched HBM DMAs at memcpy speed.

Plan (host, numpy):
- literal token  -> copy lit[base : base+len)       -> out[start : ...)
- match, dist >= len  -> copy out[start-dist : ...) -> out[start : ...)
- match, dist < len (RLE overlap) -> log-doubling: copies of sizes
  d, 2d, 4d, ... each reading exactly what previous copies wrote
  (source gap == size, so tiles never read their own writes).
- pieces < 32B and RLE periods < 16B resolve to literal-plane indices
  on host (chasing match chains, format guarantees termination) and are
  pre-scattered with one XLA gather+scatter before the kernel runs.

Every copy is tiled into 1-2 power-of-two-class tiles (begin-aligned
tiles + an end-aligned final tile of the same class; the overlap bytes
are written twice from the same source offsets - identical values, so
benign).  Tiles are exact: no garbage tails, so batches of DMAs may
land in any order.  Read-after-write dependencies are fenced
conservatively: a tile whose (out-buffer) source reaches past the
first destination of its 64-tile grid block waits for all outstanding
DMAs first.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

_CLASSES = [1 << b for b in range(4, 21)]   # 16B .. 1MB
_NCLS = len(_CLASSES)
_SLOTS = 64                                 # tiles per grid step
_TINY = 32                                  # pieces below this prescatter


def _jx():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _resolve_lit_idx(q: np.ndarray, starts: np.ndarray,
                     is_match: np.ndarray, dists: np.ndarray,
                     lit_base: np.ndarray) -> np.ndarray:
    """Literal-plane index of chunk byte(s) q by chasing match chains.

    Tokens: starts ascending; a match byte at q inside token t sources
    from q - dists[t]; a literal byte maps to lit_base[t] + offset.
    Chains strictly decrease q, so this terminates (runzip.c's history
    walk, done on indices instead of bytes)."""
    q = np.asarray(q, np.int64).copy()
    out = np.zeros_like(q)
    todo = np.ones(len(q), bool)
    while todo.any():
        t = np.searchsorted(starts, q[todo], side="right") - 1
        m = is_match[t]
        sub = np.where(todo)[0]
        lit_sub = sub[~m]
        tl = t[~m]
        out[lit_sub] = lit_base[tl] + (q[lit_sub] - starts[tl])
        todo[lit_sub] = False
        mt_sub = sub[m]
        q[mt_sub] = q[mt_sub] - dists[t[m]]
    return out


def plan_replay(kinds: np.ndarray, lengths: np.ndarray,
                dists: np.ndarray,
                slots: int = _SLOTS) -> "ReplayPlan | None":
    """Token stream -> tile plan.  Returns None when a match reaches
    before the chunk (cross-chunk history: host path owns it)."""
    lengths = np.asarray(lengths, np.int64)
    kinds = np.asarray(kinds)
    d = np.asarray(dists, np.int64)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    is_match = kinds == 1
    if bool((d[is_match] > starts[is_match]).any()):
        return None
    out_len = int(ends[-1]) if len(ends) else 0
    lit_lens = np.where(is_match, 0, lengths)
    lit_base = np.cumsum(lit_lens) - lit_lens

    # copy records (src, dst, size, buf) ; buf 0 = literal plane, 1 = out
    rec_src, rec_dst, rec_sz, rec_buf = [], [], [], []
    tiny_q = []      # chunk positions to prescatter (literal-resolved)

    # literals: vectorized split into big copies and tiny prescatter
    lit_idx = np.where(~is_match)[0]
    if len(lit_idx):
        ls, ll, lb = starts[lit_idx], lengths[lit_idx], lit_base[lit_idx]
        big = ll >= _TINY
        rec_src.append(lb[big])
        rec_dst.append(ls[big])
        rec_sz.append(ll[big])
        rec_buf.append(np.zeros(int(big.sum()), np.int64))
        for s, l in zip(ls[~big], ll[~big]):
            tiny_q.extend(range(int(s), int(s + l)))

    # matches
    mt = np.where(is_match)[0]
    if len(mt):
        ms, ml, md = starts[mt], lengths[mt], d[mt]
        plain = md >= ml
        rec_src.append(ms[plain] - md[plain])
        rec_dst.append(ms[plain])
        rec_sz.append(ml[plain])
        rec_buf.append(np.ones(int(plain.sum()), np.int64))
        for s, l, dd in zip(ms[~plain], ml[~plain], md[~plain]):
            s, l, dd = int(s), int(l), int(dd)
            if dd < 16:
                # seed the period with a prescattered head whose size is
                # a MULTIPLE OF dd (every copy distance below must be,
                # or the period breaks) and >= 32
                head = min(l, dd * (-(-32 // dd)))
                tiny_q.extend(range(s, s + head))
                done = head
            else:
                done = 0
            # doubling from the final region [s - dd, s + done); every
            # copy's src->dst distance is `avail`, a multiple of dd
            b = s - dd
            avail = dd + done
            while done < l:
                step = min(avail, l - done)
                if step < 16:
                    # crumb: end-aligned 16B tile at distance k*dd >= 16
                    back = dd * (-(-16 // dd))
                    rec_src.append(np.array([s + l - 16 - back]))
                    rec_dst.append(np.array([s + l - 16]))
                    rec_sz.append(np.array([16]))
                    rec_buf.append(np.array([1]))
                    break
                rec_src.append(np.array([b]))
                rec_dst.append(np.array([b + avail]))
                rec_sz.append(np.array([step]))
                rec_buf.append(np.array([1]))
                done += step
                avail += step

    if rec_src:
        src = np.concatenate(rec_src).astype(np.int64)
        dst = np.concatenate(rec_dst).astype(np.int64)
        sz = np.concatenate(rec_sz).astype(np.int64)
        buf = np.concatenate(rec_buf).astype(np.int64)
        order = np.argsort(dst, kind="stable")
        src, dst, sz, buf = src[order], dst[order], sz[order], buf[order]
    else:
        src = dst = sz = buf = np.zeros(0, np.int64)

    # tile each copy: g = largest class <= size; floor(size/g) begin
    # tiles + an end-aligned tile of the same class when size % g != 0
    t_src, t_dst, t_cls, t_buf = [], [], [], []
    if len(sz):
        g_log = np.minimum(np.int64(np.log2(np.maximum(sz, 16))), 20)
        g = (np.int64(1) << g_log)
        nb = sz // g
        # copies over 1MB need several begin tiles; expand via repeat
        reps = nb.astype(np.int64)
        idx = np.repeat(np.arange(len(sz)), reps)
        k = np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps, reps)
        t_src.append(src[idx] + k * g[idx])
        t_dst.append(dst[idx] + k * g[idx])
        t_cls.append(g_log[idx] - 4)
        t_buf.append(buf[idx])
        tail = (sz % g) != 0
        t_src.append(src[tail] + sz[tail] - g[tail])
        t_dst.append(dst[tail] + sz[tail] - g[tail])
        t_cls.append(g_log[tail] - 4)
        t_buf.append(buf[tail])
        ts = np.concatenate(t_src)
        td = np.concatenate(t_dst)
        tc = np.concatenate(t_cls)
        tb = np.concatenate(t_buf)
        order = np.argsort(td, kind="stable")
        ts, td, tc, tb = ts[order], td[order], tc[order], tb[order]
    else:
        ts = td = tc = tb = np.zeros(0, np.int64)

    step_lo = _plan_steps(ts, td, tc, tb, slots)

    tiny_q = np.asarray(sorted(set(tiny_q)), np.int64)
    tiny_lit = _resolve_lit_idx(tiny_q, starts, is_match, d, lit_base) \
        if len(tiny_q) else np.zeros(0, np.int64)
    return ReplayPlan(out_len, int(lit_base[-1] + lit_lens[-1]) if
                      len(lit_lens) else 0, ts, td, tc, tb, step_lo,
                      tiny_q, tiny_lit, slots)


def _plan_steps(ts, td, tc, tb, slots: int = _SLOTS) -> np.ndarray:
    """Chop the dst-sorted tile list into steps of <= _SLOTS tiles whose
    DMAs may land in any order: a step ends before the first tile whose
    out-buffer read reaches at or past the step's first dst (all step
    writes are >= that).  A tile conflicting immediately runs solo (its
    only same-step writer would be itself, and exact tiles never
    self-overlap).  Returns step starts + final bound."""
    n_t = len(ts)
    if n_t == 0:
        return np.zeros(1, np.int64)
    sz = np.array([_CLASSES[c] for c in tc], np.int64)
    read_end = np.where(tb == 1, ts + sz, np.int64(-1))
    bounds = [0]
    i = 0
    while i < n_t:
        f = td[i]
        j_max = min(i + slots, n_t)
        w = read_end[i + 1:j_max] > f
        if read_end[i] > f:
            j = i + 1
        else:
            nz = np.flatnonzero(w)
            j = (i + 1 + nz[0]) if len(nz) else j_max
        bounds.append(j)
        i = j
    return np.asarray(bounds, np.int64)


class ReplayPlan:
    def __init__(self, out_len, lit_len, src, dst, cls, buf, step_lo,
                 tiny_q, tiny_lit, slots=_SLOTS):
        self.out_len = out_len
        self.lit_len = lit_len
        self.src = src
        self.dst = dst
        self.cls = cls
        self.buf = buf
        self.step_lo = step_lo          # (n_steps + 1,) tile offsets
        self.tiny_q = tiny_q
        self.tiny_lit = tiny_lit
        self.n_tiles = len(src)
        self.n_steps = len(step_lo) - 1
        self.slots = slots


def _bucket_pow2(t: int, lo: int = 256) -> int:
    b = lo
    while b < t:
        b <<= 1
    return b


def _make_replay_kernel(lit_pad: int, out_pad: int, slots: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(lo_ref, cls_ref, buf_ref, src_ref, dst_ref,
               lit_ref, outbuf_ref, o_ref, sems):
        del outbuf_ref  # aliased with o_ref; all access goes through o
        b = pl.program_id(0)
        lo = lo_ref[b]
        hi = lo_ref[b + 1]

        def mk_copy(size, bf, s, dd, slot):
            # classes larger than a buffer can never be selected for it
            # (copy size <= buffer length); keep untaken switch branches
            # well-formed by aliasing them to a minimal copy
            def lit_branch():
                sz = size if size <= lit_pad else 16
                return pltpu.make_async_copy(
                    lit_ref.at[pl.ds(s, sz)],
                    o_ref.at[pl.ds(dd, sz)], sems.at[slot])

            def out_branch():
                sz = size if size <= out_pad else 16
                return pltpu.make_async_copy(
                    o_ref.at[pl.ds(s, sz)],
                    o_ref.at[pl.ds(dd, sz)], sems.at[slot])
            return lit_branch, out_branch

        # phase 1: issue every live slot's DMA (unordered within the
        # step - the planner guarantees independence; dependent tiles
        # arrive as singleton steps)
        issued = []
        for slot in range(slots):
            j = lo + slot
            live = (j < hi)
            jc = jnp.where(live, j, lo)
            c = cls_ref[jc]
            bf = buf_ref[jc]
            s = src_ref[jc]
            dd = dst_ref[jc]
            issued.append((live, c, bf, s, dd))

            @pl.when(live)
            def _():
                def mk(size):
                    lb, ob = mk_copy(size, bf, s, dd, slot)

                    def br():
                        jax.lax.cond(bf == 0,
                                     lambda: lb().start(),
                                     lambda: ob().start())
                    return br
                jax.lax.switch(c, [mk(sz) for sz in _CLASSES])

        # phase 2: drain, per slot (each sem saw exactly one DMA)
        for slot, (live, c, bf, s, dd) in enumerate(issued):
            @pl.when(live)
            def _():
                def mk(size):
                    lb, ob = mk_copy(size, bf, s, dd, slot)

                    def br():
                        jax.lax.cond(bf == 0,
                                     lambda: lb().wait(),
                                     lambda: ob().wait())
                    return br
                jax.lax.switch(c, [mk(sz) for sz in _CLASSES])

    return kernel


@functools.lru_cache(maxsize=None)
def _replay_call(n_steps: int, n_tiles_b: int, lit_pad: int,
                 out_pad: int, slots: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((slots,))],
    )

    @jax.jit
    def call(lo_a, cls_a, buf_a, src_a, dst_a, lit, outbuf):
        return pl.pallas_call(
            _make_replay_kernel(lit_pad, out_pad, slots),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_pad,), jnp.uint8),
            input_output_aliases={6: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(lo_a, cls_a, buf_a, src_a, dst_a, lit, outbuf)

    return call


def replay_plan_device(plan: ReplayPlan, literals_dev, interpret=False):
    """Execute a ReplayPlan against a device-resident literal plane.
    Returns the (out_len,) uint8 chunk on device."""
    jax, jnp = _jx()
    out_pad = _bucket_pow2(plan.out_len, 1 << 12)
    lit_pad = _bucket_pow2(max(int(literals_dev.shape[0]), 1), 1 << 12)
    lit = literals_dev
    if int(lit.shape[0]) != lit_pad:
        lit = jnp.concatenate(
            [lit, jnp.zeros((lit_pad - int(lit.shape[0]),), jnp.uint8)])
    outbuf = jnp.zeros((out_pad,), jnp.uint8)
    if len(plan.tiny_q):
        vals = lit[jnp.asarray(plan.tiny_lit, jnp.int32)]
        outbuf = outbuf.at[jnp.asarray(plan.tiny_q, jnp.int32)].set(vals)
    nb = _bucket_pow2(max(plan.n_tiles, 1))
    cls_a = np.zeros(nb, np.int32)
    buf_a = np.zeros(nb, np.int32)
    src_a = np.zeros(nb, np.int32)
    dst_a = np.zeros(nb, np.int32)
    cls_a[:plan.n_tiles] = plan.cls
    buf_a[:plan.n_tiles] = plan.buf
    src_a[:plan.n_tiles] = plan.src
    dst_a[:plan.n_tiles] = plan.dst
    ns = _bucket_pow2(max(plan.n_steps, 1), 64)
    lo_a = np.full(ns + 1, plan.n_tiles, np.int32)
    lo_a[:len(plan.step_lo)] = plan.step_lo
    call = _replay_call(ns, nb, lit_pad, out_pad, plan.slots,
                        interpret)
    out = call(jnp.asarray(lo_a), jnp.asarray(cls_a), jnp.asarray(buf_a),
               jnp.asarray(src_a), jnp.asarray(dst_a), lit, outbuf)
    return out[:plan.out_len]


def replay_tokens_dma(kinds, lengths, dists, literals_dev,
                      interpret=False):
    """Token-stream replay via the DMA kernel; None when cross-chunk.

    Interpret mode (CPU tests) uses 8-slot steps: the kernel's traced
    slot x size-class switch structure dominates interpret startup."""
    plan = plan_replay(kinds, lengths, dists,
                      slots=8 if interpret else _SLOTS)
    if plan is None:
        return None
    if plan.out_len == 0:
        import jax.numpy as jnp
        return jnp.zeros((0,), jnp.uint8)
    return replay_plan_device(plan, literals_dev, interpret=interpret)
