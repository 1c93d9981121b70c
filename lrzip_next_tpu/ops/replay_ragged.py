"""Ragged literal-concat replay: rzip decode as one aligned-DMA kernel.

The reference replays tokens byte-serially through the history fd
(src/runzip.c:129-241).  The native runtime flattens match chains at
token granularity (runtime/csrc/hostops.cpp flatten_replay), after
which decode is exactly

    out = lit[p0 : p0+l0] || lit[p1 : p1+l1] || ...

a concatenation of ~1e5 variable-length slices of the (read-only)
decoded literal plane.  That structure removes every read-after-write
hazard the interval-copy formulation had (ops/replay_dma, whose
byte-granular HBM DMAs Mosaic cannot lower): all sources come from one
immutable buffer, all destinations are disjoint, so fragments execute
in ANY order with NO fencing.

The kernel avoids byte-granular addressing entirely:

- the literal plane is staged as int32-per-byte rows of 1024
  (lead/tail padded), so every DMA is a whole-row window at a dynamic
  8-aligned row offset - Mosaic requires dim-0 tile indices divisible
  by the (8, 128) tiling (hardware-verified: arbitrary dynamic row
  starts refuse to compile, 8-aligned ones run);
- output is produced in 8-row (8192-byte) cells via the regular
  blocked out_spec (8-row blocks keep dim-0 tile indices aligned);
- per fragment, the kernel DMAs a 16-row window at the 8-aligned floor
  of the source row, shifts rows in-register (log row-rotate: 3 static
  selects), rotates lanes by the byte misalignment with a dynamic lane
  roll (hardware-verified), and mask-merges the fragment's byte span
  into the cell accumulator.  One uniform code path: no size classes,
  no switch, any fragment length from 1 to 8192 bytes.

Fragments are host-planned (numpy, vectorized): pieces are cut at cell
boundaries so each fragment lands in exactly one cell; per-cell
fragment ranges ride in scalar-prefetch SMEM; DMAs double-buffer so
the window fetch of fragment i+1 overlaps the merge of fragment i.

Cost per fragment is ~36KB of DMA + ~70KB of VPU traffic regardless of
length, so a 64MB chunk with ~1.2e5 fragments replays in tens of ms -
the role the reference fills with its ASM decoder hot loop
(ASM/x86/LzmaDecOpt.asm, FEATURES:10 "up to 40% faster").
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

CELL = 8192                 # bytes per output cell (8 rows of 1024)
ROWS = CELL // 1024         # 8
WIN = ROWS + 1              # source rows a fragment actually needs
WINDMA = 16                 # DMA window rows (8-aligned start + WIN)
LEAD_ROWS = ROWS            # literal-plane lead padding (base >= 1)
TRAIL_ROWS = WINDMA + 1     # window overrun room past the last byte
_MAX_SMEM_FRAGS = 1 << 15   # per-call cap on prefetch rows (~256KB)


def _jx():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _bucket_pow2(t: int, lo: int = 256) -> int:
    b = lo
    while b < t:
        b <<= 1
    return b


def merge_contiguous(plan_len: np.ndarray, plan_lit: np.ndarray
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Merge pieces whose literal sources are adjacent (long runs are
    chopped at 0xFFFF by the token format - format/tokens.
    split_long_runs, the reference's put_match chunking
    src/rzip.c:211-225 - and arrive as thousands of adjacent pieces)."""
    plan_len = np.asarray(plan_len, np.int64)
    plan_lit = np.asarray(plan_lit, np.int64)
    if len(plan_len) <= 1:
        return plan_len, plan_lit
    keep = np.empty(len(plan_len), bool)
    keep[0] = True
    keep[1:] = plan_lit[1:] != plan_lit[:-1] + plan_len[:-1]
    if keep.all():
        return plan_len, plan_lit
    gs = np.nonzero(keep)[0]
    csum = np.concatenate([[0], np.cumsum(plan_len)])
    ge = np.concatenate([gs[1:], [len(plan_len)]])
    return csum[ge] - csum[gs], plan_lit[gs]


class RaggedPlan:
    """Host-side fragment plan for one chunk (possibly several kernel
    calls when the fragment count exceeds the SMEM prefetch budget)."""

    def __init__(self, out_len: int, lit_len: int, calls):
        self.out_len = out_len
        self.lit_len = lit_len
        self.calls = calls      # list of (cell0, ncells, base, meta, lo)
        self.n_frags = sum(len(c[2]) for c in calls)


def plan_ragged(plan_len: np.ndarray, plan_lit: np.ndarray,
                out_len: int, lit_len: int) -> RaggedPlan:
    """Piece plan -> per-cell fragment plan.

    Each piece (dst=cumsum, src=plan_lit, len) is cut at CELL
    boundaries; a fragment's record is two int32s:
      base = src - dlo + LEAD_ROWS*1024   (lit byte of the cell's p=0)
      meta = dlo | (len-1) << 13          (13+13 bits, CELL=8192)
    plus the per-cell fragment-range array lo (hi_j = lo_{j+1}:
    fragments are dst-sorted, one cell each).
    """
    plan_len, plan_lit = merge_contiguous(plan_len, plan_lit)
    nz = plan_len > 0
    if not nz.all():
        plan_len, plan_lit = plan_len[nz], plan_lit[nz]
    ends = np.cumsum(plan_len)
    dst = ends - plan_len
    # cut at cell boundaries: piece i -> 1 + #interior boundaries frags
    nf = ((ends - 1) >> 13) - (dst >> 13) + 1
    total = int(nf.sum())
    idx = np.repeat(np.arange(len(nf)), nf)
    k = np.arange(total) - np.repeat(np.cumsum(nf) - nf, nf)
    cut = ((dst[idx] >> 13) + k) << 13          # cell start of frag k
    f_dst = np.maximum(dst[idx], cut)
    f_end = np.minimum(ends[idx], cut + CELL)
    f_len = f_end - f_dst
    f_src = plan_lit[idx] + (f_dst - dst[idx])
    cell = f_dst >> 13
    dlo = f_dst & (CELL - 1)
    base = (f_src - dlo + LEAD_ROWS * 1024).astype(np.int32)
    meta = (dlo | (f_len - 1) << 13).astype(np.int32)

    ncells_total = -(-max(out_len, 1) // CELL)
    calls = []
    c0 = 0
    while c0 < ncells_total:
        # greedy: longest run of cells whose frags fit the SMEM budget
        f0 = int(np.searchsorted(cell, c0))
        fmax = min(f0 + _MAX_SMEM_FRAGS, total)
        c1 = ncells_total if fmax >= total else int(cell[fmax])
        if c1 <= c0:      # one cell alone overflows (can't happen:
            c1 = c0 + 1   # <= 8192 frags/cell < _MAX_SMEM_FRAGS)
        f1 = int(np.searchsorted(cell, c1))
        nc = c1 - c0
        lo = np.searchsorted(cell[f0:f1], np.arange(c0, c1 + 1)
                             ).astype(np.int32)
        calls.append((c0, nc, base[f0:f1], meta[f0:f1], lo))
        c0 = c1
    return RaggedPlan(out_len, lit_len, calls)


@functools.lru_cache(maxsize=None)
def _stage_lit32_fn(n_in: int, rows: int):
    jax, jnp = _jx()

    @jax.jit
    def fn(lit_dev):
        pad = rows * 1024 - n_in
        if pad < 0:
            # caller passed a plane padded past the staged rows (rANS
            # bucket padding); the tail holds no plan sources
            flat = lit_dev[:rows * 1024]
        elif pad == 0:
            flat = lit_dev
        else:
            flat = jnp.concatenate(
                [lit_dev, jnp.zeros((pad,), jnp.uint8)])
        body = flat.reshape(rows, 1024).astype(jnp.int32)
        lead = jnp.zeros((LEAD_ROWS, 1024), jnp.int32)
        trail = jnp.zeros((TRAIL_ROWS, 1024), jnp.int32)
        return jnp.concatenate([lead, body, trail], axis=0)

    return fn


def _stage_lit32(lit_dev, lit_len: int):
    """uint8 literal plane -> lead/tail-padded (rows, 1024) int32
    (one fused dispatch: eager op chains pay per-dispatch latency).

    Rows are padded up to a pow2 bucket (1MB steps above 8MB) so the
    staging jit AND the ragged kernel cache stay warm across chunks
    with varying literal sizes - each distinct row count would
    otherwise trigger a fresh 60-280s remote Mosaic compile under the
    axon backend (advisor finding, round 4)."""
    rows = -(-max(lit_len, 1) // 1024)
    if rows > 8192:
        rows_b = -(-rows // 1024) * 1024
    else:
        rows_b = _bucket_pow2(rows, 8)
    return _stage_lit32_fn(int(lit_dev.shape[0]), rows_b)(lit_dev)


def _make_kernel(nrows_lit: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(lo_ref, base_ref, meta_ref, lit_ref, out_ref,
               scratch, sems):
        j = pl.program_id(0)
        lo = lo_ref[j]
        hi = lo_ref[j + 1]
        out_ref[:] = jnp.zeros((ROWS, 1024), jnp.int32)

        def window(i, slot):
            # Mosaic requires dim-0 DMA starts divisible by the (8,128)
            # tiling: fetch WINDMA rows from the 8-aligned floor; the
            # residue rows shift off in-register below
            r0a = pl.multiple_of((base_ref[i] >> 13) << 3, 8)
            return pltpu.make_async_copy(
                lit_ref.at[pl.ds(r0a, WINDMA), :], scratch.at[slot],
                sems.at[slot])

        @pl.when(lo < hi)
        def _():
            window(lo, 0).start()

        col = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1024), 1)
        pos = col + jax.lax.broadcasted_iota(
            jnp.int32, (ROWS, 1024), 0) * 1024

        def body(i, _):
            slot = jax.lax.rem(i - lo, 2)

            @pl.when(i + 1 < hi)
            def _():
                window(i + 1, 1 - slot).start()

            window(i, slot).wait()
            b = base_ref[i]
            rsub = (b >> 10) & 7
            roff = b & 1023
            m = meta_ref[i]
            dlo = m & (CELL - 1)
            flen = ((m >> 13) & (CELL - 1)) + 1
            z = pltpu.roll(scratch[slot], shift=WINDMA - rsub, axis=0)
            y = pltpu.roll(z[:WIN], shift=1024 - roff, axis=1)
            g = jnp.where(col < 1024 - roff, y[:ROWS], y[1:WIN])
            mask = (pos >= dlo) & (pos < dlo + flen)
            out_ref[:] = jnp.where(mask, g, out_ref[:])
            return 0

        jax.lax.fori_loop(lo, hi, body, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _ragged_call(ncells: int, nf_b: int, nrows_lit: int,
                 interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ncells,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ROWS, 1024), lambda j, *refs: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, WINDMA, 1024), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    @jax.jit
    def call(lo_a, base_a, meta_a, lit32):
        return pl.pallas_call(
            _make_kernel(nrows_lit),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ncells * ROWS, 1024),
                                           jnp.int32),
            interpret=interpret,
        )(lo_a, base_a, meta_a, lit32)

    return call


def replay_pieces_ragged(plan_len: np.ndarray, plan_lit: np.ndarray,
                         lit_dev, out_len: int,
                         interpret: bool = False,
                         as_rows: bool = False,
                         checked: bool = False):
    """Execute a flattened piece plan against a device-resident uint8
    literal plane.  Returns the (out_len,) uint8 chunk on device, or
    (with ``as_rows``) the raw (ncells*ROWS, 1024) int32 cell rows for
    the layered passes to build on.  ``checked`` skips the source-
    bounds guard (the layered driver validates its real pieces itself
    and its dummy placeholders read only the lead padding)."""
    jax, jnp = _jx()
    lit_len = int(lit_dev.shape[0])
    pl_ = np.asarray(plan_len, np.int64)
    ps_ = np.asarray(plan_lit, np.int64)
    if not checked and len(pl_) and (int((ps_ + pl_).max()) > lit_len
                                     or int(ps_.min()) < 0):
        # corrupt plan: sources past the literal plane would replay
        # pad zeros as silently wrong bytes
        raise ValueError("literal stream length mismatch")
    pl_, ps_ = merge_contiguous(pl_, ps_)
    nz = pl_ > 0
    if not nz.all():
        pl_, ps_ = pl_[nz], ps_[nz]
    ends = np.cumsum(pl_)
    dst = ends - pl_
    lit32 = _stage_lit32(lit_dev, lit_len)
    nrows_lit = int(lit32.shape[0])
    ncells_total = -(-max(out_len, 1) // CELL)
    small = pl_ <= _SHORT_LEN
    long_m = ~small
    outs = []
    for c0, nc, base, meta, lo in _plan_frags(
            dst[long_m], ps_[long_m], pl_[long_m], ncells_total,
            LEAD_ROWS):
        nf = len(base)
        nf_b = _bucket_pow2(max(nf, 1))
        nc_b = _bucket_pow2(max(nc, 1), 64)
        base_a = np.zeros(nf_b, np.int32)
        meta_a = np.zeros(nf_b, np.int32)
        base_a[:nf] = base
        meta_a[:nf] = meta
        lo_a = np.full(nc_b + 1, nf, np.int32)
        lo_a[:len(lo)] = lo
        call = _ragged_call(nc_b, nf_b, nrows_lit, interpret)
        out32 = call(jnp.asarray(lo_a), jnp.asarray(base_a),
                     jnp.asarray(meta_a), lit32)
        outs.append(out32[:nc * ROWS])
    full = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    if small.any():
        full = _small_pass(full, dst[small], ps_[small], pl_[small],
                           lit32, out_len, interpret)
    if as_rows:
        return full
    return full.astype(jnp.uint8).reshape(-1)[:out_len]


def _plan_frags(dst: np.ndarray, src: np.ndarray, length: np.ndarray,
                ncells_total: int, lead_rows: int,
                cell_bits: int = 13):
    """Explicit-destination fragment plan (the layered passes' form of
    plan_ragged): cut (dst, src, len) pieces at cell boundaries
    (2^cell_bits bytes) and bucket them per destination cell.  Returns
    the per-call tuples plan_ragged produces; ``lead_rows`` is the
    source plane's lead padding in 1024-byte rows.  cell_bits=10 plans
    for the small-cell (128-column) kernel: dlo and len pack in 10
    bits each."""
    cb = cell_bits
    cell_bytes = 1 << cb
    order = np.argsort(dst, kind="stable")
    dst, src, length = dst[order], src[order], length[order]
    ends = dst + length
    nf = ((ends - 1) >> cb) - (dst >> cb) + 1
    total = int(nf.sum())
    idx = np.repeat(np.arange(len(nf)), nf)
    k = np.arange(total) - np.repeat(np.cumsum(nf) - nf, nf)
    cut = ((dst[idx] >> cb) + k) << cb
    f_dst = np.maximum(dst[idx], cut)
    f_end = np.minimum(ends[idx], cut + cell_bytes)
    f_len = f_end - f_dst
    f_src = src[idx] + (f_dst - dst[idx])
    cell = f_dst >> cb
    dlo = f_dst & (cell_bytes - 1)
    base = (f_src - dlo + lead_rows * 1024).astype(np.int32)
    meta = (dlo | (f_len - 1) << cb).astype(np.int32)

    calls = []
    c0 = 0
    while c0 < ncells_total:
        f0 = int(np.searchsorted(cell, c0))
        fmax = min(f0 + _MAX_SMEM_FRAGS, total)
        c1 = ncells_total if fmax >= total else int(cell[fmax])
        if c1 <= c0:
            c1 = c0 + 1
        f1 = int(np.searchsorted(cell, c1))
        nc = c1 - c0
        lo = np.searchsorted(cell[f0:f1], np.arange(c0, c1 + 1)
                             ).astype(np.int32)
        calls.append((c0, nc, base[f0:f1], meta[f0:f1], lo))
        c0 = c1
    return calls


def _make_kernel_prior():
    """Layered-pass kernel: like _make_kernel, but the source plane is
    the PREVIOUS pass's lead-padded output, and each cell initializes
    from its own prior contents (so untouched cells copy through and
    partially-covered cells keep earlier bytes) instead of zeros."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(cell0_ref, lo_ref, base_ref, meta_ref, prior_ref,
               out_ref, scratch, init_s, sems, sem_i):
        j = pl.program_id(0)
        lo = lo_ref[j]
        hi = lo_ref[j + 1]
        # absolute cell = cell0 + j (multi-call ranges start at cell0);
        # bucket-padded tail cells CLAMP to the last valid window (the
        # pow2 cell bucket can overshoot by up to the cell count, far
        # past any fixed safety trail - an unclamped read crashes the
        # device with FAILED_PRECONDITION)
        r_init = pl.multiple_of(jnp.minimum(
            LEAD_ROWS + (cell0_ref[0] + j) * ROWS,
            cell0_ref[1]), 8)
        cp = pltpu.make_async_copy(
            prior_ref.at[pl.ds(r_init, ROWS), :], init_s, sem_i)
        cp.start()
        cp.wait()
        out_ref[:] = init_s[:]

        def window(i, slot):
            r0a = pl.multiple_of((base_ref[i] >> 13) << 3, 8)
            return pltpu.make_async_copy(
                prior_ref.at[pl.ds(r0a, WINDMA), :], scratch.at[slot],
                sems.at[slot])

        @pl.when(lo < hi)
        def _():
            window(lo, 0).start()

        col = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1024), 1)
        pos = col + jax.lax.broadcasted_iota(
            jnp.int32, (ROWS, 1024), 0) * 1024

        def body(i, _):
            slot = jax.lax.rem(i - lo, 2)

            @pl.when(i + 1 < hi)
            def _():
                window(i + 1, 1 - slot).start()

            window(i, slot).wait()
            b = base_ref[i]
            rsub = (b >> 10) & 7
            roff = b & 1023
            m = meta_ref[i]
            dlo = m & (CELL - 1)
            flen = ((m >> 13) & (CELL - 1)) + 1
            z = pltpu.roll(scratch[slot], shift=WINDMA - rsub, axis=0)
            y = pltpu.roll(z[:WIN], shift=1024 - roff, axis=1)
            g = jnp.where(col < 1024 - roff, y[:ROWS], y[1:WIN])
            mask = (pos >= dlo) & (pos < dlo + flen)
            out_ref[:] = jnp.where(mask, g, out_ref[:])
            return 0

        jax.lax.fori_loop(lo, hi, body, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _layered_call(ncells: int, nf_b: int, nrows_prior: int,
                  interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ncells,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((ROWS, 1024),
                               lambda j, *refs: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, WINDMA, 1024), jnp.int32),
            pltpu.VMEM((ROWS, 1024), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    @jax.jit
    def call(cell0_a, lo_a, base_a, meta_a, prior32):
        return pl.pallas_call(
            _make_kernel_prior(),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ncells * ROWS, 1024),
                                           jnp.int32),
            interpret=interpret,
        )(cell0_a, lo_a, base_a, meta_a, prior32)

    return call


# Small-cell pass: fragments <= _SHORT_LEN bytes replay through a
# 128-column variant of the kernel - 1KB output cells, 8KB source
# windows - cutting the per-fragment DMA and VPU traffic 8x.  The
# fragmented regions of a dense token stream are made of exactly such
# pieces (median ~120B at 64MB), and the kernel cost is per-FRAGMENT,
# not per-byte, so this is where the replay time lives.
_SHORT_LEN = 512
ROWS_S = 8            # rows of 128 per small cell (1KB)
WIN_S = ROWS_S + 1
WINDMA_S = 16


def _make_kernel_small():
    """128-column pass over the big kernel's output, TOUCHED CELLS
    ONLY: the grid enumerates just the 1KB cells that contain short
    fragments (a compact prefetched cell-index array drives the out
    block index), and the output buffer ALIASES the prior buffer
    (input_output_aliases) so untouched cells keep their content
    without a pass-through copy.  Measured at 64MB: 20.7K of 65.5K
    cells touched - the dense grid spent 2/3 of its steps on
    copy-through inits.  Each touched cell still initializes from its
    own rows of the prior buffer (reads only its own cell, so the
    aliasing is hazard-free) and mask-merges its short fragments from
    8KB windows of the lead-padded literal plane (also viewed in
    128-column rows; byte offsets are layout-independent)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(lim_ref, cells_ref, lo_ref, base_ref, meta_ref, lit_ref,
               prior_ref, out_ref, scratch, init_s, sems, sem_i):
        j = pl.program_id(0)
        ca = cells_ref[j]
        lo = lo_ref[j]
        hi = lo_ref[j + 1]
        r_init = pl.multiple_of(jnp.minimum(
            64 + ca * ROWS_S, lim_ref[0]), 8)
        cp = pltpu.make_async_copy(
            prior_ref.at[pl.ds(r_init, ROWS_S), :], init_s, sem_i)
        cp.start()
        cp.wait()
        out_ref[:] = init_s[:]

        def window(i, slot):
            r0a = pl.multiple_of((base_ref[i] >> 10) << 3, 8)
            return pltpu.make_async_copy(
                lit_ref.at[pl.ds(r0a, WINDMA_S), :], scratch.at[slot],
                sems.at[slot])

        @pl.when(lo < hi)
        def _():
            window(lo, 0).start()

        col = jax.lax.broadcasted_iota(jnp.int32, (ROWS_S, 128), 1)
        pos = col + jax.lax.broadcasted_iota(
            jnp.int32, (ROWS_S, 128), 0) * 128

        def body(i, _):
            slot = jax.lax.rem(i - lo, 2)

            @pl.when(i + 1 < hi)
            def _():
                window(i + 1, 1 - slot).start()

            window(i, slot).wait()
            b = base_ref[i]
            rsub = (b >> 7) & 7
            roff = b & 127
            m = meta_ref[i]
            dlo = m & 1023
            flen = ((m >> 10) & 1023) + 1
            z = pltpu.roll(scratch[slot], shift=WINDMA_S - rsub, axis=0)
            y = pltpu.roll(z[:WIN_S], shift=128 - roff, axis=1)
            g = jnp.where(col < 128 - roff, y[:ROWS_S], y[1:WIN_S])
            mask = (pos >= dlo) & (pos < dlo + flen)
            out_ref[:] = jnp.where(mask, g, out_ref[:])
            return 0

        jax.lax.fori_loop(lo, hi, body, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _small_call(ntouched: int, nf_b: int, nrows128: int, nprior: int,
                interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ntouched,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        # out block = the touched cell's own rows of the prior-shaped
        # buffer (64-row lead = 8 blocks)
        out_specs=pl.BlockSpec((ROWS_S, 128),
                               lambda j, lim, cells, *_:
                               (8 + cells[j], 0)),
        scratch_shapes=[
            pltpu.VMEM((2, WINDMA_S, 128), jnp.int32),
            pltpu.VMEM((ROWS_S, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    @jax.jit
    def call(lim_a, cells_a, lo_a, base_a, meta_a, lit128, prior128):
        # index 6 = prior128 (5 scalar-prefetch args + lit128 before
        # it); aliasing donates its pages so unwritten (untouched)
        # cells keep their bytes
        return pl.pallas_call(
            _make_kernel_small(),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nprior, 128), jnp.int32),
            input_output_aliases={6: 0},
            interpret=interpret,
        )(lim_a, cells_a, lo_a, base_a, meta_a, lit128, prior128)

    return call


@functools.lru_cache(maxsize=None)
def _to128_fn(rows: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fn(out32):
        lead = jnp.zeros((64, 128), jnp.int32)
        trail = jnp.zeros(((TRAIL_ROWS + 512) * 8, 128), jnp.int32)
        return jnp.concatenate(
            [lead, out32.reshape(rows * 8, 128), trail], axis=0)

    return fn


def _small_pass(out32_flat, dst, src, length, lit32, out_len: int,
                interpret: bool):
    """Merge short literal-sourced pieces into the big kernel's output
    via the touched-cells-only 128-column kernel.  Returns the updated
    (rows, 1024) int32 cell rows."""
    jax, jnp = _jx()
    rows = int(out32_flat.shape[0])
    nrows_lit = int(lit32.shape[0])
    lit128 = lit32.reshape(nrows_lit * 8, 128)
    out128 = _to128_fn(rows)(out32_flat)
    ncells_s = -(-max(out_len, 1) // 1024)
    rmax = (int(out128.shape[0]) - WINDMA_S) // 8 * 8
    # grid-bucket padding cell: first trail cell past the output - its
    # rows are zeros, so duplicate pad steps read and re-write zeros
    ca_pad = ncells_s + 8
    did = False
    for c0, nc, base, meta, lo in _plan_frags(
            dst, src, length, ncells_s, LEAD_ROWS, cell_bits=10):
        lo = np.asarray(lo, np.int64)
        touched = np.nonzero(np.diff(lo) > 0)[0]
        nt = len(touched)
        if nt == 0:
            continue
        cells_abs = (c0 + touched).astype(np.int32)
        lo_c = np.append(lo[touched], lo[touched[-1] + 1])
        nf = len(base)
        nf_b = _bucket_pow2(max(nf, 1))
        nt_b = _bucket_pow2(nt, 64)
        base_a = np.zeros(nf_b, np.int32)
        meta_a = np.zeros(nf_b, np.int32)
        base_a[:nf] = base
        meta_a[:nf] = meta
        cells_a = np.full(nt_b, ca_pad, np.int32)
        cells_a[:nt] = cells_abs
        lo_a = np.full(nt_b + 1, lo_c[-1], np.int32)
        lo_a[:nt + 1] = lo_c
        call = _small_call(nt_b, nf_b, int(lit128.shape[0]),
                           int(out128.shape[0]), interpret)
        out128 = call(jnp.asarray(np.array([rmax], np.int32)),
                      jnp.asarray(cells_a), jnp.asarray(lo_a),
                      jnp.asarray(base_a), jnp.asarray(meta_a),
                      lit128, out128)
        did = True
    if not did:
        return out32_flat
    return out128[64:64 + rows * 8].reshape(rows, 1024)


@functools.lru_cache(maxsize=None)
def _pad_prior_fn(nrows: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fn(out32):
        lead = jnp.zeros((LEAD_ROWS, 1024), jnp.int32)
        # trail covers fragment-window overrun AND the cell-init reads
        # of bucket-padded tail cells (up to 63 cells = 504 rows)
        trail = jnp.zeros((TRAIL_ROWS + 512, 1024), jnp.int32)
        return jnp.concatenate([lead, out32, trail], axis=0)

    return fn


def replay_pieces_layered(plan_len: np.ndarray, plan_src: np.ndarray,
                          plan_layer: np.ndarray, n_layers: int,
                          lit_dev, out_len: int,
                          interpret: bool = False):
    """Execute a layered replay plan (runtime.flatten_replay_layered):
    pass 0 materializes literal-sourced pieces via the ragged kernel
    (deferred ranges carry dummy literal-0 bytes, overwritten later);
    pass k copies layer-k pieces from the lead-padded pass-(k-1)
    output.  Returns the (out_len,) uint8 chunk on device."""
    jax, jnp = _jx()
    plan_len = np.asarray(plan_len, np.int64)
    plan_src = np.asarray(plan_src, np.int64)
    plan_layer = np.asarray(plan_layer, np.int32)
    lit_len = int(lit_dev.shape[0])
    l0 = plan_layer == 0
    if l0.any() and (int((plan_src[l0] + plan_len[l0]).max()) > lit_len
                     or int(plan_src[l0].min()) < 0):
        raise ValueError("literal stream length mismatch")
    # pass-0 plan: real layer-0 pieces + deferred ranges as <=CELL
    # dummy chunks sourcing literal offset 0 (their window reads stay
    # inside the lead padding; later passes overwrite every byte)
    d_mask = plan_layer != 0
    if d_mask.any():
        reps = np.where(d_mask, -(-plan_len // CELL), 1)
        idx = np.repeat(np.arange(len(plan_len)), reps)
        kk = (np.arange(int(reps.sum()))
              - np.repeat(np.cumsum(reps) - reps, reps))
        p0_len = np.where(d_mask[idx],
                          np.minimum(plan_len[idx] - kk * CELL, CELL),
                          plan_len[idx])
        p0_lit = np.where(d_mask[idx], 0, plan_src[idx])
    else:
        p0_len, p0_lit = plan_len, plan_src
    out32_flat = replay_pieces_ragged(p0_len, p0_lit, lit_dev, out_len,
                                      interpret=interpret,
                                      as_rows=True, checked=True)
    ncells_total = -(-max(out_len, 1) // CELL)
    ends = np.cumsum(plan_len)
    dst_all = ends - plan_len
    for layer in range(1, n_layers + 1):
        sel = plan_layer == layer
        if not sel.any():
            continue
        rows = out32_flat.shape[0]
        prior = _pad_prior_fn(rows)(out32_flat)
        for c0, nc, base, meta, lo in _plan_frags(
                dst_all[sel], plan_src[sel], plan_len[sel],
                ncells_total, LEAD_ROWS):
            nf = len(base)
            nf_b = _bucket_pow2(max(nf, 1))
            nc_b = _bucket_pow2(max(nc, 1), 64)
            base_a = np.zeros(nf_b, np.int32)
            meta_a = np.zeros(nf_b, np.int32)
            base_a[:nf] = base
            meta_a[:nf] = meta
            lo_a = np.full(nc_b + 1, nf, np.int32)
            lo_a[:len(lo)] = lo
            # the layered call's grid covers ALL cells of the range so
            # untouched cells copy through (one 32KB DMA per cell)
            call = _layered_call(nc_b, nf_b, int(prior.shape[0]),
                                 interpret)
            rmax = (int(prior.shape[0]) - WINDMA) // 8 * 8
            seg = call(jnp.asarray(np.array([c0, rmax], np.int32)),
                       jnp.asarray(lo_a), jnp.asarray(base_a),
                       jnp.asarray(meta_a), prior)
            if c0 == 0 and nc * ROWS >= out32_flat.shape[0]:
                out32_flat = seg[:out32_flat.shape[0]]
            else:
                out32_flat = jnp.concatenate([
                    out32_flat[:c0 * ROWS],
                    seg[:nc * ROWS],
                    out32_flat[(c0 + nc) * ROWS:]], axis=0)
    return out32_flat.astype(jnp.uint8).reshape(-1)[:out_len]


def replay_pieces_reference(plan_len: np.ndarray, plan_lit: np.ndarray,
                            literals: np.ndarray,
                            out_len: int) -> np.ndarray:
    """Numpy twin of the kernel for tests / tpu_kernel_check."""
    plan_len = np.asarray(plan_len, np.int64)
    plan_lit = np.asarray(plan_lit, np.int64)
    out = np.zeros(out_len, np.uint8)
    p = 0
    for l, s in zip(plan_len, plan_lit):
        out[p:p + l] = literals[s:s + l]
        p += l
    return out
