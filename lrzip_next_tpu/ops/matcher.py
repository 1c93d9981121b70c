"""TPU rzip matcher: the long-range redundancy search as a JAX pipeline.

This is the TPU-native re-design of the reference's byte-at-a-time hash
search (src/rzip.c:586-762).  The sequential hash-table scan becomes four
data-parallel stages:

1. **Fingerprints** - two independent 32-bit polynomial hashes of every
   31-byte window, via modular prefix sums + power series
   (``jnp.cumsum`` / ``associative_scan`` over uint32, wrap-exact).
   Replaces the rolling Zobrist tag (src/rzip.c:385-429).
2. **Candidates** - one lexicographic sort of (fpA, fpB, pos) puts equal
   windows adjacent; each position's candidate is its predecessor in the
   sorted order = the *nearest previous* occurrence.  Replaces the
   open-addressed insert/probe table (src/rzip.c:304-383) with an exact
   batch search.
3. **Verification** - dense 31-byte compare of each position against its
   candidate (gathers), killing hash collisions.
4. **Chain runs** - positions whose candidates advance in lockstep
   (cand[i+1] == cand[i]+1) form runs; a run of length r is a verified
   match of length r+30 at its start.  Run boundaries come from vector
   compares; the final greedy cover over runs is O(#runs) on host
   (lrzip_next_tpu.models side), mirroring how the reference's greedy
   jumps past each emitted match (src/rzip.c:683-687).

All stages are O(n log n) work with static shapes - XLA-friendly, no
data-dependent control flow on device.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

from ..utils import jaxcache

jaxcache.enable()  # TPU compiles cost minutes; cache across processes

import jax
import jax.numpy as jnp
import numpy as np

from ..format.constants import MINIMUM_MATCH

# Hash window: 32 bytes (covers MINIMUM_MATCH=31; a 32-byte verified
# window implies a valid >=31-byte match).
HASH_W = 32

# Per-level odd multipliers for the tree hash (mod 2^32).
_M1 = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)


def _window_fps_pair(data_u32: jnp.ndarray):
    """Two fingerprints of every 32-byte window from one shared tree.

    Four shifted multiply-add levels hash the 16-byte halves; the two
    outputs are different top-level combinations of the same (lo, hi)
    pair: fpa = lo*M5 + hi, fpb = lo*(M5^1) + hi.  M5 - (M5^1) is odd,
    hence invertible mod 2^32, so fpa AND fpb colliding forces the full
    64-bit (lo, hi) pair to collide - as strong as two independent
    hashes at ~60% of the multiplies.  Output length n - 31.
    """
    a = data_u32
    for k in range(4):
        half = 1 << k
        a = a[:-half] * jnp.uint32(_M1[k]) + a[half:]
    lo, hi = a[:-16], a[16:]
    fpa = lo * jnp.uint32(_M1[4]) + hi
    fpb = lo * jnp.uint32(_M1[4] ^ 1) + hi
    return fpa, fpb


@jax.jit
def match_candidates(data: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stage 1-2: per-position nearest-previous candidate windows.

    Args:
      data: uint8 chunk of static length n (n > HASH_W).
    Returns:
      (cand, ok): int32 candidate source position per window position
      (undefined where ~ok) and the candidate-exists mask.  Output
      length n - HASH_W + 1.

    Candidates are matched on two independent 32-bit fingerprints
    (collision odds ~2^-64 per pair).  Exact byte verification happens
    on the host in the greedy cover, which touches emitted spans anyway
    (native greedy_cover, runtime/csrc/hostops.cpp) - dense on-device
    gathers for verification cost ~20s/64MB on TPU and are avoided
    entirely.
    """
    n = data.shape[0]
    m = n - HASH_W + 1
    d32 = data.astype(jnp.uint32)
    fpa, fpb = _window_fps_pair(d32)
    fpa, fpb = fpa[:m], fpb[:m]
    pos = jnp.arange(m, dtype=jnp.int32)

    # keys (fpa, pos) with fpb riding as a checked payload: the nearest
    # previous same-fpa window is the candidate, and an fpb mismatch
    # (hash collision) kills it.  Cheaper than a 3-key comparator; the
    # rare true pair shadowed by an interleaved fpa-collision is lost,
    # at ~k/2^32 odds per anchor.
    sfpa, spos, sfpb = jax.lax.sort((fpa, pos, fpb), num_keys=2)
    same = jnp.concatenate([
        jnp.zeros((1,), bool),
        (sfpa[1:] == sfpa[:-1]) & (sfpb[1:] == sfpb[:-1])])
    prev_pos = jnp.concatenate([jnp.zeros((1,), jnp.int32), spos[:-1]])
    cand_sorted = jnp.where(same, prev_pos, jnp.int32(-1))
    # invert the permutation with a second sort (faster than a 1-D
    # scatter on TPU: 0.63s vs 0.94s per 64MB chunk measured on v5e)
    _, cand = jax.lax.sort((spos, cand_sorted), num_keys=1)
    return cand, cand >= 0


_I32_BIG = jnp.int32(0x7FFFFFF0)


def _extract_strided_u16(x16: jnp.ndarray, stride: int) -> jnp.ndarray:
    """y[g] = x16[g*stride] for values known to fit 16 bits, via one
    MXU matmul with a 0/1 selection matrix.

    A strided slice x[::stride] relayouts at ~20ns/element on TPU
    (~180ms per 64MB chunk); viewing x as (r, 128) rows - its natural
    lane layout, no data movement - and multiplying by the (128,
    128/stride) selector keeps everything dense: integers <= 65535 are
    exact in f32, and each output is a single-term sum.
    """
    r = x16.shape[0] // 128
    xm = x16.reshape(r, 128).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128 // stride), 0)
    out = jax.lax.broadcasted_iota(jnp.int32, (128, 128 // stride), 1)
    sel = (lane == out * stride).astype(jnp.float32)
    # precision=HIGHEST is LOAD-BEARING: the TPU default lowers f32
    # matmuls to bf16 MXU passes, whose 8-bit significand silently
    # rounds 16-bit operand values - that corrupted extracted anchor
    # columns/fp-checks on the real chip for four rounds (CPU tests
    # can never see it) and shattered the long chains the selection
    # and walk paths both depend on
    y = jax.lax.dot_general(xm, sel, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    return y.astype(jnp.int32).reshape(-1)


def _extract_strided_i32(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Every stride-th element of an int32 array via two 16-bit-half
    selection matmuls (exact)."""
    xu = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = _extract_strided_u16((xu >> 16).astype(jnp.int32), stride)
    lo = _extract_strided_u16((xu & 0xFFFF).astype(jnp.int32), stride)
    return jax.lax.bitcast_convert_type(
        (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32),
        jnp.int32)


def _forward_window_min_i32(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """y[i] = min(x[i : i+length]) (same length; tail windows truncate).
    Doubling shifts - O(log length) dense passes, no gathers."""
    y = x
    cover = 1
    while cover < length:
        step = min(cover, length - cover)
        shifted = jnp.concatenate(
            [y[step:], jnp.full((step,), jnp.int32(0x7FFFFFFF), y.dtype)])
        y = jnp.minimum(y, shifted)
        cover += step
    return y


@functools.partial(jax.jit, static_argnames=("stride",))
def _anchor_candidates_fporder(data: jnp.ndarray, stride: int):
    """Sampled-anchor variant of :func:`match_candidates`.

    The reference trades coverage for speed with its per-level hash
    insert frequency and tag-mask sparsification (src/rzip.c:67-82,
    304-383).  The TPU analog: content-defined **anchors** - positions
    whose fingerprint is the minimum of the surrounding
    ``stride``-radius window (invariant under shifts of duplicated
    content, like winnowing/minimizers) - extracted one-per-``stride``
    positions with dense reductions.  Sorting and compaction then run
    over m/stride elements instead of m, cutting matcher cost ~stride x.
    Detectable matches shrink to ~MINIMUM_MATCH + 1.5*stride bytes;
    shorter redundancy is the backend codec's job anyway.

    Returns (spos, cand_sorted) in fingerprint-sorted order; cand is -1
    where no previous equal-fingerprint anchor exists.  Length
    m // stride.
    """
    assert stride in (2, 4, 8, 16, 32), stride  # 5-bit col, 128%stride==0
    n = data.shape[0]
    m = n - HASH_W + 1
    k = m // stride
    ma = k * stride
    big = jnp.int32(0x7FFFFFFF)
    if jax.devices()[0].platform != "cpu":
        # fused Pallas pass: cast + both tree hashes + local-min mask in
        # one HBM round trip (ops/anchor_pallas.py).  Signed-order mins;
        # any consistent order is content-defined.
        from .anchor_pallas import anchor_fps_pallas
        fpa_m, fpb = anchor_fps_pallas(data, stride)
        fpa_m, fpb = fpa_m[:ma], fpb[:ma]
    else:
        d32 = data.astype(jnp.uint32)
        fpa, fpb = _window_fps_pair(d32)
        # signed order to match the Pallas path (any consistent order
        # is content-defined)
        fpa = fpa[:ma].astype(jnp.int32)
        fpb = fpb[:ma].astype(jnp.int32)
        # local-min mask over the centered window [p - h, p + h]
        h = max(stride // 2, 1)
        fwd = _forward_window_min_i32(fpa, h + 1)  # min over [p, p+h]
        back = jnp.concatenate(
            [jnp.full((h,), big, fwd.dtype), fwd[:-h]])  # [p-h, p]
        is_anchor = fpa == jnp.minimum(fwd, back)
        fpa_m = jnp.where(is_anchor, fpa, big)

    # one anchor per fixed stride-row: the leftmost masked-min
    # fingerprint.  Selected with log-shift suffix-mins on the FLAT
    # arrays (lane-packed; a (k, stride) reshape would waste 15/16 of
    # every 128-lane vector) carrying (fpb-check, col) alongside, then
    # compacted down to k with the MXU selection matmuls
    # (_extract_strided_*).  Empty rows keep fpa = MAX, which doubles
    # as the invalid marker.
    idx = jax.lax.iota(jnp.int32, ma)
    col = jax.lax.rem(idx, jnp.int32(stride))
    # pack the 8-bit collision check with the column: 13 bits, exact
    # through the f32 selection matmul
    bc = ((fpb & jnp.int32(255)) << 5) | col
    v, c = fpa_m, bc
    step = 1
    while step < stride:
        vs = jnp.concatenate([v[step:], jnp.full((step,), big, v.dtype)])
        cs = jnp.concatenate([c[step:], jnp.zeros((step,), c.dtype)])
        take = (col + step < stride) & (vs < v)
        v = jnp.where(take, vs, v)
        c = jnp.where(take, cs, c)
        step <<= 1
    pad = (-ma) % 128
    if pad:
        v = jnp.concatenate([v, jnp.full((pad,), big, v.dtype)])
        c = jnp.concatenate([c, jnp.zeros((pad,), c.dtype)])
    row_min = _extract_strided_i32(v, stride)[:k]
    bc_k = _extract_strided_u16(c, stride)[:k]
    a_fpb8 = (bc_k >> 5).astype(jnp.uint8)  # 8-bit collision check
    a_pos = (jnp.arange(k, dtype=jnp.int32) * stride
             + (bc_k & jnp.int32(31)))
    a_pos = jnp.where(row_min != big, a_pos, _I32_BIG)

    # nearest previous equal-fingerprint anchor via one k-sized sort.
    # (fpa, pos) are the keys; an 8-bit slice of fpb rides as a checked
    # payload so a bare fpa collision cannot produce a false candidate
    # (40-bit effective check; see match_candidates for the trade).
    sfpa, spos, sfpb = jax.lax.sort(
        (row_min, a_pos, a_fpb8), num_keys=2)
    same = jnp.concatenate([
        jnp.zeros((1,), bool),
        (sfpa[1:] == sfpa[:-1]) & (sfpb[1:] == sfpb[:-1])
        & (sfpa[1:] != big)])
    prev_pos = jnp.concatenate([jnp.zeros((1,), jnp.int32), spos[:-1]])
    cand_sorted = jnp.where(same, prev_pos, jnp.int32(-1))
    return spos, cand_sorted


def anchor_candidates(data: jnp.ndarray, stride: int):
    """Position-ordered anchor seeds (see _anchor_candidates_fporder).

    Returns (pos, cand, ok): anchor byte positions (ascending), the
    candidate (nearest previous equal-fingerprint anchor) byte position,
    and validity.  Length m // stride."""
    spos, cand_sorted = _anchor_candidates_fporder(data, stride)
    # back to position order (anchors were generated ascending)
    pos, cand = jax.lax.sort((spos, cand_sorted), num_keys=1)
    return pos, cand, cand >= 0


def anchor_candidates_unordered(data: jnp.ndarray, stride: int):
    """Anchor seeds in fingerprint-sorted order - NO position re-sort.

    The production compact path chains seeds in (dist, pos) order,
    which is a full k-sized sort of its own and order-invariant to its
    input (_dist_sorted_seed_starts); restoring position order first
    was a wasted third k-sized sort (~20ms of a ~90ms 64MB step)."""
    spos, cand_sorted = _anchor_candidates_fporder(data, stride)
    return spos, cand_sorted, cand_sorted >= 0


def _anchor_chain_masks(pos, cand, ok, limit, stride):
    """Chain seeds with constant match distance into single runs so a
    long duplicated region ships to the host as one triple."""
    valid = ok & (pos < limit) & (cand >= 0) & (cand < limit)
    dist = pos - cand
    gap = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           pos[1:] - pos[:-1]])
    cont = jnp.concatenate([
        jnp.zeros((1,), bool),
        valid[1:] & valid[:-1] & (dist[1:] == dist[:-1])
        & (gap[1:] <= 4 * stride)])
    start = valid & ~cont
    is_end = valid & jnp.concatenate([~cont[1:], jnp.ones((1,), bool)])
    return start, is_end


# Same-distance seeds within this many bytes merge into one chain:
# the host greedy RESYNCS across unmatched stretches inside a chain
# (exact byte re-verification at the chain's distance - greedy_cover's
# scan loop), so a gappy chain loses nothing.  The value balances
# record count against blind resync scanning: 1024 ships ~2.8x fewer
# records than per-interruption chains while the walk stays ~35ms per
# 32MB; 16384 merged further but let ubiquitous-distance mega-chains
# scan megabytes of unmatched text per resync (540ms).
_CHAIN_GAP = 1024


def _verify_gap(stride: int) -> int:
    """Chain gap for the device-selection path: consecutive same-dist
    seeds whose positions differ by <= HASH_W have overlapping certified
    windows, so the merged span is fingerprint-verified end to end -
    which is what lets the prefix-max selection treat span ends as true
    frontiers without shadowing other chains.  2*HASH_W admits <= 32
    unverified interior bytes per junction (the host finalize resyncs
    them) and was measured STRICTLY better than HASH_W at stride 8 on
    the bench corpus: slightly more matched bytes (junction bytes that
    do verify) at 12% fewer records.  Coarser strides space anchors up
    to 2*stride-1 apart, so the gap widens with stride."""
    return max(2 * HASH_W, 2 * stride)


def _dist_sorted_seed_starts(pos, cand, ok, limit, stride,
                             gap: int = _CHAIN_GAP):
    """Chain start/end masks over seeds sorted by (dist, pos).

    Position-adjacent chaining (_anchor_chain_masks) shatters the long
    chains of a far repeat whenever local-match seeds interleave (each
    interleaved anchor breaks pos-adjacency): a 64MB corpus of ~24MB-
    apart repeats produced 591K chain starts for 34K final tokens, and
    the compaction cap overflow re-ran the whole device pipeline.
    Grouping by distance first makes chains immune to interleaving -
    strictly merging MORE than the adjacency rule (any adjacent pair
    with equal dist and small gap is also adjacent within its dist
    group), so the host greedy sees a superset of the old hints in
    fewer, longer runs.  Returns (start_mask, end_mask, spos, sdist)
    in dist-sorted order.
    """
    valid = ok & (pos < limit) & (cand >= 0) & (cand < limit)
    dist = jnp.where(valid, pos - cand, _I32_BIG)
    sd, sp = jax.lax.sort((dist, pos), num_keys=2)
    sv = sd < _I32_BIG
    cont = jnp.concatenate([
        jnp.zeros((1,), bool),
        sv[1:] & sv[:-1] & (sd[1:] == sd[:-1])
        & (sp[1:] - sp[:-1] <= gap)])
    start = sv & ~cont
    is_end = sv & jnp.concatenate([~cont[1:], jnp.ones((1,), bool)])
    return start, is_end, sp, sd


def _order_chains(starts_c, dists_c, ends_c, n_raw, cap: int):
    """Position-order the compacted chain records (kept records first,
    pads at _I32_BIG)."""
    idx = jax.lax.iota(jnp.int32, cap)
    starts_m = jnp.where(idx < n_raw, starts_c, _I32_BIG)
    ps, ds, pe = jax.lax.sort((starts_m, dists_c, ends_c), num_keys=1)
    return ps, pe, ds


@functools.partial(jax.jit, static_argnames=("cap", "stride", "gap"))
def compact_seeds(pos, cand, ok, limit, cap: int, stride: int,
                  gap: int = _CHAIN_GAP):
    """XLA fallback seed compaction (CPU meshes and tests).

    Chain starts AND ends are compacted (the greedy's resync walk
    consumes the certified span); detection runs in (dist, pos) order
    - see _dist_sorted_seed_starts - then _prune_and_order drops
    covered records and returns position order."""
    start, is_end, sp, sd = _dist_sorted_seed_starts(pos, cand, ok,
                                                     limit, stride, gap)
    n_raw = jnp.sum(start.astype(jnp.int32))
    # compact in INPUT (dist-sorted) order - sorting by position value
    # would break the i-th-start <-> i-th-end pairing for chains nested
    # across distances
    kk = pos.shape[0]
    idxk = jax.lax.iota(jnp.int32, kk)
    _, ps_c, ds_c = jax.lax.sort(
        (jnp.where(start, idxk, _I32_BIG), sp, sd), num_keys=1)
    _, pe_c = jax.lax.sort(
        (jnp.where(is_end, idxk, _I32_BIG), sp), num_keys=1)
    ps, pe, ds = _order_chains(ps_c[:cap], ds_c[:cap], pe_c[:cap],
                               n_raw, cap)
    return (ps, pe, ds), n_raw


@functools.partial(jax.jit, static_argnames=("cap", "stride", "gap"))
def compact_seeds_pallas(pos, cand, ok, limit, cap: int, stride: int,
                         gap: int = _CHAIN_GAP):
    from .compact_pallas import compact_starts_pallas
    start, is_end, sp, sd = _dist_sorted_seed_starts(pos, cand, ok,
                                                     limit, stride, gap)
    starts_c, dists_c, n_raw = compact_starts_pallas(start, sp, sd, cap)
    # ends compact 1:1 with starts (chains are contiguous segments in
    # dist order, so the i-th end mask element closes the i-th start)
    ends_c, _, _ = compact_starts_pallas(is_end, sp, sd, cap)
    ps, pe, ds = _order_chains(starts_c, dists_c, ends_c, n_raw, cap)
    return (ps, pe, ds), n_raw


def _seed_compact_impl():
    # An associative_scan + sort variant was tried here: ~2x cheaper on
    # paper, but its reverse tuple-scan took >30 min of remote Mosaic/XLA
    # compile at the 64MB bucket.  The log-shift Pallas kernel compiles
    # in minutes and runs 0.1s per 64MB chunk; nonzero-based XLA is the
    # CPU fallback.
    if jax.devices()[0].platform != "cpu":
        return compact_seeds_pallas
    return compact_seeds


def _seg_end_copy(vals, is_end):
    """result[i] = vals at the first is_end position >= i (a reverse
    segmented copy).  Log-shift doubling with static slices/selects -
    NOT associative_scan: a reverse tuple-scan at the 64MB bucket costs
    >30 min of remote XLA compile (the round-3 finding that shaped the
    compaction kernel); this form compiles in seconds and runs as ~2
    log-passes of dense HBM traffic.  Elements past the last flag hold
    zeros - callers only read positions inside segments."""
    v = jnp.where(is_end, vals, jnp.zeros((), vals.dtype))
    f = is_end
    nn = vals.shape[0]
    step = 1
    while step < nn:
        vs = jnp.concatenate([v[step:], jnp.zeros((step,), v.dtype)])
        fs = jnp.concatenate([f[step:], jnp.zeros((step,), bool)])
        v = jnp.where(f, v, vs)
        f = f | fs
        step <<= 1
    return v


def _derive_coarse(ps_c, ds_c, pe_c, n_raw, gap_w: int):
    """Coarse (gap_w-merged) chain records derived from fine compacted
    records - cap-sized ops only, no second k-sized sort.

    Fine records arrive in (dist, pos)-sorted order; a gap_w chain is
    exactly a maximal run of same-dist fine records whose start-to-
    previous-last-seed gaps are <= gap_w (consecutive seeds across a
    record boundary are prev.end and next.start).  The segment end
    rides to each segment start via one reverse segmented copy, so
    compaction + position ordering fuse into a SINGLE cap-sized sort.
    Returns position-ordered records (pads at _I32_BIG) + count."""
    cap = ps_c.shape[0]
    idx = jax.lax.iota(jnp.int32, cap)
    valid = idx < n_raw
    prev_e = jnp.concatenate([jnp.full((1,), -_I32_BIG), pe_c[:-1]])
    prev_d = jnp.concatenate([jnp.full((1,), jnp.int32(-1)), ds_c[:-1]])
    prev_v = jnp.concatenate([jnp.zeros((1,), bool), valid[:-1]])
    cont = (valid & prev_v & (ds_c == prev_d)
            & (ps_c - prev_e <= jnp.int32(gap_w)))
    seg_s = valid & ~cont
    seg_e = valid & jnp.concatenate([~cont[1:], jnp.ones((1,), bool)])
    n_w = jnp.sum(seg_s.astype(jnp.int32))
    cend = _seg_end_copy(pe_c, seg_e)
    key = jnp.where(seg_s, ps_c, _I32_BIG)
    pw, dw, ew = jax.lax.sort((key, ds_c, cend), num_keys=1)
    return (pw, ew, dw), n_w


@functools.partial(jax.jit,
                   static_argnames=("cap", "stride", "gap_v", "gap_w"))
def compact_seeds_dual(pos, cand, ok, limit, cap: int, stride: int,
                       gap_v: int, gap_w: int):
    """XLA dual compaction (CPU meshes and tests): position-ordered
    chain records at BOTH the exact gap (gap_v, spans fingerprint-
    verified end to end - the selection path's input) and the coarse
    gap (gap_w - the heap walk's input), sharing the one k-sized
    (dist, pos) sort.  Returns (fine, n_raw, coarse, n_w)."""
    start, is_end, sp, sd = _dist_sorted_seed_starts(pos, cand, ok,
                                                     limit, stride,
                                                     gap_v)
    n_raw = jnp.sum(start.astype(jnp.int32))
    end_at = _seg_end_copy(sp, is_end)
    kk = pos.shape[0]
    idxk = jax.lax.iota(jnp.int32, kk)
    _, ps_c, ds_c, pe_c = jax.lax.sort(
        (jnp.where(start, idxk, _I32_BIG), sp, sd, end_at), num_keys=1)
    ps_c, ds_c, pe_c = ps_c[:cap], ds_c[:cap], pe_c[:cap]
    coarse, n_w = _derive_coarse(ps_c, ds_c, pe_c,
                                 jnp.minimum(n_raw, cap), gap_w)
    fine = _order_chains(ps_c, ds_c, pe_c, n_raw, cap)
    return fine, n_raw, coarse, n_w


@functools.partial(jax.jit,
                   static_argnames=("cap", "stride", "gap_v", "gap_w"))
def compact_seeds_dual_pallas(pos, cand, ok, limit, cap: int,
                              stride: int, gap_v: int, gap_w: int):
    from .compact_pallas import compact_starts3_pallas
    start, is_end, sp, sd = _dist_sorted_seed_starts(pos, cand, ok,
                                                     limit, stride,
                                                     gap_v)
    # chain ends ride to their start elements via one dense reverse
    # segmented copy, so ONE starts-only kernel pass compacts
    # (start, dist, end) together and the cross-tile merge is a single
    # stacked row gather (vs a two-mask kernel + three element gathers)
    end_at = _seg_end_copy(sp, is_end)
    ps_c, ds_c, pe_c, n_raw = compact_starts3_pallas(
        start, sp, sd, end_at, cap)
    coarse, n_w = _derive_coarse(ps_c, ds_c, pe_c,
                                 jnp.minimum(n_raw, cap), gap_w)
    fine = _order_chains(ps_c, ds_c, pe_c, n_raw, cap)
    return fine, n_raw, coarse, n_w


def _seed_compact_dual_impl():
    if jax.devices()[0].platform != "cpu":
        return compact_seeds_dual_pallas
    return compact_seeds_dual


@jax.jit
def _selected_coverage(ps, pe, ds, n_raw):
    """Total bytes the prefix-max selection would cover over ordered
    records - the scalar the select/walk arbitration compares between
    the exact (gap_v) and coarse (gap_w) chainings."""
    cap = ps.shape[0]
    idx = jax.lax.iota(jnp.int32, cap)
    valid = (idx < n_raw) & (ps < _I32_BIG)
    e_full = jnp.where(valid, pe + jnp.int32(HASH_W), jnp.int32(-1))
    run_max = jax.lax.associative_scan(jnp.maximum, e_full)
    frontier = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), run_max[:-1]])
    plen = e_full - jnp.maximum(ps, frontier)
    sel = valid & (e_full > frontier) & (plen >= jnp.int32(MINIMUM_MATCH))
    return jnp.sum(jnp.where(sel, plen, 0))


def default_anchor_stride(rzip_level: int) -> int:
    """Map the reference's 1-9 rzip effort dial (src/rzip.c:67-82) to an
    anchor sampling stride.  Level 9 uses stride-2 anchors: detectable
    matches shrink to ~HASH_W + 3 bytes (the format floor is 31), at a
    quarter of the dense path's sort work - the same near-exhaustive
    trade the reference's level-9 insert frequency makes."""
    if rzip_level >= 9:
        return 2
    if rzip_level == 8:
        return 4
    if rzip_level >= 5:
        return 8
    if rzip_level >= 3:
        return 16
    return 32


@jax.jit
def chain_runs(cand: jnp.ndarray, ok: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stage 4: mark run starts of lockstep candidate chains.

    A position starts a run when it is ok and either its predecessor is
    not ok or the predecessor's chain does not continue into it.
    Returns (run_start_mask, run_id) where run_id is the inclusive scan
    of run starts (1-based over ok positions, 0 elsewhere is meaningless).
    """
    cont = jnp.concatenate([
        jnp.zeros((1,), bool),
        ok[1:] & ok[:-1] & (cand[1:] == cand[:-1] + 1)])
    start = ok & ~cont
    run_id = jnp.cumsum(start.astype(jnp.int32))
    return start, run_id


@functools.partial(jax.jit, static_argnames=("cap",))
def compact_runs(cand: jnp.ndarray, ok: jnp.ndarray, limit: jnp.ndarray,
                 cap: int):
    """Device-side run compaction: (starts, ends, srcs, n_runs).

    Chain runs (lockstep candidate segments) are located and compacted
    entirely on device so only O(#runs) data crosses the host link - the
    per-position arrays (GBs at large chunk sizes) never leave HBM.
    k-th start pairs with k-th end (runs cannot nest).  ``limit`` masks
    positions past the real (unpadded) chunk; ``cap`` bounds the
    compacted size (overflow detected via n_runs > cap).
    """
    m = cand.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    valid = ok & (idx < limit)
    cont = jnp.concatenate([
        jnp.zeros((1,), bool),
        valid[1:] & valid[:-1] & (cand[1:] == cand[:-1] + 1)])
    start = valid & ~cont
    is_end = valid & jnp.concatenate([~cont[1:], jnp.ones((1,), bool)])
    n_runs = jnp.sum(start.astype(jnp.int32))
    starts = jnp.nonzero(start, size=cap, fill_value=m)[0].astype(jnp.int32)
    ends = jnp.nonzero(is_end, size=cap, fill_value=m)[0].astype(jnp.int32)
    srcs = cand[jnp.minimum(starts, m - 1)]
    return starts, ends, srcs, n_runs


def _compact_impl():
    """Pick the Pallas compaction kernel on real accelerators; the XLA
    fallback (~8x slower at 64MB) remains for CPU meshes and tests."""
    if jax.devices()[0].platform != "cpu":
        from .compact_pallas import compact_runs_pallas
        return compact_runs_pallas
    return compact_runs


def _bucket_cap(k: int, hi: int) -> int:
    """Power-of-two cap bucket covering k, clamped to hi - keeps the
    redo path's jit cache warm instead of compiling per exact count."""
    c = 1 << max(int(k - 1).bit_length(), 12)
    return min(c, hi)


def _fetch_bucket(k: int, hi: int) -> int:
    """Quarter-step bucket for the record readback: the transfer is
    ~25MB/s through the tunnel, so power-of-two padding (up to 2x the
    live rows) costs real milliseconds; quarter steps cap the waste at
    25% for ~2 extra jit cache entries per octave.  Always even (the
    16-bit packer bitcasts u16 pairs into int32 words)."""
    if k <= 4096:
        return min(4096, hi) & ~1
    q = 1 << (int(k - 1).bit_length() - 2)
    return min(-(-k // q) * q, hi) & ~1


def _fetch_compacted(starts, ends, srcs, k: int):
    """One static-shape transfer of the capped arrays, sliced on host.

    Slicing device arrays by a data-dependent k (starts[:k]) would
    compile a fresh XLA slice per distinct k - seconds each under the
    axon remote backend.  jnp.stack keeps it to one transfer RTT.
    """
    tri = np.asarray(jax.device_get(jnp.stack([starts, ends, srcs])))
    return (tri[0, :k].astype(np.int64), tri[1, :k].astype(np.int64),
            tri[2, :k].astype(np.int64))


@functools.partial(jax.jit, static_argnames=("fetch_cap",))
def _pack_seeds(starts, ends, dists, n_runs, fetch_cap: int):
    """Delta-encode chain records on device before the host transfer:
    start deltas, distances and spans are small-valued ints whose high
    bytes are mostly zero, which the axon tunnel's wire compression
    shrinks 2-4x (raw positions are incompressible).  The record count
    rides as element 0 so count + records arrive in ONE readback (a
    separate int(n_runs) sync costs a full tunnel RTT per chunk).
    Only the first fetch_cap records travel; the caller refetches at a
    bigger bucket on overflow (no device recompute)."""
    live = jax.lax.iota(jnp.int32, fetch_cap) < n_runs
    s = jnp.where(live, starts[:fetch_cap], 0)
    e = jnp.where(live, ends[:fetch_cap], 0)
    d = jnp.where(live, dists[:fetch_cap], 0)
    d0 = jnp.concatenate([s[:1], jnp.diff(s)])
    return jnp.concatenate([
        jnp.reshape(n_runs, (1,)).astype(jnp.int32),
        d0, d, e - s])


def _fetch_seeds_counted(starts, ends, dists, n_runs, fetch_cap: int):
    """One-transfer fetch -> (n_runs, starts, ends, srcs)."""
    fc = fetch_cap
    flat = np.asarray(jax.device_get(
        _pack_seeds(starts, ends, dists, n_runs, fc)))
    k = int(flat[0])
    kk = min(k, fc)
    s = np.cumsum(flat[1:1 + kk].astype(np.int64))
    dist = flat[1 + fc:1 + fc + kk].astype(np.int64)
    span = flat[1 + 2 * fc:1 + 2 * fc + kk].astype(np.int64)
    return k, s, s + span, s - dist


# ---------------------------------------------------------------------------
# device-side greedy selection (round 5): the record readback was ~60%
# of the compress critical path (3.5-4MB/chunk of chain records at the
# host link's rate).  Selecting the emitted matches ON DEVICE shrinks
# the readback to the final token columns (~KBs).  The greedy
# left-to-right cover has a parallel-friendly equivalent once spans are
# exact: with records sorted by start, the frontier after record i is
# simply the running max of span ends seen so far - a record is
# selected iff its end exceeds that running max, and its start is
# clipped to it.  Selected pieces are disjoint and sorted by
# construction (the reference's greedy emit loop, src/rzip.c:673-688,
# expressed as one prefix-scan instead of a sequential walk).
# Fingerprint exactness (~2^-40 per pair) stands in for byte equality
# on device; the host finalize pass (runtime.finalize_tokens)
# byte-verifies every emitted span, resyncs across interior holes, and
# extends matches into the literal gaps - so a collision can only
# shrink a match, never corrupt the stream.


@jax.jit
def select_records(ps, pe, ds, n_raw):
    """Prefix-max greedy over position-ordered chain records.

    Args: cap-sized (start, end, dist) records sorted by start with
    pads at _I32_BIG (from _order_chains); n_raw = live record count.
    Returns (ss, sl, sd, n_sel): selected piece starts (ascending,
    pads at _I32_BIG), byte lengths, distances, and the selected count.
    Pieces are disjoint; sub-MINIMUM_MATCH clips are dropped (their
    bytes fall to literals; the host finalize's left-extension recovers
    the recoverable ones).
    """
    cap = ps.shape[0]
    idx = jax.lax.iota(jnp.int32, cap)
    valid = (idx < n_raw) & (ps < _I32_BIG)
    # exclusive end of the certified span: last seed + window
    e_full = jnp.where(valid, pe + jnp.int32(HASH_W), jnp.int32(-1))
    run_max = jax.lax.associative_scan(jnp.maximum, e_full)
    frontier = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), run_max[:-1]])
    clip_s = jnp.maximum(ps, frontier)
    plen = e_full - clip_s
    sel = valid & (e_full > frontier) & (plen >= jnp.int32(MINIMUM_MATCH))
    n_sel = jnp.sum(sel.astype(jnp.int32))
    key = jnp.where(sel, clip_s, _I32_BIG)
    ss, sl, sd = jax.lax.sort((key, plen, ds), num_keys=1)
    return ss, sl, sd, n_sel


@functools.partial(jax.jit, static_argnames=("fetch_cap",))
def _pack_selected(ss, sl, sd, n_sel, n_raw, cov_w, fetch_cap: int):
    """Delta-pack selected pieces for ONE counted readback (see
    _pack_seeds for why: wire compression on small-valued columns, and
    the counts ride as header elements so no separate sync RTT).
    Header: [n_sel, n_raw (compaction-cap overflow detection), cov_v
    (bytes the exact-span selection covers), cov_w (bytes the coarse-
    chain selection would cover - the walk-fallback arbitration
    signal)]."""
    live = jax.lax.iota(jnp.int32, fetch_cap) < n_sel
    s = jnp.where(live, ss[:fetch_cap], 0)
    l = jnp.where(live, sl[:fetch_cap], 0)
    d = jnp.where(live, sd[:fetch_cap], 0)
    d0 = jnp.concatenate([s[:1], jnp.diff(s)])
    cov_v = jnp.sum(jnp.where(
        jax.lax.iota(jnp.int32, sl.shape[0]) < n_sel, sl, 0))
    hdr = jnp.stack([n_sel.astype(jnp.int32), n_raw.astype(jnp.int32),
                     cov_v.astype(jnp.int32), cov_w.astype(jnp.int32)])
    return jnp.concatenate([hdr, d0, l, d])


# Exceptions channel capacity for the 16-bit packed readback: tokens
# whose start-delta/len exceed 16 bits or whose dist-delta exceeds 15
# bits ship their full int32 values here.  Overflow (pathologically
# jumpy chunks) falls back to the plain int32 packer for that chunk.
_EXC_CAP = 2048


@functools.partial(jax.jit, static_argnames=("fetch_cap",))
def _pack_selected16(ss, sl, sd, n_sel, n_raw, cov_w, fetch_cap: int):
    """16-bit packed variant of _pack_selected: 6 bytes/token on the
    wire (u16 start-delta, u16 len, i16 dist-delta) instead of 12 -
    the readback shares the tunnel with every dispatch/sync round
    trip, so wire bytes translate directly into pipeline latency.
    Rare wide values ride the exceptions channel (idx, start, len,
    dist as full int32s; count in the header).

    Layout (int32 words): [n_sel, n_raw, cov_v, cov_w, n_exc, 0]
    then 3*fetch_cap/2 words of bitcast u16/i16 columns (ds16, l16,
    dd16), then 4*_EXC_CAP exception words."""
    fc = fetch_cap
    live = jax.lax.iota(jnp.int32, fc) < n_sel
    s = jnp.where(live, ss[:fc], 0)
    l = jnp.where(live, sl[:fc], 0)
    d = jnp.where(live, sd[:fc], 0)
    ds = jnp.concatenate([s[:1], jnp.diff(s)])
    dd = jnp.concatenate([d[:1], jnp.diff(d)])
    exc = live & ((ds > 65535) | (l > 65535)
                  | (dd > 32766) | (dd < -32766))
    n_exc = jnp.sum(exc.astype(jnp.int32))
    ds16 = jnp.where(exc, 0, ds).astype(jnp.uint16)
    l16 = jnp.where(exc, 0, l).astype(jnp.uint16)
    dd16 = jnp.where(exc, 0, dd).astype(jnp.int16).astype(jnp.uint16)
    body = jnp.concatenate([ds16, l16, dd16])
    body32 = jax.lax.bitcast_convert_type(
        body.reshape(-1, 2), jnp.int32).reshape(-1)
    idx = jax.lax.iota(jnp.int32, fc)
    key = jnp.where(exc, idx, _I32_BIG)
    _, ei, es, el, ed = jax.lax.sort((key, idx, s, l, d), num_keys=1)
    ec = min(fc, _EXC_CAP)
    exc_flat = jnp.concatenate([ei[:ec], es[:ec], el[:ec], ed[:ec]])
    cov_v = jnp.sum(jnp.where(
        jax.lax.iota(jnp.int32, sl.shape[0]) < n_sel, sl, 0))
    hdr = jnp.stack([n_sel.astype(jnp.int32), n_raw.astype(jnp.int32),
                     cov_v.astype(jnp.int32), cov_w.astype(jnp.int32),
                     n_exc, jnp.int32(0)])
    return jnp.concatenate([hdr, body32, exc_flat])


@functools.partial(jax.jit, static_argnames=("fetch_cap",))
def _pack_selected8(ss, sl, sd, n_sel, n_raw, cov_w, fetch_cap: int):
    """8-byte/token packing: u16 start-delta, u16 len, ABSOLUTE i32
    dist.  Long-range corpora make dist-deltas jump by whole segment
    strides (measured: 59K of 150K tokens past +-15 bits at 64MB), so
    the 6-byte format's exceptions channel overflows and every chunk
    pays a synchronous 12B/token refetch queued behind the lookahead
    graphs (~250ms).  Absolute dists cannot overflow; only rare wide
    start-deltas/lens ride the exceptions channel.

    Layout (int32 words): [n_sel, n_raw, cov_v, cov_w, n_exc, 0],
    fetch_cap words of bitcast (ds16 | l16) columns, fetch_cap dist
    words, then 3*_EXC_CAP exception words (idx, start, len)."""
    fc = fetch_cap
    live = jax.lax.iota(jnp.int32, fc) < n_sel
    s = jnp.where(live, ss[:fc], 0)
    l = jnp.where(live, sl[:fc], 0)
    d = jnp.where(live, sd[:fc], 0)
    ds = jnp.concatenate([s[:1], jnp.diff(s)])
    exc = live & ((ds > 65535) | (l > 65535))
    n_exc = jnp.sum(exc.astype(jnp.int32))
    ds16 = jnp.where(exc, 0, ds).astype(jnp.uint16)
    l16 = jnp.where(exc, 0, l).astype(jnp.uint16)
    body = jnp.concatenate([ds16, l16])
    body32 = jax.lax.bitcast_convert_type(
        body.reshape(-1, 2), jnp.int32).reshape(-1)
    idx = jax.lax.iota(jnp.int32, fc)
    key = jnp.where(exc, idx, _I32_BIG)
    _, ei, es, el = jax.lax.sort((key, idx, s, l), num_keys=1)
    ec = min(fc, _EXC_CAP)
    exc_flat = jnp.concatenate([ei[:ec], es[:ec], el[:ec]])
    cov_v = jnp.sum(jnp.where(
        jax.lax.iota(jnp.int32, sl.shape[0]) < n_sel, sl, 0))
    hdr = jnp.stack([n_sel.astype(jnp.int32), n_raw.astype(jnp.int32),
                     cov_v.astype(jnp.int32), cov_w.astype(jnp.int32),
                     n_exc, jnp.int32(0)])
    return jnp.concatenate([hdr, body32, d, exc_flat])


def _unpack_selected8(flat: np.ndarray, fetch_cap: int):
    """Host half of _pack_selected8 -> (n_sel, n_raw, covs, starts,
    lens, dists) or None when the exceptions channel overflowed."""
    fc = fetch_cap
    k = int(flat[0])
    kraw = int(flat[1])
    covs = (int(flat[2]), int(flat[3]))
    n_exc = int(flat[4])
    ec = min(fc, _EXC_CAP)
    if n_exc > ec:
        return None
    kk = min(k, fc)
    body = flat[6:6 + fc].view(np.uint16)
    ds = body[:fc][:kk].astype(np.int64)
    ln = body[fc:2 * fc][:kk].astype(np.int64)
    d = flat[6 + fc:6 + fc + kk].astype(np.int64)
    off = 6 + 2 * fc
    ei = flat[off:off + n_exc].astype(np.int64)
    es = flat[off + ec:off + ec + n_exc].astype(np.int64)
    el = flat[off + 2 * ec:off + 2 * ec + n_exc].astype(np.int64)
    s = np.cumsum(ds)
    if n_exc:
        keep = ei < kk
        ei, es, el = ei[keep], es[keep], el[keep]
        ln[ei] = el
        corr_s = np.zeros(kk + 1, np.int64)
        run_s = 0
        for j in range(len(ei)):
            i = int(ei[j])
            ds_j = es[j] - (s[i] + run_s)
            corr_s[i] += ds_j
            run_s += ds_j
        s = s + np.cumsum(corr_s[:kk])
    return k, kraw, covs, s, ln, d


def _unpack_selected16(flat: np.ndarray, fetch_cap: int):
    """Host half of _pack_selected16 -> (n_sel, n_raw, covs, starts,
    lens, dists) or None when the exceptions channel overflowed."""
    fc = fetch_cap
    k = int(flat[0])
    kraw = int(flat[1])
    covs = (int(flat[2]), int(flat[3]))
    n_exc = int(flat[4])
    ec = min(fc, _EXC_CAP)
    if n_exc > ec:
        return None
    kk = min(k, fc)
    body = flat[6:6 + (3 * fc) // 2].view(np.uint16)
    ds = body[:fc][:kk].astype(np.int64)
    ln = body[fc:2 * fc][:kk].astype(np.int64)
    dd = body[2 * fc:3 * fc][:kk].astype(np.int16).astype(np.int64)
    off = 6 + (3 * fc) // 2
    ei = flat[off:off + n_exc].astype(np.int64)
    es = flat[off + ec:off + ec + n_exc].astype(np.int64)
    el = flat[off + 2 * ec:off + 2 * ec + n_exc].astype(np.int64)
    ed = flat[off + 3 * ec:off + 3 * ec + n_exc].astype(np.int64)
    s = np.cumsum(ds)
    d = np.cumsum(dd)
    if n_exc:
        keep = ei < kk
        ei, es, el, ed = ei[keep], es[keep], el[keep], ed[keep]
        ln[ei] = el
        # delta chains restart at each exception's absolute value:
        # accumulate the corrections left to right (n_exc is small)
        corr_s = np.zeros(kk + 1, np.int64)
        corr_d = np.zeros(kk + 1, np.int64)
        run_s = run_d = 0
        for j in range(len(ei)):
            i = int(ei[j])
            ds_j = es[j] - (s[i] + run_s)
            dd_j = ed[j] - (d[i] + run_d)
            corr_s[i] += ds_j
            corr_d[i] += dd_j
            run_s += ds_j
            run_d += dd_j
        s = s + np.cumsum(corr_s[:kk])
        d = d + np.cumsum(corr_d[:kk])
    return k, kraw, covs, s, ln, d


def _fetch_selected_counted(ss, sl, sd, n_sel, n_raw, cov_w,
                            fetch_cap: int, packed=None, fmt: int = 6,
                            fmt_out: list | None = None):
    """One-transfer fetch -> (n_sel, n_raw, cov_v, cov_w, starts,
    lens, dists).  ``fmt`` picks the wire packing: 6 B/token (16-bit
    deltas) or 8 B/token (absolute dists - long-range corpora overflow
    the 6B format's dist-delta exceptions on nearly every chunk); a
    chunk that overflows the requested format cascades 6 -> 8 -> 12
    (plain int32).  ``fmt_out`` (a list) receives the format that
    succeeded, so the caller can pre-dispatch the right packer for the
    next chunk.  ``packed`` accepts a pre-dispatched pack of the
    requested format whose D2H copy was started with
    copy_to_host_async() - the transfer then rides under later device
    work instead of blocking the collect (measured: a 2MB readback
    drops ~70ms -> ~0.3ms when prefetched)."""
    fc = fetch_cap
    if packed is None:
        pack_fn = _pack_selected16 if fmt == 6 else _pack_selected8
        packed = pack_fn(ss, sl, sd, n_sel, n_raw, cov_w, fc)
    flat = np.asarray(jax.device_get(packed))
    res = (_unpack_selected16 if fmt == 6 else _unpack_selected8)(
        flat, fc)
    if res is None and fmt == 6:
        # dist-delta exceptions overflowed: absolute-dist format
        fmt = 8
        flat = np.asarray(jax.device_get(
            _pack_selected8(ss, sl, sd, n_sel, n_raw, cov_w, fc)))
        res = _unpack_selected8(flat, fc)
    if res is not None:
        if fmt_out is not None:
            fmt_out.append(fmt)
        return res
    # exceptions channel overflow: plain int32 refetch for this chunk
    if fmt_out is not None:
        fmt_out.append(12)
    flat = np.asarray(jax.device_get(
        _pack_selected(ss, sl, sd, n_sel, n_raw, cov_w, fc)))
    k = int(flat[0])
    kraw = int(flat[1])
    covs = (int(flat[2]), int(flat[3]))
    kk = min(k, fc)
    s = np.cumsum(flat[4:4 + kk].astype(np.int64))
    ln = flat[4 + fc:4 + fc + kk].astype(np.int64)
    d = flat[4 + 2 * fc:4 + 2 * fc + kk].astype(np.int64)
    return k, kraw, covs, s, ln, d


def finalize_selected(starts: np.ndarray, lens: np.ndarray,
                      dists: np.ndarray, n: int,
                      data: np.ndarray, w: int = HASH_W,
                      hole_out: list | None = None
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Byte-verify + extend device-selected pieces into final tokens.

    Native path: runtime.finalize_tokens.  The numpy fallback mirrors
    its semantics: per piece, extend the start left across the literal
    gap, scan the span emitting maximal byte-verified matches
    (resyncing over interior holes), extend the last match right.
    ``hole_out`` receives the count of scanned-but-unverified bytes
    inside selected spans (the walk-fallback trigger).
    """
    from .. import runtime
    if runtime.available():
        res = runtime.finalize_tokens(starts, lens, dists, n, data,
                                      MINIMUM_MATCH, hole_out=hole_out)
        if res is not None:
            return res
    kinds, out_l, out_d = [], [], []
    f = 0
    holes = 0

    def emit(kind, length, dist):
        kinds.append(kind)
        out_l.append(length)
        out_d.append(dist)

    for s0, l0, d in zip(starts, lens, dists):
        s0, l0, d = int(s0), int(l0), int(d)
        e0 = min(s0 + l0, n)
        if d < 1 or e0 <= f:
            continue
        s = max(s0, f)
        if s - d < 0:
            continue
        # left extension across the literal gap
        while s > f and s > d and data[s - 1] == data[s - 1 - d]:
            s -= 1
        p = s
        while p < e0:
            q = p
            maxl = n - p
            l = 0
            while l < maxl and data[p + l] == data[p - d + l]:
                l += 1
            if l >= MINIMUM_MATCH:
                if q > f:
                    emit(0, q - f, 0)
                emit(1, l, d)
                f = q + l
                p = f
            else:
                step = min(l + 1, e0 - p)
                holes += step
                p += step
        if f >= n:
            break
    if f < n:
        emit(0, n - f, 0)
    if hole_out is not None:
        hole_out.append(holes)
    return (np.array(kinds, dtype=np.uint8),
            np.array(out_l, dtype=np.int64),
            np.array(out_d, dtype=np.int64))


def runs_to_host(cand: jnp.ndarray, ok: jnp.ndarray, limit: int | None = None
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run detection on device, then transfer only compacted run triples."""
    m = cand.shape[0]
    if limit is None:
        limit = m
    cap = max(min(m, 4096), m // 64)
    starts, ends, srcs, n_runs = _compact_impl()(
        cand, ok, jnp.int32(limit), cap)
    k = int(n_runs)
    if k > cap:  # rare: redo at the next bucketed cap
        starts, ends, srcs, n_runs = _compact_impl()(
            cand, ok, jnp.int32(limit), _bucket_cap(k, m))
        k = int(n_runs)
    if k == 0:
        return (np.zeros(0, np.int64),) * 3
    starts_h, ends_h, srcs_h = _fetch_compacted(starts, ends, srcs, k)
    run_len = ends_h - starts_h + 1
    return starts_h, run_len, srcs_h


def greedy_cover_from_runs(run_start: np.ndarray, run_len: np.ndarray,
                           run_src: np.ndarray, n: int, w: int = HASH_W,
                           data: np.ndarray | None = None,
                           hole_out: list | None = None,
                           gap_merged: bool = False
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy left-to-right token cover from verified chain runs.

    Each run (s, r, src) certifies same-distance seed windows across
    data[s : s+r+w-1].  The frontier walk emits byte-verified matches
    within each chain's certified span, RESYNCING across gaps (chains
    merge same-distance seeds up to _CHAIN_GAP apart, so a chain may
    contain unmatched stretches; after a mismatch the walk scans for
    the next w-byte agreement at the same distance).  Matches extend
    bidirectionally past the certification with exact byte compares.
    O(#runs + scanned bytes); runs in the native runtime when
    available, numpy fallback below.

    ``data=None`` (unverified mode) emits each certified span wholesale
    and is ONLY valid for stride-1 contiguous runs (match_candidates /
    compact_runs output, where every span byte is covered by a verified
    window).  Gap-merged chain records (the stride>1 anchor path) can
    certify spans containing bytes that do NOT match at the chain's
    distance - passing them without ``data`` would corrupt the token
    stream, so that combination is rejected here.
    """
    if gap_merged and data is None:
        raise ValueError(
            "gap-merged chain records require data for byte "
            "verification (unverified mode is stride-1-only)")
    from .. import runtime
    if runtime.available():
        res = runtime.greedy_cover(run_start, run_len, run_src, n, w,
                                   data=data, hole_out=hole_out)
        if res is not None:
            return res
    kinds, lengths, dists = [], [], []
    f = 0  # emission frontier
    holes = 0  # unmatched bytes inside certified spans (adaptive-prune
    # trigger; approximate in this fallback - the native walk's scan
    # accounting is the production signal)
    dist_arr = run_start - run_src

    def emit(kind, length, dist):
        kinds.append(kind)
        lengths.append(length)
        dists.append(dist)

    for i in range(len(run_start)):
        s = int(run_start[i])
        cert_end = min(int(run_start[i] + run_len[i] + w - 1), n)
        if cert_end <= f or f >= n:
            continue
        d = int(dist_arr[i])
        start_at = s if s >= f else f
        if d < 1 or start_at - d < 0:
            continue
        if data is None:
            if cert_end - start_at < w:
                continue
            if start_at > f:
                emit(0, start_at - f, 0)
            emit(1, cert_end - start_at, d)
            f = cert_end
            continue
        scan_lim = cert_end - w
        eq = np.asarray(data[start_at:cert_end]
                        == data[start_at - d:cert_end - d])
        holes += int((~eq).sum())
        edges = np.flatnonzero(np.diff(np.concatenate(
            [[0], eq.astype(np.int8), [0]])))
        for rs_, re_ in zip(edges[::2], edges[1::2]):
            abs_s = start_at + int(rs_)
            abs_e = start_at + int(re_)
            if abs_s > scan_lim:
                break
            if abs_s < f:
                abs_s = f
            if abs_e == cert_end:  # run touches the edge: extend right
                while abs_e < n and data[abs_e] == data[abs_e - d]:
                    abs_e += 1
            # extend left over the literal gap
            while abs_s > f and abs_s - d > 0 and \
                    data[abs_s - 1] == data[abs_s - 1 - d]:
                abs_s -= 1
            if abs_e - abs_s < w:
                continue
            if abs_s > f:
                emit(0, abs_s - f, 0)
            emit(1, abs_e - abs_s, d)
            f = abs_e
            if f >= n:
                break
    if f < n:
        emit(0, n - f, 0)
    if hole_out is not None:
        hole_out.append(holes)
    return (np.array(kinds, dtype=np.uint8),
            np.array(lengths, dtype=np.int64),
            np.array(dists, dtype=np.int64))


def _bucket_size(n: int) -> int:
    """Pad chunk lengths to coarse buckets so jit caches stay warm."""
    if n <= 1 << 16:
        return 1 << 16
    b = 1 << 16
    while b < n:
        b <<= 1
    # above 8MB, step in 8MB increments instead of doubling
    if n > (1 << 23):
        step = 1 << 23
        return ((n + step - 1) // step) * step
    return b


# Recent-max run-count hints per (bucketed chunk size, stride): chunks
# of one stream have similar seed density, so the next job sizes its
# compaction cap / fetch window to skip the overflow redo.  Stored as a
# decaying max (new = max(k, 3/4 * old)) so one seed-dense stream
# cannot permanently inflate caps for later sparse streams sharing the
# process (the hint is a size heuristic only - correctness never
# depends on it).
_CAP_HINTS: dict = {}
_SEL_HINTS: dict = {}
# wire format of the selected-token readback per chunk shape: 6 B/token
# (16-bit deltas) until a chunk's dist-deltas overflow, then 8 B/token
# (absolute dists).  Downgrades again when a chunk's dist-deltas would
# comfortably fit 16 bits (collect checks the fetched dists).
_FMT_HINTS: dict = {}


def _update_hint(hints: dict, key, k: int) -> None:
    prev = hints.get(key, 0)
    hints[key] = max(k, (prev * 3) // 4)


class TpuMatchJob:
    """Asynchronously-dispatched device work for one chunk.

    Construction launches the fingerprint/sort/compact pipeline without
    blocking; ``collect()`` performs the (tiny) readbacks and the host
    greedy cover.  Submitting chunk k+1 before collecting chunk k
    overlaps device compute with host packaging/backends.
    """

    def __init__(self, data: np.ndarray, stride: int = 1,
                 dev: "jnp.ndarray | None" = None,
                 select: "bool | None" = None):
        data = np.asarray(data, dtype=np.uint8)
        self.data = data
        self.stride = stride
        self.n = len(data)
        self.stats: dict = {}
        self.trivial = self.n <= HASH_W + 4 or self.n < 4 * stride
        if self.trivial:
            return
        nb = _bucket_size(self.n)
        if dev is not None:
            # caller holds the chunk in HBM already (device-resident
            # pipeline); it must be padded to the bucketed length
            assert dev.shape[0] == nb, (dev.shape, nb)
        elif nb != self.n:
            padded = np.zeros(nb, dtype=np.uint8)
            padded[:self.n] = data
            dev = jnp.asarray(padded)
        else:
            dev = jnp.asarray(data)
        self.dev = dev
        m = nb - HASH_W + 1
        self.limit = self.n - HASH_W + 1
        self.m = m
        if select is None:
            select = (stride > 1
                      and not os.environ.get("LRZ_MATCHER_WALK"))
        self.select = select and stride > 1
        if stride > 1:
            k = m // stride
            gap_v = _verify_gap(stride)
            hkey = (nb, stride)
            # the compaction merge gathers cap elements (~41ns each on
            # TPU), so a tight cap matters; overflow redoes at the next
            # bucketed cap (never the full k - that compiles a huge
            # merge and ships megabytes through the tunnel).  A cap
            # hint from the previous same-shaped chunk avoids paying
            # that redo (an extra compaction pass + sync) every chunk
            # on seed-dense corpora.
            self.cap = max(min(k, 4096), k // 64)
            hint = _CAP_HINTS.get(hkey)
            if hint and hint > self.cap:
                self.cap = min(_bucket_cap(hint, k), k)
            self.hkey = hkey
            pos, cand, ok = anchor_candidates_unordered(dev, stride)
            dual = _seed_compact_dual_impl()
            fine, n_raw, coarse, n_w = dual(
                pos, cand, ok, jnp.int32(self.limit), self.cap, stride,
                gap_v, _CHAIN_GAP)
            self.compacted = (fine, n_raw)
            self.coarse = (coarse, n_w)

            def redo(c):
                f2, nr2, c2, nw2 = dual(
                    pos, cand, ok, jnp.int32(self.limit),
                    _bucket_cap(c, k), stride, gap_v, _CHAIN_GAP)
                self.coarse = (c2, nw2)
                return f2, nr2

            self.redo = redo
            if self.select:
                self.selected = select_records(*fine, n_raw)
                self.cov_w = _selected_coverage(*coarse, n_w)
                shint = _SEL_HINTS.get(hkey)
                self.fetch_cap = _fetch_bucket(
                    shint if shint else 8192, self.cap)
                # dispatch the packed readback NOW and start its D2H
                # copy: by collect() time the bytes are host-side.
                # The wire format follows the per-shape hint (6 B/token
                # unless dist-deltas overflowed on a previous chunk).
                self._fmt = _FMT_HINTS.get(hkey, 6)
                pack_fn = (_pack_selected16 if self._fmt == 6
                           else _pack_selected8)
                self._packed = pack_fn(
                    *self.selected, n_raw, self.cov_w, self.fetch_cap)
                try:
                    self._packed.copy_to_host_async()
                except AttributeError:
                    pass
        else:
            cand, ok = match_candidates(dev)
            self.cap = max(min(m, 4096), m // 64)
            self.compacted = _compact_impl()(
                cand, ok, jnp.int32(self.limit), self.cap)
            self.redo = lambda c: _compact_impl()(
                cand, ok, jnp.int32(self.limit), _bucket_cap(c, m))

    def _collect_walk(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Coarse-record fetch + heap-walk greedy (the round-4 path):
        gap_w chain records (start, end, dist) delta-packed; count +
        records arrive in one readback.  Used directly in walk mode and
        as the select path's coverage-gap fallback.

        The compaction-cap overflow check keys off the FINE record
        count (coarse records are merges of fine ones, so a truncated
        fine set implies a truncated coarse set)."""
        records, n_w = self.coarse
        _, n_raw = self.compacted
        key = self.hkey
        hint = _CAP_HINTS.get(key)
        fetch_cap = _fetch_bucket(hint if hint else 8192, self.cap)
        k, rs, re, src = _fetch_seeds_counted(
            *records, n_w, fetch_cap)
        kraw = int(jax.device_get(n_raw))
        if kraw > self.cap:   # chain overflow: redo at a bigger cap
            self.compacted = self.redo(kraw)
            records, n_w = self.coarse
            self.cap = int(records[0].shape[0])
            fetch_cap = self.cap
            k, rs, re, src = _fetch_seeds_counted(
                *records, n_w, fetch_cap)
        elif k > fetch_cap:  # count > window: refetch bigger
            fetch_cap = _fetch_bucket(k, self.cap)
            k, rs, re, src = _fetch_seeds_counted(
                *records, n_w, fetch_cap)
        k = min(k, fetch_cap)
        _update_hint(_CAP_HINTS, key, k)
        rs, re, src = rs[:k], re[:k], src[:k]
        rl = re - rs + 1
        kinds, lengths, dists = greedy_cover_from_runs(
            rs, rl, src, self.n, data=self.data, gap_merged=True)
        self.stats = {"chains": k}
        return kinds, lengths, dists

    def collect(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        if self.trivial:
            self.stats = {"chunk_bytes": self.n, "chains": 0,
                          "matches": 0, "match_bytes": 0,
                          "literals": 1 if self.n else 0,
                          "literal_bytes": self.n}
            if self.n == 0:
                return (np.zeros(0, np.uint8), np.zeros(0, np.int64),
                        np.zeros(0, np.int64))
            return (np.array([0], np.uint8),
                    np.array([self.n], np.int64),
                    np.array([0], np.int64))
        if self.select:
            # device-selected pieces: ONE counted readback of the final
            # token columns (KBs); host byte-verifies + extends
            ss, sl, sd, n_sel = self.selected
            _, n_raw = self.compacted
            packed = getattr(self, "_packed", None)
            fmt = getattr(self, "_fmt", 6)
            for _ in range(4):
                fo: list = []
                k, kraw, covs, s, ln, d = _fetch_selected_counted(
                    ss, sl, sd, n_sel, n_raw, self.cov_w,
                    self.fetch_cap, packed=packed, fmt=fmt, fmt_out=fo)
                packed = None  # refetches repack at the new cap
                if fo and fo[0] != 12:
                    fmt = fo[0]
                if kraw > self.cap:
                    # record-cap overflow: selection saw truncated
                    # records; redo compaction + selection at a
                    # bigger bucketed cap
                    self.compacted = self.redo(kraw)
                    records, n_raw = self.compacted
                    self.cap = int(records[0].shape[0])
                    self.selected = select_records(*records, n_raw)
                    ss, sl, sd, n_sel = self.selected
                    self.cov_w = _selected_coverage(*self.coarse[0],
                                                    self.coarse[1])
                    self.fetch_cap = min(self.fetch_cap,
                                         self.cap) & ~1
                    continue
                if k > self.fetch_cap:  # count > window: refetch
                    self.fetch_cap = _fetch_bucket(k, self.cap)
                    continue
                break
            k = min(k, self.fetch_cap)
            _update_hint(_CAP_HINTS, self.hkey, kraw)
            _update_hint(_SEL_HINTS, self.hkey, k)
            # steer the next same-shape chunk's pre-dispatched packing:
            # upgrade to absolute dists when 16-bit deltas overflowed;
            # downgrade when the fetched dists show deltas would fit
            # comfortably (hysteresis at half the exceptions budget)
            if fmt == 8 and k:
                dd = np.diff(np.concatenate([d[:1], d]))
                wide = int(((dd > 32766) | (dd < -32766)).sum())
                _FMT_HINTS[self.hkey] = 6 if wide <= _EXC_CAP // 2 \
                    else 8
            else:
                _FMT_HINTS[self.hkey] = fmt
            cov_v, cov_w = covs
            if cov_w - cov_v > max(cov_w // 4, self.n // 256):
                # the coarse (gap_w) chains would cover substantially
                # more than the exact (gap_v) spans: densely
                # interleaved redundancy (word-soup text) where the
                # heap walk's multi-chain resync wins.  Fall back for
                # this chunk (coarse records are still on device -
                # only the bigger fetch is repaid).  The trigger is a
                # pure function of chunk content, so mesh and
                # single-device paths stay byte-identical.
                kinds, lengths, dists = self._collect_walk()
                m = kinds == 1
                match_bytes = int(lengths[m].sum())
                kraw = self.stats.get("chains", kraw)
            else:
                kinds, lengths, dists = finalize_selected(
                    s[:k], ln[:k], d[:k], self.n, self.data)
                m = kinds == 1
                match_bytes = int(lengths[m].sum())
            self.stats = {
                "chunk_bytes": self.n,
                "chains": kraw,
                "matches": int(m.sum()),
                "match_bytes": match_bytes,
                "literals": int((~m).sum()),
                "literal_bytes": int(lengths[~m].sum()),
            }
            return kinds, lengths, dists
        if self.stride > 1:
            kinds, lengths, dists = self._collect_walk()
            k = self.stats.get("chains", 0)
        else:
            starts, ends, srcs, n_runs = self.compacted
            k = int(n_runs)
            if k > self.cap:  # overflow: redo at a bigger bucketed cap
                starts, ends, srcs, n_runs = self.redo(k)
                k = int(n_runs)
            if k:
                rs, re, src = _fetch_compacted(starts, ends, srcs, k)
                rl = re - rs + 1
            else:
                rs = rl = src = np.zeros(0, np.int64)
            kinds, lengths, dists = greedy_cover_from_runs(
                rs, rl, src, self.n, data=self.data)
        m = kinds == 1
        # hash-search counter parity (reference st->stats,
        # src/rzip.c:1238-1246 printed at max verbosity)
        self.stats = {
            "chunk_bytes": self.n,
            "chains": k,
            "matches": int(m.sum()),
            "match_bytes": int(lengths[m].sum()),
            "literals": int((~m).sum()),
            "literal_bytes": int(lengths[~m].sum()),
        }
        return kinds, lengths, dists


def rzip_encode_chunk_tpu(data: np.ndarray, stride: int = 1
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full TPU-path rzip encode of one chunk -> columnar tokens.

    Input is zero-padded to a bucketed static shape; padding windows sort
    after all real positions (position is the sort tiebreak), so real
    candidates are unaffected and results are sliced back to n.
    """
    return TpuMatchJob(data, stride=stride).collect()
