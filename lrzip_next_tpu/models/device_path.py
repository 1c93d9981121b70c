"""Device-resident end-to-end chunk compression / decompression.

The reference's backend stage runs on host threads after the rzip pass
(src/stream.c:1550-1834 ``compthread``; codec dispatch at
src/stream.c:167-554).  Here the whole hot path stays in HBM:

  encode:  matcher (ops/matcher) -> compacted-seed readback (KBs)
           -> host greedy cover -> literal mask + stream compaction
           (device) -> interleaved-rANS encode (ops/rans)
           -> payload readback (compressed bytes only)

  decode:  rANS decode (ops/rans, device) -> token replay
           (ops/replay pointer doubling, device) -> chunk bytes

Only token arrays (~KBs relative to the chunk) and compressed payloads
cross the host<->device boundary; the input crosses once (the matcher
upload, reused by the literal compactor via ``TpuMatchJob.dev``).

The literal stream is a subsequence of the chunk (the bytes not covered
by match tokens), so extraction is a stream compaction by a mask - the
same primitive the rANS coder uses for its emission planes
(ops/streampack.py) - instead of a per-byte gather (~40ns/element on
TPU, the reason naive approaches fail).  The mask itself comes from a
2T-element scatter of token boundaries + one cumsum, both O(chunk).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from ..format import constants as C


def _jx():
    import jax
    import jax.numpy as jnp
    return jax, jnp


def _token_bucket(t: int) -> int:
    b = 256
    while b < t:
        b <<= 1
    return b


@functools.lru_cache(maxsize=None)
def _literal_mask_fn(npos: int):
    jax, jnp = _jx()

    @jax.jit
    def mask_fn(lit_s, lit_e):
        # +1 at literal starts, -1 past literal ends; running sum > 0
        # marks literal positions.  Token spans are disjoint and sorted,
        # so the sum is only ever 0 or 1.
        delta = jnp.zeros((npos,), jnp.int32)
        delta = delta.at[lit_s].add(1, mode="drop")
        delta = delta.at[lit_e].add(-1, mode="drop")
        return jnp.cumsum(delta) > 0

    return mask_fn


def _pack_impl():
    from ..ops.rans import _pack_words_impl
    return _pack_words_impl()


def literal_spans(kinds: np.ndarray, lengths: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Chunk-coordinate (starts, ends) of literal tokens + total bytes."""
    lengths = np.asarray(lengths, dtype=np.int64)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    is_lit = np.asarray(kinds) == 0
    ls = starts[is_lit]
    le = ends[is_lit]
    return ls, le, int((le - ls).sum())


class DeviceLiteralEncode:
    """Asynchronously-dispatched device literal encode for one chunk.

    Construction dispatches mask -> compaction -> rANS encode on the
    chunk already resident in HBM; ``payload()`` performs the readbacks
    and assembles the wire payload (backends/rans_codec bitstream).
    """

    def __init__(self, dev, kinds: np.ndarray, lengths: np.ndarray,
                 ctx_bits: int):
        from ..ops import rans
        jax, jnp = _jx()
        ls, le, n_lit = literal_spans(kinds, lengths)
        self.n_lit = n_lit
        self.ctx_bits = ctx_bits
        if n_lit == 0:
            return
        npos = int(dev.shape[0])
        tb = _token_bucket(len(ls))
        ls_p = np.full(tb, npos, np.int32)
        le_p = np.full(tb, npos, np.int32)
        ls_p[:len(ls)] = ls
        le_p[:len(le)] = le
        mask = _literal_mask_fn(npos)(jnp.asarray(ls_p), jnp.asarray(le_p))
        k = rans.pick_lanes(n_lit)
        cap = rans._bucket(n_lit, k)
        packed, cnt = _pack_impl()(dev, mask, cap)
        lit_dev = packed.astype(jnp.uint8)
        (self.freqs, self.states, self.words, self.n_words,
         self.t_len) = rans.encode_arrays(lit_dev, n_lit, ctx_bits)
        # start the n_words D2H copy NOW: the pipeline queues the next
        # chunk's matcher right after this dispatch, and a readback
        # requested later would queue behind that whole graph (~86ms);
        # pre-enqueued, it lands as soon as the encode finishes
        try:
            self.n_words.copy_to_host_async()
        except AttributeError:
            pass

    def payload(self) -> Optional[bytes]:
        """Readback + wire assembly; None for an empty literal stream."""
        import jax
        from ..ops import rans
        if self.n_lit == 0:
            return None
        nw = int(self.n_words)
        freqs_h = np.asarray(jax.device_get(self.freqs))
        states_h = np.asarray(jax.device_get(self.states))
        words_h = np.asarray(jax.device_get(self.words))[:nw]
        return rans.assemble_payload(freqs_h, states_h, words_h,
                                     self.n_lit, self.ctx_bits,
                                     self.t_len)


def encode_literals_device(job, kinds: np.ndarray, lengths: np.ndarray,
                           ctx_bits: int) -> Optional[DeviceLiteralEncode]:
    """Dispatch the device literal encode for a collected TpuMatchJob.

    Returns None when the chunk never reached the device (trivial
    chunks) - the caller falls back to the host backend.
    """
    dev = getattr(job, "dev", None)
    if dev is None:
        return None
    return DeviceLiteralEncode(dev, kinds, lengths, ctx_bits)


# ---------------------------------------------------------------------------
# decode


class DeviceLitPlane:
    """Device-resident decoded literal plane for one rANS block."""

    def __init__(self, payload: bytes, u_len: int):
        import struct
        jax, jnp = _jx()
        from ..ops import rans
        hdr = rans._HDR
        if len(payload) < hdr.size:
            raise ValueError("rans payload truncated")
        magic, ctx_bits, klog, _, n, nw, tlen, t_len = hdr.unpack_from(
            payload, 0)
        if magic != rans.MAGIC or ctx_bits not in (0, 4, 6, 8) or klog > 14:
            raise ValueError("bad rans payload header")
        if n != u_len:
            raise ValueError("rans payload length mismatch")
        self.n = n
        if n == 0:
            self.plane = None
            return
        k = 1 << klog
        if t_len * k < n or t_len > (1 << 26):
            raise ValueError("bad rans payload span length")
        off = hdr.size
        freqs = rans._unpack_table(payload[off:off + tlen], 1 << ctx_bits)
        off += tlen
        if (freqs.sum(axis=1) != rans.M).any() or (freqs < 1).any():
            raise ValueError("corrupt rans frequency table")
        states = np.frombuffer(payload[off:off + 4 * k], "<u4")
        off += 4 * k
        if states.shape[0] != k:
            raise ValueError("rans payload truncated (states)")
        words = np.frombuffer(payload[off:off + 2 * nw], "<u2")
        if words.shape[0] != nw:
            raise ValueError("rans payload truncated (words)")
        self.plane, self.xf = rans.decode_arrays(
            jnp.asarray(words.astype(np.int32)), jnp.asarray(states),
            jnp.asarray(freqs.astype(np.int32)), n, ctx_bits, k, t_len)

    def check(self) -> None:
        from ..ops import rans
        _, jnp = _jx()
        if self.n and not bool(jnp.all(self.xf == rans.L)):
            raise ValueError("corrupt rans stream (final state check)")


def replay_device(kinds: np.ndarray, lengths: np.ndarray,
                  dists: np.ndarray, plane: "DeviceLitPlane"
                  ) -> Optional[bytes]:
    """Device token replay from a device-resident literal plane.

    Primary path: the native runtime flattens match chains at token
    granularity (every byte sources directly from the literal stream),
    then the ragged literal-concat kernel (ops/replay_ragged:
    aligned-window DMA + dynamic roll + masked merge) materializes the
    chunk on real accelerators; on CPU the sort-merge gather
    (ops/replay.gather_by_sort) does.  Fallback (plan blowup on
    byte-RLE chains, or no native runtime): the pointer-doubling
    resolver.

    Returns the chunk bytes, or None when the tokens reach back before
    the chunk (cross-chunk history lives on the host side).
    """
    jax, jnp = _jx()
    lengths = np.asarray(lengths, dtype=np.int64)
    out_len = int(lengths.sum())
    if out_len == 0:
        return b""
    ends = np.cumsum(lengths)
    starts = (ends - lengths).astype(np.int64)
    is_match = np.asarray(kinds) == 1
    d = np.asarray(dists, dtype=np.int64)
    if bool((d[is_match] > starts[is_match]).any()):
        return None  # cross-chunk reach: host path owns history
    lit_lens = np.where(is_match, 0, lengths)
    lit_total = int(lit_lens.sum())
    if plane.n != lit_total:
        raise ValueError("literal stream length mismatch")
    literals = plane.plane if plane.plane is not None \
        else jnp.zeros(1, jnp.uint8)

    out = _replay_gather_array(kinds, lengths, d, is_match, starts,
                               lit_lens, literals, out_len)
    res = np.asarray(jax.device_get(out))
    plane.check()
    return res.tobytes()


def _replay_gather_array(kinds, lengths, d, is_match, starts, lit_lens,
                         literals, out_len: int):
    """Flattened replay -> device uint8 array (ragged-concat kernel on
    accelerators, sort-merge gather on CPU - ops/replay.
    replay_flat_tpu picks; pointer doubling when flattening fails)."""
    jax, jnp = _jx()
    from .. import runtime
    from ..ops.replay import expand_tokens, replay_flat_tpu, resolve_bytes
    if runtime.available():
        # layered plan first: matches whose expansion would explode
        # the flat plan (long copies over fragmented regions) become
        # output-sourced pieces resolved in later kernel passes - the
        # wavefront form of the reference's fd_hist self-referential
        # replay (src/runzip.c:184-241)
        lay = runtime.flatten_replay_layered(kinds, lengths, d)
        if lay is not None:
            pl_, ps_, py_, nl = lay
            if nl == 0:
                return replay_flat_tpu(pl_, ps_, literals, out_len)
            from ..ops.replay_ragged import replay_pieces_layered
            interp = jax.devices()[0].platform == "cpu"
            return replay_pieces_layered(pl_, ps_, py_, nl, literals,
                                         out_len, interpret=interp)
    flat = runtime.flatten_replay(kinds, lengths, d) \
        if runtime.available() else None
    if flat is not None:
        return replay_flat_tpu(flat[0], flat[1], literals, out_len)
    lit_base = (np.cumsum(lit_lens) - lit_lens).astype(np.int32)
    t = len(starts)
    tb = _token_bucket(t)
    st = np.full(tb, out_len, np.int32)
    st[:t] = starts
    im = np.zeros(tb, bool)
    im[:t] = is_match
    dd = np.zeros(tb, np.int32)
    dd[:t] = d
    lb = np.zeros(tb, np.int32)
    lb[:t] = lit_base
    src, lit_idx = expand_tokens(jnp.asarray(st), jnp.asarray(im),
                                 jnp.asarray(dd), jnp.asarray(lb),
                                 out_len)
    return resolve_bytes(src, lit_idx, literals)


def replay_tokens_device_array(kinds, lengths, dists, lit_dev):
    """Token replay -> device-resident uint8 chunk (or None when a
    match reaches before the chunk).  Hardware path: native flatten +
    ragged literal-concat kernel (see replay_device)."""
    jax, jnp = _jx()
    lengths = np.asarray(lengths, dtype=np.int64)
    out_len = int(lengths.sum())
    if out_len == 0:
        return jnp.zeros((0,), jnp.uint8)
    ends = np.cumsum(lengths)
    starts = (ends - lengths).astype(np.int64)
    is_match = np.asarray(kinds) == 1
    d = np.asarray(dists, dtype=np.int64)
    if bool((d[is_match] > starts[is_match]).any()):
        return None
    lit_lens = np.where(is_match, 0, lengths)
    lit_total = int(lit_lens.sum())
    if int(lit_dev.shape[0]) < lit_total:
        # mirror replay_device's plane-length guard: a short literal
        # plane would otherwise clamp gathers into silently wrong bytes
        raise ValueError("literal stream length mismatch")
    return _replay_gather_array(kinds, lengths, d, is_match, starts,
                                lit_lens, lit_dev, out_len)
