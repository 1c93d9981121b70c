"""DMA-planned replay (ops/replay_dma) vs byte-serial reference replay.

Token streams come from the real rzip host encoder over adversarial
inputs (overlapping RLE, tiny literals, long repeats), so the planner's
doubling/prescatter/fence machinery is exercised end to end.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lrzip_next_tpu.ops.replay_dma import (plan_replay,
                                           replay_plan_device,
                                           replay_tokens_dma)


def _ref_replay(kinds, lengths, dists, literals):
    out = bytearray()
    li = 0
    for k, l, d in zip(kinds, lengths, dists):
        l = int(l)
        if k == 0:
            out += literals[li:li + l]
            li += l
        else:
            d = int(d)
            for _ in range(l):
                out.append(out[len(out) - d])
    return bytes(out)


def _tokens_for(data: bytes):
    from lrzip_next_tpu.models.rzip_host import rzip_encode_chunk
    kinds, lengths, dists = rzip_encode_chunk(
        np.frombuffer(data, np.uint8))
    lit = b"".join(
        data[int(s - l):int(s)] for k, s, l in zip(
            kinds, np.cumsum(lengths), lengths) if k == 0)
    return kinds, lengths, dists, lit


def _corpus(seed, n):
    rng = np.random.default_rng(seed)
    parts = []
    # text-ish block with long-range repeats, RLE runs, tiny pieces
    base = rng.integers(32, 127, size=n // 4, dtype=np.uint8).tobytes()
    parts.append(base)
    parts.append(b"a" * 300)                        # dist-1 RLE
    parts.append(b"xy" * 200)                       # dist-2 RLE
    parts.append(b"0123456789abcd" * 40)            # dist-14 RLE
    parts.append(base[: n // 8])                    # long-range repeat
    parts.append(rng.integers(0, 256, size=97, dtype=np.uint8).tobytes())
    parts.append(base[100: 100 + n // 8])
    parts.append(b"Z" * 37)
    blob = b"".join(parts)
    return blob[:n] if len(blob) > n else blob


@pytest.mark.parametrize("seed,n", [(1, 1 << 13)])
def test_replay_dma_matches_reference(seed, n):
    data = _corpus(seed, n)
    kinds, lengths, dists, lit = _tokens_for(data)
    ref = _ref_replay(kinds, lengths, dists, lit)
    assert ref == data  # sanity: the host encoder round-trips
    out = replay_tokens_dma(kinds, lengths, dists,
                            jnp.asarray(np.frombuffer(lit, np.uint8)),
                            interpret=True)
    assert out is not None
    assert np.asarray(out).tobytes() == data


@pytest.mark.slow
def test_replay_dma_synthetic_edge_tokens():
    # hand-built streams: tiny literals, dist<16 RLE with long lengths,
    # crumb tails, back-to-back matches
    lit = b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnop0123456789"
    cases = [
        # tiny literal + dist-1 RLE spanning several doublings + crumb
        ([0, 1], [3, 300], [0, 1]),
        # dist-3 RLE, length not a multiple, after a 32B literal
        ([0, 1, 0], [32, 101, 5], [0, 3, 0]),
        # plain long match of a 32B literal, then overlapping dist-16
        ([0, 1, 1], [32, 32, 200], [0, 32, 16]),
        # dist-15 (tiny period) RLE
        ([0, 1], [15, 500], [0, 15]),
        # crumb: match len 33, dist 16 -> doubling 16+16+1
        ([0, 1], [16, 33], [0, 16]),
    ]
    for kinds, lengths, dists in cases:
        need = sum(l for k, l in zip(kinds, lengths) if k == 0)
        ref = _ref_replay(kinds, lengths, dists, lit[:need])
        out = replay_tokens_dma(
            np.asarray(kinds, np.uint8), np.asarray(lengths, np.int64),
            np.asarray(dists, np.int64),
            jnp.asarray(np.frombuffer(lit[:need], np.uint8)),
            interpret=True)
        assert np.asarray(out).tobytes() == ref, (kinds, lengths, dists)


def _simulate(plan, lit: bytes) -> bytes:
    """Execute a ReplayPlan with numpy (tile-order semantics): fast
    logic coverage for the planner without the interpret-mode kernel."""
    from lrzip_next_tpu.ops.replay_dma import _CLASSES
    out = np.zeros(plan.out_len + (1 << 20), np.uint8)
    litv = np.pad(np.frombuffer(lit, np.uint8), (0, 1 << 20))
    if len(plan.tiny_q):
        out[plan.tiny_q] = litv[plan.tiny_lit]
    for i in range(plan.n_tiles):
        g = _CLASSES[plan.cls[i]]
        s, d = plan.src[i], plan.dst[i]
        src = litv if plan.buf[i] == 0 else out
        out[d:d + g] = src[s:s + g].copy()
    return out[:plan.out_len].tobytes()


def test_plan_simulation_edge_tokens():
    # planner logic (doubling, crumbs, tiny periods, prescatter) at
    # full lengths, validated through the numpy executor
    lit = b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnop0123456789"
    cases = [
        ([0, 1], [3, 100_000], [0, 1]),
        ([0, 1, 0], [32, 10_001, 5], [0, 3, 0]),
        ([0, 1, 1], [32, 32, 50_000], [0, 32, 16]),
        ([0, 1], [15, 40_000], [0, 15]),
        ([0, 1], [16, 33], [0, 16]),
        ([0, 1, 1, 0], [32, 31, 64, 7], [0, 17, 60, 0]),
    ]
    for kinds, lengths, dists in cases:
        need = sum(l for k, l in zip(kinds, lengths) if k == 0)
        ref = _ref_replay(kinds, lengths, dists, lit[:need])
        plan = plan_replay(
            np.asarray(kinds, np.uint8), np.asarray(lengths, np.int64),
            np.asarray(dists, np.int64))
        assert _simulate(plan, lit[:need]) == ref, (kinds, lengths,
                                                    dists)


@pytest.mark.parametrize("seed,n", [(2, 200_000), (3, 1 << 16),
                                    (4, 300_000)])
def test_plan_simulation_matches_reference(seed, n):
    data = _corpus(seed, n)
    kinds, lengths, dists, lit = _tokens_for(data)
    plan = plan_replay(kinds, lengths, dists)
    assert _simulate(plan, lit) == data
    # every step's tiles must fit the kernel's slot budget
    widths = np.diff(plan.step_lo)
    assert widths.max(initial=1) <= 64


def test_plan_rejects_cross_chunk():
    plan = plan_replay(np.array([1], np.uint8), np.array([40], np.int64),
                       np.array([50], np.int64))
    assert plan is None
