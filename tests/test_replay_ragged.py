"""Ragged literal-concat replay (ops/replay_ragged) vs numpy twin.

The piece plans mirror what runtime.flatten_replay emits (contiguous
dst coverage, arbitrary literal-plane sources), including adversarial
shapes: 1-byte pieces, pieces crossing cell boundaries, pieces longer
than a cell, sources at every misalignment, and multi-call plans.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lrzip_next_tpu.ops import replay_ragged as rr


def _random_plan(rng, out_len, lit_len, frag_mode="mixed"):
    """Random piece plan covering [0, out_len) from a lit_len plane."""
    lens = []
    left = out_len
    while left > 0:
        if frag_mode == "tiny":
            l = int(rng.integers(1, 8))
        elif frag_mode == "big":
            l = int(rng.integers(2000, 30000))
        else:
            r = rng.random()
            if r < 0.3:
                l = int(rng.integers(1, 16))
            elif r < 0.8:
                l = int(rng.integers(16, 1500))
            else:
                l = int(rng.integers(1500, 20000))
        l = min(l, left)
        lens.append(l)
        left -= l
    lens = np.asarray(lens, np.int64)
    srcs = np.asarray(
        [rng.integers(0, lit_len - l + 1) for l in lens], np.int64)
    return lens, srcs


@pytest.mark.parametrize("mode", ["mixed", "tiny", "big"])
def test_plan_properties(mode):
    rng = np.random.default_rng(7)
    out_len = 50_000
    lens, srcs = _random_plan(rng, out_len, 70_000, mode)
    plan = rr.plan_ragged(lens, srcs, out_len, 70_000)
    total = 0
    for c0, nc, base, meta, lo in plan.calls:
        dlo = meta & (rr.CELL - 1)
        flen = ((meta >> 13) & (rr.CELL - 1)) + 1
        assert (dlo + flen <= rr.CELL).all()
        assert (base >= 1).all()
        assert lo[0] == 0 and lo[-1] == len(base)
        assert (np.diff(lo) >= 0).all()
        total += int(flen.sum())
    # cell-boundary cuts never change the total byte count
    assert total == out_len


def test_merge_contiguous():
    lens = np.array([5, 7, 3, 10], np.int64)
    lits = np.array([0, 5, 40, 43], np.int64)
    ml, ms = rr.merge_contiguous(lens, lits)
    assert ml.tolist() == [12, 13]
    assert ms.tolist() == [0, 40]


@pytest.mark.parametrize("mode", ["mixed", "tiny", "big"])
@pytest.mark.parametrize("out_len", [1, 777, rr.CELL, rr.CELL + 1,
                                     40_000])
def test_kernel_interpret_roundtrip(mode, out_len):
    rng = np.random.default_rng(out_len * 31 + len(mode))
    lit_len = max(out_len + 1000, 2000)
    lit = rng.integers(0, 256, size=lit_len, dtype=np.uint8)
    lens, srcs = _random_plan(rng, out_len, lit_len, mode)
    want = rr.replay_pieces_reference(lens, srcs, lit, out_len)
    got = rr.replay_pieces_ragged(lens, srcs, jnp.asarray(lit),
                                  out_len, interpret=True)
    assert np.array_equal(np.asarray(got), want)


def test_multi_call_split(monkeypatch):
    monkeypatch.setattr(rr, "_MAX_SMEM_FRAGS", 8)
    rng = np.random.default_rng(3)
    out_len = 60_000
    lit_len = 80_000
    lit = rng.integers(0, 256, size=lit_len, dtype=np.uint8)
    lens, srcs = _random_plan(rng, out_len, lit_len, "mixed")
    plan = rr.plan_ragged(lens, srcs, out_len, lit_len)
    assert len(plan.calls) > 1
    want = rr.replay_pieces_reference(lens, srcs, lit, out_len)
    got = rr.replay_pieces_ragged(lens, srcs, jnp.asarray(lit),
                                  out_len, interpret=True)
    assert np.array_equal(np.asarray(got), want)


def test_every_misalignment():
    """One piece per (src%1024 x dst%1024 sample grid) so the rotate
    path is proven at many offsets, incl. roff == 0."""
    rng = np.random.default_rng(11)
    lit_len = 40_000
    lit = rng.integers(0, 256, size=lit_len, dtype=np.uint8)
    lens, srcs = [], []
    offs = [0, 1, 3, 127, 128, 1023, 511]
    for i, so in enumerate(offs):
        lens.append(1024 + i * 7)
        srcs.append(so + 2048 * i)
    lens = np.asarray(lens, np.int64)
    srcs = np.asarray(srcs, np.int64)
    out_len = int(np.sum(lens))
    want = rr.replay_pieces_reference(lens, srcs, lit, out_len)
    got = rr.replay_pieces_ragged(lens, srcs, jnp.asarray(lit),
                                  out_len, interpret=True)
    assert np.array_equal(np.asarray(got), want)
