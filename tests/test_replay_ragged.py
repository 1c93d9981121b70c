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


# ---------------------------------------------------------------------------
# round 5: layered replay (output-sourced passes)


def _layered_roundtrip(kinds, lens, dists, data, lit):
    import jax.numpy as jnp
    from lrzip_next_tpu import runtime
    from lrzip_next_tpu.ops.replay_ragged import replay_pieces_layered
    lay = runtime.flatten_replay_layered(
        np.asarray(kinds, np.uint8), np.asarray(lens, np.int64),
        np.asarray(dists, np.int64))
    assert lay is not None
    pl_, ps_, py_, nl = lay
    out = replay_pieces_layered(pl_, ps_, py_, nl,
                                jnp.asarray(lit), len(data),
                                interpret=True)
    got = np.asarray(out)
    assert np.array_equal(got, data), (
        np.flatnonzero(got != data)[:5], nl)
    return nl


def test_layered_replay_long_match_over_fragments(rng):
    """A long match copying a fragmented region must become an
    output-sourced pass instead of duplicating the fragments."""
    from lrzip_next_tpu import runtime
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    lit = rng.integers(0, 256, 40_000, dtype=np.uint8)
    # many short literal+match alternations -> fragmented first half
    kinds, lens, dists = [], [], []
    pos = 0
    lp = 0
    out = []
    for i in range(300):
        L = 40 + int(rng.integers(0, 60))
        kinds.append(0); lens.append(L); dists.append(0)
        out.append(lit[lp:lp + L]); lp += L; pos += L
        if pos > 600:
            ml = 32 + int(rng.integers(0, 64))
            d = int(rng.integers(ml, min(pos - 1, 4000)))
            kinds.append(1); lens.append(ml); dists.append(d)
            cur = np.concatenate(out)
            out.append(cur[pos - d:pos - d + ml]); pos += ml
    # the long match: copy everything so far
    cur = np.concatenate(out)
    n0 = len(cur)
    kinds.append(1); lens.append(n0); dists.append(n0)
    out.append(cur)
    # and a short match INTO the copied (deferred) region
    cur = np.concatenate(out)
    kinds.append(1); lens.append(500); dists.append(700)
    out.append(cur[len(cur) - 700:len(cur) - 700 + 500])
    data = np.concatenate(out)
    nl = _layered_roundtrip(kinds, lens, dists, data, lit[:lp])
    assert nl >= 1


def test_layered_replay_rle_chunks_stack_layers(rng):
    from lrzip_next_tpu import runtime
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    lit = rng.integers(0, 256, 3000, dtype=np.uint8)
    # literal then an overlapping (len > dist) match over a fragmented
    # region: chunks must stack layers
    kinds = [0, 1, 0, 1]
    lens = [2000, 1500, 1000, 6000]
    dists = [0, 900, 0, 2500]
    out = [lit[:2000]]
    cur = lit[:2000]
    for k, L, d in list(zip(kinds, lens, dists))[1:]:
        if k == 0:
            seg = lit[2000:3000]
        else:
            seg = np.empty(L, np.uint8)
            for i in range(L):
                seg[i] = cur[len(cur) - d + i] if i < d else seg[i - d]
            # proper self-referential semantics
            buf = np.concatenate([cur, np.zeros(L, np.uint8)])
            for i in range(L):
                buf[len(cur) + i] = buf[len(cur) - d + i]
            seg = buf[len(cur):]
        out.append(seg)
        cur = np.concatenate(out)
    data = cur
    _layered_roundtrip(kinds, lens, dists, data, lit)


def test_layered_replay_matches_flat_on_simple_plans(rng, corpus_factory):
    """Streams without pathological fragmentation must produce layer
    count 0 and byte-identical output through the flat path."""
    from lrzip_next_tpu import runtime
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    from lrzip_next_tpu.ops.matcher import TpuMatchJob
    data = np.frombuffer(corpus_factory(120_000, "mixed"), np.uint8)
    job = TpuMatchJob(data, stride=8)
    kinds, lens, dists = job.collect()
    lay = runtime.flatten_replay_layered(kinds, lens, dists)
    assert lay is not None
    lit = np.concatenate([data[e - l:e] for k, l, e in
                          zip(kinds, lens, np.cumsum(lens)) if k == 0])
    _layered_roundtrip(kinds, lens, dists, data, lit)


def test_demote_fragmenting_roundtrip(rng, corpus_factory):
    """The fragmentation-aware token rewrite must preserve the decoded
    bytes exactly while never increasing the piece count."""
    from lrzip_next_tpu import runtime
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    from lrzip_next_tpu.ops.matcher import TpuMatchJob
    base = corpus_factory(150_000, "mixed")
    data = np.frombuffer(base + base[:60_000], np.uint8)
    job = TpuMatchJob(data, stride=8)
    kinds, lens, dists = job.collect()
    res = runtime.demote_fragmenting(kinds, lens, dists)
    assert res is not None
    k2, l2, d2 = res
    assert int(l2.sum()) == len(data)
    lit = np.concatenate([data[e - l:e] for k, l, e in
                          zip(k2, l2, np.cumsum(l2)) if k == 0]) \
        if (k2 == 0).any() else np.zeros(0, np.uint8)
    out = runtime.replay_tokens(k2, l2, d2, lit, len(data))
    assert np.array_equal(out, data)
    f1 = runtime.flatten_replay(kinds, np.asarray(lens, np.int64),
                                np.asarray(dists, np.int64))
    f2 = runtime.flatten_replay(k2, np.asarray(l2, np.int64),
                                np.asarray(d2, np.int64))
    assert len(f2[0]) <= len(f1[0])
