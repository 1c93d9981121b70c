"""TPU matcher pipeline (on the CPU test mesh): correctness vs host oracle."""

import numpy as np
import pytest

from lrzip_next_tpu.format.constants import MINIMUM_MATCH
from lrzip_next_tpu.format.tokens import replay_tokens
from lrzip_next_tpu.models.rzip_host import literals_of
from lrzip_next_tpu.ops.matcher import (match_candidates,
                                        rzip_encode_chunk_tpu, runs_to_host)


def tpu_roundtrip(data: bytes) -> tuple:
    arr = np.frombuffer(data, dtype=np.uint8)
    kinds, lengths, dists = rzip_encode_chunk_tpu(arr)
    assert lengths.sum() == len(data)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    m = kinds == 1
    assert (lengths[m] >= MINIMUM_MATCH).all()
    assert (dists[m] >= 1).all()
    assert (starts[m] - dists[m] >= 0).all()
    lit = literals_of(arr, kinds, lengths)
    out = replay_tokens(kinds, lengths, dists, lit)
    assert out.tobytes() == data
    return kinds, lengths, dists


def test_candidates_find_duplicates():
    seg = np.random.default_rng(0).integers(0, 256, 4096, dtype=np.uint8)
    data = np.concatenate([seg, seg])
    import jax.numpy as jnp
    cand, ok = match_candidates(jnp.asarray(data))
    ok = np.asarray(ok)
    cand = np.asarray(cand)
    # position 4096 must match position 0
    assert ok[4096]
    assert cand[4096] == 0


def test_verification_kills_mismatches():
    # random data: no 31-byte window repeats, so no verified candidates
    data = np.random.default_rng(1).integers(0, 256, 20000, dtype=np.uint8)
    import jax.numpy as jnp
    cand, ok = match_candidates(jnp.asarray(data))
    ok = np.asarray(ok)
    assert ok.sum() == 0


def test_roundtrip_mixed(corpus_factory):
    tpu_roundtrip(corpus_factory(120_000, "mixed"))


def test_roundtrip_text(corpus_factory):
    k, l, d = tpu_roundtrip(corpus_factory(120_000, "text"))
    assert (k == 1).any()


def test_roundtrip_zeros():
    k, l, d = tpu_roundtrip(bytes(200_000))
    # run-length-style coverage: nearly everything one match
    assert l[k == 1].sum() > 190_000


def test_roundtrip_random(corpus_factory):
    tpu_roundtrip(corpus_factory(80_000, "random"))


def test_padding_buckets_no_phantom_tokens():
    # length just above a bucket boundary: padded windows must not leak
    data = np.random.default_rng(2).integers(0, 256, (1 << 16) + 7,
                                             dtype=np.uint8)
    data[-7:] = 0  # trailing zeros adjacent to the zero padding
    tpu_roundtrip(data.tobytes())


def test_long_range_dedup_quality():
    seg = np.random.default_rng(3).integers(0, 256, 50_000,
                                            dtype=np.uint8).tobytes()
    gap = np.random.default_rng(4).integers(0, 256, 200_000,
                                            dtype=np.uint8).tobytes()
    data = seg + gap + seg
    kinds, lengths, dists = tpu_roundtrip(data)
    m = kinds == 1
    # the 50k duplicate must be found nearly in full
    assert lengths[m].sum() >= 49_000


def anchor_roundtrip(data: bytes, stride: int) -> tuple:
    arr = np.frombuffer(data, dtype=np.uint8)
    kinds, lengths, dists = rzip_encode_chunk_tpu(arr, stride=stride)
    assert lengths.sum() == len(data)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    m = kinds == 1
    assert (lengths[m] >= MINIMUM_MATCH).all()
    assert (dists[m] >= 1).all()
    assert (starts[m] - dists[m] >= 0).all()
    # every emitted match must be byte-exact against the history
    for s, ln, d in zip(starts[m], lengths[m], dists[m]):
        assert np.array_equal(arr[s:s + ln], arr[s - d:s - d + ln])
    lit = literals_of(arr, kinds, lengths)
    out = replay_tokens(kinds, lengths, dists, lit)
    assert out.tobytes() == data
    return kinds, lengths, dists


@pytest.mark.parametrize("stride", [4, 8, 16, 32])
def test_anchor_roundtrip_mixed(corpus_factory, stride):
    anchor_roundtrip(corpus_factory(150_000, "mixed"), stride)


@pytest.mark.parametrize("stride", [8, 16])
def test_anchor_roundtrip_random(corpus_factory, stride):
    anchor_roundtrip(corpus_factory(80_000, "random"), stride)


@pytest.mark.parametrize("stride", [8, 32])
def test_anchor_roundtrip_zeros(stride):
    k, l, d = anchor_roundtrip(bytes(200_000), stride)
    assert l[k == 1].sum() > 190_000


@pytest.mark.parametrize("stride", [8, 16])
def test_anchor_long_range_dedup_quality(stride):
    seg = np.random.default_rng(3).integers(0, 256, 50_000,
                                            dtype=np.uint8).tobytes()
    gap = np.random.default_rng(4).integers(0, 256, 200_000,
                                            dtype=np.uint8).tobytes()
    data = seg + gap + seg
    kinds, lengths, dists = anchor_roundtrip(data, stride)
    m = kinds == 1
    # the 50k duplicate must be found nearly in full even when sampled
    assert lengths[m].sum() >= 49_000


@pytest.mark.parametrize("stride", [8, 16])
def test_anchor_shifted_copies(stride):
    # copies at alignments not multiple of stride: content-defined
    # anchors must still land on the duplicated content
    base = np.random.default_rng(7).integers(0, 256, 40_000,
                                             dtype=np.uint8)
    pad = np.random.default_rng(8).integers(0, 256, 13,
                                            dtype=np.uint8)
    data = np.concatenate([base, pad, base, pad[:7], base]).tobytes()
    kinds, lengths, dists = anchor_roundtrip(data, stride)
    m = kinds == 1
    assert lengths[m].sum() >= 2 * 40_000 - 2_000


def test_anchor_padding_no_phantom_tokens():
    data = np.random.default_rng(2).integers(0, 256, (1 << 16) + 7,
                                             dtype=np.uint8)
    data[-7:] = 0
    anchor_roundtrip(data.tobytes(), 8)


def test_default_anchor_stride_levels():
    from lrzip_next_tpu.ops.matcher import default_anchor_stride
    assert default_anchor_stride(9) == 2
    assert default_anchor_stride(7) == 8
    assert default_anchor_stride(1) == 32
    # monotone: higher level never samples sparser
    vals = [default_anchor_stride(l) for l in range(1, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_extract_strided_exact():
    """MXU selection-matmul extraction is exact for arbitrary int32
    (16-bit halves in f32) at every supported stride."""
    import jax.numpy as jnp
    from lrzip_next_tpu.ops.matcher import (_extract_strided_i32,
                                            _extract_strided_u16)
    rng = np.random.default_rng(0)
    for stride in (2, 4, 8, 16, 32):
        n = 128 * 37 * stride // stride * stride
        n = ((n + 127) // 128) * 128
        x = rng.integers(-2**31, 2**31, n, dtype=np.int64).astype(np.int32)
        got = np.asarray(_extract_strided_i32(jnp.asarray(x), stride))
        np.testing.assert_array_equal(got, x[::stride])
        x16 = rng.integers(0, 1 << 13, n).astype(np.int32)
        got16 = np.asarray(_extract_strided_u16(jnp.asarray(x16), stride))
        np.testing.assert_array_equal(got16, x16[::stride])


def test_greedy_resync_across_gaps():
    """A single gappy chain record recovers matches on BOTH sides of an
    unmatched stretch (greedy_cover resync: matcher._CHAIN_GAP merges
    same-distance seeds across interruptions; the walk re-verifies and
    re-syncs at the chain's distance)."""
    import numpy as np
    from lrzip_next_tpu.ops.matcher import greedy_cover_from_runs
    rng = np.random.default_rng(5)
    seg_a = rng.integers(0, 256, 500, dtype=np.uint8)
    seg_b = rng.integers(0, 256, 500, dtype=np.uint8)
    noise = rng.integers(0, 256, 120, dtype=np.uint8)
    # layout: A B | A noise B[120:]  - the second copy substitutes 120
    # bytes in place, so dist-1000 matches hold on BOTH sides of the
    # unmatched stretch
    data = np.concatenate([seg_a, seg_b, seg_a, noise, seg_b[120:]])
    n = len(data)
    # one merged chain certifying [1000, 2240): covers A, the gap, B
    rs = np.array([1000], np.int64)
    rl = np.array([1100], np.int64)  # cert end ~ 2131
    src = rs - 1000
    kinds, lengths, dists = greedy_cover_from_runs(rs, rl, src, n,
                                                   data=data)
    m = kinds == 1
    assert m.sum() == 2, (kinds, lengths)   # A-match AND B-match
    assert int(lengths[m].sum()) == 880  # 500 + (500 - 120)
    # replay correctness
    lit = b"".join(
        data[int(e - l):int(e)].tobytes()
        for k, e, l in zip(kinds, np.cumsum(lengths), lengths) if k == 0)
    from lrzip_next_tpu.format.tokens import replay_tokens
    out = replay_tokens(kinds, lengths, dists,
                        np.frombuffer(lit, np.uint8))
    assert np.array_equal(out, data)


def test_chain_prune_keeps_ratio(corpus_factory):
    """End-to-end ratio guard: the coverage prune + gap merge must not
    cost compression on a long-range-redundant corpus (the TPU match
    path vs the exhaustive host rzip encoder)."""
    import numpy as np
    from lrzip_next_tpu.ops.matcher import rzip_encode_chunk_tpu
    from lrzip_next_tpu.models.rzip_host import rzip_encode_chunk
    base = corpus_factory(120_000, "mixed")
    # two far-apart copies with local noise interruptions inside
    rng = np.random.default_rng(9)
    b = bytearray(base)
    for off in range(10_000, 110_000, 17_000):
        b[off:off + 40] = rng.integers(0, 256, 40, dtype=np.uint8).tobytes()
    data = np.frombuffer(base + bytes(b), np.uint8)
    kinds, lengths, dists = rzip_encode_chunk_tpu(data, stride=8)
    m = kinds == 1
    tpu_match = int(lengths[m].sum())
    hk, hl, hd = rzip_encode_chunk(data)
    hm = hk == 1
    host_match = int(hl[hm].sum())
    # the sampled+pruned TPU path must keep >= 90% of the exhaustive
    # host matcher's matched bytes on this corpus
    assert tpu_match >= 0.9 * host_match, (tpu_match, host_match)


# ---------------------------------------------------------------------------
# round 5: device-side greedy selection path


def _replay_check(data, kinds, lengths, dists):
    lit = b"".join(
        data[e - l:e].tobytes()
        for k, e, l in zip(kinds, np.cumsum(lengths), lengths) if k == 0)
    out = replay_tokens(kinds, lengths, dists,
                        np.frombuffer(lit, np.uint8))
    assert np.array_equal(out, data)
    assert int(np.asarray(lengths).sum()) == len(data)
    m = np.asarray(kinds) == 1
    assert (np.asarray(lengths)[m] >= MINIMUM_MATCH).all()
    return int(np.asarray(lengths)[m].sum())


@pytest.mark.parametrize("stride", [2, 8, 16, 32])
def test_select_path_roundtrip(corpus_factory, stride):
    from lrzip_next_tpu.ops.matcher import TpuMatchJob
    data = np.frombuffer(corpus_factory(300_000, "mixed"), np.uint8)
    job = TpuMatchJob(data, stride=stride, select=True)
    assert job.select
    _replay_check(data, *job.collect())


def test_select_path_interrupted_copies(corpus_factory):
    """Device selection + host finalize must resync across interior
    holes and keep near-walk match coverage on solid-repeat data."""
    from lrzip_next_tpu.ops.matcher import TpuMatchJob
    base = corpus_factory(200_000, "mixed")
    rng = np.random.default_rng(5)
    b = bytearray(base)
    for off in range(5_000, 190_000, 23_000):
        b[off:off + 8] = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
    data = np.frombuffer(base + bytes(b) + base[:50_000], np.uint8)
    sel_job = TpuMatchJob(data, stride=8, select=True)
    sel_bytes = _replay_check(data, *sel_job.collect())
    walk_job = TpuMatchJob(data, stride=8, select=False)
    walk_bytes = _replay_check(data, *walk_job.collect())
    assert sel_bytes >= 0.97 * walk_bytes, (sel_bytes, walk_bytes)


def test_select_hole_fallback_on_dense_text(corpus_factory):
    """Ubiquitous-small-distance text shadows alternative chains under
    the prefix-max selection; the hole-rate trigger must fall back to
    the heap walk and keep its coverage (and arm the walk hint for
    same-shaped successors)."""
    from lrzip_next_tpu.ops import matcher as M
    base = corpus_factory(200_000, "text")
    rng = np.random.default_rng(5)
    b = bytearray(base)
    for off in range(5_000, 190_000, 23_000):
        b[off:off + 8] = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
    data = np.frombuffer(base + bytes(b) + base[:50_000], np.uint8)
    sel_job = M.TpuMatchJob(data, stride=8, select=True)
    sel_tokens = sel_job.collect()
    sel_bytes = _replay_check(data, *sel_tokens)
    walk_job = M.TpuMatchJob(data, stride=8, select=False)
    walk_tokens = walk_job.collect()
    walk_bytes = _replay_check(data, *walk_tokens)
    assert sel_bytes >= 0.97 * walk_bytes, (sel_bytes, walk_bytes)
    # the fallback is a pure function of chunk content: the select-mode
    # job's post-fallback tokens equal the walk path's exactly (the
    # mesh/single-device byte-parity invariant)
    for a, b in zip(sel_tokens, walk_tokens):
        assert np.array_equal(a, b)


def test_finalize_rejects_corrupt_pieces(corpus_factory):
    """A lying selected piece (bad dist / non-matching span) must shrink
    or vanish - never corrupt the replayed stream (the fingerprint-
    collision safety net)."""
    from lrzip_next_tpu.ops.matcher import finalize_selected
    data = np.frombuffer(corpus_factory(100_000, "mixed"), np.uint8)
    data = np.concatenate([data, data[:40_000]])
    rng = np.random.default_rng(7)
    starts = np.array([100_000, 110_000, 120_000], np.int64)
    lens = np.array([5_000, 4_000, 6_000], np.int64)
    dists = np.array([100_000, 777, 99_995], np.int64)  # mid one lies
    kinds, out_l, out_d = finalize_selected(starts, lens, dists,
                                            len(data), data)
    _replay_check(data, kinds, out_l, out_d)


def test_finalize_extends_and_merges(corpus_factory):
    """Left/right extension: a piece clipped short of the true match
    must grow back to the full span during finalize."""
    from lrzip_next_tpu.ops.matcher import finalize_selected
    base = np.frombuffer(corpus_factory(80_000, "text"), np.uint8)
    data = np.concatenate([base, base])  # full 80K repeat at dist 80K
    starts = np.array([85_000], np.int64)   # interior sliver only
    lens = np.array([64], np.int64)
    dists = np.array([80_000], np.int64)
    kinds, out_l, out_d = finalize_selected(starts, lens, dists,
                                            len(data), data)
    m = np.asarray(kinds) == 1
    assert int(np.asarray(out_l)[m].sum()) >= 75_000  # grew to ~full
    _replay_check(data, kinds, out_l, out_d)


def test_gap_merged_requires_data():
    from lrzip_next_tpu.ops.matcher import greedy_cover_from_runs
    with pytest.raises(ValueError):
        greedy_cover_from_runs(np.array([0], np.int64),
                               np.array([10], np.int64),
                               np.array([0], np.int64), 1000,
                               gap_merged=True)


def test_pack16_fetch_roundtrip_exact():
    """The 6-byte/token packed readback must reproduce starts/lens/
    dists exactly, including exception tokens (wide start gaps, long
    pieces, dist jumps) interleaved with narrow ones."""
    import jax.numpy as jnp
    from lrzip_next_tpu.ops import matcher as M
    rng = np.random.default_rng(11)
    for trial in range(4):
        k = int(rng.integers(5, 300))
        fc = 512
        gaps = rng.integers(0, 200_000, k)  # many exceed u16
        lens = rng.integers(31, 150_000, k)
        starts = np.cumsum(gaps + lens) - lens
        dists = rng.integers(1, 1 << 25, k)
        ss = np.full(fc, 0x7FFFFFF0, np.int32)
        sl = np.zeros(fc, np.int32)
        sd = np.zeros(fc, np.int32)
        ss[:k] = starts; sl[:k] = lens; sd[:k] = dists
        out = M._fetch_selected_counted(
            jnp.asarray(ss), jnp.asarray(sl), jnp.asarray(sd),
            jnp.int32(k), jnp.int32(k), jnp.int32(12345), fc)
        k2, kraw, covs, s, ln, d = out
        assert k2 == k and kraw == k
        assert covs == (int(lens.sum()), 12345)
        assert np.array_equal(s, starts)
        assert np.array_equal(ln, lens)
        assert np.array_equal(d, dists)


def test_pack16_narrow_values_no_exceptions():
    import jax.numpy as jnp
    from lrzip_next_tpu.ops import matcher as M
    k, fc = 64, 128
    starts = np.cumsum(np.full(k, 100))
    lens = np.full(k, 40)
    dists = np.full(k, 777)
    ss = np.full(fc, 0x7FFFFFF0, np.int32)
    sl = np.zeros(fc, np.int32); sd = np.zeros(fc, np.int32)
    ss[:k] = starts; sl[:k] = lens; sd[:k] = dists
    k2, kraw, covs, s, ln, d = M._fetch_selected_counted(
        jnp.asarray(ss), jnp.asarray(sl), jnp.asarray(sd),
        jnp.int32(k), jnp.int32(k), jnp.int32(0), fc)
    assert np.array_equal(s, starts) and np.array_equal(d, dists)


def test_pack8_absolute_dists_roundtrip():
    """The 8 B/token format (u16 deltas + absolute i32 dists) must
    round-trip selections whose dist-deltas overflow 16 bits on nearly
    every token (long-range corpora), with and without start/len
    exceptions."""
    import jax.numpy as jnp
    from lrzip_next_tpu.ops import matcher as M
    rng = np.random.default_rng(23)
    for trial in range(4):
        k = int(rng.integers(5, 400))
        fc = 1024
        wide = trial % 2  # alternate: u16-safe vs exception-heavy
        gaps = rng.integers(0, 200_000 if wide else 1000, k)
        lens = rng.integers(31, 150_000 if wide else 60_000, k)
        starts = np.cumsum(gaps + lens) - lens
        # dist-deltas jump by tens of MB: the 6B format overflows
        dists = rng.integers(1, 1 << 26, k)
        ss = np.full(fc, 0x7FFFFFF0, np.int32)
        sl = np.zeros(fc, np.int32)
        sd = np.zeros(fc, np.int32)
        ss[:k] = starts; sl[:k] = lens; sd[:k] = dists
        fo = []
        k2, kraw, covs, s, ln, d = M._fetch_selected_counted(
            jnp.asarray(ss), jnp.asarray(sl), jnp.asarray(sd),
            jnp.int32(k), jnp.int32(k), jnp.int32(7), fc,
            fmt=8, fmt_out=fo)
        assert fo == [8]
        assert k2 == k and kraw == k
        assert covs == (int(lens.sum()), 7)
        assert np.array_equal(s, starts)
        assert np.array_equal(ln, lens)
        assert np.array_equal(d, dists)


def test_pack_fmt_cascade_6_to_8():
    """A 6B-format fetch whose dist-delta exceptions overflow must
    cascade to the 8B format (not the 12B int32 fallback) and report
    the used format through fmt_out."""
    import jax.numpy as jnp
    from lrzip_next_tpu.ops import matcher as M
    k = M._EXC_CAP + 512   # more wide dist-deltas than the 6B budget
    fc = 4096
    starts = np.cumsum(np.full(k, 100))
    lens = np.full(k, 40)
    dists = (np.arange(k) % 2) * 1_000_000 + 1  # |dd| >> 32766
    ss = np.full(fc, 0x7FFFFFF0, np.int32)
    sl = np.zeros(fc, np.int32)
    sd = np.zeros(fc, np.int32)
    ss[:k] = starts; sl[:k] = lens; sd[:k] = dists
    fo = []
    k2, kraw, covs, s, ln, d = M._fetch_selected_counted(
        jnp.asarray(ss), jnp.asarray(sl), jnp.asarray(sd),
        jnp.int32(k), jnp.int32(k), jnp.int32(0), fc,
        fmt=6, fmt_out=fo)
    assert fo == [8]
    assert np.array_equal(s, starts)
    assert np.array_equal(ln, lens)
    assert np.array_equal(d, dists)
