"""From-scratch LZMA1 codec (runtime/csrc/lzma.cpp) vs liblzma.

Three-way validation on every corpus: self round trip, liblzma decodes
our streams, we decode liblzma streams.  The SDK-oracle directions live
in tests/test_reference_interop.py.
"""

import lzma

import numpy as np
import pytest

from lrzip_next_tpu import runtime

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime unavailable")

FILT = [{"id": lzma.FILTER_LZMA1, "dict_size": 1 << 24,
         "lc": 3, "lp": 0, "pb": 2}]


def _lib_dec(payload: bytes, n: int) -> bytes:
    d = lzma.LZMADecompressor(format=lzma.FORMAT_RAW, filters=FILT)
    return d.decompress(payload, max_length=n)


def _lib_enc(data: bytes) -> bytes:
    c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=FILT)
    return c.compress(data) + c.flush()


def _corpora(corpus_factory):
    return {
        "text": corpus_factory(120_000, "text"),
        "mixed": corpus_factory(80_000, "mixed"),
        "random": corpus_factory(40_000, "random"),
        "zeros": bytes(60_000),
        "rle": b"ab" * 30_000,
        "tiny": b"x",
        "empty": b"",
    }


def test_three_way_validation(corpus_factory):
    for name, data in _corpora(corpus_factory).items():
        ours = runtime.lzma1_encode(data)
        assert ours is not None
        assert runtime.lzma1_decode(ours, len(data)) == data, name
        assert _lib_dec(ours, len(data)) == data, name
        ref = _lib_enc(data)
        assert runtime.lzma1_decode(ref, len(data)) == data, name


def test_max_match_len_boundary():
    """Regression: runs longer than kMatchMaxLen=273 must be split, not
    overflow the 8-bit high length tree (the len-274 bug)."""
    rng = np.random.default_rng(7)
    for period in (10, 100, 5000):
        base = rng.integers(0, 256, period, dtype=np.uint8).tobytes()
        for L in (272, 273, 274, 275, 546, 547, 1000):
            data = (base + base * (L // period + 2))[:period + L]
            ours = runtime.lzma1_encode(data)
            assert runtime.lzma1_decode(ours, len(data)) == data
            assert _lib_dec(ours, len(data)) == data


def test_ratio_close_to_liblzma(corpus_factory):
    data = corpus_factory(200_000, "text")
    ours = runtime.lzma1_encode(data, level=4)
    # class-for-class: our lazy/HC parse vs liblzma's MODE_FAST/HC4
    c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=[
        dict(FILT[0], mode=lzma.MODE_FAST, mf=lzma.MF_HC4, nice_len=64)])
    fast_ref = c.compress(data) + c.flush()
    assert len(ours) < len(fast_ref) * 1.05
    # sanity vs the optimal BT4 parse (the level 5-9 path)
    assert len(ours) < len(_lib_enc(data)) * 1.30


def test_corrupt_streams_rejected(corpus_factory):
    data = corpus_factory(50_000, "text")
    ours = bytearray(runtime.lzma1_encode(data))
    for k in (7, len(ours) // 2, len(ours) - 3):
        bad = bytearray(ours)
        bad[k] ^= 0xFF
        try:
            out = runtime.lzma1_decode(bytes(bad), len(data))
            # a flip may decode to different bytes without a structural
            # error; it must never crash or hang, and usually errors
            assert out is None or len(out) == len(data)
        except ValueError:
            pass
    with pytest.raises(ValueError):
        runtime.lzma1_decode(b"", 100)
    with pytest.raises(ValueError):
        runtime.lzma1_decode(bytes(ours[:4]), len(data))


def test_dict_size_respected():
    """Distances must stay within dict_size so the reference's windowed
    decoder can replay our streams."""
    rng = np.random.default_rng(3)
    seg = rng.integers(0, 256, 60_000, dtype=np.uint8).tobytes()
    data = seg + bytes(100) + seg  # repeat at distance ~60k
    small = runtime.lzma1_encode(data, dict_size=1 << 12)
    big = runtime.lzma1_encode(data, dict_size=1 << 20)
    assert len(big) < len(small)  # big dict sees the repeat
    for c in (small, big):
        assert runtime.lzma1_decode(c, len(data)) == data


def test_backend_uses_native(corpus_factory):
    from lrzip_next_tpu.backends import BackendConfig
    from lrzip_next_tpu.backends.lzma_codec import compress, decompress
    data = corpus_factory(100_000, "mixed")
    for level in (1, 3, 4, 7, 9):
        cfg = BackendConfig(compression_level=level)
        c = compress(data, cfg)
        assert decompress(c, len(data), cfg) == data
        assert _lib_dec(c, len(data)) == data  # liblzma-compatible


def test_optimal_parse_levels_5_to_9(corpus_factory):
    """Normal mode (BT4 + price-table optimal parse): three-way
    validation and ratio parity with liblzma's BT4 at every level
    (reference vendored path: LzmaEnc.c:1219-1968 GetOptimum +
    LzFind.c:962-1400 BT4)."""
    corp = {
        "text": corpus_factory(200_000, "text"),
        "mixed": corpus_factory(120_000, "mixed"),
        "random": corpus_factory(50_000, "random"),
        "zeros": bytes(80_000),
        "periodic": (b"hdr" + bytes(range(97))) * 800,
    }
    for level in (5, 6, 7, 8, 9):
        for name, data in corp.items():
            ours = runtime.lzma1_encode(data, level=level)
            assert ours is not None or name == "random"
            if ours is None:
                continue
            assert runtime.lzma1_decode(ours, len(data)) == data, \
                (level, name)
            assert _lib_dec(ours, len(data)) == data, (level, name)
    # ratio parity vs liblzma BT4 normal mode at the default level
    data = corp["text"] + corp["mixed"] + corp["periodic"]
    ours = runtime.lzma1_encode(data, level=7)
    c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=[
        dict(FILT[0], mode=lzma.MODE_NORMAL, mf=lzma.MF_BT4,
             nice_len=64)])
    ref = c.compress(data) + c.flush()
    assert len(ours) <= len(ref) * 1.01, (len(ours), len(ref))


def test_optimal_parse_rep_heavy():
    """Structured data exercising rep0-3 reuse and shortreps."""
    rows = []
    for i in range(4000):
        rows.append(b"field=%04d;flag=%d;" % (i, i & 1))
    data = b"".join(rows)
    for level in (5, 9):
        ours = runtime.lzma1_encode(data, level=level)
        assert runtime.lzma1_decode(ours, len(data)) == data
        assert _lib_dec(ours, len(data)) == data
    # the composite move+literal+rep0 DP transition keeps the
    # rep-establishing path alive on periodic data; without it this
    # adversarial case was +25% over liblzma
    ref = _lib_enc(data)
    assert len(runtime.lzma1_encode(data, level=9)) <= len(ref) * 1.02


def test_bt_finder_family(corpus_factory, monkeypatch):
    """bt2/bt3/bt5 match-finder variants (the SDK's numHashBytes family,
    LzFind.c:962-1400) produce valid streams our decoder and liblzma
    both accept; bt4 stays the default."""
    data = corpus_factory(200_000, "mixed")
    base = runtime.lzma1_encode(data, level=7)
    for mf in ("bt2", "bt3", "bt4", "bt5"):
        monkeypatch.setenv("LRZ_LZMA_MF", mf)
        ours = runtime.lzma1_encode(data, level=7)
        assert runtime.lzma1_decode(ours, len(data)) == data, mf
        assert _lib_dec(ours, len(data)) == data, mf
        # deeper hashes must stay within a few % of bt4's size
        assert len(ours) < len(base) * 1.25, (mf, len(ours), len(base))
    monkeypatch.setenv("LRZ_LZMA_MF", "bt4")
    again = runtime.lzma1_encode(data, level=7)
    assert again == base


def test_lzma_mf_surface(corpus_factory, monkeypatch):
    """--lzma-mf plumbing: the explicit mf parameter selects the
    finder (Settings.lzma_mf -> BackendConfig -> lzma1_encode), beats
    the env var, and archives round-trip + liblzma-decode for every
    family."""
    monkeypatch.delenv("LRZ_LZMA_MF", raising=False)
    data = corpus_factory(150_000, "mixed")
    outs = {}
    for mf in (2, 3, 4, 5):
        ours = runtime.lzma1_encode(data, level=7, mf=mf)
        assert runtime.lzma1_decode(ours, len(data)) == data, mf
        assert _lib_dec(ours, len(data)) == data, mf
        outs[mf] = ours
    # the explicit parameter wins over the env var
    monkeypatch.setenv("LRZ_LZMA_MF", "bt2")
    assert runtime.lzma1_encode(data, level=7, mf=5) == outs[5]
    # mf=0 honors the env debug override
    assert runtime.lzma1_encode(data, level=7) == outs[2]
    monkeypatch.delenv("LRZ_LZMA_MF", raising=False)
    # full archive path through Settings
    import lrzip_next_tpu as lrz
    for mf_code in (2, 5):
        s = lrz.Settings(method="lzma", lzma_mf=mf_code)
        arch = lrz.compress(data, s)
        assert lrz.decompress(arch) == data


def test_bemt_pipelined_finder_pinned(corpus_factory):
    """Backend-MT (the LzFindMt-analog pipelined finder) contract:
    repeatable streams, ratio within 1% of single-thread, decodable by
    us and liblzma.  Speedup is corpus-dependent (measured matrix in
    docs/BENCHMARKS.md: 1.3-1.8x on this 2-CPU box); this test pins
    the invariants that make the dial safe, not a timing."""
    for kind in ("mixed", "text"):
        data = corpus_factory(600_000, kind)
        one = runtime.lzma1_encode(data, level=7, threads=1)
        two = runtime.lzma1_encode(data, level=7, threads=2)
        again = runtime.lzma1_encode(data, level=7, threads=2)
        assert two == again, "bemt stream must be run-to-run stable"
        assert len(two) <= len(one) * 1.01, (len(two), len(one))
        assert runtime.lzma1_decode(two, len(data)) == data
        assert _lib_dec(two, len(data)) == data
