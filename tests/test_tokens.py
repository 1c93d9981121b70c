"""Token codec: encode/decode/replay round trips."""

import numpy as np
import pytest

from lrzip_next_tpu.format.tokens import (decode_token_stream,
                                          encode_token_stream,
                                          replay_tokens, split_long_runs)


def test_encode_decode_roundtrip():
    kinds = np.array([0, 1, 0, 1, 1], dtype=np.uint8)
    lengths = np.array([10, 40, 5, 31, 100], dtype=np.int64)
    dists = np.array([0, 7, 0, 31, 1], dtype=np.int64)
    for w in (2, 3, 4, 5, 8):
        s0 = encode_token_stream(kinds, lengths, dists, w, crc=0xDEADBEEF)
        k2, l2, d2, crc, consumed = decode_token_stream(s0, w)
        assert consumed == len(s0)
        np.testing.assert_array_equal(k2, kinds)
        np.testing.assert_array_equal(l2, lengths)
        np.testing.assert_array_equal(d2[k2 == 1], dists[kinds == 1])
        assert crc == 0xDEADBEEF


def test_split_long_runs():
    kinds = np.array([0, 1], dtype=np.uint8)
    lengths = np.array([0x2FFFF, 0x10001], dtype=np.int64)
    dists = np.array([0, 123], dtype=np.int64)
    k, l, d = split_long_runs(kinds, lengths, dists)
    assert list(k) == [0, 0, 0, 0, 1, 1]
    assert list(l) == [0xFFFF, 0xFFFF, 0xFFFF, 2, 0xFFFF, 2]
    assert list(d) == [0, 0, 0, 0, 123, 123]
    assert l.sum() == lengths.sum()
    assert (l <= 0xFFFF).all()


def test_replay_literals_only():
    data = np.frombuffer(b"hello world, this is literal data only",
                         dtype=np.uint8)
    kinds = np.array([0], dtype=np.uint8)
    lengths = np.array([len(data)], dtype=np.int64)
    dists = np.array([0], dtype=np.int64)
    out = replay_tokens(kinds, lengths, dists, data)
    np.testing.assert_array_equal(out, data)


def test_replay_with_matches():
    # "abcabcabc..." via overlapping match (dist 3 < len)
    lit = np.frombuffer(b"abc", dtype=np.uint8)
    kinds = np.array([0, 1], dtype=np.uint8)
    lengths = np.array([3, 30], dtype=np.int64)
    dists = np.array([0, 3], dtype=np.int64)
    out = replay_tokens(kinds, lengths, dists, lit)
    assert out.tobytes() == b"abc" * 11


def test_replay_match_chain():
    # matches whose sources are themselves matches
    lit = np.frombuffer(b"xy", dtype=np.uint8)
    kinds = np.array([0, 1, 1, 1], dtype=np.uint8)
    lengths = np.array([2, 2, 4, 8], dtype=np.int64)
    dists = np.array([0, 2, 4, 8], dtype=np.int64)
    out = replay_tokens(kinds, lengths, dists, lit)
    assert out.tobytes() == b"xy" * 8


def test_replay_with_history():
    hist = np.frombuffer(b"0123456789", dtype=np.uint8)
    kinds = np.array([1], dtype=np.uint8)
    lengths = np.array([5], dtype=np.int64)
    dists = np.array([10], dtype=np.int64)
    out = replay_tokens(kinds, lengths, dists,
                        np.zeros(0, dtype=np.uint8), history=hist)
    assert out.tobytes() == b"01234"


def test_replay_rejects_bad_distance():
    kinds = np.array([1], dtype=np.uint8)
    lengths = np.array([5], dtype=np.int64)
    dists = np.array([10], dtype=np.int64)
    with pytest.raises(ValueError):
        replay_tokens(kinds, lengths, dists, np.zeros(0, dtype=np.uint8))


def test_decode_detects_truncation():
    kinds = np.array([0], dtype=np.uint8)
    lengths = np.array([5], dtype=np.int64)
    dists = np.array([0], dtype=np.int64)
    s0 = encode_token_stream(kinds, lengths, dists, 2, crc=0)
    with pytest.raises(ValueError):
        decode_token_stream(s0[:-5], 2)
