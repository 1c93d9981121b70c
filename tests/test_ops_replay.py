"""TPU replay kernel vs host replay oracle."""

import numpy as np
import pytest

from lrzip_next_tpu.format.tokens import replay_tokens
from lrzip_next_tpu.models import rzip_host
from lrzip_next_tpu.ops.replay import replay_tokens_tpu


def check(kinds, lengths, dists, literals):
    kinds = np.asarray(kinds, dtype=np.uint8)
    lengths = np.asarray(lengths, dtype=np.int64)
    dists = np.asarray(dists, dtype=np.int64)
    literals = np.asarray(literals, dtype=np.uint8)
    want = replay_tokens(kinds, lengths, dists, literals)
    got = replay_tokens_tpu(kinds, lengths, dists, literals)
    np.testing.assert_array_equal(got, want)
    return got


def test_literals_only():
    lit = np.frombuffer(b"plain literal data", dtype=np.uint8)
    check([0], [len(lit)], [0], lit)


def test_simple_match():
    lit = np.frombuffer(b"abcdef", dtype=np.uint8)
    out = check([0, 1], [6, 6], [0, 6], lit)
    assert out.tobytes() == b"abcdefabcdef"


def test_overlapping_match_rle():
    lit = np.frombuffer(b"x", dtype=np.uint8)
    out = check([0, 1], [1, 63], [0, 1], lit)
    assert out.tobytes() == b"x" * 64


def test_deep_chain():
    # match-of-match-of-match... pointer chains several deep
    lit = np.frombuffer(b"ab", dtype=np.uint8)
    kinds = [0] + [1] * 10
    lengths = [2] + [2 ** i for i in range(1, 11)]
    dists = [0] + [2 ** i for i in range(1, 11)]
    out = check(kinds, lengths, dists, lit)
    assert out.tobytes() == b"ab" * (out.shape[0] // 2)


def test_roundtrip_with_matcher(corpus_factory):
    data = corpus_factory(150_000, "mixed")
    arr = np.frombuffer(data, dtype=np.uint8)
    kinds, lengths, dists = rzip_host.rzip_encode_chunk(arr)
    lit = rzip_host.literals_of(arr, kinds, lengths)
    got = replay_tokens_tpu(kinds, lengths, dists, lit)
    assert got.tobytes() == data


def test_empty():
    out = replay_tokens_tpu(np.zeros(0, np.uint8), np.zeros(0, np.int64),
                            np.zeros(0, np.int64), np.zeros(0, np.uint8))
    assert len(out) == 0
