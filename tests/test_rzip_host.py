"""Host rzip matcher: token validity + lossless round trips."""

import numpy as np
import pytest

from lrzip_next_tpu.format.constants import MINIMUM_MATCH
from lrzip_next_tpu.format.tokens import replay_tokens
from lrzip_next_tpu.models import rzip_host


def roundtrip(data: bytes) -> None:
    arr = np.frombuffer(data, dtype=np.uint8)
    kinds, lengths, dists = rzip_host.rzip_encode_chunk(arr)
    # tokens must cover the input exactly
    assert lengths.sum() == len(data)
    # matches must be valid: dist >= 1, source >= 0, len >= MINIMUM_MATCH
    ends = np.cumsum(lengths)
    starts = ends - lengths
    m = kinds == 1
    assert (lengths[m] >= MINIMUM_MATCH).all()
    assert (dists[m] >= 1).all()
    assert (starts[m] - dists[m] >= 0).all()
    lit = rzip_host.literals_of(arr, kinds, lengths)
    out = replay_tokens(kinds, lengths, dists, lit)
    assert out.tobytes() == data


def test_empty():
    roundtrip(b"")


def test_tiny():
    roundtrip(b"hi")
    roundtrip(b"a" * MINIMUM_MATCH)


def test_repetitive_finds_matches(corpus_factory):
    data = corpus_factory(100_000, "text")
    arr = np.frombuffer(data, dtype=np.uint8)
    kinds, lengths, dists = rzip_host.rzip_encode_chunk(arr)
    assert (kinds == 1).any(), "repetitive text must produce matches"
    lit = rzip_host.literals_of(arr, kinds, lengths)
    # literal stream should be much smaller than the input
    assert len(lit) < len(data) // 2
    roundtrip(data)


def test_random_data(corpus_factory):
    roundtrip(corpus_factory(50_000, "random"))


def test_zeros_fast_and_correct(corpus_factory):
    # 1MB of zeros must not blow up (lazy extension property)
    roundtrip(bytes(1 << 20))


def test_mixed_long_range(corpus_factory):
    data = corpus_factory(300_000, "mixed")
    roundtrip(data)


def test_exact_long_range_dedup():
    # two identical 64k segments 1MB apart must produce one giant match
    seg = np.random.default_rng(7).integers(0, 256, 65536,
                                            dtype=np.uint8).tobytes()
    filler = np.random.default_rng(8).integers(0, 256, 1 << 20,
                                               dtype=np.uint8).tobytes()
    data = seg + filler + seg
    arr = np.frombuffer(data, dtype=np.uint8)
    kinds, lengths, dists = rzip_host.rzip_encode_chunk(arr)
    m = kinds == 1
    assert lengths[m].max() >= 65536 - MINIMUM_MATCH
    roundtrip(data)
