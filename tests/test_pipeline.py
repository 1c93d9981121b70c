"""End-to-end archive round trips across methods and corpora."""

import io

import numpy as np
import pytest

import lrzip_next_tpu as lrz
from lrzip_next_tpu.format import constants as C
from lrzip_next_tpu.format.magic import MagicHeader


METHODS = ["none", "gzip", "bzip2", "lzma", "zstd", "lzo"]


@pytest.mark.parametrize("method", METHODS)
def test_roundtrip_methods(method, corpus_factory):
    data = corpus_factory(200_000, "mixed")
    s = lrz.Settings(method=method, compression_level=5, threads=2)
    archive = lrz.compress(data, s)
    assert archive[:4] == b"LRZI"
    out = lrz.decompress(archive)
    assert out == data


@pytest.mark.parametrize("kind", ["text", "random", "zeros"])
def test_roundtrip_corpora(kind, corpus_factory):
    data = corpus_factory(150_000, kind)
    archive = lrz.compress(data, lrz.Settings(method="zstd"))
    assert lrz.decompress(archive) == data


def test_compression_actually_compresses(corpus_factory):
    data = corpus_factory(500_000, "text")
    archive = lrz.compress(data, lrz.Settings(method="zstd"))
    assert len(archive) < len(data) // 4


def test_incompressible_stored(corpus_factory):
    data = corpus_factory(100_000, "random")
    archive = lrz.compress(data, lrz.Settings(method="gzip"))
    # stored blocks + headers: small overhead only
    assert len(archive) < len(data) + 4096
    assert lrz.decompress(archive) == data


def test_multi_chunk(corpus_factory):
    data = corpus_factory(300_000, "mixed")
    s = lrz.Settings(method="zstd", max_chunk=100_000)
    archive = lrz.compress(data, s)
    assert lrz.decompress(archive) == data


def test_small_block_size(corpus_factory):
    data = corpus_factory(200_000, "text")
    s = lrz.Settings(method="gzip", block_size=10_000)
    archive = lrz.compress(data, s)
    assert lrz.decompress(archive) == data


def test_empty_input():
    archive = lrz.compress(b"", lrz.Settings(method="zstd"))
    assert lrz.decompress(archive) == b""


def test_tiny_input():
    for n in (1, 30, 31, 32, 100):
        data = bytes(range(n % 256))[:n] or b"x"
        data = (b"abc" * 60)[:n]
        archive = lrz.compress(data, lrz.Settings(method="lzma"))
        assert lrz.decompress(archive) == data


@pytest.mark.parametrize("hash_name", ["CRC", "MD5", "SHA256", "SHA512",
                                       "SHA3_256", "RIPEMD",
                                       "SHAKE128_16", "SHAKE256_64"])
def test_hash_options(hash_name, corpus_factory):
    data = corpus_factory(50_000, "text")
    archive = lrz.compress(data, lrz.Settings(method="gzip",
                                              hash_name=hash_name))
    magic = MagicHeader.decode(archive)
    assert magic.hash_code == C.HASH_CODE[hash_name]
    assert lrz.decompress(archive) == data


def test_corrupt_payload_detected(corpus_factory):
    # Integrity guarantee: a corrupted archive must either be rejected
    # or still decode to the exact original - never silently return
    # wrong bytes.  (Some single-byte flips are format-malleable: any
    # nonzero token head byte means "match", same as the reference's
    # read_header, so those flips change nothing.)
    data = corpus_factory(100_000, "text")
    archive = bytearray(lrz.compress(data, lrz.Settings(method="none")))
    detected = 0
    for frac in (3, 2):  # two independent flip positions
        bad = bytearray(archive)
        bad[len(bad) // frac] ^= 0xFF
        try:
            out = lrz.decompress(bytes(bad))
        except Exception:
            detected += 1
        else:
            assert out == data, "corruption returned wrong bytes"
    # flipping a literal-stream byte is always caught by MD5: corrupt
    # the end of the payload area (just before the 16-byte digest)
    bad = bytearray(archive)
    bad[-20] ^= 0xFF
    with pytest.raises(Exception):
        lrz.decompress(bytes(bad))


def test_magic_size_recorded(corpus_factory):
    data = corpus_factory(77_777, "text")
    archive = lrz.compress(data, lrz.Settings(method="zstd"))
    magic = MagicHeader.decode(archive)
    assert magic.expected_size == 77_777
    assert magic.method_code == C.MAGIC_CTYPE_ZSTD


def test_delta_filter_roundtrip(corpus_factory):
    data = corpus_factory(120_000, "mixed")
    s = lrz.Settings(method="gzip", filter_flag=C.FILTER_DELTA,
                     delta_offset=4)
    archive = lrz.compress(data, s)
    magic = MagicHeader.decode(archive)
    assert magic.filter_flag == C.FILTER_DELTA
    assert magic.delta_offset == 4
    assert lrz.decompress(archive) == data


@pytest.mark.parametrize("stride", [0, 1, 8])
def test_tpu_path_anchor_strides(stride, corpus_factory):
    # full archive round trip through the TPU matcher (CPU test mesh)
    # at dense (1), sampled (8), and level-derived (0) strides
    data = corpus_factory(300_000, "text")
    s = lrz.Settings(method="zstd", use_tpu=True, anchor_stride=stride,
                     threads=2)
    archive = lrz.compress(data, s)
    assert lrz.decompress(archive) == data


def test_tpu_path_multichunk_anchors(corpus_factory):
    data = corpus_factory(500_000, "mixed")
    s = lrz.Settings(method="zstd", use_tpu=True, anchor_stride=8,
                     max_chunk=150_000, threads=2)
    archive = lrz.compress(data, s)
    assert lrz.decompress(archive) == data
