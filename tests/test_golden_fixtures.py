"""Golden-archive regression tests.

The fixture archives were produced by this framework (round 1) with
pinned settings; decoding them must keep working byte-for-byte in every
future revision.  This guards the on-disk format against accidental
drift - the .lrz layout is a compatibility contract with the reference
implementation, not an internal detail.
"""

import os

import pytest

import lrzip_next_tpu as lrz
from lrzip_next_tpu.models.info import get_fileinfo

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
METHODS = ["none", "gzip", "bzip2", "lzma", "zstd"]


@pytest.fixture(scope="module")
def golden_input():
    with open(os.path.join(FIXDIR, "golden_input.bin"), "rb") as f:
        return f.read()


@pytest.mark.parametrize("method", METHODS)
def test_decode_golden(method, golden_input):
    with open(os.path.join(FIXDIR, f"golden_{method}.lrz"), "rb") as f:
        archive = f.read()
    assert lrz.decompress(archive) == golden_input


@pytest.mark.parametrize("method", METHODS)
def test_golden_info_walk(method, golden_input):
    with open(os.path.join(FIXDIR, f"golden_{method}.lrz"), "rb") as f:
        info = get_fileinfo(f)
    assert info.decompressed_size == len(golden_input)
    assert len(info.chunks) == 3  # 72000 bytes / 30000 max_chunk
    assert info.chunks[-1].eof


def test_reencode_is_deterministic(golden_input):
    """Single-threaded encode with pinned settings is reproducible -
    required for the fixtures to stay meaningful."""
    s = lrz.Settings(method="gzip", compression_level=5, threads=1,
                     block_size=20_000, max_chunk=30_000)
    a1 = lrz.compress(golden_input, s)
    a2 = lrz.compress(golden_input, s)
    assert a1 == a2
