"""Structural validation: corrupt containers must fail loudly, never
produce wrong bytes (reference guards at src/stream.c:2091-2109 and
src/lrzip.c:1222-1239)."""

import io

import pytest

import lrzip_next_tpu as lrz
from lrzip_next_tpu.format import constants as C
from lrzip_next_tpu.models.info import get_fileinfo
from lrzip_next_tpu.utils import memplan


@pytest.fixture
def archive(corpus_factory):
    data = corpus_factory(60_000, "text")
    return data, lrz.compress(data, lrz.Settings(method="gzip",
                                                 block_size=15_000))


def _find_chunk_start(a: bytes) -> int:
    return C.MAGIC_LEN  # no comment in fixture


def test_backwards_chain_rejected(archive):
    data, a = archive
    b = bytearray(a)
    # chunk header: w, eof, size[w]; then blank headers. Patch stream 0's
    # blank next pointer to point backwards (at itself)
    w = b[_find_chunk_start(a)]
    blank0_next = _find_chunk_start(a) + 2 + w + 1 + 2 * w
    b[blank0_next:blank0_next + w] = (0).to_bytes(w, "little")
    # 0 means "no blocks" for stream 0 -> token stream empty -> error
    with pytest.raises(Exception):
        lrz.decompress(bytes(b))


def test_looping_chain_rejected(archive):
    data, a = archive
    b = bytearray(a)
    w = b[_find_chunk_start(a)]
    hdr_sz = 1 + 3 * w
    # first real block header sits after the two blank headers; make its
    # next pointer equal to its own offset -> chain would loop
    first_block_ofs = 2 * hdr_sz  # relative to initial_pos
    abs_next = _find_chunk_start(a) + 2 + w + first_block_ofs + 1 + 2 * w
    b[abs_next:abs_next + w] = first_block_ofs.to_bytes(w, "little")
    with pytest.raises(Exception):
        lrz.decompress(bytes(b))


def test_truncated_mid_chunk(archive):
    data, a = archive
    with pytest.raises(Exception):
        lrz.decompress(a[:len(a) // 3])


def test_bad_chunk_bytes(archive):
    data, a = archive
    b = bytearray(a)
    b[_find_chunk_start(a)] = 0  # chunk_bytes must be 1..8
    with pytest.raises(ValueError):
        lrz.decompress(bytes(b))


def test_info_walk_validates(archive):
    data, a = archive
    info = get_fileinfo(io.BytesIO(a))
    assert info.decompressed_size == len(data)
    b = bytearray(a)
    w = b[_find_chunk_start(a)]
    blank0_next = _find_chunk_start(a) + 2 + w + 1 + 2 * w
    b[blank0_next:blank0_next + w] = (1).to_bytes(w, "little")  # misaligned
    with pytest.raises(Exception):
        get_fileinfo(io.BytesIO(bytes(b)))


# ------------------------------------------------------ memory planner

def test_negotiate_sheds_threads_then_dict():
    # tight budget: must shrink something, never overcommit
    plan = memplan.negotiate("lzma", threads=8, dict_size=1 << 27,
                             chunk_size=1 << 30, budget=2 << 30)
    assert memplan.lzma_overhead(plan.dict_size) * plan.threads <= 2 << 30
    assert plan.threads >= 1
    # generous budget: keep everything
    plan2 = memplan.negotiate("lzma", threads=4, dict_size=1 << 24,
                              chunk_size=1 << 26, budget=64 << 30)
    assert plan2.threads == 4
    assert plan2.dict_size == 1 << 24


def test_negotiate_floor():
    plan = memplan.negotiate("lzma", threads=16, dict_size=1 << 27,
                             chunk_size=1 << 30, budget=200 << 20)
    assert plan.threads == 1
    assert plan.dict_size <= 1 << 24


def test_ram_detection():
    assert memplan.get_ram() > 1 << 28
    assert memplan.usable_ram(3 << 30) == 1 << 30
    assert memplan.default_max_chunk(3 << 30) == 2 << 30


def test_corruption_fuzz_never_wrong_bytes(corpus_factory):
    """Random single-byte flips anywhere in an archive must either
    raise ValueError or still decode to the exact original (a flip in
    slack bytes) - never return wrong data silently."""
    import numpy as np
    rng = np.random.default_rng(0xF12)
    data = corpus_factory(120_000, "mixed")
    for method in ("zstd", "lzma"):
        a = bytearray(lrz.compress(data, lrz.Settings(method=method)))
        raised = 0
        for _ in range(12):
            b = bytearray(a)
            b[int(rng.integers(21, len(b)))] ^= int(rng.integers(1, 256))
            try:
                out = lrz.decompress(bytes(b))
                assert out == data, f"{method}: silent corruption"
            except ValueError:
                raised += 1
        assert raised >= 8, f"{method}: only {raised}/12 flips detected"
