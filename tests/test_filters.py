"""Filters: delta + BCJ encode/decode inverse properties."""

import numpy as np
import pytest

from lrzip_next_tpu.format import constants as C
from lrzip_next_tpu.ops.filters import apply_filter, undo_filter


def binary_like(n: int, seed: int = 0) -> bytes:
    """Random data salted with branch-opcode bytes so the filters fire."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, n, dtype=np.uint8)
    # sprinkle x86 call/jmp opcodes and ARM/ARM64/PPC patterns
    idx = rng.integers(0, n - 8, n // 50)
    a[idx] = 0xE8
    a[idx + 5] = 0xE9
    word_idx = (rng.integers(0, (n - 8) // 4, n // 100) * 4).astype(np.int64)
    a[word_idx + 3] = 0xEB          # ARM BL
    a[word_idx + 7] = 0x94          # ARM64 BL
    return a.tobytes()


@pytest.mark.parametrize("offset", [1, 2, 3, 4, 8, 16, 32, 256])
def test_delta_roundtrip(offset):
    data = binary_like(10_000, seed=offset)
    enc = apply_filter(data, C.FILTER_DELTA, offset)
    assert enc != data
    assert undo_filter(enc, C.FILTER_DELTA, offset) == data


@pytest.mark.parametrize("ff", [C.FILTER_X86, C.FILTER_ARM, C.FILTER_ARMT,
                                C.FILTER_ARM64, C.FILTER_PPC,
                                C.FILTER_SPARC, C.FILTER_IA64,
                                C.FILTER_RISCV])
def test_bcj_roundtrip(ff):
    for seed in range(3):
        data = binary_like(20_000 + seed, seed=seed)
        enc = apply_filter(data, ff)
        dec = undo_filter(enc, ff)
        assert dec == data, f"filter {ff} not self-inverse (seed {seed})"


@pytest.mark.parametrize("ff", [C.FILTER_X86, C.FILTER_ARM64])
def test_bcj_changes_real_binary(ff):
    # a real ELF shared object must trigger conversions
    data = open("/usr/lib/x86_64-linux-gnu/libz.so.1.2.13", "rb").read() \
        if __import__("os").path.exists(
            "/usr/lib/x86_64-linux-gnu/libz.so.1.2.13") else binary_like(
                65536, 9)
    data = data[:65536]
    enc = apply_filter(data, ff)
    if ff == C.FILTER_X86:
        assert enc != data  # x86 code must contain E8 calls
    assert undo_filter(enc, ff) == data


def test_bcj_tiny_inputs():
    for ff in [C.FILTER_X86, C.FILTER_ARM, C.FILTER_ARM64, C.FILTER_PPC,
               C.FILTER_SPARC, C.FILTER_ARMT, C.FILTER_IA64,
               C.FILTER_RISCV]:
        for n in (0, 1, 3, 4, 5, 7):
            data = bytes(range(n))
            assert undo_filter(apply_filter(data, ff), ff) == data
