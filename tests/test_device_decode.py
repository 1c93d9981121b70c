"""decompress_to_device: archives replay into device arrays.

Covers reference-format backends (host-decoded literal blocks uploaded
once) and the rans device path (literal plane never on host); the DMA
replay kernel runs in interpret mode on the CPU test mesh.
"""
import numpy as np
import pytest

import lrzip_next_tpu as lrz
from lrzip_next_tpu.models.device_decode import decompress_to_device


def _corpus(n=24_000, seed=4):
    rng = np.random.default_rng(seed)
    base = rng.integers(32, 127, size=n // 3, dtype=np.uint8).tobytes()
    return (base + b"runrunrun" * 120 + base[: n // 4]
            + rng.integers(0, 256, 313, dtype=np.uint8).tobytes())[:n]


@pytest.mark.parametrize("method", [
    "zstd", "rans", pytest.param("lzma", marks=pytest.mark.slow)])
def test_decompress_to_device_roundtrip(method):
    data = _corpus()
    arch = lrz.compress(data, lrz.Settings(method=method))
    chunks = decompress_to_device(arch, verify=True, interpret=True)
    out = b"".join(np.asarray(c).tobytes() for c in chunks)
    assert out == data


def test_decompress_to_device_multichunk():
    data = _corpus(20_000)
    arch = lrz.compress(
        data, lrz.Settings(method="gzip", max_chunk=8_192,
                           cross_chunk=False))
    chunks = decompress_to_device(arch, verify=True, interpret=True)
    assert len(chunks) > 1
    out = b"".join(np.asarray(c).tobytes() for c in chunks)
    assert out == data


def test_decompress_to_device_bad_crc():
    data = _corpus(12_000)
    arch = bytearray(lrz.compress(data, lrz.Settings(method="zstd")))
    arch[len(arch) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decompress_to_device(bytes(arch), verify=True, interpret=True)
