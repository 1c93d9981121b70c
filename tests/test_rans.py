"""Tests for the TPU-native interleaved-rANS backend (CTYPE 11).

Covers the device codec (ops/rans.py) on the CPU mesh, the native C++
mirror (runtime/csrc/rans.cpp), bitstream cross-validation in both
directions, corruption detection, and archive-level integration.
"""

import io

import numpy as np
import pytest

import lrzip_next_tpu as lrz
from lrzip_next_tpu import runtime
from lrzip_next_tpu.backends import BackendConfig, compress_block, \
    decompress_block
from lrzip_next_tpu.format.constants import CTYPE_NONE, CTYPE_RANS
from lrzip_next_tpu.ops import rans

CTX_MODES = (0, 4, 6, 8)


def _cases(corpus_factory, rng):
    return [
        b"",
        b"x",
        b"ab" * 40,
        bytes(100_000),
        rng.integers(0, 256, 65_536, dtype=np.uint8).tobytes(),
        corpus_factory(200_000, "text"),
        corpus_factory(300_000, "mixed"),
    ]


@pytest.mark.parametrize("ctx_bits", CTX_MODES)
def test_device_round_trip(corpus_factory, rng, ctx_bits):
    for data in _cases(corpus_factory, rng):
        payload = rans.encode_block(data, ctx_bits)
        assert rans.decode_block(payload) == data


@pytest.mark.parametrize("ctx_bits", CTX_MODES)
def test_native_round_trip(corpus_factory, rng, ctx_bits):
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    for data in _cases(corpus_factory, rng):
        payload = runtime.rans_encode(data, ctx_bits)
        assert runtime.rans_decode(payload, len(data)) == data


@pytest.mark.parametrize("ctx_bits", CTX_MODES)
def test_cross_validation_both_directions(corpus_factory, rng, ctx_bits):
    """Device-encoded payloads decode natively and vice versa: the two
    implementations speak one bitstream."""
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    for data in _cases(corpus_factory, rng):
        dev = rans.encode_block(data, ctx_bits)
        nat = runtime.rans_encode(data, ctx_bits)
        assert runtime.rans_decode(dev, len(data)) == data
        assert rans.decode_block(nat) == data


def test_text_compresses(corpus_factory):
    data = corpus_factory(500_000, "text")
    payload = rans.encode_block(data, 6)
    assert len(payload) < len(data) // 2


def test_order1_beats_order0_on_text(corpus_factory):
    data = corpus_factory(500_000, "text")
    p0 = rans.encode_block(data, 0)
    p8 = rans.encode_block(data, 8)
    assert len(p8) < len(p0)


def test_corruption_detected(corpus_factory, rng):
    data = corpus_factory(100_000, "text")
    payload = bytearray(rans.encode_block(data, 6))
    for _ in range(20):
        i = int(rng.integers(24, len(payload)))
        mutated = bytearray(payload)
        mutated[i] ^= 1 << int(rng.integers(0, 8))
        try:
            out = rans.decode_block(bytes(mutated))
        except ValueError:
            continue
        assert out == data  # flip landed in dead padding
    if runtime.available():
        mutated = bytearray(payload)
        mutated[len(payload) // 2] ^= 0x40
        with pytest.raises(ValueError):
            if runtime.rans_decode(bytes(mutated), len(data)) != data:
                raise ValueError("silent corruption")


def test_truncation_detected(corpus_factory):
    data = corpus_factory(100_000, "text")
    payload = rans.encode_block(data, 6)
    with pytest.raises(ValueError):
        rans.decode_block(payload[: len(payload) // 2])
    if runtime.available():
        with pytest.raises(ValueError):
            runtime.rans_decode(payload[: len(payload) // 2], len(data))


def test_backend_registry_block(corpus_factory):
    cfg = BackendConfig(compression_level=7)
    data = corpus_factory(200_000, "text")
    ct, payload = compress_block(data, CTYPE_RANS, cfg)
    assert ct == CTYPE_RANS and len(payload) < len(data)
    assert decompress_block(payload, ct, len(data), cfg) == data


def test_backend_registry_incompressible(rng):
    cfg = BackendConfig(compression_level=7)
    data = rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes()
    ct, payload = compress_block(data, CTYPE_RANS, cfg)
    assert ct == CTYPE_NONE and payload == data


@pytest.mark.parametrize("level", [1, 5, 9])
def test_archive_round_trip(corpus_factory, level):
    data = corpus_factory(300_000, "mixed")
    s = lrz.Settings(method="rans", compression_level=level)
    archive = lrz.compress(data, s)
    assert lrz.decompress(archive) == data
    assert len(archive) < len(data)


def test_archive_info_names_rans(corpus_factory):
    from lrzip_next_tpu.models.info import get_fileinfo
    data = corpus_factory(200_000, "text")
    archive = lrz.compress(data, lrz.Settings(method="rans"))
    info = get_fileinfo(io.BytesIO(archive))
    ctypes_seen = {ct for ch in info.chunks
                   for (_, ct, _, _) in ch.block_details}
    assert CTYPE_RANS in ctypes_seen


def test_cli_rans_flag(tmp_path, corpus_factory):
    from lrzip_next_tpu.cli import main
    src = tmp_path / "f.txt"
    src.write_bytes(corpus_factory(150_000, "text"))
    assert main([str(src), "--rans", "-o", str(tmp_path / "f.lrz")]) == 0
    assert main(["-d", str(tmp_path / "f.lrz"), "-o",
                 str(tmp_path / "out.bin")]) == 0
    assert (tmp_path / "out.bin").read_bytes() == src.read_bytes()


def test_quantize_freqs_invariants(rng):
    import jax.numpy as jnp
    for _ in range(5):
        counts = jnp.asarray(
            rng.integers(0, 10_000, (4, 256)).astype(np.int32))
        f = np.asarray(rans.quantize_freqs(counts))
        assert (f >= 1).all()
        assert (f.sum(axis=1) == rans.M).all()
    # degenerate rows: empty and single-symbol
    counts = np.zeros((2, 256), np.int32)
    counts[1, 7] = 123456
    f = np.asarray(rans.quantize_freqs(jnp.asarray(counts)))
    assert (f >= 1).all() and (f.sum(axis=1) == rans.M).all()
    assert f[1, 7] == rans.M - 255
