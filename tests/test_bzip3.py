"""bzip3 backend slot (from-scratch BWT codec, runtime/csrc/bwt.cpp)."""

import numpy as np
import pytest

import lrzip_next_tpu as lrz
from lrzip_next_tpu import runtime
from lrzip_next_tpu.backends import BackendConfig, bzip3_codec

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native runtime unavailable")


@pytest.mark.parametrize("kind", ["text", "mixed", "zeros"])
def test_block_roundtrip(kind, corpus_factory):
    data = corpus_factory(120_000, kind)
    cfg = BackendConfig(bzip3_bs=0)
    enc = bzip3_codec.compress(data, cfg)
    assert enc is not None and len(enc) < len(data)
    assert bzip3_codec.decompress(enc, len(data), cfg) == data


def test_block_roundtrip_random_incompressible(corpus_factory):
    data = corpus_factory(50_000, "random")
    cfg = BackendConfig(bzip3_bs=0)
    enc = bzip3_codec.compress(data, cfg)
    # random data expands; the codec signals "store raw"
    assert enc is None or bzip3_codec.decompress(
        enc, len(data), cfg) == data


def test_multi_subblock():
    seg = np.random.default_rng(5).integers(0, 64, 80_000,
                                            dtype=np.uint8).tobytes()
    data = seg * 3
    cfg = BackendConfig(bzip3_bs=0)
    # force tiny sub-blocks by monkeypatching the prop->size map
    import lrzip_next_tpu.backends.bzip3_codec as mod
    orig = mod.bzip3_block_size_from_prop
    mod.bzip3_block_size_from_prop = lambda p: 60_000
    try:
        enc = mod.compress(data, cfg)
        assert enc is not None
        assert mod.decompress(enc, len(data), cfg) == data
    finally:
        mod.bzip3_block_size_from_prop = orig


def test_foreign_payload_rejected():
    with pytest.raises(ValueError, match="libbz3"):
        bzip3_codec.decompress(b"\x00" * 64, 10, BackendConfig())


def test_archive_roundtrip(corpus_factory):
    data = corpus_factory(250_000, "text")
    s = lrz.Settings(method="bzip3", threads=2)
    archive = lrz.compress(data, s)
    assert len(archive) < len(data)
    assert lrz.decompress(archive) == data


def test_archive_info_names_bzip3(corpus_factory):
    data = corpus_factory(50_000, "text")
    archive = lrz.compress(data, lrz.Settings(method="bzip3", bzip3_bs=2))
    import io
    from lrzip_next_tpu.models.info import get_fileinfo
    info = get_fileinfo(io.BytesIO(archive))
    assert "bzip3" in info.method_name()


def test_bwt_adversarial_inputs():
    # SA-IS edge cases: tiny, periodic, sawtooth, already-sorted
    cases = [b"a", b"ab", b"ba", b"aaaa", b"abab" * 1000,
             bytes(range(256)) * 4, bytes(reversed(range(256))) * 4,
             b"\x00\x01" * 3000, b"banana" * 777]
    for data in cases:
        enc = runtime.bwt_block_encode(data)
        if enc is None:
            continue
        assert runtime.bwt_block_decode(enc, len(data)) == data
