"""Encrypted archive (-e) round trips."""

import pytest

import lrzip_next_tpu as lrz
from lrzip_next_tpu.crypto import aes
from lrzip_next_tpu.format.magic import MagicHeader

pytestmark = pytest.mark.skipif(not aes.available(),
                                reason="libcrypto not available")


def settings(**kw):
    kw.setdefault("passphrase", b"correct horse battery staple")
    kw.setdefault("costfactor_exp", 10)  # keep scrypt fast in tests
    kw.setdefault("method", "gzip")
    return lrz.Settings(**kw)


def test_encrypted_roundtrip(corpus_factory):
    data = corpus_factory(150_000, "text")
    archive = lrz.compress(data, settings())
    magic = MagicHeader.decode(archive)
    assert magic.enc_code == 1
    assert not magic.eof_known  # size hidden
    assert lrz.decompress(archive, settings()) == data


def test_encrypted_aes256(corpus_factory):
    data = corpus_factory(80_000, "mixed")
    s = settings(enc_code=2, method="zstd")
    archive = lrz.compress(data, s)
    assert MagicHeader.decode(archive).enc_code == 2
    assert lrz.decompress(archive, s) == data


def test_wrong_password_rejected(corpus_factory):
    data = corpus_factory(60_000, "text")
    archive = lrz.compress(data, settings())
    with pytest.raises(ValueError, match="password|header|corrupt|CRC"):
        lrz.decompress(archive, settings(passphrase=b"wrong"))


def test_no_password_rejected(corpus_factory):
    archive = lrz.compress(corpus_factory(60_000, "text"), settings())
    with pytest.raises(ValueError, match="passphrase"):
        lrz.decompress(archive)


def test_plaintext_not_visible(corpus_factory):
    marker = b"TOPSECRETMARKER" * 8
    data = marker + corpus_factory(50_000, "text") + marker
    archive = lrz.compress(data, settings(method="none", lz4_test=False))
    assert marker not in archive


def test_encrypted_multi_chunk(corpus_factory):
    data = corpus_factory(250_000, "mixed")
    s = settings(max_chunk=100_000)
    archive = lrz.compress(data, s)
    assert lrz.decompress(archive, s) == data


def test_info_with_passphrase(corpus_factory):
    import io
    import lrzip_next_tpu as lrz
    from lrzip_next_tpu.models.info import format_fileinfo, get_fileinfo
    data = corpus_factory(60_000, "text")
    s = lrz.Settings(method="zstd", passphrase=b"sekrit",
                     costfactor_exp=10)
    archive = lrz.compress(data, s)
    # without passphrase: magic-level info only
    info = get_fileinfo(io.BytesIO(archive))
    assert info.magic.enc_code and not info.chunks
    assert "Encrypted" in format_fileinfo(info, "x")
    # with passphrase: full block walk
    info = get_fileinfo(io.BytesIO(archive), passphrase=b"sekrit")
    assert info.chunks and info.chunks[0].streams[1].blocks >= 1
    out = format_fileinfo(info, "x")
    assert "Stream 1" in out and "Encrypted" in out


def test_info_wrong_passphrase_fails(corpus_factory):
    import io
    import pytest
    import lrzip_next_tpu as lrz
    from lrzip_next_tpu.models.info import get_fileinfo
    data = corpus_factory(40_000, "text")
    archive = lrz.compress(data, lrz.Settings(
        method="zstd", passphrase=b"right", costfactor_exp=10))
    with pytest.raises(ValueError):
        get_fileinfo(io.BytesIO(archive), passphrase=b"wrong")
