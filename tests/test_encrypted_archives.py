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
