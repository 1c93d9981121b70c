"""Crypto primitives: CTS round trips, keygen determinism."""

import pytest

from lrzip_next_tpu.crypto import CryptoContext, aes, keys

pytestmark = pytest.mark.skipif(not aes.available(),
                                reason="libcrypto not available")


@pytest.mark.parametrize("n", [16, 17, 31, 32, 33, 48, 100, 4096, 4097])
@pytest.mark.parametrize("klen", [16, 32])
def test_cts_roundtrip(n, klen):
    key = bytes(range(klen))
    iv = bytes(range(100, 116))
    data = bytes((i * 7 + 3) & 0xFF for i in range(n))
    ct = aes.cbc_cts_encrypt(key, iv, data)
    assert len(ct) == len(data)
    assert ct != data
    assert aes.cbc_cts_decrypt(key, iv, ct) == data


def test_cts_rejects_short():
    with pytest.raises(ValueError):
        aes.cbc_cts_encrypt(b"k" * 16, b"i" * 16, b"short")


def test_cts_steals_on_exact_multiple():
    """gcrypt CTS swaps the last two blocks even for aligned buffers."""
    key, iv = b"k" * 16, b"\x00" * 16
    data = bytes(64)
    ct = aes.cbc_cts_encrypt(key, iv, data)
    plain_cbc = aes._cbc(key, iv, data, True)
    assert ct[:32] == plain_cbc[:32]
    assert ct[32:48] == plain_cbc[48:64]   # swapped
    assert ct[48:64] == plain_cbc[32:48]
    assert aes.cbc_cts_decrypt(key, iv, ct) == data


def test_stretch_deterministic():
    salt = bytes([10]) + b"1234567"
    h1 = keys.stretch(salt, b"password")
    h2 = keys.stretch(salt, b"password")
    assert h1 == h2 and len(h1) == 64
    assert keys.stretch(salt, b"other") != h1


def test_block_keys_differ_by_salt():
    master = bytes(64)
    sp = keys.salt_pass_of(bytes(8), b"pw")
    k1, iv1 = keys.block_key_iv(master, b"A" * 8, sp, 1)
    k2, iv2 = keys.block_key_iv(master, b"B" * 8, sp, 1)
    assert k1 != k2 and iv1 != iv2
    assert len(k1) == 16 and len(iv1) == 16
    k3, _ = keys.block_key_iv(master, b"A" * 8, sp, 2)
    assert len(k3) == 32


def test_context_block_roundtrip():
    ctx = CryptoContext(b"hunter2", bytes([10]) + b"saltsal", enc_code=2)
    salt = ctx.new_block_salt()
    data = b"the quick brown fox jumps over the lazy dog" * 10
    ct = ctx.encrypt_block(data, salt)
    assert ctx.decrypt_block(ct, salt) == data
    # wrong passphrase produces garbage, not an exception
    ctx2 = CryptoContext(b"wrong", ctx.salt, enc_code=2)
    assert ctx2.decrypt_block(ct, salt) != data
