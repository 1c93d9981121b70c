"""Magic header round-trip and golden-byte tests."""

import pytest

from lrzip_next_tpu.format import constants as C
from lrzip_next_tpu.format.magic import MagicHeader


def test_golden_default_lzma_header():
    """Byte-for-byte expectation for a default lzma v0.14 header
    (layout per reference doc/magic.header.txt and src/lrzip.c:131-208)."""
    h = MagicHeader(expected_size=430612480, hash_code=1,
                    method_code=C.MAGIC_CTYPE_LZMA,
                    lzma_dict_size=1 << 26, rzip_level=7,
                    compression_level=7)
    b = h.encode()
    assert len(b) == 21
    assert b[0:4] == b"LRZI"
    assert b[4] == 0 and b[5] == 14
    assert int.from_bytes(b[6:14], "little") == 430612480
    assert b[14] == 1        # MD5
    assert b[15] == 0        # no encryption
    assert b[16] == 0        # no filter
    assert b[17] == 1        # lzma
    # dict size 2^26: LZMA2 prop p=28 gives (2|0)<<(14+11) = 2^26 exactly
    assert b[18] == 28
    assert b[19] == (7 << 4) | 7
    assert b[20] == 0


@pytest.mark.parametrize("method,params", [
    (C.MAGIC_CTYPE_LZMA, dict(lzma_dict_size=1 << 24)),
    (C.MAGIC_CTYPE_ZPAQ, dict(zpaq_level=4, zpaq_bs=6)),
    (C.MAGIC_CTYPE_BZIP3, dict(bzip3_bs=5)),
    (C.MAGIC_CTYPE_ZSTD, dict(zstd_level=19, zstd_strategy=8)),
    (0, {}),
])
def test_roundtrip_methods(method, params):
    h = MagicHeader(expected_size=12345678, method_code=method,
                    rzip_level=5, compression_level=8, **params)
    d = MagicHeader.decode(h.encode())
    assert d.method_code == method
    assert d.expected_size == 12345678
    assert d.rzip_level == 5 and d.compression_level == 8
    for k, v in params.items():
        got = getattr(d, k)
        if k == "lzma_dict_size":
            assert got >= v  # prop coding rounds up
        else:
            assert got == v


def test_roundtrip_comment():
    h = MagicHeader(expected_size=1, comment=b"hello world")
    d = MagicHeader.decode(h.encode())
    assert d.comment == b"hello world"
    assert d.header_len == 21 + len(b"hello world")


def test_roundtrip_filters():
    for ff, delta in [(C.FILTER_X86, 0), (C.FILTER_ARM64, 0),
                      (C.FILTER_RISCV, 0), (C.FILTER_DELTA, 16),
                      (C.FILTER_DELTA, 32), (C.FILTER_DELTA, 256)]:
        h = MagicHeader(expected_size=1, filter_flag=ff, delta_offset=delta)
        d = MagicHeader.decode(h.encode())
        assert d.filter_flag == ff
        if ff == C.FILTER_DELTA:
            assert d.delta_offset == delta


def test_roundtrip_encrypted_salt():
    h = MagicHeader(enc_code=2, salt=b"\x0cABCDEFG", expected_size=99)
    d = MagicHeader.decode(h.encode())
    assert d.enc_code == 2
    assert d.salt == b"\x0cABCDEFG"
    assert not d.eof_known  # size hidden when encrypted


def test_lzma2_prop_coding_is_involutive():
    for p in range(41):
        size = C.lzma2_dict_size_from_prop(p)
        assert C.lzma2_prop_from_dict_size(size) == p


def test_rejects_garbage():
    with pytest.raises(ValueError):
        MagicHeader.decode(b"NOPE" + bytes(17))
