"""Legacy magic header decode (lrzip 0.6/0.7, lrzip-next 0.8-0.10).

Headers are hand-assembled per the reference's format history
(doc/magic.header.txt and src/lrzip.c:348-537 get_magic_v6..v9).
"""

import pytest

from lrzip_next_tpu.format import constants as C
from lrzip_next_tpu.format.magic import MagicHeader


def test_v06_lzma_md5():
    m = bytearray(24)
    m[0:4] = b"LRZI"
    m[4], m[5] = 0, 6
    m[6:14] = (123456789).to_bytes(8, "little")
    # classic 5-byte LZMA props at 16: lc/lp/pb byte + LE dict size
    m[16] = 0x5D
    m[17:21] = (1 << 23).to_bytes(4, "little")
    m[21] = 1  # md5 stored
    h = MagicHeader.decode(bytes(m))
    assert h.minor_version == 6
    assert h.expected_size == 123456789
    assert h.method_code == C.MAGIC_CTYPE_LZMA
    assert h.lzma_dict_size == 1 << 23
    assert h.hash_code == C.HASH_CODE["MD5"]
    assert h.header_len == 24


def test_v07_filter_and_lzma():
    m = bytearray(24)
    m[0:4] = b"LRZI"
    m[4], m[5] = 0, 7
    m[6:14] = (42).to_bytes(8, "little")
    m[16] = 1  # x86 filter (v7 coding)
    m[17] = 0x5D
    m[18:22] = (1 << 22).to_bytes(4, "little")
    m[22] = 1  # md5
    h = MagicHeader.decode(bytes(m))
    assert h.filter_flag == C.FILTER_X86
    assert h.method_code == C.MAGIC_CTYPE_LZMA
    assert h.lzma_dict_size == 1 << 22


def test_v08_lzma2_prop_byte():
    m = bytearray(18)
    m[0:4] = b"LRZI"
    m[4], m[5] = 0, 8
    m[6:14] = (1000).to_bytes(8, "little")
    m[14] = 1      # hash stored
    m[17] = 24     # lzma2 dict prop: (2|0)<<23 = 16MB
    h = MagicHeader.decode(bytes(m))
    assert h.minor_version == 8
    assert h.method_code == C.MAGIC_CTYPE_LZMA
    assert h.lzma_dict_size == C.lzma2_dict_size_from_prop(24)
    assert h.header_len == 18


def test_v08_zpaq_coding():
    m = bytearray(18)
    m[0:4] = b"LRZI"
    m[4], m[5] = 0, 8
    m[17] = 0b10100110  # zpaq: high bit + level 2? -> level bits 010, bs 0110
    h = MagicHeader.decode(bytes(m))
    assert h.method_code == C.MAGIC_CTYPE_ZPAQ
    assert h.zpaq_level == 2
    assert h.zpaq_bs == 6


def test_v08_bzip3_coding():
    m = bytearray(18)
    m[0:4] = b"LRZI"
    m[4], m[5] = 0, 8
    m[17] = 0b11110101  # bzip3 marker 1111 + bs code 5
    h = MagicHeader.decode(bytes(m))
    assert h.method_code == C.MAGIC_CTYPE_BZIP3
    assert h.bzip3_bs == 5


def test_v09_levels_and_comment():
    comment = b"hi there"
    m = bytearray(20)
    m[0:4] = b"LRZI"
    m[4], m[5] = 0, 9
    m[6:14] = (7).to_bytes(8, "little")
    m[14] = 1
    m[17] = 24
    m[18] = (6 << 4) | 8   # rzip 6, lrzip 8
    m[19] = len(comment)
    h = MagicHeader.decode(bytes(m) + comment)
    assert h.rzip_level == 6
    assert h.compression_level == 8
    assert h.comment == comment
    assert h.header_len == 20 + len(comment)


def test_v13_delta_offset_coding():
    # delta offsets: <=16 stored directly + 128; >16 stored /16 + 15
    for delta, stored in [(1, 129), (16, 144), (32, 145), (256, 159)]:
        m = bytearray(21)
        m[0:4] = b"LRZI"
        m[4], m[5] = 0, 13
        m[16] = stored
        h = MagicHeader.decode(bytes(m))
        assert h.filter_flag == C.FILTER_DELTA
        assert h.delta_offset == delta, (delta, stored)
