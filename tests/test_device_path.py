"""Device-resident end-to-end path (models/device_path.py).

The TPU-native replacement for the reference's host-thread backend
stage (src/stream.c:1550-1834): literal extraction by mask compaction
+ interleaved-rANS encode in HBM, and decode-side rANS + pointer-
doubling replay (src/runzip.c:184-241 equivalent).  Runs on the CPU
mesh (tests/conftest.py); the same code paths execute on real chips.
"""

import io

import numpy as np
import pytest

import lrzip_next_tpu as lrz
from lrzip_next_tpu.format import constants as C
from lrzip_next_tpu.models import device_path, pipeline


def corpus(n=1 << 20):
    rng = np.random.default_rng(3)
    base = open("/root/reference/src/stream.c", "rb").read()
    rep = (base * (n // len(base) + 2))[:n // 2]
    rnd = rng.integers(0, 256, n // 4, dtype=np.uint8).tobytes()
    return rep + rnd + rep[:n - len(rep) - len(rnd)]


def test_device_roundtrip_and_host_interop():
    data = corpus()
    s = lrz.Settings(method="rans", use_tpu=True, compression_level=7)
    arch = lrz.compress(data, s)
    # decode on the device path
    assert lrz.decompress(arch, lrz.Settings(use_tpu=True)) == data
    # the same archive decodes on the pure host path
    assert lrz.decompress(arch) == data
    # and a host-produced rans archive decodes on the device path
    arch2 = lrz.compress(data, lrz.Settings(method="rans"))
    assert lrz.decompress(arch2, lrz.Settings(use_tpu=True)) == data


def test_device_path_writes_single_rans_literal_block():
    data = corpus(1 << 19)
    s = lrz.Settings(method="rans", use_tpu=True)
    arch = lrz.compress(data, s)
    from lrzip_next_tpu.format.magic import MagicHeader
    from lrzip_next_tpu.format.container import ChunkReader, \
        read_chunk_header
    fd = io.BytesIO(arch)
    magic = MagicHeader.decode(fd.read(C.MAGIC_LEN + 64))
    fd.seek(magic.header_len)
    hdr = read_chunk_header(fd)
    reader = ChunkReader(fd, hdr)
    refs1 = list(reader.blocks(1))
    assert len(refs1) == 1 and refs1[0].c_type == C.CTYPE_RANS


def test_multichunk_device_roundtrip():
    data = corpus(1 << 20)
    s = lrz.Settings(method="rans", use_tpu=True, max_chunk=200_000)
    arch = lrz.compress(data, s)
    assert lrz.decompress(arch, lrz.Settings(use_tpu=True)) == data
    assert lrz.decompress(arch) == data


def test_all_match_chunk_has_no_literal_block():
    # second half duplicates the first: literals only in the head
    head = corpus(1 << 18)
    data = head + head
    s = lrz.Settings(method="rans", use_tpu=True)
    arch = lrz.compress(data, s)
    assert lrz.decompress(arch, lrz.Settings(use_tpu=True)) == data


def test_incompressible_literals_stored_raw():
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, 1 << 18, dtype=np.uint8).tobytes()
    s = lrz.Settings(method="rans", use_tpu=True)
    arch = lrz.compress(data, s)
    assert lrz.decompress(arch) == data
    # raw storage keeps the archive near the input size
    assert len(arch) < len(data) + 4096


def test_literal_spans_and_mask():
    kinds = np.array([0, 1, 0, 1, 0], np.uint8)
    lengths = np.array([5, 40, 3, 60, 2], np.int64)
    ls, le, n_lit = device_path.literal_spans(kinds, lengths)
    assert n_lit == 10
    assert list(ls) == [0, 45, 108]
    assert list(le) == [5, 48, 110]
    import jax.numpy as jnp
    tb = device_path._token_bucket(len(ls))
    npos = 128
    ls_p = np.full(tb, npos, np.int32)
    le_p = np.full(tb, npos, np.int32)
    ls_p[:3] = ls
    le_p[:3] = le
    mask = np.asarray(device_path._literal_mask_fn(npos)(
        jnp.asarray(ls_p), jnp.asarray(le_p)))
    expect = np.zeros(npos, bool)
    for a, b in zip(ls, le):
        expect[a:b] = True
    assert (mask == expect).all()


def test_corrupt_device_payload_raises():
    data = corpus(1 << 18)
    s = lrz.Settings(method="rans", use_tpu=True)
    arch = bytearray(lrz.compress(data, s))
    # flip a byte inside the literal payload (past headers)
    arch[len(arch) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        lrz.decompress(bytes(arch), lrz.Settings(use_tpu=True))


def test_encrypted_device_roundtrip():
    data = corpus(1 << 18)
    s = lrz.Settings(method="rans", use_tpu=True, passphrase=b"pw",
                     costfactor_exp=10)
    arch = lrz.compress(data, s)
    assert lrz.decompress(
        arch, lrz.Settings(use_tpu=True, passphrase=b"pw")) == data
