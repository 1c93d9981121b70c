"""End-to-end interop against the actual lrzip-next reference binary.

tests/oracle/build_oracle.sh compiles the reference (read-only at
/root/reference) with shimmed deps into a real `lrzip-next` executable;
these tests cross-decode archives in BOTH directions for every shared
method, plus filters, multi-chunk windows, and hash options.  This is
the strongest parity evidence available in this environment: the
reference's own rzip/stream/backend code accepts our bytes and vice
versa.
"""

import hashlib
import os
import shutil
import subprocess

import numpy as np
import pytest

import lrzip_next_tpu as lrz

ORACLE_DIR = "/tmp/lrz_oracle_bin"
ORACLE = os.path.join(ORACLE_DIR, "lrzip-next")
BUILD = os.path.join(os.path.dirname(__file__), "oracle",
                     "build_oracle.sh")


@pytest.fixture(scope="session")
def oracle():
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    if not os.path.isdir("/root/reference/src"):
        pytest.skip("reference tree not present")
    src_mtime = max(os.path.getmtime(os.path.join(root, f))
                    for root, _, files in os.walk(os.path.dirname(BUILD))
                    for f in files)
    if not os.path.exists(ORACLE) or \
            os.path.getmtime(ORACLE) < src_mtime:
        r = subprocess.run(["bash", BUILD, ORACLE_DIR],
                           capture_output=True, text=True, timeout=600)
        if r.returncode != 0:
            pytest.skip(f"oracle build failed: {r.stderr[-400:]}")
    return ORACLE


@pytest.fixture(scope="session")
def corpus_bytes():
    import pathlib
    srcs = [p.read_bytes() for p in
            sorted(pathlib.Path("/root/reference/src").glob("*.c"))]
    return b"".join(srcs)


def ref_compress(oracle, data: bytes, tmp, flags) -> bytes:
    src = tmp / "in.bin"
    src.write_bytes(data)
    arch = tmp / "in.lrz"
    r = subprocess.run([oracle, "-f", "-Q", *flags, "-o", str(arch),
                        str(src)], capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-400:]
    return arch.read_bytes()


def ref_decompress(oracle, archive: bytes, tmp) -> bytes:
    arch = tmp / "out.lrz"
    arch.write_bytes(archive)
    dec = tmp / "out.bin"
    r = subprocess.run([oracle, "-d", "-f", "-Q", "-o", str(dec),
                        str(arch)], capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-400:]
    return dec.read_bytes()


METHODS = [("lzma", []), ("gzip", ["-g"]), ("bzip2", ["-b"]),
           ("zstd", ["-Z"]), ("lzo", ["-l"]), ("none", ["-n"]),
           ("zpaq", ["-z"])]


@pytest.mark.parametrize("method,flags", METHODS)
def test_cross_decode_both_directions(oracle, corpus_bytes, tmp_path,
                                      method, flags):
    data = corpus_bytes
    theirs = ref_compress(oracle, data, tmp_path, flags)
    assert lrz.decompress(theirs) == data
    ours = lrz.compress(data, lrz.Settings(method=method))
    assert ref_decompress(oracle, ours, tmp_path) == data


def test_ref_decodes_our_multichunk(oracle, corpus_bytes, tmp_path):
    data = corpus_bytes * 2
    ours = lrz.compress(data, lrz.Settings(method="zstd",
                                           max_chunk=100_000))
    assert ref_decompress(oracle, ours, tmp_path) == data


def test_cross_chunk_is_our_extension_not_ref_decodable(
        oracle, corpus_bytes, tmp_path):
    # Cross-chunk distances are valid under the fd_hist replay rules
    # (src/runzip.c:184-241) but the reference binary ALWAYS decodes
    # through its RAM tmpoutbuf and flushes it after every chunk
    # (src/runzip.c:401-403, src/lrzip.c:1701-1703), making earlier
    # chunks unreachable - so cross-chunk archives are an extension
    # only this framework decodes.  Pin both sides of that boundary.
    data = corpus_bytes + bytes(50_000) + corpus_bytes
    ours = lrz.compress(data, lrz.Settings(method="zstd",
                                           max_chunk=150_000,
                                           cross_chunk=True))
    assert lrz.decompress(ours) == data  # we decode our extension
    arch = tmp_path / "x.lrz"
    arch.write_bytes(ours)
    r = subprocess.run([oracle, "-d", "-f", "-Q", "-o",
                        str(tmp_path / "x.bin"), str(arch)],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode != 0  # reference rejects (documented limit)
    # without cross_chunk the same input stays fully ref-compatible
    plain = lrz.compress(data, lrz.Settings(method="zstd",
                                            max_chunk=150_000))
    assert ref_decompress(oracle, plain, tmp_path) == data


def test_we_decode_ref_multichunk(oracle, corpus_bytes, tmp_path):
    # -w1 caps the window at 100MB; use a big repeated corpus but keep
    # runtime sane: 2MB with max window forced tiny via -w is not
    # possible below 100MB, so rely on ref default single chunk + our
    # decode of a larger input instead
    data = corpus_bytes * 8
    theirs = ref_compress(oracle, data, tmp_path, ["-Z"])
    assert lrz.decompress(theirs) == data


@pytest.mark.parametrize("hflag,hname", [("2", "SHA256"),
                                         ("5", "SHA512")])
def test_hash_options_interop(oracle, corpus_bytes, tmp_path, hflag,
                              hname):
    data = corpus_bytes[:150_000]
    theirs = ref_compress(oracle, data, tmp_path, ["-Z", "--hash=" + hflag])
    assert lrz.decompress(theirs) == data


def test_filter_interop_x86(oracle, tmp_path):
    # BCJ x86 filter over real machine code (the oracle binary itself)
    data = open(ORACLE, "rb").read()[:300_000]
    theirs = ref_compress(oracle, data, tmp_path, ["-Z", "--x86"])
    assert lrz.decompress(theirs) == data
    from lrzip_next_tpu.format.constants import FILTER_X86
    ours = lrz.compress(data, lrz.Settings(method="zstd",
                                           filter_flag=FILTER_X86))
    assert ref_decompress(oracle, ours, tmp_path) == data


def test_delta_filter_interop(oracle, tmp_path):
    rng = np.random.default_rng(3)
    base = rng.integers(0, 25, 200_000, dtype=np.uint8)
    data = np.cumsum(base, dtype=np.uint8).tobytes()  # delta-friendly
    theirs = ref_compress(oracle, data, tmp_path,
                          ["-Z", "--delta=1"])
    assert lrz.decompress(theirs) == data
    from lrzip_next_tpu.format.constants import FILTER_DELTA
    ours = lrz.compress(data, lrz.Settings(method="zstd",
                                           filter_flag=FILTER_DELTA,
                                           delta_offset=1))
    assert ref_decompress(oracle, ours, tmp_path) == data


def test_ref_testmode_accepts_ours(oracle, corpus_bytes, tmp_path):
    # reference -t = full decompress + stored-hash verify, discarded
    ours = lrz.compress(corpus_bytes, lrz.Settings(method="lzma"))
    arch = tmp_path / "t.lrz"
    arch.write_bytes(ours)
    r = subprocess.run([oracle, "-t", "-Q", str(arch)],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-400:]


@pytest.mark.parametrize("ecode,eflag", [(1, "1"), (2, "2")])
def test_encrypted_interop_both_directions(oracle, corpus_bytes,
                                           tmp_path, ecode, eflag):
    # The oracle's gcrypt shim implements scrypt + AES-CBC-CTS via
    # libcrypto, so the reference's real encryption plumbing
    # (lrz_keygen/lrz_crypt/rewrite_encrypted) runs end to end.  This
    # caught a real divergence: only 8 bytes of the block salt enter
    # keygen (src/util.c:486-503), which matters for the stored hash.
    data = corpus_bytes[:150_000]
    theirs = ref_compress(oracle, data, tmp_path,
                          ["-Z", f"-E{eflag}", "--encrypt=pw1",
                           "--costfactor", "12"])
    import io
    from lrzip_next_tpu.models import pipeline
    out = b"".join(pipeline.iter_decompress(
        io.BytesIO(theirs), pipeline.Settings(passphrase=b"pw1")))
    assert out == data
    ours = lrz.compress(data, lrz.Settings(
        method="zstd", passphrase=b"pw1", enc_code=ecode,
        costfactor_exp=12))
    arch = tmp_path / "e.lrz"
    arch.write_bytes(ours)
    dec = tmp_path / "e.bin"
    r = subprocess.run([oracle, "-d", "-f", "-Q", "--encrypt=pw1",
                        "-o", str(dec), str(arch)],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-400:]
    assert dec.read_bytes() == data


def test_ref_decodes_our_unlimited_single_chunk(oracle, corpus_bytes,
                                                tmp_path):
    """-U emits ONE whole-file chunk from windowed matcher passes
    (pipeline._compress_unlimited, the sliding-mmap analog of
    src/rzip.c:84-181) whose cross-window match distances the reference
    replays from its in-RAM chunk buffer - unlike the multi-chunk
    cross_chunk extension it provably cannot decode."""
    import io

    from lrzip_next_tpu.format.container import ChunkReader, \
        read_chunk_header
    from lrzip_next_tpu.format.magic import MagicHeader
    from lrzip_next_tpu.format.tokens import decode_token_stream

    data = corpus_bytes + bytes(40_000) + corpus_bytes + corpus_bytes
    ours = lrz.compress(data, lrz.Settings(method="zstd",
                                           max_chunk=150_000,
                                           unlimited=True))
    # exactly one chunk, spanning the whole file
    fd = io.BytesIO(ours)
    magic = MagicHeader.decode(fd.read(4096))
    fd.seek(magic.header_len)
    hdr = read_chunk_header(fd)
    assert hdr.eof and hdr.size == len(data)
    # the token stream must contain at least one cross-window distance
    reader = ChunkReader(fd, hdr)
    from lrzip_next_tpu.backends import BackendConfig, decompress_block
    s0 = b"".join(
        decompress_block(reader.read_payload(r), r.c_type, r.u_len,
                         BackendConfig())
        for r in reader.blocks(0))
    kinds, lengths, dists, _, _ = decode_token_stream(
        np.frombuffer(s0, np.uint8), hdr.chunk_bytes)
    assert int(dists.max()) > 150_000, "no cross-window match emitted"
    # we decode it, and the reference binary decodes it
    assert lrz.decompress(ours) == data
    assert ref_decompress(oracle, ours, tmp_path) == data
