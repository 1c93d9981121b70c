"""Bitstream interop against the reference's own vendored codecs.

Builds the reference's LZMA SDK, libzpaq, and BCJ/Delta filters (from
the read-only reference checkout) into throwaway shared libraries and
cross-validates our from-scratch implementations both directions:

- our lzma blocks decode with LzmaUncompress; LzmaCompress output
  decodes with our lzma backend (same raw-LZMA1 props the archive
  format implies: lc=3 lp=0 pb=2 + magic dict size)
- our zpaq blocks decode with libzpaq's zpaq_decompress; libzpaq's
  zpaq_compress output (the exact method strings lrzip-next builds at
  src/stream.c:309) decodes with our ZPAQL VM
- our BCJ/Delta filter outputs are byte-identical to the SDK converters

This is the strongest interop evidence available without the reference
binary's full build deps (libgcrypt etc. are absent here).
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

REF = "/root/reference/src"
BUILD = "/tmp/lrz_ref_oracles"


def _build(name: str, srcs, extra=()):
    os.makedirs(BUILD, exist_ok=True)
    out = os.path.join(BUILD, name)
    if not os.path.exists(out):
        cmd = ["g++" if name.startswith("libzpaq") else "gcc",
               "-O2", "-shared", "-fPIC",
               f"-I{REF}/lzma/include", f"-I{REF}/lib/libzpaq",
               *extra, *srcs, "-o", out, "-lpthread"]
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
    return ctypes.CDLL(out)


@pytest.fixture(scope="session")
def lzma_ref():
    try:
        lib = _build("liblzma_ref.so", [
            f"{REF}/lzma/C/{f}" for f in
            ["LzmaLib.c", "LzmaEnc.c", "LzmaDec.c", "LzFind.c",
             "LzFindOpt.c", "LzFindMt.c", "Threads.c", "CpuArch.c",
             "Alloc.c"]])
    except (subprocess.SubprocessError, OSError) as e:
        pytest.skip(f"cannot build reference LZMA SDK: {e}")
    lib.LzmaCompress.restype = ctypes.c_int
    lib.LzmaUncompress.restype = ctypes.c_int
    return lib


@pytest.fixture(scope="session")
def zpaq_ref():
    try:
        lib = _build("libzpaq_ref.so",
                     [f"{REF}/lib/libzpaq/libzpaq.cpp"], ["-DNOJIT"])
    except (subprocess.SubprocessError, OSError) as e:
        pytest.skip(f"cannot build reference libzpaq: {e}")
    return lib


@pytest.fixture(scope="session")
def bra_ref():
    try:
        lib = _build("libbra_ref.so", [
            f"{REF}/lzma/C/{f}" for f in
            ["Bra.c", "Bra86.c", "BraIA64.c", "Delta.c", "CpuArch.c"]])
    except (subprocess.SubprocessError, OSError) as e:
        pytest.skip(f"cannot build reference Bra filters: {e}")
    return lib


SAMPLE = open(f"{REF}/stream.c", "rb").read()


# ------------------------------------------------------------- lzma ---

def _props_for(dict_size: int) -> bytes:
    # 5-byte classic LZMA props: lc/lp/pb byte + LE dict size
    from lrzip_next_tpu.format.constants import LZMA_LC_LP_PB
    return bytes([LZMA_LC_LP_PB]) + dict_size.to_bytes(4, "little")


@pytest.mark.parametrize("level", [4, 7])
def test_lzma_ours_decodes_with_sdk(lzma_ref, level):
    """Level 4 exercises our from-scratch native encoder
    (runtime/csrc/lzma.cpp); level 7 the liblzma BT4 path.  Both must
    produce streams the reference SDK's LzmaUncompress accepts."""
    from lrzip_next_tpu.backends.lzma_codec import compress
    from lrzip_next_tpu.backends import BackendConfig
    cfg = BackendConfig(compression_level=level, dict_size=1 << 23)
    ours = compress(SAMPLE, cfg)
    dest = ctypes.create_string_buffer(len(SAMPLE))
    dlen = ctypes.c_size_t(len(SAMPLE))
    slen = ctypes.c_size_t(len(ours))
    rc = lzma_ref.LzmaUncompress(dest, ctypes.byref(dlen), ours,
                                 ctypes.byref(slen),
                                 _props_for(1 << 23), 5)
    assert rc == 0, f"SDK decoder rejected our stream (rc={rc})"
    assert dlen.value == len(SAMPLE)
    assert dest.raw[:dlen.value] == SAMPLE


def test_lzma_sdk_decodes_with_ours(lzma_ref):
    from lrzip_next_tpu.backends.lzma_codec import decompress
    from lrzip_next_tpu.backends import BackendConfig
    dict_size = 1 << 23
    dest = ctypes.create_string_buffer(len(SAMPLE) + 4096)
    dlen = ctypes.c_size_t(len(SAMPLE) + 4096)
    props = ctypes.create_string_buffer(5)
    plen = ctypes.c_size_t(5)
    rc = lzma_ref.LzmaCompress(dest, ctypes.byref(dlen), SAMPLE,
                               len(SAMPLE), props, ctypes.byref(plen),
                               7, dict_size, 3, 0, 2, 64, 1)
    assert rc == 0
    sdk_stream = dest.raw[:dlen.value]
    cfg = BackendConfig(compression_level=7, dict_size=dict_size)
    out = decompress(sdk_stream, len(SAMPLE), cfg)
    assert out == SAMPLE


# ------------------------------------------------------------- zpaq ---

@pytest.mark.parametrize("level", [1, 2, 3, 4])
def test_zpaq_ours_decodes_with_libzpaq(zpaq_ref, level):
    """Levels 1-3 exercise the LZ77 + embedded-PCOMP fast modes: the
    reference's libzpaq must run our from-scratch ZPAQL postprocessor
    bytecode to reconstruct the data.  Level 4 is the CM path."""
    from lrzip_next_tpu import runtime
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    ours = runtime.zpaq_encode(SAMPLE, level, 6)
    dest = ctypes.create_string_buffer(len(SAMPLE) + 4096)
    dlen = ctypes.c_int64(0)
    zpaq_ref.zpaq_decompress(dest, ctypes.byref(dlen), ours, len(ours),
                             None, False, 0)
    assert dlen.value == len(SAMPLE), \
        f"libzpaq produced {dlen.value} bytes, expected {len(SAMPLE)}"
    assert dest.raw[:dlen.value] == SAMPLE


def _x86ish(n: int, seed: int = 7) -> bytes:
    """Synthetic machine-code-like bytes: frequent E8/E9 rel32 calls to
    a pool of recurring absolute targets (so only the E8E9 precoder can
    expose the redundancy)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    targets = rng.integers(0, n, 100)
    out = bytearray()
    while len(out) < n:
        out += rng.integers(0, 256, 11, dtype=np.uint8).tobytes()
        t = int(targets[rng.integers(0, 100)])
        rel = (t - len(out)) & 0xFFFFFFFF
        op = b"\xe8" if rng.random() < 0.5 else b"\xe9"
        out += op + rel.to_bytes(4, "little")
    return bytes(out[:n])


@pytest.mark.parametrize("level", [4, 5])
def test_zpaq_e8e9_decodes_with_libzpaq(zpaq_ref, level):
    """x86-detected blocks embed our own E8E9-inverse ZPAQL PCOMP
    (runtime/csrc/zpaq.cpp build_e8e9_pcomp; the reference's exe
    precoder role, libzpaq.cpp:7545-7731): the reference's libzpaq must
    run that bytecode and reconstruct the original bytes."""
    from lrzip_next_tpu import runtime
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    data = _x86ish(1 << 18)
    ours = runtime.zpaq_encode(data, level, 6, 128, 0)
    dest = ctypes.create_string_buffer(len(data) + 4096)
    dlen = ctypes.c_int64(0)
    zpaq_ref.zpaq_decompress(dest, ctypes.byref(dlen), ours, len(ours),
                             None, False, 0)
    assert dlen.value == len(data)
    assert dest.raw[:dlen.value] == data


def test_zpaq_bwt_decodes_with_libzpaq(zpaq_ref):
    """The level-4 high-redundancy-binary arm BWTs each block and embeds
    our inverse-BWT ZPAQL PCOMP (runtime/csrc/zpaq.cpp build_bwt_pcomp):
    the reference's libzpaq must execute that bytecode (counting sort +
    packed psi walk) and reconstruct the block."""
    from lrzip_next_tpu import runtime
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    import numpy as np
    rng = np.random.default_rng(9)
    rec = np.zeros((3000, 256), np.uint8)
    rec[:, :16] = rng.integers(0, 255, (3000, 16), dtype=np.uint8)
    rec[:, 16:40] = rng.integers(0, 4, (3000, 24), dtype=np.uint8)
    data = rec.tobytes()
    ours = runtime.zpaq_encode(data, 4, 6, 200, 0)
    dest = ctypes.create_string_buffer(len(data) + 4096)
    dlen = ctypes.c_int64(0)
    zpaq_ref.zpaq_decompress(dest, ctypes.byref(dlen), ours, len(ours),
                             None, False, 0)
    assert dlen.value == len(data)
    assert dest.raw[:dlen.value] == data


@pytest.mark.parametrize("redundancy,ttype", [(200, 1), (128, 0), (48, 0), (255, 1)])
def test_zpaq_adaptive_models_decode_with_libzpaq(zpaq_ref, redundancy,
                                                  ttype):
    """Level-5 adaptive models (word-context ICM/ISSE for text, periodic
    contexts from the gap histogram) are new COMP/HCOMP shapes - the
    reference's libzpaq must still decode them bit-exactly."""
    from lrzip_next_tpu import runtime
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    import numpy as np
    rng = np.random.default_rng(3)
    rec = np.zeros((300, 300), np.uint8)
    rec[:, :30] = rng.integers(0, 256, (1, 30), dtype=np.uint8)
    rec[:, 30:] = rng.integers(0, 26, (300, 270), dtype=np.uint8) + 97
    data = SAMPLE + rec.tobytes()
    ours = runtime.zpaq_encode(data, 5, 6, redundancy, ttype)
    dest = ctypes.create_string_buffer(len(data) + 4096)
    dlen = ctypes.c_int64(0)
    zpaq_ref.zpaq_decompress(dest, ctypes.byref(dlen), ours, len(ours),
                             None, False, 0)
    assert dlen.value == len(data)
    assert dest.raw[:dlen.value] == data


@pytest.mark.parametrize("method", [b"46,50,0", b"34,128,1", b"22,200,0",
                                    b"56,25,0"])
def test_zpaq_libzpaq_decodes_with_ours(zpaq_ref, method):
    """Method strings in the exact 'LB,R,T' shape lrzip-next builds
    (src/stream.c:309: level+bs, redundancy, type)."""
    from lrzip_next_tpu import runtime
    if not runtime.available():
        pytest.skip("native runtime unavailable")
    src = SAMPLE[:40_000]
    dest = ctypes.create_string_buffer(len(src) * 2 + 4096)
    dlen = ctypes.c_int64(0)
    zpaq_ref.zpaq_compress(dest, ctypes.byref(dlen), src, len(src),
                           method, None, False, 0)
    stream = dest.raw[:dlen.value]
    out = runtime.zpaq_decode(stream, len(src))
    assert out == src


# ---------------------------------------------------------- filters ---

_BRA_FUNCS = {
    "x86": ("z7_BranchConvSt_X86_Enc", True),
    "ARM": ("z7_BranchConv_ARM_Enc", False),
    "ARMT": ("z7_BranchConv_ARMT_Enc", False),
    "ARM64": ("z7_BranchConv_ARM64_Enc", False),
    "PPC": ("z7_BranchConv_PPC_Enc", False),
    "SPARC": ("z7_BranchConv_SPARC_Enc", False),
    "IA64": ("z7_BranchConv_IA64_Enc", False),
    "RISCV": ("z7_BranchConv_RISCV_Enc", False),
}

_FILTER_CODE = {
    "x86": 1, "ARM": 2, "ARMT": 3, "ARM64": 4, "PPC": 5, "SPARC": 6,
    "IA64": 7, "RISCV": 8,
}


def _ref_filter(bra_ref, name: str, data: bytes) -> bytes:
    fname, has_state = _BRA_FUNCS[name]
    fn = getattr(bra_ref, fname)
    buf = ctypes.create_string_buffer(data, len(data))
    if has_state:
        state = ctypes.c_uint32(0)
        fn(buf, len(data), 0, ctypes.byref(state))
    else:
        fn(buf, len(data), 0)
    return buf.raw[:len(data)]


@pytest.mark.parametrize("name", list(_BRA_FUNCS))
def test_bcj_filters_match_sdk(bra_ref, name):
    from lrzip_next_tpu.ops.filters import apply_filter
    rng = np.random.default_rng(42)
    data = rng.integers(0, 256, 30_000, dtype=np.uint8)
    # salt with opcodes so every filter fires
    idx = rng.integers(0, len(data) - 9, 600)
    data[idx] = 0xE8
    widx = (rng.integers(0, (len(data) - 9) // 4, 500) * 4)
    data[widx + 3] = 0xEB   # ARM BL
    data[widx + 7] = 0x94   # ARM64 BL
    data[widx + 2] = 0x48   # PPC-ish high byte (BE)
    eidx = rng.integers(0, (len(data) - 10) // 2, 800) * 2
    data[eidx] = np.array([0x6F, 0xEF, 0x17, 0x97], dtype=np.uint8)[
        rng.integers(0, 4, 800)]  # RISCV JAL/AUIPC opcodes
    data = data.tobytes()
    want = _ref_filter(bra_ref, name, data)
    got = apply_filter(data, _FILTER_CODE[name])
    assert got == want, f"{name} filter output differs from the SDK"


def test_x86_real_binary_matches_sdk(bra_ref):
    from lrzip_next_tpu.ops.filters import apply_filter
    path = "/usr/lib/x86_64-linux-gnu/libz.so.1"
    data = open(os.path.realpath(path), "rb").read()[:200_000]
    want = _ref_filter(bra_ref, "x86", data)
    got = apply_filter(data, 1)
    assert got == want


def test_delta_matches_sdk(bra_ref):
    from lrzip_next_tpu.ops.filters import apply_filter
    data = bytes(np.random.default_rng(1).integers(0, 256, 10_000,
                                                   dtype=np.uint8))
    for offset in (1, 3, 16, 255):
        buf = ctypes.create_string_buffer(data, len(data))
        state = ctypes.create_string_buffer(256 + 8)
        bra_ref.Delta_Init(state)
        bra_ref.Delta_Encode(state, offset, buf, len(data))
        want = buf.raw[:len(data)]
        got = apply_filter(data, 128, offset)  # FILTER_DELTA
        assert got == want, f"delta offset {offset} differs from SDK"
