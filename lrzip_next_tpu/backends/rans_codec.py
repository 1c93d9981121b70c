"""rans backend (CTYPE 11): the TPU-native interleaved-rANS block codec.

A framework extension with no reference equivalent - the reference's
backends all entropy-code in serial native loops (dispatch roles at
src/stream.c:167-554).  This slot is the codec whose encode AND decode
run as JAX array programs on the accelerator (ops/rans.py), giving the
device-resident end-to-end compression path; this module is the
host-side registry adapter, preferring the native C++ mirror
(runtime/csrc/rans.cpp, bitstream-identical) for CPU-path blocks and
falling back to the JAX implementation when no compiler is available.

Context-model depth follows the compression level: order-0 at level
1-2, 4-bit context at 3-4, 6-bit at 5-7, full order-1 at 8-9.
"""

from __future__ import annotations

from typing import Optional

from ..format.constants import CTYPE_RANS
from . import BackendConfig, register


def ctx_bits_for_level(level: int) -> int:
    if level <= 2:
        return 0
    if level <= 4:
        return 4
    if level <= 7:
        return 6
    return 8


def compress(data: bytes, cfg: BackendConfig) -> Optional[bytes]:
    from .. import runtime
    cb = ctx_bits_for_level(cfg.compression_level)
    out = runtime.rans_encode(data, cb) if runtime.available() else None
    if out is None:
        from ..ops import rans
        out = rans.encode_block(data, cb)
    if out is None or len(out) >= len(data):
        return None
    return out


def decompress(payload: bytes, u_len: int, cfg: BackendConfig) -> bytes:
    from .. import runtime
    if runtime.available():
        out = runtime.rans_decode(payload, u_len)
        if out is not None:
            return out
    from ..ops import rans
    return rans.decode_block(payload)


register("rans", CTYPE_RANS, compress, decompress)
