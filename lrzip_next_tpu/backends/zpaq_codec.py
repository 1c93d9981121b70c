"""zpaq backend (CTYPE 8): from-scratch ZPAQ codec in the native runtime.

The reference vendors libzpaq 7.15 (src/lib/libzpaq/); our equivalent
(runtime/csrc/zpaq.cpp) implements the public-domain ZPAQ spec: decode
runs the ZPAQL VM on any conforming archive (embedded LZ77/BWT/E8E9
postprocessors included), encode emits streams readable by any
conforming decoder - the reference's zpaq_decompress
(libzpaq.h:1624-1634) included.

Level semantics mirror libzpaq's speed dial (method strings built at
reference src/stream.c:304-309, libzpaq.cpp:7545-7731):
  1   LZ77 tokens stored raw + our own ZPAQL PCOMP inverse (~300 MB/s)
  2   LZ77 tokens under an order-1/2 ICM/ISSE model (~35 MB/s)
  3   deeper LZ77 search + order-1/2/3 model (~25 MB/s, near-CM ratio)
  4-5 direct context-mixing "mid" chain, growing model sizes (~1 MB/s)
"""

from __future__ import annotations

from typing import Optional

from ..format.constants import CTYPE_ZPAQ
from . import BackendConfig, register


def compress(data: bytes, cfg: BackendConfig) -> Optional[bytes]:
    from .. import runtime
    if not runtime.available():
        raise NotImplementedError(
            "zpaq backend needs the native runtime (g++ not available)")
    level = min(max(cfg.zpaq_level or 4, 1), 5)
    bs = min(max(cfg.zpaq_bs or 6, 1), 11)
    return runtime.zpaq_encode(data, level, bs)


def decompress(payload: bytes, u_len: int, cfg: BackendConfig) -> bytes:
    from .. import runtime
    if not runtime.available():
        raise NotImplementedError(
            "zpaq backend needs the native runtime (g++ not available)")
    out = runtime.zpaq_decode(payload, u_len)
    return out


register("zpaq", CTYPE_ZPAQ, compress, decompress)
