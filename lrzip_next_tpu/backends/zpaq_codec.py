"""zpaq backend (CTYPE 8).

The reference vendors libzpaq 7.15 (ZPAQL VM + context-mixing predictor +
arithmetic coder, src/lib/libzpaq/).  A from-scratch native equivalent is
staged under lrzip_next_tpu/runtime; until it lands, zpaq-method archives
raise a clear error instead of silently mis-decoding.
"""

from __future__ import annotations

from typing import Optional

from ..format.constants import CTYPE_ZPAQ
from . import BackendConfig, register


def compress(data: bytes, cfg: BackendConfig) -> Optional[bytes]:
    raise NotImplementedError(
        "zpaq backend encode is not implemented yet "
        "(native libzpaq-equivalent in progress)")


def decompress(payload: bytes, u_len: int, cfg: BackendConfig) -> bytes:
    raise NotImplementedError(
        "zpaq backend decode is not implemented yet "
        "(native libzpaq-equivalent in progress)")


register("zpaq", CTYPE_ZPAQ, compress, decompress)
